package graft.ext

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("wordDict encodes words as delimited symbol streams with eow") {
    val df = Seq((1L, "the the cat")).toDF("doc_id", "text")
    val d = Bpe.wordDict(df, "text").orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    d shouldBe Array(
      ("cat", 1L, "|c||a||t||>|"),
      ("the", 2L, "|t||h||e||>|"))
  }

  test("pairCounts weights by word count and never crosses words") {
    val df = Seq((1L, "ab ab xy")).toDF("doc_id", "text")
    val p = Bpe.pairCounts(Bpe.wordDict(df, "text"))
      .orderBy("l", "r").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // "ab"×2 → (a,b)×2, (b,>)×2; "xy" → (x,y), (y,>); no (b,x) pair
    p shouldBe Array(
      ("a", "b", 2L), ("b", ">", 2L), ("x", "y", 1L), ("y", ">", 1L))
  }

  test("learnMerges: deterministic argmax, greedy non-overlapping merge") {
    // "aaaa": after merging (a,a) the greedy left-to-right pass yields
    // aa|aa — NOT aa|a|a or a|aa|a; the delimited plain-replace encoding
    // must reproduce that, including at ADJACENT merge sites
    val df = Seq((1L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(df, "text", 2).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    graft.util.Caches.releaseAll()
    // step 1 pairs: (a,a) count 3 per "aaaa" ×2 = 6 → best; and the
    // greedy pass must yield aa|aa (two merge sites, ADJACENT), proving
    // the doubled-delimiter encoding doesn't skip the second site
    m(0) shouldBe ((1, "a", "a", "aa", 6L))
    // step 2: "aaaa" is now |aa||aa||>| ×2 and "ab" |a||b||>|:
    // (aa,aa)×2 ties (aa,>)×2 → lexicographic tie-break: ">" < "aa"
    m(1) shouldBe ((2, "aa", ">", "aa>", 2L))
  }

  test("learnMerges stops early when no pairs remain") {
    val df = Seq((1L, "a a a")).toDF("doc_id", "text")
    // "a" = |a||>| : only pair (a,>); after merging it, streams are single
    // symbols — no second merge exists
    val m = Bpe.learnMerges(df, "text", 5).collect()
    graft.util.Caches.releaseAll()
    m.length shouldBe 1
    m(0).getString(3) shouldBe "a>"
  }

  test("applyMerges tokenizes with one nested-replace pass; counts match learn-time dict") {
    val df = Seq((1L, "aaaa ab"), (2L, "aaaa aaaa"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Bpe.learnAndTokenize(df, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.util.Caches.releaseAll()
    // merges learned on docs 1+2: (a,a)→aa (count 3·3=9? — per "aaaa" 3
    // pairs, 3 words → 9... regardless), then (aa,aa)→aaaa
    // post-merge: "aaaa" → [aaaa, >] = 2 tokens; "ab" → [a, b, >] = 3
    out shouldBe Array((1L, 2L, 5L), (2L, 2L, 4L))
  }

  test("tokenizeRowwise agrees with the grouped form on any frame") {
    val df = Seq((1L, "aaaa ab"), (2L, "aaaa  aaaa x"), (3L, "q"),
      (4L, null.asInstanceOf[String]), (5L, "")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("aa", ">"))
    val grouped = Bpe.applyMerges(df, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rowwise = Bpe.tokenizeRowwise(df, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rowwise shouldBe grouped
    // doubled separator produces an empty word — dropped by both forms
    grouped.find(_._1 == 2L).get._2 shouldBe 3L
  }

  test("learnMerges matches an independent in-JVM reference BPE on random corpora") {
    // differential test: the delimited-string replace trick vs a direct
    // greedy sequence-merge reference, over seeded random corpora with a
    // tiny alphabet (forces heavy pair collisions, overlaps, and ties)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 10) {
      val words = (1 to 2 + rnd.nextInt(6)).map { _ =>
        (1 to 1 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val counts = words.map(w => w -> (1L + rnd.nextInt(5))).toMap
      val instances = rnd.shuffle(
        counts.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) })
      val docs = instances.grouped(4).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val k = 1 + rnd.nextInt(5)
      val got = Bpe.learnMerges(docs, "text", k).orderBy("step").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      withClue(s"trial $trial corpus=$counts k=$k") {
        got shouldBe refBpe(counts, k)
      }
    }
  }

  /** Straightforward greedy BPE over symbol VECTORS — no string encoding
    * tricks — as the independent oracle for the differential test. */
  private def refBpe(counts: Map[String, Long], k: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var dict: Seq[(Vector[String], Long)] =
      counts.toSeq.map { case (w, c) => (w.map(_.toString).toVector :+ ">") -> c }
    var res = Vector.empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val pairs = dict.flatMap { case (s, c) =>
        if (s.size >= 2) s.sliding(2).map(p => (p(0), p(1)) -> c).toSeq else Nil
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        res :+= ((step, l, r, l + r, c))
        dict = dict.map { case (s, cnt) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.size) {
            if (i + 1 < s.size && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
            else { b += s(i); i += 1 }
          }
          (b.result(), cnt)
        }
        step += 1
      }
    }
    res
  }

  test("learnMergesBatched: batch=1 == learnMerges exactly (random corpora)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val words = (1 to 2 + rnd.nextInt(5)).map { _ =>
        (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, (w + " ") * (1 + rnd.nextInt(3))) }
        .toDF("doc_id", "text")
      val k = 1 + rnd.nextInt(4)
      val seqr = Bpe.learnMerges(docs, "text", k).orderBy("step").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      val bat = Bpe.learnMergesBatched(docs, "text", k, batch = 1)
        .orderBy("step").collect()
        .map(r => (r.getInt(0), r.getString(2), r.getString(3),
          r.getString(4), r.getLong(5))).toSeq
      withClue(s"trial $trial") { bat shouldBe seqr }
    }
  }

  test("learnMergesBatched: deferral keeps batched == sequential on a non-interacting corpus") {
    // 'abc'x4, 'xyz'x3: round-1 top-2 by (count desc, l, r) is
    // (a,b)=4 then (b,c)=4 — (b,c) DEFERS (shares b). Round 2 top-2 is
    // (ab,c)=4 then (c,>)=4 — (c,>) defers (shares c). The accepted
    // sequence (a,b),(ab,c) is exactly sequential BPE's.
    val docs = Seq((1L, "abc abc abc abc xyz xyz xyz")).toDF("doc_id", "text")
    val seqr = Bpe.learnMerges(docs, "text", 2).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val bat = Bpe.learnMergesBatched(docs, "text", 2, batch = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSeq
    bat.map(t => (t._1, t._3, t._4, t._5, t._6)) shouldBe seqr
    // the deferrals are visible as one acceptance per round
    bat.map(_._2) shouldBe Seq(1, 2)
  }

  test("learnMergesBatched: a round CAN accept several disjoint pairs (documented divergence)") {
    // 'ab'x2, 'cd'x2: round-1 ranking (a,b),(b,>),(c,d),(d,>) all count 2.
    // batch=4 accepts (a,b) and (c,d) in ONE round ((b,>) and (d,>) defer
    // on shared symbols). Sequential BPE would instead pick (a,b) then
    // (ab,>) — the merge-created pair overtakes by lexicographic rank.
    // This is the batching trade, pinned here as a DOCUMENTED divergence.
    val docs = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val bat = Bpe.learnMergesBatched(docs, "text", 2, batch = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSeq
    bat shouldBe Seq(
      (1, 1, "a", "b", "ab", 2L),
      (2, 1, "c", "d", "cd", 2L))
    val seqr = Bpe.learnMerges(docs, "text", 2).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    seqr shouldBe Seq(("a", "b"), ("ab", ">"))
  }

  test("learnMergesBatched matches an in-JVM batched-greedy reference on random corpora") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 8) {
      val words = (1 to 2 + rnd.nextInt(6)).map { _ =>
        (1 to 1 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val counts = words.map(w => w -> (1L + rnd.nextInt(5))).toMap
      val docs = counts.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
        .grouped(4).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val k = 1 + rnd.nextInt(5)
      val b = 2 + rnd.nextInt(2)
      val got = Bpe.learnMergesBatched(docs, "text", k, batch = b)
        .orderBy("step").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
          r.getString(4), r.getLong(5))).toSeq
      withClue(s"trial $trial corpus=$counts k=$k batch=$b") {
        got shouldBe refBpeBatched(counts, k, b)
      }
    }
  }

  /** Batched-greedy reference over symbol VECTORS, mirroring the
    * learnMergesBatched spec: rank by (count desc, l, r), accept unless a
    * symbol collides with a higher-ranked acceptance's symbols or output,
    * apply the round's acceptances, repeat. */
  private def refBpeBatched(counts: Map[String, Long], k: Int, batch: Int)
      : Seq[(Int, Int, String, String, String, Long)] = {
    var dict: Seq[(Vector[String], Long)] =
      counts.toSeq.map { case (w, c) => (w.map(_.toString).toVector :+ ">") -> c }
    var res = Vector.empty[(Int, Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (res.size < k && !done) {
      val pairs = dict.flatMap { case (s, c) =>
        if (s.size >= 2) s.sliding(2).map(p => (p(0), p(1)) -> c).toSeq else Nil
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) done = true
      else {
        val top = pairs.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.take(batch)
        val room = k - res.size
        val blocked = scala.collection.mutable.Set.empty[String]
        val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        top.foreach { case ((l, r), c) =>
          if (acc.size < room && !blocked(l) && !blocked(r)) {
            acc += ((l, r, c)); blocked ++= Seq(l, r, l + r)
          }
        }
        acc.foreach { case (l, r, c) =>
          res :+= ((res.size + 1, round, l, r, l + r, c))
        }
        acc.foreach { case (l, r, _) =>
          dict = dict.map { case (s, cnt) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < s.size) {
              if (i + 1 < s.size && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
              else { b += s(i); i += 1 }
            }
            (b.result(), cnt)
          }
        }
        round += 1
      }
    }
    res
  }

  test("vocab: dense 0-based frequency-ranked ids; ties break by token asc") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    // no merges: tokens are chars + eow. counts: a=2, b=3, >=3
    val v = Bpe.vocab(df, "text", Nil).orderBy("token_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    graft.util.Caches.releaseAll()
    // cnt desc, token asc: ">"(3) < "b"(3) lexicographically
    v shouldBe Array((0, ">", 3L), (1, "b", 3L), (2, "a", 2L))
    // ids are dense 0..V-1
    v.map(_._1).toSeq shouldBe (0 until v.length)
  }

  test("tokenIds: flattened (word pos, token pos) order; size law vs applyMerges") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "ab ba"),
      (2L, "ab  ab"), // double space: empty word filtered, order preserved
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val merges = Seq(("a", "b")) // "ab" merges; "ba" stays b,a
    val v = Bpe.vocab(df, "text", merges)
    val ids = Bpe.tokenIds(df, "doc_id", "text", merges, v)
    val byDoc = ids.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2).toVector)).toMap
    graft.util.Caches.releaseAll()
    // vocab over this corpus: counts ">"=5, "ab"=3, "a"=2(from ba? no —
    // "ba" splits b,a,> so a=2,b=2), so ranks: >(5)=0, ab(3)=1, a(2)=2, b(2)=3
    val vm = v.collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    byDoc(1L)._2 shouldBe Vector(vm("ab"), vm(">"), vm("b"), vm("a"), vm(">"))
    byDoc(2L)._2 shouldBe Vector(vm("ab"), vm(">"), vm("ab"), vm(">"))
    byDoc.contains(3L) shouldBe false // null text: applyMerges parity
    byDoc.contains(4L) shouldBe false // no words
    // law: n_tokens == size(token_ids) == applyMerges count, per doc
    val am = Bpe.applyMerges(df, "doc_id", "text", merges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    byDoc.foreach { case (d, (n, seq)) =>
      n shouldBe seq.size.toLong
      n shouldBe am(d)
    }
    graft.util.Caches.releaseAll()
  }

  test("tokenIdsRowwise == tokenIds on any batch frame; OOV fails loudly") {
    val df = Seq(
      (1L, "ab ba ab"), (2L, "b  a"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val vdf = Bpe.vocab(df, "text", merges)
    val vocab = vdf.collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    val grouped = Bpe.tokenIds(df, "doc_id", "text", merges, vdf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toVector)).toSeq
    val rowwise = Bpe.tokenIdsRowwise(df, "doc_id", "text", merges, vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toVector)).toSeq
    graft.util.Caches.releaseAll()
    rowwise shouldBe grouped
    // an out-of-vocabulary token (vocab trained elsewhere) fails loudly
    val alien = Seq((9L, "zz")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.tokenIdsRowwise(alien, "doc_id", "text", merges, vocab).collect()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n") should
      include("out-of-vocabulary")
  }

  test("detokenize(tokenIds(text)) round-trips modulo space runs") {
    val df = Seq(
      (1L, "hello world"), (2L, "a  b"), (3L, "xyz")).toDF("doc_id", "text")
    val merges = Seq(("l", "l"), ("h", "e"))
    val vdf = Bpe.vocab(df, "text", merges)
    val vocab = vdf.collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    val ids = Bpe.tokenIds(df, "doc_id", "text", merges, vdf)
    val back = Bpe.detokenize(ids, "doc_id", "token_ids", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    graft.util.Caches.releaseAll()
    back shouldBe Map(
      1L -> "hello world",
      2L -> "a b", // the documented loss: runs of spaces collapse
      3L -> "xyz")
  }

  test("reserved delimiter in a word fails loudly") {
    val df = Seq((1L, "ok bad|word")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Bpe.learnMerges(df, "text", 1).collect()
    }
    graft.util.Caches.releaseAll()
    ex.getMessage should include ("reserved delimiter")
  }

  // ------------------------------------------------- rank-based typed path

  /** Independent rank-order reference: apply each merge IN TABLE ORDER as a
    * full leftmost/non-overlapping pass over the symbol vector — the
    * expression chain's semantics, with none of either implementation's
    * machinery. */
  private def refApplyMerges(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var s = word.map(_.toString).toVector :+ ">"
    merges.foreach { case (l, r) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.size) {
        if (i + 1 < s.size && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
        else { b += s(i); i += 1 }
      }
      s = b.result()
    }
    s
  }

  test("rank-typed apply family == expression family on random corpora (learned merges)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 6) {
      val words = (1 to 2 + rnd.nextInt(6)).map { _ =>
        (1 to 1 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val instances = rnd.shuffle(words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w)))
      val docs = instances.grouped(3).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val k = 1 + rnd.nextInt(6)
      val merges = Bpe.learnMerges(docs, "text", k).orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val exprCounts = Bpe.applyMerges(docs, "doc_id", "text", merges)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val typedCounts = Bpe.applyMergesTyped(docs, "doc_id", "text", merges)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val exprTab = Bpe.tokenTable(docs, "text", merges)
        .orderBy("word", "token_idx").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
      val typedTab = Bpe.tokenTableTyped(docs, "text", merges)
        .orderBy("word", "token_idx").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
      graft.util.Caches.releaseAll()
      withClue(s"trial $trial words=$words merges=$merges") {
        typedCounts shouldBe exprCounts
        typedTab shouldBe exprTab
      }
    }
  }

  test("rank loop settles boundary competition exactly as rank order does") {
    // "abc" with (a,b) ranked before (b,c): the b belongs to (a,b) → [ab c >];
    // reversed ranking hands it to (b,c) → [a bc >]. Both paths must agree.
    Bpe.tokenizeWordRank("abc",
      { val m = new java.util.HashMap[String, Integer]()
        m.put("a\u0000b", 0); m.put("b\u0000c", 1); m }).toSeq shouldBe Seq("ab", "c", ">")
    Bpe.tokenizeWordRank("abc",
      { val m = new java.util.HashMap[String, Integer]()
        m.put("b\u0000c", 0); m.put("a\u0000b", 1); m }).toSeq shouldBe Seq("a", "bc", ">")
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    for (ms <- Seq(Seq(("a", "b"), ("b", "c")), Seq(("b", "c"), ("a", "b")))) {
      val e = Bpe.applyMerges(docs, "doc_id", "text", ms).collect()(0)
      val t = Bpe.applyMergesTyped(docs, "doc_id", "text", ms).collect()(0)
      graft.util.Caches.releaseAll()
      (t.getLong(1), t.getLong(2)) shouldBe ((e.getLong(1), e.getLong(2)))
    }
  }

  test("above RankPathMaxMerges the public API routes typed and matches the rank-order reference") {
    // deterministic pseudo-words over an 8-letter alphabet; prefix-chain
    // merges (each word built left-to-right, deduped keeping first
    // occurrence) — a >512-entry table with the creation-order invariant
    // every learnable table has
    val words = (0 until 300).map { i =>
      val len = 6 + i % 9
      val h = i.toLong * 2654435761L + 0x9e3779b9L
      (0 until len).map(j => ('a' + ((h >> (3 * j)) & 7)).toChar).mkString
    }.distinct
    val seen = scala.collection.mutable.LinkedHashSet[(String, String)]()
    words.foreach { w =>
      (1 until w.length).foreach(j => seen += ((w.substring(0, j), w.substring(j, j + 1))))
    }
    val merges = seen.toSeq
    merges.size should be > Bpe.RankPathMaxMerges
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    // in-JVM expected counts straight off the rank-order reference
    val perWord = words.map(w => w -> refApplyMerges(w, merges).size.toLong).toMap
    val expected = words.grouped(10).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.size.toLong, ws.map(perWord).sum)
    }.toSeq
    val got = Bpe.applyMerges(docs, "doc_id", "text", merges) // routes typed
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val gotRowwise = Bpe.tokenizeRowwise(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.util.Caches.releaseAll()
    got shouldBe expected
    gotRowwise shouldBe expected
    // token STRINGS too, not just counts: tokenTable routes typed as well
    val tab = Bpe.tokenTable(docs, "text", merges)
      .orderBy("word", "token_idx").collect()
      .map(r => (r.getString(0), r.getString(2)))
      .groupBy(_._1).map { case (w, ts) => w -> ts.map(_._2).toVector }
    graft.util.Caches.releaseAll()
    words.foreach { w => tab(w) shouldBe refApplyMerges(w, merges) }
  }

  test("tokenIdsTyped == tokenIdsRowwise on in-vocabulary frames") {
    val df = Seq((1L, "ab ba ab"), (2L, "b  a"), (3L, "abab")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val vocab = Bpe.vocab(df, "text", merges).collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap
    val expr = Bpe.tokenIdsRowwise(df, "doc_id", "text", merges, vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toVector)).toSeq
    val typed = Bpe.tokenIdsTyped(df, "doc_id", "text", merges, vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toVector)).toSeq
    graft.util.Caches.releaseAll()
    typed shouldBe expr
    // without byte fallback the typed path keeps the fail-loudly contract
    val alien = Seq((9L, "zz")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.tokenIdsTyped(alien, "doc_id", "text", merges, vocab).collect()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n") should
      include("out-of-vocabulary")
  }

  test("byte fallback: OOV tokens become UTF-8 byte ids and round-trip, multibyte included") {
    val train = Seq((1L, "ab ba ab b")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val vocab = Bpe.vocab(train, "text", merges).collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap
    val base = Bpe.byteFallbackBase(vocab)
    base shouldBe vocab.values.max + 1
    // 'x' (1-byte), 'ñ' (2-byte), '→' (3-byte) are absent from training
    val stream = Seq((5L, "ab xñ→"), (6L, "ñ")).toDF("doc_id", "text")
    val ids = Bpe.tokenIdsTyped(stream, "doc_id", "text", merges, vocab,
      byteFallback = true)
    val rows = ids.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](2).toVector)).toMap
    // doc 5: word "ab" → [ab, >] in vocab; word "xñ→" → x, ñ, → all OOV
    val utf8 = (s: String) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => base + (b & 0xff)).toVector
    rows(5L) shouldBe Vector(vocab("ab"), vocab(">")) ++
      utf8("x") ++ utf8("ñ") ++ utf8("→") ++ Vector(vocab(">"))
    // round trip: byte runs decode as one UTF-8 sequence
    val back = Bpe.detokenizeTyped(ids, "doc_id", "token_ids", vocab,
      byteFallback = true).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    graft.util.Caches.releaseAll()
    back shouldBe Map(5L -> "ab xñ→", 6L -> "ñ")
    // an id outside vocab ∪ byte range still fails loudly
    val badIds = Seq((1L, Seq(base + 300))).toDF("doc_id", "token_ids")
    val e = intercept[Exception] {
      Bpe.detokenizeTyped(badIds, "doc_id", "token_ids", vocab,
        byteFallback = true).collect()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n") should
      include("unknown token id")
  }

  test("preTokens matches an in-JVM leftmost-first reference on edge inputs") {
    import spark.implicits._
    val inputs = Seq(
      "it's a don't 12ab!! x9,y.z  ''' o'clock a'm",
      "we're i'll you've they'd", // every contraction branch
      "hello world", "", "   ", "a1b2 -3.14e5", "!@#$%", "'",
      "naïve résumé №5", "tab\tand\nnewline separated")
    val got = inputs.toDF("t")
      .select(col("t"), Bpe.preTokens(col("t")).as("p")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    graft.util.Caches.releaseAll()
    val ref = java.util.regex.Pattern.compile(Bpe.PreTokenPattern)
    inputs.foreach { t =>
      val m = ref.matcher(t)
      val exp = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toVector
      got(t) shouldBe exp
    }
  }

  test("preTokenizedText is the identity on whitespace corpora; pipeline reduces") {
    import spark.implicits._
    // single-space-separated letter runs — the previous splitter's world
    val docs = Seq((1L, "ab ba ab b"), (2L, "aab ab"), (3L, "b")).toDF("doc_id", "text")
    val pre = Bpe.preTokenizedText(docs, "text")
    pre.select(col("text")).collect().map(_.getString(0)) shouldBe
      docs.select(col("text")).collect().map(_.getString(0))
    // and the whole pipeline reduces: same merges, same ids
    val merges = Bpe.learnMerges(docs, "text", 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val mergesPre = Bpe.learnMerges(pre, "text", 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    mergesPre shouldBe merges
    val v = Bpe.vocab(docs, "text", merges)
    val a = Bpe.tokenIds(docs, "doc_id", "text", merges, v)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](2).toVector))
    val b = Bpe.tokenIds(pre, "doc_id", "text", merges, v)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](2).toVector))
    graft.util.Caches.releaseAll()
    b shouldBe a
    // and a categorical boundary is real: merges never cross it
    val mixed = Seq((1L, "ab1 ab1 ab1 ab1")).toDF("doc_id", "text")
    val m2 = Bpe.learnMerges(Bpe.preTokenizedText(mixed, "text"), "text", 6)
      .collect().map(r => r.getString(3))
    m2.foreach { merged =>
      // no merged symbol may span letters AND digits
      merged.exists(_.isDigit) && merged.exists(_.isLetter) shouldBe false
    }
  }

  test("rank path rejects duplicate merge OUTPUTS, tolerates repeated pairs") {
    import spark.implicits._
    val docs = Seq((1L, "abc ab")).toDF("doc_id", "text")
    // ("a","bc") and ("ab","c") both output "abc": a pair ranked between
    // the two creators could re-merge in the rank loop where the
    // once-per-merge expression chain would not — must fail LOUDLY
    val dup = Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c"))
    val e = intercept[Exception] {
      Bpe.tokenizeRowwiseTyped(docs, "doc_id", "text", dup).collect()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n") should
      include("distinct merge outputs")
    // a literally REPEATED pair stays legal (no-op, first rank wins)
    val rep = Seq(("a", "b"), ("a", "b"))
    val out = Bpe.tokenizeRowwiseTyped(docs, "doc_id", "text", rep)
      .orderBy("doc_id").collect()
    graft.util.Caches.releaseAll()
    out.length shouldBe 1
    out(0).getLong(1) shouldBe 2L // two words
  }

  test("detokenizeTyped: null ids array rebuilds to null, like the expression form") {
    import spark.implicits._
    val vocab = Map("a" -> 0, ">" -> 1)
    val df = Seq((1L, Some(Seq(0, 1))), (2L, Option.empty[Seq[Int]]))
      .toDF("doc_id", "token_ids")
    val back = Bpe.detokenizeTyped(df, "doc_id", "token_ids", vocab)
      .orderBy("doc_id").collect()
    graft.util.Caches.releaseAll()
    back(0).getString(1) shouldBe "a"
    back(1).isNullAt(1) shouldBe true
  }

  test("vocab routes typed above the merge threshold and stays identical") {
    // same corpus, same merges — once under the expression path, once with
    // the table padded past the threshold by inert merges (pairs that can
    // never occur), which must not change any count or id
    val df = Seq((1L, "ab ba ab"), (2L, "aab")).toDF("doc_id", "text")
    val real = Seq(("a", "b"))
    val inert = (0 until Bpe.RankPathMaxMerges + 8).map(i => (s"zz$i", s"qq$i"))
    val small = Bpe.vocab(df, "text", real).orderBy("token_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val big = Bpe.vocab(df, "text", real ++ inert).orderBy("token_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    graft.util.Caches.releaseAll()
    big shouldBe small
  }
}
