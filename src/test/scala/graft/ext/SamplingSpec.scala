package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def h48(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16)
  }

  private val rows = (1L to 400L).map(k => (k, s"payload-$k"))

  test("hashSample keeps exactly the keys whose hash bucket is below pct") {
    val df = rows.toDF("k", "v")
    val got = Sampling.hashSample(df, col("k"), 10).collect().map(_.getLong(0)).toSet
    val expected = rows.map(_._1).filter(k => h48(k.toString) % 100 < 10).toSet
    got shouldBe expected
    got.nonEmpty shouldBe true // 400 keys at 10% — statistically certain
  }

  test("hashSample is keyed: duplicate keys survive or die together") {
    val dup = (rows ++ rows).toDF("k", "v")
    val counts = Sampling.hashSample(dup, col("k"), 10)
      .groupBy("k").count().collect().map(_.getLong(1)).distinct.toSeq
    counts shouldBe Seq(2L)
  }

  test("hashSample nests: the 5% sample is a subset of the 20% sample") {
    val df = rows.toDF("k", "v")
    val p5 = Sampling.hashSample(df, col("k"), 5).collect().map(_.getLong(0)).toSet
    val p20 = Sampling.hashSample(df, col("k"), 20).collect().map(_.getLong(0)).toSet
    p5.subsetOf(p20) shouldBe true
    Sampling.hashSample(df, col("k"), 0).count() shouldBe 0L
    Sampling.hashSample(df, col("k"), 100).count() shouldBe 400L
    an[IllegalArgumentException] should be thrownBy Sampling.hashSample(df, col("k"), 101)
  }

  test("weightedMix composes per-source hash samples, union by name") {
    val web = rows.toDF("k", "v").withColumn("src", lit("web"))
    val code = rows.map { case (k, v) => (k + 1000L, v) }.toDF("k", "v")
      .withColumn("src", lit("code"))
    val mix = Sampling.weightedMix(Seq((web, col("k"), 10), (code, col("k"), 50)))
      .collect().map(r => (r.getString(2), r.getLong(0))).toSeq
    val bySrc = mix.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    bySrc("web") shouldBe rows.map(_._1).filter(k => h48(k.toString) % 100 < 10).toSet
    bySrc("code") shouldBe rows.map(_._1 + 1000L)
      .filter(k => h48(k.toString) % 100 < 50).toSet
    // growing a weight only ADDS rows (nesting), never resamples
    val grown = Sampling.weightedMix(Seq((web, col("k"), 25), (code, col("k"), 50)))
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    mix.toSet.subsetOf(grown) shouldBe true
  }

  test("balancedSample caps every class at n with deterministic hash-ordered picks") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "cls")
    val out = Sampling.balancedSample(df, Seq("cls"), col("id"), 7)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    out.groupBy(_._1).foreach { case (_, g) =>
      g.length shouldBe 7
      g.map(_._3).sorted.toSeq shouldBe (1 to 7)
    }
    // picks are the hash-order prefix of each class, not storage order
    val expectedA = (1L to 100L).filter(_ % 3 == 0)
      .sortBy(i => (h48(i.toString), i)).take(7).toSet
    out.filter(_._1 == "a").map(_._2).toSet shouldBe expectedA
  }

  test("balancedSample leaves classes smaller than n whole") {
    val df = Seq((1L, "tiny"), (2L, "tiny")).toDF("id", "cls")
    Sampling.balancedSample(df, Seq("cls"), col("id"), 10).count() shouldBe 2L
  }

  test("assignSplit labels every row by hash bucket range, in split order") {
    val df = rows.toDF("k", "v")
    val got = Sampling.assignSplit(df, col("k"),
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    got.size shouldBe 400
    rows.foreach { case (k, _) =>
      val b = h48(k.toString) % 100
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      got(k) shouldBe expected
    }
  }

  test("assignSplit agrees with hashSample on the first range (no leakage drift)") {
    val df = rows.toDF("k", "v")
    val train = Sampling.assignSplit(df, col("k"), Seq(("train", 80), ("rest", 20)))
      .where(col("split") === "train").select("k").as[Long].collect().toSet
    val sampled = Sampling.hashSample(df, col("k"), 80).select("k").as[Long].collect().toSet
    train shouldBe sampled
  }

  test("assignSplit duplicate keys land in one split; bad percentages refuse") {
    val dup = (rows ++ rows).toDF("k", "v")
    val perKey = Sampling.assignSplit(dup, col("k"), Seq(("a", 50), ("b", 50)))
      .groupBy("k").agg(countDistinct("split").as("n"))
      .agg(max("n")).collect().head.getLong(0)
    perKey shouldBe 1L
    an[IllegalArgumentException] should be thrownBy
      Sampling.assignSplit(dup, col("k"), Seq(("a", 50), ("b", 40)))
    an[IllegalArgumentException] should be thrownBy
      Sampling.assignSplit(dup, col("k"), Seq(("a", 110), ("b", -10)))
    an[IllegalArgumentException] should be thrownBy
      Sampling.assignSplit(dup, col("k"), Nil)
  }

  test("stratifiedSample applies each class's own rate, default elsewhere") {
    val df = rows.map { case (k, v) => (k, v, if (k % 2 == 0) "en" else "de") }
      .toDF("k", "v", "lang")
    val got = Sampling.stratifiedSample(df, col("lang"), col("k"),
        Map("en" -> 50), defaultPct = 10)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val expected = rows.map(_._1).map(k => (k, if (k % 2 == 0) "en" else "de"))
      .filter { case (k, l) =>
        h48(k.toString) % 100 < (if (l == "en") 50 else 10) }.toSet
    got shouldBe expected
  }

  test("stratifiedSample per class is exactly hashSample at that class's rate") {
    val df = rows.map { case (k, v) => (k, v, "en") }.toDF("k", "v", "lang")
    val strat = Sampling.stratifiedSample(df, col("lang"), col("k"), Map("en" -> 30))
      .select("k").as[Long].collect().toSet
    val plain = Sampling.hashSample(df, col("k"), 30).select("k").as[Long].collect().toSet
    strat shouldBe plain
  }

  test("stratifiedSample nests per class and validates percentages") {
    val df = rows.map { case (k, v) => (k, v, if (k % 2 == 0) "en" else "de") }
      .toDF("k", "v", "lang")
    val small = Sampling.stratifiedSample(df, col("lang"), col("k"),
      Map("en" -> 10, "de" -> 5)).select("k").as[Long].collect().toSet
    val grown = Sampling.stratifiedSample(df, col("lang"), col("k"),
      Map("en" -> 40, "de" -> 5)).select("k").as[Long].collect().toSet
    small.subsetOf(grown) shouldBe true
    // default 0: unlisted classes are dropped entirely
    Sampling.stratifiedSample(df, col("lang"), col("k"), Map("en" -> 10))
      .where(col("lang") === "de").count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Sampling.stratifiedSample(df, col("lang"), col("k"), Map("en" -> 101))
    an[IllegalArgumentException] should be thrownBy
      Sampling.stratifiedSample(df, col("lang"), col("k"), Map.empty, defaultPct = -1)
  }

  // ------------------------------------------------- systematic PPS laws

  // Independent reference model: same hash order and integer selection rule
  // recomputed from first principles (BigInt prefix sums, explicit multiple
  // counting) so a drift in either side breaks the equality.
  private def ppsRef(ws: Seq[(Long, Long)], step: Long): Map[Long, Long] = {
    val ordered = ws.sortBy { case (id, _) => (h48(id.toString), id) }
    var cum = 0L
    ordered.map { case (id, w) =>
      val lo = cum; val hi = cum + w; cum = hi
      // multiples of step in [lo, hi)
      val n = (if (hi == 0) 0L else (hi - 1) / step + 1) -
        (if (lo == 0) 0L else (lo - 1) / step + 1)
      id -> n
    }.toMap
  }

  test("ppsSystematicSample matches the reference draw under any partitioning") {
    val ws = (1L to 300L).map(id => (id, id % 37)) // weights 0..36, zeros included
    val step = 40L
    val ref = ppsRef(ws, step)
    Seq(1, 7, 32).foreach { parts =>
      val got = Sampling.ppsSystematicSample(
          ws.toDF("id", "w").repartition(parts), col("id"), col("w"), step)
        .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("pps_count"))).toMap
      withClue(s"parts=$parts: ") { got shouldBe ref }
      graft.util.Caches.releaseAll()
    }
    // exact sample mass: ⌊W/step⌋ or ⌈W/step⌉ — zero selection variance
    val total = ws.map(_._2).sum
    val drawn = ref.values.sum
    drawn should (be(total / step) or be(total / step + 1))
    // zero-weight rows are never drawn; w ≥ step rows always are
    ws.filter(_._2 == 0L).foreach { case (id, _) => ref(id) shouldBe 0L }
    val big = Sampling.ppsSystematicSample(
        Seq((1L, 5L), (2L, 100L), (3L, 5L)).toDF("id", "w"), col("id"), col("w"), 40L)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("pps_count"))).toMap
    big(2L) should be >= 2L // w=100 spans ≥2 step boundaries
    graft.util.Caches.releaseAll()
    an[IllegalArgumentException] should be thrownBy
      Sampling.ppsSystematicSample(ws.toDF("id", "w"), col("id"), col("w"), 0L)
  }

  // ------------------------------------------------- epoch-mix laws

  test("epochMix gives every key floor(pct/100) copies plus the hash fraction") {
    val df = rows.toDF("k", "v")
    val out = Sampling.epochMix(Seq((df, col("k"), 250)))
      .collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("epoch_copy"))))
    val copies = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    rows.foreach { case (k, _) =>
      val expected = 2 + (if (h48(k.toString) % 100 < 50) 1 else 0)
      copies(k) shouldBe (1 to expected)
    }
    // 0 epochs drops the source entirely; 100 is exactly one copy per key
    Sampling.epochMix(Seq((df, col("k"), 0))).count() shouldBe 0L
    Sampling.epochMix(Seq((df, col("k"), 100))).count() shouldBe 400L
    an[IllegalArgumentException] should be thrownBy
      Sampling.epochMix(Seq((df, col("k"), -1)))
  }

  test("epochMix is monotone in pct and unions sources by name") {
    val a = rows.toDF("k", "v").withColumn("src", lit("a"))
    val b = rows.map { case (k, v) => (k + 1000L, v) }.toDF("k", "v")
      .withColumn("src", lit("b"))
    def copies(pa: Int, pb: Int): Set[(String, Long, Int)] =
      Sampling.epochMix(Seq((a, col("k"), pa), (b, col("k"), pb)))
        .collect().map(r => (r.getString(2), r.getLong(0),
          r.getInt(r.fieldIndex("epoch_copy")))).toSet
    val small = copies(130, 40)
    val grown = copies(260, 40)
    small.subsetOf(grown) shouldBe true // raising a weight only ADDS copies
    grown.filter(_._1 == "b") shouldBe small.filter(_._1 == "b")
  }

  test("dsirScores ranks target-like pool docs above target-unlike ones, exactly") {
    // 2^20 buckets ⇒ no collisions among 4 distinct grams, so the exact
    // cross-difference weights are hand-computable:
    //   target "alpha beta alpha beta": c_t = {ab:2, ba:1}, N_t = 3
    //   pool A "alpha beta alpha":      grams ab, ba        (target-like)
    //   pool B "zeta eta theta":        grams ze, et        (target-unlike)
    //   N_r = 4;  B = 2^20
    //   w(ab) = 3(4+B) − 2(3+B) = B+6;  w(ba) = 2(4+B) − 2(3+B) = 2
    //   w(ze) = w(et) = 1(4+B) − 2(3+B) = −B−2
    val buckets = 1 << 20
    val target = Seq((10L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val pool = Seq(
      (1L, "alpha beta alpha"),
      (2L, "zeta eta theta"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = Sampling.dsirScores(pool, target, "doc_id", "text", buckets)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = buckets.toLong
    out shouldBe Seq(
      (1L, 2L, (b + 6L) + 2L),
      (2L, 2L, 2L * (-b - 2L)),
      (3L, 0L, 0L))
    val sel = Sampling.selectTopK(
        Sampling.dsirScores(pool, target, "doc_id", "text", buckets),
        col("doc_id"), col("score"), k = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(r.fieldIndex("selected"))))
    sel shouldBe Seq((1L, true), (2L, false), (3L, false))
    an[IllegalArgumentException] should be thrownBy
      Sampling.dsirScores(pool, target, "doc_id", "text", 0)
    graft.util.Caches.releaseAll()
  }

  test("budgetCappedSelection keeps the maximal quality-first prefix per group") {
    val df = Seq(
      // group a: scores rank docs 1 > 2 > 3; tokens 6, 3, 2; budget 10
      // prefix sums: 6, 9, 11 → doc 3 misfits, docs 1-2 kept
      (1L, "a", 6L, 0.9),
      (2L, "a", 3L, 0.8),
      (3L, "a", 2L, 0.7),
      // group b: single doc larger than the budget → nothing kept
      (4L, "b", 11L, 0.9))
      .toDF("id", "g", "t", "s")
    val out = Sampling.budgetCappedSelection(
        df, Seq("g"), col("id"), col("t"), col("s"), 10L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("cum_before_tokens")),
        r.getBoolean(r.fieldIndex("kept"))))
    out shouldBe Seq(
      (1L, 0L, true), (2L, 6L, true), (3L, 9L, false), (4L, 0L, false))
    an[IllegalArgumentException] should be thrownBy
      Sampling.budgetCappedSelection(df, Seq("g"), col("id"), col("t"), col("s"), 0L)
  }

  test("clusterBalanced: quota respected per cluster, sample monotone in quota") {
    val df = (1L to 40L).map(i => (i, i % 3)).toDF("id", "c")
    val q4 = Sampling.clusterBalanced(df, "id", "c", quota = 4).collect()
    q4.groupBy(_.getLong(1)).values.foreach(_.length should be <= 4)
    q4.map(_.getInt(2)).max should be <= 4
    // monotone: the quota-4 picks are exactly the pick_rank <= 4 prefix of quota-8
    val q8 = Sampling.clusterBalanced(df, "id", "c", quota = 8).collect()
      .filter(_.getInt(2) <= 4).map(r => (r.getLong(0), r.getLong(1))).toSet
    q4.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe q8
    an[IllegalArgumentException] should be thrownBy
      Sampling.clusterBalanced(df, "id", "c", quota = 0)
  }
}
