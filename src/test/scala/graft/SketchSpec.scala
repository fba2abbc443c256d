package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates have no cross-engine oracle (approximate by design);
  * instead, bound the estimates against exact answers on real data. */
class SketchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct is within its default 5% rsd of the exact count") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    rows should not be empty
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      math.abs(approx - exact) / exact should be < 0.15 // 3x default rsd
    }
  }

  test("percentile_approx brackets the exact median") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val approx = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))).collect().head.getDouble(0)
    val sorted = li.select(col("l_extendedprice")).orderBy(col("l_extendedprice"))
      .collect().map(_.getDouble(0))
    val exact = sorted(sorted.length / 2)
    math.abs(approx - exact) / exact should be < 0.02
  }

  // ------------------------------------------------- Misra–Gries laws

  /** Exact frequencies of a reference stream. */
  private def freq(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Assert the two MG invariants of `sketch` against stream `xs`:
    * 0 ≤ f(x) − est(x) ≤ N/(k+1) for every x, and every x with
    * f(x) > N/(k+1) is present. */
  private def assertMgInvariants(
      xs: Seq[String], k: Int, sketch: Map[String, Long]): Unit = {
    val f = freq(xs)
    val slack = xs.size.toDouble / (k + 1)
    sketch.keySet.foreach(x => assert(f.contains(x), s"phantom key $x"))
    f.foreach { case (x, n) =>
      val est = sketch.getOrElse(x, 0L)
      withClue(s"key $x (f=$n est=$est slack=$slack): ") {
        est should be <= n
        est.toDouble should be >= n - slack
        if (n > slack) sketch.keySet should contain(x)
      }
    }
    sketch.size should be <= k
  }

  private def mgStream(): Seq[String] = {
    // Zipf-ish: key_i appears ~ 2000/i times, plus a long tail of singletons
    val heads = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"key_$i"))
    val tail = (1 to 3000).map(i => s"tail_$i")
    // deterministic shuffle: interleave by a fixed stride
    val all = (heads ++ tail).zipWithIndex
    all.sortBy { case (_, i) => (i * 7919) % all.size }.map(_._1)
  }

  test("MisraGries invariants hold for sequential reduce (k smaller than vocab)") {
    val xs = mgStream()
    for (k <- Seq(5, 16, 64)) {
      val mg = new graft.functions.MisraGries(k)
      val sketch = xs.foldLeft(mg.zero)(mg.reduce)
      assertMgInvariants(xs, k, sketch)
    }
  }

  test("MisraGries invariants survive arbitrary split + merge trees") {
    val xs = mgStream()
    val mg = new graft.functions.MisraGries(16)
    // several partitionings, including skewed and many tiny parts
    val splits = Seq(
      xs.grouped(100).toSeq,
      xs.grouped(1).toSeq.take(500) :+ xs.drop(500),
      Seq(xs.take(13), xs.slice(13, 6000), xs.drop(6000)))
    splits.foreach { parts =>
      val partials = parts.map(_.foldLeft(mg.zero)(mg.reduce))
      // left-fold merge AND a balanced binary merge must both satisfy the laws
      val folded = partials.foldLeft(mg.zero)(mg.merge)
      def tree(ps: Seq[Map[String, Long]]): Map[String, Long] = ps match {
        case Seq(one) => one
        case _ =>
          val (l, r) = ps.splitAt(ps.size / 2)
          mg.merge(tree(l), tree(r))
      }
      assertMgInvariants(xs, 16, folded)
      assertMgInvariants(xs, 16, tree(partials))
    }
  }

  test("MisraGries is exact when k is at least the distinct-key count") {
    val xs = Seq("a", "b", "a", "c", "a", "b")
    val mg = new graft.functions.MisraGries(8)
    val viaMerge = mg.merge(
      xs.take(3).foldLeft(mg.zero)(mg.reduce),
      xs.drop(3).foldLeft(mg.zero)(mg.reduce))
    viaMerge shouldBe Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
  }

  test("heavyHitters ships O(k) rows and its estimates obey the bounds (any partitioning)") {
    val xs = mgStream()
    import spark.implicits._
    for (parts <- Seq(1, 4, 13)) {
      val df = xs.toDF("k").repartition(parts)
      val rows = graft.ext.Profiling.heavyHitters(df, "k", 16).collect()
      rows.length should be <= 16
      val sketch = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      assertMgInvariants(xs, 16, sketch)
    }
  }

  // ------------------------------------------------- count-min laws

  // Independent reference model: same md5-derived hash and (a·h+b) mod p
  // mod w family as Profiling.countMin, recomputed from first principles so
  // a constant drift or overflow in either side breaks the bit-equality law.
  private val cmsP = 2147483647L
  private val cmsA = Seq(1103515245L, 1299709L, 15485863L, 32452843L)
  private val cmsB = Seq(12345L, 7919L, 104729L, 1299721L)

  private def h48(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }

  private def cmsBuckets(s: String, width: Int): Seq[(Int, Long)] = {
    val hp = h48(s) % cmsP
    (0 until 4).map(j => j -> ((cmsA(j) * hp + cmsB(j)) % cmsP) % width)
  }

  test("countMin is reference-exact, partitioning-independent, and never underestimates") {
    val xs = mgStream()
    import spark.implicits._
    val f = freq(xs)
    val width = 512 // < vocab (~3k keys): collisions certain, est > f occurs
    val table = scala.collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    xs.foreach(s => cmsBuckets(s, width).foreach(jb => table(jb) += 1L))
    def refEst(s: String): Long = cmsBuckets(s, width).map(table).min
    // probes: 10 heaviest keys + 50 lexicographic (mostly tail) + an absent key
    val probeKeys = (f.toSeq.sortBy { case (k, n) => (-n, k) }.take(10).map(_._1) ++
      f.keys.toSeq.sorted.take(50) :+ "never_seen_key").distinct
    val byPartitioning = Seq(1, 4, 13).map { parts =>
      val cms = ext.Profiling.countMin(xs.toDF("k").repartition(parts), "k", 4, width)
      ext.Profiling.countMinLookup(cms, probeKeys.toDF("k"), "k", 4, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    byPartitioning.tail.foreach(_ shouldBe byPartitioning.head)
    val ests = byPartitioning.head
    ests.keySet shouldBe probeKeys.toSet
    probeKeys.foreach { k =>
      withClue(s"key $k (f=${f.getOrElse(k, 0L)}): ") {
        ests(k) should be >= f.getOrElse(k, 0L) // CMS law: never under
        ests(k) shouldBe refEst(k)              // bit-equal to the model
      }
    }
    // the heaviest key collides with at most slack, sanity: est is not wild
    ests("never_seen_key") shouldBe refEst("never_seen_key")
  }

  test("countMin table is at most depth*width rows and cells sum to depth*N") {
    val xs = mgStream()
    import spark.implicits._
    val cms = ext.Profiling.countMin(xs.toDF("k"), "k", 3, 64).collect()
    cms.length should be <= 3 * 64
    cms.map(_.getLong(2)).sum shouldBe 3L * xs.size
    cms.map(r => (r.getInt(0), r.getLong(1))).toSet should have size cms.length
  }

  test("heavyHittersAudit: top-N matches exact and both invariant booleans are true") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val audited = graft.ext.Profiling.heavyHittersAudit(toks, "token", 64, 10)
      .orderBy(col("cnt").desc, col("token")).collect()
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(10).collect()
    audited.map(r => (r.getString(0), r.getLong(1))) shouldBe
      exact.map(r => (r.getString(0), r.getLong(1)))
    audited.foreach { r =>
      withClue(s"row $r: ") {
        r.getBoolean(r.fieldIndex("est_ok")) shouldBe true
        r.getBoolean(r.fieldIndex("guarantee_ok")) shouldBe true
      }
    }
  }

  test("q39 emits all-true bound-check booleans (driver-gated shape)") {
    val rows = SparkEntry.queries("q39_sketches")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"row $r: ") {
        r.getBoolean(r.fieldIndex("orders_ok")) shouldBe true
        r.getBoolean(r.fieldIndex("p50_ok")) shouldBe true
        r.getBoolean(r.fieldIndex("p99_ok")) shouldBe true
      }
    }
  }
}
