package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Each query is fully materialized through the `noop` sink
  * (NOT `count()`, which would let Catalyst prune most of the work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: first-touch costs (Hadoop FS init, parquet footer
    // readers, whole-stage codegen + Janino, shuffle machinery, broadcast
    // infra) land here instead of inside the first timed query.
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy(col("l_returnflag")).count()
        .write.format("noop").mode("overwrite").save()
      li.orderBy(col("l_orderkey")).limit(1000)
        .write.format("noop").mode("overwrite").save()
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      spark.read.parquet(s"$sfDir/orders.parquet")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(aggregate(transform(split(col("text"), " "), w => length(w)),
          lit(0), (a, x) => a + x))
        .write.format("noop").mode("overwrite").save()
    }
    // Steady-state timing: each query first runs untimed at the SMALLEST
    // scale factor available (same plan shapes → same Janino codegen classes
    // and the same interpreted-expression paths get JIT-compiled, at ~1% of
    // the data cost), then the timed run at the target SF measures the
    // warmed engine — the number that reflects throughput on a long-running
    // cluster rather than single-JVM cold-start. Keeping the warmup cheap
    // also keeps total CPU burn low, which matters on burst-throttled VMs.
    val warmDir = {
      val target = new java.io.File(sfDir).getCanonicalFile
      // smallest available SF that is STRICTLY smaller than the target —
      // warming on a larger SF would cost more than the timed run itself.
      // A non-sf-named target (custom dir) has no parsable size: warm on it
      // directly rather than crash before the first query.
      def sf(f: java.io.File): Option[Double] =
        scala.util.Try(f.getName.stripPrefix("sf").toDouble).toOption
      val candidates = Seq("sf0.001", "sf0.01")
        .map(n => new java.io.File(target.getParentFile, n).getCanonicalFile)
      (for {
        targetSf <- sf(target)
        warm <- candidates.find(f =>
          f.isDirectory && f != target && sf(f).exists(_ < targetSf))
      } yield warm.getPath).getOrElse(target.getPath)
    }
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    // one warmup pass over the whole catalog at the small SF
    catalog.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name warmup failed: $e") }
      finally graft.util.Caches.releaseAll()
    }
    // second untimed pass at the TARGET SF: the small-SF pass compiles the
    // plans (Janino) but its few hundred rows leave the interpreted-
    // expression paths below the JVM's C2 thresholds — one pass at real
    // volume JIT-compiles the hot loops, so the timed passes measure PLANS,
    // not compiler tiering (the r8 bimodality: a query's first timed passes
    // ran 3-5× its final steady-state pass on an unchanged plan).
    catalog.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name target warmup failed: $e") }
      finally graft.util.Caches.releaseAll()
    }
    System.gc()
    // median of three timed runs, taken as three INTERLEAVED passes over
    // the catalog rather than back-to-back per query: VM/cgroup CPU
    // throttling arrives in multi-minute windows that would hit all three
    // consecutive runs of one query at once — spreading a query's samples
    // across the whole bench decorrelates them, so the median survives any
    // single throttle window (back-to-back medians kept generating false
    // regression alarms like r3's q23 and r4's q104)
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (pass <- 1 to 3) {
      for ((name, fn) <- catalog) {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name failed: $e")
        }
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
        // release layout-pinning persists outside the timed span (unpersist
        // is non-blocking and cheap; the persist+count is inside, as before)
        graft.util.Caches.releaseAll()
      }
      // reset heap pressure between passes so accumulated session garbage
      // (broadcasts, codegen classes, state-store files) lands in an
      // untimed GC instead of skewing a random query's sample
      System.gc()
    }
    val results = catalog.map { case (name, _) => name -> samples(name).sorted }
    val qs = results.map { case (k, t) => "\"" + k + "\":" + t(1) }
      .mkString("{", ",", "}")
    // per-query [min, max] so a reader can tell real regressions from noise
    val spread = results.map { case (k, t) =>
      "\"" + k + "\":[" + t.head + "," + t.last + "]" }
      .mkString("{", ",", "}")
    // raw per-pass samples in CHRONOLOGICAL order (pass 1, 2, 3): a VM
    // throttle window stalls one wall-clock span, so with raw passes a
    // reader can attribute correlated outliers to a single pass instead of
    // reading ten queries' spreads as ten independent regressions
    val passes = catalog.map { case (name, _) =>
      "\"" + name + "\":[" + samples(name).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2(1)).sum
    // best-of-3 total alongside the median: a harness/VM stall inflates
    // medians but rarely all three interleaved passes, so a plan regression
    // moves BOTH numbers while throttle noise moves only the median —
    // making the next regression diagnosable from this JSON alone
    val totalBest = results.map(_._2.head).sum
    // a throwing query "benches" at time-to-exception — flag it in the
    // machine-readable line so a broken engine can never look FAST
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"value_best":$totalBest,"unit":"sec","queries":$qs,"spread":$spread,"passes":$passes$failedJson,"sf":"$sfDir"}"""
    println(json)
    // provenance copy for anyone reading the repo rather than the run log
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    catch { case _: java.io.IOException => () }
    spark.stop()
  }
}
