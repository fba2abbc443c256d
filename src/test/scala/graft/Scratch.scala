package graft

import org.apache.spark.sql.SparkSession

/** Test-scope probe main (never ships in the library jar): time named catalog
  * queries in a bench-identical session; each name is timed as given, so pass
  * a name twice for warm/steady pairs. Run via
  * `sbt "Test/runMain graft.Scratch sf0.1:q25_ngram_jaccard"`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // each arg is `name` (timed on sfDir), `sf0.01:name` (timed on that SF),
    // or `explain:name` / `explain:sf0.01:name` (prints the formatted plan)
    val names = if (args.isEmpty) Seq("q24_simhash", "q24_simhash") else args.toSeq
    names.foreach { spec =>
      val (explain, rest) =
        if (spec.startsWith("explain:")) (true, spec.stripPrefix("explain:"))
        else (false, spec)
      val (dir, name) = rest.split(":") match {
        case Array(sf, n) => (s"/root/testdata/$sf", n)
        case Array(n)     => (sfDir, n)
      }
      if (explain) {
        println(s"===== $name =====")
        try SparkEntry.queries(name)(spark, dir).explain("formatted")
        catch { case e: Throwable => System.err.println(s"[scratch] $spec failed: $e") }
      } else {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[scratch] $spec failed: $e") }
        finally graft.util.Caches.releaseAll() // runner discipline: no cross-run block buildup
        println(f"[scratch] $spec%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
