package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional third arg: comma-separated name prefixes — run (and list in
    // the manifests) only the matching subset, for fast local iteration.
    // The driver passes exactly two args, so its runs are always complete.
    val selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      args.drop(2).headOption match {
        case Some(prefixes) =>
          val ps = prefixes.split(",").map(_.trim).filter(_.nonEmpty)
          SparkEntry.queries.filter { case (n, _) => ps.exists(n.startsWith) }
        case None => SparkEntry.queries
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_PIN_MODE=checkpoint: run the whole sweep under the
    // production pin mode (util/Caches.pin) — reliable checkpoints on a
    // temp dir standing in for the cluster FS. Set at BUILDER time so it
    // lands in the SparkContext's SparkConf, which catalog gates' isolated
    // child sessions re-merge at creation.
    val pinMode = sys.env.get("SPARK_GRAFT_PIN_MODE")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries nanosecond timestamps — read as raw long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // the correctness sweep runs on a deliberately SMALL session (4
      // threads, often right after 280 other queries) where wall-clock
      // serving budgets are meaningless — give the serving gates' SLO
      // asserts generous headroom HERE; the 32-thread bench leaves the
      // conf unset, so the gates' real budgets are enforced there, where
      // the latency story is actually measured
      .config("spark.graft.serve.sloMs",
        sys.env.getOrElse("SPARK_GRAFT_SERVE_SLO_MS", "30000"))
    val spark = pinMode.fold(builder)(m =>
      builder.config("spark.graft.pin.mode", m)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pinMode.foreach { m =>
      if (m == "checkpoint" && spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(
          Files.createTempDirectory("graft_verify_ckpt").toString)
      System.err.println(s"[verify] pin mode: $m (checkpoint dir: " +
        s"${spark.sparkContext.getCheckpointDir.getOrElse("none")})")
    }
    // schema-drift canary: one diagnostic line per run so a fixture vintage
    // change (e.g. round 6's events.ts int64-nanos → timestamp[us]) shows up
    // in the round log as a schema diff, not 30 opaque analysis errors.
    try {
      val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
      System.err.println("[verify] events schema (raw): " +
        raw.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    } catch { case e: Throwable =>
      System.err.println(s"[verify] events schema probe failed: ${e.getMessage}")
    }
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // poison any stale output from a previous run into this outDir —
        // otherwise the gate would compare old data and report a false OK
        graft.util.Fs.deleteRecursively(Paths.get(outDir, name))
      } finally
        // the parquet write above fully materialized the result, so any
        // layout-pinning persist the query registered can go now — a
        // full-catalog session holds one query's cache at a time
        graft.util.Caches.releaseAll()
    }
    // the full catalog, so the gate can detect a query whose output is
    // MISSING (failed + poisoned) rather than only checking what exists
    Files.writeString(
      Paths.get(s"$outDir/queries.json"),
      selected.keys.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
