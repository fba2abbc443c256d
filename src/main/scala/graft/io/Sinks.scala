package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sinks (reference S3/S4, SURVEY.md §2.1).
  *
  * The reference's DB sink collects every micro-batch to the driver and writes
  * row-at-a-time through JPA (SparkStreamingService.java:262-277) — the known
  * bottleneck (BASELINE.md). The Spark-native sink keeps the write distributed:
  * `foreachBatch` + a partition-parallel writer, with the same `update` output
  * mode + 1 s processing-time trigger + append (historized) semantics.
  */
object Sinks {

  /** Historized stats sink: every micro-batch APPENDS the batch's cumulative
    * snapshot rows (keyed by game `second`) — reference semantics
    * (update mode + append-style sink, SURVEY.md §7.4.6). `write` receives the
    * batch DataFrame and performs the distributed append (JDBC/parquet/Delta —
    * injected so tests can capture batches). */
  def historizedSink[T](
      stats: Dataset[T],
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      checkpoint: Option[String] = None)(
      write: (DataFrame, Long) => Unit): DataStreamWriter[T] = {
    val w = stats.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (df: Dataset[T], batchId: Long) =>
        write(df.toDF(), batchId)
      }
    checkpoint.fold(w)(p => w.option("checkpointLocation", p))
  }

  /** Distributed JDBC append for a batch — what the reference's collect+JPA
    * loop should have been. Executors write partition-parallel. */
  def jdbcAppend(df: DataFrame, url: String, table: String, props: java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)

  /** Replay-idempotent JDBC append — effectively-once delivery on top of
    * foreachBatch's at-least-once replay: rows are tagged with the micro-
    * batch id, and a replayed batch first deletes its own previous
    * (possibly partial) attempt before appending. Restart-safe without
    * distributed transactions; pair with a checkpointed query so batch ids
    * are stable across restarts. The delete is a no-op (absent table /
    * nothing matching) on the first attempt. */
  def idempotentJdbcAppend(
      df: DataFrame, batchId: Long,
      url: String, table: String, props: java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // existence check via metadata instead of a swallow-all catch around
      // the DELETE — a real SQL failure must surface, not masquerade as
      // "first batch". Handles an optional schema qualifier; an unqualified
      // name is resolved against the connection's CURRENT schema so a
      // same-named table elsewhere can neither false-positive (crashing the
      // first batch) nor false-negative (skipping the replay delete). The
      // column is quoted because Spark's JDBC writer creates quoted
      // (case-exact) identifiers.
      val (schemaPart, namePart) = table.split("\\.") match {
        case Array(sch, n) => (Some(sch), n)
        case _             => (Option(conn.getSchema), table) // may be null: name-only match
      }
      // Pass the name patterns into the metadata call so the scan is scoped to
      // the one table (a catalog-wide getTables is slow on large catalogs).
      // Spark's JDBC writer creates case-exact identifiers, so match both the
      // exact name and the driver's identifier-case normalization of it.
      val meta = conn.getMetaData
      def found(pattern: String): Boolean = {
        val rs = meta.getTables(null, schemaPart.orNull, pattern, Array("TABLE"))
        try {
          var exists = false
          while (!exists && rs.next())
            exists = rs.getString("TABLE_NAME").equalsIgnoreCase(namePart) &&
              schemaPart.forall(_.equalsIgnoreCase(rs.getString("TABLE_SCHEM")))
          exists
        } finally rs.close()
      }
      val exists = found(namePart) || found(namePart.toUpperCase) || found(namePart.toLowerCase)
      if (exists) {
        val ps = conn.prepareStatement(s"""DELETE FROM $table WHERE "batch_id" = ?""")
        try { ps.setLong(1, batchId); ps.executeUpdate() } finally ps.close()
      }
    } finally conn.close()
    df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("append").jdbc(url, table, props)
  }

  /** Console sink (reference S3, SparkStreamingService.java:239-250). */
  def consoleSink[T](stats: Dataset[T]): DataStreamWriter[T] =
    stats.writeStream.outputMode("update").format("console")

  /** Parquet append sink for a batch — the test/local stand-in for Postgres. */
  def parquetAppend(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Hive-style partitioned parquet append: the 100 TB table LAYOUT. Readers
    * filtering on the partition columns scan only matching directories
    * (partition pruning — `PartitionFilters` at the scan, no data read
    * elsewhere), and each partition can be compacted/retired independently.
    * Partition on low-cardinality, always-filtered columns (event date,
    * source, language) — never on high-cardinality keys, which would
    * explode the file count. */
  def partitionedParquetAppend(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)
}
