package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe main (removed before final round): checks environment
  * behaviors the query catalog depends on. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. nanos timestamp parquet
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      println("events count = " + ev.count())
      println("events no-ts select: " + ev.select("event_id", "user_id").count())
    } catch { case e: Throwable => println("EVENTS READ FAIL: " + e) }

    // 2. conv/md5 parity vs duckdb (expect 158335321521362 for 'abc')
    spark.sql("SELECT CAST(conv(substr(md5(CAST('abc' AS BINARY)),1,12),16,10) AS BIGINT) AS h").show()

    // 3. nested HOF lambda (simhash inner aggregate referencing outer var b)
    spark.sql(
      """SELECT aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, b) ->
        |  acc + CASE WHEN aggregate(array(1L, 2L, 3L), CAST(0 AS BIGINT),
        |    (s, h) -> s + (2 * (shiftright(h, b) & 1) - 1)) > 0
        |  THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)""".stripMargin).show()

    // 4. double fold over float array
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.limit(2).select(
      col("vec_id"),
      expr("aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("dot")
    ).show(false)

    // 5. hex of binary substr
    spark.sql("SELECT hex(CAST(substr('hello', 1, 4) AS BINARY)), ascii('hello'), octet_length(CAST('hello' AS BINARY))").show()

    // 6. lineitem shipdate type
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select("l_shipdate").printSchema()

    spark.stop()
  }
}
