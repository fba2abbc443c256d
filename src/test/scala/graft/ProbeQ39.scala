package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose q39's cost: which member of the base aggregate is slow? */
object ProbeQ39 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("count only") {
        noop(li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")))
      }
      t("countDistinct") {
        noop(li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("d")))
      }
      t("approx_count_distinct") {
        noop(li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey")).as("d")))
      }
      t("percentile_approx acc=10000 x2") {
        noop(li.groupBy(col("l_returnflag")).agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("b")))
      }
      t("percentile_approx acc=1000 x2") {
        noop(li.groupBy(col("l_returnflag")).agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("b")))
      }
      t("full q39 base agg") {
        noop(li.groupBy(col("l_returnflag")).agg(
          approx_count_distinct(col("l_orderkey")).as("ac"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap50"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("ap99"),
          count(lit(1)).as("n_rows")))
      }
    }
    spark.stop()
  }
}
