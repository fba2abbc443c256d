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
