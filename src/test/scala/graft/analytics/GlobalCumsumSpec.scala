package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GlobalCumsumSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val data = rnd.shuffle((1L to 500L).toList)
    .map(k => (k, (k % 13) + 1)).toDF("k", "v")

  test("cumsumBefore matches the naive single-partition window exactly") {
    val naive = data.withColumn("c",
        coalesce(sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq
    val scaled = GlobalCumsum.cumsumBefore(data, Seq(col("k")), col("v"), "c")
      .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq
    scaled shouldBe naive
  }

  test("cumsumBefore is partition-count invariant (1, 4, 17 partitions)") {
    val outs = Seq(1, 4, 17).map { p =>
      GlobalCumsum.cumsumBefore(data, Seq(col("k")), col("v"), "c", p)
        .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq
    }
    outs(1) shouldBe outs(0)
    outs(2) shouldBe outs(0)
  }

  test("descending order carries through both phases") {
    val naive = data.withColumn("c",
        coalesce(sum(col("v")).over(Window.orderBy(col("k").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq
    GlobalCumsum.cumsumBefore(data, Seq(col("k").desc), col("v"), "c", 5)
      .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq shouldBe naive
  }

  test("rowNumber matches row_number() over the global order") {
    val naive = data.withColumn("rn",
        row_number().over(Window.orderBy(col("k"))).cast("long"))
      .orderBy("k").select("k", "rn").as[(Long, Long)].collect().toSeq
    GlobalCumsum.rowNumber(data, Seq(col("k")), "rn", 6)
      .orderBy("k").select("k", "rn").as[(Long, Long)].collect().toSeq shouldBe naive
  }

  test("ntile matches ntile() for even, ragged, and more-buckets-than-rows splits") {
    Seq(4, 7, 13, 499, 500, 600).foreach { b =>
      val naive = data.withColumn("q",
          ntile(b).over(Window.orderBy(col("v"), col("k"))).cast("long"))
        .orderBy("k").select("k", "q").as[(Long, Long)].collect().toSeq
      val scaled = GlobalCumsum
        .ntile(data, Seq(col("v"), col("k")), b, "q", 5)
        .orderBy("k").select("k", "q").as[(Long, Long)].collect().toSeq
      withClue(s"buckets=$b") { scaled shouldBe naive }
    }
  }

  test("cumsumBeforeWithTotals: totals are exact AND read the pinned exchange, not the input") {
    val grouped = data.withColumn("g", col("k") % 3)
    // AQE off for the shape assertion only (AdaptiveSparkPlanExec is opaque
    // to TreeNode.collect)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (cum, totals) = GlobalCumsum.cumsumBeforeWithTotals(
      grouped, Seq(col("g"), col("k")), col("v"), "c", Seq("g"), "t", 5)
    try {
      // values: totals == a plain groupBy-sum; cumsum == the naive window
      val naiveTotals = grouped.groupBy(col("g")).agg(sum(col("v")).as("t"))
        .orderBy("g").as[(Long, Long)].collect().toSeq
      totals.orderBy("g").as[(Long, Long)].collect().toSeq shouldBe naiveTotals
      val naive = grouped.withColumn("c",
          coalesce(sum(col("v")).over(Window.orderBy(col("g"), col("k"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq
      cum.orderBy("k").select("k", "c")
        .as[(Long, Long)].collect().toSeq shouldBe naive
      // single-pass property: the totals plan reads the persisted ranged
      // frame (InMemoryTableScan) and NEVER re-executes the input lineage —
      // node-level collect does not descend into the cached relation's inner
      // plan, so any LocalTableScan node here would be a live re-execution
      val exec = totals.queryExecution.executedPlan
      exec.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
      } should not be empty
      exec.collect {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      } shouldBe empty
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      graft.util.Caches.releaseAll()
    }
  }

  test("the corpus-sized frame never goes through a no-partition window") {
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect);
    // disable it for the shape assertion only
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try GlobalCumsum.cumsumBefore(data, Seq(col("k")), col("v"), "c", 4)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // exactly two windows: the per-partition local cumsum (keyed by __pid)
    // and the P-row offsets frame (unkeyed, bounded by partition COUNT)
    windows.count(_.partitionSpec.isEmpty) shouldBe 1
    windows.count(_.partitionSpec.nonEmpty) shouldBe 1
    // and the unkeyed one sits above the per-partition totals aggregate,
    // never above the raw frame
    val unkeyed = windows.filter(_.partitionSpec.isEmpty).head
    assert(unkeyed.child.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.nonEmpty, s"offsets window must read the P-row aggregate:\n$unkeyed")
  }
}
