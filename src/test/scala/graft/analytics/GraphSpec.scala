package graft.analytics

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reimplementation of the fixed-point recurrence (plain Scala
    * maps and Long arithmetic) — the spec's oracle. */
  private def reference(
      nodes: Seq[Long], edges: Seq[(Long, Long, Long)],
      iters: Int, dampingPct: Long, s: Long): Map[Long, Long] = {
    val n = nodes.size
    val outw = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    var r = nodes.map(_ -> s / n).toMap
    for (_ <- 1 to iters) {
      val contrib =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v, w) <- edges) contrib(v) += r(u) * w / outw(u)
      r = nodes.map(v => v ->
        ((100L - dampingPct) * s / (100L * n) + dampingPct * contrib(v) / 100L)).toMap
    }
    r
  }

  private val nodes4 = Seq(1L, 2L, 3L, 4L)
  // weighted, with a dangling node (3 has no out-edges) and an isolated one (4)
  private val edges4 = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L))

  test("pageRankFixedPoint matches an independent in-memory fold exactly") {
    val out = Graph.pageRankFixedPoint(
        nodes4.toDF("v"), "v", edges4.toDF("s", "d", "w"), "s", "d", "w",
        iterations = 6)
      .as[(Long, Long)].collect().toMap
    out shouldBe reference(nodes4, edges4, 6, 85L, 1000000000L)
  }

  test("rank order follows incoming mass; teleport keeps isolated nodes alive") {
    val out = Graph.pageRankFixedPoint(
        nodes4.toDF("v"), "v", edges4.toDF("s", "d", "w"), "s", "d", "w")
      .as[(Long, Long)].collect().toMap
    // 3 receives from both 1 and 2; 2 receives 3/4 of 1's mass; 4 only teleports
    out(3L) should be > out(2L)
    out(2L) should be > out(4L)
    out(4L) should be > 0L
    // dangling mass decays but never inflates: total stays under the scale
    out.values.sum should be <= 1000000000L
  }

  test("invalid parameters are rejected") {
    val n = nodes4.toDF("v"); val e = edges4.toDF("s", "d", "w")
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRankFixedPoint(n, "v", e, "s", "d", "w", iterations = 0)
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRankFixedPoint(n, "v", e, "s", "d", "w", dampingPct = 100)
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRankFixedPoint(n, "v", e, "s", "d", "w", scale = 0L)
  }
}
