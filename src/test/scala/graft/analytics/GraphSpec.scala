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

  /** Brute-force triangle oracle: all id-ordered triples with all three
    * canonical edges present. */
  private def triRef(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val ns = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      a <- ns; b <- ns if a < b && und((a, b))
      c <- ns if b < c && und((b, c)) && und((a, c))
    } yield (a, b, c)).toSet
  }

  test("triangles matches the brute-force oracle, once per triangle") {
    // K4 on 1-4 (4 triangles) + a pendant + a separate triangle with a hub
    // of high degree, plus duplicate / reversed / self-loop noise
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L),
      (6L, 7L), (7L, 8L), (8L, 6L),
      (2L, 1L), (3L, 3L), (1L, 2L)) // noise: reversed dup, self-loop, dup
    val out = Graph.triangles(edges.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect()
    out.length shouldBe out.toSet.size // no triangle emitted twice
    out.toSet shouldBe triRef(edges)
    out.foreach { case (a, b, c) => a should be < b; b should be < c }
  }

  test("triangles on a triangle-free graph is empty") {
    // a star plus a path: no triangles
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L))
    Graph.triangles(edges.toDF("x", "y"), "x", "y").count() shouldBe 0L
  }

  test("kHopReachable gives minimum hop counts, bounded by maxHops") {
    // 1 → 2 → 3 → 4 → 5 chain, plus shortcut 1 → 3 and a cycle back 4 → 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (4L, 1L))
      .toDF("s", "d")
    val out = Graph.kHopReachable(e, "s", "d", Seq(1L).toDF("n"), "n", 3)
      .as[(Long, Int)].collect().toMap
    out shouldBe Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3)
    // tighter bound cuts the frontier, and hop 0 is just the seeds
    Graph.kHopReachable(e, "s", "d", Seq(1L).toDF("n"), "n", 1)
      .as[(Long, Int)].collect().toMap shouldBe Map(1L -> 0, 2L -> 1, 3L -> 1)
    Graph.kHopReachable(e, "s", "d", Seq(1L).toDF("n"), "n", 0)
      .as[(Long, Int)].collect().toMap shouldBe Map(1L -> 0)
  }

  test("kHopReachable with multiple seeds takes the closest one") {
    val e = Seq((1L, 2L), (2L, 3L), (9L, 3L)).toDF("s", "d")
    val out = Graph.kHopReachable(e, "s", "d", Seq(1L, 9L).toDF("n"), "n", 5)
      .as[(Long, Int)].collect().toMap
    out shouldBe Map(1L -> 0, 9L -> 0, 2L -> 1, 3L -> 1)
  }
}
