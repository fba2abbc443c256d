package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics. Transitive closure / dedup clustering lives in
  * `ext/Dedup.connectedComponents`; this hosts the rank-style iterations.
  *
  * Determinism: [[pageRankFixedPoint]] works entirely in FIXED-POINT BIGINT
  * arithmetic (ranks scaled by `scale`), so every step is an integer multiply
  * + truncating div — associative-safe and bit-identical across engines and
  * partitionings, where float PageRank drifts with summation order. */
object Graph {

  /** Fixed-point integer PageRank.
    *
    * rank'(v) = ((100−d)·S) div (100·N) + (d · Σ_{(u,v,w)} (rank(u)·w div outw(u))) div 100
    *
    * with all terms BIGINT. Dangling-node mass is not redistributed (the
    * standard simplification — total mass decays slightly per iteration).
    * Overflow bound: `scale · max_edge_weight · dampingPct < 2^63`.
    *
    * Scale shape: `edges` is aggregated with per-source total weight ONCE
    * and localCheckpointed (the expensive upstream join pipeline never
    * re-runs); each iteration is one equi-join of the checkpointed edge
    * table against the current rank vector + one hash aggregation. N =
    * `nodes.count()` is the one driver-side scalar. Rank vectors are
    * O(|nodes|) rows — Spark picks shuffle vs broadcast join per size (AQE);
    * iteration count is fixed, so lineage stays shallow (one join per
    * round referencing a checkpoint, not a growing recursive plan).
    *
    * @param nodes  one row per node (isolated nodes keep teleport rank)
    * @param edges  (src, dst, weight) — weights must be positive BIGINTs
    * @return (`nodeCol`, `rank_fp`) where rank_fp ≈ rank · scale
    */
  def pageRankFixedPoint(
      nodes: DataFrame, nodeCol: String,
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int = 8,
      dampingPct: Int = 85,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(dampingPct > 0 && dampingPct < 100,
      s"dampingPct must be in (0, 100), got $dampingPct")
    require(scale > 0, s"scale must be positive, got $scale")
    val ew = edges.select(
        col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(weightCol).cast("long").as("__w"))
      .withColumn("__outw",
        sum(col("__w")).over(Window.partitionBy(col("__src"))))
      .localCheckpoint() // consumed by every iteration — run upstream once
    val vs = nodes.select(col(nodeCol).as("__node"))
    val n = vs.count() // the one driver-side scalar: |nodes|
    require(n > 0, "pageRankFixedPoint needs a non-empty node set")
    val keep = 100L - dampingPct
    val tel = keep * scale / (100L * n) // == SQL's ((100−d)*S)//(100*N)
    var r = vs.select(col("__node"), lit(scale / n).as("__rank"))
    for (_ <- 1 to iterations) {
      val contrib = ew.join(r, col("__src") === col("__node"))
        .select(col("__dst"), expr("(__rank * __w) div __outw").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__sc"))
      r = vs.join(contrib, col("__node") === col("__dst"), "left")
        .select(col("__node"), (lit(tel) + expr(
          s"($dampingPct * coalesce(__sc, CAST(0 AS BIGINT))) div 100"))
          .as("__rank"))
    }
    r.select(col("__node").as(nodeCol), col("__rank").as("rank_fp"))
  }
}
