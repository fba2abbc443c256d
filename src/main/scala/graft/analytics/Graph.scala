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

  /** Triangle enumeration via degree orientation — the O(m^1.5) distributed
    * algorithm, not the naive triple join.
    *
    * Edges are first canonicalized to distinct undirected pairs, then each
    * edge is ORIENTED from its lower-(degree, id) endpoint to the higher one.
    * The orientation is acyclic and bounds every node's out-degree by
    * O(√m), so the wedge-generation self-join (the quadratic step of any
    * triangle algorithm) produces Σ outdeg(v)² = O(m^1.5) candidate wedges
    * even on power-law graphs — a hub of degree 10^6 contributes its
    * *in*-edges, which generate nothing. Each wedge (a→b, a→c) is then
    * closed by one hash semi-join against the oriented edge set. Three
    * shuffles total (degree agg, wedge join, closing join), all on node
    * keys; no step materializes more than the wedge set.
    *
    * Returns one row per triangle {a, b, c} with `a < b < c` — each
    * triangle exactly once (the oriented wedge (x→y, x→z) with y–z closed
    * identifies a triangle by its unique minimum-(degree, id) corner).
    *
    * @param edges undirected edge list; self-loops are dropped, duplicates
    *              and reversed duplicates collapse
    */
  def triangles(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("__u"),
        greatest(col(srcCol), col(dstCol)).as("__v"))
      .where(col("__u") =!= col("__v") &&
        col("__u").isNotNull && col("__v").isNotNull)
      .distinct()
      .localCheckpoint() // consumed 3× (degrees, wedges, closing join)
    val deg = und.select(col("__u").as("__n"))
      .unionAll(und.select(col("__v").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    // orient each edge from the endpoint with the smaller (degree, id)
    val oriented = und
      .join(deg.withColumnRenamed("__n", "__u").withColumnRenamed("__d", "__du"), "__u")
      .join(deg.withColumnRenamed("__n", "__v").withColumnRenamed("__d", "__dv"), "__v")
      .select(
        when(col("__du") < col("__dv") ||
          (col("__du") === col("__dv") && col("__u") < col("__v")),
          col("__u")).otherwise(col("__v")).as("__s"),
        when(col("__du") < col("__dv") ||
          (col("__du") === col("__dv") && col("__u") < col("__v")),
          col("__v")).otherwise(col("__u")).as("__t"))
      .localCheckpoint() // consumed 2× (both wedge arms + closing join)
    val wedges = oriented.select(col("__s"), col("__t").as("__b"))
      .join(oriented.select(col("__s"), col("__t").as("__c")), "__s")
      .where(col("__b") < col("__c")) // each unordered out-pair once
    wedges
      .join(oriented.select(
          least(col("__s"), col("__t")).as("__wu"),
          greatest(col("__s"), col("__t")).as("__wv")),
        least(col("__b"), col("__c")) === col("__wu") &&
          greatest(col("__b"), col("__c")) === col("__wv"),
        "left_semi")
      .select(
        least(col("__s"), col("__b"), col("__c")).as("a"),
        array_sort(array(col("__s"), col("__b"), col("__c"))).getItem(1).as("b"),
        greatest(col("__s"), col("__b"), col("__c")).as("c"))
  }

  /** Bounded-depth BFS: minimum hop count (≤ `maxHops`) from any seed to
    * every reachable node, over DIRECTED edges. Returns (`nodeCol`, hop)
    * with hop 0 for the seeds themselves.
    *
    * Scale shape: each round is one equi-join (current frontier × edges) +
    * one distinct + one anti-join against the visited set — all keyed on
    * node ids, no broadcast of unbounded sets. The frontier and visited
    * tables are `localCheckpoint`ed every round, so lineage stays one round
    * deep instead of compounding (the classic iterative-plan blowup). The
    * visited set is O(reachable nodes); at 100 TB-scale graphs both sides
    * of every join shuffle on the same key so AQE can pick sizes.
    */
  def kHopReachable(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative, got $maxHops")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__t"))
      .where(col("__s").isNotNull && col("__t").isNotNull)
      .distinct()
      .localCheckpoint() // consumed once per round
    var reached = seeds.select(col(seedCol).as("__node")).distinct()
      .select(col("__node"), lit(0).cast("int").as("hop"))
      .localCheckpoint()
    var frontier = reached
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      frontier = frontier.join(e, col("__node") === col("__s"))
        .select(col("__t").as("__node")).distinct()
        .join(reached.select("__node"), Seq("__node"), "left_anti")
        .select(col("__node"), lit(h).cast("int").as("hop"))
        .localCheckpoint()
      reached = reached.unionAll(frontier).localCheckpoint()
    }
    reached.select(col("__node").as(seedCol), col("hop"))
  }
}
