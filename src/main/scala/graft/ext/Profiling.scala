package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the health check a pipeline runs before and after
  * every transformation at scale: row count, per-column null counts,
  * distinct cardinalities, and value ranges, one row per profiled column.
  *
  * The result is tall so downstream checks (null-rate alerts, cardinality
  * drift) are plain filters on the profile table rather than
  * schema-dependent column gymnastics.
  *
  * Shape: one independent two-stage aggregation PER COLUMN — project the
  * column, hash-aggregate its value counts (map-side partials collapse
  * duplicates before the shuffle, so the exchange carries distinct values,
  * not rows), then fold the grouped table into the 6 statistics. All k
  * branches run in one job over column-pruned scans, so a columnar source
  * reads each byte exactly once in total. This deliberately AVOIDS putting
  * `count_distinct` next to plain aggregates in one `agg`: Catalyst plans
  * mixed distinct/non-distinct aggregates as a (k+1)-way Expand of every
  * input row — measured 5× slower than this shape on the same data.
  *
  * `n_distinct` is EXACT (the per-column exchange carries the distinct set;
  * fine until a column's cardinality approaches the row count). At open-web
  * scale swap in `approx_count_distinct` — sketch-sized exchange, same tall
  * output — which is why the column is named `n_distinct` rather than
  * promising exactness in the schema. */
object Profiling {

  /** Exact interpolated per-key percentiles via ONE keyed sort — the fast
    * form of `percentile(x, p)` when a query needs several cut points over
    * the same ordering: the built-in aggregate buffers every value in a
    * per-group hash map (measured ~3× slower at sf0.1), while this ranks
    * once and picks the two bracketing rows per percentile with
    * conditional mins in a single downstream aggregation.
    *
    * Bit-compatible with Spark's `percentile` AND DuckDB's
    * `quantile_cont`: 0-based position `p·(n−1)` and the
    * `lo·(1−f) + hi·f` blend — the same IEEE tree, verified equal to the
    * last ulp (the naive `lo + f·(hi−lo)` is NOT). `valueCol` must be
    * non-null (the built-in skips nulls; a null here would rank first and
    * shift every pick). Returns one row per key: keys, `n` (group size),
    * then one DOUBLE column per `(name, p)` in `ps`. */
  def exactPercentiles(
      df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    validatePs(keys, valueCol, ps)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val ranked = df
      .select((keys.map(col) :+ col(valueCol)): _*)
      .select(col("*"),
        (row_number().over(w) - 1).cast("double").as("__rn"), // 0-based
        count(lit(1)).over(cw).as("__n"))
    pickAndBlend(ranked, keys, valueCol, ps)
  }

  /** [[exactPercentiles]] for LOW-cardinality keys over FACT-scale frames —
    * the regime where the window form's `partitionBy(keys)` funnels each
    * whole group through one task (3 groups over 100 TB = 3 tasks). The
    * in-group rank comes from [[graft.analytics.GlobalCumsum]]'s two-phase
    * range-partitioned scan over the total order (keys, value), minus each
    * group's exclusive base (an exclusive running sum of the group counts —
    * a |groups|-row window — broadcast back). No single-partition sort, no
    * per-group value buffers; identical picks, identical IEEE blend.
    *
    * The group-count aggregation is one extra pass over `df` versus the
    * window form — the price of never materializing a group in one task.
    * Same non-null `valueCol` contract. */
  def exactPercentilesGlobal(
      df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    validatePs(keys, valueCol, ps)
    val proj = df.select((keys.map(col) :+ col(valueCol)): _*)
    val counts = proj.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    val gw = org.apache.spark.sql.expressions.Window
      .orderBy(keys.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__base", coalesce(sum(col("__n")).over(gw), lit(0L)))
    val rn = graft.analytics.GlobalCumsum.rowNumber(
      proj, keys.map(col) :+ col(valueCol), "__grn")
    val ranked = rn
      .join(broadcast(offs), keys)
      .withColumn("__rn", (col("__grn") - col("__base") - 1).cast("double"))
    pickAndBlend(ranked, keys, valueCol, ps)
  }

  private def validatePs(
      keys: Seq[String], valueCol: String, ps: Seq[(String, Double)]): Unit = {
    require(ps.nonEmpty, "exactPercentiles needs at least one percentile")
    ps.foreach { case (n, p) =>
      require(p >= 0 && p <= 1, s"percentile $n must be in [0, 1], got $p") }
    val dupNames = ps.map(_._1).groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n }
    require(dupNames.isEmpty,
      s"duplicate percentile names: ${dupNames.mkString(", ")}")
    val clash = ps.map(_._1).filter(n => keys.contains(n) || n == valueCol)
    require(clash.isEmpty,
      s"percentile names collide with input columns: ${clash.mkString(", ")}")
    // "n" is the emitted group-size column; __rn/__n/__grn/__base and the
    // per-percentile __lo_/__hi_/__f_ columns are internal scratch. Only the
    // columns that SURVIVE the initial projection (keys + valueCol) can
    // actually collide — an unrelated input column named "n" is dropped
    // before any scratch or output column exists and must not be rejected.
    val surviving = keys :+ valueCol
    val reserved = Seq("__rn", "__n", "__grn", "__base", "n") ++
      ps.flatMap { case (n, _) => Seq(s"__lo_$n", s"__hi_$n", s"__f_$n") }
    reserved.foreach { r =>
      require(!surviving.contains(r), s"$r column name is reserved") }
    require(!ps.exists(_._1 == "n"),
      "percentile name 'n' is reserved for the group-size column")
  }

  /** Shared pick stage: `ranked` carries keys, `valueCol`, the 0-based
    * in-group rank `__rn` (double) and the group size `__n`; one hash
    * aggregation picks the two bracketing rows per percentile and blends
    * `lo·(1−f) + hi·f`. */
  private def pickAndBlend(
      ranked: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      Seq(
        min(when(col("__rn") === floor(pos), col(valueCol))).as(s"__lo_$name"),
        min(when(col("__rn") === ceil(pos), col(valueCol))).as(s"__hi_$name"),
        max(pos - floor(pos)).as(s"__f_$name"))
    } :+ max(col("__n")).as("n")
    ranked.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((keys.map(col) :+ col("n")) ++ ps.map { case (name, _) =>
        (col(s"__lo_$name") * (lit(1.0) - col(s"__f_$name"))
          + col(s"__hi_$name") * col(s"__f_$name")).as(name)
      }: _*)
  }

  /** Profile `cols` of `df`: (column, n_rows, n_null, n_distinct,
    * min_value, max_value) with the range endpoints rendered as strings so
    * heterogeneous column types share one schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val parts = cols.map { c =>
      df.select(col(c).as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
        .agg(
          lit(c).as("column"),
          // empty input ⇒ zero groups ⇒ sum is NULL: report 0 rows, not null
          coalesce(sum("__cnt"), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L)).as("n_null"),
          // count of non-null GROUPS = exact distinct count (NULL excluded,
          // matching count(DISTINCT c) semantics)
          count(col("__v")).as("n_distinct"),
          min(col("__v")).cast("string").as("min_value"),
          max(col("__v")).cast("string").as("max_value"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Fixed-width histogram of `value` (optionally per group): bin index
    * `floor(value / width)`, one hash aggregation — the distribution view
    * `profile`'s min/max only hints at. Fixed (literal) width keeps the
    * result deterministic and engine-exact; derive the width from a
    * `profile` pass when it must adapt to the data. */
  def histogram(
      df: DataFrame, value: Column, width: Double,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val bin = floor(value / lit(width)).as("bin") // floor already yields long
    df.groupBy(groupCols.map(col) :+ (bin: Column): _*)
      .agg(
        count(lit(1)).as("n"),
        min(value).cast("double").as("bin_min"),
        max(value).cast("double").as("bin_max"))
  }

  /** Bounded-memory frequent-items estimate over `keyCol` via the
    * [[graft.functions.MisraGries]] sketch: one row per surviving counter,
    * `(keyCol, est)`, plus the mathematically certain columns
    * `est ≤ f(key)` and `est ≥ f(key) − N/(k+1)` left to the caller.
    *
    * This is the production path when the key's cardinality is itself
    * web-scale (token vocabularies, URLs, user agents): the exact
    * `groupBy(key).count` shuffles one hash entry per DISTINCT key, while
    * this folds each partition into ≤ k counters, combines them map-side,
    * and ships O(k) rows TOTAL across the exchange. Estimates (and which
    * sub-threshold keys appear) depend on partitioning; only the error
    * bounds are deterministic — gate on them (see [[heavyHittersAudit]]),
    * never on raw estimates. Null keys contribute nothing. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    df.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull)
      .agg(mg(col("__k")).as("__sk"))
      .select(explode(col("__sk")).as(Seq(keyCol, "est")))
  }

  // Count-min hash family: bucket_j(x) = ((a_j·hp + b_j) mod p) mod width,
  // hp = hash48(x) mod p. p = 2^31−1 keeps every product below 2^62, so the
  // identical BIGINT arithmetic runs wrap-free in Spark AND DuckDB — the
  // property that makes CMS estimates exactly oracle-gateable.
  private val CmsP = 2147483647L
  private val CmsA = Array(1103515245L, 1299709L, 15485863L, 32452843L)
  private val CmsB = Array(12345L, 7919L, 104729L, 1299721L)

  private def cmsHp(key: Column): Column =
    graft.ext.TextAnalysis.hash48(key) % lit(CmsP)

  private def cmsBucket(hp: Column, j: Int, width: Int): Column =
    ((lit(CmsA(j)) * hp + lit(CmsB(j))) % lit(CmsP)) % lit(width.toLong)

  /** Count-min sketch table over `keyCol`: `depth`×`width` bucket sums,
    * one row per non-empty cell `(j, bucket, c)`.
    *
    * The dual of [[heavyHitters]]: Misra–Gries answers "which keys are
    * frequent" with a deterministic UNDER-estimate whose surviving set
    * depends on partitioning; count-min answers a point query for ANY key
    * with an OVER-estimate (`est ≥ f`, always) that is a pure sum over
    * fixed hash cells — commutative and associative, so the table (and
    * every estimate read from it) is IDENTICAL for every partitioning and
    * merge order, and the whole sketch hash-gates against a SQL oracle
    * exactly, raw values included — no bounds-boolean indirection needed.
    *
    * Scale shape: each occurrence projects to `depth` (j, bucket) cells;
    * map-side partial aggregation collapses them, so at most depth·width
    * rows cross the exchange no matter how many distinct keys flow through
    * — vs the exact form's one hash entry per vocabulary entry. Null keys
    * contribute nothing. `depth` ≤ 4 hash rows (the family above). */
  def countMin(
      df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= CmsA.length,
      s"depth must be in [1, ${CmsA.length}], got $depth")
    require(width > 0, s"width must be positive, got $width")
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("j"), cmsBucket(col("__hp"), j, width).as("bucket"))
    }
    df.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull)
      .select(cmsHp(col("__k")).as("__hp"))
      .select(explode(array(cells: _*)).as("__cell"))
      .groupBy(col("__cell.j").as("j"), col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-query `probes(keyCol)` against a [[countMin]] table built with
    * the same `depth`/`width`: `est(x) = min_j c[j][bucket_j(x)]`, an empty
    * cell reading 0. Output `(keyCol, est)`, one row per distinct probe key.
    *
    * The sketch table is at most depth·width rows, so it broadcasts; the
    * probe side never shuffles. Estimates obey `f(x) ≤ est(x)` always (a
    * cell sums every key that lands in it) and are partitioning-independent
    * — gate them raw. */
  def countMinLookup(
      cms: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= CmsA.length,
      s"depth must be in [1, ${CmsA.length}], got $depth")
    require(width > 0, s"width must be positive, got $width")
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("j"), cmsBucket(col("__hp"), j, width).as("bucket"))
    }
    probes
      .withColumn("__hp", cmsHp(col(keyCol).cast("string")))
      .withColumn("__cell", explode(array(cells: _*)))
      .select(col(keyCol), col("__cell.j").as("j"), col("__cell.bucket").as("bucket"))
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Audit harness for [[heavyHitters]]: the exact top-`topN` keys joined
    * against the sketch's estimates, with the two Misra–Gries guarantees
    * evaluated as booleans —
    *
    *   `est_ok`       = 0 ≤ f(key) − estimate ≤ N/(k+1)   (estimate-absent ⇒ 0)
    *   `guarantee_ok` = f(key) > N/(k+1) ⇒ key is present in the sketch
    *
    * Both are invariants of the sketch for EVERY partitioning and merge
    * order, so the output is deterministic and oracle-gateable even though
    * the underlying estimates are not (the q39 sketch discipline). The
    * exact side — one `groupBy(key)` + bounded top-N — exists only to audit
    * the sketch; production reads [[heavyHitters]] alone. */
  def heavyHittersAudit(
      df: DataFrame, keyCol: String, k: Int, topN: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(topN > 0, s"topN must be positive, got $topN")
    val keys = df.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull)
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    // ONE row: the sketch map and the exact stream length N the bound needs
    val sk = keys.agg(mg(col("__k")).as("__sk"), count(lit(1)).as("__n"))
    val top = keys.groupBy(col("__k")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("__k")).limit(topN)
    val slack = col("__n").cast("double") / lit((k + 1).toDouble)
    top.crossJoin(broadcast(sk)) // 1-row broadcast — no exchange on the top-N side
      .select(
        // try_element_at, not element_at: ANSI mode (Spark 4 default) makes
        // a missing map key THROW, and sub-threshold keys may be absent
        col("__k").as(keyCol), col("cnt"),
        coalesce(try_element_at(col("__sk"), col("__k")), lit(0L)).as("__est"),
        slack.as("__slack"),
        try_element_at(col("__sk"), col("__k")).isNotNull.as("__present"))
      .select(
        col(keyCol), col("cnt"),
        (col("__est") <= col("cnt") &&
          col("__est").cast("double") >= col("cnt").cast("double") - col("__slack"))
          .as("est_ok"),
        (!(col("cnt").cast("double") > col("__slack")) || col("__present"))
          .as("guarantee_ok"))
  }

  /** Curation attrition report — the audit a filtering pipeline owes its
    * operators: given per-document boolean verdicts (one per pipeline
    * stage, ORDERED as the pipeline applies them), ONE hash aggregation
    * keyed by the verdict combination yields (a) the upset counts (how
    * many docs land in every verdict combination — the overlap structure
    * a Venn/UpSet plot draws) and (b) `funnel_depth`, the number of
    * LEADING stages a combination survives, from which the sequential
    * attrition curve (survivors after stage k = Σ counts with depth ≥ k)
    * is a k-row rollup. Optional `massCol` sums a weight (chars, tokens,
    * bytes) alongside the doc counts, since curation decisions are about
    * retained MASS, not row counts.
    *
    * NULL verdicts (a doc absent from some stage's frame after a left
    * join) count as false — the conservative reading: an unjudged doc did
    * not survive that stage. Scale: the exchange carries at most
    * 2^|verdicts| rows; everything else is scan-stage. */
  def attritionReport(df: DataFrame, verdictCols: Seq[String],
      massCol: Option[String] = None): DataFrame = {
    require(verdictCols.nonEmpty, "attritionReport needs at least one verdict column")
    val vs = verdictCols.map(v => coalesce(col(v), lit(false)).as(v))
    val base = df.select(vs ++ massCol.map(col(_)): _*)
    val depth = verdictCols.zipWithIndex
      .foldRight(lit(verdictCols.size): Column) { case ((v, i), acc) =>
        when(!col(v), lit(i)).otherwise(acc)
      }
    val aggs = count(lit(1)).as("n_docs") +:
      massCol.toSeq.map(c => sum(col(c)).as("mass"))
    base.groupBy(verdictCols.map(col(_)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("funnel_depth", depth)
  }
}
