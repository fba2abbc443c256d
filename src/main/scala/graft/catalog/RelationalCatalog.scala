package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.core.Event
import graft.core.parse.GameLogParser
import graft.core.stats.PlayerStatsEngine
import graft.core.enrich.Enrich
import graft.analytics.{AsofJoin, GlobalCumsum, Intervals, RangeJoin, Scoreboard, Sessionize}
import graft.ext.{Dedup, Diff, Multimodal, Prefilter, Sampling, Similarity, Skew, TextAnalysis}

import CatalogShared._

/** General relational / SQL surface: joins (range, as-of, salted,
  * bucketed, bloom, star), window suites, set ops, pivot/unpivot, grouping
  * sets, SCD2, intervals, string/array/map/regexp function surfaces.
  *
  * Each entry is (name, query, oracle SQL) exactly as it sat in
  * SparkEntry's catalog before the per-family split; SparkEntry composes
  * the families back into the single driver-contract map.
  */
private[graft] object RelationalCatalog {

  val entries: Seq[(String, Q, Option[String])] = Seq(


    // Point-in-interval range join: non-error events landing within 10
    // minutes after a same-user error event. No native Spark operator for
    // this — a bare BETWEEN join plans a nested-loop sweep; bucketedIntervalJoin
    // restores an equi-key by quantizing time (see RangeJoin). Ticks are µs
    // on both sides (ts div 1000 / epoch_us) so the oracle compares exactly.
    ("q55_range_join", (s, dir) => {
      val ev = T(s, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus"))
      val win = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("tus").as("w_start"),
          (col("tus") + lit(600000000L)).as("w_end"))
      val pts = ev.where(col("event_type") =!= "error")
      RangeJoin.bucketedIntervalJoin(
          pts, col("tus"), win, col("w_start"), col("w_end"),
          bucketWidth = 600000000L, keys = Seq("user_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("event_id")).as("n_events"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
                 FROM events),
      w AS (SELECT user_id, tus AS ws, tus + 600000000 AS we
            FROM e WHERE event_type = 'error'),
      p AS (SELECT * FROM e WHERE event_type <> 'error')
      SELECT p.event_type, count(*) AS n_pairs,
             count(DISTINCT p.event_id) AS n_events
      FROM p JOIN w ON p.user_id = w.user_id AND p.tus >= w.ws AND p.tus < w.we
      GROUP BY 1 ORDER BY 1""")),


    // Multi-level OLAP aggregate (CUBE): all four grouping combinations in
    // one pass — Catalyst expands the grouping sets once and keeps the whole
    // thing a single hash aggregation (one Expand + one shuffle), vs the 4
    // scans a UNION ALL of separate GROUP BYs would cost. grouping() flags
    // disambiguate a real value from a rolled-up NULL.
    ("q56_cube_agg", (s, dir) => {
      T(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"), col("g_flag"), col("g_status"))
        .orderBy(col("g_flag"), col("g_status"), col("flag"), col("status"))
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             count(*) AS n,
             CAST(grouping(l_returnflag) AS INT) AS g_flag,
             CAST(grouping(l_linestatus) AS INT) AS g_status
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, flag, status""")),


    // Generic as-of join (AsofJoin): every click annotated with the user's
    // most recent prior-or-same-instant purchase. Single shuffle + window
    // pass — no correlated subquery, no nested loop (see AsofJoin). The
    // right side is pre-aggregated to unique (user, tus) so both engines'
    // as-of semantics are deterministic.
    ("q57_asof_join", (s, dir) => {
      val ev = T(s, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("tus").as("p_tus"))
        .agg(max(col("event_id")).as("p_event_id"),
          max_by(col("value"), col("event_id")).as("p_value"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "tus")
      AsofJoin.asofJoin(
          clicks, col("tus"), purchases, col("p_tus"),
          keys = Seq("user_id"), rightCols = Seq("p_tus", "p_event_id", "p_value"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus, value
                 FROM events),
      p AS (SELECT user_id, tus AS p_tus, max(event_id) AS p_event_id,
                   arg_max(value, event_id) AS p_value
            FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
      c AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'click')
      SELECT c.event_id, c.user_id, c.tus, p.p_tus, p.p_event_id, p.p_value
      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tus >= p.p_tus
      ORDER BY c.event_id""")),


    // Ranking-window suite: rank/dense_rank over a tie-rich coarse key plus
    // row_number/ntile/lag/lead over the total order, per priority class.
    // rank and dense_rank depend only on sort-key VALUES, so they stay
    // deterministic under ties; anything that reads a NEIGHBORING row
    // (lag/lead) runs over the total (orderkey-tiebroken) order instead.
    ("q58_window_suite", (s, dir) => {
      val bucket = floor(col("o_totalprice") / 1000).cast("long")
      val wTies = Window.partitionBy(col("o_orderpriority")).orderBy(bucket.desc)
      val wTotal = Window.partitionBy(col("o_orderpriority"))
        .orderBy(bucket.desc, col("o_orderkey"))
      T(s, dir, "orders")
        .select(
          col("o_orderkey"), col("o_orderpriority"), bucket.as("price_kb"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"),
          // pure functions of (rank, peer count, partition size) — identical
          // integer inputs in both engines ⇒ identical doubles
          percent_rank().over(wTies).as("prnk"),
          cume_dist().over(wTies).as("cdist"),
          row_number().over(wTotal).as("rn"),
          ntile(4).over(wTotal).as("quartile"),
          lag(col("o_orderkey"), 1).over(wTotal).as("prev_key"),
          lead(col("o_orderkey"), 1).over(wTotal).as("next_key"))
        .where(col("rn") <= 200)
        .orderBy(col("o_orderpriority"), col("rn"))
    }, Some("""
      SELECT * FROM (
        SELECT o_orderkey, o_orderpriority,
               CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kb,
               rank() OVER wt AS rnk,
               dense_rank() OVER wt AS drnk,
               percent_rank() OVER wt AS prnk,
               cume_dist() OVER wt AS cdist,
               row_number() OVER wf AS rn,
               ntile(4) OVER wf AS quartile,
               lag(o_orderkey, 1) OVER wf AS prev_key,
               lead(o_orderkey, 1) OVER wf AS next_key
        FROM orders
        WINDOW
          wt AS (PARTITION BY o_orderpriority
                 ORDER BY floor(o_totalprice / 1000) DESC),
          wf AS (PARTITION BY o_orderpriority
                 ORDER BY floor(o_totalprice / 1000) DESC, o_orderkey)
      ) WHERE rn <= 200 ORDER BY o_orderpriority, rn""")),


    // Time-grid resample + LOCF gap fill: one row per (user, hour) between
    // each user's first and last event, carrying the last observation
    // forward — sequence+explode builds the grid in codegen (no driver
    // loop), AsofJoin fills it in one window pass. Hours are integral µs
    // buckets so grid arithmetic is exact in both engines.
    ("q60_resample_locf", (s, dir) => {
      // localCheckpoint: `hourly` feeds BOTH the grid bounds and the asof
      // right side, and Spark shares no uncached subplan across branches —
      // without it the events scan + hash agg runs twice (verified in the
      // plan). The checkpointed aggregate is one row per (user, hour), tiny
      // next to its input; on a real cluster use reliable checkpoint/persist.
      val hourly = T(s, dir, "events")
        .select(col("user_id"), expr("(ts div 1000) div 3600000000").as("rh"),
          col("value"), col("event_id"))
        .groupBy(col("user_id"), col("rh"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
        .localCheckpoint()
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("rh")).as("h0"), max(col("rh")).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      AsofJoin.asofJoin(
          grid, col("h"), hourly.select(col("user_id"), col("rh"), col("v")),
          col("rh"), keys = Seq("user_id"), rightCols = Seq("rh", "v"))
        .select(col("user_id"), col("h"), col("rh").as("src_hour"),
          col("v").as("locf_value"))
        .orderBy(col("user_id"), col("h"))
    }, Some("""
      WITH hr AS (SELECT user_id, epoch_us(ts) // 3600000000 AS rh,
                         arg_max(value, event_id) AS v
                  FROM events GROUP BY 1, 2),
      b AS (SELECT user_id, min(rh) AS h0, max(rh) AS h1 FROM hr GROUP BY 1),
      g AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM b)
      SELECT g.user_id, g.h, hr.rh AS src_hour, hr.v AS locf_value
      FROM g ASOF LEFT JOIN hr ON g.user_id = hr.user_id AND g.h >= hr.rh
      ORDER BY 1, 2""")),


    // Exact interpolated percentiles per group. Quantities are integral
    // doubles and the interpolation fractions are dyadic (0.25/0.5/0.75),
    // so lo + (hi-lo)*frac is bit-exact in both engines. At 100 TB swap in
    // the t-digest sketch (q39) — exact percentile's full sort per group is
    // the scale bound, which is why both forms are in the catalog.
    ("q61_percentiles", (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          min(col("l_quantity")).as("q_min"),
          max(col("l_quantity")).as("q_max"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS p25,
             quantile_cont(l_quantity, 0.5) AS p50,
             quantile_cont(l_quantity, 0.75) AS p75,
             min(l_quantity) AS q_min,
             max(l_quantity) AS q_max
      FROM lineitem GROUP BY 1 ORDER BY 1""")),


    // Salted join: lineitem ⋈ part on a deterministically salted key — the
    // hot-key-safe join for when the dim side is too big to broadcast and
    // AQE's runtime skew split is unavailable. The oracle is the PLAIN join:
    // salting must be result-invisible.
    ("q62_salted_join", (s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_orderkey"), dec(col("l_quantity")).as("qty"))
      val part = T(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      Skew.saltedJoin(li, part, keys = Seq("l_partkey"),
          saltSource = col("l_orderkey"), salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("qty")).cast("double").as("sum_qty"))
        .orderBy(col("p_brand"))
    }, Some("""
      SELECT p_brand, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY 1""")),


    // Ordered distinct string aggregation: collect_set is unordered (and
    // collect_list is partitioning-dependent), so the deterministic form is
    // array_sort before joining — the cross-engine-stable way to emit a
    // per-key label list.
    ("q64_sorted_listagg", (s, dir) => {
      T(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          array_sort(collect_set(col("event_type"))).as("arr"),
          countDistinct(col("event_type")).as("n_types"))
        // all-NULL group: collect_set yields [] and concat_ws would emit ''
        // where SQL string_agg emits NULL — guard on set size so both
        // engines agree (a genuine '' value still round-trips as '')
        .select(col("user_id"),
          when(size(col("arr")) > 0, concat_ws(",", col("arr"))).as("types"),
          col("n_types"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id,
             string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
             count(DISTINCT event_type) AS n_types
      FROM events GROUP BY 1 ORDER BY 1""")),


    // Set operations (§2.3): INTERSECT ∘ EXCEPT with SQL's distinct-set
    // semantics — customers ordering in both years, minus any who ever
    // placed an urgent order. Catalyst rewrites both to semi/anti joins
    // under a distinct, so they shuffle like any equi-join (AQE-splittable).
    ("q65_intersect_except", (s, dir) => {
      val o = T(s, dir, "orders")
      def custs(y: Int) =
        o.where(year(col("o_orderdate")) === y).select(col("o_custkey"))
      val urgent = o.where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      custs(1995).intersect(custs(1996)).except(urgent)
        .orderBy(col("o_custkey"))
    }, Some("""
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY o_custkey""")),


    // UNPIVOT (wide → tall): the inverse of q09's pivot, as the native
    // Expand-based unpivot operator — 1→n in the same stage, no union of
    // per-measure scans.
    ("q66_unpivot", (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
          sum(dec(col("l_discount"))).cast("double").as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "val")
        .orderBy(col("l_returnflag"), col("measure"))
    }, Some("""
      WITH w AS (SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
               CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc
             FROM lineitem GROUP BY 1)
      SELECT l_returnflag, measure, val
      FROM (UNPIVOT w ON sum_qty, sum_price, sum_disc INTO NAME measure VALUE val)
      ORDER BY 1, 2""")),


    // RANGE-frame rolling aggregate: trailing-hour sum/count per user by
    // VALUE distance (µs ticks), not row count — the moving-average frame
    // that rows-frames can't express when events are irregularly spaced.
    // Ties on tus are all peers of the frame bound, so the result is
    // deterministic without a tiebreak.
    ("q67_rolling_range", (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-3600000000L, 0)
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("tus"), dec(col("value")).as("v"))
        .select(col("event_id"), col("user_id"), col("tus"),
          sum(col("v")).over(w).cast("double").as("hour_sum"),
          count(lit(1)).over(w).as("hour_n"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id, tus,
             CAST(sum(v) OVER w AS DOUBLE) AS hour_sum,
             count(*) OVER w AS hour_n
      FROM (SELECT event_id, user_id, epoch_us(ts) AS tus,
                   CAST(value AS DECIMAL(12,2)) AS v FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),


    // Conditional aggregation (SQL FILTER clause): one scan, one hash agg,
    // N conditions — the idiomatic replacement for N filtered self-joins.
    // Spark's sum(when) with a typed zero matches FILTER+COALESCE exactly.
    ("q68_conditional_agg", (s, dir) => {
      val zero = lit(0).cast(DecimalType(12, 2))
      T(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count_if(col("event_type") === "error").as("n_err"),
          count_if(col("event_type") === "purchase").as("n_buy"),
          sum(when(col("event_type") === "purchase", dec(col("value")))
            .otherwise(zero)).cast("double").as("buy_value"),
          max(when(col("event_type") === "error", col("event_id"))).as("last_err_id"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'error') AS n_err,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_buy,
             CAST(COALESCE(sum(CAST(value AS DECIMAL(12,2)))
               FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS buy_value,
             max(event_id) FILTER (WHERE event_type = 'error') AS last_err_id
      FROM events GROUP BY 1 ORDER BY 1""")),


    // Change capture → SCD-2 validity intervals: collapse consecutive
    // same-state rows per key (run-length compression via lag), then stamp
    // each surviving state change with [valid_from, valid_to) via lead —
    // the slowly-changing-dimension build, in two window passes over ONE
    // keyed sort (both windows share the partitioning and ordering, so
    // Catalyst plans a single exchange+sort).
    ("q70_scd2_intervals", (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val changes = T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changes
        .select(col("user_id"), col("event_type").as("state"),
          col("tus").as("valid_from"),
          lead(col("tus"), 1).over(w).as("valid_to"),
          lead(col("tus"), 1).over(w).isNull.as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("state"))
    }, Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
                 FROM events),
      c AS (SELECT *, lag(event_type) OVER
              (PARTITION BY user_id ORDER BY tus, event_id) AS prev_type
            FROM e)
      SELECT user_id, event_type AS state, tus AS valid_from,
             lead(tus) OVER w AS valid_to,
             lead(tus) OVER w IS NULL AS is_current
      FROM c WHERE prev_type IS NULL OR prev_type <> event_type
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
      ORDER BY user_id, valid_from, state""")),


    // Datetime-part extraction + interval arithmetic (§2.7 scalar surface):
    // year/quarter/month/day and a +30-day due date, reduced per (year,
    // quarter). Parts with engine-dependent conventions (day-of-week
    // numbering) are deliberately excluded from the oracle-gated set.
    ("q71_datetime_parts", (s, dir) => {
      T(s, dir, "orders")
        .select(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd")
            .as("due"))
        .groupBy(col("y"), col("q"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("m")).as("n_months"),
          max(col("d")).as("max_day"),
          min(col("due")).as("first_due"))
        .orderBy(col("y"), col("q"))
    }, Some("""
      SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
             count(*) AS n, count(DISTINCT month(o_orderdate)) AS n_months,
             max(dayofmonth(o_orderdate)) AS max_day,
             min(strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')) AS first_due
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),


    // String-function surface (§2.7): upper/lower/substring/replace/length/
    // concat, with the digits of the synthetic name round-tripped through
    // replace → BIGINT and checked against the real key.
    ("q72_string_functions", (s, dir) => {
      T(s, dir, "customer")
        .select(
          lower(col("c_mktsegment")).as("seg"),
          upper(substring(col("c_name"), -4, 4)).as("tail"),
          length(col("c_name")).as("name_len"),
          replace(col("c_name"), lit("Customer#"), lit("")).cast("long").as("parsed_key"),
          col("c_custkey"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          min(col("tail")).as("min_tail"),
          max(col("name_len")).as("max_len"),
          count_if(col("parsed_key") === col("c_custkey")).as("n_roundtrip"))
        .orderBy(col("seg"))
    }, Some("""
      SELECT lower(c_mktsegment) AS seg, count(*) AS n,
             min(upper(c_name[-4:])) AS min_tail,
             max(length(c_name)) AS max_len,
             count(*) FILTER (WHERE CAST(replace(c_name, 'Customer#', '') AS BIGINT)
                              = c_custkey) AS n_roundtrip
      FROM customer GROUP BY 1 ORDER BY 1""")),


    // SQL entry point (§2.9 downstream-SQL surface): correlated EXISTS
    // (⇒ shuffled semi join) and a scalar subquery (⇒ broadcast of one
    // aggregated row) through spark.sql over temp views — the same text a
    // BI tool would submit. The scalar threshold uses max (exact), not avg,
    // so the float comparison cannot flip on cross-engine summation order.
    ("q73_sql_subqueries", (s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("g_orders")
      T(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM g_orders
        WHERE EXISTS (SELECT 1 FROM g_lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
          AND o_totalprice > 0.5 * (SELECT max(o_totalprice) FROM g_orders)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        AND o_totalprice > 0.5 * (SELECT max(o_totalprice) FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),


    // Interval coalescing (gap-and-islands): each event opens a 15-minute
    // activity interval; overlapping-or-touching intervals per user merge
    // into maximal spans (Intervals.mergeIntervals — one keyed sort shared
    // by both window passes, no self-join). Integral µs arithmetic ⇒
    // bit-exact oracle.
    ("q74_interval_merge", (s, dir) => {
      val iv = T(s, dir, "events").select(
        col("user_id"),
        expr("ts div 1000").as("s_us"),
        (expr("ts div 1000") + lit(900000000L)).as("e_us"))
      Intervals.mergeIntervals(iv, Seq("user_id"), "s_us", "e_us")
        .orderBy(col("user_id"), col("s_us"))
    }, Some("""
      WITH iv AS (SELECT user_id, epoch_us(ts) AS s_us,
                         epoch_us(ts) + 900000000 AS e_us FROM events),
      m AS (SELECT *, max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM iv),
      f AS (SELECT *, CASE WHEN pme IS NULL OR s_us > pme THEN 1 ELSE 0 END AS brk FROM m),
      g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY s_us, e_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM f)
      SELECT user_id, min(s_us) AS s_us, max(e_us) AS e_us,
             count(*) AS n_merged
      FROM g GROUP BY user_id, island ORDER BY user_id, s_us""")),


    // Snapshot diff (Diff.snapshotDiff): the change feed between two table
    // versions via ONE full-outer key join — inserted/deleted/updated rows
    // only. The "new" snapshot is derived deterministically from customer
    // in BOTH engines (drop %97 keys, bump %11 balances, insert shifted
    // %131 keys), so the diff itself is the thing under test.
    ("q75_snapshot_diff", (s, dir) => {
      val cust = T(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      val survived = cust.where(col("c_custkey") % 97 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 11 === 0, col("c_acctbal") + 100)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      val inserted = cust.where(col("c_custkey") % 131 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          col("c_name"), col("c_acctbal"))
      Diff.snapshotDiff(cust, survived.unionByName(inserted), Seq("c_custkey"))
        .where(col("change_type") =!= "unchanged")
        .select(col("c_custkey"), col("change_type"),
          col("old_c_acctbal"), col("new_c_acctbal"))
        .orderBy(col("c_custkey"))
    }, Some("""
      WITH olds AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
      news AS (
        SELECT c_custkey, c_name,
          CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 97 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_acctbal
        FROM customer WHERE c_custkey % 131 = 0),
      d AS (
        SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
          CASE WHEN o.c_custkey IS NULL THEN 'inserted'
               WHEN n.c_custkey IS NULL THEN 'deleted'
               WHEN NOT (o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                         AND o.c_name IS NOT DISTINCT FROM n.c_name) THEN 'updated'
               ELSE 'unchanged' END AS change_type,
          o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal
        FROM olds o FULL OUTER JOIN news n ON o.c_custkey = n.c_custkey)
      SELECT c_custkey, change_type, old_c_acctbal, new_c_acctbal
      FROM d WHERE change_type <> 'unchanged' ORDER BY c_custkey""")),


    // Bloom-prefiltered selective join (Prefilter.bloomFilteredJoin): only
    // ~10% of suppliers survive the dim filter, so ~90% of lineitem rows
    // are doomed — the Bloom probe discards them at the scan, BEFORE the
    // shuffle. False positives only ⇒ the oracle is the PLAIN join.
    ("q76_bloom_join", (s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_suppkey"), dec(col("l_quantity")).as("qty"))
      val sup = T(s, dir, "supplier").where(col("s_suppkey") % 10 === 0)
        .select(col("s_suppkey"), col("s_nationkey"))
      Prefilter.bloomFilteredJoin(li, sup, "l_suppkey", "s_suppkey",
          expectedItems = 100000L)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).cast("double").as("sum_qty"))
        .orderBy(col("s_nationkey"))
    }, Some("""
      SELECT s_nationkey, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_suppkey % 10 = 0
      GROUP BY 1 ORDER BY 1""")),


    // ROLLUP hierarchy totals (year → priority → grand total): the partial-
    // hierarchy sibling of q56's CUBE — one Expand + one hash agg, with
    // grouping() flags disambiguating real NULLs from subtotal rows.
    ("q78_rollup_hierarchy", (s, dir) => {
      T(s, dir, "orders")
        .select(year(col("o_orderdate")).as("y"), col("o_orderpriority").as("prio"),
          col("o_custkey"), col("o_totalprice"))
        .rollup(col("y"), col("prio"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          grouping(col("y")).cast("int").as("g_y"),
          grouping(col("prio")).cast("int").as("g_prio"))
        .select(coalesce(col("y"), lit(-1)).as("y"),
          coalesce(col("prio"), lit("ALL")).as("prio"),
          col("n"), col("n_cust"), col("min_price"), col("max_price"),
          col("g_y"), col("g_prio"))
        .orderBy(col("g_y"), col("g_prio"), col("y"), col("prio"))
    }, Some("""
      SELECT coalesce(year(o_orderdate), -1) AS y,
             coalesce(o_orderpriority, 'ALL') AS prio,
             count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
             CAST(grouping(year(o_orderdate)) AS INT) AS g_y,
             CAST(grouping(o_orderpriority) AS INT) AS g_prio
      FROM orders GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
      ORDER BY g_y, g_prio, y, prio""")),


    // Array-function surface (§2.7 extended to collections): per-order
    // sorted part list, then size/index/slice/join/distinct — every op a
    // codegen'd collection expression over one hash-agg pass. Arrays are
    // per-order (≤7 elements), so the interpreted-lambda trap that rules
    // array ops out for corpus-scale shingle sets does not bite here.
    ("q79_array_functions", (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
        .select(col("l_orderkey"),
          size(col("parts")).cast("long").as("n_parts"),
          element_at(col("parts"), 1).as("first_part"),
          element_at(col("parts"), -1).as("last_part"),
          array_join(slice(col("parts"), 1, 3).cast("array<string>"), ",").as("top3"),
          size(array_distinct(col("parts"))).cast("long").as("n_unique"))
        .orderBy(col("l_orderkey"))
    }, Some("""
      WITH a AS (SELECT l_orderkey, list_sort(list(l_partkey)) AS parts
                 FROM lineitem GROUP BY 1)
      SELECT l_orderkey, CAST(len(parts) AS BIGINT) AS n_parts,
             parts[1] AS first_part, parts[-1] AS last_part,
             array_to_string(parts[1:3], ',') AS top3,
             CAST(len(list_distinct(parts)) AS BIGINT) AS n_unique
      FROM a ORDER BY l_orderkey""")),


    // Regexp-function surface (§2.7): extract / count / replace-all / full-
    // match over document text. Patterns stay where RE2 and Java regex
    // agree (char classes, alternation); the one divergence is `$`, which
    // Java matches BEFORE a final trailing newline while RE2 matches only
    // end-of-text — so the Spark side anchors with Java's `\z` (true
    // end-of-text) to mean what DuckDB's `$` means.
    ("q80_regexp_functions", (s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "w[a-z]+", 0).as("first_w"),
          regexp_count(col("text"), lit("spark|stream")).cast("long").as("n_sparkish"),
          length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("consonant_len"),
          col("text").rlike("^[a-z ]+\\z").as("is_clean"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             regexp_extract(text, 'w[a-z]+') AS first_w,
             CAST(len(regexp_extract_all(text, 'spark|stream')) AS BIGINT) AS n_sparkish,
             CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS consonant_len,
             regexp_matches(text, '^[a-z ]+$') AS is_clean
      FROM documents ORDER BY doc_id""")),


    // Value-window suite (first/last/nth over an explicit full frame): the
    // per-partition-constant trio reduced to one row per user via DISTINCT.
    // The frame is UNBOUNDED..UNBOUNDED in both engines — last_value under
    // the default frame is the running-current row, a classic cross-engine
    // divergence this query pins shut.
    ("q81_value_windows", (s, dir) => {
      val ev = T(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), expr("ts div 1000").as("tus"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev.select(col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"),
          count(lit(1)).over(w).as("n_events"))
        .distinct()
        .orderBy(col("user_id"))
    }, Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
                 FROM events)
      SELECT DISTINCT user_id,
        first_value(event_type) OVER w AS first_type,
        last_value(event_type) OVER w AS last_type,
        nth_value(event_type, 2) OVER w AS second_type,
        count(*) OVER w AS n_events
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id""")),


    // Map-function surface (§2.7 extended to collections): the props JSON
    // parsed as a MAP (not a fixed struct — the schema-dynamic form),
    // then keys/values/size/lookup, plus a constructed literal-key map.
    // The DuckDB oracle walks the same JSON with json_keys/json_extract.
    ("q82_map_functions", (s, dir) => {
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"), m.as("pm"))
        .select(col("event_id"),
          // try_element_at, not element_at: under ANSI mode a missing map
          // key / empty keys array must yield NULL, not a runtime error —
          // same totality stance as q15/q16's TRY-cast parsing
          try_element_at(map_keys(col("pm")), lit(1)).as("first_key"),
          try_element_at(col("pm"), lit("k")).as("k_val"),
          size(col("pm")).cast("long").as("n_keys"),
          element_at(
            map(lit("uid"), col("user_id"), lit("eid"), col("event_id")),
            "uid").as("uid_val"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             CASE WHEN json_valid(props) THEN json_keys(props)[1] END AS first_key,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k_val,
             CASE WHEN json_valid(props)
                  THEN CAST(len(json_keys(props)) AS BIGINT) END AS n_keys,
             user_id AS uid_val
      FROM events ORDER BY event_id""")),


    // Deterministic mode (most frequent value) per group: count → rank with
    // an explicit tiebreak (higher count, then smaller value) → keep rank 1.
    // Built-in mode()/any_value tiebreaks are engine- and partitioning-
    // dependent; the windowed form is reproducible everywhere.
    ("q85_mode_per_group", (s, dir) => {
      val counts = T(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type").asc)
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("modal_type"), col("cnt"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH c AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT *, row_number() OVER
          (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
        FROM c)
      SELECT user_id, event_type AS modal_type, cnt
      FROM r WHERE rn = 1 ORDER BY user_id""")),


    // GROUPING SETS (completing the q56 CUBE / q78 ROLLUP trio): exactly
    // the two requested groupings — per-year and per-priority — in ONE
    // Expand + one hash agg, not a UNION of two scans.
    ("q86_grouping_sets", (s, dir) => {
      T(s, dir, "orders")
        .select(year(col("o_orderdate")).as("y"), col("o_orderpriority").as("prio"),
          col("o_totalprice"))
        .groupingSets(Seq(Seq(col("y")), Seq(col("prio"))), col("y"), col("prio"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          grouping(col("y")).cast("int").as("g_y"),
          grouping(col("prio")).cast("int").as("g_prio"))
        .select(coalesce(col("y"), lit(-1)).as("y"),
          coalesce(col("prio"), lit("ALL")).as("prio"),
          col("n"), col("min_price"), col("max_price"),
          col("g_y"), col("g_prio"))
        .orderBy(col("g_y"), col("y"), col("prio"))
    }, Some("""
      SELECT coalesce(year(o_orderdate), -1) AS y,
             coalesce(o_orderpriority, 'ALL') AS prio,
             count(*) AS n,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
             CAST(grouping(year(o_orderdate)) AS INT) AS g_y,
             CAST(grouping(o_orderpriority) AS INT) AS g_prio
      FROM orders
      GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority))
      ORDER BY g_y, y, prio""")),


    // Equal-frequency (quantile) binning — the feature-engineering
    // discretizer: ntile(4) per order-priority class over a TOTAL order
    // (price, key ⇒ deterministic bin assignment), then per-bin count /
    // bounds / exact-DECIMAL mean. Per-class partitioning keeps the sort
    // keyed (parallel across classes) instead of a global single-partition
    // sort; at 100 TB the same surface runs on approx-quantile cut points
    // (q39's sketch path) — ntile is the exact, oracle-comparable form.
    ("q92_quantile_bins", (s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("bin", ntile(4).over(w).cast("long"))
        .groupBy(col("o_orderpriority"), col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"),
          (sum(dec(col("o_totalprice"))).cast("double") /
            count(lit(1)).cast("double")).as("avg_price"))
        .orderBy(col("o_orderpriority"), col("bin"))
    }, Some("""
      WITH b AS (
        SELECT o_orderpriority, o_totalprice,
          CAST(ntile(4) OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bin
        FROM orders)
      SELECT o_orderpriority, bin, count(*) AS n,
        min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS avg_price
      FROM b GROUP BY 1, 2 ORDER BY 1, 2""")),


    // Bag-semantics set operators (INTERSECT ALL / EXCEPT ALL — the
    // multiplicity-preserving forms q65's distinct set ops don't cover):
    // urgent-priority order customers vs finished-order customers, tagged
    // and re-counted. Catalyst plans both as aggregate+join with map-side
    // partials (multiplicity = min / difference of per-key counts), so
    // nothing materializes the raw bag.
    ("q98_setops_all", (s, dir) => {
      val o = T(s, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersectAll(b).withColumn("tag", lit("both"))
        .unionByName(a.exceptAll(b).withColumn("tag", lit("only_urgent")))
        .groupBy(col("tag"), col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("tag"), col("o_custkey"))
    }, Some("""
      WITH a AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      u AS (
        SELECT o_custkey, 'both' AS tag
        FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        UNION ALL
        SELECT o_custkey, 'only_urgent' AS tag
        FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
      SELECT tag, o_custkey, count(*) AS n FROM u
      GROUP BY 1, 2 ORDER BY 1, 2""")),


    // Pareto frontier (skyline) per brand: parts not dominated on
    // (price ↓, size ↑) by any same-brand part. The dominance test is a
    // brand-blocked LEFT ANTI self-join — Σ per-block C(n,2) comparisons,
    // never |part|² (the same blocking argument as q69's fuzzy match); at
    // open-web scale the block key is the partition key and a grid-based
    // pre-prune drops interior points before the quadratic step. Pure
    // comparisons ⇒ trivially bit-exact.
    ("q105_skyline", (s, dir) => {
      val p = T(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          col("p_size"))
      val q = p.select(col("p_brand").as("qb"), col("p_retailprice").as("qp"),
        col("p_size").as("qs"))
      p.join(q,
          col("p_brand") === col("qb") &&
            col("qp") <= col("p_retailprice") && col("qs") >= col("p_size") &&
            (col("qp") < col("p_retailprice") || col("qs") > col("p_size")),
          "left_anti")
        .orderBy(col("p_brand"), col("p_partkey"))
    }, Some("""
      SELECT p_partkey, p_brand, p_retailprice, p_size FROM part p
      WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_brand = p.p_brand
          AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      ORDER BY p_brand, p_partkey""")),


    // Weighted median (size-weighted retail price per brand): one keyed
    // window builds the running weight, the median is the FIRST value whose
    // cumulative weight reaches half the total — deterministic via the
    // (value, key) window order, exact comparisons only (2·cw ≥ tw is
    // integer arithmetic). One exchange+sort per brand block; the two
    // windows (running + total) share it.
    ("q117_weighted_median", (s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
      val t = Window.partitionBy(col("p_brand"))
      T(s, dir, "part")
        .select(col("p_brand"), col("p_retailprice"), col("p_partkey"),
          sum(col("p_size").cast("long")).over(w).as("cw"),
          sum(col("p_size").cast("long")).over(t).as("tw"))
        .where(col("cw") * 2 >= col("tw"))
        .groupBy(col("p_brand"))
        .agg(min(col("p_retailprice")).as("weighted_median"))
        .orderBy(col("p_brand"))
    }, Some("""
      WITH w AS (
        SELECT p_brand, p_retailprice,
          sum(CAST(p_size AS BIGINT)) OVER (
            PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS cw,
          sum(CAST(p_size AS BIGINT)) OVER (PARTITION BY p_brand) AS tw
        FROM part)
      SELECT p_brand, min(p_retailprice) AS weighted_median
      FROM w WHERE 2*cw >= tw GROUP BY 1 ORDER BY 1""")),


    // SQL surface: correlated LATERAL subquery with ORDER BY + LIMIT — the
    // top-N-per-group shape written the way an analyst writes it. Catalyst
    // decorrelates the LIMIT-1..N lateral into a window/join plan (no
    // per-row re-execution); tiebreak on c_name keeps the double ordering
    // deterministic cross-engine.
    ("q124_lateral_topn", (s, dir) => {
      T(s, dir, "nation").createOrReplaceTempView("g_nation")
      T(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM g_nation n
        JOIN LATERAL (
          SELECT c_name, c_acctbal FROM g_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""")
    }, Some("""
      SELECT n.n_name, c.c_name, c.c_acctbal
      FROM nation n
      JOIN LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) c ON TRUE
      ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""")),


    // Higher-order-function surface (filter/exists/forall/zip_with/
    // aggregate) over per-order line arrays: one hash agg builds the
    // arrays, every downstream op is per-row in-stage (no further
    // shuffle). The dot product runs in exact BIGINTs (quantity × price
    // CENTS), so the fold is hash-exact regardless of element order.
    ("q125_hof_surface", (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(
          col("l_quantity").cast("long").as("q"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))).as("xs"))
        .select(col("l_orderkey"),
          expr("transform(xs, x -> x.q)").as("qs"),
          expr("transform(xs, x -> x.cents)").as("cs"))
        .select(col("l_orderkey"),
          expr("size(filter(qs, x -> x > 25))").cast("long").as("n_big"),
          expr("exists(qs, x -> x > 25)").as("any_big"),
          expr("forall(qs, x -> x > 25)").as("all_big"),
          expr("aggregate(zip_with(qs, cs, (q, c) -> q * c), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
            .as("dot_cents"))
        .orderBy(col("l_orderkey"))
    }, Some("""
      WITH a AS (
        SELECT l_orderkey,
          list(CAST(l_quantity AS BIGINT)) AS qs,
          list(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cs
        FROM lineitem GROUP BY 1)
      SELECT l_orderkey,
        len(list_filter(qs, x -> x > 25)) AS n_big,
        len(list_filter(qs, x -> x > 25)) > 0 AS any_big,
        len(list_filter(qs, x -> x > 25)) = len(qs) AS all_big,
        CAST(list_sum(list_transform(list_zip(qs, cs), t -> t[1] * t[2])) AS BIGINT) AS dot_cents
      FROM a ORDER BY l_orderkey""")),


    // Key-space gap analysis (gaps-and-islands over a sparse key set): the
    // urgent-order keys reduce ONCE to ~20% of |orders| distinct values,
    // then the classic k − row_number() island label groups consecutive
    // runs. The key table is fact-sized, so the global row number comes
    // from GlobalCumsum's two-phase scan (range partition + broadcast
    // bases) — not a single-partition window sort.
    ("q127_key_gaps", (s, dir) => {
      val k = T(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k")).distinct()
      GlobalCumsum.rowNumber(k, Seq(col("k")), "__rn")
        .withColumn("grp", col("k") - col("__rn"))
        .groupBy(col("grp"))
        .agg(min(col("k")).as("island_start"), max(col("k")).as("island_end"),
          count(lit(1)).as("island_len"))
        .select(col("island_start"), col("island_end"), col("island_len"))
        .orderBy(col("island_start"))
    }, Some("""
      WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
                 WHERE o_orderpriority = '1-URGENT'),
      r AS (SELECT k, k - row_number() OVER (ORDER BY k) AS grp FROM k)
      SELECT min(k) AS island_start, max(k) AS island_end,
             count(*) AS island_len
      FROM r GROUP BY grp ORDER BY island_start""")),


    // Multi-measure pivot (q09's single-measure sibling): one hash agg
    // produces value×measure columns in a single Expand — no per-measure
    // scan union, no extra distinct job (pivot values are explicit).
    // Exact DECIMAL sums; absent cells are zero-filled on both sides.
    ("q130_pivot_multi", (s, dir) => {
      T(s, dir, "lineitem")
        .select(
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"),
          col("l_linestatus"), dec(col("l_quantity")).as("q"))
        .groupBy(col("ym"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("q")).cast("double").as("sum_qty"), count(lit(1)).as("n"))
        .select(col("ym"),
          coalesce(col("F_sum_qty"), lit(0.0)).as("f_sum_qty"),
          coalesce(col("F_n"), lit(0L)).as("f_n"),
          coalesce(col("O_sum_qty"), lit(0.0)).as("o_sum_qty"),
          coalesce(col("O_n"), lit(0L)).as("o_n"))
        .orderBy(col("ym"))
    }, Some("""
      SELECT year(l_shipdate)*100 + month(l_shipdate) AS ym,
        CAST(coalesce(sum(CASE WHEN l_linestatus='F'
          THEN CAST(l_quantity AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS f_sum_qty,
        count(*) FILTER (WHERE l_linestatus='F') AS f_n,
        CAST(coalesce(sum(CASE WHEN l_linestatus='O'
          THEN CAST(l_quantity AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS o_sum_qty,
        count(*) FILTER (WHERE l_linestatus='O') AS o_n
      FROM lineitem GROUP BY 1 ORDER BY 1""")),


    // Array set-algebra surface (array_intersect / array_except over
    // per-key sets): engagement-day vs transaction-day overlap per user.
    // The fact table reduces ONCE per user into two sorted distinct day
    // arrays (conditional collect in one hash agg), then every set op is
    // per-row in-stage. Counts (not arrays) are the output, so the hash
    // compare stays scalar.
    ("q134_array_setops", (s, dir) => {
      val au = T(s, dir, "events").select(col("user_id"),
        expr("ts div 86400000000000").as("d"),
        col("event_type").isin("click", "view").as("eng"))
      au.groupBy(col("user_id"))
        .agg(
          sort_array(array_distinct(collect_list(when(col("eng"), col("d")))))
            .as("a"),
          sort_array(array_distinct(collect_list(when(!col("eng"), col("d")))))
            .as("b"))
        .select(col("user_id"),
          size(col("a")).cast("long").as("n_a"),
          size(col("b")).cast("long").as("n_b"),
          size(array_intersect(col("a"), col("b"))).cast("long").as("n_common"),
          size(array_except(col("a"), col("b"))).cast("long").as("n_only_a"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH au AS (
        SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
               event_type IN ('click','view') AS eng
        FROM events),
      s AS (
        SELECT user_id,
          coalesce(list_sort(list_distinct(list(d) FILTER (WHERE eng))),
                   CAST([] AS BIGINT[])) AS a,
          coalesce(list_sort(list_distinct(list(d) FILTER (WHERE NOT eng))),
                   CAST([] AS BIGINT[])) AS b
        FROM au GROUP BY 1)
      SELECT user_id, len(a) AS n_a, len(b) AS n_b,
        len(list_filter(a, x -> list_contains(b, x))) AS n_common,
        len(list_filter(a, x -> NOT list_contains(b, x))) AS n_only_a
      FROM s ORDER BY user_id""")),


    // Discrete (nearest-rank) percentiles — q61's interpolation-free
    // sibling: the value AT rank ceil(p·n), always a real data point (what
    // a latency SLO reports). One keyed window pass assigns deterministic
    // ranks; the picks are conditional mins. Both engines compute ceil on
    // the identical IEEE product, so even p=0.99's non-dyadic multiply
    // agrees bit-for-bit.
    ("q135_pctl_disc", (s, dir) => {
      val w = Window.partitionBy(col("g"))
        .orderBy(col("x"), col("ok"), col("ln"))
      val cw = Window.partitionBy(col("g"))
      T(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
        .select(col("g"), col("x"),
          row_number().over(w).cast("long").as("rn"),
          count(lit(1)).over(cw).as("n"))
        .groupBy(col("g"))
        .agg(
          min(when(col("rn") === ceil(lit(0.25) * col("n")), col("x"))).as("p25_disc"),
          min(when(col("rn") === ceil(lit(0.50) * col("n")), col("x"))).as("p50_disc"),
          min(when(col("rn") === ceil(lit(0.99) * col("n")), col("x"))).as("p99_disc"))
        .orderBy(col("g"))
    }, Some("""
      WITH r AS (
        SELECT l_returnflag AS g, l_extendedprice AS x,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
          count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
      SELECT g,
        min(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN x END) AS p25_disc,
        min(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN x END) AS p50_disc,
        min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN x END) AS p99_disc
      FROM r GROUP BY 1 ORDER BY 1""")),


    // TPC-H Q5-shaped 6-table star join (region→nation→customer→orders→
    // lineitem→supplier, local-supplier correlation s_nationkey =
    // c_nationkey): the canonical join-order workout. The dimension chain
    // (region filter → nation → customer) broadcasts — the fact tables
    // never shuffle for it; supplier broadcasts into the lineitem scan;
    // the only big exchange is lineitem ⋈ orders. Exact DECIMAL revenue.
    ("q136_star_join", (s, dir) => {
      val r = T(s, dir, "region").where(col("r_name") === "EUROPE")
      val nat = T(s, dir, "nation")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val cust = T(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = T(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(T(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey")
          && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice"))
            * (lit(1) - dec(col("l_discount")))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }, Some("""
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1 ORDER BY revenue DESC, n_name""")),


    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM) on a genuinely
    // NULLABLE derived key: NULL matches NULL exactly once — the semantics
    // a plain `=` join silently drops. Spark plans <=> as a real hash join
    // (null-safe keys hash like values), so the scale story is unchanged.
    ("q138_nullsafe_join", (s, dir) => {
      val a = T(s, dir, "orders").where(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("k"))
      val b = T(s, dir, "orders").where(col("o_orderkey") % 100 === 50)
        .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("bk"))
        .groupBy(col("bk")).agg(count(lit(1)).as("n"))
      a.join(b, col("k") <=> col("bk")).select(col("o_orderkey"), col("k"), col("n"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      WITH a AS (
        SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS k
        FROM orders WHERE o_orderkey % 100 = 0),
      b AS (
        SELECT nullif(o_orderpriority, '3-MEDIUM') AS k, count(*) AS n
        FROM orders WHERE o_orderkey % 100 = 50 GROUP BY 1)
      SELECT a.o_orderkey, a.k, b.n
      FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      ORDER BY a.o_orderkey""")),


    // The NOT IN null trap, side by side with the NOT EXISTS fix: one NULL
    // in the subquery's value list makes `x NOT IN (...)` UNKNOWN for every
    // row (0 rows), while NOT EXISTS counts the truly-absent keys. Spark
    // plans the former as a null-aware anti join, the latter as a plain
    // anti join — both reported from the SAME derived subset so the
    // contrast is the only variable.
    ("q139_not_in_trap", (s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("g_orders")
      T(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT
          (SELECT count(*) FROM g_customer
           WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                          ELSE o_custkey END FROM g_orders
                                   WHERE o_orderkey % 50 = 0)) AS n_not_in,
          (SELECT count(*) FROM g_customer c
           WHERE NOT EXISTS (SELECT 1 FROM g_orders o
                             WHERE o_orderkey % 50 = 0
                               AND (CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                    ELSE o_custkey END) = c.c_custkey)) AS n_not_exists""")
    }, Some("""
      SELECT
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                        ELSE o_custkey END FROM orders
                                 WHERE o_orderkey % 50 = 0)) AS n_not_in,
        (SELECT count(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o_orderkey % 50 = 0
                             AND (CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                  ELSE o_custkey END) = c.c_custkey)) AS n_not_exists""")),


    // Error-tolerant scalar surface (try_cast + guarded division): junk
    // input degrades to NULL instead of failing the task — the lenient
    // twin of the reference's crash-on-junk parse (§7.4.5). count() over
    // the try-results measures parse yield per segment in one scan.
    ("q140_try_funcs", (s, dir) => {
      T(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(
          count(expr("try_cast(replace(c_name, 'Customer#', '') AS BIGINT)"))
            .as("n_numeric"),
          count(expr("try_cast(c_name AS BIGINT)")).as("n_junk_numeric"),
          count(when(col("c_custkey") % 10 =!= 0,
            col("c_acctbal") / (col("c_custkey") % 10))).as("n_divisible"))
        .orderBy(col("seg"))
    }, Some("""
      SELECT c_mktsegment AS seg,
        count(try_cast(replace(c_name, 'Customer#', '') AS BIGINT)) AS n_numeric,
        count(try_cast(c_name AS BIGINT)) AS n_junk_numeric,
        count(CASE WHEN (c_custkey % 10) <> 0
                   THEN c_acctbal / (c_custkey % 10) END) AS n_divisible
      FROM customer GROUP BY 1 ORDER BY 1""")),


    // Interval-OVERLAP join (two interval sets, not point-in-interval):
    // per-user purchase windows × error windows that overlap in time, with
    // exact overlap length. RangeJoin.intervalOverlapJoin buckets BOTH
    // sides and emits each pair in its first shared bucket — exactly once,
    // no dedup — so a bare non-equi join's O(|A|·|B|) nested loop never
    // appears; cost is Σ per-bucket products. Integral µs arithmetic ⇒
    // bit-exact oracle.
    ("q141_interval_overlap", (s, dir) => {
      val ev = T(s, dir, "events")
      val a = ev.where(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("a_id"),
        expr("ts div 1000").as("a_s"),
        (expr("ts div 1000") + lit(900000000L)).as("a_e"))
      val b = ev.where(col("event_type") === "error").select(
        col("user_id"), col("event_id").as("b_id"),
        expr("ts div 1000").as("b_s"),
        (expr("ts div 1000") + lit(1800000000L)).as("b_e"))
      RangeJoin.intervalOverlapJoin(
          a, col("a_s"), col("a_e"), b, col("b_s"), col("b_e"),
          bucketWidth = 900000000L, keys = Seq("user_id"))
        .select(col("user_id"), col("a_id"), col("b_id"),
          (least(col("a_e"), col("b_e"))
            - greatest(col("a_s"), col("b_s"))).as("overlap_us"))
        .orderBy(col("user_id"), col("a_id"), col("b_id"))
    }, Some("""
      WITH a AS (SELECT user_id, event_id AS a_id, epoch_us(ts) AS a_s,
                        epoch_us(ts) + 900000000 AS a_e
                 FROM events WHERE event_type = 'purchase'),
      b AS (SELECT user_id, event_id AS b_id, epoch_us(ts) AS b_s,
                   epoch_us(ts) + 1800000000 AS b_e
            FROM events WHERE event_type = 'error')
      SELECT a.user_id, a_id, b_id,
        least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
      FROM a JOIN b ON a.user_id = b.user_id AND a_s < b_e AND b_s < a_e
      ORDER BY 1, 2, 3""")),


    // SCD-2 as-of enrichment — THE warehouse composition: build the
    // slowly-changing user-state dimension from the change stream (q70's
    // run-length collapse, deduped per (user, time) with a deterministic
    // max_by), then attach to each purchase the state valid AT its
    // timestamp via AsofJoin (one union + window pass — no correlated
    // subquery, no nested loop). The oracle computes the same thing with
    // the OPPOSITE algorithm (correlated LIMIT-1 lateral), so the hash
    // match proves the as-of rewrite, not just the arithmetic.
    ("q146_scd2_enrich", (s, dir) => {
      val ev = T(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), expr("ts div 1000").as("tus"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val changes = ev.where(col("event_type") =!= "purchase")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      val states = changes.groupBy(col("user_id"), col("tus").as("stus"))
        .agg(expr("max_by(event_type, event_id)").as("state"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"))
      graft.analytics.AsofJoin.asofJoin(
          purchases, col("tus"), states, col("stus"),
          keys = Seq("user_id"), rightCols = Seq("state"))
        .select(col("event_id"), col("user_id"), col("tus"),
          coalesce(col("state"), lit("none")).as("state_at_purchase"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events),
      c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_type
            FROM e WHERE event_type <> 'purchase'),
      ch AS (SELECT user_id, tus, event_type, event_id FROM c
             WHERE prev_type IS NULL OR prev_type <> event_type),
      st AS (SELECT user_id, tus, max_by(event_type, event_id) AS state FROM ch GROUP BY 1, 2),
      p AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, p.tus,
        coalesce((SELECT s.state FROM st s WHERE s.user_id = p.user_id AND s.tus <= p.tus
                  ORDER BY s.tus DESC LIMIT 1), 'none') AS state_at_purchase
      FROM p ORDER BY p.event_id""")),


    // Percent-of-parent hierarchy shares (nation ÷ region ÷ grand total):
    // the drill-down ratio every OLAP report carries. The fact table
    // reduces ONCE to |nations| revenue rows (broadcast dim chain); both
    // parent totals come from windows over that tiny frame — no second
    // fact scan, no self-join. Exact DECIMAL sums; shares are single
    // divisions.
    ("q147_pct_of_parent", (s, dir) => {
      val rev = T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("o_totalprice"))).cast(DecimalType(18, 2)).as("nrev"))
      rev.select(col("r_name"), col("n_name"), col("nrev"),
          sum(col("nrev")).over(Window.partitionBy(col("r_name")))
            .cast(DecimalType(18, 2)).as("rrev"),
          sum(col("nrev")).over(Window.partitionBy())
            .cast(DecimalType(18, 2)).as("grev"))
        .select(col("r_name"), col("n_name"),
          col("nrev").cast("double").as("nation_rev"),
          (col("nrev").cast("double") / col("rrev").cast("double"))
            .as("share_of_region"),
          (col("rrev").cast("double") / col("grev").cast("double"))
            .as("region_share_of_total"))
        .orderBy(col("r_name"), col("n_name"))
    }, Some("""
      WITH rev AS (
        SELECT r_name, n_name,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS nrev
        FROM region JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        GROUP BY 1, 2),
      tot AS (
        SELECT *, CAST(sum(nrev) OVER (PARTITION BY r_name) AS DECIMAL(18,2)) AS rrev,
                  CAST(sum(nrev) OVER () AS DECIMAL(18,2)) AS grev
        FROM rev)
      SELECT r_name, n_name, CAST(nrev AS DOUBLE) AS nation_rev,
        CAST(nrev AS DOUBLE) / CAST(rrev AS DOUBLE) AS share_of_region,
        CAST(rrev AS DOUBLE) / CAST(grev AS DOUBLE) AS region_share_of_total
      FROM tot ORDER BY r_name, n_name""")),


    // COUNT(DISTINCT) under CUBE — a physical plan q56's plain-agg cube
    // never exercises: Catalyst stacks the grouping-set Expand with the
    // distinct-aggregate Expand (dedup per grouping set, then count). The
    // exact distinct counts hash-gate that double-Expand pipeline.
    ("q149_cube_distinct", (s, dir) => {
      T(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g1"),
          grouping(col("l_linestatus")).cast("long").as("g2"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g1"), col("g2"), col("n_orders"), col("n_rows"))
        .orderBy(col("g1"), col("g2"), col("rf"), col("ls"))
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        grouping(l_returnflag) AS g1, grouping(l_linestatus) AS g2,
        count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_rows
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY g1, g2, rf, ls""")),


    // Top-N-with-OTHER rollup (the standard report shape: top 2 brands per
    // nation, everything else in one bucket): the fact table reduces ONCE
    // to |nations|·|brands| exact-DECIMAL revenue rows; ranking and the
    // OTHER regroup are small-table work after that single reduction.
    ("q152_topn_other", (s, dir) => {
      val rev = T(s, dir, "lineitem")
        .join(broadcast(T(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(T(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nat"), col("p_brand"))
        .agg(sum(dec(col("l_extendedprice"))).cast(DecimalType(18, 2)).as("rev"))
      rev
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("nat")).orderBy(col("rev").desc, col("p_brand"))))
        .groupBy(col("nat"),
          when(col("rk") <= 2, col("p_brand")).otherwise(lit("OTHER"))
            .as("brand_bucket"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_brands"))
        .orderBy(col("nat"), col("revenue").desc, col("brand_bucket"))
    }, Some("""
      WITH rev AS (
        SELECT s_nationkey AS nat, p_brand,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      rk AS (SELECT *, row_number() OVER
               (PARTITION BY nat ORDER BY rev DESC, p_brand) AS rk FROM rev)
      SELECT nat, CASE WHEN rk <= 2 THEN p_brand ELSE 'OTHER' END AS brand_bucket,
        CAST(sum(rev) AS DOUBLE) AS revenue, count(*) AS n_brands
      FROM rk GROUP BY 1, 2 ORDER BY 1, revenue DESC, brand_bucket""")),


    // Join fan-out pre-flight audit — predict an N:M join's output size
    // WITHOUT running the join: per-key multiplicities of each side (two
    // keyed reduces, map-side combined), joined on the key domain (already
    // co-partitioned by the groupBy), out_rows = nl·nr per key. At 100 TB
    // this is the report that catches the key that would explode a join
    // into 10¹² rows — for the cost of two aggregations instead of the
    // catastrophic shuffle itself.
    ("q167_join_explosion", (s, dir) => {
      val li = T(s, dir, "lineitem")
      val l = li.where(col("l_returnflag") === "R")
        .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("nl"))
      val r = li.where(col("l_linestatus") === "F")
        .groupBy(col("l_partkey").as("kr")).agg(count(lit(1)).as("nr"))
      l.join(r, col("k") === col("kr"))
        .select(col("k"), col("nl"), col("nr"), (col("nl") * col("nr")).as("out_rows"))
        .withColumn("total_out", sum(col("out_rows")).over(Window.partitionBy()))
        .withColumn("rank",
          row_number().over(Window.orderBy(col("out_rows").desc, col("k"))).cast("int"))
        .where(col("rank") <= 20)
        .select(col("rank"), col("k").as("join_key"), col("nl"), col("nr"),
          col("out_rows"), col("total_out"),
          (col("out_rows").cast("double") / col("total_out").cast("double")).as("out_share"))
        .orderBy(col("rank"))
    }, Some("""
      WITH l AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS nl
                 FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      r AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS nr
            FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1),
      j AS (SELECT l.k AS k, nl, nr, nl * nr AS out_rows FROM l JOIN r ON l.k = r.k),
      t AS (SELECT *, CAST(sum(out_rows) OVER () AS BIGINT) AS total_out,
              CAST(row_number() OVER (ORDER BY out_rows DESC, k) AS INT) AS rank
            FROM j)
      SELECT rank, k AS join_key, nl, nr, out_rows, total_out,
        CAST(out_rows AS DOUBLE) / total_out AS out_share
      FROM t WHERE rank <= 20 ORDER BY rank""")),


    // Bucketed co-located join: orders and customer are written ONCE as
    // 8-bucket tables on their join key (catalog-registered, sorted within
    // buckets), then joined — the scan's bucketing satisfies the join's
    // hash-partitioning requirement, so neither fact re-shuffles
    // (BucketingSpec pins the no-Exchange plan). At 100 TB this is THE
    // repeated-join layout: pay the shuffle once at write time, every
    // subsequent join on the bucket key is exchange-free — so the bucketed
    // tables are written ONCE per JVM per source dir (Staging) under
    // dir-keyed names (bijective dir→table, so a session mixing scale
    // factors can never read the wrong layout), and every execution joins
    // the pre-bucketed layout, which is the contract under test.
    ("q183_bucketed_join", (s, dir) => {
      val suf = java.lang.Integer.toHexString(
        new java.io.File(dir).getCanonicalPath.hashCode)
      val (to, tc) = (s"graft_b_orders_$suf", s"graft_b_customer_$suf")
      // Staging provides the stable JVM-lifetime path; the CREATE itself is
      // guarded on the SESSION catalog (tables are session-scoped, so a
      // fresh session in the same JVM re-registers over the same path)
      val wh = graft.util.Staging.dir(s"q183_warehouse_$suf", dir)(_ => ())
      if (!s.catalog.tableExists(to) || !s.catalog.tableExists(tc)) {
        T(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            dec(col("o_totalprice")).as("o_price"))
          .write.format("parquet").option("path", s"$wh/o")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .mode("overwrite").saveAsTable(to)
        T(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .write.format("parquet").option("path", s"$wh/c")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .mode("overwrite").saveAsTable(tc)
      }
      s.table(to)
        .join(s.table(tc), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_custs"),
          sum(col("o_price")).cast("double").as("total_price"))
        .orderBy(col("c_mktsegment"))
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_orders,
        count(DISTINCT c.c_custkey) AS n_custs,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          AS total_price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1 ORDER BY 1""")),


    // Z-order layout audit: events map onto a 2-D (user bucket × value
    // bucket) grid, each row gets the 16-bit Morton/Z interleave of the two
    // 8-bit coordinates (pure unrolled shift/mask arithmetic — identical in
    // both engines), and consecutive z-ranges of 1024 codes model the files
    // a z-ordered writer would cut. The per-"file" min/max of BOTH
    // dimensions stays bounded (each covers at most a 32×32 tile of the
    // 256×256 grid) — exactly the property that lets file-level min/max
    // statistics skip data for predicates on EITHER column at 100 TB,
    // where a single-column sort bounds only one.
    ("q184_zorder_layout", (s, dir) => {
      val withXY = T(s, dir, "events").select(
        (col("user_id") % 256).cast("long").as("__x"),
        least(floor(col("value")).cast("long"), lit(255L)).as("__y"))
      val z = (0 until 8).map { i =>
        shiftright(col("__x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(col("__y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      }.reduce(_ + _)
      withXY.withColumn("__z", z)
        .withColumn("file_id", (col("__z") / 1024).cast("long"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
          min(col("__y")).as("y_min"), max(col("__y")).as("y_max"),
          min(col("__z")).as("z_min"), max(col("__z")).as("z_max"))
        .orderBy(col("file_id"))
    }, Some("""
      WITH e AS (
        SELECT user_id % 256 AS x,
               least(CAST(floor(value) AS BIGINT), 255) AS y
        FROM events),
      z AS (
        SELECT x, y,
          ((x >> 0) & 1) * 1 + ((y >> 0) & 1) * 2 +
          ((x >> 1) & 1) * 4 + ((y >> 1) & 1) * 8 +
          ((x >> 2) & 1) * 16 + ((y >> 2) & 1) * 32 +
          ((x >> 3) & 1) * 64 + ((y >> 3) & 1) * 128 +
          ((x >> 4) & 1) * 256 + ((y >> 4) & 1) * 512 +
          ((x >> 5) & 1) * 1024 + ((y >> 5) & 1) * 2048 +
          ((x >> 6) & 1) * 4096 + ((y >> 6) & 1) * 8192 +
          ((x >> 7) & 1) * 16384 + ((y >> 7) & 1) * 32768 AS zv
        FROM e)
      SELECT zv // 1024 AS file_id, count(*) AS n_rows,
        min(x) AS x_min, max(x) AS x_max,
        min(y) AS y_min, max(y) AS y_max,
        min(zv) AS z_min, max(zv) AS z_max
      FROM z GROUP BY 1 ORDER BY 1"""))
  )
}
