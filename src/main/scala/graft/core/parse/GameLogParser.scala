package graft.core.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native-column CSV parsers for the reference's wire formats (SURVEY.md §2.2).
  *
  * The reference parses with opaque Java lambdas over `Dataset<String>`
  * (FlatMapFunction at SparkStreamingService.java:134-177, MapFunction at
  * :191-211), which blocks Catalyst (no pushdown, no codegen across the
  * de/serialization boundary — SURVEY.md §4.2). Here every step is a Catalyst
  * expression: `split` → `when`-guarded `struct`s → `explode` → `filter`,
  * so the whole parse stays inside WholeStageCodegen and scales with the scan.
  *
  * Field indices are 0-based as in the reference's `split(",", -1)` arrays;
  * `element_at` below is 1-based, hence the `idx + 1`.
  */
object GameLogParser {

  /** Positional field access, 1-based under the hood. Strict mode indexes
    * like the reference's `cols[i]` (short lines FAIL the task, matching the
    * reference's ArrayIndexOutOfBounds crash under Spark's ANSI default);
    * lenient mode yields null for missing fields. */
  private def f(cols: Column, idx0: Int, strict: Boolean = true): Column =
    if (strict) element_at(cols, idx0 + 1)
    else try_element_at(cols, lit(idx0 + 1))

  /** Numeric field decode. Strict mode is the reference's semantics under
    * Spark's ANSI default: a malformed numeric FAILS the task like the
    * reference's `Long.parseLong` (SparkStreamingService.java:136) — with
    * one honest caveat: Spark is declarative, so the cast only runs when
    * some surviving output field needs it. A junk tick on a line whose
    * every event is filtered out (all names blank, no damager id) is never
    * evaluated and the line drops silently, where the reference's
    * imperative parse-then-filter order would crash first. Exact crash-
    * ORDER parity would require forcing materialization of every cast and
    * is deliberately not attempted. Lenient mode uses TRY-cast (null on
    * junk) for pipelines that must be total over dirty wire data. */
  private def asLong(c: Column, strict: Boolean): Column =
    if (strict) c.cast("long")
    else org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.GraftColumnBridge.expression(c),
        org.apache.spark.sql.types.LongType,
        None,
        org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))

  /** `tick / 128` with 64-BIT integer semantics (the reference's Java long
    * division, SparkStreamingService.java:136-137). Spark's `/` on two
    * longs computes in DOUBLE, which silently rounds ticks ≥ 2^53 — an
    * IntegralDivide keeps every bit. */
  private def div128(tick: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(tick),
        org.apache.spark.sql.catalyst.expressions.Literal(128L)))

  private val eventSchemaCols =
    Seq("player", "steamId", "eventType", "second", "amount", "round")

  /** Parse kill-log CSV lines (reference SparkStreamingService.java:134-177).
    *
    * One input line yields 0..3 events:
    *  - kill   from cols[3]/[4]   if killer name non-empty   (:142-151)
    *  - death  from cols[7]/[8]   if victim name non-empty   (:153-163)
    *  - assist from cols[11]/[12] if assister name non-empty AND != "0" (:165-175)
    * `second = tick/128` integer division (:136-137), `round = cols[2]` (:139),
    * `amount = 0` for all kill-log events.
    *
    * @param lines DataFrame with a string column `value` (one CSV line per row)
    * @return DataFrame with Event schema (player, steamId, eventType, second, amount, round)
    */
  def parseKillLines(lines: DataFrame, strict: Boolean = true): DataFrame = {
    val c = split(col("value"), ",", -1)
    val second = div128(asLong(f(c, 1, strict), strict))
    val round = asLong(f(c, 2, strict), strict)

    def mk(name: Column, id: Column, typ: String): Column =
      struct(
        name.as("player"), id.as("steamId"), lit(typ).as("eventType"),
        second.as("second"), lit(0L).as("amount"), round.as("round"))

    val killerName = f(c, 3, strict)
    val victimName = f(c, 7, strict)
    val assistName = f(c, 11, strict)

    val events = array(
      when(killerName =!= "", mk(killerName, f(c, 4, strict), "kill")),
      when(victimName =!= "", mk(victimName, f(c, 8, strict), "death")),
      when(assistName =!= "" && assistName =!= "0", mk(assistName, f(c, 12, strict), "assist"))
    )

    lines
      .select(explode(events).as("e"))
      .where(col("e").isNotNull)
      .select(eventSchemaCols.map(n => col(s"e.$n").as(n)): _*)
  }

  /** Parse damage-log CSV lines (reference SparkStreamingService.java:191-213).
    *
    * 1→1 (or 1→0 when the damager steamId cols[9] is empty — the reference
    * returns null and filters it at :212; here we filter before constructing).
    * `amount = old_hp(cols[5]) − new_hp(cols[6])` (:197-198,207); the player
    * name is always "" (:203) — backfilled later from the dimension (P7/J0).
    */
  def parseDamageLines(lines: DataFrame, strict: Boolean = true): DataFrame = {
    val c = split(col("value"), ",", -1)
    lines
      .select(c.as("c"))
      .where(coalesce(f(col("c"), 9, strict), lit("")) =!= "")
      .select(
        lit("").as("player"),
        f(col("c"), 9, strict).as("steamId"),
        lit("damage").as("eventType"),
        div128(asLong(f(col("c"), 1, strict), strict)).as("second"),
        (asLong(f(col("c"), 5, strict), strict) - asLong(f(col("c"), 6, strict), strict)).as("amount"),
        asLong(f(col("c"), 2, strict), strict).as("round"))
  }

  /** Parse the player-dimension CSV payload (reference PlayerRestClient.java:59-68):
    * `name = f[0], steamId = f[1], team = f[3]` (index 2 skipped). */
  def parsePlayers(lines: DataFrame, strict: Boolean = true): DataFrame = {
    // the reference splits WITHOUT a limit (PlayerRestClient.java:60), so
    // Java drops trailing empty fields and a line like "Ada,S1,x," crashes
    // on fields[3]. Strict mode reproduces that by stripping trailing
    // commas before the split (element_at then errors under ANSI); lenient
    // keeps every field and yields null/"" instead.
    val raw = if (strict) regexp_replace(col("value"), ",+$", "") else col("value")
    val c = split(raw, ",", -1)
    lines.select(
      f(c, 0, strict).as("name"),
      f(c, 1, strict).as("steamId"),
      f(c, 3, strict).as("team"))
  }
}
