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

  private def f(cols: Column, idx0: Int): Column = element_at(cols, idx0 + 1)

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
  def parseKillLines(lines: DataFrame): DataFrame = {
    val c = split(col("value"), ",", -1)
    val second = (f(c, 1).cast("long") / 128).cast("long") // ticks are non-negative
    val round = f(c, 2).cast("long")

    def mk(name: Column, id: Column, typ: String): Column =
      struct(
        name.as("player"), id.as("steamId"), lit(typ).as("eventType"),
        second.as("second"), lit(0L).as("amount"), round.as("round"))

    val killerName = f(c, 3)
    val victimName = f(c, 7)
    val assistName = f(c, 11)

    val events = array(
      when(killerName =!= "", mk(killerName, f(c, 4), "kill")),
      when(victimName =!= "", mk(victimName, f(c, 8), "death")),
      when(assistName =!= "" && assistName =!= "0", mk(assistName, f(c, 12), "assist"))
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
  def parseDamageLines(lines: DataFrame): DataFrame = {
    val c = split(col("value"), ",", -1)
    lines
      .select(c.as("c"))
      .where(element_at(col("c"), 10) =!= "")
      .select(
        lit("").as("player"),
        element_at(col("c"), 10).as("steamId"),
        lit("damage").as("eventType"),
        (element_at(col("c"), 2).cast("long") / 128).cast("long").as("second"),
        (element_at(col("c"), 6).cast("long") - element_at(col("c"), 7).cast("long")).as("amount"),
        element_at(col("c"), 3).cast("long").as("round"))
  }

  /** Parse the player-dimension CSV payload (reference PlayerRestClient.java:59-68):
    * `name = f[0], steamId = f[1], team = f[3]` (index 2 skipped). */
  def parsePlayers(lines: DataFrame): DataFrame = {
    val c = split(col("value"), ",", -1)
    lines.select(
      f(c, 0).as("name"),
      f(c, 1).as("steamId"),
      f(c, 3).as("team"))
  }
}
