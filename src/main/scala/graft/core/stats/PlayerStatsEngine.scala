package graft.core.stats

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.core.{Event, PlayerState, PlayerStatsRow}

/** The core stateful operator: per-player running statistics.
  *
  * Faithful Spark-native re-expression of the reference's
  * `groupByKey(steamId).mapGroupsWithState(...)` pipeline
  * (SparkStreamingService.java:228-234 + PlayerStatsUpdater.java:12-67):
  *
  *  - counters (kills/deaths/assists/damage) are CUMULATIVE across batches;
  *  - `second` and `round` are maxima of the CURRENT batch only
  *    (PlayerStatsUpdater.java:20-29) — output depends on batch boundaries;
  *  - kd: deaths==0 ⇒ kills (PlayerStatsUpdater.java:34-36);
  *  - damagePerRound: unguarded double division (:37);
  *  - `GroupStateTimeout.NoTimeout` ⇒ state never expires (the reference's
  *    3-arg Java overload). For the 100 TB story pass a real timeout via
  *    `timeout` — per-key state is 4 longs + a name, so even 10^9 keys is
  *    ~50 GB spread over the cluster's state stores, but unbounded key spaces
  *    should expire idle keys.
  *
  * One deliberate improvement over the reference (SURVEY.md §7.4.3): the
  * player name kept in state is the LAST KNOWN non-blank name, so output is
  * deterministic; the reference picks the first non-blank name in iterator
  * order per batch (nondeterministic across partitions) and patches blanks at
  * the sink via driver-side point lookups.
  */
object PlayerStatsEngine {

  def update(
      steamId: String,
      events: Iterator[Event],
      state: GroupState[PlayerState]): PlayerStatsRow = {
    var s = state.getOption.getOrElse(PlayerState.empty)
    var batchSecond = 0L
    var batchRound = 0L
    events.foreach { e =>
      s = s.fold(e)
      if (e.second > batchSecond) batchSecond = e.second
      if (e.round > batchRound) batchRound = e.round
    }
    state.update(s)
    PlayerStatsRow(
      playerName = s.lastName,
      steamId = steamId,
      second = batchSecond,
      kills = s.kills,
      deaths = s.deaths,
      assists = s.assists,
      damage = s.damage,
      kdRatio = PlayerStatsRow.kd(s.kills, s.deaths),
      damagePerRound = PlayerStatsRow.dpr(s.damage, batchRound))
  }

  /** Streaming (or batch) stateful running stats — use with `update` output
    * mode. Shuffles once on steamId; state lives in the per-partition state
    * store. */
  def statefulPlayerStats(
      events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[PlayerStatsRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.steamId)
      .mapGroupsWithState[PlayerState, PlayerStatsRow](timeout)(update)
  }

  /** Pure-relational batch twin of the stateful fold: processing ALL events as
    * one batch yields exactly the stateful operator's final state (counters are
    * order-insensitive; `second`/`round` maxima coincide with the global max
    * when there is a single batch). Fully Catalyst-visible: partial (map-side)
    * aggregation + single shuffle, no per-row JVM objects — this is the shape
    * that scales to 100 TB.
    */
  def batchPlayerStats(events: DataFrame): DataFrame = {
    val agged = events
      .groupBy(col("steamId"))
      .agg(
        max(when(col("player") =!= "", col("player"))).as("playerName0"),
        max(col("second")).as("second"),
        count(when(col("eventType") === "kill", 1)).as("kills"),
        count(when(col("eventType") === "death", 1)).as("deaths"),
        count(when(col("eventType") === "assist", 1)).as("assists"),
        coalesce(sum(when(col("eventType") === "damage", col("amount"))), lit(0L)).as("damage"),
        max(col("round")).as("round"))
    agged.select(
      coalesce(col("playerName0"), lit("")).as("playerName"),
      col("steamId"),
      col("second"),
      col("kills"), col("deaths"), col("assists"), col("damage"),
      when(col("deaths") === 0, col("kills").cast("double"))
        .otherwise(col("kills").cast("double") / col("deaths"))
        .as("kdRatio"),
      (col("damage").cast("double") / col("round")).as("damagePerRound"))
  }
}
