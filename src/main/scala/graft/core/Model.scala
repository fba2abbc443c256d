package graft.core

/** Core data model of the engine.
  *
  * Mirrors the reference's data plane (see SURVEY.md §1.1):
  *  - `Event`      — reference/src/main/java/edu/ch/unibas/dis/model/Event.java:10-24
  *  - `PlayerState`— reference .../model/PlayerState.java:6-11 (plus `lastName`,
  *                   a deterministic improvement over the reference's per-batch
  *                   first-non-blank name pick, SURVEY.md §7.4.3)
  *  - `PlayerStatsRow` — the 9-field output row,
  *                   reference .../spark/SparkStreamingService.java:216-226
  *  - `Player`     — reference .../entity/Player.java:7-22
  *
  * Only `string`/`long`/`double` appear, exactly like the reference (§1.2).
  */
final case class Event(
    player: String,
    steamId: String,
    eventType: String, // kill | death | assist | damage
    second: Long,
    amount: Long,
    round: Long
)

final case class PlayerState(
    kills: Long,
    deaths: Long,
    assists: Long,
    damage: Long,
    lastName: String
) {
  /** Fold one event into the state. The kept name is the MAXIMUM non-blank
    * name seen so far — order-insensitive, so the streaming fold and the
    * batch twin's `max(when(trim(player, BlankChars) <> '', player))` agrees
    * exactly regardless of batch boundaries or partition order. Blank means
    * every char ≤ U+0020 (Java `trim` semantics, [[PlayerState.BlankChars]]
    * on the relational side), matching the reference's `StringUtils.isBlank`
    * (PlayerStatsUpdater.java:31,41) on this pipeline's ASCII domain; blank
    * names are never stored, so the
    * emitted name for a never-named key stays `""` like the reference's.
    * Comparison is over UTF-8 BYTES — Spark's binary string collation — so
    * the two paths agree even for supplementary-plane names where Java's
    * UTF-16 code-unit order diverges (surrogates sort below U+E000..U+FFFF
    * in UTF-16 but above them in UTF-8). */
  def fold(e: Event): PlayerState = {
    val named =
      if (e.player.trim.isEmpty) this
      else if (lastName.trim.isEmpty || PlayerState.utf8Gt(e.player, lastName))
        copy(lastName = e.player)
      else this
    e.eventType match {
      case "kill"   => named.copy(kills = kills + 1)
      case "death"  => named.copy(deaths = deaths + 1)
      case "assist" => named.copy(assists = assists + 1)
      case "damage" => named.copy(damage = damage + e.amount)
      case _        => named
    }
  }
}

object PlayerState {
  val empty: PlayerState = PlayerState(0L, 0L, 0L, 0L, "")

  /** The blank-name character set — exactly Java `String.trim`'s set (every
    * code point ≤ U+0020), which is what [[PlayerState.fold]]'s
    * `player.trim.isEmpty` tests. The relational twins (batch stats, enrich
    * backfill) pass this to Spark's `trim(col, chars)` so BOTH paths call
    * the same name blank — including tab/newline names, where Spark's
    * default space-only trim would diverge. (The reference's
    * `StringUtils.isBlank` differs only on exotic non-ASCII whitespace,
    * outside this pipeline's CSV domain.) */
  val BlankChars: String = (0 to 32).map(_.toChar).mkString

  /** a > b under unsigned UTF-8 byte order (Spark's binary collation). */
  private[core] def utf8Gt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c > 0
      i += 1
    }
    x.length > y.length
  }
}

final case class PlayerStatsRow(
    playerName: String,
    steamId: String,
    second: Long,
    kills: Long,
    deaths: Long,
    assists: Long,
    damage: Long,
    kdRatio: Double,
    damagePerRound: Double
)

object PlayerStatsRow {
  /** K/D rule of the reference (PlayerStatsUpdater.java:34-36):
    * deaths == 0 ⇒ kd = kills (NOT null, NOT infinity). */
  def kd(kills: Long, deaths: Long): Double =
    if (deaths == 0L) kills.toDouble else kills.toDouble / deaths

  /** Damage-per-round rule (PlayerStatsUpdater.java:37): plain Java double
    * division, round==0 ⇒ ±Infinity/NaN — reproduced faithfully. */
  def dpr(damage: Long, round: Long): Double = damage.toDouble / round
}

final case class Player(name: String, steamId: String, team: String)
