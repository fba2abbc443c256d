package graft.core.parse

import graft.SparkTestBase
import graft.core.Event

/** Parity traps from SURVEY.md §7.4.5: keep-empty split, "0" assister
  * sentinel, blank-name guards, empty-damager drop, tick/128, hp delta. */
class GameLogParserSpec extends SparkTestBase {
  import spark.implicits._

  private def parseKills(lines: String*): Seq[Event] =
    GameLogParser.parseKillLines(lines.toDF("value"))
      .as[Event].collect().toSeq.sortBy(e => (e.eventType, e.player))

  private def parseDamages(lines: String*): Seq[Event] =
    GameLogParser.parseDamageLines(lines.toDF("value")).as[Event].collect().toSeq

  //                     0  1tick 2rnd 3killer 4kid 5  6  7victim 8vid 9 10 11assist 12aid
  private val fullLine = "x,1280,3,Killer,K1,x,x,Victim,V1,x,x,Assister,A1"

  test("kill line with killer+victim+assister yields 3 events, sec=tick/128") {
    val es = parseKills(fullLine)
    es.map(_.eventType).sorted shouldBe Seq("assist", "death", "kill")
    es.foreach { e =>
      e.second shouldBe 10L // 1280 / 128
      e.round shouldBe 3L
      e.amount shouldBe 0L
    }
    es.find(_.eventType == "kill").get.steamId shouldBe "K1"
    es.find(_.eventType == "death").get.steamId shouldBe "V1"
    es.find(_.eventType == "assist").get.steamId shouldBe "A1"
  }

  test("assister sentinel \"0\" is NOT an assist (reference :167)") {
    val es = parseKills("x,128,1,K,K1,x,x,V,V1,x,x,0,A1")
    es.map(_.eventType).sorted shouldBe Seq("death", "kill")
  }

  test("blank killer/victim/assister fields emit no event") {
    parseKills("x,128,1,,K1,x,x,,V1,x,x,,A1") shouldBe empty
  }

  test("trailing empty fields survive the split (keep-empty semantics)") {
    // assister and its id are trailing empties — split(-1) must keep 13 cols
    val es = parseKills("x,256,2,K,K1,x,x,,,x,x,,")
    es.map(_.eventType) shouldBe Seq("kill")
    es.head.second shouldBe 2L
  }

  test("integer division truncates sub-second ticks") {
    parseKills("x,255,1,K,K1,x,x,,,x,x,,").head.second shouldBe 1L
    parseKills("x,127,1,K,K1,x,x,,,x,x,,").head.second shouldBe 0L
  }

  test("tick division is 64-bit exact (no double rounding above 2^53)") {
    val tick = (1L << 60) + 129L // double rounds this to 2^60 + 256
    parseKills(s"x,$tick,1,K,K1,x,x,,,x,x,,").head.second shouldBe tick / 128
  }

  test("strict player parse drops trailing empty fields like Java split (AIOOBE parity)") {
    // reference's split(\",\") sees 3 fields for 'Ada,S1,x,' -> fields[3] crashes
    an[Exception] should be thrownBy
      GameLogParser.parsePlayers(Seq("Ada,S1,x,").toDF("value")).collect()
    // lenient keeps the trailing empty and yields team=""
    GameLogParser.parsePlayers(Seq("Ada,S1,x,").toDF("value"), strict = false)
      .collect().head.getString(2) shouldBe ""
  }

  //                       0  1tick 2rnd 3 4 5old 6new 7 8 9damager 10
  test("damage line: amount = old_hp - new_hp, player blank") {
    val es = parseDamages("x,1280,5,x,x,100,73,x,x,S9,x")
    es should have size 1
    val e = es.head
    e shouldBe Event("", "S9", "damage", 10L, 27L, 5L)
  }

  test("damage line with empty damager id is dropped (reference :201,212)") {
    parseDamages("x,1280,5,x,x,100,73,x,x,,x") shouldBe empty
  }

  test("negative damage (healing tick) passes through as-is") {
    parseDamages("x,128,1,x,x,50,80,x,x,S1,x").head.amount shouldBe -30L
  }

  test("strict parse fails the task on junk (faithful to the reference's parseLong crash)") {
    val junk = Seq("x,NOTANUMBER,1,K,K1,x,x,,,x,x,,").toDF("value")
    an[Exception] should be thrownBy
      GameLogParser.parseKillLines(junk, strict = true).collect()
  }

  test("lenient parse is total: junk lines yield nulls/nothing, never throw") {
    val rnd = new scala.util.Random(42)
    val junk = Seq("", ",", ",,,,,,,,,,,,,", "a,b,c", "x," * 20) ++
      (1 to 100).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
        .flatMap(c => if (rnd.nextInt(5) == 0) s"$c," else s"$c"))
    noException should be thrownBy
      GameLogParser.parseKillLines(junk.toDF("value"), strict = false).collect()
    noException should be thrownBy
      GameLogParser.parseDamageLines(junk.toDF("value"), strict = false).collect()
    noException should be thrownBy
      GameLogParser.parsePlayers(junk.toDF("value"), strict = false).collect()
  }

  test("lenient parse equals strict parse on well-formed lines") {
    val lines = Seq(fullLine, "x,256,2,K,K1,x,x,,,x,x,,").toDF("value")
    val strictRows = GameLogParser.parseKillLines(lines, strict = true)
      .as[Event].collect().sortBy(e => (e.eventType, e.player)).toSeq
    val lenientRows = GameLogParser.parseKillLines(lines, strict = false)
      .as[Event].collect().sortBy(e => (e.eventType, e.player)).toSeq
    lenientRows shouldBe strictRows
  }

  test("player dimension parse: name, steamId, team (index 2 skipped)") {
    val df = GameLogParser.parsePlayers(Seq("Ada,S1,ignored,TeamA").toDF("value"))
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq shouldBe
      Seq(("Ada", "S1", "TeamA"))
  }
}
