package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests from SURVEY.md §5.4: counter monotonicity, fold
  * order-insensitivity, parse totality. The fold properties are pure JVM —
  * no Spark session — so hundreds of cases run in milliseconds. */
class PropertySpec extends AnyFunSuite with Matchers {

  private val genEvent: Gen[Event] = for {
    player <- Gen.oneOf(Gen.const(""), Gen.const("  "), Gen.alphaStr.map(_.take(8)))
    steamId <- Gen.oneOf("S1", "S2", "S3")
    typ <- Gen.oneOf("kill", "death", "assist", "damage", "junk")
    second <- Gen.chooseNum(0L, 10000L)
    amount <- Gen.chooseNum(-100L, 1000L)
    round <- Gen.chooseNum(0L, 30L)
  } yield Event(player, steamId, typ, second, amount, round)

  private val genEvents: Gen[List[Event]] = Gen.listOf(genEvent)

  private def check(p: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    withClue(result.status.toString)(result.passed shouldBe true)
  }

  test("fold: final state is invariant under event permutation") {
    check(Prop.forAll(genEvents, Gen.long) { (events, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(events)
      events.foldLeft(PlayerState.empty)(_.fold(_)) ==
        shuffled.foldLeft(PlayerState.empty)(_.fold(_))
    })
  }

  test("fold: counters are monotone non-decreasing along any event sequence") {
    check(Prop.forAll(genEvents) { events =>
      val states = events.scanLeft(PlayerState.empty)(_.fold(_))
      states.sliding(2).forall {
        case Seq(prev, next) =>
          next.kills >= prev.kills && next.deaths >= prev.deaths &&
            next.assists >= prev.assists
        case _ => true
      }
    })
  }

  test("fold: counter totals equal event-type counts; damage sums the amounts") {
    check(Prop.forAll(genEvents) { events =>
      val s = events.foldLeft(PlayerState.empty)(_.fold(_))
      s.kills == events.count(_.eventType == "kill") &&
        s.deaths == events.count(_.eventType == "death") &&
        s.assists == events.count(_.eventType == "assist") &&
        s.damage == events.filter(_.eventType == "damage").map(_.amount).sum
    })
  }

  test("fold: stored name is the maximum non-blank player name, or empty") {
    check(Prop.forAll(genEvents) { events =>
      val s = events.foldLeft(PlayerState.empty)(_.fold(_))
      val named = events.map(_.player).filter(_.trim.nonEmpty)
      s.lastName == (if (named.isEmpty) "" else named.max)
    })
  }
}
