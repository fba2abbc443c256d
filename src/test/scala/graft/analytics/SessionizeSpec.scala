package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("sessionize splits on gaps greater than the threshold") {
    // user A: events at 0, 10, 200, 210 with gap 50 -> sessions {0,10}, {200,210}
    // user B: single event -> one session
    val df = Seq(
      ("A", 0L), ("A", 10L), ("A", 200L), ("A", 210L),
      ("B", 999L)).toDF("user", "t")
    val out = Sessionize.sessionize(df, Seq("user"), "t", gap = 50L)
      .orderBy("user", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.toSeq shouldBe Seq(
      ("A", 1L, 0L, 10L, 2L),
      ("A", 2L, 200L, 210L, 2L),
      ("B", 1L, 999L, 999L, 1L))
  }

  test("a gap exactly equal to the threshold stays in the same session") {
    val df = Seq(("A", 0L), ("A", 50L)).toDF("user", "t")
    Sessionize.sessionize(df, Seq("user"), "t", gap = 50L).count() shouldBe 1L
  }

  test("out-of-order input sessionizes by event time, not arrival order") {
    val df = Seq(("A", 210L), ("A", 0L), ("A", 200L), ("A", 10L)).toDF("user", "t")
    val out = Sessionize.sessionize(df, Seq("user"), "t", gap = 50L)
      .orderBy("session_id").collect().map(r => (r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq((0L, 10L), (200L, 210L))
  }

  test("sessionWindows (batch form) matches sessionize away from exact-gap boundaries") {
    val rnd = new scala.util.Random(11)
    // microsecond timestamps with gaps well clear of the 1000µs boundary
    val evs = (1 to 4).flatMap { u =>
      var t = 1700000000000000L + u
      (1 to 50).map { _ =>
        t += (if (rnd.nextBoolean()) rnd.nextInt(800) + 1 else rnd.nextInt(100000) + 2000)
        (s"u$u", t)
      }
    }
    val df = evs.toDF("user", "tus")
      .withColumn("ts", timestamp_micros(col("tus")))
    val rel = Sessionize.sessionize(df, Seq("user"), "tus", gap = 1000L)
      .select(col("user"), col("start_time"), col("end_time"), col("n_events"))
      .orderBy("user", "start_time").collect().map(_.toSeq).toSeq
    val sw = Sessionize.sessionWindows(df, Seq("user"), "ts", "1 milliseconds")
      .orderBy("user", "start_time").collect().map(_.toSeq).toSeq
    sw shouldBe rel
  }

  test("sessionWindows boundary: an event exactly gap apart MERGES, like the relational form") {
    val df = Seq(("A", 0L), ("A", 1000000L), ("A", 1500000L))
      .toDF("user", "tus").withColumn("ts", timestamp_micros(col("tus")))
    // session_window's merge is inclusive at the boundary (next.start <=
    // prev.end), exactly the relational `diff > gap => new` rule — pinned
    // here because the q180 oracle depends on it
    val sw = Sessionize.sessionWindows(df, Seq("user"), "ts", "1 seconds")
      .orderBy("start_time").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    sw.toSeq shouldBe Seq((0L, 1500000L, 3L))
    Sessionize.sessionize(df, Seq("user"), "tus", gap = 1000000L)
      .collect().length shouldBe 1
  }

  test("null event times sort last (DuckDB parity), not into a phantom first session") {
    val df = Seq(("A", Some(0L)), ("A", Some(10L)), ("A", None)).toDF("user", "t")
    val out = Sessionize.sessionize(df, Seq("user"), "t", gap = 50L)
      .orderBy("session_id").collect()
    // nulls join the LAST session (null gap -> isNew=0), exactly like the
    // oracle's NULLS LAST ordering — no leading null-keyed session
    out.length shouldBe 1
    out.head.getAs[Long]("n_events") shouldBe 3L
    out.head.getAs[Long]("start_time") shouldBe 0L
  }
}
