package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{AsofMatch, AsofStream, Event}

class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp((min + 100) * 60000L)

  private def ckpt(): String = "/tmp/graft_ckpt_" + System.nanoTime()

  private def runStream(batches: Seq[Seq[Event]]): Seq[AsofMatch] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // 5-minute delay: cross-batch out-of-order arrivals inside the
    // allowed lateness must still attribute (test 2's whole point); a
    // 0-second watermark would drop them before the state function
    val q = AsofStream.matches(input.toDS().withWatermark("ts", "5 minutes"))
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // sentinel far-future event (other user) seals every real purchase
      input.addData(Event(999999, ts(100000), 999999L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(999998, ts(200000), 999999L, "view", 0.0))
      q.processAllAvailable()
      spark.table("asof_out").as[AsofMatch].collect().toSeq
        .filterNot(_.user_id == 999999L)
    } finally q.stop()
  }

  test("streaming as-of equals the batch operator on the same log") {
    val log = Seq(
      Event(1, ts(0), 1, "view", 0),
      Event(2, ts(5), 1, "purchase", 0),   // matches view 1
      Event(3, ts(5), 2, "purchase", 0),   // user 2 has no views: None
      Event(4, ts(6), 1, "view", 0),
      Event(5, ts(6), 1, "view", 0),       // same instant: max id (5) wins
      Event(6, ts(9), 1, "purchase", 0),   // view 7 shares its instant → inclusive
      Event(7, ts(9), 1, "view", 0),       // same instant as purchases 6 and 8
      Event(8, ts(9), 1, "purchase", 0)    // inclusive: matches view 7
    )
    val got = runStream(Seq(log.take(3), log.slice(3, 6), log.drop(6)))
      .map(m => m.event_id -> (m.view_event_id, m.gap_seconds)).toMap

    assert(got.keySet == Set(2L, 3L, 6L, 8L))
    assert(got(2L) == (Some(1L), Some(300L)))
    assert(got(3L) == (None, None))
    assert(got(6L) == (Some(7L), Some(0L))) // same-instant view wins over view 5
    assert(got(8L) == (Some(7L), Some(0L)))

    // batch twin over the completed log agrees row for row
    val df = log.toDF()
    val purchases = df.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))
    val views = df.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_event_id"),
              unix_micros($"ts").as("view_ts_us"), unix_micros($"ts").as("ts_us"))
    val batch = graft.ops.Temporal.asofJoin(purchases, views, Seq("user_id"),
        "ts_us", "ts_us", "view_event_id", Seq("view_event_id", "view_ts_us"))
      .select($"event_id", $"__asof_view_event_id".as("v"),
        (($"ts_us" - $"__asof_view_ts_us") / 1000000L).cast("long").as("gap"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(batch == got)
  }

  test("out-of-order views within the watermark still attribute correctly") {
    // view 11 arrives in a LATER micro-batch than purchase 12 but carries
    // an EARLIER timestamp; the purchase must not finalize before the
    // watermark passes it, so the late view still wins
    val got = runStream(Seq(
      Seq(Event(12, ts(50), 5, "purchase", 0)),
      Seq(Event(11, ts(49), 5, "view", 0))  // watermark still at ts(50)-ish
    )).map(m => m.event_id -> m.view_event_id).toMap
    assert(got(12L) == Some(11L))
  }

  test("state is dropped for users with no pending work beyond folded view") {
    // smoke: a pure-view user emits nothing and the query stays healthy
    val got = runStream(Seq(Seq(
      Event(21, ts(0), 9, "view", 0),
      Event(22, ts(1), 9, "view", 0))))
    assert(!got.exists(_.user_id == 9L))
  }
}
