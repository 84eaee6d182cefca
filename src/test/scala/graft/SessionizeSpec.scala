package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Sessionize

/** Stateful event-time sessionization: sessions close on WATERMARK progress,
  * not wall clock; late data within the delay still extends a session.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("sessions split on gap and close via watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val sessions = Sessionize.sessions(spark, events, gapMs = 5 * 60 * 1000, watermarkDelay = "0 seconds")
    val query = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append())
      .start()

    // user 1: events at 10:00, 10:02 (one session), then 10:30 (new session)
    input.addData((1L, ts(0), 1.0), (1L, ts(2), 2.0))
    query.processAllAvailable()
    input.addData((1L, ts(30), 3.0)) // watermark jumps to 10:30 -> first session times out
    query.processAllAvailable()
    input.addData((1L, ts(59), 4.0)) // watermark to 10:59 -> second session times out
    query.processAllAvailable()

    val out = spark.table("sessions_out").as[Sessionize.Session].collect()
      .sortBy(_.startMs)
    query.stop()

    assert(out.length == 2)
    assert(out(0) == Sessionize.Session(1L, ts(0).getTime, ts(2).getTime, 2, 3.0))
    assert(out(1) == Sessionize.Session(1L, ts(30).getTime, ts(30).getTime, 1, 3.0))
  }

  test("late-but-within-watermark event in a LATER batch cannot move the session end backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    // 30-minute delay so a 10:01 event is still on time when the max seen is 10:04.
    val sessions = Sessionize.sessions(spark, events, gapMs = 5 * 60 * 1000, watermarkDelay = "30 minutes")
    val query = sessions.writeStream
      .format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append())
      .start()

    input.addData((1L, ts(0), 1.0), (1L, ts(4), 2.0)) // state: [10:00, 10:04]
    query.processAllAvailable()
    input.addData((1L, ts(1), 4.0)) // LATE: t < state.last; must merge, end stays 10:04
    query.processAllAvailable()
    input.addData((2L, ts(45), 0.0)) // watermark to 10:15 -> 10:04+gap passes, session closes
    query.processAllAvailable()
    input.addData((2L, ts(59), 0.0))
    query.processAllAvailable()

    val out = spark.table("sessions_late").as[Sessionize.Session].collect().filter(_.userId == 1L)
    query.stop()

    assert(out.length == 1)
    // endMs = 10:04 (NOT dragged back to 10:01); all three events accounted.
    assert(out(0) == Sessionize.Session(1L, ts(0).getTime, ts(4).getTime, 3, 7.0))
  }

  test("pre-start straggler (beyond gap before session start) closes as its own session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val sessions = Sessionize.sessions(spark, events, gapMs = 5 * 60 * 1000, watermarkDelay = "40 minutes")
    val query = sessions.writeStream
      .format("memory").queryName("sessions_straggler")
      .outputMode(OutputMode.Append())
      .start()

    input.addData((1L, ts(20), 1.0), (1L, ts(22), 2.0)) // state: [10:20, 10:22]
    query.processAllAvailable()
    // LATE but on time (watermark 09:42): 10:05 is > gap before 10:20 — the
    // batch sessionizer breaks there, so it must NOT stretch start backwards.
    input.addData((1L, ts(5), 4.0))
    query.processAllAvailable()
    input.addData((2L, ts(59), 0.0)) // watermark forward -> open session times out
    query.processAllAvailable()
    input.addData((2L, ts(75), 0.0))
    query.processAllAvailable()

    val out = spark.table("sessions_straggler").as[Sessionize.Session].collect()
      .filter(_.userId == 1L).sortBy(_.startMs)
    query.stop()
    assert(out.toSeq == Seq(
      Sessionize.Session(1L, ts(5).getTime, ts(5).getTime, 1, 4.0),
      Sessionize.Session(1L, ts(20).getTime, ts(22).getTime, 2, 3.0)))
  }

  test("same-batch stragglers within gap of each other merge into ONE earlier session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val sessions = Sessionize.sessions(spark, events, gapMs = 5 * 60 * 1000, watermarkDelay = "40 minutes")
    val query = sessions.writeStream
      .format("memory").queryName("sessions_straggler2")
      .outputMode(OutputMode.Append())
      .start()

    input.addData((1L, ts(20), 1.0), (1L, ts(22), 2.0)) // state: [10:20, 10:22]
    query.processAllAvailable()
    // Late run 10:05, 10:08 (3 min apart — one earlier session, as the batch
    // sessionizer would emit) plus 10:11 which continues that same run.
    input.addData((1L, ts(5), 1.0), (1L, ts(8), 1.0), (1L, ts(11), 1.0))
    query.processAllAvailable()
    input.addData((2L, ts(59), 0.0))
    query.processAllAvailable()
    input.addData((2L, ts(75), 0.0))
    query.processAllAvailable()

    val out = spark.table("sessions_straggler2").as[Sessionize.Session].collect()
      .filter(_.userId == 1L).sortBy(_.startMs)
    query.stop()
    assert(out.toSeq == Seq(
      Sessionize.Session(1L, ts(5).getTime, ts(11).getTime, 3, 3.0),
      Sessionize.Session(1L, ts(20).getTime, ts(22).getTime, 2, 3.0)))
  }

  test("stragglers split across DIFFERENT batches merge into one earlier session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val sessions = Sessionize.sessions(spark, events, gapMs = 5 * 60 * 1000, watermarkDelay = "40 minutes")
    val query = sessions.writeStream
      .format("memory").queryName("sessions_xbatch")
      .outputMode(OutputMode.Append())
      .start()

    input.addData((1L, ts(20), 1.0), (1L, ts(22), 2.0)) // state: [10:20, 10:22]
    query.processAllAvailable()
    input.addData((1L, ts(5), 1.0))  // straggler, batch A
    query.processAllAvailable()
    input.addData((1L, ts(8), 1.0))  // straggler, batch B — within gap of 10:05
    query.processAllAvailable()
    input.addData((2L, ts(59), 0.0)) // watermark forward -> straggler run then session close
    query.processAllAvailable()
    input.addData((2L, ts(75), 0.0))
    query.processAllAvailable()

    val out = spark.table("sessions_xbatch").as[Sessionize.Session].collect()
      .filter(_.userId == 1L).sortBy(_.startMs)
    query.stop()
    // The batch sessionizer over {10:05, 10:08, 10:20, 10:22} emits exactly
    // two sessions — the cross-batch split must not produce three.
    assert(out.toSeq == Seq(
      Sessionize.Session(1L, ts(5).getTime, ts(8).getTime, 2, 2.0),
      Sessionize.Session(1L, ts(20).getTime, ts(22).getTime, 2, 3.0)))
  }

  test("a bridging event fuses the straggler run with the open session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val sessions = Sessionize.sessions(spark, events, gapMs = 5 * 60 * 1000, watermarkDelay = "40 minutes")
    val query = sessions.writeStream
      .format("memory").queryName("sessions_bridge")
      .outputMode(OutputMode.Append())
      .start()

    input.addData((1L, ts(20), 1.0), (1L, ts(22), 2.0)) // state: [10:20, 10:22]
    query.processAllAvailable()
    input.addData((1L, ts(13), 1.0)) // 7 min before start: straggler run
    query.processAllAvailable()
    input.addData((1L, ts(16), 1.0)) // within gap of BOTH 10:13 and 10:20 — bridges
    query.processAllAvailable()
    input.addData((2L, ts(59), 0.0)) // watermark forward
    query.processAllAvailable()
    input.addData((2L, ts(75), 0.0))
    query.processAllAvailable()

    val out = spark.table("sessions_bridge").as[Sessionize.Session].collect()
      .filter(_.userId == 1L).sortBy(_.startMs)
    query.stop()
    // Batch sessionizer over {10:13, 10:16, 10:20, 10:22}: gaps 3/4/2 min —
    // ONE session spanning the lot.
    assert(out.toSeq == Seq(
      Sessionize.Session(1L, ts(13).getTime, ts(22).getTime, 4, 5.0)))
  }

  test("state is per key: interleaved users do not merge") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val sessions = Sessionize.sessions(spark, events, gapMs = 5 * 60 * 1000, watermarkDelay = "0 seconds")
    val query = sessions.writeStream
      .format("memory").queryName("sessions_out2")
      .outputMode(OutputMode.Append())
      .start()

    input.addData((1L, ts(0), 1.0), (2L, ts(1), 10.0), (1L, ts(3), 1.0), (2L, ts(4), 10.0))
    query.processAllAvailable()
    input.addData((3L, ts(45), 0.0)) // push watermark far ahead -> both sessions close
    query.processAllAvailable()
    val out = spark.table("sessions_out2").as[Sessionize.Session].collect().sortBy(_.userId)
    query.stop()

    assert(out.length == 2)
    assert(out(0).userId == 1L && out(0).nEvents == 2 && out(0).sumValue == 2.0)
    assert(out(1).userId == 2L && out(1).nEvents == 2 && out(1).sumValue == 20.0)
  }
}
