package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Sessionize, SessionizeTws}

/** The transformWithState sessionizer must reproduce the fMGWS twin's
  * semantics scenario-for-scenario: watermark-timed closes (via timers),
  * cross-batch late merges, and pre-start stragglers.
  */
class SessionizeTwsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def withRocks[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("TWS sessions split on gap and close via TIMERS on watermark progress") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Double)]
      val events = input.toDF().toDF("user_id", "ts", "value")
      val sessions = SessionizeTws.sessions(spark, events,
        gapMs = 5 * 60 * 1000, watermarkDelay = "0 seconds")
      val query = sessions.writeStream
        .format("memory").queryName("tws_sessions_out")
        .outputMode(OutputMode.Append())
        .start()
      input.addData((1L, ts(0), 1.0), (1L, ts(2), 2.0))
      query.processAllAvailable()
      input.addData((1L, ts(30), 3.0))
      query.processAllAvailable()
      input.addData((1L, ts(59), 4.0))
      query.processAllAvailable()
      val out = spark.table("tws_sessions_out").as[Sessionize.Session].collect()
        .sortBy(_.startMs)
      query.stop()
      assert(out.toSeq == Seq(
        Sessionize.Session(1L, ts(0).getTime, ts(2).getTime, 2, 3.0),
        Sessionize.Session(1L, ts(30).getTime, ts(30).getTime, 1, 3.0)))
    }
  }

  test("TWS funnel late data: forward-late advances; bridging-late does NOT retro-advance") {
    // The last untested streaming behavior class for the funnel twins
    // (the r13 verdict's late-data item covered the windowed/sessionize
    // paths): the funnel processor is SINGLE-PASS — state is (stage, ts)
    // only, no event buffer — so a late event that arrives while it is
    // still the next expected stage advances normally (forward-late), but
    // a late BRIDGING event cannot resurrect a successor that was already
    // scanned and discarded before the bridge arrived. That divergence
    // from the all-events batch replay is the documented contract (state
    // O(1) per user instead of O(events)); batch replay is the
    // reconciliation path. Both halves pinned here, plus the batch value
    // itself so the divergence is explicit, not assumed.
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String, Long)]
      val events = input.toDF().toDF("u", "et", "t")
      val stages = Seq("view", "cart", "buy")
      val query = graft.streaming.FunnelTws.funnel(events, stages)
        .writeStream.format("memory").queryName("tws_funnel_late")
        .outputMode(OutputMode.Append()).start()
      // batch 1 — user 1: view only; user 2: view then buy (buy is scanned
      // and DISCARDED: cart hasn't happened yet)
      input.addData((1L, "view", 10L), (2L, "view", 10L), (2L, "buy", 30L))
      query.processAllAvailable()
      // batch 2 — both users' cart@20 arrives LATE (event time before the
      // already-seen buy@30)
      input.addData((1L, "cart", 20L), (2L, "cart", 20L))
      query.processAllAvailable()
      val reached = spark.table("tws_funnel_late").groupBy("u")
        .agg(org.apache.spark.sql.functions.max("reached").as("r"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      query.stop()
      assert(reached(1L) == 1, "forward-late cart must advance user 1 to cart")
      assert(reached(2L) == 1,
        "bridging-late cart must NOT resurrect user 2's discarded buy")
      // The all-events batch replay DOES see the full order for user 2 —
      // the divergence is real and directional (stream <= batch).
      val batch = graft.operators.EventAnalytics.funnelStateful(
        Seq((1L, "view", 10L), (2L, "view", 10L), (2L, "buy", 30L),
          (1L, "cart", 20L), (2L, "cart", 20L)).toDF("u", "et", "t"), stages)
        .groupBy("u").agg(org.apache.spark.sql.functions.max("reached").as("r"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(batch(1L) == 1 && batch(2L) == 2)
    }
  }

  test("TWS late-but-within-watermark merge cannot move a session end backwards") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Double)]
      val events = input.toDF().toDF("user_id", "ts", "value")
      val sessions = SessionizeTws.sessions(spark, events,
        gapMs = 5 * 60 * 1000, watermarkDelay = "30 minutes")
      val query = sessions.writeStream
        .format("memory").queryName("tws_sessions_late")
        .outputMode(OutputMode.Append())
        .start()
      input.addData((1L, ts(0), 1.0), (1L, ts(4), 2.0))
      query.processAllAvailable()
      input.addData((1L, ts(1), 4.0)) // late, must merge without dragging the end
      query.processAllAvailable()
      input.addData((2L, ts(45), 0.0))
      query.processAllAvailable()
      input.addData((2L, ts(59), 0.0))
      query.processAllAvailable()
      val out = spark.table("tws_sessions_late").as[Sessionize.Session]
        .collect().filter(_.userId == 1L)
      query.stop()
      assert(out.toSeq == Seq(Sessionize.Session(1L, ts(0).getTime, ts(4).getTime, 3, 7.0)))
    }
  }

  test("TWS pre-start straggler closes as its own session (state, not batch-local)") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Double)]
      val events = input.toDF().toDF("user_id", "ts", "value")
      val sessions = SessionizeTws.sessions(spark, events,
        gapMs = 5 * 60 * 1000, watermarkDelay = "40 minutes")
      val query = sessions.writeStream
        .format("memory").queryName("tws_sessions_strag")
        .outputMode(OutputMode.Append())
        .start()
      input.addData((1L, ts(20), 1.0)) // open session at 10:20
      query.processAllAvailable()
      input.addData((1L, ts(5), 9.0)) // straggler > gap before start
      query.processAllAvailable()
      input.addData((2L, ts(55), 0.0)) // watermark to 10:15: straggler closes
      query.processAllAvailable()
      input.addData((2L, ts(59), 0.0))
      query.processAllAvailable()
      val out = spark.table("tws_sessions_strag").as[Sessionize.Session]
        .collect().filter(_.userId == 1L).sortBy(_.startMs)
      query.stop()
      // watermark tops out at 10:19 (10:59 − 40m): the straggler's deadline
      // (10:05 + gap = 10:10) passed — it closes ALONE — while the open
      // session's (10:25) has not; emitting it too would be wrong.
      assert(out.toSeq == Seq(
        Sessionize.Session(1L, ts(5).getTime, ts(5).getTime, 1, 9.0)))
    }
  }
}
