package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoins

/** Stream-stream interval join unit coverage; the sf-scale parity gates are
  * `st_join_interval` / `st_join_interval_left` in [[QueriesExt]]. This spec
  * pins the sub-second span semantics: the match bound is built from
  * MILLISECONDS, so `maxSpanMs = 500` means 500 ms — not integer-divided to
  * an `INTERVAL 0 SECONDS` exact-equality match.
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long): Timestamp = new Timestamp(1704103200000L + ms) // 2024-01-01 10:00:00Z

  test("intervalJoin honors sub-second maxSpanMs exactly") {
    implicit val sqlCtx = spark.sqlContext
    val dims = MemoryStream[(String, Timestamp)]
    val facts = MemoryStream[(String, Timestamp)]
    val joined = StreamJoins.intervalJoin(
      facts.toDF().toDF("key", "fact_ts"),
      dims.toDF().toDF("key", "dim_ts"),
      key = "key", factTs = "fact_ts", dimTs = "dim_ts",
      maxSpanMs = 500L, watermarkDelay = "1 second")
    val query = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append()).start()

    dims.addData(("u", ts(0)))
    facts.addData(
      ("u", ts(300)),  // inside [dim, dim+500ms] -> match
      ("u", ts(500)),  // boundary inclusive -> match
      ("u", ts(700)),  // past the span -> no match
      ("v", ts(100)))  // no dim for key -> no match
    query.processAllAvailable()
    val got = spark.table("ij_out").select("key", "fact_ts")
      .as[(String, Timestamp)].collect().toSeq.sortBy(_._2.getTime)
    query.stop()
    assert(got == Seq(("u", ts(300)), ("u", ts(500))))
  }
}
