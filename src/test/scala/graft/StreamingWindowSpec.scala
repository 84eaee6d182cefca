package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time tumbling windows + watermark in streaming mode (ST6 extension
  * surface): append-mode windows finalize only when the watermark passes
  * window end; late data beyond the delay is dropped.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("tumbling 1h windows finalize on watermark; late-beyond-delay dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val agg = input.toDF().toDF("event_type", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
    val query = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(("click", ts(10, 5), 1.0), ("click", ts(10, 50), 2.0))
    query.processAllAvailable()
    assert(spark.table("win_out").count() == 0) // window [10,11) not finalized yet

    input.addData(("click", ts(11, 30), 5.0)) // watermark -> 11:20 > 11:00: finalize [10,11)
    query.processAllAvailable()
    val r1 = spark.table("win_out").as[(Timestamp, String, Long, Double)].collect()
    assert(r1.toSeq == Seq((ts(10, 0), "click", 2L, 3.0)))

    input.addData(("click", ts(10, 59), 99.0)) // late beyond 10min delay -> dropped
    input.addData(("click", ts(12, 40), 7.0))  // watermark -> 12:30: finalize [11,12)
    query.processAllAvailable()
    val r2 = spark.table("win_out").as[(Timestamp, String, Long, Double)].collect().sortBy(_._1.getTime)
    query.stop()
    assert(r2.toSeq == Seq((ts(10, 0), "click", 2L, 3.0), (ts(11, 0), "click", 1L, 5.0)))
  }
}
