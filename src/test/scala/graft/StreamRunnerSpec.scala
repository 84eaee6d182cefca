package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.config._
import graft.sinks.ParquetSink
import graft.sources.MessageSource
import graft.streaming.StreamRunner

/** ST2 subscribe-strategy semantics via Structured Streaming AvailableNow:
  * run-to-end-then-stop, checkpointed offsets, idempotent sink writes.
  */
class StreamRunnerSpec extends SparkSpec {

  private val msgSchema = MessageSource.schema

  private def writeMessages(dir: String, from: Int, until: Int): Unit =
    MessageSource.fromRows(spark, (from until until).map { i =>
      (s"k$i".getBytes("UTF-8"), s"""{"k": $i}""".getBytes("UTF-8"),
        "t", i % 2, i.toLong, 1700000000000L + i)
    }).write.mode("append").parquet(dir)

  private val cfg = PipelineConfig(
    source = SourceConfig(topic = "t", strategy = ConsumerStrategy.Subscribe),
    target = TargetConfig(table = "unused",
      skipDuplicatesWith = Seq("kafka_partition", "kafka_offset", "kafka_topic")),
    transform = Seq(
      TransformRule("kafka_key", "kafka_key"),
      TransformRule("kafka_partition", "kafka_partition"),
      TransformRule("kafka_offset", "kafka_offset"),
      TransformRule("kafka_topic", "kafka_topic"),
      TransformRule("k", "k"))).validated

  test("AvailableNow drains the log, commits offsets, resumes with only new data") {
    val base = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$base/topic"
    val sinkDir = s"$base/sink"
    val ckpt = s"$base/ckpt"
    writeMessages(srcDir, 0, 10)

    val pipe = new Pipeline(cfg, StructType(Seq(StructField("k", LongType))),
      batchTime = Timestamp.valueOf("2024-06-01 12:00:00"))
    val sink = new ParquetSink(sinkDir)

    def stream = spark.readStream.schema(msgSchema).parquet(srcDir)

    val r1 = new StreamRunner(pipe, sink, ckpt)
    r1.runAvailableNow(spark, stream)
    assert(r1.summary.eventCount == 10)
    assert(r1.summary.writtenToDbCount == 10)
    assert(spark.read.parquet(sinkDir).count() == 10)

    // New messages arrive; a fresh run consumes ONLY them (checkpoint holds
    // the committed offsets — the reference's consumer-group semantics).
    writeMessages(srcDir, 10, 15)
    val r2 = new StreamRunner(pipe, sink, ckpt)
    r2.runAvailableNow(spark, stream)
    assert(r2.summary.eventCount == 5)
    assert(r2.summary.writtenToDbCount == 5)
    assert(spark.read.parquet(sinkDir).count() == 15)

    // Replay protection: wiping the checkpoint replays the whole log, but the
    // J2 anti-join keeps the sink duplicate-free (effectively-once).
    val r3 = new StreamRunner(pipe, sink, s"$base/ckpt2")
    r3.runAvailableNow(spark, stream)
    assert(r3.summary.eventCount == 15)
    assert(r3.summary.writtenToDbCount == 0)
    assert(spark.read.parquet(sinkDir).count() == 15)
  }
}
