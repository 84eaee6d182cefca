package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.config._
import graft.sinks.ParquetSink
import graft.sources.MessageSource

/** Replicates the driver's t1 smoke (SparkEntry.entry rows > 0) and runs the
  * full Pipeline.run path — sink write + Observation-based ProcessSummary —
  * twice, to show the incremental-consumption contract (second run writes 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"""{"smoke_rows":$n,"columns":"${df.columns.mkString(",")}"}""")

    val cfg = PipelineConfig(
      source = SourceConfig(topic = "events"),
      target = TargetConfig(table = "graft_out", skipDuplicatesWith = Seq("kafka_hash")),
      transform = Seq(
        TransformRule("kafka_key", "kafka_key"),
        TransformRule("kafka_hash", "kafka_hash"),
        TransformRule("kafka_timestamp", "lastet_ts", fun = Some("int-unix-ms -> datetime-no")),
        TransformRule("$GRAFT", "kildesystem"),
        TransformRule("$$BATCH_TIME", "lastet_tid"))).validated
    val pipe = new Pipeline(cfg, StructType(Seq(StructField("k", LongType))),
      batchTime = new Timestamp(System.currentTimeMillis()))
    val sink = new ParquetSink(Files.createTempDirectory("graft-smoke").toString + "/sink")
    val raw = MessageSource.fromEvents(spark, "/root/testdata/sf0.001")
    val s1 = pipe.run(spark, raw, sink)
    println(s"""{"run":1,"summary":${s1.xcomJson}}""")
    val s2 = pipe.run(spark, raw, sink)
    println(s"""{"run":2,"summary":${s2.xcomJson}}""")
    spark.stop()
    if (n <= 0 || s2.writtenToDbCount != 0) sys.exit(1)
  }
}
