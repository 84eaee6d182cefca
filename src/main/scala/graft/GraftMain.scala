package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.config._
import graft.sinks.{GraftSink, Sinks}
import graft.sources.MessageSource
import graft.streaming.StreamRunner

/** The reference's `python -m src.main` equivalent (SURVEY §3 lifecycle):
  * `CONSUMER_CONFIG` YAML → typed config → one Spark plan → sink → xcom JSON.
  *
  * Environment contract (mirroring `/root/reference/src/main.py`):
  *  - `CONSUMER_CONFIG`       the YAML document (or `CONSUMER_CONFIG_FILE`)
  *  - `DATA_INTERVAL_START/END` epoch-ms bounds for the assign strategy
  *  - delta config: when present and DATA_INTERVAL_START is unset, the sink's
  *    max(delta-column) becomes the start bound (S11 — made explicit here
  *    instead of the reference's constructor side effect that mutates env)
  *  - `FAIL_ON_NON_CRITICAL_ERROR` non-zero exit when error_count > 0
  *  - `GRAFT_XCOM_PATH`       where the summary JSON lands (default stdout)
  *  - `GRAFT_SOURCE_DIR`      file-backed topic directory (Kafka brokers via
  *    `GRAFT_KAFKA_BROKERS` on a real cluster)
  *  - `GRAFT_JDBC_URL`        JDBC sink; otherwise target.table is a parquet path
  *  - `GRAFT_PAYLOAD_SCHEMA`  payload DDL, e.g. "k LONG, user STRUCT<id: LONG>"
  */
object GraftMain {

  def main(args: Array[String]): Unit = {
    val yaml = sys.env.get("CONSUMER_CONFIG")
      .orElse(sys.env.get("CONSUMER_CONFIG_FILE").map(f => Files.readString(Paths.get(f))))
      .getOrElse(throw new IllegalArgumentException("CONSUMER_CONFIG (or CONSUMER_CONFIG_FILE) is required"))
    val cfg = ConfigYaml.fromYaml(yaml)
    val spark = GraftSession.get()
    val payloadSchema = sys.env.get("GRAFT_PAYLOAD_SCHEMA")
      .map(StructType.fromDDL)
      .getOrElse(StructType(Seq(StructField("k", LongType))))
    val pipeline = new Pipeline(cfg, payloadSchema)
    val sink = Sinks.forTarget(cfg.target, sys.env.get("GRAFT_JDBC_URL"), cfg.source.batchSize)

    val summary = cfg.source.strategy match {
      case ConsumerStrategy.Assign => runAssign(spark, cfg, pipeline, sink)
      case ConsumerStrategy.Subscribe =>
        val ckpt = sys.env.getOrElse("GRAFT_CHECKPOINT_DIR",
          Files.createTempDirectory("graft-ckpt").toString)
        val runner = new StreamRunner(pipeline, sink, ckpt)
        val srcDir = sourceDir()
        val stream = spark.readStream.schema(MessageSource.schema).parquet(s"$srcDir/topic")
        runner.runAvailableNow(spark, stream)
        runner.summary
    }

    val json = summary.xcomJson
    sys.env.get("GRAFT_XCOM_PATH") match {
      case Some(p) => Files.writeString(Paths.get(p), json); println(json)
      case None => println(json)
    }
    spark.stop()
    if (sys.env.get("FAIL_ON_NON_CRITICAL_ERROR").exists(v => v == "true" || v == "True")
        && summary.errorCount > 0) sys.exit(1)
  }

  private def sourceDir(): String =
    sys.env.getOrElse("GRAFT_SOURCE_DIR", sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))

  /** S1 assign strategy: bounded interval read. Start bound resolution order
    * is the reference's (`/root/reference/src/oracle_target.py:19-20`):
    * explicit DATA_INTERVAL_START, else the sink's delta watermark.
    */
  private def runAssign(
      spark: org.apache.spark.sql.SparkSession,
      cfg: PipelineConfig,
      pipeline: Pipeline,
      sink: GraftSink): ProcessSummary = {
    val explicitStart = sys.env.get("DATA_INTERVAL_START").map(_.toLong)
    val deltaStart: Option[Long] = (explicitStart, cfg.target.delta) match {
      case (s @ Some(_), _) => s
      case (None, Some(d)) =>
        sink.maxWatermark(spark, d.deltaColumn).map { wm =>
          // Oslo wall-clock watermark -> UTC epoch-ms (int_ms_to_date inverse,
          // `/root/reference/src/oracle_target.py:36-42`). The wall clock is
          // read explicitly in UTC — Timestamp.toLocalDateTime would render it
          // in the JVM default zone, shifting the bound on a non-UTC driver.
          val oslo = java.time.ZoneId.of("Europe/Oslo")
          wm.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime.atZone(oslo).toInstant.toEpochMilli
        }
      case _ => None
    }
    val endMs = sys.env.get("DATA_INTERVAL_END").map(_.toLong)
    val raw = sys.env.get("GRAFT_KAFKA_BROKERS") match {
      case Some(brokers) =>
        MessageSource.kafka(spark, brokers, cfg.source.topic,
          deltaStart.getOrElse(0L), endMs.getOrElse(Long.MaxValue))
      case None =>
        MessageSource.fromEvents(spark, sourceDir(), cfg.source.topic,
          startMs = deltaStart, endMs = endMs)
    }
    pipeline.run(spark, raw, sink)
  }
}
