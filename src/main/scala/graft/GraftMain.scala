package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
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
  *  - `GRAFT_K6_DIM_DIR`      file mode only: directory holding
  *    `<filter-table>` as parquet (defaults to the source dir)
  *
  * All lookups go through an injected `env` function so the whole lifecycle is
  * exercisable from a spec without mutating JVM process environment.
  */
object GraftMain {

  type Env = String => Option[String]

  def main(args: Array[String]): Unit = {
    val env: Env = sys.env.get
    try {
      val summary = execute(env)
      val json = summary.xcomJson
      env("GRAFT_XCOM_PATH") match {
        case Some(p) => Files.writeString(Paths.get(p), json); println(json)
        case None => println(json)
      }
      GraftSession.get().stop()
      if (env("FAIL_ON_NON_CRITICAL_ERROR").exists(v => v.equalsIgnoreCase("true"))
          && summary.errorCount > 0)
        throw new IllegalStateException(s"Finished with ${summary.errorCount} non-critical errors")
    } catch {
      case ex: Throwable =>
        // Airflow-triage parity (`/root/reference/src/main.py:68-85`): one
        // structured line carrying the exception class, a stable fingerprint
        // hash of (class + frame chain), and the message — so recurring
        // failures group by fingerprint in the log index even when messages
        // carry variable data.
        System.err.println(failureRecord(ex))
        sys.exit(1)
    }
  }

  /** Full lifecycle minus process concerns (xcom emission, exit code):
    * config → pipeline → k6 dim → strategy → summary. The spec's e2e seam.
    */
  private[graft] def execute(env: Env): ProcessSummary = {
    val yaml = env("CONSUMER_CONFIG")
      .orElse(env("CONSUMER_CONFIG_FILE").map(f => Files.readString(Paths.get(f))))
      .getOrElse(throw new IllegalArgumentException("CONSUMER_CONFIG (or CONSUMER_CONFIG_FILE) is required"))
    val cfg = ConfigYaml.fromYaml(yaml)
    val spark = GraftSession.get()
    val payloadSchema = env("GRAFT_PAYLOAD_SCHEMA")
      .map(StructType.fromDDL)
      .getOrElse(StructType(Seq(StructField("k", LongType))))
    val pipeline = new Pipeline(cfg, payloadSchema)
    val sink = Sinks.forTarget(cfg.target, env("GRAFT_JDBC_URL"), cfg.source.batchSize)
    val k6Dim = loadK6Dim(spark, cfg, env)

    val summary = cfg.source.strategy match {
      case ConsumerStrategy.Assign => runAssign(spark, cfg, pipeline, sink, k6Dim, env)
      case ConsumerStrategy.Subscribe =>
        val ckpt = env("GRAFT_CHECKPOINT_DIR")
          .getOrElse(Files.createTempDirectory("graft-ckpt").toString)
        val runner = new StreamRunner(pipeline, sink, ckpt)
        val stream = spark.readStream.schema(MessageSource.schema).parquet(s"${sourceDir(env)}/topic")
        runner.runAvailableNow(spark, stream, k6Dim)
        runner.summary
    }

    // Embedded curation (one-document lifecycle, round-12 verdict item 7):
    // the stage chain runs over the LANDED table — after the sink commit,
    // exactly where a production curation job sits — and its report lands
    // next to the curated corpus like a standalone CurateMain run's. File
    // mode only: with a JDBC sink the landed table is not a parquet path
    // (run CurateMain against a warehouse export instead).
    cfg.curate.foreach { c =>
      require(env("GRAFT_JDBC_URL").isEmpty,
        "embedded curate requires a file-mode (parquet path) sink")
      CurateMain.writeReport(spark, c, CurateMain.run(spark, c))
    }
    summary
  }

  /** One JSON log line for a failed run: exception class, 12-hex fingerprint
    * of class + stack frames (file/method/line — message EXCLUDED so runs
    * failing at the same place fingerprint identically), and the message.
    * The reference's frame-chain log (`/root/reference/src/main.py:71-84`)
    * with the chain compressed to a groupable hash.
    */
  private[graft] def failureRecord(ex: Throwable): String = {
    val frames = ex.getStackTrace.toSeq
      .map(f => s"${f.getFileName} ${f.getMethodName} ${f.getLineNumber}")
    val basis = (ex.getClass.getName +: frames).mkString("\n")
    val fp = java.security.MessageDigest.getInstance("SHA-256")
      .digest(basis.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"""{"level":"ERROR","error_class":"${jsonEscape(ex.getClass.getName)}","fingerprint":"$fp","msg":"${jsonEscape(ex.getMessage)}"}"""
  }

  /** JSON string-body escaping for the hand-built records ([[failureRecord]],
    * [[CurateMain.StageReport]]) — user-controlled names must not be able to
    * break the documents' machine-readability.
    */
  private[graft] def jsonEscape(s: String): String =
    Option(s).getOrElse("").flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def sourceDir(env: Env): String =
    env("GRAFT_SOURCE_DIR").orElse(env("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.001")

  /** J1 wiring: when a `k6-filter` is configured, load the screening
    * dimension the same way the reference probes it
    * (`/root/reference/src/oracle_target.py:71-77`): the `filter-table` read
    * from the warehouse, pre-filtered to `skjermet_kode IN (6,7)`. With a
    * JDBC sink URL the filter is PUSHED to the database (the dimension that
    * crosses the wire is only the screened population — small by
    * construction, which is what makes [[graft.operators.Joins.k6Mask]]'s
    * broadcast safe); in file mode `filter-table` resolves to a parquet
    * directory under `GRAFT_K6_DIM_DIR` (default: the source dir).
    */
  private[graft] def loadK6Dim(spark: SparkSession, cfg: PipelineConfig, env: Env): Option[DataFrame] =
    cfg.target.k6Filter.map { k6 =>
      val dim = env("GRAFT_JDBC_URL") match {
        case Some(url) =>
          spark.read.format("jdbc")
            .option("url", url).option("dbtable", k6.filterTable).load()
        case None =>
          val base = env("GRAFT_K6_DIM_DIR").getOrElse(sourceDir(env))
          val path = if (k6.filterTable.contains("/")) k6.filterTable
                     else s"$base/${k6.filterTable}"
          spark.read.parquet(path)
      }
      dim.where(col("skjermet_kode").isin(6, 7))
    }

  /** S1 assign strategy: bounded interval read. Start bound resolution order
    * is the reference's (`/root/reference/src/oracle_target.py:19-20`):
    * explicit DATA_INTERVAL_START, else the sink's delta watermark.
    */
  private[graft] def runAssign(
      spark: SparkSession,
      cfg: PipelineConfig,
      pipeline: Pipeline,
      sink: GraftSink,
      k6Dim: Option[DataFrame],
      env: Env): ProcessSummary = {
    val explicitStart = env("DATA_INTERVAL_START").map(_.toLong)
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
    val endMs = env("DATA_INTERVAL_END").map(_.toLong)
    val raw = env("GRAFT_KAFKA_BROKERS") match {
      case Some(brokers) =>
        MessageSource.kafka(spark, brokers, cfg.source.topic,
          deltaStart.getOrElse(0L), endMs.getOrElse(Long.MaxValue))
      case None =>
        MessageSource.fromEvents(spark, sourceDir(env), cfg.source.topic,
          startMs = deltaStart, endMs = endMs)
    }
    pipeline.run(spark, raw, sink, k6Dim)
  }
}
