package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config._
import graft.sources.MessageSource

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full correctness inventory: SURVEY §2 reference parity
  * ([[QueriesParity]]) + the 100 TB training-data extensions ([[QueriesExt]]).
  * Every entry has a DuckDB oracle in `oracleSql` with matching column names.
  */
object SparkEntry {

  /** Flagship: the reference's canonical pipeline (SURVEY §7.2) on sf0.001 —
    * events-as-topic → JSON envelope → transform rules → intra-run dedup.
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    val dir = "/root/testdata/sf0.001"
    val cfg = PipelineConfig(
      source = SourceConfig(topic = "events",
        messageFilters = Nil, messageFieldsFilter = Nil, flagFieldConfig = Nil),
      target = TargetConfig(table = "graft_out", skipDuplicatesWith = Seq("kafka_hash")),
      transform = Seq(
        TransformRule("kafka_key", "kafka_key"),
        TransformRule("kafka_offset", "kafka_offset"),
        TransformRule("kafka_hash", "kafka_hash"),
        TransformRule("kafka_timestamp", "lastet_ts", fun = Some("int-unix-ms -> datetime-no")),
        TransformRule("$GRAFT", "kildesystem"),
        TransformRule("$$BATCH_TIME", "lastet_tid"))).validated
    val pipe = new Pipeline(cfg, StructType(Seq(StructField("k", LongType))),
      batchTime = Timestamp.valueOf("2024-06-01 12:00:00"))
    val raw = MessageSource.fromEvents(spark, dir)
    pipe.transformed(raw).dropDuplicates("kafka_hash")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions).
    * Each function configures the host session (UTC TZ, parquet nanos-as-long,
    * graft function registry) before building its plan.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ((QueriesParity.all ++ QueriesExt.all).map { case (name, (fn, _)) => name -> fn }
      ++ QueriesExt.noOracle).map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => {
        GraftSession.configure(s)
        fn(s, dir)
      })
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables (column names aligned with the Spark output).
    */
  def oracleSql: Map[String, String] =
    (QueriesParity.all ++ QueriesExt.all).map { case (name, (_, sql)) => name -> sql }.toMap
}
