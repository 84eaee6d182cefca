package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{ColumnTypeOverride, TargetConfig}

/** S8/S9/S10 + S11: sinks and the delta-watermark scan.
  *
  * A sink is anything that can (a) write a batch and (b) expose the existing
  * rows needed by the J2 dedup anti-join and the S11 watermark. JDBC/Oracle is
  * the production target; parquet backs the test pyramid (no DB containers in
  * this environment — same split as SURVEY §5).
  */
trait GraftSink {
  def write(df: DataFrame): Unit
  /** Existing sink rows projected to `cols` (for J2); empty frame if the sink
    * target does not exist yet.
    */
  def existing(spark: SparkSession, cols: Seq[String]): Option[DataFrame]
  /** S11/A1: `SELECT max(deltaColumn)` over the sink — the incremental-load
    * high watermark (`/root/reference/src/oracle_target.py:30-43`). Pushed to
    * the source where the connector supports aggregate pushdown.
    */
  def maxWatermark(spark: SparkSession, deltaColumn: String): Option[java.sql.Timestamp] = {
    existing(spark, Seq(deltaColumn)).flatMap { df =>
      val r = df.agg(max(col(deltaColumn))).head()
      if (r.isNullAt(0)) None else Some(r.get(0) match {
        case t: java.sql.Timestamp => t
        case other => java.sql.Timestamp.valueOf(other.toString)
      })
    }
  }
}

/** S8: JDBC sink (Oracle in production). `columnTypes` is the whitelisted
  * replacement for the reference's eval'd `custom-config` bind overrides
  * (`/root/reference/src/base.py:35-42`): it becomes explicit casts plus
  * `createTableColumnTypes`. `batchsize` mirrors `batch-size`-per-executemany
  * (`/root/reference/src/oracle_target.py:113`); rows flow straight from
  * executors to the DB — the driver never materializes a batch.
  */
final class JdbcSink(
    url: String,
    table: String,
    connProps: Map[String, String] = Map.empty,
    columnTypes: Seq[ColumnTypeOverride] = Nil,
    batchSize: Int = 5000) extends GraftSink {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("batchsize", batchSize.toString)
    p
  }

  override def write(df: DataFrame): Unit = {
    val w = df.write.mode("append")
    val withTypes =
      if (columnTypes.isEmpty) w
      else w.option("createTableColumnTypes", columnTypes.map(o => s"${o.column} ${o.sqlType}").mkString(", "))
    withTypes.jdbc(url, table, props)
  }

  /** Existing rows for the J2 anti-join. ONLY "table does not exist" maps to
    * None (first run against a fresh target); connectivity/auth/any other
    * JDBC failure propagates. Swallowing those would silently degrade the
    * skip-duplicates guarantee to intra-batch-only and double-insert.
    */
  override def existing(spark: SparkSession, cols: Seq[String]): Option[DataFrame] =
    try Some(spark.read.jdbc(url, table, props).select(cols.map(col): _*))
    catch { case e: Throwable if JdbcSink.isMissingTable(e) => None }
}

object JdbcSink {
  /** True iff the exception chain denotes a missing table/view, by SQLState
    * (ANSI/MySQL 42S02, Postgres 42P01, Derby 42X05), vendor code (Oracle
    * ORA-00942) or, for wrapped analysis errors, message text.
    */
  private[sinks] def isMissingTable(e: Throwable): Boolean = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16).toSeq
    chain.exists {
      case s: java.sql.SQLException =>
        val state = Option(s.getSQLState).getOrElse("")
        state == "42S02" || state == "42P01" || state == "42X05" || s.getErrorCode == 942
      case other =>
        val m = Option(other.getMessage).getOrElse("")
        m.matches("(?is).*(table or view does not exist|table or view .* not found|table .* (does not exist|not found)).*")
    }
  }
}

/** Parquet-backed sink for the file test pyramid; append semantics like the
  * Oracle INSERT path.
  */
final class ParquetSink(path: String) extends GraftSink {
  override def write(df: DataFrame): Unit = df.write.mode("append").parquet(path)
  override def existing(spark: SparkSession, cols: Seq[String]): Option[DataFrame] =
    if (new java.io.File(path).exists())
      Some(spark.read.parquet(path).select(cols.map(col): _*))
    else None
}

/** S10: console sink (`/root/reference/src/console_target.py:10-15`). */
final class ConsoleSink(numRows: Int = 20) extends GraftSink {
  override def write(df: DataFrame): Unit = df.show(numRows, truncate = false)
  override def existing(spark: SparkSession, cols: Seq[String]): Option[DataFrame] = None
}

object Sinks {

  /** S9 (`/root/reference/src/kafka_target.py:79-90`): serialize rows to the
    * Confluent-Avro wire format as a canonical Kafka producer frame
    * (`key BINARY, value BINARY`) — `.write.format("kafka")` ready. The
    * reference keys messages with uuid4; a random key's only job is
    * partition spreading, so graft uses a deterministic spread key derived
    * from the row content (replay-stable, same distribution).
    */
  def kafkaAvroFrame(
      df: org.apache.spark.sql.DataFrame,
      datum: org.apache.spark.sql.Column,
      writerSchemaJson: String,
      schemaId: Int): org.apache.spark.sql.DataFrame = {
    val value = graft.sources.ConfluentAvro.encode(datum, writerSchemaJson, schemaId)
    df.select(
      sha2(to_json(datum), 256).cast("binary").as("key"),
      value.as("value"))
  }
  /** Build the sink described by a [[TargetConfig]]: `jdbc:…` URLs → JDBC,
    * `console` → console, anything else → parquet path.
    */
  def forTarget(t: TargetConfig, jdbcUrl: Option[String] = None, batchSize: Int = 5000): GraftSink =
    jdbcUrl match {
      case Some(u) => new JdbcSink(u, t.table, columnTypes = t.columnTypes, batchSize = batchSize)
      case None if t.table == "console" => new ConsoleSink()
      case None => new ParquetSink(t.table)
    }
}
