package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2: the bounded message scan.
  *
  * The engine consumes any relation in the canonical Kafka shape
  * (`key BINARY, value BINARY, topic STRING, partition INT, offset LONG,
  * timestamp LONG-epoch-ms` — see [[graft.operators.Envelope]]). On a real
  * cluster that relation is `spark.read.format("kafka")` with
  * `startingTimestamp`/`endingTimestamp` carrying the
  * `DATA_INTERVAL_START/END` bounds — Spark's Kafka source resolves them to
  * per-partition offset ranges broker-side, the exact analogue of the
  * reference's `offsets_for_times` + per-partition retirement
  * (`/root/reference/src/kafka_source.py:220-265,330-338`), with one input
  * partition per Kafka partition and no driver-side polling loop.
  *
  * This build environment ships no kafka connector jar, so the adapters here
  * produce the same shape from files/memory; every operator downstream is
  * source-agnostic.
  */
object MessageSource {

  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  /** Reader options for the bounded interval. The `*ByTimestamp` options
    * require an explicit per-partition map (no `-1` wildcard exists for
    * them), so the bounds ride the global `startingTimestamp` /
    * `endingTimestamp` options instead — the broker resolves them to
    * per-partition offsets (`KafkaConsumer.offsetsForTimes`), exactly like
    * the reference's `offsets_for_times` call. Factored out so the spec can
    * assert the exact options without a broker.
    */
  def kafkaOptions(brokers: String, topic: String, startMs: Long, endMs: Long): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    "subscribe" -> topic,
    "startingTimestamp" -> startMs.toString,
    "endingTimestamp" -> endMs.toString)

  /** Kafka relation for a bounded time interval (assign-strategy parity).
    * `startMs`/`endMs` are the `DATA_INTERVAL_START/END` epoch-ms bounds; the
    * end bound is exclusive like `endingTimestamp`.
    */
  def kafka(spark: SparkSession, brokers: String, topic: String, startMs: Long, endMs: Long): DataFrame = {
    spark.read
      .format("kafka")
      .options(kafkaOptions(brokers, topic, startMs, endMs))
      .load()
      .select(
        col("key"),
        col("value"),
        col("topic"),
        col("partition"),
        col("offset"),
        (col("timestamp").cast(LongType) * 1000 + expr("extract(milliseconds from timestamp)").cast(LongType) % 1000).as("timestamp"))
  }

  /** File-backed topic: the driver's `events` table re-shaped into the
    * canonical message frame. `event_id` plays offset, `user_id` the key,
    * `props` the JSON value, `ts` (nanos → ms) the broker timestamp;
    * partition = user_id % partitions (stable, like key-hash partitioning).
    *
    * The time-interval bound (ST1) is a plain filter on `timestamp` — against
    * parquet it reaches the scan as a pushed predicate (the analogue of
    * offsets_for_times partition pruning).
    */
  def fromEvents(
      spark: SparkSession,
      sfDir: String,
      topic: String = "events",
      partitions: Int = 8,
      startMs: Option[Long] = None,
      endMs: Option[Long] = None): DataFrame = {
    val ev = EventsTable.load(spark, sfDir)
    val tsMs = graft.functions.Conversions.nanosToEpochMs(col("ts"))
    var df = ev.select(
        col("user_id").cast(StringType).cast(BinaryType).as("key"),
        col("props").cast(BinaryType).as("value"),
        lit(topic).as("topic"),
        pmod(col("user_id"), lit(partitions)).cast(IntegerType).as("partition"),
        col("event_id").cast(LongType).as("offset"),
        tsMs.as("timestamp"))
      // Spread rows over `partitions` splits for the envelope pipeline —
      // without this a compact parquet file arrives as ONE split and the
      // whole pipeline (sha256 + JSON re-serialization per row) runs
      // single-task. Hashing by (partition, offset) fills ALL splits
      // uniformly; hashing by `partition` alone would collide the
      // 0..partitions-1 values into a subset of buckets (murmur3 of small
      // ints is not a bijection mod n) and idle the rest. NOTE this file
      // adapter does NOT reproduce Kafka's one-split-per-topic-partition
      // layout or per-partition offset order — no operator in this engine
      // depends on either (watermarks are MAX-based, the dup-check write
      // is idempotent); the real-Kafka branch inherits the connector's
      // native per-partition layout untouched.
      .repartition(partitions, col("partition"), col("offset"))
    startMs.foreach(s => df = df.filter(col("timestamp") >= s))
    endMs.foreach(e => df = df.filter(col("timestamp") < e))
    df
  }

  /** In-memory topic for unit tests. */
  def fromRows(spark: SparkSession, rows: Seq[(Array[Byte], Array[Byte], String, Int, Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (k, v, t, p, o, ts) => org.apache.spark.sql.Row(k, v, t, p, o, ts) }
    spark.createDataFrame(data.asJava, schema)
  }
}
