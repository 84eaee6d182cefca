package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.JdbcSink
import graft.sources.MessageSource

/** Production source/sink edges that need no broker/DB server:
  *  - the exact Kafka reader options built for a DATA_INTERVAL (the only
  *    untestable-at-runtime branch — asserted by construction instead);
  *  - the JDBC sink against embedded Derby (write, existing, and the
  *    missing-table vs real-failure distinction that guards J2).
  */
class SourcesSinksSpec extends SparkSpec {

  test("S1 kafka reader options: global timestamp bounds, no per-partition map") {
    val opts = MessageSource.kafkaOptions("b1:9092,b2:9092", "mytopic", 1700000000000L, 1700003600000L)
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "mytopic",
      "startingTimestamp" -> "1700000000000",
      "endingTimestamp" -> "1700003600000"))
    // The *ByTimestamp options (which require explicit per-partition maps and
    // have no "-1" wildcard) must NOT appear.
    assert(!opts.keys.exists(_.toLowerCase.contains("bytimestamp")))
  }

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("S8 JdbcSink round-trip on embedded Derby: write appends, existing projects") {
    val url = derbyUrl()
    val sink = new JdbcSink(url, "events_t", batchSize = 100)
    val df = spark.range(5).select(col("id").as("k"), concat(lit("v"), col("id")).as("s"))
    sink.write(df)
    sink.write(df.where(col("k") < 2)) // append semantics
    val ex = sink.existing(spark, Seq("k"))
    assert(ex.isDefined)
    assert(ex.get.count() == 7)
    assert(ex.get.columns.toSeq == Seq("k"))
  }

  test("S8 JdbcSink.existing: missing table -> None (first run against fresh target)") {
    val sink = new JdbcSink(derbyUrl(), "never_created")
    assert(sink.existing(spark, Seq("k")).isEmpty)
  }

  test("S8 JdbcSink.existing: connectivity failure propagates (no silent dedup degrade)") {
    // No network Derby server is running and no client driver is present:
    // this must THROW, not return None — returning None would silently turn
    // sink-level dedup into intra-batch-only dedup and double-insert.
    val sink = new JdbcSink("jdbc:derby://localhost:52763/nope", "events_t")
    intercept[Exception] {
      sink.existing(spark, Seq("k"))
    }
  }
}
