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

  test("S8/J2 writeSkipDuplicates: dup check inside each INSERT, idempotent re-write") {
    val url = derbyUrl()
    val sink = new JdbcSink(url, "dedup_t", batchSize = 3) // multiple flush/commit rounds
    val df = spark.range(10).select(col("id").as("k"), concat(lit("v"), col("id")).as("s"))
    assert(sink.writeSkipDuplicates(df, Seq("k")) == 10) // fresh target auto-created
    // overlapping re-write (task-retry / second run shape): only the 5 new land
    val df2 = spark.range(5, 15).select(col("id").as("k"), concat(lit("v"), col("id")).as("s"))
    assert(sink.writeSkipDuplicates(df2, Seq("k")) == 5)
    assert(sink.existing(spark, Seq("k")).get.count() == 15)
    // exact replay is a no-op
    assert(sink.writeSkipDuplicates(df, Seq("k")) == 0)
  }

  test("S8/J2 writeSkipDuplicates: concurrent overlapping writers converge, zero dupes") {
    val url = derbyUrl()
    val sink = new JdbcSink(url, "conc_t", batchSize = 5)
    // Create table + unique index serially; the race under test is row
    // writes, not first-run DDL.
    sink.writeSkipDuplicates(
      spark.range(0).select(col("id").as("k"), col("id").cast("string").as("s")), Seq("k"))
    val a = spark.range(0, 40).select(col("id").as("k"), concat(lit("v"), col("id")).as("s"))
    val b = spark.range(20, 60).select(col("id").as("k"), concat(lit("v"), col("id")).as("s"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(sink.writeSkipDuplicates(a, Seq("k"), numConnections = 2))
    val fb = Future(sink.writeSkipDuplicates(b, Seq("k"), numConnections = 2))
    val total = Await.result(fa, 3.minutes) + Await.result(fb, 3.minutes)
    assert(total == 60) // each row inserted exactly once across both writers
    assert(sink.existing(spark, Seq("k")).get.count() == 60)
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

  test("S10 ConsoleSink renders rows to stdout; existing is None (no dedup source)") {
    import graft.sinks.ConsoleSink
    import spark.implicits._
    val sink = new ConsoleSink(numRows = 5)
    val df = Seq((1L, "alpha"), (2L, "bravo")).toDF("id", "name")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      sink.write(df)
    }
    val printed = out.toString("UTF-8")
    assert(printed.contains("alpha") && printed.contains("bravo") && printed.contains("id"))
    assert(sink.existing(spark, Seq("id")).isEmpty)
    // forTarget routing: the literal table name `console` selects this sink
    val routed = graft.sinks.Sinks.forTarget(graft.config.TargetConfig(table = "console"))
    assert(routed.isInstanceOf[ConsoleSink])
  }

  test("JsonlSource: good lines round-trip typed, corrupt lines carry their raw bytes, field-level nulls stay per-field") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl-spec").toString
    val lines = Seq(
      """{"id": 1, "name": "alpha", "n": 10}""",
      """not json at all""",
      """{"id": 3, "name": "gamma"}""",          // missing field -> null n, NOT corrupt
      """{"id": "NaN-ish", "name": "delta", "n": 4}""") // wrong-typed id -> null field
    spark.createDataset(lines).toDF("value").coalesce(1).write.text(s"$dir/in")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("n", IntegerType)))
    val out = graft.sources.JsonlSource.read(spark, s"$dir/in", schema)
      .orderBy(col("name").asc_nulls_last)
      .collect().map(r => (Option(r.get(0)), r.getAs[String]("name"),
        Option(r.get(2)), Option(r.getAs[String](graft.sources.JsonlSource.corruptField))))
      .toSeq
    assert(out(0) == ((Some(1L), "alpha", Some(10), None)))
    assert(out(1)._2 == "delta" && out(1)._1.isEmpty) // wrong-typed field nulled
    assert(out(2) == ((Some(3L), "gamma", None, None)))
    val corrupt = out(3)
    assert(corrupt._2 == null && corrupt._4.contains("not json at all"))
    graft.QueriesExt.rmTree(new java.io.File(dir))
  }
}
