package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup

/** Restart semantics of the streaming incremental LSH composition
  * (`st_lsh_dedup_increment`'s shape): a run that stops after consuming
  * part of the topic and RESUMES from the same checkpoint must converge to
  * exactly the full-corpus batch answer — the ST3 delta-restart contract
  * applied to the dedup increment. Two failure classes are pinned:
  *  - CLEAN stop/resume (AvailableNow terminates, new files land, same
  *    checkpoint resumes) — already-consumed files must not reprocess;
  *  - CRASH REPLAY (the foreachBatch body runs, then the checkpoint commit
  *    is lost, so the SAME batch re-executes) — [[Dedup.lshIncrementStep]]
  *    writes per-batch OVERWRITE partitions and probes an index view that
  *    excludes the current batch_id, so the replay replaces rather than
  *    duplicates its band rows; bucket counts never inflate toward
  *    maxBucket and the pair set is byte-identical.
  */
class StreamingLshRestartSpec extends SparkSpec {

  private def seedIndex(docs: org.apache.spark.sql.DataFrame, tmp: String): Unit =
    Dedup.minHashBands(docs.limit(0), "doc_id", "text", n = 3, numHashes = 12, bands = 4)
      .write.parquet(s"$tmp/index/batch_id=-1")

  test("stop after half the topic, resume from checkpoint: final pairs == batch LSH answer") {
    val tmp = Files.createTempDirectory("stlsh-restart").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      // Two topic halves, written as separate file groups.
      docs.where(col("doc_id") % 2 === 0).repartition(2).write.parquet(s"$tmp/topic")
      seedIndex(docs, tmp)

      def runAvailable(): Unit = {
        val q = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/topic")
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            Dedup.lshIncrementStep(batch.toDF(), s"$tmp/index", s"$tmp/pairs",
              batchId, "doc_id", "text", n = 3, numHashes = 12, bands = 4)
          }
          .start()
        q.awaitTermination()
      }

      runAvailable() // consumes the even half only, then terminates
      val afterFirst = spark.read.parquet(s"$tmp/pairs").drop("batch_id").distinct().count()

      // Second half lands; the SAME checkpoint resumes — already-consumed
      // files must not be reprocessed (their bands are already in the index;
      // replaying them would self-pair old docs as "new").
      docs.where(col("doc_id") % 2 === 1).repartition(2).write.mode("append").parquet(s"$tmp/topic")
      runAvailable()

      val streamed = spark.read.parquet(s"$tmp/pairs").drop("batch_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3, numHashes = 12, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"streamed-with-restart ${streamed.size} pairs != batch ${batch.size}")
      assert(afterFirst <= streamed.size)
    } finally QueriesExt.rmTree(new java.io.File(tmp))
  }

  test("cold start from a NONEXISTENT index dir: first step auto-seeds, answer matches batch LSH") {
    // Round 15 (verdict item 3): no seedIndex() here — the step itself must
    // create the empty batch_id=-1 partition on first contact instead of
    // failing with a path-not-found AnalysisException inside foreachBatch.
    val tmp = Files.createTempDirectory("stlsh-cold").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      val b0 = docs.where(col("doc_id") % 3 === 0)
      val b1 = docs.where(col("doc_id") % 3 =!= 0)
      Dedup.lshIncrementStep(b0, s"$tmp/index", s"$tmp/pairs", 0L, "doc_id", "text",
        n = 3, numHashes = 12, bands = 4)
      Dedup.lshIncrementStep(b1, s"$tmp/index", s"$tmp/pairs", 1L, "doc_id", "text",
        n = 3, numHashes = 12, bands = 4)
      val streamed = spark.read.parquet(s"$tmp/pairs").drop("batch_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3, numHashes = 12, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"cold-start streamed ${streamed.size} pairs != batch ${batch.size}")
      // The auto-seed partition exists and is empty — the first-run shape
      // later batches rely on.
      assert(new java.io.File(s"$tmp/index/batch_id=-1").exists())
      assert(spark.read.parquet(s"$tmp/index")
        .where(col("batch_id") === -1L).count() == 0L)
    } finally QueriesExt.rmTree(new java.io.File(tmp))
  }

  test("crash replay of a batch (body re-runs, commit lost) leaves index and pairs unchanged") {
    val tmp = Files.createTempDirectory("stlsh-crash").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      seedIndex(docs, tmp)

      val b0 = docs.where(col("doc_id") % 3 === 0)
      val b1 = docs.where(col("doc_id") % 3 === 1)

      // Batch 0 commits; batch 1 runs, "crashes" before the checkpoint
      // commit, and is replayed — i.e. the step body executes twice with
      // the SAME batchId over the same data.
      Dedup.lshIncrementStep(b0, s"$tmp/index", s"$tmp/pairs", 0L, "doc_id", "text")
      Dedup.lshIncrementStep(b1, s"$tmp/index", s"$tmp/pairs", 1L, "doc_id", "text")
      val bandsAfterFirst = spark.read.parquet(s"$tmp/index").count()
      val pairsAfterFirst = spark.read.parquet(s"$tmp/pairs").drop("batch_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      Dedup.lshIncrementStep(b1, s"$tmp/index", s"$tmp/pairs", 1L, "doc_id", "text") // replay

      // Idempotent: no duplicated band rows (bucket counts can't creep
      // toward maxBucket), pair set byte-identical.
      assert(spark.read.parquet(s"$tmp/index").count() == bandsAfterFirst)
      val pairsAfterReplay = spark.read.parquet(s"$tmp/pairs").drop("batch_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairsAfterReplay == pairsAfterFirst)

      // Per-doc band multiplicity stays exactly `bands` (4): the strongest
      // no-duplication witness — any append-twice bug doubles these.
      val mult = spark.read.parquet(s"$tmp/index").groupBy("doc_id")
        .count().agg(min("count"), max("count")).head()
      assert(mult.getLong(0) == 4 && mult.getLong(1) == 4,
        s"per-doc band rows ${mult.getLong(0)}..${mult.getLong(1)} != 4")
    } finally QueriesExt.rmTree(new java.io.File(tmp))
  }
}
