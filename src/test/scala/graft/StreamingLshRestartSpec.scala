package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup

/** Restart semantics of the streaming incremental LSH composition
  * (`st_lsh_dedup_increment`'s shape): a run that stops after consuming
  * part of the topic and RESUMES from the same checkpoint must converge to
  * exactly the full-corpus batch answer — the ST3 delta-restart contract
  * applied to the dedup increment. The parquet band index and pair sink
  * are append-only; the closing distinct absorbs any replayed appends, so
  * the composition is restart-idempotent end-to-end.
  */
class StreamingLshRestartSpec extends SparkSpec {

  test("stop after half the topic, resume from checkpoint: final pairs == batch LSH answer") {
    val tmp = Files.createTempDirectory("stlsh-restart").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      // Two topic halves, written as separate file groups.
      docs.where(col("doc_id") % 2 === 0).repartition(2).write.parquet(s"$tmp/topic")
      Dedup.minHashBands(docs.limit(0), "doc_id", "text", n = 3, numHashes = 12, bands = 4)
        .write.parquet(s"$tmp/index")

      def runAvailable(): Unit = {
        val q = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/topic")
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val ss = batch.sparkSession
            val idx = ss.read.parquet(s"$tmp/index")
            val nb = Dedup.minHashBands(batch.toDF(), "doc_id", "text",
              n = 3, numHashes = 12, bands = 4).localCheckpoint(true)
            Dedup.lshPairsIncrementalBands(nb, idx, "doc_id")
              .write.mode("append").parquet(s"$tmp/pairs")
            nb.write.mode("append").parquet(s"$tmp/index")
          }
          .start()
        q.awaitTermination()
      }

      runAvailable() // consumes the even half only, then terminates
      val afterFirst = spark.read.parquet(s"$tmp/pairs").distinct().count()

      // Second half lands; the SAME checkpoint resumes — already-consumed
      // files must not be reprocessed (their bands are already in the index;
      // replaying them would self-pair old docs as "new").
      docs.where(col("doc_id") % 2 === 1).repartition(2).write.mode("append").parquet(s"$tmp/topic")
      runAvailable()

      val streamed = spark.read.parquet(s"$tmp/pairs").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3, numHashes = 12, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"streamed-with-restart ${streamed.size} pairs != batch ${batch.size}")
      assert(afterFirst <= streamed.size)
    } finally QueriesExt.rmTree(new java.io.File(tmp))
  }
}
