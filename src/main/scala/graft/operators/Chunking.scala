package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the embedding-/context-window-prep step of a training
  * or retrieval pipeline: each document's token stream becomes overlapping
  * windows of `chunkSize` tokens advancing by `chunkSize - overlap`.
  *
  * Window starts are `0, step, 2·step, …` and a start is kept while it still
  * contributes unseen tokens (`start == 0 OR start + overlap < n_tokens`),
  * so no emitted chunk is fully contained in its predecessor and a document
  * shorter than `chunkSize` yields exactly one chunk.
  *
  * Plan shape: per-row sequence/slice column math (codegen'd, no UDF) under
  * one explode; the input is repartitioned before the expansion (same
  * compact-file trap as shingling — see [[Dedup.shingleArrays]]) and the
  * explode is the outer+filter form ([[Dedup.shingleTable]]'s
  * InferFiltersFromGenerate guard).
  */
object Chunking {

  /** Returns (idCol, chunk_idx, chunk_start, n_chunk_tokens, chunk_text). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df.select(col(idCol), Dedup.tokens(col(textCol)).as("_ws"))
      .repartition(parallelism, col(idCol))
    val starts = filter(
      sequence(lit(0), greatest(size(col("_ws")) - 1, lit(0)), lit(step)),
      s => s === 0 || s + overlap < size(col("_ws")))
    base
      .select(col(idCol), col("_ws"), posexplode_outer(starts).as(Seq("chunk_idx", "chunk_start")))
      .where(col("chunk_start").isNotNull)
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        size(slice(col("_ws"), col("chunk_start") + 1, lit(chunkSize))).as("n_chunk_tokens"),
        array_join(slice(col("_ws"), col("chunk_start") + 1, lit(chunkSize)), " ").as("chunk_text"))
  }
}
