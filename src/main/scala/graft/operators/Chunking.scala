package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** CONTENT-DEFINED chunking (the rsync/LBFS boundary rule re-expressed on
    * word streams): a chunk starts AT every token whose 32-bit md5-prefix
    * hash ([[Dedup.hash32]] — the corpus-portable family every graft oracle
    * replays) is ≡ 0 mod `modulus`, so expected chunk length is `modulus`
    * tokens and — unlike fixed windows — an insertion or deletion only
    * rewrites its OWN chunk: every downstream boundary re-synchronizes on
    * the next content-chosen token. That shift-robustness is why CDC, not
    * fixed-stride chunking, is the unit for chunk-level dedup between
    * near-identical documents (re-crawls, template pages, forked posts).
    *
    * Plan shape: one posexplode, then a running `sum(flag)` window keyed on
    * the document — the doc-keyed Exchange+Sort is the ONLY shuffle, and the
    * (id, chunk_id) reassembly aggregate reuses it (HashPartitioning on a
    * SUBSET of the grouping keys satisfies the aggregate's
    * ClusteredDistribution, so Catalyst plans no second exchange). Per-doc
    * state is one running counter; nothing in the plan is corpus-quadratic.
    *
    * Returns (idCol, chunk_id, n_chunk_tokens, chunk_text), chunk_id dense
    * from 0 or 1 in token order (the pre-first-boundary prefix, when the
    * first token is not itself a boundary, is chunk 0).
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String, modulus: Int = 8): DataFrame = {
    require(modulus > 1, s"need modulus > 1, got $modulus")
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    // Repartition BEFORE the explode (the chunkTokens/shingling compact-file
    // discipline): Generate preserves its child's partitioning, so the
    // id-keyed exchange both parallelizes the token expansion AND satisfies
    // the chunk-id window's distribution — still exactly one shuffle.
    val tok = df
      .repartition(parallelism, col(idCol))
      .select(col(idCol), posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "tok")))
      .where(col("tok") =!= "")
    val boundary = when(Dedup.hash32(col("tok")) % modulus === 0, 1).otherwise(0)
    tok
      .withColumn("chunk_id", sum(boundary).over(Window.partitionBy(idCol).orderBy("pos")))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_chunk_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            t => t.getField("tok")), " ").as("chunk_text"))
  }

  /** Chunk-level exact dedup with reassembly — the paragraph-dedup step of a
    * web-corpus pipeline (CCNet/RefinedWeb drop repeated paragraphs, keeping
    * one occurrence) on CDC chunks: a chunk INSTANCE survives iff it is the
    * globally first occurrence of its text, "first" = min (id, chunk_id) —
    * deterministic, so replicated documents keep their text exactly once
    * and every later copy collapses. Surviving chunks are stitched back in
    * chunk order; a document whose every chunk was seen earlier comes back
    * as the empty string (membership is the caller's signal — n_kept = 0 —
    * never a silently dropped row).
    *
    * Scale shape on top of [[cdcChunks]]'s single doc-keyed shuffle: one
    * chunk-hash-keyed Exchange for the first-occurrence rank (state per key
    * is one counter; no df-quadratic expansion — identical chunks meet once,
    * on their hash) and one id-keyed Exchange for reassembly. Three keyed
    * shuffles total, each linear in the chunk count.
    */
  def cdcDedup(df: DataFrame, idCol: String, textCol: String, modulus: Int = 8): DataFrame = {
    val firstSeen = Window.partitionBy(md5(col("chunk_text"))).orderBy(col(idCol), col("chunk_id"))
    cdcChunks(df, idCol, textCol, modulus)
      .withColumn("_rk", row_number().over(firstSeen))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        count_if(col("_rk") === 1).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("_rk") === 1,
              struct(col("chunk_id"), col("chunk_text"))))),
            t => t.getField("chunk_text")), " ").as("text"))
  }
}
