package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the last hop of a pretraining data
  * pipeline: documents are concatenated in a deterministic global order
  * (ascending numeric id) and the token stream is split into fixed
  * `maxTokens` training sequences; a document that straddles a boundary
  * continues in the next sequence. The operator assigns each document its
  * global token OFFSET and the first/last sequence index it lands in.
  *
  * Scale shape: a global running sum via `Window.orderBy` would collapse the
  * corpus onto ONE partition — the classic non-scalable prefix sum. Instead
  * the id range is split into `parallelism` ARITHMETIC buckets (a pure
  * function of the id — unlike `repartitionByRange`, whose sampled split
  * points differ between evaluations and would need a pinned
  * materialization), one partial sum per bucket is rolled into prefix
  * offsets on the driver (O(buckets) rows, never O(rows)), and the offsets
  * ride back as a broadcast join under a per-bucket running-sum window.
  * Nothing is cached or checkpointed; output is a pure function of
  * (id, token count). Sparse/skewed id spaces make buckets uneven — for a
  * corpus with renumbered-dense ids (the normal packing input) the split is
  * balanced.
  */
object Packing {

  /** Global EXCLUSIVE prefix sum of `nCol` in ascending-`idCol` order without
    * a single-partition window (the scale machinery described in the object
    * scaladoc): arithmetic id buckets → O(buckets) driver rollup → broadcast
    * bucket offsets + per-bucket running-sum window. Returns the input plus
    * `_offset`; an empty input comes back empty with the same schema.
    */
  private[operators] def prefixOffsets(counted: DataFrame, idCol: String, nCol: String): DataFrame = {
    val parallelism = counted.sparkSession.sessionState.conf.numShufflePartitions
    val mm = counted.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (mm.isNullAt(0))
      return counted.withColumn("_offset", lit(0L)).where(lit(false))
    val (minId, maxId) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (maxId - minId) / parallelism + 1)
    // `/` is double division: exact for |id - minId| < 2^53, far beyond any
    // corpus id space; truncation toward zero == floor on the non-negative
    // operand.
    val bucketed = counted
      .withColumn("_b", ((col(idCol).cast("long") - minId) / width).cast("int"))
    // One row per bucket (driver-side rollup input is O(buckets)); the fold
    // over ascending bucket index IS the fold over global id order because
    // the bucket function is monotone in id.
    var acc = 0L
    val offsets = bucketed
      .groupBy(col("_b")).agg(sum(col(nCol)).as("_t"))
      .collect()
      .sortBy(_.getAs[Int]("_b"))
      .map { r =>
        val pair = (r.getAs[Int]("_b"), acc)
        acc += r.getAs[Long]("_t")
        pair
      }
    // Prefix offsets ride back as a BROADCAST join on the bucket (a literal
    // when-chain would be a thousands-deep CaseWhen tree at cluster scale).
    import counted.sparkSession.implicits._
    val offsetsDf = offsets.toSeq.toDF("_b", "_bucket_offset")
    val w = Window.partitionBy(col("_b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsetsDf), Seq("_b"))
      .withColumn("_offset",
        col("_bucket_offset") + sum(col(nCol)).over(w) - col(nCol))
      .drop("_b", "_bucket_offset")
  }

  /** Returns (idCol, n_tokens, token_offset, seq_first, seq_last). */
  def packSequences(df: DataFrame, idCol: String, textCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val counted = df
      .select(col(idCol), size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
    prefixOffsets(counted, idCol, "n_tokens")
      .withColumnRenamed("_offset", "token_offset")
      .withColumn("seq_first", floor(col("token_offset") / maxTokens))
      .withColumn("seq_last",
        floor((col("token_offset") + greatest(col("n_tokens"), lit(1L)) - 1) / maxTokens))
  }

  /** GPT-style pretraining EXAMPLE SLICING — the step after packing decides
    * offsets: documents are concatenated in ascending-id order, each
    * followed by one `eod` separator token, and the resulting global token
    * stream is cut into fixed `exampleLen`-token training examples; a
    * boundary-straddling document continues in the next example and the
    * trailing partial example is dropped (the standard pretraining
    * convention — every emitted example is exactly `exampleLen` tokens).
    *
    * Scale shape: NO per-token rows ever exist. [[prefixOffsets]] places
    * each document by pure doc-level arithmetic, the document explodes into
    * only the examples it OVERLAPS (≈ n/exampleLen + 1 fragments — array
    * `slice`s of the already-held token array), and one example-keyed
    * shuffle assembles fragments in offset order. Shuffle volume is
    * O(docs + examples) rows, not O(tokens).
    *
    * Returns (example_id, n_docs, n_tokens, text) with n_tokens ==
    * exampleLen on every row.
    */
  def sliceExamples(
      df: DataFrame,
      idCol: String,
      textCol: String,
      exampleLen: Int,
      eod: String = "<|eod|>"): DataFrame = {
    require(exampleLen > 1, s"need exampleLen > 1, got $exampleLen")
    val L = lit(exampleLen.toLong)
    val withEod = df
      .select(col(idCol), concat(Dedup.tokens(col(textCol)), array(lit(eod))).as("_ws"))
      .withColumn("_n", size(col("_ws")).cast("long"))
    prefixOffsets(withEod, idCol, "_n")
      // The doc occupies global positions [_offset, _offset + _n); one
      // fragment per overlapped example, sliced out of the in-hand array.
      .select(col(idCol), col("_ws"), col("_n"), col("_offset"),
        explode(sequence(floor(col("_offset") / L),
          floor((col("_offset") + col("_n") - 1) / L))).as("example_id"))
      .withColumn("_start", greatest(col("_offset"), col("example_id") * L))
      .withColumn("_end", least(col("_offset") + col("_n"), (col("example_id") + 1) * L))
      .select(col("example_id"), col("_start"), (col("_end") - col("_start")).as("_len"),
        array_join(slice(col("_ws"),
          (col("_start") - col("_offset") + 1).cast("int"),
          (col("_end") - col("_start")).cast("int")), " ").as("_frag"))
      .groupBy(col("example_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_len")).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("_start"), col("_frag")))),
            t => t.getField("_frag")), " ").as("text"))
      .where(col("n_tokens") === exampleLen.toLong)
  }

  /** Length-bucket padding report: assign each document to the smallest
    * power-of-two bucket ≥ its token count (capped at `2^maxBits` —
    * longer docs truncate to the cap) and report, per bucket, the padding
    * waste a bucketed batcher pays versus the tokens it carries — the
    * standard length-bucketed batching analysis (buckets shrink padding
    * from pad-to-global-max to pad-to-bucket-cap).
    *
    * The bucket boundary is an exact-integer `when` chain over the
    * maxBits+1 literals — never `ceil(log2(n))`, whose double rounding at
    * exact powers of two is engine-dependent. One vocabulary-sized
    * aggregate after a shuffle-free per-row projection.
    *
    * Output per bucket: `(bucket, n_docs, sum_tokens, padded_tokens,
    * waste_pct)` where `padded = n_docs × bucket`, tokens count
    * `min(n, cap)`, and `waste_pct = (padded − tokens)/padded` (6 dp).
    */
  def lengthBucketStats(
      df: DataFrame,
      nTokens: Column,
      maxBits: Int = 14): DataFrame = {
    require(maxBits >= 1 && maxBits <= 30, "maxBits in [1, 30]")
    val cap = 1L << maxBits
    val bucket = (0 to maxBits).foldRight(lit(cap): Column) { (k, acc) =>
      when(nTokens <= (1L << k), lit(1L << k)).otherwise(acc)
    }
    df.select(bucket.as("bucket"), least(nTokens, lit(cap)).as("_t"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("sum_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket")).as("padded_tokens"),
        round((col("n_docs") * col("bucket") - col("sum_tokens")).cast("double") /
          (col("n_docs") * col("bucket")).cast("double"), 6).as("waste_pct"))
  }
}
