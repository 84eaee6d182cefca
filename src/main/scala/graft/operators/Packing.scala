package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Returns (idCol, n_tokens, token_offset, seq_first, seq_last). */
  def packSequences(df: DataFrame, idCol: String, textCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val counted = df
      .select(col(idCol), size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
    val mm = counted.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (mm.isNullAt(0))
      return counted
        .withColumn("token_offset", lit(0L)).withColumn("seq_first", lit(0L))
        .withColumn("seq_last", lit(0L)).where(lit(false))
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
      .groupBy(col("_b")).agg(sum(col("n_tokens")).as("_t"))
      .collect()
      .sortBy(_.getAs[Int]("_b"))
      .map { r =>
        val pair = (r.getAs[Int]("_b"), acc)
        acc += r.getAs[Long]("_t")
        pair
      }
    // Prefix offsets ride back as a BROADCAST join on the bucket (a literal
    // when-chain would be a thousands-deep CaseWhen tree at cluster scale).
    import df.sparkSession.implicits._
    val offsetsDf = offsets.toSeq.toDF("_b", "_bucket_offset")
    val w = Window.partitionBy(col("_b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsetsDf), Seq("_b"))
      .withColumn("token_offset",
        col("_bucket_offset") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_first", floor(col("token_offset") / maxTokens))
      .withColumn("seq_last",
        floor((col("token_offset") + greatest(col("n_tokens"), lit(1L)) - 1) / maxTokens))
      .drop("_b", "_bucket_offset")
  }
}
