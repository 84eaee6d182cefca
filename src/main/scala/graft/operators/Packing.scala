package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the last hop of a pretraining data
  * pipeline: documents are concatenated in a deterministic global order
  * (ascending id) and the token stream is split into fixed `maxTokens`
  * training sequences; a document that straddles a boundary continues in the
  * next sequence. The operator assigns each document its global token
  * OFFSET and the first/last sequence index it lands in.
  *
  * Scale shape: a global running sum via `Window.orderBy` would collapse the
  * corpus onto ONE partition — the classic non-scalable prefix sum. Instead:
  * range-partition + sort by id (Spark's distributed sort), aggregate one
  * partial sum PER PARTITION (tiny: one row per partition), roll those into
  * prefix offsets on the driver, and add them back as a broadcast lookup to
  * the per-partition running sums. Output is a pure function of (id, token
  * count) — independent of partition count or range-split sampling — so the
  * DuckDB oracle replays it with an ordinary window.
  */
object Packing {

  /** Returns (idCol, n_tokens, token_offset, seq_first, seq_last). */
  def packSequences(df: DataFrame, idCol: String, textCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    // Eagerly materialized: the partial-sum collect AND the final projection
    // both read `_pid`, and two separate evaluations of repartitionByRange
    // may sample different split points — the checkpoint pins ONE
    // partitioning for both consumers.
    val counted = df
      .select(col(idCol), size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartitionByRange(parallelism, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    // One row per partition: its token total (driver-side rollup input is
    // O(partitions), never O(rows)). RangePartitioner hands ascending id
    // ranges to ascending partition indices, so the prefix fold over _pid
    // order IS the fold over global id order.
    val partials: Array[Row] = counted
      .groupBy(col("_pid")).agg(sum(col("n_tokens")).as("_t"))
      .collect()
    var acc = 0L
    val offsets = partials.sortBy(_.getAs[Int]("_pid")).map { r =>
      val pair = (r.getAs[Int]("_pid"), acc)
      acc += r.getAs[Long]("_t")
      pair
    }
    // Prefix offsets ride back as a BROADCAST join on _pid (one row per
    // partition) — a literal when-chain would be a thousands-deep CaseWhen
    // tree on a real cluster's partition count.
    import df.sparkSession.implicits._
    val offsetsDf = offsets.toSeq.toDF("_pid", "_part_offset")
    val w = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .join(broadcast(offsetsDf), Seq("_pid"))
      .withColumn("token_offset",
        col("_part_offset") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_first", floor(col("token_offset") / maxTokens))
      .withColumn("seq_last",
        floor((col("token_offset") + greatest(col("n_tokens"), lit(1L)) - 1) / maxTokens))
      .drop("_pid", "_part_offset")
  }
}
