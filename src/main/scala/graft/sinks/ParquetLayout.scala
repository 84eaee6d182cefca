package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side layout for 100 TB datasets: how data lands on disk decides
  * what later queries can prune.
  *
  * The reference's sink is a row-store table and its "layout" is Oracle's
  * problem; a lakehouse engine owns this explicitly.
  */
object ParquetLayout {

  /** Hive-style partitioned write with in-file ordering:
    *  - `partitionCols` become directory partitions → partition PRUNING for
    *    any query filtering on them (e.g. ingest date, topic);
    *  - `sortCols` are sorted WITHIN each file → parquet min/max row-group
    *    statistics become selective, so point/range predicates on them skip
    *    row groups without reading data pages;
    *  - `filesPerPartition` bounds small-file explosion: rows are
    *    repartitioned on (partitionCols, bucket) before the write so each
    *    directory gets that many well-sized files instead of one per task.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must not be empty")
    val spread =
      if (sortCols.nonEmpty) pmod(hash(sortCols.map(col): _*), lit(filesPerPartition))
      else pmod(spark_partition_id(), lit(filesPerPartition))
    df.repartition(partitionCols.map(col) :+ spread: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  import org.apache.spark.sql.Column

  /** Morton (Z-order) interleave of two non-negative dimension values,
    * `bits` bits each: bit i of `a` lands at output bit 2i, bit i of `b`
    * at 2i+1. Output is a long in `[0, 4^bits)`.
    *
    * Built from shift/mask Column primitives so the whole computation is
    * codegen'd integer math riding the scan — no UDF. Callers map raw
    * columns into the `[0, 2^bits)` grid first (modulo, scaling, or
    * rank-bucketing); the interleave itself is the engine-replayable part
    * and is what the gate oracle replays bit-for-bit.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-ORDERED write: range-partition by the z-value into `numFiles`
    * files and sort within each — the multi-dimensional clustering layout.
    * Because the Z-curve keeps both dimensions locally contiguous, parquet
    * min/max row-group statistics become selective on EITHER dimension: a
    * predicate on `a` alone or `b` alone skips most row groups, which a
    * single-column sort only gives its leading column. The spec asserts
    * this as an executed-metric fact (scan output rows under a pushed
    * one-dimension predicate, z-ordered vs unsorted layout).
    *
    * `repartitionByRange` samples the z distribution — files get balanced
    * row counts even when the grid is skewed; the sort is per-file.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCol: Column,
      numFiles: Int): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    df.withColumn("_z", zCol)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
