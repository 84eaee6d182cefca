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
}
