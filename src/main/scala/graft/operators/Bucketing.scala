package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the shuffle-ELIMINATION mechanism for repeated
  * joins at 100 TB: both sides of a recurring join are written
  * `bucketBy(n, keys)` (hash-partitioned into n files per directory,
  * optionally sorted within buckets), and every subsequent join on those
  * keys is planned WITHOUT an exchange on either side — bucket i joins
  * bucket i where it sits. The shuffle is paid ONCE at write time and
  * amortized over every downstream join/aggregation on the same keys,
  * which is the right trade for fact tables joined daily (the
  * lineitem⋈orders shape). Bucket metadata lives in the session catalog,
  * so reads must go through the table name, not the path.
  *
  * Complements the other layout/skew tools: [[Skew.saltedJoin]] spreads a
  * hot key at join time (per-query fix), Z-order clusters for scan
  * pruning — bucketing removes the recurring join exchange structurally.
  * Bucket-pruning is the scan-side bonus: an equality filter on the
  * bucket key reads 1/n of the files — NOTE Spark's
  * `DisableUnnecessaryBucketedScan` rule treats filter-only plans as not
  * benefiting from bucketing and reads plain files, so point-lookup
  * workloads must set `spark.sql.sources.bucketing.autoBucketedScan
  * .enabled=false` to get the pruning (both behaviors pinned on
  * executed-plan metrics in BucketingSpec, not inferred).
  */
object Bucketing {

  /** Write `df` as a bucketed, path-backed table registered in the session
    * catalog (bucket metadata only exists THROUGH the catalog). Buckets
    * are sorted by `sortCols` (default: the bucket keys) so co-located
    * sort-merge joins also skip their sorts. Overwrites any prior table
    * of the same name.
    *
    * SIZE `numBuckets` TO THE DATA — aim for ~100k fact rows (tens of MB)
    * per bucket: the downstream co-located join runs exactly numBuckets
    * tasks (bucketed scans cannot be split by AQE), so too-few buckets
    * caps parallelism AND bloats per-task merge state. Measured in the
    * 'bucketed join growth' probe at 18M rows: 32 buckets → 62s join
    * (GC-bound 560k-row per-task merges), 256 → 1.0s. Both sides of a
    * recurring join must use the SAME count ([[colocatedJoin]] enforces
    * it), so pick it for the LARGER table.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val sort = if (sortCols.isEmpty) keys else sortCols
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    // Pre-partition on the bucket keys with numBuckets partitions: Spark's
    // repartition hash (pmod(murmur3, n)) IS the bucket-id formula, so each
    // writer task holds exactly one bucket and emits ONE file per bucket —
    // without this, every task writes a sliver of every bucket it sees
    // (numFiles = tasks × buckets, the small-files failure mode), and
    // bucket pruning degrades from 1 file to tasks-many files per key.
    df.repartition(numBuckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two CO-BUCKETED catalog tables on their bucket keys. Validates
    * the invariant the exchange-free plan depends on — both tables
    * bucketed, on exactly `keys`, with EQUAL bucket counts — and fails
    * loudly otherwise (a silent mismatch would still produce correct rows
    * while quietly re-introducing the full shuffle, the worst kind of
    * regression: invisible until the 100 TB bill arrives).
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    def spec(t: String) = org.apache.spark.sql.graft.Shim.bucketSpec(spark, t)
      .getOrElse(throw new IllegalArgumentException(
        s"colocatedJoin: table $t is not bucketed — write it with " +
          "Bucketing.writeBucketed, or use a plain join"))
    val (ln, lcols, _) = spec(leftTable)
    val (rn, rcols, _) = spec(rightTable)
    require(ln == rn,
      s"colocatedJoin: bucket counts differ ($leftTable=$ln, $rightTable=$rn) " +
        "— co-location requires equal counts; rewrite one side")
    require(lcols == keys && rcols == keys,
      s"colocatedJoin: bucket columns ($leftTable=$lcols, $rightTable=$rcols) " +
        s"must equal the join keys $keys on both sides")
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
  }
}
