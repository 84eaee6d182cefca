package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximation with VERIFIED accuracy: sketches themselves
  * are engine-specific bytes (not oracle-portable), so the gateable output
  * is the ACCURACY CONTRACT — exact values plus a boolean asserting the
  * sketch estimate landed inside its guaranteed error band. A correctness
  * harness on any engine can then check the claim (`true` for every row)
  * without reproducing the sketch internals.
  */
object Sketches {

  /** Count–min-sketch heavy-hitter check: the exact top-`topK` token counts
    * (distributed agg) side-by-side with the CMS point estimates. CMS
    * guarantees `exact <= est <= exact + eps*N` with probability
    * `confidence` per query; `cms_ok` asserts that band (the upper slack
    * doubled to keep the gate deterministic at 99% per-row confidence).
    *
    * Scale shape: the sketch is a fixed-size mergeable accumulator (one
    * pass, no shuffle of the token stream beyond the exact-count agg we
    * produce anyway); only the `topK` head rows and the O(1) sketch come
    * to the driver — the same bounded-rollup policy as Packing.
    */
  def cmsHeavyHitterCheck(
      docs: DataFrame,
      textCol: String,
      topK: Int = 20,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(Dedup.tokens(col(textCol))).as("tok"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(topK)
    val cms = toks.stat.countMinSketch("tok", eps, confidence, seed)
    // The sketch already carries the stream length — no dedicated
    // count job for N.
    val slack = math.max(1L, math.ceil(2 * eps * cms.totalCount()).toLong)
    top.collect().toSeq.map { r =>
      val t = r.getString(0); val c = r.getLong(1)
      val est = cms.estimateCount(t)
      (t, c, est >= c && est <= c + slack)
    }.toDF("tok", "exact_cnt", "cms_ok")
  }

  /** HyperLogLog distinct-count sketch per group (Flajolet et al. 2007) —
    * the mergeable cardinality primitive for 100 TB profiling, built
    * ENGINE-PORTABLY so the whole register state is oracle-replayable
    * (unlike `approx_count_distinct`, whose binary sketch is Spark-private):
    * hash = first 32 bits of md5 (the shared gate hash), register = top `p`
    * bits, rho = leading-zero count of the remaining `32-p` bits + 1 via
    * binary-string length (`length(conv(rest, 10, 2))` ≡ DuckDB
    * `length(bin(rest))` — integer-exact, no float log). Per-group register
    * table = `groupBy(group, reg).agg(max(rho))` (map-side combining, at
    * most `m` rows per group regardless of data volume), then one exact
    * fold: every `2^-rho` term and every partial sum is a multiple of
    * `2^-(32-p+1)` bounded by `m`, so the double sum is EXACT under any
    * addition order — the estimate is bit-deterministic across engines and
    * partitionings. Standard corrections apply (linear counting below
    * `2.5m` with empty registers; 32-bit large-range above `2^32/30`); the
    * raw-regime arithmetic is division-only, so cross-engine determinism
    * needs no `ln` at all there.
    *
    * Output: one row per group — `n_regs` (occupied registers),
    * `hll_estimate` (rounded to 6 decimals).
    */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: org.apache.spark.sql.Column,
      p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /** Register-table phase of [[hllDistinct]]: one `(group…, reg, max_rho)`
    * row per OCCUPIED register — the sketch's entire mergeable state, as
    * plain rows (persist it, partition it, ship it between days). At most
    * `2^p` rows per group regardless of data volume, produced by one
    * map-side-combining aggregation.
    */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: org.apache.spark.sql.Column,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, "p must be in [4, 12] (16..4096 registers)")
    val restBits = 32 - p
    val maxRho = restBits + 1
    val h = conv(substring(md5(valueCol.cast("string")), 1, 8), 16, 10).cast("long")
    val rest = h.bitwiseAND(lit((1L << restBits) - 1))
    val rho = when(rest === 0, maxRho)
      .otherwise(lit(maxRho) - length(conv(rest, 10, 2)))
    df.select(groupCols.map(col) :+ shiftright(h, restBits).as("reg") :+ rho.as("_rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*).agg(max("_rho").as("max_rho"))
  }

  /** Merge register tables from disjoint (or overlapping — max is
    * idempotent) slices of the data: sketch(A ∪ B) ≡ merge(sketch(A),
    * sketch(B)) EXACTLY, register by register — the property that lets
    * per-partition / per-day / per-stream-batch sketches roll up without
    * ever rescanning the data. Cost: a union of m-bounded tables and one
    * keyed max.
    */
  def hllMergeRegisters(groupCols: Seq[String], regTables: DataFrame*): DataFrame = {
    require(regTables.nonEmpty, "need at least one register table")
    regTables.reduce(_ unionByName _)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max("max_rho").as("max_rho"))
  }

  /** Estimate phase of [[hllDistinct]] over a register table (built by
    * [[hllRegisters]] or merged by [[hllMergeRegisters]]). The `2^-rho`
    * fold is exact (see [[hllDistinct]]); corrections: linear counting
    * below `2.5m` with empty registers, 32-bit large-range above
    * `2^32/30`.
    */
  def hllEstimate(
      regs: DataFrame,
      groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, "p must be in [4, 12] (16..4096 registers)")
    val m = 1 << p
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = lit(alpha * m * m) /
      (col("_s") + (lit(m) - col("n_regs")).cast("double"))
    val zeros = lit(m) - col("n_regs") // registers never hit = linear-counting V
    val twoP32 = math.pow(2.0, 32)
    val est = when(raw <= 2.5 * m && zeros > 0, lit(m.toDouble) * log(lit(m.toDouble) / zeros))
      .when(raw > twoP32 / 30.0, lit(-twoP32) * log(lit(1.0) - raw / twoP32))
      .otherwise(raw)
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs"), sum(pow(lit(2.0), -col("max_rho"))).as("_s"))
      .select(groupCols.map(col) :+ col("n_regs") :+ round(est, 6).as("hll_estimate"): _*)
  }

  /** KMV (k-minimum-values / bottom-k) sketch of a SET (Bar-Yossef et al.
    * 2002): the `k` smallest distinct 32-bit md5 hashes, as plain rows.
    * What HLL cannot do, KMV can: the bottom-k of a UNION is computable
    * from the two bottom-k's alone, and the intersection of the retained
    * samples is an unbiased Jaccard estimator — so SET OVERLAP between two
    * 100 TB sides costs two k-row sketches, never a join of the sides.
    * Deterministic (no RNG: the hash order IS the sample), hence
    * oracle-replayable as `ORDER BY hash LIMIT k` on any engine.
    *
    * Scale shape: distinct-hash dedup is the one full shuffle (same cost
    * class as the exact-dedup pass pipelines already run); the bottom-k is
    * `TakeOrderedAndProject` — per-partition top-k, k-row driver merge.
    */
  def kmvSketch(df: DataFrame, valueCol: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k >= 16, "k must be >= 16 (estimator variance explodes below)")
    df.select(conv(substring(md5(valueCol.cast("string")), 1, 8), 16, 10)
        .cast("long").as("hv"))
      .distinct().orderBy("hv").limit(k)
  }

  /** Set-overlap estimation from two [[kmvSketch]]es: distinct-count
    * estimates for both sides, their union (from the merged bottom-k), the
    * Jaccard estimate (shared fraction of the union sample), and the
    * intersection estimate `J × |A∪B|` — the audience-overlap answer. Each
    * estimate falls back to the EXACT count when the retained sample holds
    * the whole set (`n < k`); otherwise `(k-1) / U(k)` with `U(k)` the
    * k-th smallest hash normalized to [0,1). Division-only arithmetic on
    * exact inputs — deterministic across engines. One output row:
    * `(n_a_est, n_b_est, n_union_est, jaccard, n_intersection_est)`,
    * rounded to 6 decimals.
    */
  def kmvOverlap(
      a: DataFrame, aCol: org.apache.spark.sql.Column,
      b: DataFrame, bCol: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val sa = kmvSketch(a, aCol, k).localCheckpoint(true)
    val sb = kmvSketch(b, bCol, k).localCheckpoint(true)
    val merged = sa.union(sb).distinct().orderBy("hv").limit(k).localCheckpoint(true)
    val common = merged.join(sa, Seq("hv"), "left_semi").join(sb, Seq("hv"), "left_semi")
    val twoP32 = math.pow(2.0, 32)
    def estOf(s: DataFrame, outCol: String): DataFrame =
      s.agg(count(lit(1)).as("_n"), max("hv").as("_kth"))
        .select(when(col("_n") < k, col("_n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / (col("_kth") / twoP32)).as(outCol))
    val ja = common.agg(count(lit(1)).as("_nc"))
      .crossJoin(merged.agg(count(lit(1)).as("_nm")))
      .select((col("_nc") / col("_nm")).as("jaccard"))
    estOf(sa, "n_a_est").crossJoin(estOf(sb, "n_b_est"))
      .crossJoin(estOf(merged, "n_union_est")).crossJoin(ja)
      .select(round(col("n_a_est"), 6).as("n_a_est"),
        round(col("n_b_est"), 6).as("n_b_est"),
        round(col("n_union_est"), 6).as("n_union_est"),
        round(col("jaccard"), 6).as("jaccard"),
        round(col("jaccard") * col("n_union_est"), 6).as("n_intersection_est"))
  }

  /** Mergeable QUANTILE sample sketch: the k rows per group whose ROW-HASH
    * is smallest — a deterministic min-wise reservoir (no RNG: the hash
    * order IS the sample, so it is oracle-replayable as a rank-≤-k window
    * on any engine and append-stable like every sampler in this library).
    * A uniform row sample supports any quantile of the group's value
    * MULTISET (unlike [[kmvSketch]]'s distinct-value sample), and it
    * merges losslessly: the bottom-k of a union is computable from the
    * slices' bottom-k's alone, so per-partition/per-day k-row tables roll
    * up to EXACTLY the whole-history sample — the 100 TB shape
    * [[hllMergeRegisters]] gives distinct counts, for quantiles. Rows with
    * equal (hash, value) are interchangeable for every quantile, so the
    * retained multiset is canonical even at rank-boundary hash ties.
    *
    * Scale shape: the rank-≤-k predicate over the window is pushed
    * map-side by Spark's WindowGroupLimit, so each task retains at most k
    * rows per group before the exchange; the sketch is k·groups rows.
    */
  def quantileSampleRows(
      df: DataFrame,
      groupCols: Seq[String],
      rowIdCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k >= 64, "k must be >= 64 (sample-quantile error ~ 1/sqrt(k))")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("hv"), col("v"))
    df.select(groupCols.map(col) :+
        conv(substring(md5(rowIdCol.cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv") :+
        valueCol.cast("double").as("v"): _*)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Lossless roll-up of [[quantileSampleRows]] tables: union the slices,
    * re-rank, keep the k smallest per group — identical to the sketch
    * built on the concatenated data, by the bottom-k-of-union property.
    */
  def quantileSampleMerge(
      groupCols: Seq[String], k: Int, sampleTables: DataFrame*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("hv"), col("v"))
    sampleTables.reduce(_ unionAll _)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }
}
