package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for publishing aggregates from a sensitive warehouse —
  * the reference's home domain (its k6 temporal semi-join mask,
  * `/root/reference/src/transform.py` + the J1 operator here, is a
  * k-anonymity instrument: rows are only released when at least k=6 peers
  * share the masking key). These generalize that discipline:
  * suppression-based k-anonymity for row releases and ε-differentially-
  * private counts for aggregate releases.
  */
object Privacy {

  /** Suppression-based k-anonymity: drop every row whose quasi-identifier
    * combination is shared by fewer than k rows — after suppression every
    * released row is indistinguishable from ≥ k−1 peers on the quasi
    * columns.
    *
    * One quasi-keyed count aggregate joined back (AQE broadcasts the group
    * table when the combination space is small — the usual case); the
    * corpus itself never shuffles when that broadcast fires. Suppression,
    * not generalization: bucketize/round the quasi columns BEFORE calling
    * if coarsening is wanted — the operator stays policy-free.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "quasiCols and k >= 1 required")
    val counts = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("_n"))
    df.join(counts, quasiCols).where(col("_n") >= k).drop("_n")
  }

  /** Per-group release audit: every quasi combination with its size and
    * suppression verdict — what a data-protection officer reviews before a
    * release. Output is group-space-sized, never row-sized.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "quasiCols and k >= 1 required")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("suppressed", (col("n") < k).cast("int"))
  }

  /** ε-DP noisy counts with ENGINE-REPLAYABLE Laplace noise: the uniform
    * is a content-hash of the group key (the repo's Gumbel-top-k
    * discipline, [[Dsir.gumbelTopK]]), pushed through the Laplace inverse
    * CDF `-b·sign(u−½)·ln(1−2|u−½|)` with scale b = sensitivity/ε.
    *
    * Deterministic noise is NOT a DP mechanism for adversarial release —
    * a replayable seed leaks; it IS the engineering contract that makes
    * the pipeline testable (the DuckDB oracle replays every noisy count
    * bit-for-bit) and swaps to a sealed seed at release time by changing
    * only the salt source. One keyed aggregate; noise math is codegen'd
    * column arithmetic on the group-sized frame.
    */
  def dpNoisyCounts(
      df: DataFrame,
      groupCols: Seq[String],
      epsilon: Double,
      sensitivity: Double = 1.0,
      salt: String = "dp"): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0 && sensitivity > 0,
      "groupCols, epsilon > 0 and sensitivity > 0 required")
    val b = sensitivity / epsilon
    val keyStr = concat_ws("|", groupCols.map(c => col(c).cast("string")) :+ lit(salt): _*)
    // 32-bit hash uniform, offset half a ULP so u ∈ (0,1) strictly — the
    // inverse CDF is finite at every representable u.
    val u = (conv(substring(md5(keyStr), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("noisy_n", round(col("n") + noise, 6))
  }
}
