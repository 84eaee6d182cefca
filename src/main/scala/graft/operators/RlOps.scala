package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training (RLHF / RLVR) data-pipeline statistics — the reductions a
  * reinforcement-learning data loop runs over sampled completions at
  * corpus scale: group-relative advantage normalization (the GRPO
  * baseline: Shao et al. 2024, "DeepSeekMath", §4.1), unbiased pass@k
  * estimation (Chen et al. 2021, "Evaluating LLMs Trained on Code",
  * eq. 1), low-variance sampled KL estimators (Schulman 2020,
  * "Approximating KL-divergence", the k1/k2/k3 family), and DPO
  * implicit-reward margin diagnostics (Rafailov et al. 2023, eq. 5 —
  * the reward-accuracy report run over every preference batch).
  *
  * Scale shape: every operator here is one keyed exchange. Advantages are
  * a grouped window over the prompt key (groups are rollout-sized — n
  * samples per prompt, 4–64 — so per-group buffering is O(n), never
  * corpus-sized); pass@k and the KL/DPO reports are plain hash
  * aggregations with map-side partial combine. Nothing joins, nothing is
  * collected, nothing is quadratic in samples. The moment form
  * ([[rewardMoments]] / [[advantageFromMoments]]) keeps per-group state
  * associative-commutative (n, Σr, Σr²) so per-batch tables sum into
  * exactly the whole-history normalizer — the streaming-accumulation
  * invariant shared with [[Preference.bradleyTerryFromCounts]].
  */
object RlOps {

  /** Group-relative advantage (GRPO baseline): within each prompt group,
    * advantage = (reward − mean(group)) / stddev(group), with the two
    * degenerate cases pinned — a single-sample group and a zero-variance
    * group both get advantage 0 (no signal, not NaN/∞). `stddev` is the
    * sample standard deviation (n−1), matching `stddev_samp` everywhere.
    * Appends `advantage`, `group_mean`, `group_std`, `n_samples`.
    */
  def groupAdvantage(df: DataFrame, groupCols: Seq[String], rewardCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val std = stddev_samp(col(rewardCol)).over(w)
    df.withColumn("group_mean", avg(col(rewardCol)).over(w))
      .withColumn("group_std", std)
      .withColumn("n_samples", count(lit(1)).over(w))
      .withColumn("advantage",
        when(col("group_std").isNull || col("group_std") === 0.0, lit(0.0))
          .otherwise((col(rewardCol) - col("group_mean")) / col("group_std")))
  }

  /** Mergeable per-group reward moments: (n, Σr, Σr²). Associative and
    * commutative, so per-batch moment tables `groupBy(key).sum` into the
    * whole-history moments — the streaming twin accumulates THESE, never
    * raw rewards.
    */
  def rewardMoments(df: DataFrame, groupCols: Seq[String], rewardCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("m_n"),
      sum(col(rewardCol)).as("m_sum"),
      sum(col(rewardCol) * col(rewardCol)).as("m_sumsq"))

  /** Advantage of a (group, reward) row against ACCUMULATED moments:
    * mean = Σr/n, var = (Σr² − (Σr)²/n)/(n−1). Same degenerate-case
    * contract as [[groupAdvantage]]. `moments` must carry the
    * [[rewardMoments]] columns plus the group key. The moment table is
    * BROADCAST by default (a rollout batch has bounded prompt count, and
    * Catalyst's pessimistic post-aggregation size estimate otherwise
    * plans a sort-merge join that re-shuffles the full sample table —
    * measured in the 'rl advantage skew' probe); at leaderboard scales
    * where the prompt table itself is too big to broadcast, pass
    * `broadcastMoments = false` and pay the keyed join exchange.
    */
  def advantageFromMoments(
      df: DataFrame, moments: DataFrame,
      groupCols: Seq[String], rewardCol: String,
      broadcastMoments: Boolean = true): DataFrame = {
    val mean = col("m_sum") / col("m_n")
    val varS = (col("m_sumsq") - col("m_sum") * col("m_sum") / col("m_n")) /
      (col("m_n") - lit(1L))
    df.join(if (broadcastMoments) broadcast(moments) else moments, groupCols, "left")
      .withColumn("group_mean", mean)
      .withColumn("group_std", when(col("m_n") > 1L, sqrt(greatest(varS, lit(0.0)))))
      .withColumn("n_samples", col("m_n"))
      .withColumn("advantage",
        when(col("group_std").isNull || col("group_std") === 0.0, lit(0.0))
          .otherwise((col(rewardCol) - col("group_mean")) / col("group_std")))
      .drop("m_n", "m_sum", "m_sumsq")
  }

  /** Unbiased pass@k (Chen et al. 2021, eq. 1): per task with n samples of
    * which c pass, pass@k = 1 − C(n−c, k)/C(n, k), computed as the
    * numerically-stable running product Π_{i=0}^{k−1} (n−c−i)/(n−i)
    * (never materializes a binomial). Contract: n < k → NULL (estimator
    * undefined); n−c < k → 1.0 (every k-subset contains a pass). One
    * hash aggregation; the per-k products are scalar expressions over
    * (n, c) — no second pass, no explode.
    */
  def passAtK(df: DataFrame, taskCols: Seq[String], passCol: Column, ks: Seq[Int]): DataFrame = {
    val base = df.groupBy(taskCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(when(passCol, 1L).otherwise(0L)).as("c"))
    ks.foldLeft(base) { (acc, k) =>
      // The ratio is parenthesized so each step computes (n−c−i)/(n−i)
      // FIRST and then multiplies — the same floating-point association
      // order as the oracle's list_transform-then-list_reduce (an
      // unparenthesized `p * a / b` associates as `(p*a)/b`, a different
      // rounding sequence that can diverge on round(…,6) boundaries).
      val prod = expr(
        s"""aggregate(sequence(0, ${k - 1}), cast(1.0 as double),
           |  (p, i) -> p * (cast(n - c - i as double) / cast(n - i as double)))""".stripMargin)
      acc.withColumn(s"pass_at_$k",
        when(col("n") < k, lit(null).cast("double"))
          .when(col("n") - col("c") < k, lit(1.0))
          .otherwise(lit(1.0) - prod))
    }
  }

  /** Sampled KL estimators (Schulman 2020) between a policy and a
    * reference, from per-sample log-probabilities, x ~ policy. With
    * logr = log p_ref(x) − log p_policy(x):
    * k1 = mean(−logr) (unbiased, high variance), k2 = mean(logr²/2)
    * (low variance, biased), k3 = mean(exp(logr) − 1 − logr) (unbiased
    * AND low variance — the estimator RLHF trainers monitor). One hash
    * aggregation per group.
    */
  def klEstimators(
      df: DataFrame, groupCols: Seq[String],
      logpPolicy: Column, logpRef: Column): DataFrame = {
    val lr = logpRef - logpPolicy
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      avg(-lr).as("kl_k1"),
      avg(lr * lr / 2).as("kl_k2"),
      avg(exp(lr) - lit(1.0) - lr).as("kl_k3"))
  }

  /** Reward length-bias diagnostic: per group, the OLS regression of
    * reward on completion length — slope (reward points per extra token),
    * intercept, and Pearson r² — the standard check for a reward model
    * that has learned "longer is better" (the verbosity bias every RLHF
    * pipeline audits before trusting its scores; see e.g. Singhal et al.
    * 2023, "A Long Way to Go: Investigating Length Correlations in
    * RLHF"). slope = cov(len, r)/var(len), sample-(n−1) convention both
    * sides; a zero-variance-length group gets NULL slope (no signal, not
    * ±∞). One hash aggregation with map-side combine.
    */
  def rewardLengthBias(
      df: DataFrame, groupCols: Seq[String],
      rewardCol: String, lenCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
        count(lit(1)).as("n"),
        covar_samp(col(lenCol), col(rewardCol)).as("_cov"),
        var_samp(col(lenCol)).as("_var"),
        // r² as cov²/(var_l·var_r) rather than corr(): Spark 4's ANSI
        // `corr` raises DIVIDE_BY_ZERO on a zero-variance column instead
        // of returning NULL, and the explicit formula is also the one the
        // oracle can replay without engine-specific corr internals.
        var_samp(col(rewardCol)).as("_varr"),
        avg(col(rewardCol)).as("_mr"),
        avg(col(lenCol)).as("_ml"))
      .withColumn("slope",
        when(col("_var").isNull || col("_var") === 0.0, lit(null).cast("double"))
          .otherwise(col("_cov") / col("_var")))
      .withColumn("intercept",
        when(col("slope").isNull, lit(null).cast("double"))
          .otherwise(col("_mr") - col("slope") * col("_ml")))
      .withColumn("r2",
        when(col("slope").isNull || col("_varr").isNull || col("_varr") === 0.0,
            lit(null).cast("double"))
          .otherwise(col("_cov") * col("_cov") / (col("_var") * col("_varr"))))
      .drop("_cov", "_var", "_varr", "_mr", "_ml")

  /** Rollout diversity / mode-collapse report: per prompt group, the
    * sample count, distinct-completion count and fraction, and the modal
    * completion's share (ties broken toward the larger share — the number
    * itself, not the mode value, is the diagnostic). A policy collapsing
    * onto one completion drives distinct_frac → 1/n and top_share → 1;
    * healthy exploration keeps top_share low. Two keyed aggregations, the
    * second over (prompt → distinct completions) — bounded by distinct
    * rollout texts, with map-side combine on both.
    */
  def rolloutDiversity(
      df: DataFrame, groupCols: Seq[String], completionCol: String): DataFrame = {
    val perCompletion = df.groupBy((groupCols :+ completionCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    perCompletion.groupBy(groupCols.map(col): _*).agg(
        sum(col("_c")).as("n"),
        count(lit(1)).as("n_distinct"),
        max(col("_c")).as("_top"))
      .withColumn("distinct_frac",
        col("n_distinct").cast("double") / col("n").cast("double"))
      .withColumn("top_share", col("_top").cast("double") / col("n").cast("double"))
      .drop("_top")
  }

  /** Off-policy value estimation over logged rollouts (x ~ behavior,
    * evaluate target): importance weight w = exp(logp_target −
    * logp_behavior) clipped at `clip` (the bias-variance knob every IPS
    * deployment sets), then per group: IPS = mean(w·r), SNIPS =
    * Σ(w·r)/Σw (self-normalized — Swaminathan & Joachims 2015), effective
    * sample size ESS = (Σw)²/Σw² (how many "real" samples the weighted
    * estimate is worth — the health metric that says whether the logged
    * data can evaluate this target at all), and the clipped fraction.
    * One hash aggregation with map-side combine; weights are computed
    * per-row in codegen, never materialized.
    */
  def offPolicyValue(
      df: DataFrame, groupCols: Seq[String], rewardCol: String,
      lpTarget: Column, lpBehavior: Column, clip: Double): DataFrame = {
    val w = least(exp(lpTarget - lpBehavior), lit(clip))
    df.withColumn("_w", w)
      .withColumn("_clipped", (exp(lpTarget - lpBehavior) > clip).cast("double"))
      .groupBy(groupCols.map(col): _*).agg(
        count(lit(1)).as("n"),
        avg(col("_w") * col(rewardCol)).as("ips"),
        (sum(col("_w") * col(rewardCol)) / sum(col("_w"))).as("snips"),
        (sum(col("_w")) * sum(col("_w")) / sum(col("_w") * col("_w"))).as("ess"),
        avg(col("_clipped")).as("clip_frac"))
  }

  /** DPO implicit-reward margin report (Rafailov et al. 2023): the
    * implicit reward of a completion is β·(log π(y|x) − log π_ref(y|x));
    * the margin is chosen-minus-rejected. Per group: pair count, reward
    * accuracy (fraction of pairs the implicit reward already orders
    * correctly — THE number tracked during DPO training), mean margin,
    * and exact interpolated p50/p90 (same `percentile` ≡ `quantile_cont`
    * definition as the corpus-quantile gate; per-group distinct margins
    * bound the buffer).
    */
  def dpoMarginStats(
      df: DataFrame, groupCols: Seq[String], beta: Double,
      lpChosenPolicy: Column, lpRejectedPolicy: Column,
      lpChosenRef: Column, lpRejectedRef: Column): DataFrame = {
    val margin = lit(beta) *
      ((lpChosenPolicy - lpChosenRef) - (lpRejectedPolicy - lpRejectedRef))
    df.withColumn("_margin", margin)
      .groupBy(groupCols.map(col): _*).agg(
        count(lit(1)).as("n_pairs"),
        avg(when(col("_margin") > 0, 1.0).otherwise(0.0)).as("reward_acc"),
        avg(col("_margin")).as("mean_margin"),
        expr("percentile(_margin, 0.5)").as("p50_margin"),
        expr("percentile(_margin, 0.9)").as("p90_margin"))
  }
}
