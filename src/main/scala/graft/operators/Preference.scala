package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference strength estimation — the RLHF-data-pipeline step
  * that turns raw human (or judge-model) A-beats-B judgments into a
  * per-item latent quality scale: Bradley–Terry fitted by Hunter's MM
  * algorithm ("MM algorithms for generalized Bradley–Terry models",
  * Annals of Statistics 2004), the standard estimator behind
  * chat-arena-style leaderboards and preference-data curation (rank
  * completions before building DPO pairs, detect degenerate raters,
  * weight samples by margin).
  *
  * Model: P(i beats j) = s_i / (s_i + s_j). MM update (fixed point of the
  * log-likelihood): s_i ← W_i / Σ_j n_ij / (s_i + s_j), where W_i is i's
  * total wins and n_ij the games between i and j. The raw MLE diverges
  * for items that never lose (s → ∞) and is undefined for items that
  * never win, so the update carries the standard conjugate smoothing: a
  * virtual λ-win and λ-loss against a reference opponent of strength 1 —
  * s_i ← (W_i + λ) / (Σ_j n_ij/(s_i+s_j) + 2λ/(s_i+1)). Every iterate is
  * normalized to arithmetic mean 1 (the scale is only identified up to a
  * constant factor).
  *
  * Scale shape: ONE pass over the preference rows builds the per-item win
  * totals and the per-unordered-pair game counts (two keyed
  * aggregations — comparison volume never survives into the loop); each
  * MM iteration is two keyed joins + one keyed sum over the OPPONENT
  * table (2 rows per compared pair, i.e. bounded by distinct pairs, not
  * raw judgments) + an O(1)-row mean broadcast. Iteration frames are
  * item-sized; nothing is ever driver-collected.
  */
object Preference {

  /** Fit Bradley–Terry strengths from one preference row per judgment
    * (`winCol` beat `loseCol`; repeats aggregate into game counts).
    * Returns one row per item: (`id`, `strength`, `wins`, `games`),
    * strengths mean-normalized to 1. Self-preferences (win == lose) are
    * rejected loudly — they are upstream data bugs, not ties.
    */
  def bradleyTerry(
      prefs: DataFrame,
      winCol: String,
      loseCol: String,
      iters: Int = 8,
      lambda: Double = 0.5): DataFrame =
    bradleyTerryFromCounts(
      prefs.groupBy(col(winCol), col(loseCol)).agg(count(lit(1)).as("_n")),
      winCol, loseCol, "_n", iters, lambda)

  /** [[bradleyTerry]] from pre-aggregated DIRECTED duel counts (one row
    * per (winner, loser) with how many times that outcome was observed) —
    * the accumulation-friendly form: counts are associative and
    * commutative, so per-day/per-batch count tables sum into exactly the
    * whole-history fit (the streaming gate's invariant). The raw-judgment
    * entry point is one groupBy away.
    */
  def bradleyTerryFromCounts(
      counts: DataFrame,
      winCol: String,
      loseCol: String,
      nCol: String,
      iters: Int = 8,
      lambda: Double = 0.5,
      tol: Double = 0.0): DataFrame =
    bradleyTerryFromCountsConverged(
      counts, winCol, loseCol, nCol, iters, lambda, tol)._1

  /** [[bradleyTerryFromCounts]] with the CONVERGENCE CONTRACT surfaced
    * (round 14): runs MM iterations up to `iters`, stopping EARLY once the
    * largest relative strength change of an iteration,
    * `max_i |s_i' − s_i| / s_i` over the mean-normalized iterates, is
    * ≤ `tol`. Returns (strengths, iterations actually run). The delta
    * rides each iteration's checkpoint-materialization job as an
    * `observe` metric, so the stop test adds NO extra job — the same
    * one-job-per-iteration discipline as [[graft.operators.Dedup.connectedComponents]].
    *
    * `tol = 0.0` (the default) disables the early stop — every gate keeps
    * its oracle-replayable fixed-iteration contract (the DuckDB oracle
    * replays exactly `iters` MM rounds; a data-dependent stop would have
    * to be mirrored in SQL). For production leaderboards pass e.g.
    * `tol = 1e-6, iters = 50`: `PreferenceSpec` pins that on both the
    * gate arena and a deliberately skewed synthetic arena the converged
    * fit agrees with a deep fixed-iteration fit to well under the
    * tolerance, and that the stop actually fires long before the cap
    * (fixed-8 MEASURED: worst-item relative distance from converged is
    * 5.2e-4 on an even arena but 8.5e-3 on a skewed one — a dominant
    * item over a thin tail under-converges at 8 rounds, confirming the
    * r13 review's hypothesis. RANKING is unaffected on both arenas;
    * strength VALUES need tol-based stopping when they feed downstream
    * weighting).
    *
    * Per-iteration work (halved in round 14 per advisor note): `raw` is
    * materialized BEFORE the normalization, so the two keyed joins +
    * denominator aggregation run once per iteration instead of twice
    * (the broadcast mean aggregate and the normalization select each
    * consumed the unmaterialized plan). Round 15 halves the JOB count on
    * the fixed-iteration path (`tol == 0`): only the NORMALIZED iterate is
    * checkpointed — the broadcast mean's duplicated update subtree is
    * exchange-reused inside that one job — so each iteration runs one
    * materialization job, not two. The `tol > 0` path keeps the eager
    * raw checkpoint + observe-carrying normalization checkpoint (the stop
    * test needs the delta before planning the next iteration). Both
    * branches compute bit-identical strengths — same agg, same division,
    * over the same rows and partitions.
    *
    * Loop checkpoints use [[org.apache.spark.sql.graft.Shim.localCheckpointFreshStats]],
    * NOT plain localCheckpoint: Spark 4 pins the origin plan's size
    * statistics into the checkpoint's LogicalRDD, and this loop's
    * crossJoin + three keyed joins per iteration MULTIPLY the carried
    * sizes — the estimate's bit length grows ~3× per iteration, and past
    * ~12 iterations the driver hangs in million-bit BigInteger
    * multiplication inside stats estimation (found by this operator's own
    * convergence spec; see the Shim scaladoc). Fresh-stats truncation
    * makes per-iteration planning O(1) at any iteration count.
    */
  def bradleyTerryFromCountsConverged(
      counts: DataFrame,
      winCol: String,
      loseCol: String,
      nCol: String,
      iters: Int = 8,
      lambda: Double = 0.5,
      tol: Double = 0.0): (DataFrame, Int) = {
    require(iters >= 1, "need at least one MM iteration")
    require(lambda > 0.0, "lambda must be > 0 (the raw MLE diverges on " +
      "never-losing items; pass a small positive prior)")
    require(tol >= 0.0, "tol must be >= 0 (0 disables the early stop)")
    val checked = counts.select(
      when(col(winCol) === col(loseCol),
        raise_error(concat(lit("self-preference for item "), col(winCol))))
        .otherwise(col(winCol)).as("_w"),
      col(loseCol).as("_l"),
      col(nCol).cast("long").as("_cnt"))
    // One pass over the counts: wins per item, games per unordered pair.
    val wins = checked.groupBy(col("_w").as("id"))
      .agg(sum("_cnt").as("wins"))
    val games = checked.select(
        least(col("_w"), col("_l")).as("_a"),
        greatest(col("_w"), col("_l")).as("_b"),
        col("_cnt"))
      .groupBy("_a", "_b").agg(sum("_cnt").as("n"))
    // Opponent table: 2 rows per compared pair — the loop's whole world.
    val d = games.select(col("_a").as("id"), col("_b").as("opp"), col("n"))
      .unionAll(games.select(col("_b").as("id"), col("_a").as("opp"), col("n")))
      .localCheckpoint(true)
    val base = d.groupBy("id").agg(sum("n").as("games"))
      .join(wins, Seq("id"), "left")
      .select(col("id"), col("games"),
        coalesce(col("wins"), lit(0L)).as("wins"))
      .localCheckpoint(true)
    var s = base.select(col("id"), lit(1.0).as("s"))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val den = d
        .join(s, "id")
        .join(s.select(col("id").as("opp"), col("s").as("_so")), "opp")
        .groupBy("id")
        .agg(sum(col("n").cast("double") / (col("s") + col("_so"))).as("_den"))
      val rawPlan = base.join(den, "id").join(s, "id")
        .select(col("id"),
          ((col("wins").cast("double") + lit(lambda)) /
            (col("_den") + lit(2.0 * lambda) / (col("s") + lit(1.0)))).as("_sr"),
          col("s").as("_sp"))
      // One materialization job per iteration (round 15). The mean-agg and
      // the division are identical in both branches (bit-identical
      // strengths); the branches differ only in WHAT gets checkpointed:
      //  - tol == 0 (the fixed-iteration / oracle-replayable path): the
      //    NORMALIZED iterate is the only checkpoint. The broadcast mean's
      //    subtree duplicates the update plan, but its den exchange is
      //    deduped by ReuseExchange inside the one job, and `s` — consumed
      //    three times by the next iteration (two den joins + the update
      //    join) — is then a plain LogicalRDD scan. Net: one job per
      //    iteration instead of two on item-sized frames where job
      //    overhead, not data, dominates.
      //  - tol > 0: the early-stop test must SEE this iteration's delta
      //    before deciding whether to plan another, so the RAW iterate is
      //    checkpoint-materialized first and the delta rides the
      //    normalization checkpoint as an observe metric (unchanged
      //    round-14 shape).
      if (tol > 0.0) {
        val raw = org.apache.spark.sql.graft.Shim.localCheckpointFreshStats(rawPlan)
        val obs = org.apache.spark.sql.Observation()
        val next = org.apache.spark.sql.graft.Shim.localCheckpointFreshStats(raw
          .crossJoin(broadcast(raw.agg(avg(col("_sr")).as("_m"))))
          .select(col("id"), (col("_sr") / col("_m")).as("s"), col("_sp"))
          .observe(obs, max(abs(col("s") - col("_sp")) / col("_sp")).as("_delta")))
        s = next.select("id", "s")
        it += 1
        val delta = Option(obs.get("_delta"))
          .map(_.asInstanceOf[Double]).getOrElse(0.0)
        converged = delta <= tol
      } else {
        s = org.apache.spark.sql.graft.Shim.localCheckpointFreshStats(rawPlan
          .crossJoin(broadcast(rawPlan.agg(avg(col("_sr")).as("_m"))))
          .select(col("id"), (col("_sr") / col("_m")).as("s")))
        it += 1
      }
    }
    (base.join(s, "id")
      .select(col("id"), col("s").as("strength"), col("wins"), col("games")),
      it)
  }
}
