package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic source-MIXTURE sampling under a global token budget — the
  * "assemble the training mix" primitive: given per-source weights (the
  * domain-reweighting tables every LLM data recipe publishes) and a total
  * token budget, select documents so each source contributes
  * `floor(weight/Σweights × budget)` tokens, chosen in pure content-hash
  * order (append-stable, engine-replayable, no seed drift — the same
  * discipline as [[Dedup.systematicSample]]).
  *
  * Scale shape — the reason this is NOT a per-source global sort: a naive
  * cumulative-sum window over each source orders the source's entire
  * corpus (O(n log n) sort of 100 TB to pick the first few billion
  * tokens). Instead the two-phase prefix-sum trick from
  * [[Packing.packSequences]]:
  *
  *   1. rows get a coarse hash bucket (`md5` prefix mod `buckets`);
  *      per-(source, bucket) token totals are ONE keyed partial-agg pass
  *      — `O(sources × buckets)` rows out;
  *   2. bucket offsets come from a window over that TINY frame, and ride
  *      back on a broadcast join. Buckets entirely under budget keep every
  *      row with NO row-level window at all; buckets entirely past it are
  *      filtered out at the scan; only each source's single BOUNDARY
  *      bucket (≈ corpus/buckets rows) pays a row-level cumulative sum.
  *
  * Selection order is (bucket, md5(id), id) — a pure hash order, so the
  * boundary-bucket window plus bucket offsets equals the global
  * cumulative sum an oracle computes with one flat window. Sources
  * absent from `weights` get budget 0 and are dropped (explicit mixes
  * stay explicit, like [[Dedup.stratifiedSample]]).
  *
  * The corpus frame is read by the totals pass and the two keep branches;
  * each is a column-pruned scan (id, source, tokens), which at 100 TB is
  * cheaper than materializing the corpus to skip a re-scan.
  */
object Mixture {

  /** `temperature` applies the published data-recipe reweighting `w^τ`
    * (normalized afterward) BEFORE budgeting, driver-side: τ = 1 keeps the
    * stated mix, τ < 1 flattens toward uniform (the multilingual
    * low-resource-upsampling move), τ > 1 sharpens toward the heavy
    * sources. Zero weights stay zero at every temperature (an excluded
    * source must not resurrect at τ = 0, where pow(0,0) would read 1).
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokensCol: Column,
      weights: Map[String, Double],
      totalTokens: Long,
      temperature: Double = 1.0,
      buckets: Int = 256): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ >= 0.0), "weights must be non-negative")
    require(weights.values.sum > 0.0, "at least one weight must be positive")
    require(totalTokens > 0, "totalTokens must be positive")
    require(temperature >= 0.0, "temperature must be non-negative")
    require(buckets > 0, "buckets must be positive")
    val scaled = weights.map { case (s, w0) =>
      s -> (if (w0 == 0.0) 0.0 else math.pow(w0, temperature))
    }
    val wSum = scaled.values.sum
    // Per-source budget as a literal when-chain: weights are config-sized
    // (tens of sources), so the chain stays a shallow codegen'd CASE.
    val budget = scaled.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col("_src") === s, lit(math.floor(w / wSum * totalTokens).toLong)).otherwise(acc)
    }
    val rows = df.select(
        col(idCol).as("_id"), col(sourceCol).as("_src"),
        tokensCol.cast("long").as("_tok"),
        md5(col(idCol).cast("string")).as("_h"))
      .withColumn("_b",
        (conv(substring(col("_h"), 1, 8), 16, 10).cast("long") % buckets).cast("int"))
    // Phase 1: per-(source, bucket) token totals — O(sources × buckets).
    val bucketTotals = rows.groupBy("_src", "_b").agg(sum("_tok").as("_bt"))
    val wb = Window.partitionBy("_src").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Checkpointed: BOTH keep branches join against it, and without the
    // materialization each branch re-runs the corpus-wide totals pass
    // (evaluate-once discipline; the frame is O(sources × buckets) rows).
    val offsets = bucketTotals
      .withColumn("_off", sum(col("_bt")).over(wb) - col("_bt"))
      .localCheckpoint(true)
    // Budget-0 sources (unlisted, or explicit weight 0) drop ENTIRELY here
    // — without this, a zero-token row hash-sorted at the head of such a
    // source's boundary bucket would satisfy `cum 0 <= budget 0` and leak
    // through the documented "unlisted sources are dropped" contract.
    val joined = rows.join(broadcast(offsets), Seq("_src", "_b"))
      .withColumn("_budget", budget)
      .where(col("_budget") > 0)
    // Whole bucket fits — every row's global cum ≤ _off + _bt ≤ budget.
    val fullyKept = joined.where(col("_off") + col("_bt") <= col("_budget"))
    // Boundary bucket: the ONLY rows that pay a window (per source,
    // ≈ corpus/buckets rows). `_off <= budget` (not <) so zero-token rows
    // sitting exactly at the budget edge match the flat-window oracle.
    val wr = Window.partitionBy("_src", "_b").orderBy("_h", "_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = joined
      .where(col("_off") <= col("_budget") && col("_off") + col("_bt") > col("_budget"))
      .withColumn("_cum", col("_off") + sum(col("_tok")).over(wr))
      .where(col("_cum") <= col("_budget"))
      .drop("_cum")
    fullyKept.unionByName(boundaryKept)
      .select(col("_id").as(idCol), col("_src").as(sourceCol),
        col("_tok").as("n_tokens"))
  }

  /** WATER-FILLING token-budget allocation — the closed-form "how many
    * epochs of each source" planner behind published LLM data recipes:
    * allocate `budget` tokens across sources proportionally to `weights`,
    * except that no source may exceed `maxEpochs` passes over its own
    * tokens (the repetition ceiling). Formally
    * `alloc_s = min(cap_s, λ·w_s)` with `cap_s = tokens_s × maxEpochs`
    * and λ chosen so Σ alloc = budget (or every source saturates when
    * Σ cap ≤ budget).
    *
    * λ has a CLOSED FORM over the sources frame — no iteration: sort
    * sources by `cap/w` ascending; the saturated set is a prefix; for
    * each split k, the candidate `λ_k = (budget − Σ_{i<k} cap_i) /
    * Σ_{i≥k} w_i`, and the valid split is the FIRST k whose own ratio
    * `cap_k/w_k ≥ λ_k` (before it, the source's cap binds). All of it is
    * window prefix-sums over the SOURCES frame (config-sized — the events
    * corpus collapses to one row per source in the single keyed exchange),
    * so the oracle replays every division in the same order.
    *
    * Output: `(source, n_tokens, weight, alloc_tokens, epochs)`, 6 dp —
    * `epochs = alloc/tokens ≤ maxEpochs` with equality exactly for the
    * saturated prefix.
    */
  def waterFill(
      df: DataFrame,
      sourceCol: String,
      tokensCol: Column,
      weights: Map[String, Double],
      budget: Double,
      maxEpochs: Double): DataFrame = {
    require(budget > 0 && maxEpochs > 0, "budget and maxEpochs must be positive")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val perSource = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(tokensCol).as("n_tokens"))
    val w = weights.foldLeft(lit(1.0)) { case (acc, (s, wt)) =>
      when(col("source") === s, lit(wt)).otherwise(acc)
    }
    val base = perSource.select(col("source"), col("n_tokens"), w.as("weight"),
      (col("n_tokens").cast("double") * maxEpochs).as("cap"))
    val byRatio = Window.orderBy(col("cap") / col("weight"), col("source"))
    val staged = base
      .withColumn("_prefix_cap",
        coalesce(sum(col("cap")).over(byRatio.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("_suffix_w",
        sum(col("weight")).over(byRatio.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("_cand", (lit(budget) - col("_prefix_cap")) / col("_suffix_w"))
      .withColumn("_rn", row_number().over(byRatio))
      .withColumn("_valid", col("cap") / col("weight") >= col("_cand"))
    // λ = candidate at the FIRST valid split in (ratio, source) order —
    // later valid candidates understate the remaining budget (their prefix
    // subtracts caps of sources that do not saturate) and are wrong; if no
    // split is valid, every cap binds (Σ cap <= budget).
    val lambda = staged.where(col("_valid"))
      .agg(min(struct(col("_rn").as("r"), col("_cand").as("c"))).as("m"))
      .select(col("m.c").as("_lambda"))
    staged.join(broadcast(lambda), joinExprs = lit(true), "left")
      .select(col("source"), col("n_tokens"), col("weight"),
        round(when(col("_lambda").isNull, col("cap"))
          .otherwise(least(col("cap"), col("_lambda") * col("weight"))), 6).as("alloc_tokens"),
        round(when(col("_lambda").isNull, lit(maxEpochs))
          .otherwise(least(col("cap"), col("_lambda") * col("weight")) /
            col("n_tokens").cast("double")), 6).as("epochs"))
  }

  /** Weighted sampling WITHOUT replacement — k rows per stratum with
    * inclusion probability ∝ `weightCol` — via Efraimidis–Spirakis A-ES in
    * its exponential form: each row draws `key = -ln(u) / w` (an
    * Exponential(w) variate) and the k SMALLEST keys per group win. The
    * classic reservoir formulation is sequential; this keyed form is its
    * distributed equivalent (same distribution, same proof), and Spark's
    * rank-limit rewrite (WindowGroupLimit) keeps the per-group selection
    * top-k-bounded through the shuffle rather than a full per-group sort.
    *
    * Determinism (the repo-wide sampling discipline — no RNG, no seed
    * drift across retries): `u` is a content-hash uniform, the row id's
    * first 13 md5 hex digits (52 bits, double-exact) mapped into (0,1) via
    * `(v+1)/(2^52+2)` — strictly inside the open interval, so `ln` never
    * sees 0 or 1. Identical arithmetic replays in any engine; appending
    * new rows never changes an existing row's key (A-ES keys are per-row),
    * so re-runs over a grown corpus keep their overlap exactly like the
    * systematic sampler.
    *
    * @param weightCol strictly positive weights (enforced at runtime via
    *                  raise_error — a zero/negative weight silently
    *                  inverting the order is the failure mode to refuse)
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10).cast("double")
    val u = (v + 1.0) / (math.pow(2, 52) + 2.0)
    val w = when(weightCol > 0, weightCol.cast("double"))
      .otherwise(raise_error(concat(lit("weightedSample: non-positive weight for id "),
        col(idCol).cast("string"))))
    val key = -log(u) / w
    val win = Window.partitionBy(col(groupCol)).orderBy(key.asc, col(idCol).asc)
    df.withColumn("_wrk", row_number().over(win))
      .where(col("_wrk") <= k)
      .drop("_wrk")
  }
}
