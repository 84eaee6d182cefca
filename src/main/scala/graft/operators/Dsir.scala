package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose
  * hashed-n-gram distribution looks like a TARGET domain, by importance
  * weight `log w(d) = Σ_tokens ln p_target(b(t)) − ln p_raw(b(t))` over a
  * fixed hashed feature space, then sample ∝ w via the Gumbel-top-k trick.
  * This is the published 100 TB-shaped answer to "I have a quality/domain
  * exemplar set and a web-scale raw corpus" — the feature hashing bounds
  * the model at `buckets` cells no matter how large the vocabulary, which
  * is exactly what makes it feasible where a full-vocab LM ratio is not.
  * The reference has no selection surface (its filters are per-field
  * config predicates, `/root/reference/src/config.py:68-86`); declared
  * training-data extension inventory.
  *
  * Scale shape ([[Classifier]]/[[UnigramLm]] discipline): ONE
  * tokenize+explode (id-keyed repartition before the expansion), collapsed
  * straight to per-(doc, bucket) counts; the target and raw bucket
  * distributions consume the SAME bucket-keyed exchange (AQE runtime
  * exchange reuse); the fitted ratio model is ≤ `buckets` rows, broadcast
  * into the scorer, so scoring adds no shuffle beyond the per-doc fold.
  * Selection is `orderBy.limit` — distributed partial top-k
  * (TakeOrderedAndProject), never a global sort or single-partition
  * window. The per-doc reduction folds in sorted-bucket order — exactly
  * reproducible in the DuckDB oracle (`list(… ORDER BY bk)` +
  * `list_reduce`), which an arbitrary-order double `sum()` would not be.
  *
  * Determinism: the Gumbel noise is NOT random — `u` is a content-hash
  * uniform (md5 of the id + a salt, the [[Dedup.systematicSample]]
  * family), so the "sample" is append-stable and replayable across
  * engines, retries, and corpus growth.
  */
object Dsir {

  /** Per-document DSIR log importance weight over hashed unigram buckets.
    * `targetPred` marks the target-domain slice (it stays part of the raw
    * distribution — the raw corpus is everything). Add-one smoothing over
    * the `buckets` cells; an empty target slice fails loudly. Returns
    * (idCol, logw) with the UNROUNDED weight — callers round at the edge.
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df
      .select(col(idCol), Dedup.tokens(col(textCol)).as("_ws"),
        targetPred.cast("int").as("_t"))
      .repartition(parallelism, col(idCol))
    // explode_outer + filter — the InferFiltersFromGenerate pushdown trap
    // (see Dedup.shingleTable). The hashed bucket replaces the token
    // immediately: downstream state is O(buckets), not O(vocab).
    val docBk = base
      .select(col(idCol), col("_t"), explode_outer(col("_ws")).as("tok"))
      .where(col("tok").isNotNull && col("tok") =!= "")
      .select(col(idCol), col("_t"),
        (Dedup.hash32(col("tok")) % buckets).as("bk"))
      .groupBy(col(idCol), col("_t"), col("bk"))
      .agg(count(lit(1)).as("tf"))
    // One bucket-keyed shuffle shared by both distribution fits and the
    // score join (AQE exchange reuse — the UnigramLm pattern).
    val byBk = docBk.repartition(parallelism, col("bk"))
    val raw = byBk.groupBy(col("bk")).agg(sum(col("tf")).as("cr"))
    val tgt = byBk.where(col("_t") === 1).groupBy(col("bk")).agg(sum(col("tf")).as("ct"))
    val tot = broadcast(raw.agg(sum(col("cr")).as("_nr"))
      .crossJoin(tgt.agg(sum(col("ct")).as("_nt")))
      .select(col("_nr"),
        when(col("_nt").isNull || col("_nt") === 0,
          raise_error(lit("importanceWeights: target slice has no tokens")))
          .otherwise(col("_nt")).as("_nt")))
    // w(b) = ln((ct+1)/(nt+B)) − ln((cr+1)/(nr+B)), materialized as a
    // codegen'd column BEFORE the per-doc fold (interpreted-HOF trap).
    // Buckets never seen in the raw corpus are referenced by no document,
    // so the left join from raw covers the full support.
    val model = raw.join(tgt, Seq("bk"), "left").crossJoin(tot).select(col("bk"),
      (log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
          (col("_nt") + lit(buckets)).cast("double")) -
        log((col("cr") + lit(1)).cast("double") /
          (col("_nr") + lit(buckets)).cast("double"))).as("w"))
    val perDoc = byBk.join(broadcast(model), Seq("bk"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("bk"), col("tf"), col("w")))).as("_l"))
    val logw = aggregate(col("_l"), lit(0.0),
      (acc, x) => acc + x.getField("tf").cast("double") * x.getField("w"))
    perDoc.select(col(idCol), logw.as("logw"))
  }

  /** Gumbel-top-k resampling: sampling k items with probability ∝ exp(logw)
    * without replacement ≡ taking the top k of `logw + Gumbel(0,1)`. The
    * Gumbel variate is derived from a content-hash uniform
    * `u = (md5_32(id ⊕ salt) + 0.5) / 2^32` — deterministic, append-stable,
    * engine-replayable. Returns the k selected rows as (idCol, logw
    * rounded to 6 dp).
    */
  def gumbelTopK(
      weights: DataFrame,
      idCol: String,
      k: Int,
      salt: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit("|" + salt))), 1, 8),
      16, 10).cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = col("logw") + (-log(-log(u)))
    weights.orderBy(key.desc, col(idCol).asc).limit(k)
      .select(col(idCol), round(col("logw"), 6).as("logw"))
  }
}
