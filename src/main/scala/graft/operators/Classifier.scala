package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bootstrap text classifier — the deterministic analog of the fastText
  * quality/language filters used in public LLM-corpus pipelines (CCNet,
  * LLaMA, RedPajama all train a linear classifier on weak seed labels and
  * score the whole corpus with it). The reference has no classifier surface
  * (its filters are config-driven field predicates,
  * `/root/reference/src/config.py:68-86`); this is part of the declared
  * training-data extension inventory.
  *
  * The model is multinomial Naive Bayes with add-one smoothing over a
  * df-capped unigram vocabulary: seed labels come in as a caller-supplied
  * boolean `Column` (a heuristic, an existing metadata column, a prior
  * round's filter — anything cheap), the per-token log-likelihood-ratio
  * weights `w(t) = ln p(t|1) − ln p(t|0)` are fit from the labeled tokens,
  * and every document is scored with
  * `score(d) = ln(d1/d0) + Σ_t tf_t · w(t)` — positive score ⇒ class 1.
  * NB beats logistic regression here because fitting is ONE aggregation
  * (no iterative optimizer), so the whole train+score pass is a fixed
  * three-shuffle plan at any corpus size.
  *
  * Scale shape: ONE tokenize+explode of the corpus (id-keyed repartition
  * before the expansion — the repo's small-file/skew guard), collapsed
  * immediately to per-(doc, token) term frequencies; the class-conditional
  * token counts and the scoring join both consume the SAME token-keyed
  * exchange (explicit `repartition(token)`, AQE exchange reuse serves both
  * — the [[UnigramLm]] discipline). The fitted model is at most
  * `vocabSize` rows — taken with `orderBy.limit` (distributed partial
  * top-k, never a single-partition window) and broadcast to the scorer, so
  * scoring adds NO shuffle beyond the per-doc fold. Priors and smoothing
  * totals are scalar rows, broadcast. The per-doc reduction folds in
  * sorted-token order — exactly reproducible in any engine (the DuckDB
  * oracle replays it with `list(… ORDER BY t)` + `list_reduce`), which an
  * arbitrary-order double `sum()` would not be.
  *
  * `trainFilter` restricts FITTING to a row subset (e.g. a content-hash
  * bucket) while still scoring every document — that is the held-out
  * evaluation shape: fit on 80%, measure confusion on the unseen 20%.
  * Documents with no vocabulary token drop out (no evidence, no score),
  * matching [[UnigramLm.scoreDocs]]; a single-class seed labeling fails
  * loudly (`raise_error` in the executed plan) rather than fitting a
  * degenerate model.
  */
object Classifier {

  /** The fitted-model frames: the shared token-keyed exchange, the
    * ≤ vocabSize-row weight table, and the one-row prior. */
  private case class NbFit(byTok: DataFrame, model: DataFrame, bias: DataFrame)

  /** Fit NB on `trainFilter` rows seeded by `seedLabel`, score ALL rows.
    * Returns (idCol, y, nb_score, pred): the seed label, the log-odds score
    * rounded to 6 dp, and the hard prediction (score > 0).
    */
  def nbTrainScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seedLabel: Column,
      vocabSize: Int = 4096,
      trainFilter: Column = lit(true)): DataFrame = {
    val f = fit(df, idCol, textCol, seedLabel, vocabSize, trainFilter)
    val perDoc = f.byTok.join(broadcast(f.model), Seq("tok"))
      .groupBy(col(idCol), col("y"))
      .agg(array_sort(collect_list(struct(col("tok").as("t"), col("tf"), col("w")))).as("_l"))
    val evidence = aggregate(col("_l"), lit(0.0),
      (acc, x) => acc + x.getField("tf").cast("double") * x.getField("w"))
    perDoc.crossJoin(f.bias).select(col(idCol), col("y"),
      round(col("_bias") + evidence, 6).as("nb_score"),
      ((col("_bias") + evidence) > 0).cast("int").as("pred"))
  }

  private def fit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seedLabel: Column,
      vocabSize: Int,
      trainFilter: Column): NbFit = {
    require(vocabSize > 0, "vocabSize must be positive")
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df
      .select(col(idCol), Dedup.tokens(col(textCol)).as("_ws"),
        seedLabel.cast("int").as("y"), trainFilter.cast("int").as("_tr"))
      .repartition(parallelism, col(idCol))
    // explode_outer + filter, not explode: the InferFiltersFromGenerate
    // pushdown trap (see Dedup.shingleTable). _tr/y ride along — they are
    // functionally dependent on the id, so the groupBy stays one exchange.
    val docTok = base
      .select(col(idCol), col("y"), col("_tr"), explode_outer(col("_ws")).as("tok"))
      .where(col("tok").isNotNull && col("tok") =!= "")
      .groupBy(col(idCol), col("y"), col("_tr"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // One token-keyed shuffle shared by the model fit and the score join
    // (AQE runtime exchange reuse — the UnigramLm pattern).
    val byTok = docTok.repartition(parallelism, col("tok"))
    val tokClass = byTok.where(col("_tr") === 1)
      .groupBy(col("tok"))
      .agg(sum(when(col("y") === 1, col("tf")).otherwise(lit(0L))).as("c1"),
        sum(when(col("y") === 0, col("tf")).otherwise(lit(0L))).as("c0"))
    // Vocabulary cap: top-vocabSize tokens by labeled-corpus frequency,
    // token-ascending tiebreak. orderBy.limit plans as TakeOrderedAndProject
    // — per-partition partial top-k, no global sort, no single-partition
    // window. A no-op at test SF (31-token corpus), declared semantics at
    // 100 TB: out-of-vocab tokens simply carry no evidence.
    val vocab = tokClass
      .orderBy((col("c1") + col("c0")).desc, col("tok").asc)
      .limit(vocabSize)
    val tot = broadcast(vocab.agg(
      sum(col("c1")).as("_n1"), sum(col("c0")).as("_n0"),
      count(lit(1)).as("_v")))
    // Prior log-odds from labeled DOC counts; single-class seeds die loudly.
    val bias = broadcast(base.where(col("_tr") === 1)
      .agg(sum(col("y")).as("_d1"), sum(lit(1) - col("y")).as("_d0"))
      .select(when(col("_d1") === 0 || col("_d0") === 0,
          raise_error(lit("nbTrainScore: seed labels are single-class on the training slice")))
        .otherwise(log(col("_d1").cast("double") / col("_d0").cast("double")))
        .as("_bias")))
    // w(t) = ln((c1+1)/(n1+V)) − ln((c0+1)/(n0+V)), materialized as a
    // codegen'd column BEFORE the per-doc array fold (HOF lambdas run
    // interpreted with no CSE — the Dedup.shinglesOf trap).
    val model = vocab.crossJoin(tot).select(col("tok"),
      (log((col("c1") + lit(1)).cast("double") / (col("_n1") + col("_v")).cast("double")) -
        log((col("c0") + lit(1)).cast("double") / (col("_n0") + col("_v")).cast("double"))).as("w"))
    NbFit(byTok, model, bias)
  }

  /** Materialize the fitted model as plain Scala values for FROZEN-model
    * application (streaming scorers, cross-job reuse): the per-token
    * weights and the prior log-odds. The collect is bounded by `vocabSize`
    * — the same O(k) driver-transfer class as [[BpeTrain]]'s merge table,
    * not a corpus collect.
    */
  def nbWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seedLabel: Column,
      vocabSize: Int = 4096,
      trainFilter: Column = lit(true)): (Map[String, Double], Double) = {
    val f = fit(df, idCol, textCol, seedLabel, vocabSize, trainFilter)
    val w = f.model.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    (w, f.bias.collect().head.getDouble(0))
  }

  /** Per-ROW frozen-model scorer: the production streaming shape — fit
    * offline, freeze the (bounded) weight table into the plan as a map
    * literal, score each row with a shuffle-free codegen'd fold. Unlike
    * [[nbTrainScore]]'s sorted-token reduction, this folds in TOKEN-STREAM
    * order (per occurrence) — a deliberately stateless per-row definition
    * any engine can replay by position; out-of-vocabulary tokens carry no
    * evidence. Returns the UNROUNDED log-odds score column.
    */
  def nbScoreRow(textCol: Column, weights: Map[String, Double], bias: Double): Column = {
    val wlit = typedLit(weights)
    val toks = filter(Dedup.tokens(textCol), t => t.isNotNull && t =!= "")
    lit(bias) + aggregate(toks, lit(0.0),
      (acc, t) => acc + coalesce(element_at(wlit, t), lit(0.0)))
  }

  /** Held-out confusion contract: fit on the `trainBp`‱ content-hash bucket
    * slice (same bucket family as [[Dedup.splitAssign]] — append-stable,
    * engine-reproducible), score everyone, and reduce the UNSEEN slice to
    * one confusion row (n_test, tp, tn, fp, fn). This is the gate shape
    * that keeps the classifier honest the way `x_dedup_lsh_recall` keeps
    * the band parameters honest: exact integer counts an oracle can replay,
    * not a float accuracy claim.
    */
  def nbHoldoutConfusion(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seedLabel: Column,
      vocabSize: Int = 4096,
      trainBp: Int = 8000): DataFrame = {
    require(trainBp > 0 && trainBp < 10000, "trainBp must be in (0, 10000)")
    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long") % 10000
    val scored = nbTrainScore(df, idCol, textCol, seedLabel, vocabSize,
      trainFilter = bucket < trainBp)
    scored.where(bucket >= trainBp).agg(
      count(lit(1)).as("n_test"),
      sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 0 && col("y") === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(col("pred") === 1 && col("y") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0 && col("y") === 1, 1L).otherwise(0L)).as("fn"))
  }
}
