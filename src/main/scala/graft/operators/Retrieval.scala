package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval — combining heterogeneous rankers (BM25 lexical,
  * dense ANN cosine, recency, …) into one shortlist without calibrating
  * their incomparable score scales. Reciprocal-rank fusion (Cormack et al.,
  * SIGIR 2009) uses only the RANKS: `score(d) = Σ_lists 1/(c + rank_d)`,
  * which is the standard first stage of hybrid (sparse + dense) retrieval
  * in RAG / embedding-search pipelines.
  *
  * Scale shape: each input list is already a per-query shortlist (size ≤
  * list_k, produced by rankers that bound their own shuffles — BM25's
  * posting aggregation, ANN's pruned probes). Fusion therefore runs on
  * O(queries × lists × list_k) rows, unions them map-side (no shuffle),
  * and pays ONE keyed exchange for the per-(query, doc) sum — at 100 TB
  * corpus scale the fusion cost is a function of the shortlist budget, not
  * the corpus.
  */
object Retrieval {

  /** Fuse ranked lists by reciprocal rank.
    *
    * Each input must carry `idCol` and `rankCol` (1-based; ties already
    * broken deterministically by the ranker). Returns per-id `rrf_score`
    * (rounded to 6 — the contributions are IEEE-identical across engines,
    * the rounding is belt for the cross-engine hash) and `n_lists` (how
    * many rankers surfaced the id — a useful confidence signal), top-k by
    * (score DESC, id ASC).
    *
    * Double determinism: with exactly two lists the fused sum is a single
    * commutative IEEE add; with more, `sum` is grouped per list index first
    * (ordered union), keeping association deterministic.
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      c: Int = 60,
      k: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse requires at least one ranked list")
    // Per-list partial first (one row per (id, list)), then an ordered
    // left-fold of joins — the add order is fixed by list position, so the
    // double result is reproducible no matter how the union would shuffle.
    val contribs = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), (lit(1.0) / (lit(c.toDouble) + col(rankCol).cast("double")))
        .as(s"_c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val zero = lit(0.0)
    val fused = contribs.indices
      .map(i => coalesce(col(s"_c$i"), zero))
      .reduceLeft(_ + _)
    val nLists = contribs.indices
      .map(i => when(col(s"_c$i").isNotNull, 1).otherwise(0))
      .reduceLeft(_ + _)
    joined
      .select(col(idCol), round(fused, 6).as("rrf_score"), nLists.cast("long").as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
