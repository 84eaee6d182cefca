package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise n-gram overlap metrics — BLEU and ROUGE-N — over an EXPLICIT
  * candidate-pair set. The training-data uses: graded decontamination
  * verification (is the near-dup hit a real paraphrase or a shared
  * boilerplate shard?), self-BLEU diversity audits of generated/synthetic
  * corpora, and reference-based eval-set scoring. Extension beyond the
  * reference (its pipeline stops at boolean n-gram hits); metric
  * definitions follow Papineni et al. 2002 (BLEU) and Lin 2004 (ROUGE-N),
  * adapted for cross-engine determinism as documented below.
  *
  * Scale shape: the operator takes `pairs` as INPUT and never generates
  * them — at 100 TB the pair set comes from the LSH/containment candidate
  * stages (bounded by their bucket caps), so every join here is keyed and
  * pair-proportional: per-doc n-gram counts join the pair list by doc id
  * (candidate side first — the pair frame is the small side and AQE
  * broadcasts it in the healthy case), then the (pair, n, gram) rows join
  * the reference side by (id, n, gram). Nothing is ever quadratic in the
  * corpus; per-task state is one group's running sums.
  *
  * Determinism deltas (both engines replay them exactly):
  *  - add-ONE smoothing on every BLEU precision (`p_n = (clip_n + 1) /
  *    (total_n + 1)`) instead of the reference implementations' zoo of
  *    epsilon variants — no ln(0), no float epsilon to disagree on;
  *  - a document shorter than n tokens has `total_n = 0`, so `p_n = 1`
  *    (contributes nothing) rather than undefined;
  *  - scores round to 6 dp (the repo-wide cross-engine float belt).
  */
object TextEval {

  /** BLEU-`maxN` of `id_a` (candidate) against `id_b` (reference) plus
    * ROUGE-1/ROUGE-2 recall, one row per input pair.
    *
    * @param pairs frame with `id_a`, `id_b` columns (candidate, reference)
    * @param docs  corpus with `idCol`, `textCol`
    */
  def pairBleu(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 2, "pairBleu needs maxN >= 2 (ROUGE-2 recall is emitted)")
    // \s+ tokenization with empty-token removal: consecutive spaces, tabs
    // and newlines never yield phantom "" grams, and an empty document
    // tokenizes to zero tokens (not one) — matching the standard BLEU/ROUGE
    // whitespace-tokenizer contract the scaladoc cites. The gate oracle
    // replays the identical regex split + filter.
    val toks = docs.select(col(idCol).as("id"),
      filter(split(trim(col(textCol)), "\\s+"), t => t =!= "").as("ws"))
    val lens = toks.select(col("id"), size(col("ws")).as("len"))

    // One projection emits every n-gram order in one pass over the token
    // array. `slice(sequence(1, max(k,1)), 1, max(k,0))` is the typed-empty
    // guard: sequence(1,0) would generate DESCENDING [1,0], so the sequence
    // is floored at one element and sliced to zero length when the doc is
    // shorter than n.
    def gramStarts(n: Int): Column = {
      val k = size(col("ws")) - (n - 1)
      slice(sequence(lit(1), greatest(k, lit(1))), lit(1), greatest(k, lit(0)))
    }
    val gramStructs = flatten(array((1 to maxN).map { n =>
      transform(gramStarts(n), i =>
        struct(lit(n).as("n"), concat_ws(" ", slice(col("ws"), i, lit(n))).as("gram")))
    }: _*))
    val cnts = toks
      .select(col("id"), explode(gramStructs).as("g"))
      .select(col("id"), col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy("id", "n", "gram").agg(count(lit(1)).as("c"))

    // Candidate-side grams ride the pair list (id-keyed join), then clip
    // against the reference side per (pair, n): Σ min(c_a, c_b).
    val p = pairs.select(col("id_a"), col("id_b"))
    val aGrams = p.join(cnts.withColumnsRenamed(Map("id" -> "id_a", "c" -> "ca")), Seq("id_a"))
    val clipped = aGrams
      .join(cnts.withColumnsRenamed(Map("id" -> "id_b", "c" -> "cb")), Seq("id_b", "n", "gram"))
      .groupBy("id_a", "id_b", "n")
      .agg(sum(least(col("ca"), col("cb"))).as("clip"))

    // Every (pair, n) row exists even with zero overlap — the smoothing
    // and the geometric mean need all maxN precisions.
    val pairN = p.select(col("id_a"), col("id_b"),
        explode(array((1 to maxN).map(lit): _*)).as("n"))
      .join(clipped, Seq("id_a", "id_b", "n"), "left")
      .join(lens.withColumnsRenamed(Map("id" -> "id_a", "len" -> "la")), Seq("id_a"))
      .join(lens.withColumnsRenamed(Map("id" -> "id_b", "len" -> "lb")), Seq("id_b"))
    val totA = greatest(col("la") - (col("n") - 1), lit(0))
    val totB = greatest(col("lb") - (col("n") - 1), lit(0))
    val clip = coalesce(col("clip"), lit(0L))
    val pn = (clip + 1).cast("double") / (totA + 1).cast("double")
    val scored = pairN
      .select(col("id_a"), col("id_b"), col("n"), col("la"), col("lb"),
        log(pn).as("ln_pn"),
        when(col("n") === 1, clip.cast("double") / greatest(totB, lit(1)).cast("double")).as("r1"),
        when(col("n") === 2, clip.cast("double") / greatest(totB, lit(1)).cast("double")).as("r2"))
      .groupBy("id_a", "id_b")
      .agg(
        exp(sum(col("ln_pn")) / maxN).as("_geo"),
        first(col("la")).as("la"), first(col("lb")).as("lb"),
        round(max(col("r1")), 6).as("rouge1_recall"),
        round(max(col("r2")), 6).as("rouge2_recall"))
    // Brevity penalty on token lengths: 1 when the candidate is at least
    // reference-length, exp(1 - lb/la) otherwise (empty candidate floors
    // the ratio denominator at 1 — BP underflows toward 0, as it should).
    val bp = when(col("la") >= col("lb"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("lb").cast("double") / greatest(col("la"), lit(1)).cast("double")))
    scored.select(col("id_a"), col("id_b"),
      round(bp * col("_geo"), 6).as("bleu"),
      col("rouge1_recall"), col("rouge2_recall"))
  }
}
