package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-level token statistics: per-document token entropy (a repetition /
  * degeneracy quality signal) and corpus-wide top-k n-grams (the Google-
  * n-grams shape: count everything, keep the heavy head).
  */
object CorpusStats {

  /** Shannon entropy (nats) of the within-document token distribution —
    * near-zero for degenerate repetition ("buy buy buy …"), ~ln(n_tokens)
    * for all-distinct text. A standard corpus-quality facet next to the
    * repetition ratios in [[Repetition]]: entropy catches *skewed* repetition
    * (one token dominating) that the distinct-ratio misses when the tail is
    * varied.
    *
    * Plan: explode to (doc, token) → count per (doc, token) → per-doc fold
    * `H = ln(n) − Σ c·ln(c) / n`. Two exchanges, both keyed on `doc_id`, so
    * the second aggregation reuses the first's partitioning (no re-shuffle:
    * (doc,token) → doc is a prefix-key rollup and AQE plans it as a local
    * aggregation). Shuffle volume is O(distinct tokens per doc), already
    * capped by document length; nothing is ever collected per-doc into one
    * buffer. The `ln(n) − Σc·ln(c)/n` form does one float fold over counts
    * (not two over probabilities), and the result is rounded to 6 dp so the
    * fold order never surfaces in the gate hash.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val wc = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    wc.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col(idCol),
        round(log(col("n").cast("double")) - col("clnc") / col("n").cast("double"), 6)
          .as("token_entropy"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, binary-weight
    * variant): build the corpus co-occurrence graph over ADJACENT token
    * pairs, PageRank it, return the top-k words by rank — the unsupervised
    * keyword surface next to TF-IDF ([[TfIdf]]) and collocation PMI
    * ([[Collocations]]).
    *
    * Graph construction: consecutive-token pairs per document (one
    * shuffle-free zip-with-own-tail projection, the [[Collocations]]
    * machinery's shape), self-loops dropped, pair count ≥ `minCount`
    * (hapax-edge guard — also what keeps the edge list vocabulary², not
    * corpus-sized), then symmetrized DISTINCT edges (the documented
    * binary-weight TextRank variant: edge presence, not multiplicity,
    * drives rank — the iterated state stays O(vocab) and the rank sums
    * reuse [[Graph.pageRank]]'s sorted-fold determinism unchanged).
    * The top-k cut is `orderBy.limit` (TakeOrdered) with the word as
    * tie-break.
    */
  def textRankKeywords(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 2,
      iters: Int = 5,
      damping: Double = 0.85,
      k: Int = 20): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("ws"))
    val pairs = toks
      .select(explode(zip_with(col("ws"), slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .where(col("w2").isNotNull && col("w1") =!= col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
    val edges = pairs.select(col("w1").as("src"), col("w2").as("dst"))
      .union(pairs.select(col("w2").as("src"), col("w1").as("dst")))
      .distinct()
    Graph.pageRank(edges, "src", "dst", iters, damping)
      .select(col("node_id").as("word"), col("pagerank"))
      .orderBy(col("pagerank").desc, col("word")).limit(k)
  }

  /** Corpus-wide top-k word n-grams by document-blind occurrence count,
    * minimum-count filtered; ties broken lexicographically so the cut is
    * deterministic.
    *
    * Plan: n-grams are built per-row with `transform(sequence(...))` over the
    * token array (no self-join, no per-position explode until after the gram
    * string exists), one hash-partial count absorbs duplicates map-side, and
    * the global top-k goes through [[TopK.topK]]'s bounded aggregate — the
    * driver receives exactly k rows and the final exchange carries at most
    * k × partitions pre-aggregated candidates, not the full gram vocabulary.
    * At 100 TB the gram count shuffle is the cost; it is the canonical
    * word-count shape (map-side combine, power-law keys absorbed by partial
    * aggregation, no skew join anywhere).
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int, minCount: Long): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    // Materialize the token array in its own projection FIRST: referencing
    // the split expression inside the transform lambda would re-embed (and
    // re-evaluate) the full split once per element_at — O(len²) splits per
    // document (measured: 13 s → 1.3 s on the sf0.1 gate).
    val withToks = docs.select(TextAnalysis.tokens(col(textCol)).as("ws"))
    val toks = col("ws")
    // Guard the sequence: Spark's `sequence(0, -1)` infers a NEGATIVE step
    // and yields [0, -1] — a doc shorter than n tokens must produce zero
    // grams, not two broken ones.
    val grams = when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val counted = withToks
      .select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    // Bounded global top-k: order by (cnt desc, gram asc). TopKAgg orders
    // structs lexicographically largest-first, so negate the count and flip.
    val picked = counted.agg(
      TopK.topK(struct((-col("cnt")).as("nc"), col("gram")), k, largest = false).as("top"))
    picked.select(explode(col("top")).as("t"))
      .select((-col("t.nc")).as("cnt"), col("t.gram").as("gram"))
  }

  /** Zipf-law fit over the frequency head: ordinary least squares of
    * `ln(freq)` on `ln(rank)` for the top-k tokens — the exponent (slope ≈
    * −1 for natural language) is the one-number summary of how head-heavy
    * a corpus is; synthetic or templated corpora show up as fits far from
    * Zipf. Output: one row `(k_used, slope, intercept)`.
    *
    * The corpus-sized work is the word-count shuffle; the ranked head comes
    * through [[TopK.topK]]'s bounded aggregate and the OLS moments are one
    * aggregation over k rows — closed-form, no iteration.
    */
  def zipfFit(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 2, "need at least 2 ranks to fit")
    val wc = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val ranked = wc
      .agg(TopK.topK(struct((-col("cnt")).as("nc"), col("tok")), k, largest = false).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(log((col("pos") + 1).cast("double")).as("x"),
        log((-col("t.nc")).cast("double")).as("y"))
    ranked.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("k_used"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n")), 6).as("slope"),
        round((col("sy") - ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n"))) * col("sx")) / col("n"), 6)
          .as("intercept"))
  }

  /** Pairwise Jensen–Shannon divergence between per-source unigram
    * distributions (nats, 6 dp) — the corpus-similarity matrix that
    * informs mixture design: near-zero pairs are redundant sources,
    * high-JSD pairs add coverage.
    *
    * Shape: one (source, token) count aggregation; each source pair gets
    * its two one-sided sums through TWO token-keyed joins (the a-side join
    * contributes `p/2·ln(p/m)` for every token of a — including tokens b
    * lacks, where `m = p/2` — and the b-side join the symmetric term), so
    * tokens present in only one source are covered WITHOUT a full-outer
    * grid and nothing ever materializes pairs × vocabulary beyond the
    * matched rows. Source-pair list is broadcast (sources are few);
    * everything else is vocabulary-sized.
    */
  def sourceDivergence(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("s"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val counts = tok.groupBy(col("s"), col("tok")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("s")).agg(sum(col("c")).as("n"))
    val p = counts.join(totals, "s")
      .select(col("s"), col("tok"), (col("c").cast("double") / col("n").cast("double")).as("p"))
    val srcs = totals.select(col("s"))
    val pairsOfSrc = broadcast(
      srcs.select(col("s").as("src_a"))
        .crossJoin(srcs.select(col("s").as("src_b")))
        .where(col("src_a") < col("src_b")))
    def side(anchor: String, other: String): DataFrame =
      pairsOfSrc
        .join(p.select(col("s").as(anchor), col("tok"), col("p").as("pa")), anchor)
        .join(p.select(col("s").as(other), col("tok"), col("p").as("pb")),
          Seq(other, "tok"), "left")
        .select(col("src_a"), col("src_b"),
          (col("pa") / 2.0 * log(col("pa") / ((col("pa") + coalesce(col("pb"), lit(0.0))) / 2.0)))
            .as("term"))
    side("src_a", "src_b").unionByName(side("src_b", "src_a"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(round(sum(col("term")), 6).as("jsd"))
  }

  /** Vocabulary coverage curve: for each cutoff k, the share of all token
    * occurrences covered by the k most frequent tokens (count-desc,
    * lexicographic tie-break) — the number that sizes a tokenizer vocab or
    * an OOV budget.
    *
    * The corpus-sized work is one word-count shuffle; the ranked head is
    * then cut to `max(cutoffs)` rows through [[TopK.topK]]'s bounded
    * aggregate (never a global sort of the vocabulary), and the
    * cutoff×head cross product — at most k·|cutoffs| tiny rows — rolls up
    * per cutoff. The occurrence total rides the same word-count frame as a
    * second aggregate, so nothing rescans the corpus.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, cutoffs: Seq[Int]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.forall(_ >= 1), "cutoffs must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val kMax = cutoffs.max
    val wc = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val headAndTotal = wc.agg(
      TopK.topK(struct((-col("cnt")).as("nc"), col("tok")), kMax, largest = false).as("top"),
      sum(col("cnt")).as("total"))
    val ranked = headAndTotal.select(posexplode(col("top")).as(Seq("pos", "t")), col("total"))
      .select((col("pos") + 1).as("rk"), (-col("t.nc")).as("cnt"), col("total"))
    ranked.crossJoin(broadcast(cutoffs.toDF("cutoff")))
      .where(col("rk") <= col("cutoff"))
      .groupBy("cutoff")
      .agg(round(sum(col("cnt")).cast("double") / first(col("total")).cast("double"), 6)
        .as("coverage"))
  }

  /** Order-invariant corpus version digest — the cheap answer to "is this
    * the same corpus?" across copies, engines, and re-partitionings: per
    * group, (n_docs, XOR of per-doc 60-bit content hashes, exact SUM of
    * the same hashes). XOR and SUM are commutative-associative, so the
    * digest is independent of row order and partitioning AND mergeable
    * (per-shard digests combine by xor/sum/add — an append-only ingest
    * can maintain it incrementally). The two accumulators are
    * complementary: XOR alone is blind to an even number of identical
    * duplicates (x⊕x = 0), SUM alone to reorderings of which doc carries
    * which edit; together with the count, any single-doc change flips
    * both. Hash = first 15 hex chars of md5 (60 bits, engine-portable —
    * the same md5-prefix idiom as the MinHash family); the SUM is carried
    * modulo the Mersenne prime 2^61−1 — still commutative/mergeable
    * ((a+b) mod p = ((a mod p)+(b mod p)) mod p), but the published value
    * stays an exact int64 on every engine (a raw Σ of 60-bit hashes
    * overflows a long, and decimal sums round to float64 in some client
    * bridges — both failure modes observed building this gate).
    */
  def corpusDigest(docs: DataFrame, groupCols: Seq[String], textCol: String): DataFrame = {
    val p = 2305843009213693951L // 2^61 - 1
    val h = conv(substring(md5(col(textCol)), 1, 15), 16, 10).cast("long")
    docs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      bit_xor(h).as("digest_xor"),
      (sum(h.cast("decimal(28,0)")) % lit(p)).cast("long").as("digest_sum"))
  }
}
