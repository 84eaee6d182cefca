package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source characteristic-term extraction — TF-IDF over a document
  * corpus, reported as the top-k terms per source. The corpus-report cousin
  * of [[graft.functions.TextAnalysis]]'s per-document scores: "what is this
  * slice of the mix actually about" for recipe audits and contamination
  * triage.
  *
  * Definition: tf(source, term) = term occurrences across the source's
  * documents; idf(term) = ln(N_docs / df(term)) with df = number of DISTINCT
  * documents containing the term; score = tf × idf; rank per source by
  * (score desc, term asc — the tie-break makes the cut deterministic).
  */
object TfIdf {

  /** Top-`k` terms per `sourceCol` group by TF-IDF.
    *
    * Scale shape: two expansions of the corpus, each feeding a map-side
    * combining aggregate — (source, term) counts for tf, and term counts
    * over per-document `array_distinct` arrays for df (the distinct is a
    * LOCAL per-row pass, so document frequency costs one term-keyed shuffle,
    * never a (doc, term) distinct shuffle of the full expansion). N_docs
    * rides a broadcast 1-row aggregate. The tf→df join is term-keyed; at
    * corpus scale the vocabulary is the small side and AQE broadcasts it.
    * The final top-k is a `rank <= k` window filter, which Spark's
    * InferWindowGroupLimit turns into a partial per-map-task limit — a
    * source with 10^9 distinct terms shuffles O(k × tasks) rows.
    */
  def topTerms(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      textCol: String,
      k: Int = 5): DataFrame = {
    require(k > 0, "k must be positive")
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    def explodedTerms(cols: Seq[Column], terms: Column): DataFrame =
      df.select(cols :+ terms.as("_ts"): _*)
        .repartition(parallelism, col(idCol))
        // outer + null-filter: see Dedup.shingleTable (InferFiltersFromGenerate)
        .select(cols :+ explode_outer(col("_ts")).as("term"): _*)
        .where(col("term").isNotNull)

    val tf = explodedTerms(Seq(col(idCol), col(sourceCol)), Dedup.tokens(col(textCol)))
      .groupBy(col(sourceCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = explodedTerms(Seq(col(idCol)), array_distinct(Dedup.tokens(col(textCol))))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))

    val w = Window.partitionBy(col(sourceCol)).orderBy(col("tfidf").desc, col("term"))
    tf.join(docFreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col(sourceCol), col("term"), col("tf"), col("tfidf"), col("rank"))
  }

  /** BM25 ranked retrieval for one query (Lucene-flavored:
    * `idf = ln((N - df + 0.5)/(df + 0.5) + 1)`, saturation `k1`, length
    * normalization `b`): returns the `topK` documents by summed per-term
    * score. The corpus-side index primitives (tf, df, doclen) are the same
    * aggregates a persisted inverted index would hold.
    *
    * Scale shape: the query-term filter lands BEFORE every shuffle — the
    * exploded corpus is cut to query-term postings at the scan, so the tf
    * aggregation moves |postings(q)| rows, not the corpus token volume; df
    * and the (N, avgdl) stats are one-row/|q|-row broadcast sides. Per-doc
    * term scores fold in sorted term order (same engine-reproducible
    * discipline as [[Similarity.pqTopK]]), rounded to 4 decimals before the
    * ranking window.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms required")
    val ws = df.select(col(idCol), Dedup.tokens(col(textCol)).as("_ws"))
    val stats = ws.agg(
      count(lit(1)).cast("double").as("_n"),
      (sum(size(col("_ws"))).cast("double") / count(lit(1))).as("_avgdl"))
    val postings = ws
      .select(col(idCol), size(col("_ws")).cast("double").as("_dl"),
        explode(col("_ws")).as("term"))
      .where(col("term").isInCollection(queryTerms))
    val tf = postings.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("_tf"), first(col("_dl")).as("_dl"))
    val dfreq = postings.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).cast("double").as("_df"))
    val termScore =
      log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0) *
        (col("_tf") * (k1 + 1.0)) /
        (col("_tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    val perTerm = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), termScore.as("_s"))
    val scored = perTerm.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("term"), col("_s")))).as("_ts"))
      .select(col(idCol),
        round(aggregate(col("_ts"), lit(0.0), (acc, v) => acc + v.getField("_s")), 4).as("score"))
    // Bounded global top-k through the native TopKAgg (k-capped partial
    // buffers, map-side combine), NOT a global row_number window: an
    // unpartitioned window would single-partition every scored document,
    // and common query terms score a corpus-sized doc set. The aggregate's
    // output array is already best-first, so rank = array position — no
    // rank window at all, not even over the k survivors.
    val picked = scored.agg(
      TopK.topK(struct((-col("score")).as("ns"), col(idCol)), topK,
        largest = false).as("top"))
    picked.select(posexplode(col("top")))
      .select(col(s"col.$idCol").as(idCol), (-col("col.ns")).as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
