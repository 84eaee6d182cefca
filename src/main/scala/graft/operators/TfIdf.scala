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
}
