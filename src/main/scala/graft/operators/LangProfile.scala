package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TRAINED language identification — the Cavnar–Trenkle (1994) rank-order
  * n-gram profile method, the classical data-driven counterpart of the
  * marker-lexicon heuristic in [[graft.functions.TextAnalysis.langId]]:
  * each language's profile is its top-k character trigrams by frequency;
  * a document is scored against every profile by the out-of-place
  * distance (Σ |doc rank − profile rank|, missing grams paying the
  * maximum k) and labeled with the argmin.
  *
  * Scale shape: language profiles are one (lang, gram)-keyed count plus a
  * per-LANGUAGE rank window (languages × vocabulary — tiny) and ride
  * broadcast joins; document profiles rank each doc's OWN grams (doc-keyed
  * window, the sessionizer bound); the scoring frame is docs × k × langs
  * rows — linear in the corpus with config-sized constants. Every rank
  * window carries the gram string as tie-break, so profiles, distances and
  * the argmin replay exactly on any engine.
  */
object LangProfile {

  /** Train profiles on the labeled corpus and score every document against
    * them (self-scoring — the standard evaluation shape; to label an
    * UNLABELED corpus, train on a labeled reference and reuse the profile
    * frame). Returns `(id, pred_lang, dist, lang, correct)`.
    */
  def ctLangId(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      k: Int = 50): DataFrame = {
    require(k >= 1, "k must be positive")
    val grams = df.select(col(idCol), col(langCol),
      explode(when(length(col(textCol)) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(col(textCol)) - 2),
          i => col(textCol).substr(i, lit(3))))).as("g"))
    val langCnt = grams.groupBy(col(langCol).as("lang"), col("g"))
      .agg(count(lit(1)).as("c"))
    val wl = Window.partitionBy("lang").orderBy(col("c").desc, col("g"))
    val langProf = langCnt.withColumn("lr", row_number().over(wl))
      .where(col("lr") <= k).select("lang", "g", "lr")
    val docCnt = grams.groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
    val wd = Window.partitionBy(idCol).orderBy(col("c").desc, col("g"))
    val docProf = docCnt.withColumn("dr", row_number().over(wd))
      .where(col("dr") <= k).select(col(idCol), col("g"), col("dr"))
    val langs = langProf.select("lang").distinct()
    val dist = docProf.join(broadcast(langs))
      .join(broadcast(langProf), Seq("lang", "g"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(coalesce(abs(col("dr") - col("lr")), lit(k.toLong))).as("dist"))
    val best = dist.groupBy(col(idCol))
      .agg(min(struct(col("dist"), col("lang"))).as("b"))
      .select(col(idCol), col("b.lang").as("pred_lang"), col("b.dist").as("dist"))
    best.join(df.select(col(idCol), col(langCol).as("lang")), idCol)
      .withColumn("correct", col("pred_lang") === col("lang"))
  }
}
