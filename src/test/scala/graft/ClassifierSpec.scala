package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** NB bootstrap classifier: separation on a planted vocabulary, smoothing
  * behavior on unseen tokens, train/score isolation, and the loud
  * single-class guard.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Two disjoint sub-vocabularies: "good" docs speak apples, "bad" docs
  // speak spam. A working NB must separate them with a wide margin.
  private def corpus = Seq(
    (1L, "apple pear plum apple", 1),
    (2L, "pear apple cherry plum", 1),
    (3L, "plum cherry apple pear", 1),
    (4L, "spam junk casino spam", 0),
    (5L, "junk casino spam pills", 0),
    (6L, "casino pills junk spam", 0)
  ).toDF("doc_id", "text", "label")

  test("nbTrainScore separates planted classes and agrees with the seed") {
    val out = Classifier
      .nbTrainScore(corpus, "doc_id", "text", col("label") === 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.length == 6)
    out.foreach { case (_, y, score, pred) =>
      assert(pred == y, s"prediction must match the planted class: $y vs $pred")
      assert(if (y == 1) score > 1.0 else score < -1.0,
        s"margin must be wide on disjoint vocabularies, got $score for class $y")
    }
  }

  test("smoothing: a doc of only out-of-evidence tokens scores at the prior") {
    // Token "neutral" appears once in each class -> w(neutral) = 0 exactly
    // (same smoothed numerator/denominator both sides when counts match);
    // with balanced priors the score is 0 and pred falls to class 0.
    val df = corpus.union(Seq(
      (7L, "neutral", 1), (8L, "neutral", 0)).toDF("doc_id", "text", "label"))
    val row = Classifier.nbTrainScore(df, "doc_id", "text", col("label") === 1)
      .where(col("doc_id") === 7L).collect().head
    assert(math.abs(row.getDouble(2)) < 1e-9, s"balanced token must carry no evidence: ${row.getDouble(2)}")
    assert(row.getInt(3) == 0, "score 0 is not > 0 -> class 0")
  }

  test("trainFilter: held-out docs are scored but contribute no counts") {
    // Doc 9 is held out and contains an otherwise-unseen token plus one
    // training token; only the training token carries evidence, and the
    // model must equal the one fit WITHOUT doc 9 entirely.
    val df = corpus.union(Seq((9L, "apple exotictoken", 1)).toDF("doc_id", "text", "label"))
    val heldOut = Classifier.nbTrainScore(df, "doc_id", "text", col("label") === 1,
        trainFilter = col("doc_id") =!= 9L)
      .where(col("doc_id") === 9L).collect().head
    // Reference model: fit on the 6 training docs, score doc 9's text by
    // hand-composing: bias + tf(apple) * w(apple). exotictoken is OOV.
    val base = Classifier.nbTrainScore(corpus, "doc_id", "text", col("label") === 1)
    // doc 1 has tf(apple)=2, pear+plum 1 each; cross-check via two docs is
    // overkill — assert the held-out doc classifies as class 1 with a score
    // strictly between 0 and the all-in-vocab doc 1 score (one token of
    // evidence vs four).
    val doc1 = base.where(col("doc_id") === 1L).collect().head.getDouble(2)
    assert(heldOut.getInt(3) == 1)
    assert(heldOut.getDouble(2) > 0 && heldOut.getDouble(2) < doc1,
      s"one-token evidence ${heldOut.getDouble(2)} must be weaker than four-token $doc1")
  }

  test("nbHoldoutConfusion counts reconcile with per-doc predictions") {
    // Build a corpus large enough that the 80/20 hash split is non-empty on
    // both sides; label = presence of the 'apple' marker token.
    val docs = (0L until 200L).map { i =>
      if (i % 2 == 0) (i, s"apple pear token$i", 1) else (i, s"spam junk token$i", 0)
    }.toDF("doc_id", "text", "label")
    val conf = Classifier.nbHoldoutConfusion(docs, "doc_id", "text", col("label") === 1)
      .collect().head
    val (nTest, tp, tn, fp, fn) =
      (conf.getLong(0), conf.getLong(1), conf.getLong(2), conf.getLong(3), conf.getLong(4))
    assert(nTest > 0 && nTest < 200, s"hash split must leave a non-trivial holdout, got $nTest")
    assert(tp + tn + fp + fn == nTest, "confusion cells must partition the holdout")
    // Disjoint marker vocabularies -> the classifier must be perfect here.
    assert(fp == 0 && fn == 0, s"planted separation must yield zero errors, got fp=$fp fn=$fn")
  }

  test("nbScoreRow with frozen nbWeights agrees with the batch scorer") {
    val (w, b) = Classifier.nbWeights(corpus, "doc_id", "text", col("label") === 1)
    assert(w.keySet == Set("apple", "pear", "plum", "cherry", "spam", "junk", "casino", "pills"))
    val frozen = corpus.select(col("doc_id"),
        Classifier.nbScoreRow(col("text"), w, b).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = Classifier.nbTrainScore(corpus, "doc_id", "text", col("label") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    batch.foreach { case (id, s) =>
      // Different fold order (sorted-token tf·w vs per-occurrence stream),
      // and the batch side rounds to 6 dp: agreement to the rounding
      // half-step, not bit-equality.
      assert(math.abs(frozen(id) - s) < 5e-7, s"doc $id: frozen ${frozen(id)} vs batch $s")
    }
  }

  test("nbScoreRow: out-of-vocabulary tokens carry no evidence") {
    val (w, b) = Classifier.nbWeights(corpus, "doc_id", "text", col("label") === 1)
    val df = Seq((1L, "apple"), (2L, "apple neverseen zzz")).toDF("doc_id", "text")
    val s = df.select(col("doc_id"), Classifier.nbScoreRow(col("text"), w, b).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) == s(2L), "OOV tokens must not move the score")
    val empty = Seq((3L, "")).toDF("doc_id", "text")
      .select(Classifier.nbScoreRow(col("text"), w, b)).collect().head.getDouble(0)
    assert(empty == b, "no tokens -> score is exactly the prior")
  }

  test("single-class seed labels fail loudly") {
    val df = Seq((1L, "a b", 1), (2L, "b c", 1)).toDF("doc_id", "text", "label")
    val e = intercept[Exception] {
      Classifier.nbTrainScore(df, "doc_id", "text", col("label") === 1).collect()
    }
    assert(e.getMessage.contains("single-class"), s"unexpected error: ${e.getMessage}")
  }
}
