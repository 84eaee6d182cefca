package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance resampling: weight direction on planted domains,
  * Gumbel-top-k selection pressure, append-stability of the deterministic
  * noise, and the loud empty-target guard.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Target domain speaks fruit; the raw corpus also carries web junk.
  // Candidates 100+ are unlabeled raw docs from one domain or the other.
  private def corpus = {
    val target = (0L until 10L).map(i => (i, "apple pear plum cherry", 1))
    val junk = (10L until 20L).map(i => (i, "casino pills spam junk", 0))
    val candFruit = (100L until 110L).map(i => (i, "pear cherry apple plum", 0))
    val candJunk = (110L until 120L).map(i => (i, "junk spam casino pills", 0))
    (target ++ junk ++ candFruit ++ candJunk).toDF("doc_id", "text", "is_target")
  }

  test("importanceWeights ranks target-domain candidates above off-domain") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", col("is_target") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fruit = (100L until 110L).map(w)
    val junk = (110L until 120L).map(w)
    assert(fruit.min > junk.max,
      s"every fruit candidate must outweigh every junk candidate: ${fruit.min} vs ${junk.max}")
    // Absolute signs are NOT asserted: with buckets >> corpus tokens the
    // add-one smoothing mass dominates both distributions and shifts all
    // weights — only the ORDERING between domains is a DSIR invariant.
    assert(fruit.min - junk.max > 1.0,
      s"domain gap must be wide in nats, got ${fruit.min - junk.max}")
  }

  test("gumbelTopK under wide separation selects only high-weight docs, deterministically") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", col("is_target") === 1)
    // Weight gap between domains is several nats; Gumbel noise has scale 1,
    // so a k inside the high-weight population must select only from it.
    val sel = Dsir.gumbelTopK(w, "doc_id", k = 8).collect().map(_.getLong(0)).toSet
    assert(sel.size == 8)
    val high = ((0L until 10L) ++ (100L until 110L)).toSet
    assert(sel.subsetOf(high), s"selected off-domain docs: ${sel -- high}")
    val again = Dsir.gumbelTopK(w, "doc_id", k = 8).collect().map(_.getLong(0)).toSet
    assert(sel == again, "content-hash Gumbel noise must be run-stable")
  }

  test("appending rows never changes an existing doc's weight-independent noise rank order") {
    val w1 = Dsir.importanceWeights(corpus, "doc_id", "text", col("is_target") === 1)
    val sel1 = Dsir.gumbelTopK(w1, "doc_id", k = 5).collect().map(_.getLong(0)).toSet
    // Add junk docs only: the target and raw distributions shift, but the
    // per-doc Gumbel u is a pure id hash — so with weights held FIXED the
    // same k must come back. (Re-fitting may legitimately reorder.)
    val sel1b = Dsir.gumbelTopK(w1.union(
        Seq((900L, -50.0), (901L, -50.0)).toDF("doc_id", "logw")),
      "doc_id", k = 5).collect().map(_.getLong(0)).toSet
    assert(sel1 == sel1b, "far-below-threshold appends must not perturb the selection")
  }

  test("empty target slice fails loudly") {
    val e = intercept[Exception] {
      Dsir.importanceWeights(corpus, "doc_id", "text", lit(false)).collect()
    }
    assert(e.getMessage.contains("target slice"), s"unexpected error: ${e.getMessage}")
  }
}
