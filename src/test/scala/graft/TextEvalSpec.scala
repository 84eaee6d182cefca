package graft

import org.apache.spark.sql.functions._

import graft.operators.TextEval

/** Hand-computed fixtures for [[TextEval.pairBleu]] — clipping, add-one
  * smoothing, the short-doc degenerate orders, and both brevity-penalty
  * branches.
  */
class TextEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(docsSeq: Seq[(Long, String)], pairsSeq: Seq[(Long, Long)]) = {
    val d = docsSeq.toDF("doc_id", "text")
    val p = pairsSeq.toDF("id_a", "id_b")
    TextEval.pairBleu(p, d, "doc_id", "text", maxN = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq.sortBy(x => (x._1, x._2))
  }

  test("classic near-paraphrase pair: clipped counts by hand") {
    // cand: the(2) cat sat on mat; ref has 'a' for the second 'the'.
    val out = run(Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on a mat"), Seq(1L -> 2L))
    val (_, _, bleu, r1, r2) = out.head
    // p1=(5+1)/(6+1), p2=(3+1)/(5+1), p3=(2+1)/(4+1), p4=(1+1)/(3+1); BP=1
    val exp0 = math.pow((6.0 / 7) * (4.0 / 6) * (3.0 / 5) * (2.0 / 4), 0.25)
    assert(bleu == math.rint(exp0 * 1e6) / 1e6 || math.abs(bleu - exp0) < 1e-6)
    assert(r1 == 0.833333) // 5 clipped unigrams / 6 ref tokens
    assert(r2 == 0.6)      // 3 clipped bigrams / 5 ref bigrams
  }

  test("short candidate: degenerate orders contribute ln 1, BP penalizes") {
    val out = run(Seq(10L -> "x", 11L -> "y z"), Seq(10L -> 11L))
    val (_, _, bleu, r1, r2) = out.head
    // p1=(0+1)/(1+1)=0.5, p2..p4: tot=0 -> p=1; BP=exp(1-2/1)
    val exp0 = math.pow(0.5, 0.25) * math.exp(-1.0)
    assert(math.abs(bleu - exp0) < 1e-6, s"bleu=$bleu expected~$exp0")
    assert(r1 == 0.0 && r2 == 0.0)
  }

  test("identical docs: BLEU exactly the smoothed ceiling, recalls 1") {
    val out = run(Seq(20L -> "a b c d e", 21L -> "a b c d e"), Seq(20L -> 21L))
    val (_, _, bleu, r1, r2) = out.head
    // p_n = (k+1)/(k+1) = 1 for every order -> geo 1, BP 1
    assert(bleu == 1.0)
    assert(r1 == 1.0 && r2 == 1.0)
    // longer candidate than reference: BP stays 1 (no inflation penalty)
    val out2 = run(Seq(30L -> "a b c d e f g", 31L -> "a b c"), Seq(30L -> 31L))
    assert(out2.head._4 == 1.0) // rouge1: all 3 ref tokens covered
  }

  test("pair set is the contract: only requested pairs scored, both orientations distinct") {
    val docsSeq = Seq(1L -> "a b", 2L -> "a b c d", 3L -> "z z z")
    val both = run(docsSeq, Seq(1L -> 2L, 2L -> 1L))
    assert(both.size == 2)
    val fwd = both.find(x => x._1 == 1L).get
    val rev = both.find(x => x._1 == 2L).get
    // asymmetric by construction: BP penalizes 1->2 (short candidate), not 2->1
    assert(fwd._3 < rev._3)
  }
}
