package graft

import org.apache.spark.sql.functions._

import graft.operators.{ChatTemplate, Mixture, Packing}

/** Round-9 LLM-pipeline additions: length-bucket padding arithmetic,
  * water-filling allocation against hand-solved closed forms in all three
  * regimes, and best-of-n argmax/template assembly.
  */
class WaterfillBestOfNSpec extends SparkSpec {
  import spark.implicits._

  test("lengthBucketStats: exact power-of-two boundaries and cap truncation") {
    // tokens: 1, 2, 3, 4, 5, 300 with maxBits=3 (cap 8)
    val df = Seq(1L, 2L, 3L, 4L, 5L, 300L).toDF("n")
    val got = Packing.lengthBucketStats(df, col("n"), maxBits = 3)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // bucket 1: {1}; bucket 2: {2}; bucket 4: {3,4}; bucket 8: {5, 300->8}
    assert(got == Seq(
      (1L, 1L, 1L, 1L, 0.0),
      (2L, 1L, 2L, 2L, 0.0),
      (4L, 2L, 7L, 8L, 0.125),
      (8L, 2L, 13L, 16L, 0.1875)))
  }

  private def runWf(budget: Double, maxEpochs: Double) = {
    // three sources: a=100 tokens w=4, b=200 w=1, c=400 w=1
    val rows = Seq.fill(1)(("a", 100L)) ++ Seq(("b", 200L), ("c", 400L))
    Mixture.waterFill(rows.toDF("source", "n"), "source", col("n"),
      Map("a" -> 4.0), budget, maxEpochs)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
  }

  test("waterFill: no source saturates — pure proportional split") {
    // caps: a=200, b=400, c=800 (maxEpochs 2); budget 300, Σw=6 -> λ=50
    // ratios: a: 200/4=50, b: 400, c: 800. candidate@a = 300/6 = 50;
    // ratio_a = 50 >= 50 -> valid at the FIRST row; alloc = λw = 200/50/50
    val got = runWf(300.0, 2.0)
    assert(got("a") == ((200.0, 2.0)))  // λw == cap exactly at the boundary
    assert(got("b") == ((50.0, 0.25)) && got("c") == ((50.0, 0.125)))
  }

  test("waterFill: mixed regime — high-weight source saturates") {
    // maxEpochs 1: caps a=100, b=200, c=400; budget 400
    // ratios: a=25, b=200, c=400. cand@a = 400/6 = 66.7 > 25 -> a invalid,
    // saturates. cand@b = (400-100)/2 = 150 <= 200 -> valid; λ=150.
    val got = runWf(400.0, 1.0)
    assert(got("a") == ((100.0, 1.0)))          // cap-bound
    assert(got("b") == ((150.0, 0.75)))          // λw
    assert(got("c") == ((150.0, 0.375)))
    assert(math.abs(got.values.map(_._1).sum - 400.0) < 1e-9)
  }

  test("waterFill: budget above total capacity — everything saturates") {
    val got = runWf(10000.0, 2.0)
    assert(got == Map("a" -> ((200.0, 2.0)), "b" -> ((400.0, 2.0)),
      "c" -> ((800.0, 2.0))))
  }

  test("bestOfN: argmax with tie on score resolves to lowest candidate id") {
    val cands = Seq(
      (1L, "q1", "resp-a", 10L, 5.0),
      (1L, "q1", "resp-b", 11L, 9.0),
      (1L, "q1", "resp-c", 12L, 9.0), // tie with 11 -> 11 wins
      (2L, "q2", "only", 20L, 1.0)
    ).toDF("pid", "prompt", "resp", "cid", "score")
    val got = ChatTemplate.bestOfN(cands, "pid", "prompt", "resp", "cid", col("score"))
      .select("pid", "best_candidate", "best_score", "worst_score", "n_candidates",
        "text", "span_start", "span_end")
      .as[(Long, Long, Double, Double, Long, String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 11L, 9.0, 5.0, 3L,
      "<|user|>q1<|assistant|>resp-b", 23L, 29L)))
    assert(got(1)._2 == 20L && got(1)._5 == 1L)
    // span slices exactly the response back out
    val (_, _, _, _, _, text, s0, s1) = got(0)
    assert(text.substring(s0.toInt, s1.toInt) == "resp-b")
  }
}
