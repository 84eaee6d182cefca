package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.KgramHashImpl

class KgramHashSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: hash each k-gram independently by direct fold
    * over code points — the formula the DuckDB oracles replay.
    */
  private def brute(s: String, k: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - k).map { i =>
      cps.slice(i, i + k).foldLeft(0L)((a, c) => (a * 257L + c) % 1000000007L)
    }
  }

  private def viaImpl(s: String, k: Int): Seq[Long] =
    KgramHashImpl.compute(UTF8String.fromString(s), k).toLongArray().toSeq

  test("rolling recurrence equals the per-window direct fold (incl. k=1 and full-length window)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val len = 1 + rnd.nextInt(80)
      val s = (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      for (k <- Seq(1, 2, 5, 12, 33, len)) {
        assert(viaImpl(s, k) == brute(s, k), s"len=$len k=$k s=$s")
      }
    }
  }

  test("code-point semantics: astral-plane chars count once, matching DuckDB substr/ascii") {
    val s = "a😀b" // a, U+1F600, b — 3 code points, 4 UTF-16 units
    assert(viaImpl(s, 2).length == 2)
    assert(viaImpl(s, 2) == brute(s, 2))
    // the middle window hashes the actual code point 0x1F600, not surrogates
    assert(viaImpl(s, 1)(1) == 0x1F600L % 1000000007L)
  }

  test("short/empty/null degrade to empty arrays; values stay in [0, M)") {
    assert(viaImpl("abc", 4).isEmpty)
    assert(viaImpl("", 1).isEmpty)
    assert(KgramHashImpl.compute(null, 3).numElements() == 0)
    val vs = viaImpl("the quick brown fox", 5)
    assert(vs.forall(v => v >= 0 && v < 1000000007L))
  }

  test("column integration: winnowingFingerprints still honors the shared-substring guarantee") {
    val d = Seq(
      (1L, "prefix SHAREDRUNOFTEXT suffix one"),
      (2L, "other SHAREDRUNOFTEXT ending two"),
      (3L, "nothing in common here at all")).toDF("doc_id", "text")
    val fps = graft.operators.Dedup
      .winnowingFingerprints(d, "doc_id", "text", k = 5, w = 4)
      .as[(Long, Long)].collect().toSeq
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty) // shared >= w+k-1 chars
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty ||
      (byDoc(1L) intersect byDoc(3L)).size < (byDoc(1L) intersect byDoc(2L)).size)
  }
}
