package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Property coverage for the round-8 operator family: seeded randomized
  * inputs, exact independent oracles computed in plain Scala.
  */
class Round8PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  /** Random word-ish text over a small alphabet — adversarial for hashing
    * (many repeated k-grams) while staying cheap.
    */
  private def randText(len: Int): String =
    (1 to len).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString

  test("exactDupSpans soundness + maximality: every reported span is a real, maximal exact match") {
    val minLen = 20; val w = 4
    // Docs with planted shared blocks AND adversarial small-alphabet noise
    // (frequent hash collisions among k-grams stress the anchor verify).
    val blocks = (1 to 5).map(i => s"PLANTED${i}_" + randText(30))
    val docs = (1L to 20L).map { id =>
      val parts = (1 to 3).map { _ =>
        if (rnd.nextBoolean()) blocks(rnd.nextInt(blocks.length)) else randText(40)
      }
      (id, parts.mkString(s"<${id}a>", s"<${id}b>", s"<${id}c>"))
    }
    val df = docs.toDF("doc_id", "text")
    val spans = Dedup.exactDupSpans(df, "doc_id", "text", minLen, w)
      .as[(Long, Long, Int, Int, Int)].collect().toSeq
    val byId = docs.toMap
    assert(spans.nonEmpty, "planted blocks must produce at least one span")
    spans.foreach { case (a, b, sa, sb, len) =>
      val ta = byId(a); val tb = byId(b)
      // soundness: byte-exact match
      assert(ta.substring(sa - 1, sa - 1 + len) == tb.substring(sb - 1, sb - 1 + len),
        s"span ($a,$b,$sa,$sb,$len) is not an exact match")
      assert(len >= minLen)
      // maximality: extending one char either way must break the match
      val leftOk = sa == 1 || sb == 1 || ta.charAt(sa - 2) != tb.charAt(sb - 2)
      val rightOk = sa - 1 + len == ta.length || sb - 1 + len == tb.length ||
        ta.charAt(sa - 1 + len) != tb.charAt(sb - 1 + len)
      assert(leftOk && rightOk, s"span ($a,$b,$sa,$sb,$len) is not maximal")
    }
  }

  test("exactDupSpans recall: a planted unique block >= minLen in two docs is always found") {
    val minLen = 30; val w = 4
    for (trial <- 1 to 10) {
      val block = s"UNIQUE${trial}QQ" + (1 to minLen).map(_ => "wxyz".charAt(rnd.nextInt(4))).mkString
      val d = Seq(
        (1L, s"<<${randText(25)} $block ${randText(25)}>>"),
        (2L, s"[[${randText(25)} $block ${randText(25)}]]")
      ).toDF("doc_id", "text")
      val spans = Dedup.exactDupSpans(d, "doc_id", "text", minLen, w)
        .as[(Long, Long, Int, Int, Int)].collect().toSeq
      val ta = d.where(col("doc_id") === 1L).head().getString(1)
      val covered = spans.exists { case (_, _, sa, _, len) =>
        val s0 = ta.indexOf(block)
        sa - 1 <= s0 && s0 + block.length <= sa - 1 + len
      }
      assert(covered, s"trial $trial: planted block not covered by any span")
    }
  }

  test("removeSelfDupText invariants: char accounting, interval-deletion shape, idempotent-ish") {
    val minLen = 20; val w = 4
    val docs = (1L to 15L).map { id =>
      val base = randText(60)
      // randomly self-duplicate a stretch
      val text =
        if (id % 3 == 0) base + " MID " + base.substring(0, 40) + " END"
        else base
      (id, text)
    }
    val df = docs.toDF("doc_id", "text")
    val out = Dedup.removeSelfDupText(df, "doc_id", "text", minLen, w)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val byId = docs.toMap
    out.foreach { case (id, (clean, nSpans, removed)) =>
      val orig = byId(id)
      // exact char accounting
      assert(clean.length == orig.length - removed)
      assert((nSpans == 0) == (removed == 0))
      // clean text must be orig with some (possibly empty) set of
      // contiguous intervals deleted -> it is a subsequence of orig
      var i = 0
      clean.foreach { c =>
        i = orig.indexOf(c, i)
        assert(i >= 0, s"doc $id: clean text is not a subsequence of the original")
        i += 1
      }
      // prefix is always preserved (first occurrences keep their place)
      if (clean.nonEmpty) assert(orig.startsWith(clean.substring(0, math.min(10, clean.length))))
    }
  }

  test("incremental == cross-side slice of batch exactDupSpans (below every cap, seeded corpora)") {
    val minLen = 20; val w = 4
    // index ids < 100 < new ids, so batch's id_a<id_b orientation puts the
    // index doc on the a-side of every cross pair — swap to compare.
    val blocks = (1 to 4).map(i => s"XBLOCK${i}_" + randText(25))
    def mk(id: Long) = (id, Seq(
      randText(15), blocks(rnd.nextInt(blocks.length)), randText(15),
      if (rnd.nextBoolean()) blocks(rnd.nextInt(blocks.length)) else randText(20)
    ).mkString(s"(${id}s)", s"(${id}m)", s"(${id}e)"))
    val index = (1L to 8L).map(mk).toDF("doc_id", "text")
    val fresh = (101L to 106L).map(mk).toDF("doc_id", "text")
    val incr = Dedup.exactDupSpansIncremental(fresh, index, "doc_id", "text", minLen, w)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    val batchCross = Dedup.exactDupSpans(
        index.unionByName(fresh), "doc_id", "text", minLen, w)
      .as[(Long, Long, Int, Int, Int)].collect().toSeq
      .filter { case (a, b, _, _, _) => a < 100 && b > 100 } // index-side a, new-side b
      .map { case (a, b, sa, sb, len) => (b, a, sb, sa, len) } // normalize to (new, index)
      .toSet
    assert(incr.nonEmpty, "shared blocks must produce cross-side spans")
    assert(incr == batchCross,
      s"incremental and batch cross-side spans diverge: only-incr=${incr -- batchCross}, only-batch=${batchCross -- incr}")
  }

  test("mp4 fixture round-trip property across the parameter grid") {
    for (ts <- Seq(600, 1000, 90000); dur <- Seq(0, 1, 119); n <- Seq(1, 2, 3)) {
      val wpx = 16 + ts % 640; val hpx = 16 + dur % 480 + 1
      val bytes = Multimodal.syntheticMp4("mp42", ts, dur, wpx, hpx, n, seed = ts * 7L + dur)
      val got = Multimodal.mp4Meta(bytes)
      assert(got.contains(("mp42", ts.toLong, Math.floorDiv(ts.toLong * dur * 1000L, ts.toLong),
        Some(wpx), Some(hpx), n)), s"ts=$ts dur=$dur n=$n got $got")
    }
  }

  test("segmentFilter equals a naive Scala reimplementation on seeded random corpora") {
    val vocab = Array("aa", "bb", "cc", "dd", "rare1", "rare2")
    val weights = Array(30, 30, 20, 15, 1, 1) // rare tokens drag window scores down
    def pick(): String = {
      val r = rnd.nextInt(weights.sum)
      var acc = 0
      var i = 0
      while (i < vocab.length) {
        acc += weights(i)
        if (r < acc) return vocab(i)
        i += 1
      }
      vocab.last
    }
    val seg = 5; val thr = -2.0
    val docs = (1L to 12L).map(id => (id, (1 to (5 + rnd.nextInt(30))).map(_ => pick()).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.UnigramLm.segmentFilter(df, "doc_id", "text", seg, thr)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // naive replay: corpus counts, per-window sorted (token, tf, lp) fold
    val allToks = docs.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
    val cnt = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigN = allToks.size.toDouble
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val wins = toks.grouped(seg).toSeq
      val scores = wins.map { wtoks =>
        val tf = wtoks.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val num = tf.foldLeft(0.0) { case (acc, (t, f)) => acc + f.toDouble * math.log(cnt(t) / bigN) }
        val den = tf.foldLeft(0L) { case (acc, (_, f)) => acc + f }
        math.rint(num / den * 1e6) / 1e6
      }
      val kept = wins.zip(scores).filter(_._2 >= thr).map(_._1.mkString(" "))
      val (gSeg, gKept, gText) = got(id)
      assert(gSeg == wins.size.toLong, s"doc $id n_seg")
      assert(gKept == kept.size.toLong, s"doc $id n_kept")
      assert(gText == kept.mkString(" "), s"doc $id reassembly")
    }
  }
}
