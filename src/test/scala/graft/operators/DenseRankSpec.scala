package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct unit pin of [[SuffixArray.denseRankGlobal]]'s round-15
  * construction: salted range partitions + a streaming internal-row scan +
  * DUPLICATE-ADJUSTED offsets. The corpus-level specs exercise it end to
  * end; this spec forces the hardest arithmetic path deterministically —
  * one equal-key class large enough to COVER whole partitions (the chain
  * case: the key is the last key of partition p, the ONLY key of p+1, and
  * the first key of p+2, so two boundary duplicates must be subtracted
  * and all three fragments must land on one rank).
  */
class DenseRankSpec extends SparkSpec {

  test("one dominant equal-key class chains across whole partitions; ranks stay the mathematical dense rank") {
    val n = 600000L
    // 70% of rows share key 42 (sorted FIRST — unique keys start at 1e6),
    // 30% carry a unique key derived from the row id.
    val df = spark.range(n).select(
      when(col("id") % 10 < 7, lit(42L)).otherwise(col("id") + 1000000L).as("_r"),
      col("id").as("_d"), lit(1L).as("_o"))
    val width = 3 // 200k rows per partition; the 420k-row class spans all three
    val (ranked, total) =
      SuffixArray.denseRankGlobal(df, Seq("_r"), "_dr", width, salt = Seq("_d", "_o"))
    val rows = ranked.select(col("_r"), col("_d"), col("_dr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == n)

    // Exactly one distinct rank per distinct key, totals agree.
    val distinctKeys = 1L + rows.count(_._1 != 42L)
    assert(total == distinctKeys, s"total $total != distinct $distinctKeys")

    // The dominant class collapses to ONE rank — and it is rank 1 (42 is
    // the smallest key), no matter how many partitions its rows spanned.
    val dom = rows.filter(_._1 == 42L).map(_._3).distinct
    assert(dom.toSeq == Seq(1L), s"dominant class ranks: ${dom.mkString(",")}")

    // Every unique key's rank is its exact mathematical dense rank:
    // 1 (for key 42) + its position among the sorted unique keys.
    val uniq = rows.filter(_._1 != 42L).sortBy(_._1)
    uniq.zipWithIndex.foreach { case ((k, _, dr), i) =>
      assert(dr == i + 2L, s"key $k expected rank ${i + 2}, got $dr")
    }
  }

  test("empty frame and single-row frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("_r", "_d", "_o")
    val (re, te) = SuffixArray.denseRankGlobal(empty, Seq("_r"), "_dr", 2, Seq("_d", "_o"))
    assert(re.count() == 0L && te == 0L)
    val one = Seq((7L, 1L, 1L)).toDF("_r", "_d", "_o")
    val (r1, t1) = SuffixArray.denseRankGlobal(one, Seq("_r"), "_dr", 2, Seq("_d", "_o"))
    assert(t1 == 1L && r1.select("_dr").head().getLong(0) == 1L)
  }
}
