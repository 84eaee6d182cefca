package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** [[graft.operators.Quality.compressionRatio]] — the deflate-based quality
  * signal: known-compressibility fixtures land in their expected bands, the
  * two DEFLATE invariants the x_quality_compress gate asserts corpus-wide
  * hold on adversarial strings, and the UDF is deterministic and
  * null-preserving.
  */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def ratioOf(s: String): Double =
    Quality.compressionRatio(Seq((1L, s)).toDF("doc_id", "text"), "doc_id", "text")
      .select("comp_ratio").as[Double].head()

  test("fixtures land in expected bands: repetitive tiny, prose mid, random-ish high") {
    assert(ratioOf("ab" * 4000) < 0.05)
    val prose = Seq.tabulate(200)(i =>
      s"the quick brown fox ${i} jumps over the lazy dog while counting ${i * 7}").mkString(" ")
    val p = ratioOf(prose)
    assert(p > 0.05 && p < 0.6, s"prose ratio $p")
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(4000)((rnd.nextInt(94) + 33).toChar).mkString
    assert(ratioOf(noise) > 0.8)
  }

  test("deflate invariants: stored-block bound and doubling subadditivity on adversarial inputs") {
    val rnd = new scala.util.Random(7)
    val cases = Seq("", "a", "æøå ÆØÅ  ", "ab" * 5000,
      Array.fill(40000)((rnd.nextInt(64) + 32).toChar).mkString, // beyond the 32k LZ77 window
      "x" * 33000)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("bl"),
        Quality.deflateLen(col("text")).as("c1"),
        Quality.deflateLen(concat(col("text"), col("text"))).as("c2"))
    df.as[(Long, Long, Long, Long)].collect().foreach { case (id, bl, c1, c2) =>
      assert(c1 <= bl + 64, s"stored bound broken for doc $id: $c1 > $bl + 64")
      assert(c2 < 2 * c1 + 64, s"subadditivity broken for doc $id: $c2 >= 2*$c1 + 64")
    }
  }

  test("deterministic across evaluations; null text propagates null") {
    val df = Seq((1L, Option("some moderately compressible text " * 10)), (2L, None))
      .toDF("doc_id", "text")
    val twice = df.select(Quality.deflateLen(col("text")).as("a"),
      Quality.deflateLen(col("text")).as("b"))
      .as[(Option[Long], Option[Long])].collect().toMap
    assert(twice.forall { case (a, b) => a == b })
    assert(twice.keySet.contains(None))
  }
}
