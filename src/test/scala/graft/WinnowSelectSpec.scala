package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class WinnowSelectSpec extends SparkSpec {
  import spark.implicits._

  private def newSel(h: Column, w: Int): Column =
    org.apache.spark.sql.graft.Shim.column(
      graft.expressions.WinnowSelect(org.apache.spark.sql.graft.Shim.expression(h), w))

  /** The exact HOF composition the expression replaced
    * (Dedup.winnowingFingerprintPositions before round 7) — kept here as
    * the equivalence oracle.
    */
  private def oldSel(h: Column, w: Int): Column =
    when(size(h) >= w,
      array_distinct(transform(sequence(lit(1), size(h) - (w - 1)), j => {
        val win = slice(h, j, lit(w))
        val mn = array_min(win)
        struct(mn.as("fp"), (j.cast("long") - 1L + array_position(win, mn)).as("pos"))
      })))
      .otherwise(transform(sequence(lit(1), size(h)), i =>
        struct(element_at(h, i).as("fp"), i.cast("long").as("pos"))))

  test("WinnowSelect == HOF composition on tie-heavy seeded arrays (all n, w)") {
    val rnd = new scala.util.Random(41)
    // Values from {0..5} force constant ties — the leftmost-min tie-break
    // and the distinct pass are exactly what the deque must not distort.
    val arrays = (1 to 40).map(n => Seq.fill(n)(rnd.nextInt(6).toLong)) ++
      Seq(Seq.fill(12)(3L),                         // all-equal: one selection per run
          (1L to 12L).toSeq, (12L to 1L by -1).toSeq) // sorted both ways
    for (w <- Seq(1, 4, 8)) {
      val df = arrays.toDF("h")
        .select(newSel(col("h"), w).as("n"), oldSel(col("h"), w).as("o"))
      val bad = df.where(not(col("n") <=> col("o"))).count()
      assert(bad == 0L, s"w=$w: $bad arrays diverge from the composition")
    }
  }

  test("WinnowSelect: empty array selects nothing; leftmost tie pinned by hand") {
    val out = Seq((Seq.empty[Long], 1), (Seq(5L, 2L, 9L, 2L, 7L), 2))
      .toDF("h", "tag")
      .select(col("tag"), newSel(col("h"), 3).as("s"))
      .as[(Int, Seq[(Long, Long)])].collect().toMap
    assert(out(1) == Seq.empty)
    // windows of [5,2,9,2,7] w=3: [5,2,9]->(2,2) [2,9,2]->(2,2 leftmost)
    // [9,2,7]->(2,4): distinct pairs in first-occurrence order.
    assert(out(2) == Seq((2L, 2L), (2L, 4L)))
  }
}
