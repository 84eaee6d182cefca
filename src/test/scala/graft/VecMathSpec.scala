package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[graft.expressions.VecDot]] / [[graft.expressions.VecL2Sq]] must be
  * bit-identical to the interpreted `aggregate(zip_with(...))` composition
  * they replaced — including the null contract (null array, null element,
  * length mismatch) — because every similarity/dedup oracle was proven
  * against that composition's fold order.
  */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def hofL2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  test("VecDot/VecL2Sq == HOF composition bit-for-bit on random float vectors") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2f - 1f),
      Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.dot(col("a"), col("b")), hofDot(col("a"), col("b")),
      Similarity.l2sq(col("a"), col("b")), hofL2Sq(col("a"), col("b")))
      .as[(Double, Double, Double, Double)].collect()
    got.foreach { case (d1, d2, l1, l2) =>
      assert(java.lang.Double.doubleToLongBits(d1) == java.lang.Double.doubleToLongBits(d2))
      assert(java.lang.Double.doubleToLongBits(l1) == java.lang.Double.doubleToLongBits(l2))
    }
  }

  test("VecDot: double arrays and mixed float/double promote identically") {
    val df = Seq((Array(1.5f, -2.5f), Array(2.0, 3.0))).toDF("f", "d")
    val got = df.select(
      Similarity.dot(col("f"), col("d")),
      Similarity.dot(col("d"), col("d")),
      hofDot(col("f"), col("d"))).as[(Double, Double, Double)].head()
    assert(got._1 == 1.5 * 2.0 + (-2.5) * 3.0)
    assert(got._2 == 2.0 * 2.0 + 3.0 * 3.0)
    assert(got._1 == got._3)
  }

  test("VecDot null contract: null array, null element, length mismatch -> null") {
    val rows = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), None),                          // null array
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))),   // null element
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f)))))         // length mismatch
      .toDF("a", "b")
    val got = rows.select(Similarity.dot(col("a"), col("b")).as("d"),
      hofDot(col("a"), col("b")).as("h"))
      .as[(Option[Double], Option[Double])].collect()
    got.foreach { case (d, h) => assert(d.isEmpty && h.isEmpty) }
  }

  test("int8 quantization: codes in range, roundtrip error within scale/2, constant-vector edge") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(100)(Array.fill(64)(rnd.nextFloat() * 4f - 2f)) :+ Array.fill(64)(1.25f)
    val df = rows.toDF("v")
    val checked = df
      .select(Similarity.quantizeInt8(col("v")).as("q"),
        transform(col("v"), x => x.cast("double")).as("vd"))
      .select(
        aggregate(col("q.codes"), lit(true), (acc, c) => acc && c >= 0 && c <= 255).as("in_range"),
        aggregate(
          zip_with(Similarity.dequantizeInt8(col("q")), col("vd"), (d, x) => abs(d - x)),
          lit(0.0), (m, e) => greatest(m, e)).as("max_err"),
        col("q.scale").as("scale"))
      .as[(Boolean, Double, Double)].collect()
    checked.foreach { case (inRange, maxErr, scale) =>
      assert(inRange)
      assert(maxErr <= scale * 0.5000001)
    }
    // constant vector: scale 0, all codes 0, exact roundtrip
    val const = checked.last
    assert(const._3 == 0.0 && const._2 == 0.0)
  }

  test("VecDot: integral element arrays promote like the old cast-to-double composition") {
    // The zip_with composition tolerated array<int>/array<bigint> inputs via
    // its explicit cast("double"); the native expression must keep that
    // tolerance instead of throwing mid-job.
    val df = Seq((Array(1, -2, 3), Array(100000000000L, 2L, 3L))).toDF("i", "l")
    val got = df.select(
      Similarity.dot(col("i"), col("l")),
      hofDot(col("i"), col("l")),
      Similarity.l2sq(col("i"), col("i"))).as[(Double, Double, Double)].head()
    assert(java.lang.Double.doubleToLongBits(got._1) == java.lang.Double.doubleToLongBits(got._2))
    assert(got._3 == 0.0)
  }

  test("VecDot: non-numeric array input fails at analysis time, not mid-job") {
    val df = Seq((Array("a", "b"), Array(1.0, 2.0))).toDF("s", "d")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Similarity.dot(col("s"), col("d"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }

  test("dequantizeInt8 composes inline over quantizeInt8 (non-attribute argument)") {
    // Regression shape for the letBound routing: the argument here is the
    // whole quantize expression, not a column attribute.
    val df = Seq(Array(0.5f, -1.5f, 2.5f)).toDF("v")
    val errs = df.select(
      zip_with(Similarity.dequantizeInt8(Similarity.quantizeInt8(col("v"))),
        transform(col("v"), _.cast("double")),
        (d, x) => abs(d - x)).as("e"),
      Similarity.quantizeInt8(col("v")).getField("scale").as("s"))
      .select(aggregate(col("e"), lit(0.0), (m, e) => greatest(m, e)), col("s"))
      .as[(Double, Double)].head()
    assert(errs._1 <= errs._2 * 0.5000001)
  }

  test("VecDot survives both codegen and interpreted eval paths") {
    // Interpreted path: filter on the expression forces eval() in places
    // codegen can't reach (e.g. literal folding in the optimizer).
    val df = Seq((Array(3.0f, 4.0f))).toDF("v")
    val viaCodegen = df.select(Similarity.norm(col("v"))).as[Double].head()
    assert(viaCodegen == 5.0)
    val viaFilter = df.where(Similarity.norm(col("v")) > 4.9).count()
    assert(viaFilter == 1L)
  }

  test("VecDot actually compiles into whole-stage codegen (no interpreted fallback)") {
    // The entire point of the expression is escaping the interpreted HOF
    // path — assert the generated Java calls the impl directly instead of
    // trusting that doGenCode was reached.
    val df = spark.range(4).selectExpr("array(cast(id as float), 1.0f) AS v")
      .select(Similarity.dot(col("v"), col("v")).as("d"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.executedPlan)
    assert(gen.contains("VecMathImpl.dot"), s"generated code missing direct impl call:\n$gen")
  }
}
