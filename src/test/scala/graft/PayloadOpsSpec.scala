package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.PayloadOps

class PayloadOpsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("user", StructType(Seq(
      StructField("id", LongType),
      StructField("secret", StringType)))),
    StructField("items", ArrayType(StructType(Seq(
      StructField("sku", LongType),
      StructField("price", DoubleType)))))))

  private val jsonRow =
    """{"k":1,"user":{"id":7,"secret":"x"},"items":[{"sku":10,"price":1.5},{"sku":11,"price":2.5}]}"""

  private def payload(drops: Seq[String], flags: Seq[String]) =
    Seq(jsonRow).toDF("v")
      .select(PayloadOps(from_json(col("v"), schema), schema, drops, flags).as("p"))
      .select(to_json(col("p")))
      .as[String].head()

  test("splitPath normalizes array indices away (reference regex semantics)") {
    assert(PayloadOps.splitPath("a[0].b[12].c") == List("a", "b", "c"))
    assert(PayloadOps.splitPath("a-b-c", "-") == List("a", "b", "c"))
  }

  test("F1 drop of a struct-nested field") {
    assert(payload(Seq("user.secret"), Nil) ==
      """{"k":1,"user":{"id":7},"items":[{"sku":10,"price":1.5},{"sku":11,"price":2.5}]}""")
  }

  test("F1 drop inside an array of structs applies to every element") {
    assert(payload(Seq("items.price"), Nil) ==
      """{"k":1,"user":{"id":7,"secret":"x"},"items":[{"sku":10},{"sku":11}]}""")
  }

  test("F1 unresolvable path is a no-op (reference pop-with-default)") {
    assert(payload(Seq("nope.deep"), Nil) == jsonRow)
  }

  test("F2 flag replaces values with 0/1 presence, incl. inside arrays") {
    assert(payload(Nil, Seq("user.secret", "items.price")) ==
      """{"k":1,"user":{"id":7,"secret":1},"items":[{"sku":10,"price":1},{"sku":11,"price":1}]}""")
  }

  test("F2 flags null as 0") {
    val row = """{"k":1,"user":{"id":7,"secret":null},"items":[]}"""
    val got = Seq(row).toDF("v")
      .select(PayloadOps(from_json(col("v"), schema), schema, Nil, Seq("user.secret")).as("p"))
      .select(col("p.user.secret")).as[Int].head()
    assert(got == 0)
  }

  test("drops compose: schema tracking keeps later paths resolving") {
    assert(payload(Seq("user.secret", "items.price"), Seq("k")) ==
      """{"k":1,"user":{"id":7},"items":[{"sku":10},{"sku":11}]}""")
  }

  test("resultSchema mirrors the expression rewrite") {
    val rs = PayloadOps.resultSchema(schema, Seq("items.price"), Seq("user.secret"))
    val items = rs("items").dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(items.fieldNames.toSeq == Seq("sku"))
    val user = rs("user").dataType.asInstanceOf[StructType]
    assert(user("secret").dataType == IntegerType)
  }
}
