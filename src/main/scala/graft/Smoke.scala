package graft

/** Replicates the driver's t1 smoke: SparkEntry.entry rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"""{"smoke_rows":$n,"columns":"${df.columns.mkString(",")}"}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
