package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    // Warm the executor/codegen paths AND the parquet scan machinery (footer
    // decode, page cache, vectorized reader codegen) so the alphabetically
    // first query's time is its own, not the JVM's.
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    Seq("events", "documents", "embeddings", "orders", "lineitem").foreach { t =>
      // Tolerant like the query loop below: a partial dataset dir should
      // degrade that table's queries, not abort the whole bench.
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // Optional positional args = run only these queries (local iteration aid;
    // the driver invokes with no args and gets the full suite).
    val only = args.toSet
    val selected = if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(q => only(q._1))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
