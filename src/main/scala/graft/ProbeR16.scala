package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY round-16 measurement probe (deleted before close): winnowing
  * pair-expansion cardinalities at sf0.1 — postings, ΣC(df,2), distinct
  * pairs, n_shared histogram — to size the two-level counting rework.
  */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    val k = 12; val w = 8; val maxDf = 1000
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] docs=${docs.count()}")
    val fps = graft.operators.Dedup.winnowingFingerprints(docs, "doc_id", "text", k, w)
      .localCheckpoint(true)
    println(s"[probe] postings=${fps.count()}  distinct_fp=${fps.select("fp").distinct().count()}")
    val dfc = fps.groupBy("fp").agg(count(lit(1)).as("_df"))
      .where(col("_df") >= 2 && col("_df") <= maxDf)
      .localCheckpoint(true)
    println(s"[probe] kept_fps=${dfc.count()}")
    val sums = dfc.agg(sum(col("_df")).as("postings_kept"),
      sum(col("_df") * (col("_df") - 1) / 2).as("sum_c_df_2")).collect()(0)
    println(s"[probe] postings_in_kept=${sums.get(0)}  sum_C(df,2)=${sums.get(1)}")
    // df histogram (top mass contributors)
    dfc.groupBy("_df").agg(count(lit(1)).as("n_fps"),
        (first(col("_df")) * (first(col("_df")) - 1) / 2 * count(lit(1))).as("pair_rows"))
      .orderBy(desc("pair_rows")).show(20, false)
    // distinct pairs + n_shared histogram
    val pairs = graft.operators.Dedup.winnowingPairs(docs, "doc_id", "text", k, w, 1, maxDf)
      .localCheckpoint(true)
    println(s"[probe] distinct_pairs=${pairs.count()}")
    pairs.groupBy(when(col("n_shared") >= 40, lit(40)).otherwise(col("n_shared")).as("ns"))
      .agg(count(lit(1)).as("n_pairs")).orderBy("ns").show(45, false)
    spark.stop()
  }
}
