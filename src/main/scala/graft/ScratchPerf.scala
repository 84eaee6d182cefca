package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

// Dev scratch — micro-timings for the shingle pipeline (deleted before commit).
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    docs.count(); docs.count() // warm page cache

    val parallelism = 32
    def toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("_ws"))
      .repartition(parallelism, col("doc_id"))

    val inlined = toks
      .select(col("doc_id"), array_distinct(Dedup.shinglesOf(col("_ws"), 3)).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("s"))
    time("inlined: explode(array_distinct(...))")(inlined.count())
    inlined.explain("formatted")

    time("repeat: explode raw shingles") {
      toks.select(col("doc_id"), explode(Dedup.shinglesOf(col("_ws"), 3)).as("s")).count()
    }
    time("repeat: explode + distinct agg") {
      toks.select(col("doc_id"), explode(Dedup.shinglesOf(col("_ws"), 3)).as("s")).distinct().count()
    }
    // repartition between projection and explode = collapse barrier
    time("barrier via repartition after arr") {
      docs.select(col("doc_id"), array_distinct(Dedup.shinglesOf(Dedup.tokens(col("text")), 3)).as("arr"))
        .repartition(parallelism, col("doc_id"))
        .select(col("doc_id"), explode(col("arr")).as("s")).count()
    }
    spark.stop()
  }
}
