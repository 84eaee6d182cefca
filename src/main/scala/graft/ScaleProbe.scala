package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Manual scale probe (not part of the driver contract or the test suite):
  * replicates the sf0.1 documents table `xN` with disjoint id spaces and runs
  * the heavy dedup path — minhash-LSH pairs → connected components — to
  * check that the plans HOLD as data grows: shuffle volumes scale linearly,
  * no aggregation buffer grows with corpus size, the CC iteration count
  * stays put (cluster structure replicates with the data).
  *
  * `runMain graft.ScaleProbe [factor]` — prints one timing line per stage.
  * Replication multiplies every near-dup cluster by N (each copy is disjoint
  * by construction), which is exactly the hostile shape for bucket-bounded
  * dedup: more buckets, same bucket sizes.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = base.count()
    val big = (0 until factor).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 10 * n)).as("doc_id"),
        // Perturb each replica's text so replicas are near-dups only WITHIN
        // a replica (suffix token differs) — total docs grow xN while every
        // cluster keeps its original size, the linear-scaling shape.
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ union _)
    println(s"[probe] docs = ${n * factor} (factor $factor)")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val pairs = timed("minhash pairs materialize") {
      val p = Dedup.minHashLshPairs(big, "doc_id", "text").localCheckpoint(true)
      println(s"[probe] pairs = ${p.count()}")
      p
    }
    timed("connected components") {
      val c = Dedup.connectedComponents(pairs)
      println(s"[probe] clustered ids = ${c.count()}, clusters = ${c.select("component").distinct().count()}")
    }
    timed("decontaminate") {
      val d = Dedup.decontaminate(big, "doc_id", "text",
        big.where(col("doc_id") % 97 === 0), "doc_id", "text")
      println(s"[probe] contaminated = ${d.where(col("contaminated") === 1).count()}")
    }
    spark.stop()
  }
}
