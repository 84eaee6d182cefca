package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shim

import graft.expressions.JaroWinkler

/** Entity resolution / record linkage: blocked candidate generation with a
  * Jaro–Winkler verify — the fuzzy-match counterpart of the exact and
  * n-gram dedup families ([[Dedup]]).
  *
  * The standard two-stage shape: a cheap BLOCKING key prunes the O(n²)
  * pair space to within-block pairs, then the expensive string similarity
  * runs only on candidates. Blocking is recall-lossy by design (pairs
  * disagreeing on the key are never compared) — callers pick keys with
  * that contract in mind (first byte, phonetic bucket, sorted-token
  * prefix, …).
  */
object Linkage {

  /** Jaro–Winkler similarity as a Column (native codegen'd expression —
    * see [[graft.expressions.JaroWinkler]] for the pinned byte-level
    * semantics, equivalence-tested against DuckDB's
    * `jaro_winkler_similarity`).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    Shim.column(JaroWinkler(Shim.expression(a), Shim.expression(b)))

  /** Within-block fuzzy pairs: all (a < b) record pairs sharing
    * `blockKey`, kept when `jaroWinkler(name_a, name_b) >= threshold`.
    * Returns `(id_a, id_b, name_a, name_b, jw)` with `jw` rounded to 6 dp
    * for gate hashing.
    *
    * Scale shape: the self-join is keyed on the block (one exchange per
    * side, hash join within block); the pair expansion is bounded by a
    * LOUD `maxBlock` guard — a hot block (every record blocking to one
    * key) is a config error that must fail, not a silent quadratic job.
    * The guard rides the build side as a windowless block-count join, and
    * `raise_error` fires on the first offending pair — the same
    * load-bearing-guard discipline as [[Basket.pairRules]] and the
    * embedding block verify.
    */
  def fuzzyPairs(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      threshold: Double = 0.8,
      maxBlock: Int = 10000): DataFrame = {
    val blocked = records
      .select(col(idCol).as("_id"), col(nameCol).as("_name"), blockKey.as("_bk"))
    val sizes = blocked.groupBy(col("_bk")).agg(count(lit(1)).as("_bn"))
    val a = blocked.select(col("_bk"), col("_id").as("id_a"), col("_name").as("name_a"))
    val b = blocked.select(col("_bk"), col("_id").as("id_b"), col("_name").as("name_b"))
    a.join(b, "_bk").where(col("id_a") < col("id_b"))
      .join(sizes, "_bk")
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        when(col("_bn") > maxBlock,
          raise_error(concat(lit(s"linkage block exceeds maxBlock=$maxBlock: key "),
            col("_bk").cast("string"))))
          .otherwise(round(jaroWinkler(col("name_a"), col("name_b")), 6)).as("jw"))
      .where(col("jw") >= threshold)
  }
}
