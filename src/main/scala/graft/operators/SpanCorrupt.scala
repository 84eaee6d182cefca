package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style SPAN CORRUPTION (Raffel et al. 2020, §3.1.4 — the masked-span
  * denoising objective): turn each document into an `(input, target)`
  * pretraining pair by cutting non-overlapping token spans and replacing
  * each with a numbered sentinel; the target is the sentinel-delimited
  * concatenation of the cut spans. The op that turns a CURATED corpus into
  * MODEL-CONSUMABLE examples — the last step of a training-data pipeline.
  *
  * Determinism (the whole point of doing this in the engine, not the data
  * loader): span placement is a pure content-hash function of
  * `(id, span index)` — every engine, run, retry, and re-partitioning
  * produces the same pairs, so a resumed training job sees the same data.
  * Placement: `nSpans = floor(n·rate/spanLen)` spans, one per equal token
  * segment, offset within its segment by `md5(id:k) mod (segLen−spanLen+1)`
  * — non-overlapping BY CONSTRUCTION (no rejection loop to replay).
  *
  * Scale shape: a shuffle-free per-row projection the scan absorbs — pure
  * Column/HOF math, no UDF, no state. Every derived quantity (token array,
  * counts, span starts) is materialized as a REAL column before any lambda
  * references it: interpreted HOF lambdas re-evaluate outer EXPRESSION
  * trees per element (the O(n²) trap), but attribute references are plain
  * row reads.
  */
object SpanCorrupt {

  def spanCorrupt(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanLen: Int = 3,
      rate: Double = 0.15): DataFrame = {
    require(spanLen > 0, "spanLen must be positive")
    require(rate > 0.0 && rate < 1.0, "rate must be in (0,1)")
    val sentinel = (k: Column) => concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    val withToks = df
      .withColumn("_toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      // floor over exact double math (n < 2^53): engines agree bit-for-bit
      .withColumn("_ns", floor(col("_n").cast("double") * lit(rate) / lit(spanLen.toDouble)).cast("long"))
      .withColumn("_seg",
        when(col("_ns") > 0, floor(col("_n").cast("double") / col("_ns")).cast("long"))
          .otherwise(lit(0L)))
    val withStarts = withToks.withColumn("_starts",
      when(col("_ns") > 0,
        transform(sequence(lit(0L), col("_ns") - 1), k =>
          k * col("_seg") + pmod(
            Dedup.hash32(concat(col(idCol).cast("string"), lit(":"), k.cast("string"))),
            greatest(col("_seg") - spanLen + 1, lit(1L)))))
        .otherwise(array().cast("array<bigint>")))
    // Position classification against the (tiny) span-start list: span k
    // covers 1-based tokens (start_k, start_k + spanLen]; the sentinel
    // index at a span start is its segment index — spans cannot cross
    // segment boundaries (offset ≤ segLen − spanLen).
    val inputToks = flatten(transform(sequence(lit(1L), col("_n")), i =>
      when(exists(col("_starts"), s => i === s + 1),
        array(sentinel(floor((i - 1).cast("double") / col("_seg")).cast("long"))))
        .when(exists(col("_starts"), s => i > s && i <= s + spanLen),
          array().cast("array<string>"))
        .otherwise(array(element_at(col("_toks"), i.cast("int"))))))
    val targetToks = flatten(transform(sequence(lit(0L), col("_ns") - 1), k =>
      concat(array(sentinel(k)),
        slice(col("_toks"), (element_at(col("_starts"), (k + 1).cast("int")) + 1).cast("int"),
          lit(spanLen)))))
    withStarts.select(col(idCol),
      array_join(inputToks, " ").as("input_text"),
      when(col("_ns") > 0, array_join(targetToks, " ")).otherwise(lit("")).as("target_text"),
      col("_ns").as("n_spans"))
  }
}
