package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robust JSONL (newline-delimited JSON) corpus ingestion — the crawl-dump
  * shape every training-data pipeline starts from: schema-EXPLICIT
  * `spark.read.json` (an inferred schema is a full extra pass over 100 TB
  * and drifts run-to-run on dirty data), PERMISSIVE parse with the corrupt
  * raw line preserved in a dedicated channel, and a strict-cast projection
  * to the declared column types.
  *
  * The reference's JSON deserializer routes malformed payloads to an error
  * channel instead of failing the batch
  * (`/root/reference/src/kafka_source.py:96-118`); this applies the same
  * degrade-don't-fail contract at the FILE-corpus level — one mangled line
  * in a terabyte shard must cost one row, not the shard.
  *
  * Scale notes: text-file splits parallelize by HDFS block regardless of
  * line count; the parse is per-row codegen'd `from_json`; nothing here
  * shuffles. Pair with a `repartition` only when downstream needs keyed
  * co-location.
  */
object JsonlSource {

  val corruptField = "_graft_corrupt"

  /** Read `path` as JSONL against an explicit schema. Returns the declared
    * columns plus `_graft_corrupt` (the raw line when the row failed to
    * parse or failed the declared types, else NULL). Callers split the
    * stream on `_graft_corrupt IS NULL` — same channel discipline as the
    * envelope's ST5.
    *
    * `from_json` over `spark.read.text` rather than `spark.read.json`:
    * the text relation keeps the RAW line column alongside the parse, so
    * the corrupt channel carries evidence (the exact offending bytes) —
    * `spark.read.json`'s own columnNameOfCorruptRecord does the same, but
    * only in PERMISSIVE mode with no guarantee the line survives column
    * pruning; this form pins the contract in the plan itself.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(StructField(corruptField, StringType))
    val parsed = spark.read.text(path)
      .select(col("value").as("_raw"),
        from_json(col("value"), withCorrupt,
          Map("columnNameOfCorruptRecord" -> corruptField)).as("_p"))
    val cols = schema.fields.map(f => col(s"_p.${f.name}").as(f.name))
    // A line can parse as JSON but carry a wrong-typed field: PERMISSIVE
    // from_json nulls the field silently. Treat a row as corrupt when the
    // parser flagged it; silent per-field nulls stay per-field (the
    // downstream quality battery owns null-rate policy) — matching
    // spark.read.json semantics exactly.
    val corrupt = when(col(s"_p.$corruptField").isNotNull, col("_raw"))
    parsed.select(cols :+ corrupt.as(corruptField): _*)
  }
}
