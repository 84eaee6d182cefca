package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical loader for the driver's `events` table.
  *
  * Every engine entry point that touches `events.parquet` goes through this
  * loader, which normalizes the `ts` column to Long epoch-nanos whatever
  * physical type the file carries (TIMESTAMP(NANOS)-as-long, TimestampType,
  * or the pandas-default naive TimestampNTZ) — see
  * [[graft.functions.Conversions.tsToLongNanos]] for the dispatch and the
  * reference-parity argument (`/root/reference/src/transform.py:63-87`).
  *
  * Centralizing the read means a testdata regeneration that changes the
  * physical timestamp type can never again fail 30 queries at analysis
  * time: the type contract is resolved here, once, at plan time.
  */
object EventsTable {
  def load(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.Conversions.normalizeTsNanos(
      spark.read.parquet(s"$sfDir/events.parquet"), "ts")
}
