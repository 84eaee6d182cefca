package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.Shim

/** SQL-name registration for graft's scalar conversions, so `spark.sql` text
  * can call them (`graft_str_code(...)` etc). Each registration is a plan-time
  * macro over built-in Catalyst expressions ([[Conversions]]) — no UDF object,
  * no codegen break. Mirrors the reference's `TRANSFORMS` registry
  * (`/root/reference/src/transform.py:112-119`) as an engine-level function
  * namespace.
  */
object GraftFunctions {

  private def fns1: Seq[(String, Column => Column)] = Seq(
    "graft_str_code" -> Conversions.strCode,
    "graft_date_no" -> Conversions.lenientDateOslo,
    "graft_unix_s_no" -> Conversions.unixSecondsOslo,
    "graft_unix_ms_no" -> Conversions.unixMillisOslo,
    "graft_bool_int" -> Conversions.boolToInt,
    "graft_datetime_no" -> Conversions.datetimeOslo,
    "graft_nanos_ts" -> Conversions.nanosToTimestamp,
    "graft_nanos_ms" -> Conversions.nanosToEpochMs,
    "graft_sha256" -> Conversions.sha256Hex,
    "graft_json_quote" -> Conversions.jsonQuote,
    "graft_py_json" -> (c => Conversions.pyJsonCanonical(c)),
    "graft_key_int64" -> Conversions.bigEndianLongKey,
    "graft_schema_id" -> Conversions.schemaId,
    // text-analysis surface (see [[TextAnalysis]])
    "graft_lang_id" -> TextAnalysis.langId,
    "graft_quality" -> TextAnalysis.qualityScore,
    "graft_n_tokens" -> TextAnalysis.nTokens,
    "graft_bpeish_count" -> TextAnalysis.bpeishCount,
    "graft_fingerprint" -> TextAnalysis.rollingFingerprint,
    "graft_simhash" -> (c => graft.operators.Dedup.simHash(c)),
    "graft_redact_pii" -> TextAnalysis.redactPii,
    "graft_nfc" -> Conversions.nfcNormalize)

  def register(spark: SparkSession): Unit = {
    fns1.foreach { case (name, f) =>
      Shim.registerColumnFunction(spark, name, 1, cs => f(cs.head))
    }
  }
}
