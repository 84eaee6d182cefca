package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.K6FilterConfig

/** J1/J2 — the reference's two (Oracle-delegated) joins, re-expressed as
  * Spark joins with explicit scale strategy.
  */
object Joins {

  /** J1: K6/K7 privacy screening (`/root/reference/src/oracle_target.py:53-93`).
    *
    * Semantics: a row whose person-id appears in the screening dimension with
    * a validity interval containing the row's (day-truncated) timestamp gets
    * `kafka_message := NULL` — masked, never dropped.
    *
    * Scale shape: ONE pass over the batch. The dimension (pre-filtered to
    * `skjermet_kode IN (6,7)` — pushed to the JDBC source when it is one) is
    * aggregated to one row per person carrying its validity intervals as an
    * array, then joined on person-id alone; interval containment is an
    * `exists(...)` over that (tiny) array in the projection. One dim row per
    * pid means NO row multiplication from overlapping validity rows, and
    * nothing data-dependent is ever broadcast — the earlier shape probed a
    * distinct (pid, day) set (second scan of the batch subplan) and broadcast
    * the resulting hit set back.
    *
    * `broadcastDim = true` (default) pins the broadcast — correct while the
    * screened population is small, which it is by construction. If it ever
    * is not, pass false: the join runs as a plain equi-join on pid (shuffle,
    * AQE still free to convert back to broadcast at runtime).
    *
    * Divergence (documented, deliberate): the reference probes with the LAST
    * message's timestamp for the whole batch (`src/oracle_target.py:56-57`);
    * graft evaluates the interval per-row, which is order-independent — the
    * only semantics that is well-defined under distributed execution.
    */
  def k6Mask(
      batch: DataFrame,
      dim: DataFrame,
      cfg: K6FilterConfig,
      payloadField: String = "payload",
      broadcastDim: Boolean = true): DataFrame = {
    val pid = {
      val segs = PayloadOps.splitPath(cfg.col, cfg.colKeypathSeparator)
      segs.foldLeft(col(payloadField))((c, s) => c.getField(s)).cast("string")
    }
    val day = date_trunc("DAY", timestamp_millis(col(cfg.timestamp)))
    val dimAgg0 = dim.groupBy(dim(cfg.filterCol).cast("string").as("_pid"))
      .agg(collect_list(struct(
        dim("gyldig_fra_dato").as("fra"), dim("gyldig_til_dato").as("til"))).as("_ivals"))
    val dimAgg = if (broadcastDim) broadcast(dimAgg0) else dimAgg0
    val screened = exists(col("_ivals"),
      i => day.between(i.getField("fra"), i.getField("til")))
    batch
      .join(dimAgg, pid === col("_pid"), "left_outer")
      .withColumn("kafka_message",
        when(col("_ivals").isNotNull && screened, lit(null).cast("string")).otherwise(col("kafka_message")))
      .drop("_pid", "_ivals")
  }

  /** J2: `skip-duplicates-with` (`/root/reference/src/oracle_target.py:99-104`) —
    * insert only rows with no existing match on the key column set, and (like
    * the reference's row-by-row NOT EXISTS inside one transaction) drop
    * intra-batch duplicates too.
    *
    * Documented divergence: among intra-batch rows sharing a key but
    * differing in non-key columns, the reference keeps the FIRST in consume
    * order; `dropDuplicates` keeps an arbitrary one — "first" is undefined
    * under distributed consumption, and the reference's own dedup keys
    * (partition/offset/topic or content hash) make colliding rows identical
    * anyway.
    *
    * Scale shape: both sides shuffle on the key columns — the correct plan
    * when `existing` is the full sink table; when the existing key set is
    * known-small, pass `broadcastExisting = true` to pin a broadcast
    * anti-join. With AQE on, a small filtered `existing` converts to
    * broadcast at runtime anyway.
    */
  def dedupAgainst(
      batch: DataFrame,
      existing: DataFrame,
      keys: Seq[String],
      broadcastExisting: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "skip-duplicates-with requires at least one key column")
    val ex0 = existing.select(keys.map(col): _*).dropDuplicates(keys)
    val ex = if (broadcastExisting) broadcast(ex0) else ex0
    batch.dropDuplicates(keys).join(ex, keys, "left_anti")
  }

  /** Key equality helper for tests: the join condition `dedupAgainst` uses. */
  def keyCond(l: DataFrame, r: DataFrame, keys: Seq[String]): Column =
    keys.map(k => l(k) <=> r(k)).reduce(_ && _)
}
