package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Numeric policy: every reduction is a strict left fold over
  * double-promoted elements (`aggregate(zip_with(...))`), so the result is
  * bit-identical in any IEEE-754 engine that folds in element order — the
  * DuckDB oracle reproduces scores exactly, no epsilon comparisons needed.
  *
  * Scale policy: the brute-force path broadcasts the (small) query set and
  * scans the corpus once — a BroadcastNestedLoopJoin with no shuffle of the
  * big side; the LSH path buckets both sides by deterministic sign-bits so
  * the join is a keyed equi-join (shuffle or broadcast by bucket) touching
  * only same-bucket candidates — the 100 TB path.
  */
object Similarity {

  /** Strict-fold dot product, elements promoted to double before multiply. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm, same fold discipline. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Brute-force cosine top-k: exact baseline. `queries` is broadcast; the
    * corpus is scanned once per partition; ranking is a window over the
    * query id with a deterministic (score desc, id) tie-break.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** L2-normalize an embedding column (elements promoted to double). */
  def normalize(vec: Column): Column = {
    val nrm = norm(vec)
    transform(vec, x => x.cast("double") / nrm)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every corpus vector
    * to its nearest centroid (one broadcast pass — the "inverted lists");
    * each query probes only its `nProbe` closest cells and ranks candidates
    * within them.
    *
    * Scale shape: `centroids` is small and broadcast on both passes; the
    * corpus is scanned once for assignment (at 100 TB the assignment is a
    * write-time partitioning — `partitionBy(cell)` — and probes prune to
    * nProbe/nCells of the data via partition pruning); the probe join is a
    * keyed equi-join on the cell id. Deterministic ties: (score desc, id).
    */
  def topKIvf(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2): DataFrame = {
    val cent = broadcast(centroids.select(col(idCol).as("cid"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm")))
    def nearestCells(df: DataFrame, outId: String, outVec: String, outNorm: String, keep: Int) = {
      val scored = df.select(col(idCol).as(outId), col(vecCol).as(outVec), norm(col(vecCol)).as(outNorm))
        .join(cent)
        .withColumn("c_cos", cosine(col(outVec), col("c_vec"), col(outNorm), col("c_norm")))
      val w = Window.partitionBy(outId).orderBy(col("c_cos").desc, col("cid"))
      scored.withColumn("crank", row_number().over(w)).where(col("crank") <= keep)
        .drop("c_vec", "c_norm", "c_cos", "crank")
    }
    // Corpus cell ASSIGNMENT (keep = 1) is an argmax, not a ranking: a
    // map-side-combining `max(struct(score, -cid, payload))` aggregate, so
    // the ×nCells expansion collapses to one buffer per vector BEFORE the
    // shuffle — the row_number window formulation shuffles and sorts the
    // whole expansion. Tie-break matches the window's (score desc, cid asc)
    // via the negated-cid struct field.
    def assignCell(df: DataFrame, outId: String, outVec: String, outNorm: String) = {
      val scored = df.select(col(idCol).as(outId), col(vecCol).as(outVec), norm(col(vecCol)).as(outNorm))
        .join(cent)
        .withColumn("c_cos", cosine(col(outVec), col("c_vec"), col(outNorm), col("c_norm")))
      scored.groupBy(col(outId))
        .agg(max(struct(col("c_cos"), (-col("cid")).as("_negcid"), col("cid"),
          col(outVec), col(outNorm))).as("_m"))
        .select(col(outId), col("_m.cid").as("cid"),
          col(s"_m.$outVec").as(outVec), col(s"_m.$outNorm").as(outNorm))
    }
    val cells = assignCell(corpus, "neighbor_id", "c_vec2", "n_norm")
    val probes = nearestCells(queries, "query_id", "q_vec", "q_norm", keep = nProbe)
    val scored = cells.join(probes, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec2"), col("q_norm"), col("n_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic sign-bit LSH bucket: bit i set iff element i+1 > 0.
    * For zero-centered embeddings this is a random-hyperplane LSH with the
    * coordinate axes as hyperplanes — engine-reproducible with no stored
    * projection matrix.
    */
  def signBucket(vec: Column, nBits: Int = 8): Column =
    (0 until nBits).map { i =>
      when(element_at(vec, i + 1) > lit(0.0f), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed cosine top-k: both sides keyed by [[signBucket]]; the join
    * is a bucket equi-join so each query only scores its own bucket —
    * recall trades against the 2^nBits fan-out. At 100 TB the corpus side is
    * bucketed once (write-time partitioning) and the probe shuffles only the
    * query set.
    */
  def topKBucketed(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"), signBucket(col(vecCol), nBits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"), signBucket(col(vecCol), nBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
