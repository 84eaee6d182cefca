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

  /** Strict-fold dot product, elements promoted to double before multiply.
    * Native codegen'd [[graft.expressions.VecDot]] — bit-identical to the
    * `aggregate(zip_with(...))` composition it replaces (same left fold,
    * same null contract) but a primitive loop instead of the interpreted
    * boxed HOF path.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(graft.expressions.VecDot(Shim.expression(a), Shim.expression(b)))
  }

  /** L2 norm = sqrt(dot(a, a)): the self-dot is the same fold sequence
    * (acc + aᵢ·aᵢ in element order) as the `transform(x*x)` + aggregate it
    * replaces, so results stay bit-exact.
    */
  def norm(a: Column): Column = sqrt(dot(a, a))

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
    // Bounded top-k aggregate, NOT a rank window: the window formulation
    // shuffles and sorts every (query, corpus) scored pair — O(Q×C) rows
    // through the exchange — while TopKAgg's k-capped partial buffers move
    // only O(Q × k × partitions). Tie order (cosine DESC, neighbor_id ASC)
    // is encoded as lexicographic-largest over (cosine, -neighbor_id).
    TopK.topKPerKeyRanked(scored, Seq("query_id"),
        struct(col("cosine"), (-col("neighbor_id")).as("_negid"), col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** HARD-NEGATIVE mining — the contrastive-training data op: for each
    * anchor (query), the `k` corpus items MOST similar while staying under
    * `dupCeiling` — similar enough to be hard, dissimilar enough not to be
    * the same content (a near-dup labeled negative poisons the loss; every
    * published retrieval recipe mines this band). The ceiling filter sits
    * BEFORE the rank window, so near-dup rows never enter the top-k state.
    *
    * Scale shape: identical to [[topK]] (anchors broadcast, corpus scanned
    * once, per-anchor top-k via the WindowGroupLimit-pruned rank window);
    * at corpus scale substitute IVF-probed candidates for the full scan —
    * the ceiling-then-rank composition is unchanged.
    */
  def mineHardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dupCeiling: Double): DataFrame = {
    require(k > 0, "k must be positive")
    require(dupCeiling > -1.0 && dupCeiling <= 1.0, "dupCeiling in (-1, 1]")
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
      .where(col("cosine") < dupCeiling)
    // Same bounded-agg shape as [[topK]]: the anchors×corpus scored stream
    // never reaches an exchange un-truncated.
    TopK.topKPerKeyRanked(scored, Seq("query_id"),
        struct(col("cosine"), (-col("neighbor_id")).as("_negid"), col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** TWO-STAGE int8 retrieval — the production memory-saving shape: stage 1
    * shortlists against the QUANTIZED corpus (1 byte/dim instead of 4 — at
    * 100 TB of embeddings that is the difference between in-memory and
    * not), stage 2 re-reads ONLY the shortlist's fp32 vectors through an
    * id-keyed join and re-ranks exactly. Asymmetric scoring (fp32 queries
    * vs dequantized corpus codes — the ADC convention) keeps the coarse
    * stage's error at one quantization step, so a `shortlistFactor` of a
    * few absorbs coarse-stage rank inversions; with the shortlist spanning
    * the corpus the result is exactly [[topK]] (asserted in spec).
    *
    * Scale shape: stage 1 is [[topK]]'s plan over the codes frame (queries
    * broadcast, one scan, WindowGroupLimit-pruned rank window); stage 2
    * touches `|queries| · k · shortlistFactor` rows — shortlist-sized, not
    * corpus-sized — via keyed joins the optimizer broadcasts when small.
    */
  def topKInt8Rescore(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlistFactor: Int = 4): DataFrame = {
    require(k > 0 && shortlistFactor > 0, "k and shortlistFactor must be positive")
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm")))
    // The coarse frame carries ONLY the codes struct — at scale this is the
    // compact index artifact; the fp32 vectors stay in the base table.
    val codes = corpus.select(col(idCol).as("neighbor_id"), quantizeInt8(col(vecCol)).as("_q8"))
    val coarse = codes.select(col("neighbor_id"), dequantizeInt8(col("_q8")).as("_v8"))
      .select(col("neighbor_id"), col("_v8"), norm(col("_v8")).as("_n8"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos8", cosine(col("q_vec"), col("_v8"), col("q_norm"), col("_n8")))
    val w1 = Window.partitionBy("query_id").orderBy(col("cos8").desc, col("neighbor_id"))
    val shortlist = coarse.withColumn("_rk", row_number().over(w1))
      .where(col("_rk") <= k * shortlistFactor)
      .select("query_id", "neighbor_id")
    val exact = shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm")), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w2 = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Margin-based cross-domain pair mining — the ratio-margin scorer of
    * Artetxe & Schwenk 2019 (the LASER/CCMatrix bitext-mining criterion):
    * a candidate pair (a, b) scores `cos(a,b) / ((avgK(a) + avgK(b)) / 2)`,
    * the cosine RELATIVE to each side's own k-NN neighborhood density.
    * Absolute-cosine thresholds fail on hubness (dense regions where
    * everything is cosine-0.8 to everything); the margin cancels that out,
    * which is why the published crawls mine with it. Emits, per left-side
    * vector, its best right-side partner with `margin ≥ threshold`.
    *
    * Scale shape: both directions ride [[topK]] unchanged (queries
    * broadcast, corpus scanned once, WindowGroupLimit-pruned rank window) —
    * at corpus scale substitute the IVF-probed shortlist ([[topKIvf]])
    * for the full scan, the margin rerank on top is identical. The
    * neighborhood averages fold over the rank-sorted k-list (k-bounded
    * arrays, exactly replayable — a bare `avg()` over doubles would not
    * be), and the final joins are id-keyed against shortlist-sized frames.
    */
  def marginMine(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4,
      threshold: Double = 1.0): DataFrame = {
    require(k > 0, "k must be positive")
    def avgOverK(shortlist: DataFrame, keyCol: String, outCol: String): DataFrame =
      shortlist.groupBy(col(keyCol))
        .agg(array_sort(collect_list(struct(col("rank"), col("cosine")))).as("_l"))
        .select(col(keyCol),
          (aggregate(col("_l"), lit(0.0), (acc, x) => acc + x.getField("cosine"))
            / size(col("_l")).cast("double")).as(outCol))
    // The forward shortlist feeds BOTH the neighborhood average and the
    // scored join. Left lazy, those are two identical exchange subtrees
    // whose dedup rides AQE exchange reuse — a RACE (round 15: the gate's
    // shuffle bytes flipped bimodally run-to-run as the reuse did or did
    // not fire; the same class as the r14 corpus-pipeline fix). The
    // shortlist is queries×k rows — bounded at any corpus size — so
    // materialize it once and make the reuse structural.
    val fwd = topK(left, right, idCol, vecCol, k).localCheckpoint(true)
    val bwd = topK(right, left, idCol, vecCol, k)
    val avgL = avgOverK(fwd, "query_id", "avg_l")
    val avgR = avgOverK(bwd, "query_id", "avg_r")
    val scored = fwd
      .join(avgL, Seq("query_id"))
      .join(avgR.withColumnRenamed("query_id", "neighbor_id"), Seq("neighbor_id"))
      .withColumn("margin", col("cosine") / ((col("avg_l") + col("avg_r")) / 2))
    val w = Window.partitionBy("query_id").orderBy(col("margin").desc, col("neighbor_id"))
    scored.withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1 && col("margin") >= threshold)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        round(col("margin"), 6).as("margin"))
  }

  /** Bind `v` once as a lambda variable for `body` — the let-binding trick
    * over a 1-element array transform. HOF lambdas are interpreted with NO
    * common-subexpression elimination, so any outer Column referenced
    * inside a per-element lambda re-evaluates PER ELEMENT; an O(dims)
    * reduction used inside an O(dims) transform silently becomes O(dims²)
    * per row. Lambda-variable reads are cheap, so routing the value
    * through `transform(array(v), bound => …)[1]` restores O(dims).
    */
  private[operators] def letBound(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), bound => body(bound)), 1)

  /** L2-normalize an embedding column (elements promoted to double). */
  def normalize(vec: Column): Column =
    letBound(norm(vec)) { nrm => transform(vec, x => x.cast("double") / nrm) }

  /** Per-vector int8 SCALAR quantization — the storage-side companion of
    * PQ (4× smaller than float32 with one affine map per vector; the
    * standard first compression step before a trained codebook exists).
    * Returns `struct(mn, scale, codes)` with `code = floor((x−mn)/scale
    * + 0.5)` ∈ [0, 255] — floor(+0.5) instead of round() because
    * half-even vs half-up rounding differs across engines and this exact
    * formula is replayable anywhere. A constant vector (scale 0) encodes
    * as all-zero codes.
    */
  def quantizeInt8(vec: Column): Column = {
    val vd = transform(vec, x => x.cast("double"))
    val mn = array_min(vd)
    val scale = (array_max(vd) - mn) / lit(255.0)
    // mn/scale are let-bound: inlined into the per-element lambda they
    // would re-run the array_min/array_max reductions per ELEMENT (O(dims²)
    // per vector — measured 3.7 s on the sf0.1 gate vs ~1 s bound).
    letBound(struct(mn.as("mn"), scale.as("scale"))) { ms =>
      val (m, s) = (ms.getField("mn"), ms.getField("scale"))
      struct(
        m.as("mn"),
        s.as("scale"),
        transform(vd, x =>
          when(s === 0.0, lit(0L))
            .otherwise(floor((x - m) / s + lit(0.5))).cast("int")).as("codes"))
    }
  }

  /** Inverse of [[quantizeInt8]]: `mn + code·scale`, max error scale/2.
    * `q` rides [[letBound]]: referenced inside the per-element lambda, a
    * non-attribute argument (e.g. an inline `quantizeInt8(v)`) would
    * otherwise re-evaluate — reductions included — per element.
    */
  def dequantizeInt8(q: Column): Column =
    letBound(q) { qq =>
      transform(qq.getField("codes"),
        c => qq.getField("mn") + c.cast("double") * qq.getField("scale"))
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
      nProbe: Int = 2): DataFrame =
    topKIvfPrebuilt(queries, assignCells(corpus, centroids, idCol, vecCol),
      centroids, idCol, vecCol, k, nProbe)

  private def centFrame(centroids: DataFrame, idCol: String, vecCol: String): DataFrame =
    broadcast(centroids.select(col(idCol).as("cid"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm")))

  /** Corpus → cell assignment (the IVF "inverted lists"), exposed so the
    * write-time layout path can persist it once: `assignCells(...).write
    * .partitionBy("cid").parquet(...)` gives probes partition pruning — at
    * 100 TB each query touches nProbe/nCells of the files, the point of IVF.
    *
    * The assignment (keep = 1) is an argmax, not a ranking: a
    * map-side-combining `max(struct(score, -cid, payload))` aggregate, so
    * the ×nCells expansion collapses to one buffer per vector BEFORE the
    * shuffle — a row_number window formulation would shuffle and sort the
    * whole expansion. Tie-break matches the probe window's (score desc,
    * cid asc) via the negated-cid struct field. Returns
    * (idCol, cid, vecCol, `_nrm`).
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cent = centFrame(centroids, idCol, vecCol)
    // Corpus columns aliased BEFORE the join: idCol/vecCol named like the
    // centroid frame's internals (cid/c_vec/c_norm) would otherwise be
    // ambiguous after it.
    corpus.select(col(idCol).as("_aid"), col(vecCol).as("_avec"), norm(col(vecCol)).as("_anrm"))
      .join(cent)
      .withColumn("c_cos", cosine(col("_avec"), col("c_vec"), col("_anrm"), col("c_norm")))
      .groupBy(col("_aid"))
      .agg(max(struct(col("c_cos"), (-col("cid")).as("_negcid"), col("cid"),
        col("_avec"), col("_anrm"))).as("_m"))
      .select(col("_aid").as(idCol), col("_m.cid").as("cid"),
        col("_m._avec").as(vecCol), col("_m._anrm").as("_nrm"))
  }

  /** INCREMENTAL IVF index maintenance: assign ONLY the new batch to the
    * existing centroids and append to the stored cell assignment — the
    * daily-ingest shape (with the `partitionBy("cid")` layout this is an
    * append of the batch's cells, touching no existing file). Because the
    * cell assignment is a pure per-row argmax against fixed centroids,
    * append-then-search is EXACTLY rebuild-then-search (asserted in spec
    * and by the gate sharing the full-rebuild oracle) — until centroid
    * drift warrants retraining, which is a measured decision
    * ([[trainCentroids]]), not a forced rebuild per batch.
    */
  def ivfAppend(
      index: DataFrame,
      batch: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    index.unionByName(assignCells(batch, centroids, idCol, vecCol))

  /** IVF probe over a PREBUILT cell assignment (from [[assignCells]], fresh
    * or read back from a `partitionBy("cid")` layout): queries rank their
    * `nProbe` nearest cells and score only those cells' members — with the
    * partitioned layout, a partition-PRUNED scan: the distinct probed cell
    * ids are collected to the driver (bounded by the coarse-codebook size —
    * nCells ≈ √N, never the corpus; same O(small) justification as
    * Packing's bucket rollup) and pushed as a static `cid IN (...)` filter.
    * Spark's dynamic partition pruning does NOT fire for this join shape
    * (measured: the probe scanned every cell file without the static
    * filter), so relying on it would silently read the whole layout.
    */
  def topKIvfPrebuilt(
      queries: DataFrame,
      assigned: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2): DataFrame = {
    val cent = centFrame(centroids, idCol, vecCol)
    val probes = {
      val scored = queries
        .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
        .join(cent)
        .withColumn("c_cos", cosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
      val w = Window.partitionBy("query_id").orderBy(col("c_cos").desc, col("cid"))
      scored.withColumn("crank", row_number().over(w)).where(col("crank") <= nProbe)
        .drop("c_vec", "c_norm", "c_cos", "crank")
        // Materialized once: consumed by the driver-side cell collect AND the
        // scoring join — without it the query-ranking subplan runs twice.
        .localCheckpoint(true)
    }
    val probedCells = probes.select("cid").distinct().collect().map(_.get(0))
    val cells = assigned.where(col("cid").isin(probedCells: _*))
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).as("c_vec2"), col("_nrm").as("n_norm"), col("cid"))
    val scored = cells.join(probes, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec2"), col("q_norm"), col("n_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Distributed spherical k-means (Lloyd's) — TRAINS the IVF coarse
    * quantizer instead of assuming centroids are given, completing the ANN
    * story end-to-end (train → [[assignCells]] → `partitionBy(cid)` layout →
    * [[topKIvfPrebuilt]] pruned probe).
    *
    * Determinism (this is a GATED operator, not a heuristic): seeding is
    * content-hash systematic — the `k` corpus vectors with the smallest
    * `md5(id)` — so no RNG, no seed drift across retries; the assignment
    * step is [[assignCells]]'s argmax with its (cosine desc, cid asc)
    * tie-break; the update step is the element-wise mean (computed in
    * doubles, map-side partial sums) L2-normalized — spherical k-means,
    * the right variant under cosine similarity. Iteration count is FIXED
    * (`iters`), not convergence-tested: a fixed unrolling is reproducible
    * by any engine (the DuckDB oracle replays it as unrolled CTEs), and in
    * production the quantizer is trained once on a sample anyway.
    *
    * Scale shape per iteration: one broadcast argmax over the corpus (no
    * shuffle of the big side), then `posexplode` + two keyed aggregations
    * whose map-side partial sums shrink the shuffle to k×dim rows per
    * partition. Centroids are `localCheckpoint`ed each round so the loop's
    * plan depth stays constant. Empty cells (a centroid losing all members)
    * simply drop out — both engines drop them identically via the inner
    * grouping.
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    var cents = corpus
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select(col(idCol), col(vecCol))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val assigned = assignCells(corpus, cents, idCol, vecCol)
      val sums = assigned
        .select(col("cid"), posexplode(col(vecCol)))
        .select(col("cid"), col("pos"), col("col").cast("double").as("x"))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"), (col("sx") / col("n")).as("m"))
      val rebuilt = sums.groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid").as(idCol), transform(col("pm"), p => p.getField("m")).as(vecCol))
      // The norm is materialized as its own column BEFORE the per-element
      // division: referenced inside the transform() lambda it would be
      // re-reduced once per element (HOF lambdas get no CSE).
      cents = rebuilt.withColumn("_n", norm(col(vecCol)))
        .select(col(idCol), transform(col(vecCol), x => x / col("_n")).as(vecCol))
        .localCheckpoint(true)
    }
    cents
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

  // ------------------------------------------------------------------ PQ

  /** Strict-fold squared-L2 distance (PQ's metric), elements promoted to
    * double before the subtract; the square is an explicit multiply (pow()
    * is not guaranteed bit-identical across engines, x*x is). Native
    * codegen'd [[graft.expressions.VecL2Sq]] — same fold, no boxed HOF.
    */
  def l2sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(graft.expressions.VecL2Sq(Shim.expression(a), Shim.expression(b)))
  }

  /** Explode vectors into `(id, sub, svec)` subvector rows — the framing
    * that lets ONE relational Lloyd train all `m` product-quantizer
    * codebooks at once: the subspace index is a grouping column, not a
    * per-subspace program. `m * subDim` must equal the embedding length.
    */
  private def subRows(df: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("_pid"),
      explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), slice(col(vecCol), s * subDim + 1, subDim).as("svec"))): _*)).as("_e"))
      .select(col("_pid"), col("_e.sub").as("sub"), col("_e.svec").as("svec"))

  /** Train product-quantization codebooks: split each vector into `m`
    * subvectors of `subDim` dims and run `iters` rounds of plain (L2,
    * mean-update) Lloyd per subspace — all subspaces in the same jobs, keyed
    * by the `sub` column. Seeding is the deterministic content-hash order
    * used by [[trainCentroids]]: the same k seed VECTORS feed every
    * subspace, so retraining on the same corpus is reproducible with no
    * stored RNG state. Returns `(sub, cid, svec)`.
    *
    * Scale shape: each iteration is one broadcast join (corpus subrows ×
    * current codebooks, m*k rows — always tiny) + one argmin aggregate
    * keyed by (id, sub) + one mean-update aggregate keyed by (sub, cid,
    * pos); no shuffle ever carries more than the subrow projection of the
    * corpus, and codebooks are `localCheckpoint`ed per round to truncate
    * the lineage exactly like [[trainCentroids]].
    */
  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      subDim: Int,
      k: Int,
      iters: Int = 2): DataFrame = {
    require(m > 0 && subDim > 0 && k > 0 && iters >= 0, "m, subDim, k positive; iters >= 0")
    val subs = subRows(corpus, idCol, vecCol, m, subDim)
    val seedW = Window.partitionBy("sub")
      .orderBy(md5(col("_pid").cast("string")), col("_pid"))
    var cb = subs
      .withColumn("_rn", row_number().over(seedW))
      .where(col("_rn") <= k)
      .select(col("sub"), (col("_rn") - 1).as("cid"), col("svec"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val means = pqAssign(subs, cb)
        .select(col("sub"), col("cid"), posexplode(col("svec")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg((sum(col("col").cast("double")) / count(lit(1))).as("m"))
      cb = means.groupBy("sub", "cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("sub"), col("cid"), transform(col("pm"), p => p.getField("m")).as("svec"))
        .localCheckpoint(true)
    }
    cb
  }

  /** Argmin code per (id, sub): min(struct(dist, cid, svec)) — the
    * lexicographic min gives (closest, lowest-cid-on-tie) with one
    * map-side-combining agg; the row's own subvector rides the struct (it
    * is constant within the group and (dist, cid) is unique, so it is never
    * compared) to spare the mean-update a corpus self-join.
    */
  private def pqAssign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb.select(col("sub"), col("cid"), col("svec").as("_cvec"))), Seq("sub"))
      .withColumn("_d", l2sq(col("svec"), col("_cvec")))
      .groupBy(col("_pid"), col("sub"))
      .agg(min(struct(col("_d"), col("cid"), col("svec"))).as("_m"))
      .select(col("_pid"), col("sub"), col("_m.cid").as("cid"), col("_m.svec").as("svec"))

  /** Encode the corpus against a trained codebook: `(id, sub, code)` long
    * form — `m` small integers per vector, the PQ-compressed corpus (the
    * 100 TB artifact: ~m bytes per vector instead of 4*dim). Long form
    * rather than a packed array so the ADC probe below is a plain keyed
    * join with no per-row array lookup.
    */
  def pqEncode(
      corpus: DataFrame,
      codebook: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      subDim: Int): DataFrame =
    pqAssign(subRows(corpus, idCol, vecCol, m, subDim), codebook)
      .select(col("_pid").as(idCol), col("sub"), col("cid").as("code"))

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each query
    * precomputes its distance table (query subvector vs every codebook
    * centroid — `m*k` doubles, broadcast), the encoded corpus joins it on
    * `(query, sub, code)`, and per-(query, neighbor) distances fold in
    * ascending `sub` order (sorted-array strict fold, engine-reproducible).
    * Approximate distances are rounded to 4 decimals before ranking so the
    * order is stable under the codebook's sub-ULP mean-aggregation wiggle;
    * ties break on neighbor id.
    *
    * Scale shape: the only full-corpus input is the encoded (m codes/row)
    * table — the raw vectors are never touched at probe time; the distance
    * table is query-batch × m × k, broadcast; the fold output is one row
    * per (query, neighbor) pre-aggregated map-side.
    */
  def pqTopK(
      queries: DataFrame,
      encoded: DataFrame,
      codebook: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int,
      subDim: Int): DataFrame = {
    val scored = encoded
      .join(broadcast(adcDistanceTable(queries, codebook, idCol, vecCol, m, subDim)),
        Seq("sub", "code"))
      .where(col("query_id") =!= col(idCol))
    adcRank(scored, idCol, k)
  }

  /** Residual IVF-PQ (the FAISS-style composition): PQ codebooks are
    * trained on RESIDUALS `x − c(cell(x))` instead of raw vectors, so the
    * quantizer spends its codes on the within-cell structure the coarse
    * quantizer already removed — better recall at the same code budget.
    * The ADC table becomes per-(query, probed cell): each probed cell
    * contributes its own query residual `q − c(cell)`, still only
    * |queries|·nProbe·m·k broadcast rows.
    */
  def topKIvfPqResidual(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      kCells: Int = 4,
      lloydIters: Int = 1,
      nProbe: Int = 2,
      m: Int = 4,
      subDim: Int = 16,
      pqK: Int = 4,
      pqIters: Int = 1): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, kCells, lloydIters)
    val centVecs = cents.select(col(idCol).as("cid"), col(vecCol).as("_cv"))
    val sub = (a: Column, b: Column) =>
      zip_with(a, b, (x, c) => x.cast("double") - c.cast("double"))
    val resid = assignCells(corpus, cents, idCol, vecCol)
      .join(broadcast(centVecs), "cid")
      .select(col(idCol), col("cid"), sub(col(vecCol), col("_cv")).as("_rvec"))
      // consumed by PQ training (iterated), encoding and the cell join —
      // materialized once; at real scale this is the persisted stage
      // boundary (the residual table IS the thing you'd write out)
      .localCheckpoint(true)
    val cb = pqTrain(resid, idCol, "_rvec", m, subDim, pqK, pqIters)
    // Corpus-sized × corpus-sized: pinned shuffle-merge for the same
    // determinism + 100 TB rationale as [[topKIvfPq]]'s enc⋈assigned join.
    val enc = pqEncode(resid, cb, idCol, "_rvec", m, subDim)
      .join(resid.select(col(idCol), col("cid")).hint("merge"), idCol)
    val cent = centFrame(cents, idCol, vecCol)
    val probes = {
      val scored = queries
        .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
        .join(cent)
        .withColumn("c_cos", cosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
      val w = Window.partitionBy("query_id").orderBy(col("c_cos").desc, col("cid"))
      scored.withColumn("crank", row_number().over(w)).where(col("crank") <= nProbe)
        .select("query_id", "cid", "q_vec")
        // consumed by the residual distance table AND the candidate join —
        // without this the query-ranking subplan runs twice (same
        // discipline as topKIvfPrebuilt)
        .localCheckpoint(true)
    }
    // Per-(query, cell) residual distance table: the query's residual
    // against the PROBED cell's centroid, sub-sliced and scored against
    // every sub-codebook entry.
    val dtab = probes
      .join(broadcast(centVecs), "cid")
      .select(col("query_id"), col("cid"), sub(col("q_vec"), col("_cv")).as("_rq"))
      .select(col("query_id"), col("cid"),
        explode(array((0 until m).map(s1 =>
          struct(lit(s1).as("sub"), slice(col("_rq"), s1 * subDim + 1, subDim).as("svec"))): _*)).as("_e"))
      .select(col("query_id"), col("cid"), col("_e.sub").as("sub"), col("_e.svec").as("svec"))
      .join(cb.select(col("sub"), col("cid").as("code"), col("svec").as("_cvec")), Seq("sub"))
      .select(col("query_id"), col("cid"), col("sub"), col("code"),
        l2sq(col("svec"), col("_cvec")).as("_d"))
    val scored = enc
      .join(broadcast(probes.select("query_id", "cid")), Seq("cid"))
      .where(col("query_id") =!= col(idCol))
      .join(broadcast(dtab), Seq("query_id", "cid", "sub", "code"))
    adcRank(scored, idCol, k)
  }

  /** Per-query ADC distance table `(query_id, sub, code, _d)` — query-batch
    * × m × k rows, always broadcast-sized. */
  private def adcDistanceTable(queries: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int, subDim: Int): DataFrame =
    subRows(queries, idCol, vecCol, m, subDim)
      .select(col("_pid").as("query_id"), col("sub"), col("svec"))
      .join(codebook.select(col("sub"), col("cid").as("code"), col("svec").as("_cvec")), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"), l2sq(col("svec"), col("_cvec")).as("_d"))

  /** Shared ADC ranking tail: fold per-(query, neighbor) distances in
    * ascending `sub` order (engine-reproducible), round to 4 decimals so
    * the codebook's mean-aggregation ULP wiggle cannot reorder equal
    * ranks, tie-break on neighbor id. Input rows: `(query_id, <idCol>,
    * sub, _d)` — one per candidate code match.
    */
  private def adcRank(scoredCodes: DataFrame, idCol: String, k: Int): DataFrame = {
    val scored = scoredCodes
      .groupBy(col("query_id"), col(idCol).as("neighbor_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("_d")))).as("_ds"))
      .select(col("query_id"), col("neighbor_id"),
        round(aggregate(col("_ds"), lit(0.0), (acc, v) => acc + v.getField("_d")), 4).as("adist"))
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adist")
  }

  /** IVF-PQ: the composed 100 TB ANN architecture — coarse cells prune the
    * candidate set (only `nProbe` cells' members are touched per query),
    * PQ codes stand in for the vectors (the raw embeddings are never read
    * at probe time), ADC scores the survivors. Components are the
    * independently-gated [[trainCentroids]]/[[assignCells]] (cosine coarse
    * quantizer) and [[pqTrain]]/[[pqEncode]] (L2 sub-codebooks); this
    * operator is their join: `(id, cid)` cell assignment × `(id, sub,
    * code)` codes × per-query broadcast distance tables.
    *
    * Scale shape: at rest the corpus artifact is `nCells`-partitioned code
    * rows (m bytes/vector + a cell id); a probe batch broadcasts its cell
    * ranks and distance tables, the scan prunes to probed cells (the
    * partition-pruned layout path is [[topKIvfPrebuilt]]'s, applied to the
    * code table), and nothing larger than (candidates × m) rows ever
    * shuffles.
    */
  def topKIvfPq(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      kCells: Int = 4,
      lloydIters: Int = 1,
      nProbe: Int = 2,
      m: Int = 4,
      subDim: Int = 16,
      pqK: Int = 4,
      pqIters: Int = 1): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, kCells, lloydIters)
    val assigned = assignCells(corpus, cents, idCol, vecCol)
      .select(col(idCol), col("cid"))
    val cb = pqTrain(corpus, idCol, vecCol, m, subDim, pqK, pqIters)
    // The persisted artifact: (id, sub, code, cid). Both sides are
    // corpus-sized, so pin the shuffle-merge strategy: at 100 TB neither
    // side is broadcastable, and at gate SF an unpinned join let AQE
    // runtime-convert SMJ→broadcast in SOME runs (stats-sensitive), making
    // shuffle volume nondeterministic across JVMs — the one plan flip ever
    // observed on the bench board (r12: 2.56M vs 2.79M shuffle bytes at the
    // same seed). AQE honors explicit strategy hints, so this is the
    // deterministic AND scale-correct shape.
    val enc = pqEncode(corpus, cb, idCol, vecCol, m, subDim)
      .join(assigned.hint("merge"), idCol)
    val cent = centFrame(cents, idCol, vecCol)
    val probes = {
      val scored = queries
        .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
        .join(cent)
        .withColumn("c_cos", cosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
      val w = Window.partitionBy("query_id").orderBy(col("c_cos").desc, col("cid"))
      scored.withColumn("crank", row_number().over(w)).where(col("crank") <= nProbe)
        .select("query_id", "cid")
    }
    val scored = enc
      .join(broadcast(probes), Seq("cid"))
      .where(col("query_id") =!= col(idCol))
      .join(broadcast(adcDistanceTable(queries, cb, idCol, vecCol, m, subDim)),
        Seq("query_id", "sub", "code"))
    adcRank(scored, idCol, k)
  }

  /** Johnson–Lindenstrauss sign projection: `y_j = (1/√dOut) Σ_i x_i·s_ij`
    * with `s_ij ∈ {±1}` derived from `md5("j_i")` first-nibble parity — the
    * projection matrix is CONTENT-ADDRESSED, so there is no matrix artifact
    * to store or broadcast and any engine (or a later re-run) regenerates
    * it bit-identically. The md5 calls happen ONCE at plan build (driver
    * side, dIn·dOut hashes); the per-row work is a pure codegen'd
    * multiply-fold against literal arrays. Inner sums are strict left folds
    * in element order, so results are engine-reproducible bit-for-bit.
    */
  def randomProject(vec: Column, dIn: Int, dOut: Int): Column = {
    require(dIn > 0 && dOut > 0, "dims must be positive")
    def sign(j: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${j}_$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) % 2 == 0) 1.0 else -1.0
    }
    val scale = math.sqrt(dOut.toDouble)
    array((0 until dOut).map { j =>
      val signs = array((0 until dIn).map(i => lit(sign(j, i))): _*)
      dot(vec, signs) / scale
    }: _*)
  }

  /** DECIMAL-EXACT covariance matrix of an embedding column — the
    * second-moment profile under PCA/whitening/OPQ decisions, where a
    * float-summed covariance is shuffle-order nondeterministic and a gate
    * could never hash it. Every moment (Σxᵢ, Σxᵢxⱼ) is summed as
    * `decimal(15,8)` terms of the float's EXACT double promotion — exact
    * integers in scaled space on any engine, any partitioning — and only
    * the final `cov = (Σxy − ΣxΣy/n)/n` runs in doubles, identically
    * ordered.
    *
    * Plan: one `posexplode` to the (row, i, xᵢ) frame, a row-keyed
    * self-join builds the (i ≤ j) pair stream, and ONE (i, j)-keyed
    * aggregate reduces it — dims²-sized output however large the corpus;
    * per-dim means ride a second (i)-keyed aggregate over the same
    * exploded frame. Shuffle volume is rows × d²/2 pair terms — the
    * relational encoding of the Gram matrix (the alternative, d² agg
    * columns in one pass, breaks past ~50 dims).
    *
    * Output: `(i, j, n, mean_i, mean_j, cov)` for i ≤ j, 6 dp.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String): DataFrame = {
    // decimal(15,8): the product is decimal(31,16) — EXACT on both engines.
    // (19,8) would make Spark clamp the product to (38,15) with rounding
    // while DuckDB keeps (38,16), a silent cross-engine mismatch. Scale-8
    // terms bound |x| < 10^7 — far above any embedding coordinate.
    val dec = (c: Column) => c.cast("double").cast("decimal(15,8)")
    // Row id BEFORE the explode (an id in the same select as the generator
    // is evaluated per exploded element — unique per (row, i), which turns
    // the self-join into an identity join); checkpoint pins the ids for
    // the two consumers + the self-join.
    val pos = df.select(monotonically_increasing_id().as("_r"), col(vecCol).as("_v"))
      .localCheckpoint(true)
      .select(col("_r"), posexplode(col("_v")).as(Seq("i", "x")))
    val sums = pos.groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("_sx"))
    val prods = pos.select(col("_r"), col("i"), col("x"))
      .join(pos.select(col("_r"), col("i").as("j"), col("x").as("y")), "_r")
      .where(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(sum(dec(col("x")) * dec(col("y"))).as("_sxy"))
    prods
      .join(sums.select(col("i"), col("n"), col("_sx").as("_sxi")), "i")
      .join(sums.select(col("i").as("j"), col("_sx").as("_sxj")), "j")
      // `+ 0.0` normalizes IEEE negative zero — round() lands on -0.0 for
      // tiny negatives on one engine and 0.0 on the other, and the gate
      // hashes the sign.
      .select(col("i"), col("j"), col("n"),
        (round(col("_sxi").cast("double") / col("n"), 6) + lit(0.0)).as("mean_i"),
        (round(col("_sxj").cast("double") / col("n"), 6) + lit(0.0)).as("mean_j"),
        (round((col("_sxy").cast("double") -
          col("_sxi").cast("double") * col("_sxj").cast("double") / col("n")) /
          col("n"), 6) + lit(0.0)).as("cov"))
  }
}
