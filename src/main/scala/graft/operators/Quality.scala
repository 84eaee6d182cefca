package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, evaluated in ONE scan.
  *
  * The reference validates per-message (schema decode failures land in an
  * error channel, `/root/reference/src/kafka_source.py:120-140`) but has no
  * table-level contract check before the warehouse write. This operator adds
  * the standard ingest-gate expectations (not-null, unique key, value range,
  * accepted values, referential integrity) as a single declarative pass.
  *
  * Scale shape: every check compiles to a conditional-count aggregate over
  * one scan of the fact table — no per-check jobs, no driver loop.
  * Referential checks pre-join their (deduplicated, broadcast) dimension key
  * set so the membership probe rides the same scan; a [[DqCheck.Unique]]
  * check adds one distinct aggregate (planned via Expand — the mapper emits
  * one extra row stream, still a single shuffle round with partial
  * aggregation). Output is one row per check, so the result is O(checks)
  * regardless of table size.
  */
object Quality {

  sealed trait DqCheck { def name: String }
  object DqCheck {
    /** Violation: the column is NULL. */
    case class NotNull(column: String) extends DqCheck {
      def name = s"not_null:$column"
    }
    /** Violation: rows beyond the first per distinct NON-NULL key tuple.
      * Rows with a NULL key column are excluded from both sides of the
      * count — NULL keys are [[NotNull]]'s job (same orthogonality rule as
      * [[InRange]]/[[AcceptedValues]]; mixing them would also diverge from
      * SQL's `count(DISTINCT col)` null handling). */
    case class Unique(columns: Seq[String]) extends DqCheck {
      def name = s"unique:${columns.mkString(",")}"
    }
    /** Violation: non-null value outside [lo, hi] (NULLs are NotNull's job —
      * a range check double-counting them would make the two non-orthogonal). */
    case class InRange(column: String, lo: Double, hi: Double) extends DqCheck {
      def name = s"range:$column"
    }
    /** Violation: non-null value outside the accepted set. */
    case class AcceptedValues(column: String, values: Seq[String]) extends DqCheck {
      def name = s"accepted:$column"
    }
    /** Violation: non-null foreign key with no match in the dimension's
      * primary-key set. The dim key set is deduplicated then broadcast. */
    case class Referential(fkColumn: String, dim: DataFrame, pkColumn: String)
        extends DqCheck {
      def name = s"fk:$fkColumn"
    }
  }
  import DqCheck._

  /** Evaluate all checks over one scan of `df`.
    * Returns `(check_name: string, violations: long)` — one row per check,
    * in no guaranteed order (it's a relational result).
    */
  def evaluate(df: DataFrame, checks: Seq[DqCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    // Referential dims join in BEFORE aggregation so their probes share the
    // scan. Each dim is reduced to its distinct key column (a left join
    // against a duplicated pk would multiply fact rows and corrupt every
    // other counter) and renamed to a collision-proof marker column.
    val joined = checks.zipWithIndex.foldLeft(df) {
      case (acc, (Referential(fk, dim, pk), i)) =>
        val marker = s"_dq_pk_$i"
        acc.join(
          broadcast(dim.select(col(pk).as(marker)).distinct()),
          acc(fk) === col(marker), "left_outer")
      case (acc, _) => acc
    }
    def violations(c: DqCheck, i: Int): Column = (c match {
      case NotNull(column) => count_if(col(column).isNull)
      case Unique(columns) =>
        val allSet = columns.map(col(_).isNotNull).reduce(_ && _)
        // count_distinct skips the NULL struct from the when(), so both
        // sides of the subtraction range over non-null key tuples only.
        count_if(allSet) - count_distinct(when(allSet, struct(columns.map(col): _*)))
      case InRange(column, lo, hi) =>
        count_if(col(column).isNotNull && !col(column).between(lo, hi))
      case AcceptedValues(column, values) =>
        count_if(col(column).isNotNull && !col(column).isInCollection(values))
      case Referential(fk, _, _) =>
        count_if(col(fk).isNotNull && col(s"_dq_pk_$i").isNull)
    }).as(s"_v_$i")
    val wide = joined.agg(
      violations(checks.head, 0),
      checks.tail.zipWithIndex.map { case (c, i) => violations(c, i + 1) }: _*)
    // Melt the single wide row to (check_name, violations) — O(checks) rows.
    wide.select(explode(array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"_v_$i").as("violations"))
    }: _*)).as("r")).select(col("r.check_name"), col("r.violations"))
  }

  /** Rank-normalized signal blending — the curation-score combiner: each
    * signal is percent_rank-normalized WITHIN its group (so sources with
    * different signal scales mix fairly), the normalized ranks average into
    * one blend score, and an `ntile` decile gives the curriculum bucket.
    * Rank normalization is the standard way to combine heterogeneous
    * quality signals (absolute scales of an LM logprob, a ratio and a
    * length are incomparable; their ranks are).
    *
    * Determinism: every window orders by `(signal, id)` so ties cannot
    * reorder across engines; percent_rank yields exact rationals
    * `(rank−1)/(n−1)`; the blend averages in argument order.
    *
    * Scale shape: all |signals|+1 windows share ONE partitioning on
    * `groupCol` — a single exchange, then per-partition sorts; no global
    * ordering anywhere.
    */
  /** Linear quality-filter INFERENCE (the fastText/CCNet-style binary
    * filter every published curation pipeline runs): a learned linear model
    * over per-document features, evaluated in LOGIT space — `bias +
    * Σ wᵢ·fᵢ` as a strict left fold in declaration order, pure double
    * multiply-adds that any engine reproduces bit-for-bit. The keep
    * decision compares the logit against `log(p/(1−p))` computed ONCE by
    * the caller (a plan literal), so NO transcendental function evaluates
    * per row — sigmoid monotonicity makes `σ(logit) > p ⟺ logit >
    * logit(p)`, and the gate hash-matches without rounding belts.
    *
    * Scale shape: a shuffle-free codegen'd projection the scan absorbs —
    * the filter form every 100 TB curation pass wants (model inference as
    * column math, not a UDF batch).
    */
  def linearLogit(features: Seq[(Column, Double)], bias: Double): Column = {
    require(features.nonEmpty, "features required")
    features.foldLeft(lit(bias): Column) { case (acc, (f, w)) =>
      acc + f.cast("double") * lit(w)
    }
  }

  def rankBlend(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      signals: Seq[Column],
      deciles: Int = 10): DataFrame = {
    require(signals.nonEmpty, "signals required")
    import org.apache.spark.sql.expressions.Window
    val ranked = signals.zipWithIndex.foldLeft(df) { case (acc, (sig, i)) =>
      acc.withColumn(s"_r$i",
        percent_rank().over(Window.partitionBy(groupCol).orderBy(sig, col(idCol))))
    }
    val blend = round(
      signals.indices.map(i => col(s"_r$i")).reduce(_ + _) / signals.length, 6)
    ranked.withColumn("blend", blend)
      .withColumn("decile",
        ntile(deciles).over(Window.partitionBy(groupCol).orderBy(col("blend"), col(idCol))))
      .drop(signals.indices.map(i => s"_r$i"): _*)
  }

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation) and the count of points beyond `z` MADs — the
    * skew-insensitive cousin of z-score flagging, used to spot corrupted
    * value distributions before they poison a training mix.
    *
    * Both medians and the comparison run against values ROUNDED to 6
    * decimals, so two engines whose percentile interpolation differs in the
    * last ULP still classify every point identically — a boundary point is
    * a data-quality judgement, not a floating-point accident.
    *
    * Scale shape: two grouped exact-percentile aggregates (each buffers one
    * GROUP's values per task — group cardinality is the profile dimension,
    * e.g. priorities/sources, so the buffer is the group's row share) with
    * the group medians broadcast back between them. At corpus scale with
    * huge groups, swap `percentile` for `approx_percentile` — same plan
    * shape, sketch-sized buffers (see the `x_quantile_sketch` accuracy
    * contract for why that swap is safe).
    */
  def madOutliers(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      z: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val withMed = df.join(broadcast(med), groupCol)
      .withColumn("_absdev", abs(v - col("med")))
    val madF = withMed.groupBy(col(groupCol), col("med"))
      .agg(round(expr("percentile(_absdev, 0.5)"), 6).as("mad"),
        count(lit(1)).as("n"))
    withMed.select(col(groupCol), col("_absdev"))
      .join(broadcast(madF), groupCol)
      .groupBy(col(groupCol), col("med"), col("mad"), col("n"))
      .agg(count_if(col("_absdev") > lit(z) * col("mad")).as("n_outliers"))
  }

  /** Token-distribution DRIFT report: for each group (source, split, snapshot
    * — whatever `groupCol` names), the `topK` tokens whose within-group
    * relative frequency diverges most from the corpus-wide frequency —
    * |c_g/n_g − c_t/N| ranked descending, token-tiebroken. The standard
    * train/val contamination-and-skew screen: a split whose token mass
    * shifted (one source over-sampled, template text leaking into val, a
    * scrape gone stale) surfaces its shifted tokens at the head.
    *
    * Determinism: counts are exact longs; the divergence score is two exact
    * i64→f64 divisions, one subtraction, one abs — each correctly-rounded
    * IEEE ops on both engines — and the score is used ONLY to order (the
    * output carries the counts, not the float), with a full tie-break on
    * token. Scale shape: one (group, token)-keyed partial agg over the token
    * stream, a token-keyed re-agg of THAT (vocab-sized) for corpus counts,
    * broadcast group totals, and a per-group top-k window over the vocab —
    * which Spark plans with a WindowGroupLimit map-side prune, so no
    * group-wide sort of anything corpus-sized. The corpus grand total rides
    * a 1-row broadcast cross join.
    */
  def driftReport(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      topK: Int = 5): DataFrame = {
    require(topK > 0, "topK must be positive")
    val tok = df.select(col(groupCol).as("_g"),
        explode(Dedup.tokens(col(textCol))).as("_t"))
      .where(col("_t") =!= "")
    val perGroup = tok.groupBy("_g", "_t").agg(count(lit(1)).as("n_group"))
    // Vocab-sized inputs from here down: corpus counts re-aggregate the
    // per-group counts, never the token stream.
    val corpus = perGroup.groupBy("_t").agg(sum("n_group").as("n_corpus"))
    val groupTotals = perGroup.groupBy("_g").agg(sum("n_group").as("_ng"))
    val grand = corpus.agg(sum("n_corpus").as("_nn"))
    val scored = perGroup
      .join(broadcast(groupTotals), "_g")
      .join(corpus, "_t")
      .crossJoin(broadcast(grand))
      .withColumn("_score", abs(
        col("n_group").cast("double") / col("_ng").cast("double") -
          col("n_corpus").cast("double") / col("_nn").cast("double")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_g")
      .orderBy(col("_score").desc, col("_t"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("_g").as(groupCol), col("_t").as("token"),
        col("n_group"), col("n_corpus"), col("rank"))
  }

  /** DEFLATE-compressed length of a string's UTF-8 bytes (level 6, raw
    * deflate — no gzip header so the length is pure content signal).
    *
    * A scalar UDF — one of the few in the engine — because the JDK's
    * zlib binding is the only implementation surface; the cost model is
    * still right for 100 TB: pure per-row map work, no shuffle, and the
    * Deflater is allocated per CALL (not cached across rows) because
    * Spark may evaluate the UDF concurrently within a task via codegen
    * batching; `end()` releases the native buffer eagerly.
    */
  val deflateLen: Column => Column = {
    val f = udf { (s: String) =>
      if (s == null) Option.empty[Long]
      else {
        val d = new java.util.zip.Deflater(6, /* nowrap = raw deflate */ true)
        try {
          d.setInput(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          d.finish()
          val buf = new Array[Byte](8192)
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          Some(n)
        } finally d.end()
      }
    }
    c => f(c)
  }

  /** Compression-ratio quality signal (the CCNet/Gopher-style heuristic:
    * natural prose lands in a mid band; boilerplate and template spam
    * compress far below it, random/binary junk sits at ~1.0+overhead).
    * Emits per-doc `comp_len`, `byte_len`, `comp_ratio` — filter on a band
    * like [0.25, 1.1] upstream of training. Deterministic: zlib level-6
    * output depends only on the input bytes.
    */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("byte_len"),
        deflateLen(col(textCol)).as("comp_len"))
      .withColumn("comp_ratio",
        round(col("comp_len").cast("double") / greatest(lit(1L), col("byte_len")), 6))

  /** QUANTILE NORMALIZATION across sources: map each group's score
    * distribution onto the GLOBAL score distribution — rank-preserving
    * within group, comparable across groups (the cross-source calibration
    * step before a single quality threshold can be fair; raw classifier
    * scores are not comparable between a books source and a crawl
    * source).
    *
    * Shape: per-group `percent_rank` (group-keyed window, id tie-break so
    * ranks are total and replayable), then the normalized value is linear
    * interpolation into a GLOBAL percentile grid (`gridSize`+1 exact
    * percentiles, one aggregate, broadcast as an array literal-like
    * column) — O(grid) driver state, never a global sort of the corpus.
    * The grid resolution bounds the approximation; rank order within a
    * group is preserved exactly at any resolution (interpolation is
    * monotone).
    *
    * Output: input + `(pct_rank, norm_score)`, 6 dp.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      gridSize: Int = 100): DataFrame = {
    require(gridSize >= 1, "gridSize must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val probs = array((0 to gridSize).map(i => lit(i.toDouble / gridSize)): _*)
    val grid = df.agg(percentile(col(scoreCol), probs).as("_grid"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol), col(idCol))
    val ranked = df.withColumn("_pr", percent_rank().over(w))
    val pos = col("_pr") * gridSize
    val lo = floor(pos).cast("int")
    val frac = pos - lo
    ranked.join(broadcast(grid))
      .select(df.columns.map(col) :+
        round(col("_pr"), 6).as("pct_rank") :+
        round(
          when(lo >= gridSize, element_at(col("_grid"), gridSize + 1))
            .otherwise(element_at(col("_grid"), lo + 1) * (lit(1.0) - frac) +
              element_at(col("_grid"), lo + 2) * frac), 6).as("norm_score"): _*)
  }

  /** Pairwise Pearson correlation per group over DECIMAL-EXACT moment
    * sums — the numeric-profiling matrix (feature redundancy screen,
    * schema-drift canary). Grouped double sums are shuffle-order
    * nondeterministic and 1e5-row money columns lose ~1e-3 absolute in a
    * naive float fold, so every moment (Σx, Σy, Σxy, Σx², Σy²) is summed
    * as `decimal(18,4)` terms (`decimal(37,8)` products) — EXACT integers
    * in scaled space on any engine, any partitioning — and only the final
    * correlation formula runs in doubles, identically ordered on both
    * engines.
    *
    * One pass: all pairs' moments are columns of a SINGLE aggregation
    * over the group key (column count is O(pairs), rows never duplicate).
    * Output: `(group, col_a, col_b, n, corr)`, corr 6 dp, NULL when a
    * side is constant (zero variance).
    */
  def corrPairs(
      df: DataFrame,
      groupCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrPairs needs at least two columns")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (cols(i), cols(j))
    def dec(c: String) = col(c).cast("decimal(18,4)")
    val moments: Seq[Column] =
      count(lit(1)).as("_n") +:
        cols.flatMap(c => Seq(
          sum(dec(c)).as(s"_s_$c"),
          sum(dec(c) * dec(c)).as(s"_ss_$c"))) ++:
        pairs.map { case (a, b) => sum(dec(a) * dec(b)).as(s"_sp_${a}_$b") }
    val agged = df.groupBy(col(groupCol)).agg(moments.head, moments.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("_n").cast("double")
      val sx = col(s"_s_$a").cast("double"); val sy = col(s"_s_$b").cast("double")
      val sxx = col(s"_ss_$a").cast("double"); val syy = col(s"_ss_$b").cast("double")
      val sxy = col(s"_sp_${a}_$b").cast("double")
      val den = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      agged.select(col(groupCol), lit(a).as("col_a"), lit(b).as("col_b"),
        col("_n").as("n"),
        when(den === 0.0, lit(null))
          .otherwise(round((n * sxy - sx * sy) / den, 6)).as("corr"))
    }
    rows.reduce(_ unionAll _)
  }
}
