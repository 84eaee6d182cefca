package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructType}

/** Bounded top-k buffer: a size-capped min-heap (when keeping the largest k)
  * over any Catalyst-orderable value. The cap is the whole point — it is what
  * the partial-aggregation buffer carries across the shuffle, so map-side
  * combine truncates each key's contribution to k rows per input partition
  * BEFORE any data moves.
  */
final class TopKBuffer(val k: Int, ord: Ordering[Any]) {
  // mutable.PriorityQueue dequeues the LARGEST under its ordering; reverse it
  // so `head` is the current worst element (the eviction candidate).
  private[expressions] val heap = scala.collection.mutable.PriorityQueue.empty[Any](ord.reverse)

  def insert(v: Any): Unit =
    if (heap.size < k) heap.enqueue(v)
    else if (ord.compare(v, heap.head) > 0) { heap.dequeue(); heap.enqueue(v) }

  /** Hot-path insert: compare the REUSED input value against the current
    * worst first and deep-copy only when it actually enters the heap. Once
    * the buffer is warm, almost every row fails the single head comparison
    * — the copy (the dominant per-row allocation for string/struct
    * payloads) happens O(k + improvements) times, not O(n).
    */
  def insertWithCopy(v: Any, copy: Any => Any): Unit =
    if (heap.size < k) heap.enqueue(copy(v))
    else if (ord.compare(v, heap.head) > 0) { heap.dequeue(); heap.enqueue(copy(v)) }

  def mergeFrom(other: TopKBuffer): Unit = other.heap.foreach(insert)

  /** Best-first (descending under `ord`). */
  def sortedDesc: Array[Any] = heap.toArray.sorted(ord.reverse)
}

/** Native bounded top-k aggregate — `collect_list`-shaped output, but with a
  * size-k buffer instead of an unbounded one.
  *
  * Why an aggregate and not a window: the naive per-key top-k
  * (`row_number() OVER (PARTITION BY key ORDER BY ...) <= k`) shuffles EVERY
  * input row to its key's reducer and sorts the full group before discarding
  * all but k rows — at 100 TB that shuffle is the job. Spark 4's own
  * `WindowGroupLimit` rewrite already repairs the VOLUME (it inserts a
  * map-side per-key limit, so the exchange carries ≤ k × partitions rows per
  * key — the same bound this aggregate has; TopKSpec measures both). What
  * the rewrite cannot repair is the WORK: the partial group-limit needs the
  * whole input partition SORTED by (key, order) before it can cut (O(n log
  * n) per partition), and the reducer sorts again and replays the rank. This
  * aggregate's partial phase is a hash-agg heap insert — O(n log k), no sort
  * of the input, no reduce-side window — and, being a real aggregate, it
  * composes into `groupBy(...).agg(topK(...), count(...), avg(...))` so a
  * shortlist and its group metrics share ONE shuffle, which no window
  * formulation can express.
  *
  * Ordering: the element's natural Catalyst ordering (lexicographic over
  * struct fields) — callers encode "score DESC, id DESC tie-break" by
  * passing `struct(score, id)` with `largest = true`. Ties are therefore
  * deterministic as long as the struct contains a unique tie-break field,
  * which is also what makes the DuckDB oracle reproducible.
  *
  * Null contract: null INPUTS are skipped (collect semantics); null struct
  * FIELDS order as smallest (Spark's null-first ascending), so with
  * `largest = true` null-scored rows lose to every real score — mirror the
  * oracle with `NULLS LAST` or a not-null filter.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  require(k > 0, s"topK requires k > 0, got $k")

  override def prettyName: String = "graft_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  /** "Largest k" is the canonical direction; `largest = false` flips the
    * ordering so the same heap keeps the smallest k and emits ascending.
    *
    * For struct children with a primitive first field (the `struct(score,
    * tiebreak, …)` calling convention) the comparator reads field 0
    * directly and falls back to the full interpreted ordering only on
    * first-field ties — the interpreted per-field loop is the dominant
    * comparison cost and almost every comparison resolves on the score.
    * Null handling matches InterpretedOrdering exactly (nulls first).
    */
  private lazy val ord: Ordering[Any] = {
    val natural = child.dataType match {
      case st: StructType if st.nonEmpty => firstFieldFast(st)
      case dt => TypeUtils.getInterpretedOrdering(dt)
    }
    if (largest) natural else natural.reverse
  }

  private def firstFieldFast(st: StructType): Ordering[Any] = {
    val full = TypeUtils.getInterpretedOrdering(st)
    def fast(cmp0: (InternalRow, InternalRow) => Int): Ordering[Any] = new Ordering[Any] {
      override def compare(x: Any, y: Any): Int = {
        val rx = x.asInstanceOf[InternalRow]
        val ry = y.asInstanceOf[InternalRow]
        val nx = rx.isNullAt(0); val ny = ry.isNullAt(0)
        if (nx || ny) { if (nx && ny) full.compare(x, y) else if (nx) -1 else 1 }
        else {
          val c = cmp0(rx, ry)
          if (c != 0) c else full.compare(x, y)
        }
      }
    }
    st.head.dataType match {
      case DoubleType  => fast((a, b) => java.lang.Double.compare(a.getDouble(0), b.getDouble(0)))
      case FloatType   => fast((a, b) => java.lang.Float.compare(a.getFloat(0), b.getFloat(0)))
      case LongType    => fast((a, b) => java.lang.Long.compare(a.getLong(0), b.getLong(0)))
      case IntegerType => fast((a, b) => java.lang.Integer.compare(a.getInt(0), b.getInt(0)))
      case _ => full
    }
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ord)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    // Catalyst reuses the underlying row/value objects across input rows —
    // anything RETAINED must be deep-copied; insertWithCopy defers the copy
    // until the value actually survives the head comparison.
    if (v != null) buf.insertWithCopy(v, InternalRow.copyValue)
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(buf.sortedDesc)

  // Shuffle format: values boxed into single-field UnsafeRows (the projection
  // handles every Catalyst type uniformly), length-prefixed back to back.
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val holder = new GenericInternalRow(1)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { v =>
      holder.update(0, v)
      val bytes = proj(holder).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = new TopKBuffer(k, ord)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      // Deserialized rows own their byte arrays already, but the heap stores
      // the VALUE (field 0), which for nested types points into rowBytes —
      // safe because each iteration allocates a fresh array.
      buf.insert(row.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}
