package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Array-backed bounded top-k buffer: three parallel primitive arrays
  * kept sorted best-first (score DESC, id_a ASC, id_b ASC), at most `k`
  * entries. Insertion is an O(k) shift for accepted rows and a single
  * compare against the current cutoff for rejected ones — no boxing, no
  * per-row allocation, no re-sort on merge.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val as = new Array[Long](k)
  val bs = new Array[Long](k)
  var size = 0

  /** < 0 iff (s, a, b) ranks strictly before entry i. */
  @inline private def cmp(s: Double, a: Long, b: Long, i: Int): Int = {
    // score DESC: the HIGHER score ranks first
    val c = java.lang.Double.compare(scores(i), s)
    if (c != 0) c
    else {
      val ca = java.lang.Long.compare(a, as(i))
      if (ca != 0) ca else java.lang.Long.compare(b, bs(i))
    }
  }

  def insert(s: Double, a: Long, b: Long): Unit = {
    if (size == k && cmp(s, a, b, size - 1) >= 0) return
    // walk from the tail: most accepted rows near the cutoff move little
    var pos = if (size == k) size - 1 else size
    while (pos > 0 && cmp(s, a, b, pos - 1) < 0) pos -= 1
    val last = if (size == k) size - 1 else size
    var i = last
    while (i > pos) {
      scores(i) = scores(i - 1); as(i) = as(i - 1); bs(i) = bs(i - 1)
      i -= 1
    }
    scores(pos) = s; as(pos) = a; bs(pos) = b
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKHeap): TopKHeap = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.as(i), o.bs(i)); i += 1 }
    this
  }
}

/** Native bounded top-k aggregate: `graft_topk(score, id_a, id_b, k)` →
  * `array<struct<score double, id_a bigint, id_b bigint>>`, the k best
  * entries ordered score DESC, then id_a ASC, id_b ASC.
  *
  * This replaces the typed `Aggregator[_, List[T], _]` formulation, whose
  * `ExpressionEncoder` buffer deserialized/reserialized the whole k-list
  * on every partial-merge step and re-sorted `(a ++ b)` per merge. Here
  * the buffer lives as primitive arrays inside `ObjectHashAggregateExec`
  * (serialized to a fixed-width binary blob only at shuffle boundaries),
  * and the surrounding query stays in Tungsten rows — no Dataset encoder
  * round-trip on input or output. The plan shape is unchanged and remains
  * THE scalable per-group top-k: partial heaps combine map-side, so the
  * shuffle moves O(groups × k × tasks) rows, never the scored input.
  *
  * Rows with a NULL score are ignored (a NULL measure cannot rank);
  * id_a/id_b are ranking tie-breakers and must be non-null longs.
  */
case class TopKCollect(
    score: Expression,
    idA: Expression,
    idB: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"graft_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, idA, idB)

  override def nullable: Boolean = false

  override def dataType: DataType = TopKCollect.ResultType

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  // unboxed fast path when the ranking inputs are plain column reads
  // (operators pre-project casts into a codegen'd Project): rejected rows
  // then cost two primitive reads and one compare, with zero boxing
  @transient private lazy val fastPath: (InternalRow, TopKHeap) => Unit =
    (score, idA, idB) match {
      case (sr: BoundReference, ar: BoundReference, br: BoundReference)
          if sr.dataType == DoubleType && ar.dataType == LongType &&
            br.dataType == LongType =>
        (row, buf) =>
          if (!row.isNullAt(sr.ordinal)) {
            val a = if (row.isNullAt(ar.ordinal)) 0L else row.getLong(ar.ordinal)
            val b = if (row.isNullAt(br.ordinal)) 0L else row.getLong(br.ordinal)
            buf.insert(row.getDouble(sr.ordinal), a, b)
          }
      case _ =>
        (row, buf) => {
          val s = score.eval(row)
          if (s != null) {
            val a = idA.eval(row)
            val b = idB.eval(row)
            buf.insert(
              s.asInstanceOf[Double],
              if (a == null) 0L else a.asInstanceOf[Long],
              if (b == null) 0L else b.asInstanceOf[Long])
          }
        }
    }

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    fastPath(input, buf)
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = buf.mergeFrom(other)

  override def eval(buf: TopKHeap): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = InternalRow(buf.scores(i), buf.as(i), buf.bs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 24)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)).putLong(buf.as(i)).putLong(buf.bs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // entries were serialized in rank order, so each lands at the tail in
    // one compare — deserialization is O(n), not O(n²)
    while (i < n) {
      heap.insert(bb.getDouble(), bb.getLong(), bb.getLong())
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKCollect =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKCollect =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), idA = newChildren(1), idB = newChildren(2))
}

object TopKCollect {
  val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)

  /** Registry builder: the 4th argument must be a foldable int literal. */
  def fromArgs(exprs: Seq[Expression]): TopKCollect = {
    require(exprs.length == 4, s"graft_topk expects 4 arguments, got ${exprs.length}")
    val k = exprs(3) match {
      case Literal(v: Int, IntegerType) => v
      case other =>
        throw new IllegalArgumentException(
          s"graft_topk k must be an INT literal, got ${other.sql}")
    }
    TopKCollect(exprs(0), exprs(1), exprs(2), k)
  }

  private[functions] def kLiteral(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$name k must be an INT literal, got ${other.sql}")
  }
}

/** Bounded top-k buffer with a STRING ranking tie-break and two long
  * payload columns — the term-ranking sibling of [[TopKHeap]]. Kept
  * sorted best-first (score DESC, term bytewise ASC), at most `k`
  * entries. UTF8String compares bytewise unsigned, which equals UTF-8
  * code-point order — the same binary collation DuckDB sorts by, so a
  * hash oracle can gate the ranking. Accepted terms are CLONED on store:
  * the input row's string points into a buffer the scan reuses.
  */
final class TopKTermHeap(val k: Int) {
  val scores = new Array[Double](k)
  val terms = new Array[org.apache.spark.unsafe.types.UTF8String](k)
  val pas = new Array[Long](k)
  val pbs = new Array[Long](k)
  var size = 0

  /** < 0 iff (s, t) ranks strictly before entry i. */
  @inline private def cmp(s: Double, t: org.apache.spark.unsafe.types.UTF8String, i: Int): Int = {
    val c = java.lang.Double.compare(scores(i), s) // score DESC
    if (c != 0) c else t.compareTo(terms(i)) // term ASC
  }

  def insert(s: Double, t: org.apache.spark.unsafe.types.UTF8String, pa: Long, pb: Long): Unit = {
    if (size == k && cmp(s, t, size - 1) >= 0) return
    var pos = if (size == k) size - 1 else size
    while (pos > 0 && cmp(s, t, pos - 1) < 0) pos -= 1
    val last = if (size == k) size - 1 else size
    var i = last
    while (i > pos) {
      scores(i) = scores(i - 1); terms(i) = terms(i - 1)
      pas(i) = pas(i - 1); pbs(i) = pbs(i - 1)
      i -= 1
    }
    scores(pos) = s; terms(pos) = t.clone(); pas(pos) = pa; pbs(pos) = pb
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKTermHeap): TopKTermHeap = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.terms(i), o.pas(i), o.pbs(i)); i += 1 }
    this
  }
}

/** Native bounded top-k with a string-keyed tie-break:
  * `graft_topk_term(score, term, pa, pb, k)` →
  * `array<struct<term string, pa bigint, pb bigint, score double>>`, the
  * k best entries ordered score DESC then term ASC.
  *
  * Built for per-document characteristic-term ranking
  * ([[graft.operators.Curation.tfidfTermsOf]]): a `row_number()` window
  * partitioned by doc_id re-clusters and SORTS the whole scored
  * (doc, term) stream to keep 5 rows per doc; this aggregate keeps the
  * per-doc heap map-side, so the exchange moves O(docs × k × tasks)
  * rows and nothing ever sorts. Rows with a NULL score or term are
  * ignored.
  */
case class TopKTermCollect(
    score: Expression,
    term: Expression,
    payloadA: Expression,
    payloadB: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKTermHeap] {

  require(k > 0, s"graft_topk_term requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, term, payloadA, payloadB)

  override def nullable: Boolean = false

  override def dataType: DataType = TopKTermCollect.ResultType

  override def prettyName: String = "graft_topk_term"

  override def createAggregationBuffer(): TopKTermHeap = new TopKTermHeap(k)

  @transient private lazy val fastPath: (InternalRow, TopKTermHeap) => Unit =
    (score, term, payloadA, payloadB) match {
      case (sr: BoundReference, tr: BoundReference, ar: BoundReference, br: BoundReference)
          if sr.dataType == DoubleType && tr.dataType == StringType &&
            ar.dataType == LongType && br.dataType == LongType =>
        (row, buf) =>
          if (!row.isNullAt(sr.ordinal) && !row.isNullAt(tr.ordinal)) {
            val a = if (row.isNullAt(ar.ordinal)) 0L else row.getLong(ar.ordinal)
            val b = if (row.isNullAt(br.ordinal)) 0L else row.getLong(br.ordinal)
            buf.insert(row.getDouble(sr.ordinal), row.getUTF8String(tr.ordinal), a, b)
          }
      case _ =>
        (row, buf) => {
          val s = score.eval(row)
          val t = term.eval(row)
          if (s != null && t != null) {
            val a = payloadA.eval(row)
            val b = payloadB.eval(row)
            buf.insert(
              s.asInstanceOf[Double],
              t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
              if (a == null) 0L else a.asInstanceOf[Long],
              if (b == null) 0L else b.asInstanceOf[Long])
          }
        }
    }

  override def update(buf: TopKTermHeap, input: InternalRow): TopKTermHeap = {
    fastPath(input, buf)
    buf
  }

  override def merge(buf: TopKTermHeap, other: TopKTermHeap): TopKTermHeap =
    buf.mergeFrom(other)

  override def eval(buf: TopKTermHeap): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = InternalRow(buf.terms(i), buf.pas(i), buf.pbs(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKTermHeap): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.size) { bytes += buf.terms(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(8 + buf.size * 28 + bytes)
    bb.putInt(buf.k).putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)).putLong(buf.pas(i)).putLong(buf.pbs(i))
      val tb = buf.terms(i).getBytes
      bb.putInt(tb.length)
      bb.put(tb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKTermHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKTermHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val a = bb.getLong(); val b = bb.getLong()
      val tb = new Array[Byte](bb.getInt())
      bb.get(tb)
      heap.insert(s, org.apache.spark.unsafe.types.UTF8String.fromBytes(tb), a, b)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTermCollect =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKTermCollect =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), term = newChildren(1),
      payloadA = newChildren(2), payloadB = newChildren(3))
}

object TopKTermCollect {
  val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("pa", LongType, nullable = false),
      StructField("pb", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  def fromArgs(exprs: Seq[Expression]): TopKTermCollect = {
    require(exprs.length == 5, s"graft_topk_term expects 5 arguments, got ${exprs.length}")
    TopKTermCollect(exprs(0), exprs(1), exprs(2), exprs(3),
      TopKCollect.kLiteral("graft_topk_term", exprs(4)))
  }
}

/** Open-addressing long→(sum, count) map on primitive parallel arrays —
  * the buffer of [[TopKMeanCollect]]. Bounded by the sub-key cardinality
  * of one group (suppliers of one brand), not by input rows.
  */
final class KeyedSumCount(initialCapacity: Int = 64) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  var keys = new Array[Long](cap)
  var used = new Array[Boolean](cap)
  var sums = new Array[Long](cap)
  var cnts = new Array[Long](cap)
  var size = 0

  @inline private def slot(k: Long): Int = {
    var i = (scala.util.hashing.byteswap64(k) & (cap - 1)).toInt
    while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
    i
  }

  def add(k: Long, sum: Long, cnt: Long): Unit = {
    if (size * 2 >= cap) grow()
    val i = slot(k)
    if (!used(i)) { used(i) = true; keys(i) = k; size += 1 }
    sums(i) += sum
    cnts(i) += cnt
  }

  private def grow(): Unit = {
    val (ok, ou, os, oc, ocap) = (keys, used, sums, cnts, cap)
    cap = ocap * 2
    keys = new Array[Long](cap); used = new Array[Boolean](cap)
    sums = new Array[Long](cap); cnts = new Array[Long](cap)
    size = 0
    var i = 0
    while (i < ocap) {
      if (ou(i)) add(ok(i), os(i), oc(i))
      i += 1
    }
  }

  def foreachEntry(f: (Long, Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (used(i)) f(keys(i), sums(i), cnts(i))
      i += 1
    }
  }
}

/** Single-shuffle grouped-mean top-k:
  * `graft_topk_mean(sub_key, cents, k)` aggregated per group →
  * `array<struct<id bigint, avg double, n bigint>>`: the k sub-keys with
  * the LOWEST mean (cents/100/n — "cheapest markets"), ordered mean ASC
  * then sub-key ASC.
  *
  * The two-level formulation (`groupBy(group, sub_key).agg(avg)` then a
  * per-group rank) pays two exchanges: one for the (group, sub_key)
  * aggregate and one to re-cluster by group for ranking. This kernel
  * aggregates per GROUP with the sub-key totals in an open-addressing
  * primitive map, so map-side combine still reduces input to per-task
  * (group × sub_key) partials, but the shuffle clusters by group
  * directly — ONE exchange, no second agg stage, no sort. Buffer memory
  * is one (long, long, long) triple per live sub-key of the group —
  * bounded by dimension cardinality (e.g. suppliers per brand), the same
  * bound the two-level aggregate's hash table had.
  *
  * Mean math is kept bit-identical to the long-cents discipline
  * ([[Exact.sumCents2]] composed with [[Exact.meanOf]]):
  * `(sum.toDouble / 100.0) / n.toDouble`. NULL cents still count toward
  * `n` (COUNT(*) semantics, matching the composed form where the decimal
  * sum skips NULLs but `cnt` does not).
  */
case class TopKMeanCollect(
    subKey: Expression,
    cents: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KeyedSumCount] {

  require(k > 0, s"graft_topk_mean requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(subKey, cents)

  override def nullable: Boolean = false

  override def dataType: DataType = TopKMeanCollect.ResultType

  override def prettyName: String = "graft_topk_mean"

  override def createAggregationBuffer(): KeyedSumCount = new KeyedSumCount()

  // unboxed fast path: after binding, non-nullable long children are
  // plain BoundReferences (the operator pre-projects the cents math into
  // a codegen'd Project), so update can read primitives straight off the
  // UnsafeRow instead of boxing two Longs per input row
  @transient private lazy val fastPath: (InternalRow, KeyedSumCount) => Unit =
    (subKey, cents) match {
      case (kr: BoundReference, cr: BoundReference)
          if kr.dataType == LongType && cr.dataType == LongType =>
        (row, buf) =>
          if (!row.isNullAt(kr.ordinal)) {
            val c = if (row.isNullAt(cr.ordinal)) 0L else row.getLong(cr.ordinal)
            buf.add(row.getLong(kr.ordinal), c, 1L)
          }
      case _ =>
        (row, buf) => {
          val key = subKey.eval(row)
          if (key != null) {
            val c = cents.eval(row)
            buf.add(key.asInstanceOf[Long], if (c == null) 0L else c.asInstanceOf[Long], 1L)
          }
        }
    }

  override def update(buf: KeyedSumCount, input: InternalRow): KeyedSumCount = {
    fastPath(input, buf)
    buf
  }

  override def merge(buf: KeyedSumCount, other: KeyedSumCount): KeyedSumCount = {
    other.foreachEntry((k, s, c) => buf.add(k, s, c))
    buf
  }

  override def eval(buf: KeyedSumCount): Any = {
    val n = buf.size
    val ids = new Array[Long](n)
    val avgs = new Array[Double](n)
    val cnts = new Array[Long](n)
    var i = 0
    buf.foreachEntry { (key, sum, cnt) =>
      ids(i) = key
      avgs(i) = (sum.toDouble / 100.0) / cnt.toDouble
      cnts(i) = cnt
      i += 1
    }
    // k is small: one bounded selection pass instead of a full sort
    val heap = new TopKHeap(math.min(k, n))
    i = 0
    while (i < n) {
      // mean ASC via score = -avg (negation is IEEE-exact); idx rides
      // along so the winning entries can be read back
      heap.insert(-avgs(i), ids(i), i)
      i += 1
    }
    val out = new Array[Any](heap.size)
    i = 0
    while (i < heap.size) {
      val src = heap.bs(i).toInt
      out(i) = InternalRow(heap.as(i), avgs(src), cnts(src))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: KeyedSumCount): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    buf.foreachEntry((k, s, c) => { bb.putLong(k); bb.putLong(s); bb.putLong(c) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KeyedSumCount = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KeyedSumCount(math.max(n, 16))
    var i = 0
    while (i < n) {
      buf.add(bb.getLong(), bb.getLong(), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMeanCollect =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKMeanCollect =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(subKey = newChildren(0), cents = newChildren(1))
}

object TopKMeanCollect {
  val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("avg", DoubleType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  def fromArgs(exprs: Seq[Expression]): TopKMeanCollect = {
    require(exprs.length == 3, s"graft_topk_mean expects 3 arguments, got ${exprs.length}")
    TopKMeanCollect(exprs(0), exprs(1), TopKCollect.kLiteral("graft_topk_mean", exprs(2)))
  }
}
