package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
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

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    if (s != null) {
      val a = idA.eval(input)
      val b = idB.eval(input)
      buf.insert(
        s.asInstanceOf[Double],
        if (a == null) 0L else a.asInstanceOf[Long],
        if (b == null) 0L else b.asInstanceOf[Long])
    }
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
}
