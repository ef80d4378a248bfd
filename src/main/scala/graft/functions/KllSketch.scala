package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable streaming quantile sketch — the uniform-capacity KLL-style
  * compactor hierarchy (Karnin, Lang, Liberty, "Optimal Quantile
  * Approximation in Streams", FOCS'16; the fixed-k simplification is the
  * classical Manku-Rajagopalan-Lindsay shape): level i holds items of
  * weight 2^i; a level reaching capacity k sorts itself and promotes
  * every other item to level i+1.
  *
  * Deviations from the randomized original, both deliberate:
  *  - DETERMINISTIC compaction coin: the keep-offset alternates per level
  *    instead of flipping a random coin. Successive compactions at a
  *    level cancel each other's rank bias, results are exactly
  *    reproducible for a fixed (input order, merge order), and no RNG
  *    state needs to ride the aggregation buffer. The price is the loss
  *    of the randomized high-probability bound; the worst-case
  *    DETERMINISTIC rank-error bound below is what the floor spec pins.
  *  - UNIFORM level capacity k (KLL proper shrinks low levels
  *    geometrically): simpler state, and the resulting worst-case rank
  *    error n·H/k (H = populated levels ≈ log2(n/k), since each of the
  *    ~n/(k·2^i) compactions at level i displaces a query rank by at
  *    most 2^i) is plenty at any realistic k — for k = 256 and n = 10^12
  *    (a 100 TB corpus), H ≈ 32 and the bound is 12.5% of n worst-case
  *    with typical error far below, or raise k: memory is k·H doubles
  *    per group, ~66 KB at that extreme.
  *
  * Unlike a fixed-bucket histogram the sketch assumes NOTHING about the
  * value domain (no [0, 1] clamp, no resolution floor) and its error is
  * uniform in RANK, not in value — the property a quality-floor gate
  * actually needs when score distributions are spiky.
  *
  * An odd item left over by a compaction stays at its level (standard
  * practice, e.g. Apache DataSketches' KLL), so no weight is ever
  * created or destroyed: total weight always equals the update count
  * (asserted cheaply in [[toBytes]]).
  */
final class KllSketch(val k: Int) {
  require(k >= 8 && k % 2 == 0, s"kll k must be even and >= 8, got $k")

  private[functions] val levels = ArrayBuffer(new ArrayBuffer[Double](16))
  private[functions] val parities = ArrayBuffer(false)
  /** Raw update count (== total carried weight). */
  var count: Long = 0L

  def update(v: Double): Unit = {
    // NaN is excluded rather than sorted to an arbitrary end: a quantile
    // over NaN has no rank semantics (mirrors percentile()'s null skip)
    if (java.lang.Double.isNaN(v)) return
    levels(0) += v
    count += 1
    if (levels(0).size >= k) compact(0)
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.size <= i) { levels += new ArrayBuffer[Double](16); parities += false }

  private def compact(i: Int): Unit = {
    val buf = levels(i)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    ensureLevel(i + 1)
    val keepOdd = parities(i)
    parities(i) = !keepOdd
    val even = sorted.length & ~1
    val up = levels(i + 1)
    var j = if (keepOdd) 1 else 0
    while (j < even) { up += sorted(j); j += 2 }
    buf.clear()
    if (even < sorted.length) buf += sorted(sorted.length - 1)
    if (up.size >= k) compact(i + 1)
  }

  /** Exact associative-up-to-rank-error merge: concatenate level-wise,
    * re-compact what overflows. Weights are conserved exactly. */
  def merge(o: KllSketch): KllSketch = {
    require(o.k == k, s"cannot merge kll sketches with different k ($k vs ${o.k})")
    count += o.count
    var i = 0
    while (i < o.levels.size) {
      ensureLevel(i)
      levels(i) ++= o.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.size) {
      if (levels(i).size >= k) compact(i)
      i += 1
    }
    this
  }

  /** Estimated order statistic at rank q·(count-1) — the first stored
    * value whose cumulative weight exceeds the target rank, the same
    * lower-style QUANTILE_CONT convention as the batch operator. */
  def quantile(q: Double): Double = {
    require(count > 0, "quantile of an empty sketch")
    val n = levels.iterator.map(_.size).sum
    val vs = new Array[Double](n)
    val ws = new Array[Long](n)
    var p = 0
    var lv = 0
    while (lv < levels.size) {
      val b = levels(lv)
      var j = 0
      while (j < b.size) { vs(p) = b(j); ws(p) = 1L << lv; p += 1; j += 1 }
      lv += 1
    }
    // indirect sort by value (n <= k·levels, tiny)
    val idx = (0 until n).sortBy(i => vs(i))
    val target = q * (count - 1).toDouble
    var cum = 0.0
    var i = 0
    while (i < n) {
      cum += ws(idx(i)).toDouble
      if (cum > target) return vs(idx(i))
      i += 1
    }
    vs(idx(n - 1))
  }

  def toBytes: Array[Byte] = {
    val sizes = levels.map(_.size)
    val bb = ByteBuffer.allocate(4 + 8 + 4 + levels.size * (1 + 4) + sizes.sum * 8)
    bb.putInt(k).putLong(count).putInt(levels.size)
    var i = 0
    while (i < levels.size) {
      bb.put(if (parities(i)) 1.toByte else 0.toByte)
      bb.putInt(levels(i).size)
      levels(i).foreach(bb.putDouble)
      i += 1
    }
    // weight conservation — a broken merge/compact fails loudly here
    val w = levels.iterator.zipWithIndex.map { case (b, l) => b.size.toLong << l }.sum
    require(w == count, s"kll weight drift: carried $w, counted $count")
    bb.array()
  }
}

object KllSketch {
  /** The engine-wide compactor capacity: one constant shared by every
    * quantile surface (batch approx thresholds, streaming floors), so
    * their sketches MERGE — a batch-built sketch can seed a streaming
    * state dir and vice versa. See the class doc for the error scaling
    * at this k. */
  val DefaultK = 256

  /** Deterministic worst-case RELATIVE rank error of a k-sketch over n
    * updates: 0 while the population fits one compactor level (stored
    * verbatim — the quantile is the exact order statistic; [[update]]
    * compacts AT the k-th insert, so that holds strictly below k), else
    * H/k with H the populated-level count (the class doc's n·H/k bound,
    * divided by n). Spec code uses this instead of re-deriving the
    * analysis per call site. */
  def rankErrorBound(n: Long, k: Int = DefaultK): Double =
    if (n < k) 0.0
    else (math.floor(math.log(n.toDouble / k) / math.log(2.0)) + 2.0) / k

  def fromBytes(bytes: Array[Byte]): KllSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new KllSketch(bb.getInt())
    s.count = bb.getLong()
    val nLevels = bb.getInt()
    var i = 0
    while (i < nLevels) {
      if (i > 0) { s.levels += new ArrayBuffer[Double](16); s.parities += false }
      s.parities(i) = bb.get() == 1.toByte
      val sz = bb.getInt()
      var j = 0
      while (j < sz) { s.levels(i) += bb.getDouble(); j += 1 }
      i += 1
    }
    s
  }
}

/** `graft_kll(value, k)` → BINARY serialized [[KllSketch]] over a double
  * column. Partial sketches combine map-side (TypedImperativeAggregate
  * merge), so the shuffle moves one ~k·log(n/k)·8-byte blob per (group,
  * task) — never values. NULL and NaN inputs are skipped. */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  // float/decimal/int children are cast by the analyzer; a non-numeric
  // child fails AT ANALYSIS with a type error, not at execution with a
  // ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllSketch, other: KllSketch): KllSketch = buf.merge(other)
  override def eval(buf: KllSketch): Any = buf.toBytes
  override def serialize(buf: KllSketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object KllAgg {
  def fromArgs(exprs: Seq[Expression]): KllAgg = {
    require(exprs.length == 2, s"graft_kll expects 2 arguments, got ${exprs.length}")
    KllAgg(exprs.head, TopKCollect.kLiteral("graft_kll", exprs(1)))
  }
}

/** `graft_kll_merge(sketch)` → BINARY: merges already-serialized sketches
  * (the micro-batch state fold — prev state and batch partial union in,
  * one sketch per group out). All inputs must share k. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  // a non-binary child is an analysis-time type error, not a runtime cast crash
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_merge"

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllSketch, other: KllSketch): KllSketch = buf.merge(other)
  override def eval(buf: KllSketch): Any = buf.toBytes
  override def serialize(buf: KllSketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object KllMergeAgg {
  def fromArgs(exprs: Seq[Expression]): KllMergeAgg = {
    require(exprs.length == 2, s"graft_kll_merge expects 2 arguments, got ${exprs.length}")
    KllMergeAgg(exprs.head, TopKCollect.kLiteral("graft_kll_merge", exprs(1)))
  }
}

/** `graft_kll_q(sketch, q)` → DOUBLE quantile estimate (NULL for an empty
  * sketch). CodegenFallback is fine here by design: quantile extraction
  * runs over group-cardinality frames (one row per language/brand), never
  * inside a fact scan. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_q"

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val s = KllSketch.fromBytes(sketch.asInstanceOf[Array[Byte]])
    if (s.count == 0) null else s.quantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
