package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Per-step candidate-timestamp buffer for the ordered-funnel stamps
  * aggregate — the mergeable replacement for the chained running-min
  * window build ([[graft.operators.Events.funnelStampsWindowed]]).
  *
  * Semantics being computed (identical to the window form): `s0` is the
  * earliest step-0 timestamp; `s_i` is the earliest step-i timestamp
  * STRICTLY after `s_{i-1}` (null whenever `s_{i-1}` is null).
  *
  * Why the state is per-step candidate SETS and not "one timestamp per
  * step": a partial that saw `view@15` but no `signup` cannot evaluate
  * its chain locally — the final `s0` may arrive from another partition,
  * and then ANY of this partial's view stamps could become `s1`. The
  * minimal sound state is, per step, the set of timestamps that could
  * still win under some feasible upstream stamp.
  *
  * That set compacts hard. Adding events never increases any stamp
  * (monotonicity), so the final `s_{i-1}` is bounded above by this
  * buffer's own locally-evaluated chain value `T_{i-1}` (+∞ while the
  * local chain is incomplete). For a sorted, deduplicated step-i
  * candidate list, an element `x` can be `min{c > t}` for some feasible
  * `t ≤ T_{i-1}` only if its predecessor is `≤ T_{i-1}` — so compaction
  * keeps `{x ≤ T_{i-1}}` plus the single first element above, and a
  * buffer whose local chain completes early (the common case: any
  * partition of a hot user's history) collapses to ~1 candidate per
  * step. A partition holding e.g. only step-1 events keeps them all —
  * that is not a flaw, it is the information-theoretic minimum.
  *
  * Update appends unsorted; compaction (sort + dedupe + prune) runs when
  * an array fills, before every serialize, and at eval — O(n log n)
  * amortized, no per-row allocation. Merge concatenates compacted
  * buffers. Equal timestamps are interchangeable under strict `>`, so
  * dedup is lossless.
  */
final class FunnelState(val k: Int) {
  private[functions] var arrs: Array[Array[Long]] = Array.fill(k)(new Array[Long](8))
  private[functions] val sizes: Array[Int] = new Array[Int](k)
  /** Local chain values after the last [[compact]]; [[FunnelState.None]]
    * where the chain is locally incomplete. At eval time (all partials
    * merged) these ARE the final stamps. */
  private[functions] val chain: Array[Long] = Array.fill(k)(FunnelState.None)

  def add(step: Int, ts: Long): Unit = {
    var a = arrs(step)
    if (sizes(step) == a.length) {
      compact()
      a = arrs(step)
      // compaction didn't reclaim most of the array: this partition
      // genuinely needs the candidates — grow and amortize
      if (sizes(step) > a.length - a.length / 4) {
        a = java.util.Arrays.copyOf(a, a.length * 2)
        arrs(step) = a
      }
    }
    a(sizes(step)) = ts
    sizes(step) += 1
  }

  def addAll(o: FunnelState): Unit = {
    var i = 0
    while (i < k) {
      var j = 0
      while (j < o.sizes(i)) { add(i, o.arrs(i)(j)); j += 1 }
      i += 1
    }
  }

  /** Sort + dedupe + prune every step against the local chain. Treating
    * the virtual `T_{-1}` as defined-at-−∞ makes step 0 the same rule:
    * keep `{x ≤ −∞} ∪ {first x > −∞}` = the minimum alone. */
  def compact(): Unit = {
    var prevT = Long.MinValue
    var prevDefined = true
    var i = 0
    while (i < k) {
      val a = arrs(i)
      val n = sizes(i)
      java.util.Arrays.sort(a, 0, n)
      var w = 0
      var r = 0
      var thisT = FunnelState.None
      var thisDefined = false
      var last = 0L
      var has = false
      while (r < n) {
        val x = a(r)
        if (!has || x != last) {
          last = x; has = true
          if (!prevDefined) {
            // upstream chain unresolved: every distinct stamp may matter
            a(w) = x; w += 1
          } else if (!thisDefined) {
            a(w) = x; w += 1
            if (x > prevT) { thisT = x; thisDefined = true }
          }
          // prevDefined && thisDefined: x > thisT > prevT — dead, since
          // the final s_i is ≤ thisT (thisT qualifies for every feasible
          // upstream stamp t ≤ prevT)
        }
        r += 1
      }
      sizes(i) = w
      chain(i) = if (thisDefined) thisT else FunnelState.None
      prevT = thisT
      prevDefined = thisDefined
      i += 1
    }
  }
}

object FunnelState {
  /** Timestamp sentinel for "chain incomplete" — epoch-millisecond
    * stamps never reach Long.MaxValue. */
  val None: Long = Long.MaxValue
}

/** Mergeable ordered-funnel stamps:
  * `graft_funnel_stamps(step, ts, k)` aggregated per user →
  * `struct<s0 bigint, …, s{k-1} bigint>` where `s0` is the user's
  * earliest step-0 timestamp and `s_i` the earliest step-i timestamp
  * strictly after `s_{i-1}` (first-occurrence funnel semantics, ties
  * never qualify).
  *
  * This replaces the chained running-min window build: the window form
  * sorts every event row of a user inside ONE task — the suite's single
  * disclosed skew bound, since a hot user's whole history serialized
  * through that sort and AQE cannot split a window partition. Here
  * partial buffers build map-side in parallel across whatever
  * partitions the hot user's rows land on, the exchange moves compacted
  * candidate stamps (typically ~1 per step), and the final merge is a
  * concatenation + one compaction over longs — the per-user SORT is
  * gone from the plan entirely.
  *
  * Rows with a NULL step ordinal (non-funnel event types) or NULL
  * timestamp are ignored; the group row itself still materializes, so
  * the output frame matches the window form user-for-user.
  */
case class FunnelStampsAgg(
    step: Expression,
    ts: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FunnelState] with ImplicitCastInputTypes {

  require(k > 0 && k <= 16, s"graft_funnel_stamps requires 0 < k <= 16, got $k")

  override def children: Seq[Expression] = Seq(step, ts)

  // a SQL call with a BIGINT step or non-long ts must fail (or cast) at
  // ANALYSIS, not ClassCastException inside the generic eval path on an
  // executor (r12 advice)
  override def inputTypes: Seq[DataType] = Seq(IntegerType, LongType)

  override def nullable: Boolean = false

  override def dataType: DataType = FunnelStampsAgg.resultType(k)

  override def prettyName: String = "graft_funnel_stamps"

  override def createAggregationBuffer(): FunnelState = new FunnelState(k)

  // unboxed fast path when the operator pre-projects the step ordinal
  // (a when-chain over event_type) into a codegen'd Project
  @transient private lazy val fastPath: (InternalRow, FunnelState) => Unit =
    (step, ts) match {
      case (sr: BoundReference, tr: BoundReference)
          if sr.dataType == IntegerType && tr.dataType == LongType =>
        (row, buf) =>
          if (!row.isNullAt(sr.ordinal) && !row.isNullAt(tr.ordinal)) {
            val s = row.getInt(sr.ordinal)
            if (s >= 0 && s < k) buf.add(s, row.getLong(tr.ordinal))
          }
      case _ =>
        (row, buf) => {
          val s = step.eval(row)
          val t = ts.eval(row)
          if (s != null && t != null) {
            val si = s.asInstanceOf[Int]
            if (si >= 0 && si < k) buf.add(si, t.asInstanceOf[Long])
          }
        }
    }

  override def update(buf: FunnelState, input: InternalRow): FunnelState = {
    fastPath(input, buf)
    buf
  }

  override def merge(buf: FunnelState, other: FunnelState): FunnelState = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: FunnelState): Any = {
    buf.compact()
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (buf.chain(i) == FunnelState.None) null else buf.chain(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override def serialize(buf: FunnelState): Array[Byte] = {
    buf.compact()
    var total = 8
    var i = 0
    while (i < buf.k) { total += 4 + buf.sizes(i) * 8; i += 1 }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.k)
    bb.putInt(0) // reserved
    i = 0
    while (i < buf.k) {
      val n = buf.sizes(i)
      bb.putInt(n)
      var j = 0
      while (j < n) { bb.putLong(buf.arrs(i)(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FunnelState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new FunnelState(bb.getInt())
    bb.getInt() // reserved
    var i = 0
    while (i < st.k) {
      val n = bb.getInt()
      var j = 0
      while (j < n) { st.add(i, bb.getLong()); j += 1 }
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelStampsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FunnelStampsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(step = newChildren(0), ts = newChildren(1))
}

object FunnelStampsAgg {
  def resultType(k: Int): StructType =
    StructType((0 until k).map(i => StructField(s"s$i", LongType, nullable = true)))

  /** Registry builder: the 3rd argument must be a foldable int literal. */
  def fromArgs(exprs: Seq[Expression]): FunnelStampsAgg = {
    require(exprs.length == 3, s"graft_funnel_stamps expects 3 arguments, got ${exprs.length}")
    FunnelStampsAgg(exprs(0), exprs(1),
      TopKCollect.kLiteral("graft_funnel_stamps", exprs(2)))
  }
}
