package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared plumbing for fused binary vector kernels over float/double
  * arrays (see [[CosineSimilarity]] for the rationale: one codegen loop,
  * no intermediate arrays, both element types read natively). */
trait VectorPairKernel extends BinaryExpression {
  protected def elemIsDouble(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemIsDouble(left).isDefined && elemIsDouble(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  protected def get(x: ArrayData, i: Int, isDouble: Boolean): Double =
    if (isDouble) x.getDouble(i) else x.getFloat(i).toDouble

  protected def getter(side: Expression, arr: String, i: String): String =
    if (elemIsDouble(side).contains(true)) s"$arr.getDouble($i)"
    else s"(double) $arr.getFloat($i)"
}

/** Fused dot product: sum(a[i]*b[i]) in one pass. */
case class DotProduct(left: Expression, right: Expression) extends VectorPairKernel {
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (elemIsDouble(left).get, elemIsDouble(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(x, i, xd) * get(y, i, yd); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused nearest-centroid assignment: `graft_argmin_l2(vec, cents)` over
  * a vector and an array-of-vectors column returns the 0-based index of
  * the centroid with the smallest squared L2 distance (first index wins
  * ties — identical to `array_position(dists, array_min(dists)) - 1`
  * over per-centroid kernel results). ONE compiled loop over cells and
  * components; the frame-native Lloyd fit ([[graft.operators.Similarity
  * .ivfFit]]) evaluates this per corpus row per round, where a
  * `transform()` HOF would pay interpreted per-element lambda dispatch
  * at NList kernel calls per row. */
case class ArgminL2(left: Expression, right: Expression) extends BinaryExpression {
  private def vecElemIsDouble: Option[Boolean] = left.dataType match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }

  private def centsOk: Boolean = right.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecElemIsDouble.isDefined && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_argmin_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val vd = vecElemIsDouble.get
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.numElements()) {
      val cv = cents.getArray(c)
      val n = math.min(v.numElements(), cv.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = (if (vd) v.getDouble(i) else v.getFloat(i).toDouble) - cv.getDouble(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    if (best < 0) null else best
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val vGet =
        if (vecElemIsDouble.contains(true)) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      s"""
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $b.numElements(); $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($c);
         |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $vGet - $cv.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused squared L2 distance: sum((a[i]-b[i])^2) in one pass. */
case class L2SquaredDistance(left: Expression, right: Expression) extends VectorPairKernel {
  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (elemIsDouble(left).get, elemIsDouble(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(x, i, xd) - get(y, i, yd)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(left, a, i)} - ${getter(right, b, i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static core of [[Argmin2L2]] — the two nearest centroids by squared
  * L2, first-index-wins on ties (so (primary, secondary) is exactly the
  * first two entries of a stable distance sort). */
object Argmin2Kernel {
  def compute(v: ArrayData, cents: ArrayData, vecIsDouble: Boolean): ArrayData = {
    var b0 = -1; var d0 = Double.PositiveInfinity
    var b1 = -1; var d1 = Double.PositiveInfinity
    var c = 0
    val nc = cents.numElements()
    while (c < nc) {
      val cv = cents.getArray(c)
      val n = math.min(v.numElements(), cv.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = (if (vecIsDouble) v.getDouble(i) else v.getFloat(i).toDouble) - cv.getDouble(i)
        acc += d * d
        i += 1
      }
      if (acc < d0) { b1 = b0; d1 = d0; b0 = c; d0 = acc }
      else if (acc < d1) { b1 = c; d1 = acc }
      c += 1
    }
    if (b0 < 0) null
    // single-centroid quantizer: PAD by repeating the primary so the
    // output is always 2 entries — element_at(cs, 2) consumers stay
    // total (ANSI-safe) on degenerate corpora; the dedup explode drops
    // the duplicate slot (Similarity.embeddingDedupCellsOf)
    else if (b1 < 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(b0, b0))
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(b0, b1))
  }
}

/** `graft_argmin2_l2(vec, cents)`: ARRAY<INT> of the TWO nearest
  * centroid indices (just the nearest when only one centroid exists) —
  * [[ArgminL2]]'s top-2 sibling, the multi-assignment step of
  * cluster-blocked dedup (a vector near a cell boundary must block with
  * BOTH neighboring cells or boundary near-dup pairs are lost). */
case class Argmin2L2(left: Expression, right: Expression) extends BinaryExpression {
  private def vecElemIsDouble: Option[Boolean] = left.dataType match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecElemIsDouble.isDefined && (right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin2_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Argmin2Kernel.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], vecElemIsDouble.get)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.Argmin2Kernel.compute($a, $b, ${vecElemIsDouble.get});
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
