package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The shared random-hyperplane family for LSH bucketing (library
  * constants, seeded — NOT runtime randomness: corpus-side index buckets
  * and query-side probe buckets must agree across jobs and across runs).
  */
object Hyperplanes {
  val Bands = 8
  val PlanesPerBand = 4
  val Dim = 64

  /** Row-major flattened plane matrix: plane (b * PlanesPerBand + r) lives
    * at offset (b * PlanesPerBand + r) * Dim. */
  val flat: IndexedSeq[Double] = {
    val rnd = new scala.util.Random(11)
    IndexedSeq.fill(Bands * PlanesPerBand * Dim)(rnd.nextGaussian())
  }
}

/** Native sign-bit LSH bucketing: for each band b, bucket(b) packs the
  * sign bits of the vector's dot products with that band's hyperplanes.
  * With `multiProbe` the output interleaves, per band, the primary bucket
  * and the multi-probe alternate (primary with the weakest-margin sign
  * bit flipped — the bit most likely to differ for a true near
  * neighbor), so `posexplode` yields band = pos >> 1.
  *
  * WHY a native expression: the previous formulation composed 32
  * `graft_dot(vec, array(<64 lit doubles>))` calls, inlining 2048 double
  * literals into the generated projection — janino refused to compile it
  * ("Whole-stage codegen disabled", InternalCompilerException) and the
  * hot probe path ran interpreted. Here the plane matrix is ONE
  * broadcast-referenced `double[]` (`ctx.addReferenceObj`), the generated
  * code is three short loops regardless of dims/bands, and the whole scan
  * stays inside whole-stage codegen. PlatformSpec compiles the generated
  * code directly (no fallback tolerated) and checks it against the
  * interpreted path.
  */
case class HyperplaneBuckets(
    child: Expression,
    planesFlat: IndexedSeq[Double],
    dim: Int,
    planesPerBand: Int,
    multiProbe: Boolean)
    extends UnaryExpression {

  private val bands: Int = planesFlat.length / (dim * planesPerBand)

  @transient private lazy val flatArr: Array[Double] = planesFlat.toArray

  private def elemIsDouble: Option[Boolean] = child.dataType match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemIsDouble.isDefined) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> or array<double> argument, " +
          s"got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String =
    if (multiProbe) "graft_hplane_probe" else "graft_hplane_index"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isD = elemIsDouble.get
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](if (multiProbe) 2 * bands else bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var weakest = 0
      var minAbs = Double.PositiveInfinity
      var r = 0
      while (r < planesPerBand) {
        val off = (b * planesPerBand + r) * dim
        var d = 0.0
        var i = 0
        while (i < n) {
          val xi = if (isD) v.getDouble(i) else v.getFloat(i).toDouble
          d += xi * flatArr(off + i)
          i += 1
        }
        if (d > 0) bucket |= 1 << r
        val a = math.abs(d)
        if (a < minAbs) { minAbs = a; weakest = r }
        r += 1
      }
      if (multiProbe) {
        out(2 * b) = bucket
        out(2 * b + 1) = bucket ^ (1 << weakest)
      } else out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planes = ctx.addReferenceObj("planes", flatArr, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val a = ctx.freshName("a")
      val bucket = ctx.freshName("bucket")
      val weakest = ctx.freshName("weakest")
      val minAbs = ctx.freshName("minAbs")
      val getter =
        if (elemIsDouble.contains(true)) s"$v.getDouble($i)"
        else s"(double) $v.getFloat($i)"
      val store =
        if (multiProbe)
          s"$out[2 * $b] = $bucket; $out[2 * $b + 1] = $bucket ^ (1 << $weakest);"
        else s"$out[$b] = $bucket;"
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int[] $out = new int[${if (multiProbe) 2 * bands else bands}];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $bucket = 0; int $weakest = 0;
         |  double $minAbs = Double.POSITIVE_INFINITY;
         |  for (int $r = 0; $r < $planesPerBand; $r++) {
         |    int $off = ($b * $planesPerBand + $r) * $dim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $d += $getter * $planes[$off + $i];
         |    }
         |    if ($d > 0) $bucket |= 1 << $r;
         |    double $a = java.lang.Math.abs($d);
         |    if ($a < $minAbs) { $minAbs = $a; $weakest = $r; }
         |  }
         |  $store
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
