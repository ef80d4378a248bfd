package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary search over a per-key as-of series.
  *
  * The series is `array<struct<_t: long, _v: double>>` sorted ascending
  * by (_t, _v) — the broadcast as-of join's per-key representation. The
  * lookup returns the value of the LAST element with `_t <= t` (max
  * time; max value among duplicates of that time, because the sort puts
  * it last), or null when no element qualifies — exactly the
  * union+window form's `last(value) ignore nulls` with its
  * value-ascending tie-break.
  *
  * A native expression instead of the `aggregate`/`filter` HOF
  * composition: the HOFs walk all n elements through lambda-variable
  * machinery per fact row, where this is log2(n) long compares in one
  * JIT-compiled loop — the preferred extension order from SURVEY §4
  * (native `Expression` with `doGenCode` over composed HOFs on a hot
  * path).
  */
object AsOfKernel {
  /** Last element with time <= t, or null. `series` must be sorted
    * ascending by (time, value). */
  def lookup(series: ArrayData, t: Long): java.lang.Double = {
    var lo = 0
    var hi = series.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (series.getStruct(mid, 2).getLong(0) <= t) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) null else java.lang.Double.valueOf(series.getStruct(ans, 2).getDouble(1))
  }
}

/** graft_asof_lookup(series, t): see [[AsOfKernel]]. */
case class AsOfLookup(left: Expression, right: Expression) extends BinaryExpression {

  private val seriesType =
    ArrayType(StructType(Seq(
      StructField("_t", LongType, nullable = false),
      StructField("_v", DoubleType, nullable = false))))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StructType(Array(a, b)), _), LongType)
        if a.dataType == LongType && b.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (${seriesType.sql}, BIGINT), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_asof_lookup"

  override protected def nullSafeEval(series: Any, t: Any): Any =
    AsOfKernel.lookup(series.asInstanceOf[ArrayData], t.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (series, t) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.AsOfKernel.lookup($series, $t);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
