package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** First byte (0..255) of md5 over the ASCII key `"<a>-<b>"`.
  *
  * The content-keyed sampling convention ([[graft.operators.Incremental
  * .backfillRollup]]'s late batch, same md5 discipline as trainSplit)
  * compares a hex PREFIX of md5 — `SUBSTR(MD5(a || '-' || b), 1, 2) <
  * 'xx'` in the DuckDB oracle. For equal-length lowercase hex, that
  * string compare IS the numeric compare of the first digest byte, so
  * the engine only needs that byte. Spark's built-in path
  * (`substring(md5(concat_ws(...)))`) allocates a UTF8String for the
  * key, hex-encodes all 16 digest bytes, slices, and string-compares —
  * per fact row. This kernel writes the decimal key straight into a
  * reused byte buffer, digests with a thread-local MessageDigest, and
  * returns `digest[0] & 0xFF`; the caller compares against
  * `Integer.parseInt(prefix, 16)`. Same selection, ~3x less per-row
  * work on the md5 flag (measured at sf0.1).
  */
object Md5BucketKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // key bytes buffer: 20 digits + sign, '-', 20 digits + sign
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](44)
  }

  /** ASCII decimal digits of v written into b starting at off; returns
    * the new offset. Matches `Long.toString` (and SQL CAST AS VARCHAR)
    * byte-for-byte, including negative values. */
  private def writeLong(b: Array[Byte], off0: Int, v0: Long): Int = {
    var off = off0
    var v = v0
    if (v == 0) { b(off) = '0'; return off + 1 }
    if (v < 0) { b(off) = '-'; off += 1; }
    // digits are generated backwards into the tail of a 20-byte window
    var i = 0
    val tmp = new Array[Byte](20)
    var u = if (v < 0) v else -v // negate into the wider negative range
    while (u != 0) { tmp(i) = ('0' - (u % 10)).toByte; u /= 10; i += 1 }
    while (i > 0) { i -= 1; b(off) = tmp(i); off += 1 }
    off
  }

  def compute(a: Long, b: Long): Int = {
    val k = buf.get()
    var off = writeLong(k, 0, a)
    k(off) = '-'
    off = writeLong(k, off + 1, b)
    val d = md.get()
    d.reset()
    d.update(k, 0, off)
    d.digest()(0) & 0xFF
  }
}

/** graft_md5_bucket(a BIGINT, b BIGINT): INT in 0..255 — see
  * [[Md5BucketKernel]]. */
case class Md5Bucket(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_md5_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Md5BucketKernel.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Md5BucketKernel.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : Expression = copy(left = newLeft, right = newRight)
}
