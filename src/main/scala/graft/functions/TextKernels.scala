package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared string-input type gate for the text kernels. */
trait TextKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document signature kernels.
  *
  * SimHash and MinHash signatures are pure per-document functions, so
  * computing them with explode + distinct + groupBy (the r1 formulation)
  * paid two full shuffles of the exploded token stream — ~10x the corpus
  * size through the wire — just to reduce back to one row per document.
  * These kernels compute the signature inside the scan projection: zero
  * shuffles, and re-deriving signatures in multi-pass plans (e.g. the
  * hot-bucket cap's frequency pass) costs another scan, not another
  * shuffle. At 100 TB this is the difference between a map-only pass and
  * the largest shuffle in the pipeline.
  *
  * Tokenization matches the DataFrame formulation bit-for-bit:
  * `trim` strips ASCII spaces only, `\s+` collapses via java.util.regex
  * (what Spark's regexp_replace uses), words hash with Spark's xxhash64
  * (XXH64, seed 42) over UTF-8 bytes. The heavy logic lives in static
  * kernel objects so generated code is a one-line call (JIT-compiled like
  * any JVM method — no janino size risk).
  */
/** Shared tokenization for the text kernels: the trim / collapse / split
  * semantics of the column formulation, with the whitespace pattern
  * compiled ONCE (these run once per row on the scan hot path). */
private[functions] object TextNorm {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Spark `trim`: ASCII space only (String.trim would also strip \t\n
    * and diverge from the column formulation). */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  /** trim + collapse runs of whitespace to single spaces. */
  def normalize(s: String): String = Ws.matcher(trimSpaces(s)).replaceAll(" ")

  /** split(" ", -1) semantics over a normalized string — an empty string
    * yields one empty word, as the column form does. */
  def words(norm: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    eachWord(norm)(out += _)
    out
  }

  /** Streaming variant of [[words]] — no buffer; kernels that only need
    * each word once (SimHash) avoid materializing the token list on the
    * per-row hot path. */
  def eachWord(norm: String)(f: String => Unit): Unit = {
    var start = 0
    while (start <= norm.length) {
      val sp = norm.indexOf(' ', start)
      val end = if (sp < 0) norm.length else sp
      f(norm.substring(start, end))
      start = end + 1
      if (sp < 0) start = norm.length + 1
    }
  }

  def xxh64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }
}

object SimHashKernel {

  /** 64-bit SimHash over DISTINCT word hashes: per bit, sign of the sum
    * of +/-1 contributions. Identical values to the aggregate form. */
  def compute(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    val seen = new java.util.HashSet[java.lang.Long]()
    TextNorm.eachWord(TextNorm.normalize(text.toString)) { w =>
      val h = TextNorm.xxh64(w)
      if (seen.add(h)) {
        var i = 0
        while (i < 64) {
          counts(i) += (((h >>> i) & 1L) * 2 - 1).toInt
          i += 1
        }
      }
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) bits |= 1L << i
      i += 1
    }
    bits
  }
}

object MinHashKernel {
  val K = 32
  private val Mersenne31 = (1L << 31) - 1

  /** Deterministic universal-hash coefficients (seeded; library
    * constants). Kept under 2^31 so a*h+b stays well inside a long. */
  val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Array.fill(K)((math.abs(rnd.nextLong()) % (Mersenne31 - 1) + 1,
      math.abs(rnd.nextLong()) % Mersenne31))
  }

  val ShingleN = 5

  /** K-slot MinHash signature over 5-word shingles, or null for docs
    * shorter than one shingle (they cannot near-dup at n=5). Shingle
    * hashing and the affine family match the aggregate form exactly:
    * sig_j = min over shingles of ((a_j * (xxhash64(shingle) mod M) +
    * b_j) mod M), M = 2^31-1. */
  def compute(text: UTF8String): Array[Long] = {
    val words = TextNorm.words(TextNorm.normalize(text.toString))
    if (words.length < ShingleN) return null
    val sigs = Array.fill(K)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + ShingleN <= words.length) {
      sb.setLength(0)
      var j = i
      while (j < i + ShingleN) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      val h31 = java.lang.Math.floorMod(TextNorm.xxh64(sb.toString), Mersenne31)
      var k = 0
      while (k < K) {
        val (a, b) = coeffs(k)
        val v = java.lang.Math.floorMod(a * h31 + b, Mersenne31)
        if (v < sigs(k)) sigs(k) = v
        k += 1
      }
      i += 1
    }
    sigs
  }
}

object ShingleKernel {
  /** Distinct 5-word-shingle xxhash64 set of a document, in first-
    * occurrence order (deterministic), or null for docs shorter than one
    * shingle. Matches `distinct (doc_id, xxhash64(shingle))` of the
    * column formulation exactly, but computes per row inside the scan —
    * the n-gram pipeline then explodes an already-deduplicated array
    * instead of shuffling the raw shingle stream through a DISTINCT. */
  def compute(text: UTF8String, n: Int): Array[Long] = {
    val words = TextNorm.words(TextNorm.normalize(text.toString))
    if (words.length < n) return null
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(TextNorm.xxh64(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

/** shingle_set(text): ARRAY<LONG> of distinct shingle hashes, NULL for
  * docs shorter than one shingle (see [[ShingleKernel]]). */
case class ShingleHashSet(child: Expression, n: Int) extends TextKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_set"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = ShingleKernel.compute(input.asInstanceOf[UTF8String], n)
    if (hs == null) null else new GenericArrayData(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hs = ctx.freshName("hs")
      s"""
         |long[] $hs = graft.functions.ShingleKernel.compute($c, $n);
         |if ($hs == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($hs);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash64(text): LONG SimHash signature (see [[SimHashKernel]]). */
case class SimHash64(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sigs(text): ARRAY<LONG> of K MinHash slots, NULL for docs
  * shorter than one shingle (see [[MinHashKernel]]). */
case class MinHashSigs(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val sigs = MinHashKernel.compute(input.asInstanceOf[UTF8String])
    if (sigs == null) null else new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sigs = ctx.freshName("sigs")
      s"""
         |long[] $sigs = graft.functions.MinHashKernel.compute($c);
         |if ($sigs == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
