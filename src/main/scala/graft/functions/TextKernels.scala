package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
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

  /** java.util.regex `\s` — ASCII-only (Unicode spaces are word chars,
    * exactly as the column formulation treats them). */
  def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r'

  /** [[words]]([[normalize]](s)) in ONE scan without the regex pass:
    * space-only trim, then segments between `\s+` runs (a leading or
    * trailing run inside the trimmed region yields an empty word, exactly
    * as replaceAll(" ") + split(" ") does). The kernels' per-row hot path —
    * GraftProps proves equivalence against the regex formulation. */
  def wordsDirect(s: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    var i = b
    var start = i
    while (i < e) {
      if (isJavaWs(s.charAt(i))) {
        out += s.substring(start, i)
        i += 1
        while (i < e && isJavaWs(s.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    out += s.substring(start, e)
    out
  }

  /** xxhash64 of every n-word shingle, allocation-free per shingle: each
    * word is UTF-8-encoded ONCE, then shingle bytes (words joined by a
    * single space) are assembled in a reusable buffer and hashed in
    * place. Byte-identical to `xxh64(words.slice(i, i+n).mkString(" "))`
    * — String.getBytes(UTF_8) is exactly what UTF8String.fromString
    * hashes. */
  def eachShingleHash(words: scala.collection.mutable.ArrayBuffer[String], n: Int)(
      f: Long => Unit): Unit = {
    val m = words.length
    if (m < n) return
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      bytes(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    var buf = new Array[Byte](128)
    i = 0
    while (i + n <= m) {
      var len = n - 1
      var j = i
      while (j < i + n) { len += bytes(j).length; j += 1 }
      if (len > buf.length) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      j = i
      while (j < i + n) {
        if (j > i) { buf(pos) = ' '; pos += 1 }
        val b = bytes(j)
        System.arraycopy(b, 0, buf, pos, b.length)
        pos += b.length
        j += 1
      }
      f(XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, 42L))
      i += 1
    }
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
    val words = TextNorm.wordsDirect(text.toString)
    if (words.length < ShingleN) return null
    val sigs = Array.fill(K)(Long.MaxValue)
    TextNorm.eachShingleHash(words, ShingleN) { h =>
      val h31 = java.lang.Math.floorMod(h, Mersenne31)
      var k = 0
      while (k < K) {
        val (a, b) = coeffs(k)
        val v = java.lang.Math.floorMod(a * h31 + b, Mersenne31)
        if (v < sigs(k)) sigs(k) = v
        k += 1
      }
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
    val words = TextNorm.wordsDirect(text.toString)
    if (words.length < n) return null
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    TextNorm.eachShingleHash(words, n)(h => seen.add(h))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

/** Per-document DISTINCT n-gram hashes WITH multiplicity — the
  * [[ShingleKernel]] set plus each gram's occurrence count, computed in
  * one scan pass. Lets the span-duplication operators ship per-doc
  * distinct (hash, count) pairs through their exchanges instead of one
  * row per gram position: the document-frequency aggregate becomes a
  * plain COUNT over pre-deduplicated rows (single-phase, no
  * countDistinct two-phase), and per-doc position tallies recover
  * exactly as Σ count. Open addressing on the 8-byte hash; count==0
  * marks an empty slot (an occupied slot's count is always ≥1), so a
  * gram hashing to literal 0 is still stored correctly.
  *
  * The grow/add scaffolding is DELIBERATELY repeated across this
  * file's count kernels ([[WordCountsKernel]] keys by one byte range,
  * [[BigramCountsKernel]] by two, this one by a long): these loops run
  * once per row on the scan hot path, and a shared helper would either
  * box the key abstraction or go megamorphic at the probe call site —
  * the per-kernel monomorphic loops are what the JIT inlines. */
object GramCountsKernel {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words = TextNorm.wordsDirect(text.toString)
    if (words.length < n) return null
    var cap = 64
    var keys = new Array[Long](cap)
    var cnts = new Array[Long](cap)
    var size = 0

    def grow(): Unit = {
      val (ok, oc, ocap) = (keys, cnts, cap)
      cap *= 2
      keys = new Array[Long](cap); cnts = new Array[Long](cap)
      size = 0
      var i = 0
      while (i < ocap) {
        if (oc(i) != 0L) add(ok(i), oc(i))
        i += 1
      }
    }

    def add(h: Long, c: Long): Unit = {
      if (size * 2 >= cap) grow()
      var i = (java.lang.Long.hashCode(h * 0x9e3779b97f4a7c15L)) & (cap - 1)
      while (cnts(i) != 0L) {
        if (keys(i) == h) { cnts(i) += c; return }
        i = (i + 1) & (cap - 1)
      }
      keys(i) = h; cnts(i) = c; size += 1
    }

    TextNorm.eachShingleHash(words, n)(h => add(h, 1L))

    val out = new Array[Any](size)
    var k = 0
    var i = 0
    while (i < cap) {
      if (cnts(i) != 0L) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(keys(i), cnts(i))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_gram_counts(text, n): ARRAY<STRUCT<h bigint, c bigint>> of the
  * document's distinct n-gram xxhash64 values with occurrence counts
  * (see [[GramCountsKernel]]); null for docs under one gram. */
case class GramCounts(child: Expression, n: Int) extends TextKernelExpr {
  // a non-positive gram width degenerates silently (r11 ADVICE) — fail
  // at construction like the non-literal argument path does
  require(n > 0, s"graft_gram_counts requires n > 0, got $n")
  override def dataType: DataType = GramCountsKernel.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_counts"

  override protected def nullSafeEval(input: Any): Any =
    GramCountsKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.GramCountsKernel.compute($c, $n);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $arr;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-document winnowing sketch (Schleimer et al. 2003, the MOSS
  * local fingerprinting scheme) in one pass — the kernel form of the
  * explode + window-min + distinct + groupBy pipeline, which shuffled
  * GRAM-SCALE rows through three exchanges for a result that is a pure
  * per-document function (the simhash/minhash lesson applied to
  * winnowing). Gram hashing is [[TextNorm.eachShingleHash]] —
  * byte-identical to `xxhash64(concat_ws(' ', slice(w, i, k)))` — and
  * the sliding window minimum runs on a monotonic deque, O(grams)
  * total. Sketch = the DISTINCT minima over windows starting at
  * 0..max(n_grams - w, 0) (a doc with fewer than w grams keeps its
  * single partial window, per winnowing convention); emitted as
  * (count, min, xor) exactly like the column form's rollup. Returns
  * null for docs shorter than one gram (absent from the result, as the
  * column form's size filter made them). */
object WinnowKernel {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: DataType = StructType(Seq(
    StructField("sketch_size", LongType, nullable = false),
    StructField("sketch_min", LongType, nullable = false),
    StructField("sketch_xor", LongType, nullable = false)))

  def compute(text: UTF8String, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val words = TextNorm.wordsDirect(text.toString)
    if (words.length < k) return null
    val n = words.length - k + 1
    val hs = new Array[Long](n)
    var idx = 0
    TextNorm.eachShingleHash(words, k) { h => hs(idx) = h; idx += 1 }
    val lastStart = math.max(n - w, 0)
    val dq = new Array[Int](n) // monotonic deque of indices, hs ascending
    var head = 0
    var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    var size = 0L
    var mn = Long.MaxValue
    var xr = 0L
    var i = 0
    var j = 0
    while (i <= lastStart) {
      val end = math.min(i + w - 1, n - 1)
      while (j <= end) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        j += 1
      }
      while (dq(head) < i) head += 1
      val m = hs(dq(head))
      if (seen.add(m)) { size += 1L; if (m < mn) mn = m; xr ^= m }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(size, mn, xr)
  }
}

/** graft_winnow(text, k, w): STRUCT<sketch_size, sketch_min, sketch_xor
  * bigint> — see [[WinnowKernel]]; null for docs under one k-gram. */
case class WinnowSketch(child: Expression, k: Int, w: Int) extends TextKernelExpr {
  // a non-positive window would read uninitialized deque slots and
  // return silent garbage (r11 ADVICE) — fail at construction instead
  require(k > 0, s"graft_winnow requires k > 0, got $k")
  require(w > 0, s"graft_winnow requires w > 0, got $w")
  override def dataType: DataType = WinnowKernel.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("row")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row =
         |  graft.functions.WinnowKernel.compute($c, $k, $w);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass corpus text statistics.
  *
  * The quality/language-ID/token operators were originally 9+ independent
  * `regexp_count`/`regexp_replace` columns, each re-scanning the document
  * through java.util.regex — correct, but the per-core bottleneck of every
  * composed corpus query (the only suite queries >2x the DuckDB baseline
  * in r2). This kernel computes every counter those regexes produce in ONE
  * scan of the string, bit-identical to the java.util.regex semantics the
  * column formulation uses (and that the DuckDB oracles were validated
  * against):
  *
  *  - `n_chars`        = `length(text)` — code points, not UTF-16 units
  *  - `n_ws_tokens`    = `size(split(trim(text), "\\s+"))` — Spark `trim`
  *                       strips ASCII spaces only; java `Pattern.split`
  *                       with limit -1 keeps leading/trailing empties
  *  - `n_words`        = `regexp_count(text, '[a-zA-Z]+')` — letter runs
  *  - `n_digit_runs`   = `regexp_count(text, '[0-9]+')`
  *  - `n_punct`        = `regexp_count(text, '[^a-zA-Z0-9\\s]')` — java
  *                       `\s` is ASCII `[ \t\n\x0B\f\r]`; each non-BMP
  *                       code point counts once (char classes are
  *                       code-point matches)
  *  - `n_letters`      = `length(regexp_replace(text, '[^a-zA-Z]', ''))`
  *  - `n_stops`/`c_en`/`c_es`/`c_de`/`c_fr` = `regexp_count(text,
  *                       '\\b(w1|w2|...)\\b')` per stopword profile. java
  *                       `\b` bounds `\w = [a-zA-Z0-9_]` runs, and every
  *                       profile word is pure lowercase letters, so a
  *                       match occurs exactly when a MAXIMAL \w-run equals
  *                       a profile word (a run prefix/suffix can't match:
  *                       the interior position is word-char on both sides).
  *
  * `n_bpe_tokens = n_words + n_digit_runs + n_punct` exactly: the
  * alternation `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]` tries the greedy letter
  * run first, then the digit run, then a single other char, so its match
  * count is the sum of the three disjoint counts.
  *
  * GraftProps checks kernel == expression formulation on hostile inputs;
  * the DuckDB hash oracles of q_text_quality / q_lang_id / q_corpus_clean
  * / q_corpus_stats gate it end-to-end every round.
  */
object TextStatsKernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  val schema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, IntegerType => I}
    org.apache.spark.sql.types.StructType(Seq(
      StructField("n_chars", I, nullable = false),
      StructField("n_ws_tokens", I, nullable = false),
      StructField("n_words", I, nullable = false),
      StructField("n_digit_runs", I, nullable = false),
      StructField("n_punct", I, nullable = false),
      StructField("n_letters", I, nullable = false),
      StructField("n_stops", I, nullable = false),
      StructField("c_en", I, nullable = false),
      StructField("c_es", I, nullable = false),
      StructField("c_de", I, nullable = false),
      StructField("c_fr", I, nullable = false)))
  }

  val QualityStops = Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
  val EnStops = Seq("the", "and", "of", "to", "is", "in", "that", "it")
  val EsStops = Seq("el", "la", "de", "que", "y", "los", "las", "es")
  val DeStops = Seq("der", "die", "und", "das", "ist", "ein", "nicht")
  val FrStops = Seq("le", "la", "et", "les", "des", "un", "une", "est")

  private val StopBit = 1
  private val EnBit = 2
  private val EsBit = 4
  private val DeBit = 8
  private val FrBit = 16

  /** word -> profile-membership bitmask; all profile words are <= 5 chars
    * of lowercase ASCII letters, which the scan pre-filters on before the
    * (rare) map lookup. */
  private val profile: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def add(ws: Seq[String], bit: Int): Unit = ws.foreach { w =>
      m.merge(w, bit, (a, b) => Integer.valueOf(a | b))
    }
    add(QualityStops, StopBit); add(EnStops, EnBit); add(EsStops, EsBit)
    add(DeStops, DeBit); add(FrStops, FrBit)
    m
  }
  private val MaxProfileLen = profile.keySet.asInstanceOf[java.util.Set[String]]
    .toArray(Array.empty[String]).map(_.length).max

  private def isJavaWs(c: Char): Boolean = TextNorm.isJavaWs(c)

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    // Spark trim = strip ASCII ' ' only; ws-token counting runs over the
    // trimmed region, every other counter over the full string.
    var tb = 0
    var te = len
    while (tb < te && s.charAt(tb) == ' ') tb += 1
    while (te > tb && s.charAt(te - 1) == ' ') te -= 1

    var nChars = 0
    var nWsTokens = 1 // Pattern.split(-1) segments = ws runs + 1
    var nWords = 0
    var nDigitRuns = 0
    var nPunct = 0
    var nLetters = 0
    var nStops = 0
    var cEn = 0
    var cEs = 0
    var cDe = 0
    var cFr = 0

    var prevLetter = false
    var prevDigit = false
    var inWsRun = false
    // current maximal \w-run: start index, and whether it is still a pure
    // lowercase-letter run short enough to be a profile word
    var wordStart = -1
    var wordLower = true

    def endWordRun(end: Int): Unit = {
      if (wordStart >= 0) {
        if (wordLower && end - wordStart <= MaxProfileLen) {
          val m = profile.get(s.substring(wordStart, end))
          if (m != null) {
            val bits = m.intValue()
            if ((bits & StopBit) != 0) nStops += 1
            if ((bits & EnBit) != 0) cEn += 1
            if ((bits & EsBit) != 0) cEs += 1
            if ((bits & DeBit) != 0) cDe += 1
            if ((bits & FrBit) != 0) cFr += 1
          }
        }
        wordStart = -1
        wordLower = true
      }
    }

    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      val cpLen = Character.charCount(cp)
      nChars += 1
      val c = if (cpLen == 1) s.charAt(i) else '\u0000' // non-BMP: never ASCII
      val isLower = c >= 'a' && c <= 'z'
      val isUpper = c >= 'A' && c <= 'Z'
      val isLetter = isLower || isUpper
      val isDigit = c >= '0' && c <= '9'
      val isWord = isLetter || isDigit || c == '_'
      val isWs = cpLen == 1 && isJavaWs(c)

      if (isLetter) {
        nLetters += 1
        if (!prevLetter) nWords += 1
      } else if (isDigit) {
        if (!prevDigit) nDigitRuns += 1
      } else if (!isWs) {
        nPunct += 1
      }

      if (isWord) {
        if (wordStart < 0) wordStart = i
        if (!isLower) wordLower = false
      } else {
        endWordRun(i)
      }

      if (i >= tb && i < te) {
        if (isWs) {
          if (!inWsRun) { nWsTokens += 1; inWsRun = true }
        } else inWsRun = false
      }

      prevLetter = isLetter
      prevDigit = isDigit
      i += cpLen
    }
    endWordRun(len)

    val out = new GenericInternalRow(11)
    out.setInt(0, nChars)
    out.setInt(1, nWsTokens)
    out.setInt(2, nWords)
    out.setInt(3, nDigitRuns)
    out.setInt(4, nPunct)
    out.setInt(5, nLetters)
    out.setInt(6, nStops)
    out.setInt(7, cEn)
    out.setInt(8, cEs)
    out.setInt(9, cDe)
    out.setInt(10, cFr)
    out
  }
}

/** graft_text_stats(text): STRUCT of the 11 corpus counters (see
  * [[TextStatsKernel]]). One string scan replaces 9+ regex passes. */
case class TextStats(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = TextStatsKernel.schema
  override def prettyName: String = "graft_text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

/** Single-pass repetition counters (Gopher-style repetition signals,
  * Rae et al. 2021 §A1.1, arXiv:2112.11446).
  *
  * Tokenization is [[TextNorm.wordsDirect]] — the trim/collapse/split
  * semantics every text operator and every DuckDB oracle in this repo
  * shares (an empty document yields ONE empty word, exactly like
  * `string_split` on the normalized empty string). Counters:
  *
  *  - `n_words`            = token count (>= 1 by the split contract)
  *  - `n_distinct_words`   = distinct tokens (exact strings, no hashing
  *                           — a hash collision here would silently bend
  *                           a fraction instead of failing the oracle)
  *  - `top_word_count`     = occurrences of the modal token
  *  - `n_bigrams`          = n_words - 1 (0 for one-word docs)
  *  - `n_distinct_bigrams` = distinct adjacent word pairs
  *
  * The derived fractions (duplicate-word / top-word / duplicate-bigram)
  * are computed OUTSIDE the kernel from these exact integers, as
  * `(a - b) / a` double divisions — one IEEE operation on exact ints,
  * so Spark and the DuckDB oracle agree bitwise.
  */
object RepStatsKernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  val schema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, IntegerType => I}
    org.apache.spark.sql.types.StructType(Seq(
      StructField("n_words", I, nullable = false),
      StructField("n_distinct_words", I, nullable = false),
      StructField("top_word_count", I, nullable = false),
      StructField("n_bigrams", I, nullable = false),
      StructField("n_distinct_bigrams", I, nullable = false)))
  }

  def compute(text: UTF8String): InternalRow = {
    val words = TextNorm.wordsDirect(text.toString)
    val n = words.length
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(words(i), Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c
      i += 1
    }
    var nd2 = 0
    if (n >= 2) {
      val grams = new java.util.HashSet[String]((n - 1) * 2)
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n - 1) {
        sb.setLength(0)
        sb.append(words(j)).append(' ').append(words(j + 1))
        grams.add(sb.toString)
        j += 1
      }
      nd2 = grams.size
    }
    val out = new GenericInternalRow(5)
    out.setInt(0, n)
    out.setInt(1, counts.size)
    out.setInt(2, top)
    out.setInt(3, if (n >= 2) n - 1 else 0)
    out.setInt(4, nd2)
    out
  }
}

/** graft_rep_stats(text): STRUCT of the 5 repetition counters (see
  * [[RepStatsKernel]]). One string scan; zero shuffles — the explode +
  * two-level groupBy reference formulation pays two full shuffles of the
  * exploded token stream to produce the same five integers. */
case class RepStats(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = RepStatsKernel.schema
  override def prettyName: String = "graft_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepStatsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStatsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document distinct-term counter: one byte scan over the UTF-8
  * text, tokens = maximal runs of non-ASCII-whitespace (the `\s+` split
  * both engines' tokenization reduces to — multi-byte UTF-8 units are
  * never whitespace, so byte scanning is exact), counts accumulated in
  * an open-addressing map keyed by (offset, len) into the doc's own
  * byte array. One UTF8String materializes per DISTINCT term at
  * emission, never per token occurrence.
  *
  * This is what lets per-doc tf pipelines skip the corpus-scale
  * (doc, term) exchange entirely: `explode(word_counts(text))` emits
  * the reduced (term, tf) pairs doc-locally inside the scan, so the
  * only thing left to shuffle is vocabulary- or top-k-sized.
  */
object WordCountsKernel {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** FNV-1a over a byte range. */
  @inline private def hashRange(bytes: Array[Byte], from: Int, until: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xff)) * 0x01000193; i += 1 }
    h
  }

  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // open-addressing (offset, len) -> count over the doc's bytes
    var cap = 64
    var offs = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var cnts = new Array[Long](cap)
    var size = 0

    def grow(): Unit = {
      val (oo, ol, oc, ocap) = (offs, lens, cnts, cap)
      cap *= 2
      offs = new Array[Int](cap); lens = new Array[Int](cap); cnts = new Array[Long](cap)
      size = 0
      var i = 0
      while (i < ocap) {
        if (oc(i) != 0L) add(oo(i), ol(i), oc(i))
        i += 1
      }
    }

    def add(off: Int, len: Int, c: Long): Unit = {
      if (size * 2 >= cap) grow()
      var i = hashRange(bytes, off, off + len) & (cap - 1)
      while (cnts(i) != 0L) {
        if (lens(i) == len && java.util.Arrays.equals(bytes, off, off + len,
            bytes, offs(i), offs(i) + len)) {
          cnts(i) += c
          return
        }
        i = (i + 1) & (cap - 1)
      }
      offs(i) = off; lens(i) = len; cnts(i) = c; size += 1
    }

    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) add(start, i - start, 1L)
    }

    val out = new Array[Any](size)
    var k = 0
    i = 0
    while (i < cap) {
      if (cnts(i) != 0L) {
        val tb = java.util.Arrays.copyOfRange(bytes, offs(i), offs(i) + lens(i))
        out(k) = org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromBytes(tb), cnts(i))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Doc-local ADJACENT-BIGRAM counts — [[WordCountsKernel]]'s treatment
  * applied to the collocation stream: the explode + corpus-scale
  * groupBy(a, b) formulation shipped one row per token position into
  * the bigram exchange; here each document reduces to its distinct
  * adjacent pairs with counts inside the scan, so the exchange carries
  * per-doc-distinct bigrams only (born reduced, like tfidf's word
  * counts). Tokenization is the same single-pass whitespace byte scan
  * (equal to the trim/collapse/split column form for pair purposes:
  * non-ws runs in order, no empty tokens). */
object BigramCountsKernel {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  @inline private def hashRange(bytes: Array[Byte], from: Int, until: Int, seed: Int): Int = {
    var h = seed
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xff)) * 0x01000193; i += 1 }
    h
  }

  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // open-addressing (offA,lenA,offB,lenB) -> count over the doc bytes
    var cap = 64
    var offsA = new Array[Int](cap); var lensA = new Array[Int](cap)
    var offsB = new Array[Int](cap); var lensB = new Array[Int](cap)
    var cnts = new Array[Long](cap)
    var size = 0

    def grow(): Unit = {
      val (oa, la, ob, lb, oc, ocap) = (offsA, lensA, offsB, lensB, cnts, cap)
      cap *= 2
      offsA = new Array[Int](cap); lensA = new Array[Int](cap)
      offsB = new Array[Int](cap); lensB = new Array[Int](cap)
      cnts = new Array[Long](cap)
      size = 0
      var i = 0
      while (i < ocap) {
        if (oc(i) != 0L) add(oa(i), la(i), ob(i), lb(i), oc(i))
        i += 1
      }
    }

    def add(offA: Int, lenA: Int, offB: Int, lenB: Int, c: Long): Unit = {
      if (size * 2 >= cap) grow()
      val h = hashRange(bytes, offB, offB + lenB,
        hashRange(bytes, offA, offA + lenA, 0x811c9dc5) * 31 + 7)
      var i = h & (cap - 1)
      while (cnts(i) != 0L) {
        if (lensA(i) == lenA && lensB(i) == lenB &&
            java.util.Arrays.equals(bytes, offA, offA + lenA,
              bytes, offsA(i), offsA(i) + lenA) &&
            java.util.Arrays.equals(bytes, offB, offB + lenB,
              bytes, offsB(i), offsB(i) + lenB)) {
          cnts(i) += c
          return
        }
        i = (i + 1) & (cap - 1)
      }
      offsA(i) = offA; lensA(i) = lenA; offsB(i) = offB; lensB(i) = lenB
      cnts(i) = c; size += 1
    }

    var prevOff = -1
    var prevLen = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        if (prevOff >= 0) add(prevOff, prevLen, start, i - start, 1L)
        prevOff = start; prevLen = i - start
      }
    }

    val out = new Array[Any](size)
    var k = 0
    i = 0
    while (i < cap) {
      if (cnts(i) != 0L) {
        val ab = java.util.Arrays.copyOfRange(bytes, offsA(i), offsA(i) + lensA(i))
        val bb = java.util.Arrays.copyOfRange(bytes, offsB(i), offsB(i) + lensB(i))
        out(k) = org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromBytes(ab), UTF8String.fromBytes(bb), cnts(i))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_bigram_counts(text): ARRAY<STRUCT<a string, b string, c bigint>>
  * of the document's distinct adjacent token pairs with counts (see
  * [[BigramCountsKernel]]). */
case class BigramCounts(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = BigramCountsKernel.schema
  override def prettyName: String = "graft_bigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    BigramCountsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramCountsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct adjacent-token-pair HASHES with multiplicities — the
  * [[BigramCountsKernel]] shape with the pair already reduced to the
  * (xxhash64(a), xxhash64(b)) key the LM-score serve joins on (r21).
  *
  * The column formulation of the scoring stream (split + transform +
  * sequence + explode of per-position structs) runs interpreted
  * higher-order functions per element on the serve's hot path and emits
  * one row per bigram OCCURRENCE; this kernel emits one row per DISTINCT
  * pair with its count `m`, computed in one scan projection — the
  * downstream sums recover occurrence totals exactly as Σ m·c
  * (integer arithmetic, so bit-identical — [[graft.operators.Curation
  * .lmScore]]). Hashing matches `xxhash64(word)` byte-for-byte
  * ([[TextNorm.xxh64]]); pairs colliding on both hashes merge here
  * exactly as the hash-keyed join already merged them downstream.
  * Tokenization is [[TextNorm.wordsDirect]] — the wsTokens column
  * semantics, GraftProps-pinned. */
object BigramHashCountsKernel {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("m", LongType, nullable = false))),
    containsNull = false)

  def compute(text: UTF8String): GenericArrayData = {
    val words = TextNorm.wordsDirect(text.toString)
    val n = words.length
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = TextNorm.xxh64(words(i)); i += 1 }
    // open-addressing (a, b) -> m; capacity is a power of two >= 2x the
    // pair count, so no rehash is ever needed; m == 0 marks an empty
    // slot (live entries always have m >= 1)
    var cap = 8
    while (cap < (n - 1) * 2) cap <<= 1
    val ka = new Array[Long](cap)
    val kb = new Array[Long](cap)
    val ms = new Array[Long](cap)
    var size = 0
    i = 0
    while (i < n - 1) {
      val a = hs(i); val b = hs(i + 1)
      var h = a * 31L + b
      h ^= (h >>> 33)
      var j = h.toInt & (cap - 1)
      var done = false
      while (!done) {
        if (ms(j) == 0L) {
          ka(j) = a; kb(j) = b; ms(j) = 1L; size += 1; done = true
        } else if (ka(j) == a && kb(j) == b) {
          ms(j) += 1L; done = true
        } else j = (j + 1) & (cap - 1)
      }
      i += 1
    }
    val out = new Array[Any](size)
    var k = 0
    i = 0
    while (i < cap) {
      if (ms(i) != 0L) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(ka(i), kb(i), ms(i))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_bigram_hash_counts(text): ARRAY<STRUCT<a bigint, b bigint,
  * m bigint>> — see [[BigramHashCountsKernel]]. */
case class BigramHashCounts(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = BigramHashCountsKernel.schema
  override def prettyName: String = "graft_bigram_hash_counts"

  override protected def nullSafeEval(input: Any): Any =
    BigramHashCountsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramHashCountsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_word_counts(text): ARRAY<STRUCT<term string, tf bigint>> of the
  * document's distinct whitespace tokens with occurrence counts (see
  * [[WordCountsKernel]]). */
case class WordCounts(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = WordCountsKernel.schema
  override def prettyName: String = "graft_word_counts"

  override protected def nullSafeEval(input: Any): Any =
    WordCountsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordCountsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merge sorted k-wide coverage windows into disjoint intervals — one
  * linear pass, primitive arrays ([[CoverageIntervals]]'s core). Input:
  * ascending window START positions; each start s covers [s, s+w-1];
  * overlapping/adjacent windows coalesce. The higher-order aggregate()
  * formulation of this merge copies the accumulator array per element
  * (quadratic in starts — ruinous exactly on the all-shared corpora the
  * excision operator exists for). */
object CoverageKernel {
  import org.apache.spark.sql.catalyst.util.ArrayData

  val schema: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lo",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("hi",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)

  def compute(starts: ArrayData, w: Int): GenericArrayData = {
    val n = starts.numElements()
    val los = new Array[Int](n)
    val his = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val s = starts.getInt(i)
      if (m > 0 && s <= his(m - 1) + 1) {
        val hi = s + w - 1
        if (hi > his(m - 1)) his(m - 1) = hi
      } else {
        los(m) = s; his(m) = s + w - 1; m += 1
      }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(los(i), his(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Whole-document span excision in one pass — the fused form of
  * coverage-merge + per-token membership test + token rejoin that
  * `q_dedup_excise` previously ran as [[CoverageKernel]] followed by an
  * interpreted `filter(w, (t,i) -> NOT exists(iv, ...))` HOF. That HOF
  * was O(tokens × intervals) with a per-token interpreted lambda: fine
  * while the interval merge kept `iv` tiny, quadratic per doc on an
  * adversarial alternating-duplication corpus (O(n/2) disjoint
  * intervals). Here token positions AND window starts are both
  * ascending, so one two-pointer walk decides every token in
  * O(tokens + starts) — no interval array is even materialized, and the
  * whole row evaluates as a single static codegen call.
  *
  * Contract (must stay bit-equal to the HOF form — ExciseSpec pins it):
  * `starts` ascending 1-based window starts, each covering
  * [s, s+width-1]; a token at 1-based position p survives iff no window
  * covers p; output struct carries the survivor count and the
  * single-space rejoin of survivors. */
object ExciseKernel {
  import org.apache.spark.sql.catalyst.util.ArrayData

  val schema: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_kept",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("clean_text",
      StringType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  def compute(w: ArrayData, starts: ArrayData, width: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = w.numElements()
    val ns = starts.numElements()
    val kept = new Array[UTF8String](n)
    var k = 0
    var si = 0
    var hi = 0 // rightmost covered position so far (1-based; 0 = none)
    var p = 1
    while (p <= n) {
      // absorb every window starting at or before p; ascending starts
      // make the running max end a complete coverage test for p
      while (si < ns && starts.getInt(si) <= p) {
        val e = starts.getInt(si) + width - 1
        if (e > hi) hi = e
        si += 1
      }
      if (p > hi) { kept(k) = w.getUTF8String(p - 1); k += 1 }
      p += 1
    }
    val clean =
      if (k == 0) UTF8String.EMPTY_UTF8
      else if (k == n) UTF8String.concatWs(Space,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(kept): _*)
      else UTF8String.concatWs(Space,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          java.util.Arrays.copyOf(kept, k)): _*)
    org.apache.spark.sql.catalyst.InternalRow(k, clean)
  }
}

/** graft_excise(w, starts, width): STRUCT<n_kept int, clean_text string>
  * — see [[ExciseKernel]]. `w` is the token array, `starts` the
  * ascending flagged window starts, `width` an INT literal. */
case class ExciseTokens(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  require(width > 0, s"graft_excise requires width > 0, got $width")
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<int>), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = ExciseKernel.schema
  override def prettyName: String = "graft_excise"

  override protected def nullSafeEval(w: Any, starts: Any): Any =
    ExciseKernel.compute(
      w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      starts.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExciseKernel.compute($a, $b, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_coverage(starts, w): ARRAY<STRUCT<lo int, hi int>> of merged
  * disjoint coverage intervals (see [[CoverageKernel]]). `starts` must
  * be ascending (the operator sorts at aggregation). */
case class CoverageIntervals(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"graft_coverage requires width > 0, got $width")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${other.sql}")
  }
  override def dataType: DataType = CoverageKernel.schema
  override def prettyName: String = "graft_coverage"

  override protected def nullSafeEval(input: Any): Any =
    CoverageKernel.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CoverageKernel.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
