package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst cosine-similarity over float-array columns.
  *
  * Replaces the composed higher-order-function form
  * (`aggregate(zip_with(a, b, *), ..) / (sqrt(..) * sqrt(..))`), which
  * allocates an intermediate array and walks both vectors four times, with
  * ONE fused whole-stage-codegen loop (dot and both norms in a single
  * pass, no allocation). This is the preferred extension order from
  * SURVEY §4: native `Expression` with `doGenCode` > UDF.
  *
  * Interpreted `nullSafeEval` is provided for non-codegen paths; inputs
  * are implicitly cast, so `array<float>` and `array<double>` both work.
  */
/** @param hofCompat when true (set by the fusion rule), reproduce the
  *   composed-HOF form's semantics EXACTLY in one pass: mismatched
  *   lengths → NULL (zip_with null-pads), any null element → NULL,
  *   zero-norm → NaN (0.0/0.0). The rule previously wrapped the kernel
  *   in composed guard expressions (IsNull/Size/ArrayExists), which
  *   re-evaluated the input arrays per check and erased the kernel's
  *   speedup entirely; folding the checks into the kernel's own loop
  *   restores the single-pass, single-evaluation contract. */
case class CosineSimilarity(left: Expression, right: Expression,
    hofCompat: Boolean = false)
    extends BinaryExpression {

  // Accepts float OR double arrays natively (no coercion pass): the
  // fusion rule substitutes this expression AFTER analysis, where
  // implicit casts would no longer run, and reading either element type
  // directly avoids a whole-array cast in front of the kernel.
  private def elemOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOf(left).isDefined && elemOf(right).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = elemOf(left).contains(DoubleType)
    val yd = elemOf(right).contains(DoubleType)
    if (hofCompat && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (hofCompat && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) {
      // zero-norm vectors have no defined cosine. Direct API: NULL (never
      // an ANSI divide-by-zero crash). HOF-compat: NaN, exactly as
      // 0.0/0.0 evaluates in the composed form (NaN sorts greatest, so
      // the distinction is visible in rankings).
      if (hofCompat) Double.NaN else null
    } else {
      val c = dot / (math.sqrt(nx) * math.sqrt(ny))
      // direct API clamps to the mathematical range: exact-copy vectors
      // evaluate dot == nx == ny, and sqrt(nx)*sqrt(nx) can round BELOW
      // nx, yielding 1.0000000000000002 (surfaced by the sf1 replicated
      // corpus against DuckDB's exact 1.0). HOF-compat stays unclamped —
      // its contract is bit-parity with the composed form.
      if (hofCompat) c else math.max(-1.0, math.min(1.0, c))
    }
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      def getter(side: Expression, arr: String) =
        if (elemOf(side).contains(DoubleType)) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      val lenGuard =
        if (hofCompat)
          s"if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; } else"
        else ""
      val nullElemGuard =
        if (hofCompat)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val zeroNorm =
        if (hofCompat) s"${ev.value} = Double.NaN;"
        else s"${ev.isNull} = true;"
      // see nullSafeEval: direct API clamps to [-1, 1]; HOF-compat is
      // bit-parity with the composed form and stays raw
      val finish =
        if (hofCompat)
          s"${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));"
        else
          s"""${ev.value} = java.lang.Math.max(-1.0, java.lang.Math.min(1.0,
             |  $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny))));""".stripMargin
      s"""
         |$lenGuard {
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemGuard
         |    double $xi = ${getter(left, a)};
         |    double $yi = ${getter(right, b)};
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($nx == 0.0 || $ny == 0.0) {
         |      $zeroNorm
         |    } else {
         |      $finish
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Registration + column API for graft's native functions. */
object GraftFunctions {
  val CosineName = "graft_cosine"
  val DotName = "graft_dot"
  val L2Name = "graft_l2sq"
  val ArgminL2Name = "graft_argmin_l2"
  val HplaneIndexName = "graft_hplane_index"
  val HplaneProbeName = "graft_hplane_probe"
  val SimHashName = "graft_simhash64"
  val MinHashName = "graft_minhash_sigs"
  val ShingleSetName = "graft_shingle_set"
  val WordSetName = "graft_word_set"
  val TextStatsName = "graft_text_stats"
  val AsOfLookupName = "graft_asof_lookup"
  val TopKName = "graft_topk"
  val TopKMeanName = "graft_topk_mean"
  val TopKTermName = "graft_topk_term"
  val WordCountsName = "graft_word_counts"
  val BigramCountsName = "graft_bigram_counts"
  val BigramHashCountsName = "graft_bigram_hash_counts"
  val WinnowName = "graft_winnow"
  val GramCountsName = "graft_gram_counts"
  val CoverageName = "graft_coverage"
  val ExciseName = "graft_excise"
  val BpeCountName = "graft_bpe_count"
  val RepStatsName = "graft_rep_stats"
  val Md5BucketName = "graft_md5_bucket"
  val Argmin2L2Name = "graft_argmin2_l2"
  val KllName = "graft_kll"
  val KllMergeName = "graft_kll_merge"
  val KllQuantileName = "graft_kll_q"
  val FunnelStampsName = "graft_funnel_stamps"

  // Sessions already registered — createOrReplaceTempFunction is itself
  // idempotent, but every call past the first logs a "replaced a
  // previously registered function" WARN per function, and operators call
  // ensureRegistered per query. Weak keys: don't pin stopped sessions.
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register graft functions AND the cosine-fusion
    * optimizer rule on any session (works whether or not the session was
    * built with [[GraftExtensions]] — `experimental.extraOptimizations`
    * is the post-creation injection point). Synchronized so a concurrent
    * first query waits for registration to COMPLETE (a check-then-act
    * memo would let it proceed against missing functions), and the
    * session is memoized only after success (a mid-registration failure
    * must not poison later attempts). */
  def ensureRegistered(spark: SparkSession): Unit = registered.synchronized {
    if (registered.contains(spark)) return
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      CosineName,
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName,
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      L2Name,
      (exprs: Seq[Expression]) => L2SquaredDistance(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      ArgminL2Name,
      (exprs: Seq[Expression]) => ArgminL2(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      Argmin2L2Name,
      (exprs: Seq[Expression]) => Argmin2L2(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      HplaneIndexName,
      (exprs: Seq[Expression]) =>
        HyperplaneBuckets(exprs.head, Hyperplanes.flat, Hyperplanes.Dim,
          Hyperplanes.PlanesPerBand, multiProbe = false),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      HplaneProbeName,
      (exprs: Seq[Expression]) =>
        HyperplaneBuckets(exprs.head, Hyperplanes.flat, Hyperplanes.Dim,
          Hyperplanes.PlanesPerBand, multiProbe = true),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      SimHashName,
      (exprs: Seq[Expression]) => SimHash64(exprs.head),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      Md5BucketName,
      (exprs: Seq[Expression]) => Md5Bucket(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHashName,
      (exprs: Seq[Expression]) => MinHashSigs(exprs.head),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShingleSetName,
      (exprs: Seq[Expression]) => ShingleHashSet(exprs.head, MinHashKernel.ShingleN),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      WordSetName,
      // n = 1: the distinct word-hash set (a 1-shingle IS a word) — the
      // IDF-SimHash tokenization, deduplicated inside the scan
      (exprs: Seq[Expression]) => ShingleHashSet(exprs.head, 1),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      TextStatsName,
      (exprs: Seq[Expression]) => TextStats(exprs.head),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      AsOfLookupName,
      (exprs: Seq[Expression]) => AsOfLookup(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKName,
      (exprs: Seq[Expression]) => TopKCollect.fromArgs(exprs),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKMeanName,
      (exprs: Seq[Expression]) => TopKMeanCollect.fromArgs(exprs),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKTermName,
      (exprs: Seq[Expression]) => TopKTermCollect.fromArgs(exprs),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      WordCountsName,
      (exprs: Seq[Expression]) => WordCounts(exprs.head),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      BigramCountsName,
      (exprs: Seq[Expression]) => BigramCounts(exprs.head),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      BigramHashCountsName,
      (exprs: Seq[Expression]) => BigramHashCounts(exprs.head),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      WinnowName,
      (exprs: Seq[Expression]) => WinnowSketch(exprs.head,
        TopKCollect.kLiteral(WinnowName, exprs(1)),
        TopKCollect.kLiteral(WinnowName, exprs(2))),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      GramCountsName,
      (exprs: Seq[Expression]) => GramCounts(exprs.head,
        TopKCollect.kLiteral(GramCountsName, exprs(1))),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      CoverageName,
      (exprs: Seq[Expression]) =>
        CoverageIntervals(exprs.head, TopKCollect.kLiteral(CoverageName, exprs(1))),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      ExciseName,
      (exprs: Seq[Expression]) =>
        ExciseTokens(exprs.head, exprs(1), TopKCollect.kLiteral(ExciseName, exprs(2))),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      BpeCountName,
      (exprs: Seq[Expression]) => BpeTokenCount(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      RepStatsName,
      (exprs: Seq[Expression]) => RepStats(exprs.head),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      KllName,
      (exprs: Seq[Expression]) => KllAgg.fromArgs(exprs),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      KllMergeName,
      (exprs: Seq[Expression]) => KllMergeAgg.fromArgs(exprs),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      KllQuantileName,
      (exprs: Seq[Expression]) => KllQuantile(exprs.head, exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunnelStampsName,
      (exprs: Seq[Expression]) => FunnelStampsAgg.fromArgs(exprs),
      "built-in")
    val rules = classic.experimental.extraOptimizations
    if (!rules.contains(graft.plans.CosineFusionRule))
      classic.experimental.extraOptimizations = rules :+ graft.plans.CosineFusionRule
    registered.add(spark)
  }

  /** Cosine similarity column over two float-array columns. The session
    * must have the function registered ([[ensureRegistered]] /
    * [[GraftExtensions]]). */
  def graftCosine(a: Column, b: Column): Column = call_function(CosineName, a, b)

  def graftDot(a: Column, b: Column): Column = call_function(DotName, a, b)

  def graftL2sq(a: Column, b: Column): Column = call_function(L2Name, a, b)

  /** 0-based nearest-centroid index (first wins ties) — one compiled
    * loop over an array-of-vectors column or literal. */
  def graftArgminL2(vec: Column, cents: Column): Column =
    call_function(ArgminL2Name, vec, cents)
}

/** `SparkSessionExtensions` hook: enables
  * `spark.sql.extensions=graft.functions.GraftExtensions` deployments.
  * Injects the function AND the cosine-fusion optimizer rule. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier(GraftFunctions.CosineName),
        new ExpressionInfo(classOf[CosineSimilarity].getName, GraftFunctions.CosineName),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.CosineFusionRule)
  }
}
