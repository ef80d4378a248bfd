package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-corpus analysis operators for LLM-data pipelines: token counting,
  * quality scoring, language ID, and content fingerprinting.
  *
  * These extend the reference's text-normalization surface
  * (`utils/csv_utils.py` ASCII scrubbing, `dbt/models/staging/
  * stg_countries.sql` name canonicalization) to corpus scale.
  *
  * Every operator is a pure per-row scalar projection built from codegen'd
  * built-ins (regexp_count/replace, length, split) — no UDFs, no shuffle,
  * no state; at 100 TB these run at scan speed and pushdown keeps only
  * (doc_id, text) columns in flight. Scores avoid transcendental functions
  * (exp/log) so results are bit-identical across engines.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  // --------------------------------------------- BPE merge-table tokenizer

  /** Merge-table size for [[bpeTrain]] (GPT-2 trains 50k; the harness
    * corpus saturates far earlier). */
  val BpeMerges = 200

  /** Vocabulary cap for training: top-V words by corpus frequency. Bounds
    * the driver-side merge-learning state at any corpus size — the tail
    * beyond the cap is singleton noise that earns no merges anyway. */
  val BpeVocabCap = 10000

  /** Train a BPE merge table on a corpus: the corpus-scale work is ONE
    * map-side-combined word-frequency aggregation (with multiplicity —
    * BPE counts occurrences, not documents); the classical merge loop
    * (Sennrich et al. 2016) then runs over the capped vocabulary table —
    * model fitting at vocabulary cardinality, the same state-vs-data
    * line as IVF centroid training. Deterministic: frequency ties in the
    * vocab cut and in merge selection both break lexicographically. */
  def bpeTrain(docsDf: DataFrame, numMerges: Int = BpeMerges,
      vocabCap: Int = BpeVocabCap): Array[String] = {
    val wc = docsDf
      .select(explode(wsTokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.BpeKernel.train(wc, numMerges)
  }

  /** q_text_bpe — tokenizer-TRUE token counts: the corpus-trained merge
    * table applied per document by the codegen'd
    * [[graft.functions.BpeTokenCount]] kernel (the merge table rides the
    * plan as a foldable literal, like IVF centroids). Reported next to
    * the whitespace count so budget drift of the regex approximation is
    * visible. Training runs Spark jobs at plan-BUILD time — registered
    * as model-bearing in [[graft.Catalog]]. */
  def textBpe(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = docs(spark, dir)
    val merges = bpeTrain(d)
    d.select(
      col("doc_id"),
      call_function(
        graft.functions.GraftFunctions.BpeCountName,
        col("text"),
        typedlit(merges.toSeq)).as("n_bpe_tokens"))
  }

  /** Placeholder [[graft.Verify]] substitutes with the trained merge
    * table rendered as SQL VALUES rows `(rank, 'a b'), ...` — the BPE
    * twin of [[Similarity.GraftOutToken]]: checker oracles read model
    * state back from the engine (here via literal substitution; training
    * is deterministic, so Verify's re-train equals the query's own
    * table) and re-derive every emitted CLAIM independently. */
  val BpeMergesToken = "__GRAFT_BPE_MERGES__"

  /** The trained merge table for `dir`'s corpus — what [[graft.Verify]]
    * substitutes into [[textBpeCheckerOracle]]. Deterministic, so it is
    * bit-identical to the table [[textBpe]] trains for the same dir. */
  def bpeModelMerges(spark: SparkSession, dir: String): Array[String] =
    bpeTrain(docs(spark, dir))

  /** CHECKER oracle for [[textBpe]] (r19 verdict #5; the
    * [[Similarity.annCheckerOracle]] contract): the merge table is model
    * state — standalone SQL cannot replay the frequency-driven training
    * loop — but given that table, every emitted token count is an exact,
    * corpus-derivable claim. DuckDB replays ENCODING from scratch: each
    * distinct word splits into code-point symbols, and a recursive CTE
    * applies the merges IN RANK ORDER, one rank per recursion step.
    * In-rank-order application is equivalent to the kernel's greedy
    * lowest-rank-present loop ([[graft.functions.BpeKernel.countWord]])
    * because a merge's output symbol can only appear in HIGHER-ranked
    * pairs (the training loop learns a pair only after its constituents
    * exist), so by the time rank r applies, every lower rank is already
    * exhausted and none can re-arise. Each step merges all left-to-right
    * non-overlapping occurrences — exactly the kernel's scan — via
    * string `replace` over a double-space-delimited symbol string
    * (every symbol wrapped in single spaces, so a pattern can only match
    * whole symbols, and overlapping runs like `a a a` under pair `a a`
    * resolve left-to-right: replace consumes its match and continues
    * AFTER it, the same cursor-advance as the kernel). Symbols never
    * contain whitespace (words are whitespace-split), which is the same
    * invariant that lets merges serialize as "a b" strings. Final count
    * per word = symbol count; per doc = sum over its word OCCURRENCES
    * (empty-text docs keep an explicit 0 via the left join). Validated
    * bit-exact against the kernel at sf0.01 before commit; the marker
    * line keeps it out of the timed baseline column.
    *
    * The split uses the EXPLICIT class `[ \t\n\f\r\x0b]+` — Java's ASCII
    * `\s`, which the engine's [[wsTokens]] splits on — because RE2's
    * `\s` omits U+000B (ADVICE r20): a vertical-tab document would
    * otherwise tokenize differently in the checker than in the engine
    * and false-fail a correct result. */
  val textBpeCheckerOracle: String =
    s"""${Similarity.CheckerMarker}
       |WITH RECURSIVE m AS (
       |  SELECT * FROM (VALUES $BpeMergesToken) AS t(rank, pair)
       |), nm AS (SELECT COUNT(*) AS n FROM m),
       |w AS (
       |  SELECT DISTINCT word FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r\\x0b]+')) AS word
       |    FROM documents
       |  ) WHERE word <> ''
       |),
       |s(word, syms, r) AS (
       |  SELECT word,
       |    ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' ', 0
       |  FROM w
       |  UNION ALL
       |  SELECT s.word,
       |    replace(s.syms,
       |      ' ' || split_part(m.pair, ' ', 1) || '  ' || split_part(m.pair, ' ', 2) || ' ',
       |      ' ' || split_part(m.pair, ' ', 1) || split_part(m.pair, ' ', 2) || ' '),
       |    s.r + 1
       |  FROM s JOIN m ON m.rank = s.r
       |),
       |f AS (
       |  SELECT word, len(string_split(trim(syms), '  ')) AS n
       |  FROM s, nm WHERE s.r = nm.n
       |),
       |docw AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r\\x0b]+')) AS word
       |  FROM documents
       |)
       |SELECT doc.doc_id, CAST(COALESCE(SUM(f.n), 0) AS INT) AS n_bpe_tokens
       |FROM documents doc
       |LEFT JOIN (SELECT doc_id, word FROM docw WHERE word <> '') d
       |  ON d.doc_id = doc.doc_id
       |LEFT JOIN f ON f.word = d.word
       |GROUP BY doc.doc_id""".stripMargin

  /** q_dedup_exact — exact content dedup via md5 hash: every hash group's
    * canonical (min) doc id and copy count. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text").cast(BinaryType)).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val dedupExactOracle: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** The 11-counter struct of [[graft.functions.TextStatsKernel]]
    * computed once per row — every token/quality/langid counter in ONE
    * string scan. The r2 formulation paid 9+ independent java.util.regex
    * passes per document (each re-scanning the text), which made the
    * composed corpus queries the only suite members >2x the DuckDB
    * baseline; the kernel closes that per-core gap without changing any
    * value ([[textStatsRef]] is the retained regex formulation, and
    * GraftProps asserts kernel == reference on hostile inputs). */
  private def textStatsCol(spark: SparkSession): Column = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    call_function(graft.functions.GraftFunctions.TextStatsName, col("text"))
  }

  /** BPE-ish token count from the stats struct: the alternation
    * `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]` matches each letter run, digit
    * run, or single other char exactly once, so its count is the sum of
    * the three disjoint counters. */
  private def bpeTokensOf(ts: Column): Column =
    ts.getField("n_words") + ts.getField("n_digit_runs") + ts.getField("n_punct")

  /** The regex/expression formulation of every [[textStatsCol]] counter —
    * the spec reference the kernel is property-checked against (and the
    * shape the DuckDB oracles mirror). Not used on any query hot path. */
  private[graft] def textStatsRef(df: DataFrame): DataFrame = {
    import graft.functions.TextStatsKernel._
    def rc(p: String): Column = regexp_count(col("text"), lit(p))
    def stops(ws: Seq[String]): Column = rc(ws.mkString("\\b(", "|", ")\\b"))
    df.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
      rc("[a-zA-Z]+").as("n_words"),
      rc("[0-9]+").as("n_digit_runs"),
      rc("[^a-zA-Z0-9\\s]").as("n_punct"),
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).as("n_letters"),
      stops(QualityStops).as("n_stops"),
      stops(EnStops).as("c_en"),
      stops(EsStops).as("c_es"),
      stops(DeStops).as("c_de"),
      stops(FrStops).as("c_fr"))
  }

  /** Kernel twin of [[textStatsRef]] (flattened struct) for the
    * equivalence property. */
  private[graft] def textStatsKernelDf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), textStatsCol(df.sparkSession).as("ts"))
      .select(col("doc_id"), col("ts.*"))

  /** q_text_tokens — whitespace tokens and a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation marks). */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), textStatsCol(spark).as("ts"))
      .select(
        col("doc_id"),
        col("ts.n_chars").as("n_chars"),
        col("ts.n_ws_tokens").as("n_ws_tokens"),
        bpeTokensOf(col("ts")).as("n_bpe_tokens"),
        col("ts.n_words").as("n_words"))

  val textTokensOracle: String =
    """SELECT doc_id,
      |  CAST(LENGTH(text) AS INT) AS n_chars,
      |  CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INT) AS n_ws_tokens,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_bpe_tokens,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+')) AS INT) AS n_words
      |FROM documents""".stripMargin

  /** The composite quality score from the stats struct — shared verbatim
    * by q_text_quality and the composed q_corpus_clean. Arithmetic is
    * identical to the regex formulation (same casts, same order), so the
    * doubles are bit-identical. */
  private[graft] def qualityScoreOf(ts: Column): Column = {
    val nWords = ts.getField("n_words").cast(DoubleType)
    val nStops = ts.getField("n_stops").cast(DoubleType)
    val nPunct = ts.getField("n_punct").cast(DoubleType)
    val nChars = ts.getField("n_chars").cast(DoubleType)
    least(nWords / lit(50.0), lit(1.0)) * lit(0.5) +
      least(when(nWords > 0, nStops / nWords).otherwise(lit(0.0)) * lit(4.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)) * lit(5.0), lit(1.0))) * lit(0.2)
  }

  /** q_text_quality — length/stopword/punctuation quality heuristics and a
    * rational (transcendental-free) composite score in [0, 1]. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val ts = col("ts")
    val nWords = ts.getField("n_words").cast(DoubleType)
    val nStops = ts.getField("n_stops").cast(DoubleType)
    val nPunct = ts.getField("n_punct").cast(DoubleType)
    val nChars = ts.getField("n_chars").cast(DoubleType)
    val letters = ts.getField("n_letters").cast(DoubleType)
    docs(spark, dir)
      .select(col("doc_id"), textStatsCol(spark).as("ts"))
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        when(nWords > 0, letters / nWords).otherwise(lit(0.0)).as("avg_word_len"),
        when(nWords > 0, nStops / nWords).otherwise(lit(0.0)).as("stop_ratio"),
        when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)).as("punct_ratio"),
        qualityScoreOf(ts).as("quality_score"))
  }

  val textQualityOracle: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+')) AS DOUBLE) AS n_words,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS DOUBLE) AS n_stops,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) AS n_punct,
      |    CAST(LENGTH(text) AS DOUBLE) AS n_chars,
      |    CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS letters
      |  FROM documents
      |)
      |SELECT doc_id, n_words,
      |  CASE WHEN n_words > 0 THEN letters / n_words ELSE 0.0 END AS avg_word_len,
      |  CASE WHEN n_words > 0 THEN n_stops / n_words ELSE 0.0 END AS stop_ratio,
      |  CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
      |  LEAST(n_words / 50.0, 1.0) * 0.5
      |    + LEAST(CASE WHEN n_words > 0 THEN n_stops / n_words ELSE 0.0 END * 4.0, 1.0) * 0.3
      |    + (1.0 - LEAST(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END * 5.0, 1.0)) * 0.2 AS quality_score
      |FROM f""".stripMargin

  /** The deterministic-argmax language prediction from the stats struct
    * (en > es > de > fr precedence on ties, 'und' when no profile
    * matches) — shared verbatim by q_lang_id and q_corpus_clean. */
  private def predLangOf(ts: Column): Column = {
    val cEn = ts.getField("c_en")
    val cEs = ts.getField("c_es")
    val cDe = ts.getField("c_de")
    val cFr = ts.getField("c_fr")
    when(cEn >= cEs && cEn >= cDe && cEn >= cFr && cEn > 0, "en")
      .when(cEs >= cDe && cEs >= cFr && cEs > 0, "es")
      .when(cDe >= cFr && cDe > 0, "de")
      .when(cFr > 0, "fr")
      .otherwise("und")
  }

  /** q_lang_id — stopword-profile language scoring with a deterministic
    * argmax. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("lang").as("actual_lang"), textStatsCol(spark).as("ts"))
      .select(
        col("doc_id"), col("actual_lang"),
        col("ts.c_en").as("c_en"), col("ts.c_es").as("c_es"),
        col("ts.c_de").as("c_de"), col("ts.c_fr").as("c_fr"),
        predLangOf(col("ts")).as("pred_lang"))

  val langIdOracle: String =
    """WITH s AS (
      |  SELECT doc_id, lang AS actual_lang,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(the|and|of|to|is|in|that|it)\b')) AS INT) AS c_en,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(el|la|de|que|y|los|las|es)\b')) AS INT) AS c_es,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(der|die|und|das|ist|ein|nicht)\b')) AS INT) AS c_de,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(le|la|et|les|des|un|une|est)\b')) AS INT) AS c_fr
      |  FROM documents
      |)
      |SELECT doc_id, actual_lang, c_en, c_es, c_de, c_fr,
      |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
      |    WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
      |    WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
      |    WHEN c_fr > 0 THEN 'fr'
      |    ELSE 'und' END AS pred_lang
      |FROM s""".stripMargin

  /** q_fingerprint — canonical-form content fingerprint: lowercase, strip
    * non-alphanumerics, collapse whitespace, hash. Robust to formatting
    * noise where q_dedup_exact is not. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val normalized = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs(spark, dir).select(
      col("doc_id"),
      md5(normalized.cast(BinaryType)).as("fingerprint"),
      length(normalized).as("norm_len"))
  }

  val fingerprintOracle: String =
    """SELECT doc_id,
      |  md5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint,
      |  CAST(LENGTH(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS INT) AS norm_len
      |FROM documents""".stripMargin

  /** q_dedup_apply — the cleaned corpus: keep only each content group's
    * canonical (min-id) document. This is the consuming side of
    * [[dedupExact]] — at 100 TB the keep-set join broadcasts (one row per
    * distinct content) and the corpus passes through map-side only. */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    val keep = dedupExact(spark, dir).select(col("keep_doc_id").as("doc_id"))
    docs(spark, dir)
      .join(keep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  val dedupApplyOracle: String =
    """SELECT doc_id, lang, source, n_chars
      |FROM documents
      |WHERE doc_id IN (
      |  SELECT MIN(doc_id) FROM documents GROUP BY md5(text))""".stripMargin

  /** Winnowing parameters: hash every 3-word k-gram, keep the minimum of
    * each 4-position window (Schleimer/Wilkerson/Aiken winnowing — the
    * rolling-hash document sketch used by MOSS-style matchers). */
  val WinnowK = 3
  val WinnowW = 4

  /** q_winnow_fingerprint — winnowed rolling-hash sketch per document:
    * sketch cardinality plus order-independent XOR and min digests.
    * The sketch is a pure per-document function, so it computes INSIDE
    * the scan projection ([[graft.functions.WinnowKernel]]: one gram
    * pass + a monotonic-deque window minimum, O(grams)) — ZERO
    * shuffles, where the r10 window formulation shuffled gram-scale
    * rows through three exchanges (doc window + distinct + rollup).
    * Sketches (not texts) are what downstream matchers join on.
    * [[winnowFingerprintWindow]] keeps the column form as the spec
    * reference; GraftProps pins kernel/window equality. */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprintOf(Tables.documents(spark, dir))

  /** DataFrame core of [[winnowFingerprint]] — any (doc_id, text) frame. */
  def winnowFingerprintOf(d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(d.sparkSession)
    d.select(col("doc_id"), call_function(
        graft.functions.GraftFunctions.WinnowName,
        col("text"), lit(WinnowK), lit(WinnowW)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s.sketch_size").as("sketch_size"),
        col("s.sketch_min").as("sketch_min"), col("s.sketch_xor").as("sketch_xor"))
  }

  /** The r10 window formulation of [[winnowFingerprint]] — gram explode,
    * per-doc window min, distinct, rollup. Kept as the kernel's spec
    * reference (GraftProps asserts equality on arbitrary corpora). */
  private[graft] def winnowFingerprintWindowOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = WinnowK
    val words = d
      .select(
        col("doc_id"),
        wsTokens(col("text")).as("w"))
      .filter(size(col("w")) >= k)
    val grams = words.select(
      col("doc_id"),
      size(col("w")).as("nw"),
      posexplode(expr(
        s"transform(sequence(1, size(w) - ${k - 1}), i -> xxhash64(concat_ws(' ', slice(w, i, $k))))")))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "h")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, WinnowW - 1)
    // window min FIRST (over every gram row), THEN keep only full-window
    // start positions — filtering first would truncate trailing frames
    // and drop short docs entirely. Docs with fewer than W grams keep
    // their single (partial) window at i=0, per winnowing convention.
    val winnowed = grams
      .withColumn("n_grams", col("nw") - (k - 1))
      .withColumn("wmin", min(col("h")).over(byDoc))
      .filter(col("i") <= greatest(col("n_grams") - WinnowW, lit(0)))
      .select(col("doc_id"), col("wmin"))
      .distinct()
    winnowed
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("sketch_size"),
        min(col("wmin")).as("sketch_min"),
        expr("bit_xor(wmin)").as("sketch_xor"))
  }

  // q_winnow_fingerprint has no SQL oracle: the sketch values are
  // xxhash64-based and DuckDB has no compatible hash. Driver records a
  // rows-only check; WinnowSpec carries the correctness invariants.

  /** q_train_split — deterministic train/val/test assignment by CONTENT
    * fingerprint, not doc id: exact duplicates land in the same split,
    * the leakage guard a random split lacks (and re-runs are stable — no
    * RNG). The md5 hex prefix is uniform, and lowercase hex is
    * ASCII-ordered, so lexicographic thresholds give clean fractions:
    * '00'-'cb' ≈ 79.7% train, 'cc'-'e5' ≈ 10.2% val, rest test. Pure
    * scalar projection — scan speed at any corpus size. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    trainSplitOf(docs(spark, dir))

  /** Whitespace tokenization of a text column — trim, collapse `\s+`
    * runs, split on single spaces — THE single Column definition every
    * token-level operator shares (tf/df, bigrams, shingle reference
    * forms, BPE vocab). The oracle-parity contract requires each use
    * site's SQL mirror (`STRING_SPLIT(REGEXP_REPLACE(TRIM(text), '\s+',
    * ' ', 'g'), ' ')`) to stay byte-equivalent to this expression; one
    * definition makes per-operator drift impossible. An empty document
    * yields ONE empty token (split semantics) — consumers that must not
    * rank empty tokens filter them explicitly, mirrored in their SQL. */
  private[graft] def wsTokens(c: Column): Column =
    split(regexp_replace(trim(c), "\\s+", " "), " ")

  /** The content split key over a `text` column — THE single definition
    * every split consumer shares (q_train_split, q_contamination): a
    * boundary or key-derivation change here moves them together, never
    * silently apart. */
  private[graft] def splitKeyCol: Column =
    substring(md5(col("text").cast(BinaryType)), 1, 2)

  /** Split assignment from a [[splitKeyCol]] value. */
  private[graft] def splitCol(key: Column): Column =
    when(key < "cc", "train").when(key < "e6", "val").otherwise("test")

  /** DataFrame core of [[trainSplit]] — the pipeline chains it over the
    * CLEANED corpus rather than raw documents. */
  def trainSplitOf(docsDf: DataFrame): DataFrame =
    docsDf.select(
      col("doc_id"),
      splitKeyCol.as("split_key"),
      splitCol(splitKeyCol).as("split"))

  val trainSplitOracle: String =
    """SELECT doc_id, SUBSTRING(md5(text), 1, 2) AS split_key,
      |  CASE WHEN SUBSTRING(md5(text), 1, 2) < 'cc' THEN 'train'
      |    WHEN SUBSTRING(md5(text), 1, 2) < 'e6' THEN 'val'
      |    ELSE 'test' END AS split
      |FROM documents""".stripMargin

  /** q_corpus_clean — the composed curation query an LLM-data pipeline
    * actually ships: canonical copies only (exact dedup), quality score
    * above threshold, confident language ID. One scan + one broadcast
    * semi-join; the scalar stages reuse the exact expressions of
    * q_text_quality / q_lang_id, so this is the end-to-end composition,
    * not a reimplementation. */
  /** Deduped corpus with per-doc language + quality + token count (the
    * kernel scan shared by the curation queries — corpusClean filters it
    * on a fixed floor, [[qualityThresholds]] derives per-language floors
    * from it, [[corpusCleanAdaptive]] applies them). */
  private def scoredDocs(spark: SparkSession, dir: String): DataFrame = {
    val keep = dedupExact(spark, dir).select(col("keep_doc_id").as("doc_id"))
    // kernel BEFORE the dedup semi-join (r14): joining first semi-joins
    // the raw text column, and when the keep side's size estimate blocks
    // the broadcast the full text shuffles on doc_id — at sf1 that wire
    // cost tripled the query. Projected to (doc_id, stats struct) the
    // rows crossing the join are 11 ints wide whatever the planner
    // picks, and at warehouse scale text-never-shuffles is the shape
    // that survives (stats on later-discarded duplicates are scan-local
    // compute, the cheap currency).
    docs(spark, dir)
      .select(col("doc_id"), textStatsCol(spark).as("ts"))
      .join(keep, Seq("doc_id"), "left_semi")
      .select(
        col("doc_id"),
        predLangOf(col("ts")).as("pred_lang"),
        qualityScoreOf(col("ts")).as("quality_score"),
        bpeTokensOf(col("ts")).as("n_bpe_tokens"))
      // lineage barrier: without it a caller's pred_lang filter pushes
      // below the projection and the rewrite re-invokes the stats
      // kernel PER FIELD REFERENCE in the Filter stage (the executed
      // plan showed graft_text_stats(text) 14x inside one condition —
      // kernel paid twice per row end-to-end, the sf1 pair's
      // quality_thresholds row). Behind the barrier the kernel runs
      // once in the scan stage and filters see materialized columns.
      //
      // TRADE-OFFS of the barrier (documented, r14 verdict #5):
      // - pushdown stops here: a selective consumer's doc_id predicate
      //   no longer prunes the underlying parquet scan. Correct for
      //   THIS frame because its consumers (corpus_clean, corpus_stats,
      //   quality thresholds/floors) are full-corpus by definition.
      // - the lazily materialized blocks pin executor storage memory
      //   until the RDD is GC'd (ContextCleaner unpins them with the
      //   frame). The frame is skinny — doc_id + a lang byte + two
      //   numbers, ~30 bytes/row, ~1.5 MB per 50k-doc sf1 corpus —
      //   and storage stays bounded across a full suite pass
      //   (BarrierStorageSpec pins the bound).
      .localCheckpoint(eager = false)
  }

  def corpusClean(spark: SparkSession, dir: String, minQuality: Double = 0.5): DataFrame =
    scoredDocs(spark, dir)
      .filter(col("quality_score") >= minQuality && col("pred_lang") =!= "und")

  /** The deduped + scored corpus in oracle SQL — shared CTE body of the
    * curation oracles (mirrors [[scoredDocs]]). */
  private val scoredSql: String =
    """SELECT doc_id,
      |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
      |    WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
      |    WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
      |    WHEN c_fr > 0 THEN 'fr'
      |    ELSE 'und' END AS pred_lang,
      |  LEAST(n_words / 50.0, 1.0) * 0.5
      |    + LEAST(CASE WHEN n_words > 0 THEN n_stops / n_words ELSE 0.0 END * 4.0, 1.0) * 0.3
      |    + (1.0 - LEAST(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END * 5.0, 1.0)) * 0.2 AS quality_score,
      |  n_bpe_tokens
      |FROM (
      |  SELECT doc_id,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(the|and|of|to|is|in|that|it)\b')) AS INT) AS c_en,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(el|la|de|que|y|los|las|es)\b')) AS INT) AS c_es,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(der|die|und|das|ist|ein|nicht)\b')) AS INT) AS c_de,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(le|la|et|les|des|un|une|est)\b')) AS INT) AS c_fr,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+')) AS DOUBLE) AS n_words,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS DOUBLE) AS n_stops,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) AS n_punct,
      |    CAST(LENGTH(text) AS DOUBLE) AS n_chars,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_bpe_tokens
      |  FROM documents
      |  WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
      |)""".stripMargin

  val corpusCleanOracle: String =
    s"""WITH scored AS (
       |${"  " + scoredSql.replace("\n", "\n  ")}
       |)
       |SELECT doc_id, pred_lang, quality_score, n_bpe_tokens
       |FROM scored
       |WHERE quality_score >= 0.5 AND pred_lang <> 'und'""".stripMargin

  /** Quantile used as the data-derived per-language quality floor: the
    * bottom [[QualityQuantile]] of each language's quality distribution
    * is dropped (instead of the fixed 0.5 of [[corpusClean]]). */
  val QualityQuantile = 0.25

  /** q_quality_thresholds — per-language quality floors DERIVED FROM THE
    * DATA: the [[QualityQuantile]] quantile (linear interpolation) of
    * each predicted language's quality distribution over the deduped
    * corpus. Uses Spark's exact `percentile` (matches DuckDB's
    * QUANTILE_CONT definition) so the oracle is a hash gate; at 100 TB
    * swap in `approx_percentile` — a mergeable one-pass sketch with the
    * same API shape — which the spec bounds against the exact form. */
  def qualityThresholds(spark: SparkSession, dir: String): DataFrame =
    qualityThresholds(spark, dir, approx = false)

  /** `approx = true` is the 100 TB swap: exact `percentile` buffers every
    * group value (fine at language-group cardinality on the harness;
    * unbounded memory against a 100 TB corpus), while the engine's OWN
    * mergeable KLL sketch ([[graft.functions.KllSketch]], the same
    * aggregate maintaining the STREAMING floors) holds O(k·log(n/k))
    * state per group with the deterministic rank-error bound
    * `KllSketch.rankErrorBound` — the spec bounds the observed drift
    * against the exact quantile. One sketch for every quantile surface
    * means batch-built and stream-maintained states merge. The exact
    * form stays the default because it is what the DuckDB QUANTILE_CONT
    * hash oracle matches bit-for-bit. */
  def qualityThresholds(spark: SparkSession, dir: String, approx: Boolean): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val grouped = scoredDocs(spark, dir)
      .filter(col("pred_lang") =!= "und")
      .groupBy(col("pred_lang"))
    if (approx)
      grouped
        .agg(
          count(lit(1)).as("n_docs"),
          call_function(graft.functions.GraftFunctions.KllName,
            col("quality_score"),
            lit(graft.functions.KllSketch.DefaultK)).as("sketch"))
        .select(col("pred_lang"), col("n_docs"),
          call_function(graft.functions.GraftFunctions.KllQuantileName,
            col("sketch"), lit(QualityQuantile)).as("q_low"))
    else
      grouped.agg(
        count(lit(1)).as("n_docs"),
        percentile(col("quality_score"), lit(QualityQuantile)).as("q_low"))
  }

  val qualityThresholdsOracle: String =
    s"""WITH scored AS (
       |${"  " + scoredSql.replace("\n", "\n  ")}
       |)
       |SELECT pred_lang, COUNT(*) AS n_docs,
       |  QUANTILE_CONT(quality_score, $QualityQuantile) AS q_low
       |FROM scored WHERE pred_lang <> 'und' GROUP BY pred_lang""".stripMargin

  /** q_corpus_clean_adaptive — curation with the data-derived floors of
    * [[qualityThresholds]]: each language keeps its top 1-q of quality
    * mass, so a language whose heuristic scores run systematically lower
    * (different stopword densities) is not over-pruned by a global
    * constant. The thresholds frame is language-cardinality — broadcast
    * onto the scored scan; at corpus scale this is one extra
    * group-cardinality aggregation over the same kernel pass. */
  /** The deduped scored corpus restricted to confident language IDs —
    * the frame both threshold derivation and adaptive cleaning consume
    * (the pipeline persists floors from it, then cleans with them). */
  def scoredCorpus(spark: SparkSession, dir: String): DataFrame =
    scoredDocs(spark, dir).filter(col("pred_lang") =!= "und")

  /** Apply precomputed per-language quality floors (any frame with
    * `(pred_lang, q_low)` — e.g. the pipeline's persisted
    * corpus_thresholds layer) to a scored corpus. */
  def corpusCleanWithFloors(scored: DataFrame, floors: DataFrame): DataFrame =
    scored
      .join(broadcast(floors.select(col("pred_lang"), col("q_low"))), Seq("pred_lang"))
      .filter(col("quality_score") >= col("q_low"))
      .select(col("doc_id"), col("pred_lang"), col("quality_score"), col("n_bpe_tokens"))

  def corpusCleanAdaptive(spark: SparkSession, dir: String): DataFrame = {
    // the scored subtree (dedup agg + semi-join + kernel scan) feeds both
    // the threshold aggregation and the final probe side; the lazy
    // checkpoint computes it once (same pattern as Dedup.shingleSets)
    val scored = scoredCorpus(spark, dir).localCheckpoint(eager = false)
    val th = scored
      .groupBy(col("pred_lang"))
      .agg(percentile(col("quality_score"), lit(QualityQuantile)).as("q_low"))
    corpusCleanWithFloors(scored, th)
  }

  val corpusCleanAdaptiveOracle: String =
    s"""WITH scored AS (
       |${"  " + scoredSql.replace("\n", "\n  ")}
       |), th AS (
       |  SELECT pred_lang, QUANTILE_CONT(quality_score, $QualityQuantile) AS q_low
       |  FROM scored WHERE pred_lang <> 'und' GROUP BY pred_lang
       |)
       |SELECT s.doc_id, s.pred_lang, s.quality_score, s.n_bpe_tokens
       |FROM scored s JOIN th t ON s.pred_lang = t.pred_lang
       |WHERE s.quality_score >= t.q_low""".stripMargin

  /** q_corpus_stats — the curation report over the CLEAN corpus: docs,
    * token totals and mean quality per predicted language. Quality sums
    * run in DECIMAL(18,9) (the score is a derived double; truncating to 9
    * decimals before summing keeps the aggregate bit-deterministic under
    * any partitioning, per the engine-wide exact-sum contract). */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    corpusStatsOf(corpusClean(spark, dir))

  /** DataFrame core of [[corpusStats]] — the pipeline feeds it the
    * already-built clean frame instead of recomputing the curation. */
  def corpusStatsOf(clean: DataFrame): DataFrame =
    clean
      .groupBy(col("pred_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bpe_tokens").cast(LongType)).as("total_bpe_tokens"),
        (sum(col("quality_score").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("avg_quality"))

  val corpusStatsOracle: String = {
    val cleanSql = corpusCleanOracle.replace("\n", "\n  ")
    s"""WITH clean AS (
       |  $cleanSql
       |)
       |SELECT pred_lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CAST(n_bpe_tokens AS BIGINT)) AS BIGINT) AS total_bpe_tokens,
       |  CAST(SUM(CAST(quality_score AS DECIMAL(18,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_quality
       |FROM clean GROUP BY pred_lang""".stripMargin
  }

  /** q_vocab_top — corpus vocabulary report: the 50 highest-document-
    * frequency words (normalized lowercase alpha), ties broken by word.
    * The heavy pass is one map-side-combined count over distinct
    * (doc, word) pairs — one row per distinct word through the shuffle;
    * the top-k is a tiny sorted limit over vocabulary cardinality. */
  def vocabTop(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    docs(spark, dir)
      .select(
        // per-doc distinct INSIDE the scan projection (array_distinct
        // over the token array) — the df count then needs only ONE
        // map-side-combined aggregation, where a (doc_id, word)
        // DISTINCT paid a full pair shuffle before the word rollup.
        // Non-letters become SEPARATORS (replacing with '' would weld
        // words across punctuation/newlines into fabricated tokens).
        explode(array_distinct(
          split(trim(regexp_replace(lower(col("text")), "[^a-z]", " ")), " +"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word"))
      .limit(k)

  val vocabTopOracle: String =
    """SELECT word, df FROM (
      |  SELECT word, COUNT(*) AS df FROM (
    |    SELECT DISTINCT doc_id,
      |      UNNEST(STRING_SPLIT_REGEX(TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z]', ' ', 'g')), ' +')) AS word
      |    FROM documents
      |  ) WHERE word <> '' GROUP BY word
      |) ORDER BY df DESC, word LIMIT 50""".stripMargin

  /** Target per-source share for [[corpusMix]]: quota = ceil(0.6 x
    * smallest source's count). */
  val MixRate = 0.6

  /** q_corpus_mix — per-source mixing/rebalancing for pretraining-data
    * composition: derive a per-source keep rate from the data (quota =
    * [[MixRate]] x the smallest source, rate capped at 1), then select
    * deterministically by content hash — md5-prefix thresholds expressed
    * as lexicographic hex comparisons, so selection is content-keyed
    * (duplicates co-selected), reproducible (no RNG), and pure scan +
    * broadcast join (rates are source-cardinality). */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    // min_src via an unpartitioned window over the SOURCE-cardinality
    // counts frame (r21): the crossJoin(broadcast(counts.agg(min)))
    // form re-derived counts from a second documents scan + aggregate
    // chain per serve (plans/r21/q_corpus_mix_before.txt — three
    // documents scans for one query). The single-partition window is
    // the audited dim-scale shape (GraftSession note): counts is
    // bounded by the source dimension, never fact volume.
    val rates = counts
      .withColumn("min_src", min(col("n_src")).over(
        org.apache.spark.sql.expressions.Window.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(
        col("source"),
        least(lit(1.0),
          ceil(col("min_src").cast(DoubleType) * lit(MixRate)).cast(DoubleType) /
            col("n_src").cast(DoubleType)).as("rate"))
    // 8 hex digits (2^32 buckets): a heavily-skewed source with rate ~
    // quota/n_src must not quantize to a zero threshold and vanish (4
    // digits would drop any source more than ~65536/quota times the
    // smallest one)
    val selKey = substring(md5(col("text").cast(BinaryType)), 1, 8)
    val thresh = format_string("%08x", floor(col("rate") * lit(4294967296.0)).cast(LongType))
    d.join(broadcast(rates), Seq("source"))
      .withColumn("sel_key", selKey)
      // rate >= 1 keeps everything ('ffff' would compare above the 5-char
      // threshold string and wrongly drop)
      .filter(col("rate") >= 1.0 || col("sel_key") < thresh)
      .select(col("doc_id"), col("source"), col("sel_key"))
  }

  val corpusMixOracle: String =
    """WITH counts AS (
      |  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
      |), m AS (
      |  SELECT MIN(n_src) AS min_src FROM counts
      |), rates AS (
      |  SELECT source,
      |    LEAST(1.0, CEIL(CAST(min_src AS DOUBLE) * 0.6) / CAST(n_src AS DOUBLE)) AS rate
      |  FROM counts, m
      |)
      |SELECT doc_id, d.source, SUBSTRING(md5(text), 1, 8) AS sel_key
      |FROM documents d JOIN rates r ON d.source = r.source
      |WHERE r.rate >= 1.0
      |   OR SUBSTRING(md5(text), 1, 8) < printf('%08x', CAST(FLOOR(r.rate * 4294967296.0) AS BIGINT))""".stripMargin

  // ------------------------------------------------- sequence packing

  val PackBudget = 512
  val PackGroupSize = 1000L

  /** `bin_fill` is the bin's cumulative token total AFTER placing this
    * doc — monotone within a bin, so max(bin_fill) per bin is the final
    * fill (what the packing spec bounds against the budget). */
  case class PackedDoc(doc_id: Long, n_tokens: Int, bin_id: Long, bin_fill: Long)

  /** q_pack_sequences — greedy sequence packing for pretraining: assign
    * each document to a bin whose total BPE tokens stays within
    * [[PackBudget]] (first-fit in doc_id order; an oversized doc gets its
    * own bin). Packing is GROUP-LOCAL over fixed doc_id ranges of
    * [[PackGroupSize]] — a deliberate scale/determinism decision: global
    * first-fit is inherently sequential, while id-range groups bound
    * packer memory, parallelize embarrassingly, and make bin assignment
    * INVARIANT to partitioning (the engine's determinism contract —
    * verified bit-identical across thread counts like every query).
    * bin_id = range_group * 2^20 + local bin. */
  def packSequences(spark: SparkSession, dir: String, budget: Int = PackBudget): DataFrame =
    packSequencesOf(spark, docs(spark, dir), budget)

  /** First-fit over open bins in the given (already-ordered) doc
    * sequence: fills array indexed by local bin id within the range
    * group. */
  private def firstFit(group: Long, ordered: Seq[(Long, Int)],
      budget: Int): Iterator[PackedDoc] = {
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    ordered.iterator.map { case (docId, n) =>
      var b = 0
      while (b < fills.length && fills(b) + n > budget) b += 1
      if (b == fills.length) fills += 0L
      fills(b) += n
      PackedDoc(docId, n, group * (1L << 20) + b, fills(b))
    }
  }

  private def tokenCounts(spark: SparkSession, docsDf: DataFrame) = {
    import spark.implicits._
    docsDf
      .select(col("doc_id"), textStatsCol(spark).as("ts"))
      .select(
        col("doc_id"),
        bpeTokensOf(col("ts")).cast(IntegerType).as("n_tokens"))
      .as[(Long, Int)]
  }

  /** DataFrame core of [[packSequences]] — the pipeline chains it over
    * the CLEANED corpus rather than raw documents. */
  def packSequencesOf(spark: SparkSession, docsDf: DataFrame,
      budget: Int = PackBudget): DataFrame = {
    import spark.implicits._
    tokenCounts(spark, docsDf)
      .groupByKey(_._1 / PackGroupSize)
      .flatMapGroups { (group, rows) =>
        firstFit(group, rows.toSeq.sortBy(_._1), budget)
      }
      .toDF()
      .select(col("doc_id"), col("n_tokens"), col("bin_id"), col("bin_fill"))
  }

  /** q_pack_bucketed — length-aware packing: within each id-range group,
    * docs are ordered by DESCENDING token length (doc_id tie-break)
    * before the same first-fit — first-fit-decreasing, the classical
    * fragmentation cut (big items placed while bins are empty; small
    * items fill the remaining slack). Same determinism contract as
    * [[packSequences]]: ordering depends only on (n_tokens, doc_id) and
    * packing stays group-local over fixed id ranges, so bin assignment is
    * partition-invariant — and the same scale shape (bounded packer
    * memory, embarrassing parallelism across groups). The spec asserts
    * it never uses more bins than arrival-order first-fit on the harness
    * corpus. */
  def packSequencesBucketed(spark: SparkSession, dir: String,
      budget: Int = PackBudget): DataFrame =
    packSequencesBucketedOf(spark, docs(spark, dir), budget)

  /** DataFrame core of [[packSequencesBucketed]]. */
  def packSequencesBucketedOf(spark: SparkSession, docsDf: DataFrame,
      budget: Int = PackBudget): DataFrame = {
    import spark.implicits._
    tokenCounts(spark, docsDf)
      .groupByKey(_._1 / PackGroupSize)
      .flatMapGroups { (group, rows) =>
        firstFit(group, rows.toSeq.sortBy(r => (-r._2, r._1)), budget)
      }
      .toDF()
      .select(col("doc_id"), col("n_tokens"), col("bin_id"), col("bin_fill"))
  }

  /** Exact DuckDB oracle for the pack family (r16 verdict #8 asked for
    * partial invariant checks; full first-fit turns out expressible):
    * a recursive CTE carries each group's open-bin fills as a BIGINT
    * list and replays first-fit one doc per iteration — recursion depth
    * is bounded by [[PackGroupSize]], not corpus size, because groups
    * advance in lockstep. `ordering` is the within-group placement
    * order (doc_id for first-fit, n DESC/doc_id for
    * first-fit-decreasing). Not-found probes read COALESCE(pos,0)=0:
    * DuckDB's list_position yields 0/NULL for absent. Token counts are
    * the q_text_tokens oracle's proven n_bpe_tokens expression. */
  private def packOracle(ordering: String): String = {
    val pos = "list_position(list_transform(f.fills, x -> x + s.n <= " +
      s"$PackBudget), true)"
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id,
       |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n,
       |    doc_id // $PackGroupSize AS grp
       |  FROM documents
       |), seq AS (
       |  SELECT doc_id, n, grp,
       |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY $ordering) AS rn
       |  FROM toks
       |), fit AS (
       |  SELECT grp, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS fills,
       |         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INT) AS n_tokens,
       |         CAST(NULL AS BIGINT) AS bin_id, CAST(NULL AS BIGINT) AS bin_fill
       |  FROM (SELECT DISTINCT grp FROM seq)
       |  UNION ALL
       |  SELECT s.grp, s.rn,
       |    CASE WHEN COALESCE($pos, 0) = 0
       |         THEN list_append(f.fills, CAST(s.n AS BIGINT))
       |         ELSE list_transform(f.fills, (x, i) ->
       |           CASE WHEN i = list_position(list_transform(f.fills, y -> y + s.n <= $PackBudget), true)
       |                THEN x + s.n ELSE x END)
       |    END,
       |    s.doc_id, s.n,
       |    s.grp * ${1L << 20} + CAST(
       |      CASE WHEN COALESCE($pos, 0) = 0
       |           THEN LEN(f.fills)
       |           ELSE $pos - 1 END AS BIGINT),
       |    CASE WHEN COALESCE($pos, 0) = 0
       |         THEN CAST(s.n AS BIGINT)
       |         ELSE f.fills[$pos] + s.n END
       |  FROM fit f JOIN seq s ON s.grp = f.grp AND s.rn = f.rn + 1
       |)
       |SELECT doc_id, n_tokens, bin_id, bin_fill FROM fit WHERE rn > 0""".stripMargin
  }

  val packSequencesOracle: String = packOracle("doc_id")
  val packBucketedOracle: String = packOracle("n DESC, doc_id")
}
