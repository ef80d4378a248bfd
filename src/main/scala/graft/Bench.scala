package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line of per-query wall times at the target
  * scale factor. Each query is first run once at sf0.001 so codegen/JIT
  * warmup is not attributed to the measured run, then ONCE untimed at the
  * target SF — that pass absorbs one-per-corpus-generation costs (sidecar
  * index training for IVF/PQ/postings/classifier, parquet footer reads)
  * that r8 showed land in the measured window whenever the driver
  * regenerates testdata: the bench's contract is steady-state SERVE time,
  * the builds amortize across a corpus generation's lifetime and their
  * cost is reported separately (`warm_target_sec` in bench_out.json).
  * Then each query is timed for `SPARK_GRAFT_BENCH_ITERS` iterations
  * (default 3) at the target SF, in whole ROUNDS gated by a wall-clock
  * budget (`SPARK_GRAFT_BENCH_BUDGET`, default 400s from process start):
  * round 1 always covers every query; later rounds run only while the
  * budget holds, so a build-heavy warm pass degrades sample counts
  * uniformly instead of overrunning the driver's bounded window. The
  * reported per-query number is the MEDIAN of those runs; the `spread`
  * map carries min/max so a regression can be told apart from
  * single-run noise (r3's apparent 1.8x regressions on untouched
  * operators were unresolvable at n=1).
  * A query that THROWS in the measured loop would otherwise read as a
  * suspiciously-fast success (r8: the five events-table queries failed at
  * plan time and printed as 0.00s) — failures are collected into an
  * `errors` map in bench_out.json and echoed on stderr.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) 0.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Hard budget for the one parseable stdout line: the driver captures a
    * bounded tail; r4/r5 showed ~1900 chars clips, so 1750 leaves margin. */
  private[graft] val CompactBudget = 1750

  // Locale.ROOT everywhere: the default-locale format would emit decimal
  // COMMAS on a comma-decimal host locale — invalid JSON on the one line
  // that must stay parseable.
  private def fj(x: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, x)
  private def f3(x: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, x)
  private def f2(x: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, x)
  private def f1(x: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, x)
  // compact-line values drop cosmetic trailing zeros ("0.30" -> "0.3",
  // "1.00" -> "1") — identical numbers, ~40 fewer chars at 80 queries
  private def trim0(s: String): String =
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s

  /** Deterministic per-token key abbreviation — the "shorten query keys"
    * lever the r8/r9 size guards named, pulled before it is needed this
    * time (r10's guard `sys.error`'d at 89 queries AFTER the measurement
    * loop, discarding every sample — BENCH_r10.json rc=1). Per underscore
    * token: ≤4-char tokens pass through; longer tokens keep their first
    * char plus following consonants, capped at 4 chars. Collisions get a
    * numeric suffix (none at the current query set — BenchLineSpec
    * asserts). bench_out.json always carries the full-name map
    * (`compact_keys`) and BASELINE.md's appendix mirrors it. */
  private[graft] def abbrevKeys(names: Seq[String]): Map[String, String] = {
    def ab(n: String): String = n.stripPrefix("q_").split('_').map { t =>
      if (t.length <= 4) t
      else (t.take(1) + t.drop(1).filterNot("aeiou".contains(_))).take(4)
    }.mkString("_")
    val used = scala.collection.mutable.HashSet.empty[String]
    names.map { n =>
      var k = ab(n)
      var i = 2
      while (!used.add(k)) { k = ab(n) + i; i += 1 }
      n -> k
    }.toMap
  }

  /** The latest committed driver-protocol same-window pair's ratio
    * (r14 verdict #8): BENCH totals drift with the machine window
    * (BENCH_r14 read +25% while the same-window ratio was stable), so
    * the one self-contained disambiguator — the interleaved pair's
    * graft/DuckDB ratio over the shared oracled queries — rides in the
    * bench artifact and compact line. Reads the newest
    * tools/driver_protocol_sf01_r*_{duckdb,graft}.json pair; None when
    * absent (fresh checkout) — reporting never fails the bench. */
  private[graft] def pairRatio(toolsDir: String = "tools"): Option[(String, Double)] =
    try {
      val re = """driver_protocol_sf01_(r\d+)_duckdb\.json""".r
      val rounds = Option(new java.io.File(toolsDir).listFiles)
        .getOrElse(Array.empty[java.io.File]).map(_.getName)
        .collect { case re(r) => r }
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      // newest COMPLETE pair wins: a round whose graft twin is missing
      // (withdrawn, or not yet committed) must not void the fallback to
      // the previous complete pair
      rounds.sortBy(-_.drop(1).toInt).iterator.flatMap { r =>
        try {
          val duck = om.readTree(new java.io.File(s"$toolsDir/driver_protocol_sf01_${r}_duckdb.json"))
          val graft = om.readTree(new java.io.File(s"$toolsDir/driver_protocol_sf01_${r}_graft.json"))
            .get("queries")
          import scala.jdk.CollectionConverters._
          val shared = graft.fieldNames().asScala.filter(duck.has(_)).toSeq
          val g = shared.map(graft.get(_).asDouble).sum
          val d = shared.map(duck.get(_).asDouble).sum
          if (shared.nonEmpty && d > 0) Some((r, g / d)) else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }.nextOption()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fit the compact stdout line inside [[CompactBudget]]. TOTAL — every
    * rung degrades further and the final fallback always fits, so the
    * reporting step can never again crash the bench after measurement
    * (the r10 failure mode; bench_out.json is additionally written BEFORE
    * this runs). Rungs: full prefixless keys at 10 ms then 100 ms value
    * precision; abbreviated keys at 10 ms then 100 ms; abbreviated keys
    * with the per-query map dropped (total + failed counts only); a
    * minimal total-only line. Full 0.1 ms precision and full names always
    * persist in bench_out.json. Returns (line, usedAbbrevKeys). */
  private[graft] def compactLine(results: Seq[(String, Double)],
      errCounts: collection.Map[String, Int], sfName: String,
      pair: Option[(String, Double)] = None): (String, Boolean) = {
    val abbrev = abbrevKeys(results.map(_._1))
    val strip = (k: String) => k.stripPrefix("q_")
    // the same-window pair ratio disambiguates a drifted total in the
    // ONE artifact the driver's bounded capture always sees (~20 chars)
    val pairField =
      pair.map { case (r, x) => s""","pair":"$r:${f2(x)}"""" }.getOrElse("")
    def line(keyOf: String => String, fmt: Double => String,
        withQueries: Boolean, withFailed: Boolean): String = {
      val qs =
        if (withQueries)
          results.map { case (k, med) => "\"" + keyOf(k) + "\":" + trim0(fmt(med)) }
            .mkString("{", ",", "}")
        else "{}"
      // transient failures stay VISIBLE in the one line the driver's
      // bounded capture sees (the r8 lesson): a query that failed some
      // rounds but kept a median gets a failed-round count here; a query
      // with zero successes is already the unmistakable -1
      val failed =
        if (errCounts.isEmpty || !withFailed) ""
        else errCounts.map { case (k, n) => "\"" + keyOf(k) + "\":" + n }
          .mkString(""","failed_rounds":{""", ",", "}")
      // with the map present, value is the sum of the line's own rounded
      // medians so sum(queries) reconciles EXACTLY inside the document;
      // without it, the true-median sum
      val total =
        if (withQueries) f3(results.map(r => fmt(r._2).toDouble).sum)
        else f3(results.map(_._2).sum)
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$failed$pairField,"sf":"$sfName"}"""
    }
    val ladder: Seq[(String, Boolean)] = Seq(
      (line(strip, f2, true, true), false),
      (line(strip, f1, true, true), false),
      (line(abbrev, f2, true, true), true),
      (line(abbrev, f1, true, true), true),
      (line(abbrev, f1, withQueries = false, withFailed = true), true),
      (line(strip, f1, withQueries = false, withFailed = false), false))
    ladder.find(_._1.length <= CompactBudget).getOrElse(ladder.last)
  }

  def main(args: Array[String]): Unit = {
    val mainStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val cpus = GraftSession.cpus
    val spark = GraftSession.builder("graft-bench").master(s"local[$cpus]").getOrCreate()
    GraftSession.tuneLogs(spark)
    // BENCH-ONLY: silence the benign stale-accumulator spam — when a
    // lazily-checkpointed RDD block is evicted and recomputed in a later
    // query, its tasks report SQL-metric/observe accumulators that the
    // original (completed) execution already unregistered; results are
    // unaffected, but each occurrence prints a 10-line stack trace that
    // eats the driver's bounded stdout-tail budget right where the one
    // parseable JSON line must survive (the r8 tail carried exactly this
    // fragment). Filtered by MESSAGE, not by dropping whole loggers to
    // FATAL: a genuine mid-bench scheduler failure must still print.
    try {
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      val deny = org.apache.logging.log4j.core.Filter.Result.DENY
      val neutral = org.apache.logging.log4j.core.Filter.Result.NEUTRAL
      val f = new org.apache.logging.log4j.core.filter.AbstractFilter(deny, neutral) {
        private def check(msg: String): org.apache.logging.log4j.core.Filter.Result =
          if (msg != null && (msg.contains("Failed to update accumulator") ||
            msg.contains("garbage collected accumulator") ||
            // cosmetic truncation notice (the GraftSession conf raises
            // the cap for session-bound renders, but detached threads
            // fall back to default conf) and the checkpoint-block
            // re-add notice — both benign, both tail-budget eaters
            msg.contains("Truncated the string representation") ||
            msg.contains("already exists on this machine"))) deny
          else neutral
        override def filter(e: org.apache.logging.log4j.core.LogEvent)
            : org.apache.logging.log4j.core.Filter.Result =
          check(if (e.getMessage == null) null else e.getMessage.getFormattedMessage)
      }
      ctx.getConfiguration.getRootLogger.addFilter(f)
      ctx.updateLoggers()
    } catch { case scala.util.control.NonFatal(_) => () }
    // optional comma-separated query-name filter for targeted re-measures
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warm-pass failures must be VISIBLE in the artifact: the r12 tail
    // carried a swallowed warm-pass stack trace that the errors map (which
    // only covers the measured loop) could not disclose — a query that
    // fails at warm but recovers in the loop was silent
    val warmErrors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def describe(e: Throwable): String =
      s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}"
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case e: Throwable => warmErrors(s"$name@warmup") = describe(e) }
    }
    // untimed target-SF pass: pays per-corpus-generation sidecar builds +
    // cold parquet IO once, outside the measured window; its wall time is
    // still recorded (warm map) so build cost stays visible, not hidden
    val warmTarget = names.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => warmErrors(name) = describe(e) }
      (name, (System.nanoTime() - t0) / 1e9)
    }.toMap
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val errCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // Wall-clock budget, anchored at PROCESS start: the driver's capture
    // window is bounded (r8's run ended at exactly 600s), and a fresh
    // testdata generation can put minutes of index builds into the warm
    // pass before measurement even starts. Round 1 always measures EVERY
    // query once; each further full round runs only while the budget
    // holds — overrun uniformly degrades the medians' sample count,
    // never the coverage, never the JSON line.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "400").toDouble
    def withinBudget: Boolean = (System.nanoTime() - mainStart) / 1e9 < budgetSec
    val samples = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> Vector.empty[Double]): _*)
    var roundsRun = 0
    (1 to iters).foreach { r =>
      if (r == 1 || withinBudget) {
        roundsRun = r
        names.foreach { name =>
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, sfDir).count()
            // only SUCCESSFUL runs sample: a failed run's time-to-throw
            // must not dilute the median
            samples(name) :+= (System.nanoTime() - t0) / 1e9
          }
          catch { case e: Throwable =>
            errors(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}"
            errCounts(name) = errCounts.getOrElse(name, 0) + 1
          }
        }
      }
    }
    // a query with NO successful run reports -1 (not its near-zero
    // time-to-throw): the r8 events failures read as suspiciously-fast
    // successes in the compact line, which is the only artifact the
    // driver's bounded capture sees — a negative median is unmistakable
    // there. A TRANSIENT failure (some rounds succeeded) keeps the
    // median over its successful samples and stays disclosed in the
    // errors map, instead of discarding every valid sample.
    val results = names.map { n =>
      val ts = samples(n)
      if (ts.isEmpty) (n, -1.0, -1.0, -1.0)
      else (n, median(ts), ts.min, ts.max)
    }
    if (roundsRun < iters) System.err.println(
      s"[bench] wall budget ${budgetSec}s reached after $roundsRun of $iters rounds")
    errors.foreach { case (n, m) => System.err.println(s"[bench] $n FAILED: $m") }
    warmErrors.foreach { case (n, m) =>
      System.err.println(s"[bench] warm-pass $n FAILED: $m") }
    // The full artifact uses full query names and 0.1 ms precision; the
    // COMPACT line's per-query values use 10 ms precision while the line
    // fits (run-to-run spread is an order of magnitude above 10 ms).
    val qs = results.map { case (k, med, _, _) => "\"" + k + "\":" + fj(med) }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, mn, mx) => "\"" + k + "\":[" + fj(mn) + "," + fj(mx) + "]" }
      .mkString("{", ",", "}")
    val total = fj(results.map(_._2).sum)
    // the compact line carries only what the driver's contract names
    // (metric/value/unit/queries/sf — sf as the directory's basename);
    // iteration count, spread and the compact-key map live in bench_out.json
    val sfName = new java.io.File(sfDir).getName
    val warmJson = names.map(n => "\"" + n + "\":" + fj(warmTarget.getOrElse(n, 0.0)))
      .mkString("{", ",", "}")
    // escape EVERY control char: Spark 4 error messages are multi-line,
    // and a raw \n inside the one-line full artifact breaks json.load
    // exactly in the failure case these maps exist to disclose
    def errMapJson(m: collection.Map[String, String]): String = m
      .map { case (k, v) =>
        val esc = v.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c if c < ' ' => "\\u%04x".format(c.toInt)
          case c => c.toString
        }
        "\"" + k + "\":\"" + esc + "\""
      }
      .mkString("{", ",", "}")
    val errJson = errMapJson(errors)
    val warmErrJson = errMapJson(warmErrors)
    // the full-name → compact-key map rides in the artifact UNCONDITIONALLY
    // so the mapping is recoverable whichever ladder rung the line used
    val keyMapJson = abbrevKeys(names)
      .toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val pair = pairRatio()
    val pairJson = pair
      .map { case (r, x) => s""","pair":{"round":"$r","ratio":${fj(x)}}""" }
      .getOrElse("")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"warm_target_sec":$warmJson,"warm_errors":$warmErrJson,"errors":$errJson,"iters":$roundsRun,"compact_keys":$keyMapJson$pairJson,"sf":"$sfDir"}"""
    spark.stop()
    // full JSON (with spread) goes to a file FIRST — r10's compact-line
    // size guard sys.error'd after the measurement loop and before this
    // write, discarding every sample; measurements must survive any
    // reporting failure, so the artifact lands before the line is fitted.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), full.getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }
    // the process's last stdout line is the COMPACT medians-only form
    // (after spark.stop(), so no executor/log4j output can interleave
    // with it). The driver captures a bounded stdout tail — r4/r5's
    // spread-bearing line overflowed it and clipped mid-line, nulling
    // the driver's parse; compactLine is total and always fits.
    val (compact, usedAbbrev) = compactLine(
      results.map(r => (r._1, r._2)), errCounts, sfName, pair)
    if (usedAbbrev) System.err.println(
      "[bench] compact line uses abbreviated keys (map: bench_out.json " +
        "compact_keys; BASELINE.md appendix)")
    println(compact)
    System.out.flush()
  }
}
