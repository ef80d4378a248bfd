package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based checks (ScalaCheck, run natively by sbt): the engine's
  * determinism and operator contracts hold on arbitrary inputs, not just
  * the harness tables.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark: SparkSession = GraftSession.local("graft-props")
  import scala.jdk.CollectionConverters._

  private val rowsGen: Gen[List[(String, Long, Double)]] =
    Gen.listOfN(
      60,
      for {
        key <- Gen.oneOf("a", "b", "c")
        t <- Gen.chooseNum(0L, 20L)
        v <- Gen.chooseNum(-1000, 1000).map(_ / 100.0)
      } yield (key, t, v))

  property("decimal sums are invariant under repartitioning") =
    forAll(rowsGen) { rows =>
      val df = spark.createDataFrame(rows).toDF("k", "t", "v")
      def total(parts: Int): java.math.BigDecimal =
        df.repartition(parts)
          .agg(sum(col("v").cast("decimal(18,2)")).cast("decimal(28,2)"))
          .collect()(0).getDecimal(0)
      rows.isEmpty || {
        val a = total(1); val b = total(7); val c = total(32)
        a == b && b == c
      }
    }

  property("asofJoin matches the naive quadratic definition") =
    forAll(rowsGen, rowsGen) { (factRows, rateRows) =>
      (factRows.nonEmpty && rateRows.nonEmpty) ==> {
        val facts = spark.createDataFrame(
          factRows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) })
          .toDF("key", "t", "fid")
        // one rate per (key, t): keep max v deterministically
        val rates = spark.createDataFrame(rateRows).toDF("key", "t", "rate")
          .groupBy("key", "t").agg(max("rate").as("rate"))
        val got = operators.AsOf.asofJoin(facts, rates, "key", "t", "rate")
          .collect().map(r => r.getAs[Long]("fid") -> Option(r.getAs[Any]("rate"))).toMap
        val rateMap = rates.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        val expected = factRows.zipWithIndex.map { case ((k, t, _), i) =>
          val prior = rateMap.filter(r => r._1 == k && r._2 <= t)
          i.toLong -> (if (prior.isEmpty) None
                       else Some(prior.maxBy(_._2)._3))
        }.toMap
        got == expected.map { case (k, v) => k -> v.map(x => x: Any) }
      }
    }

  property("broadcast as-of equals the union+window as-of") =
    forAll(rowsGen, rowsGen) { (factRows, rateRows) =>
      (factRows.nonEmpty && rateRows.nonEmpty) ==> {
        val facts = spark.createDataFrame(
          factRows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) })
          .toDF("key", "t", "fid")
        // duplicate (key, t) rate rows allowed on purpose: both forms
        // must resolve the tie to the same (max) value
        val rates = spark.createDataFrame(rateRows).toDF("key", "t", "rate")
        def m(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => r.getAs[Long]("fid") -> Option(r.getAs[Any]("rate"))).toMap
        m(operators.AsOf.asofJoin(facts, rates, "key", "t", "rate")) ==
          m(operators.AsOf.asofJoinBroadcast(facts, rates, "key", "t", "rate"))
      }
    }

  property("saltedCountDistinct equals exact countDistinct") =
    forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = spark.createDataFrame(rows).toDF("k", "t", "v")
        val exact = df.groupBy("k").agg(countDistinct("t").as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val salted = operators.Skew.saltedCountDistinct(df, "k", "t", buckets = 4)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        exact == salted
      }
    }

  /** Arbitrary text with hostile whitespace (tabs, runs, leading/trailing)
    * and non-ASCII — the kernels must reproduce the column formulation's
    * trim/collapse/split semantics exactly. */
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    words <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "Delta9", "µx", "z"))
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "\t", " \n "))
    lead <- Gen.oneOf("", " ", "\t ")
    trail <- Gen.oneOf("", " ", "  ")
  } yield lead + (if (words.isEmpty) ""
                  else words.zip(seps :+ "").map { case (w, s) => w + s }.mkString) + trail

  private def docsDf(texts: List[String]) =
    spark.createDataFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")

  property("simhash kernel matches the aggregate formulation") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
      val kern = operators.Dedup.simhashSignatures(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val agg = operators.Dedup.simhashSignaturesAgg(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      kern == agg
    }

  property("bigram hash-count kernel matches the positional column stream") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
      // (doc, a, b) -> multiplicity: the kernel's distinct-pairs-with-m
      // rows must equal the per-occurrence column stream folded by count
      // (the r21 lm-score serve rides the kernel; lmScoreOf stays on the
      // column form as the independent reference)
      val occ = operators.Curation.bigramStream(df).collect()
        .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), 1L))
        .groupMapReduce(_._1)(_._2)(_ + _)
      val kern = operators.Curation.bigramHashCounts(df).collect()
        .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
        .toMap
      occ == kern
    }

  property("shingle-set kernel matches the explode+distinct formulation") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
      def setMap(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      setMap(operators.Dedup.shingleHashes(df)) ==
        setMap(operators.Dedup.shingleHashesAgg(df))
    }

  property("rep-stats kernel matches the explode+aggregate formulation") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
      // full row compare: exact counters, derived double fractions
      // (bit-equal — both sides divide the same exact ints once), the
      // NULL dup_bigram_frac of one-word docs, and the keep flag
      def m(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      m(operators.Curation.repetitionStatsOf(df)) ==
        m(operators.Curation.repetitionStatsAgg(df))
    }

  property("minhash kernel matches the aggregate formulation") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
      def sigMap(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r =>
          r.getLong(0) -> (1 to operators.Dedup.MinHashK).map(r.getLong).toVector).toMap
      sigMap(operators.Dedup.minhashSignatures(df)) ==
        sigMap(operators.Dedup.minhashSignaturesAgg(df))
    }

  /** Stopword-rich hostile text for the text-stats kernel: profile words
    * from several languages (incl. the es/fr-ambiguous 'la'), case
    * variants that must NOT match (`\b(the)\b` is case-sensitive), words
    * welded to digits/underscores (which kill the `\b` boundary),
    * punctuation runs, vertical-tab whitespace, and non-ASCII / non-BMP
    * neighbors (which CREATE a boundary). */
  private val statsTextGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 14)
    words <- Gen.listOfN(n, Gen.oneOf(
      "the", "The", "la", "de", "und", "est", "es", "a", "the9", "the_",
      "alpha", "42", "3x", "a.b,c", "µx", "𝄞the", "x_y", "-", "('!)"))
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "\t", " \n ", "\u000b"))
    lead <- Gen.oneOf("", " ", "\t ")
    trail <- Gen.oneOf("", " ", "  ", "\t")
  } yield lead + (if (words.isEmpty) ""
                  else words.zip(seps :+ "").map { case (w, s) => w + s }.mkString) + trail

  property("long-cents sum is bit-equal to the decimal sum under any partitioning") =
    forAll(rowsGen) { rows =>
      rows.isEmpty || {
        import graft.functions.Exact._
        val df = spark.createDataFrame(rows).toDF("k", "t", "v")
        def agg(parts: Int, s: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          df.repartition(parts).groupBy("k")
            .agg(s(col("v")).as("s"))
            .collect().map(r => r.getString(0) ->
              java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
        // identical bits to the decimal form, and invariant to partitioning
        agg(1, sumCents2) == agg(1, sumd2) &&
          agg(7, sumCents2) == agg(32, sumCents2) &&
          agg(7, sumCents2) == agg(1, sumd2)
      }
    }

  // the precondition for TopK.topkPerGroup's pure-FP cents projection:
  // on exact 2-decimal money values (any sign, up to 9 digits), the
  // fused floor(x*100 + 0.5) form lands on the same cent as the decimal
  // cast chain. NOT true of arbitrary doubles — operators over full-
  // precision data must keep the decimal form.
  property("fp cents match decimal cents on 2-decimal money values") =
    forAll(Gen.listOfN(64, Gen.chooseNum(-999999999L, 999999999L))) { centsIn =>
      centsIn.isEmpty || {
        import graft.functions.Exact._
        val df = spark.createDataFrame(centsIn.map(c => Tuple1(c / 100.0)))
          .toDF("v")
        val both = df.select(
          (dec2(col("v")) * lit(100)).cast("long").as("dec"),
          floor(col("v") * lit(100) + lit(0.5)).as("fp"))
          .collect()
        both.forall(r => r.getLong(0) == r.getLong(1))
      }
    }

  // the x-weighted variant used by Forecast.forecastTopK's sxy buffer:
  // summing x*cents as LONG and scaling once at the end is bit-equal to
  // the exact decimal sum of x*y cast to double (the oracle's form),
  // while the weighted cents total stays under 2^53.
  property("weighted long-cents sum matches the decimal product sum") =
    forAll(Gen.listOfN(64, Gen.zip(
      Gen.chooseNum(-60L, 60L), Gen.chooseNum(-999999999L, 999999999L)))) { rows =>
      rows.isEmpty || {
        import graft.functions.Exact._
        val df = spark.createDataFrame(rows.map { case (x, c) => (x, c / 100.0) })
          .toDF("x", "v")
        val both = df.agg(
          sum(col("x").cast(DecimalType(10, 0)) * dec2(col("v")))
            .cast("double").as("dec"),
          (sum(col("x") * floor(col("v") * lit(100) + lit(0.5)))
            .cast("double") / lit(100.0)).as("fp"))
          .collect()(0)
        java.lang.Double.doubleToRawLongBits(both.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(both.getDouble(1))
      }
    }

  property("text-stats kernel matches the regex formulation") =
    forAll(Gen.listOfN(8, statsTextGen)) { texts =>
      val df = docsDf(texts)
      def m(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getLong(0) -> r.toSeq.drop(1).toVector).toMap
      m(operators.TextAnalysis.textStatsKernelDf(df)) ==
        m(operators.TextAnalysis.textStatsRef(df))
    }

  property("radix-2 fft matches the dft definition for any power-of-2 length") =
    forAll(
      Gen.oneOf(2, 4, 8, 16, 32, 64),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (n, seed0) =>
      var seed = if (seed0 == 0L) 1L else seed0
      def next(): Double = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
      val re = Array.fill(n)(next())
      val im = Array.fill(n)(next())
      val (wr, wi) = operators.Dsp.dftRef(re, im)
      val gr = re.clone(); val gi = im.clone()
      operators.Dsp.fft(gr, gi)
      (0 until n).forall(k =>
        math.abs(gr(k) - wr(k)) < 1e-9 && math.abs(gi(k) - wi(k)) < 1e-9)
    }

  property("component resolution matches a union-find reference on random graphs") =
    forAll(Gen.listOfN(30,
      for { a <- Gen.chooseNum(1L, 20L); b <- Gen.chooseNum(1L, 20L) } yield (a, b))) { pairs =>
      // self-pairs allowed on purpose: a node appearing only as (x, x) is
      // a singleton component and must still be labeled
      pairs.nonEmpty ==> {
        val df = spark.createDataFrame(pairs).toDF("doc_a", "doc_b")
        // default bound takes the driver fast path; driverBound = 0 forces
        // the distributed star loop — both must match the reference
        val got = operators.Dedup.resolveComponents(df, verify = true)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val gotDist = operators.Dedup.resolveComponents(df, verify = true,
          driverBound = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driver-side union-find (union smaller root wins -> root is the
        // component minimum)
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val px = parent.getOrElseUpdate(x, x)
          if (px == x) x else { val r = find(px); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val want = nodes.map(n => n -> find(n)).toMap
        got == want && gotDist == want
      }
    }

  property("ngram jaccard is bounded and keyed doc_a < doc_b") =
    forAll(Gen.listOfN(6, Gen.listOfN(12, Gen.oneOf("x", "y", "z", "w", "v")))) { docs =>
      val df = spark.createDataFrame(
        docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) })
        .toDF("doc_id", "text")
      val pairs = operators.Dedup.ngramJaccard(df, threshold = 0.0).collect()
      pairs.forall { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(3))
        a < b && j >= 0.0 && j <= 1.0
      }
    }

  // random scored sets with heavy ties (few distinct scores) so the
  // (score, id) tie-break ordering is actually exercised, under multiple
  // partitionings so partial-heap merges happen
  private val scoredGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(
      80,
      for {
        q <- Gen.chooseNum(0L, 3L)
        n <- Gen.chooseNum(0L, 40L)
        s <- Gen.oneOf(0.1, 0.25, 0.25, 0.5, 0.9)
      } yield (q, n, s))

  property("argmin-l2 kernel matches the array_position formulation incl. ties") =
    forAll(
      Gen.listOfN(20, Gen.listOfN(4, Gen.chooseNum(-2, 2).map(_.toDouble))),
      Gen.listOfN(5, Gen.listOfN(4, Gen.chooseNum(-2, 2).map(_.toDouble)))) { (vecs, cents) =>
      vecs.nonEmpty && cents.nonEmpty ==> {
        functions.GraftFunctions.ensureRegistered(spark)
        val df = spark.createDataFrame(vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) })
          .toDF("vec_id", "vec")
        val centsArr = cents.map(_.toArray).toArray
        val centsLit = array(centsArr.map(c => array(c.map(lit(_)): _*)): _*)
        val distsLit = array(centsArr.map(c =>
          functions.GraftFunctions.graftL2sq(col("vec"), array(c.map(lit(_)): _*))): _*)
        val both = df.select(
          functions.GraftFunctions.graftArgminL2(col("vec"), centsLit).as("kernel"),
          (array_position(distsLit, array_min(distsLit)).cast("int") - 1).as("ref"))
          .collect()
        both.forall(r => r.getInt(0) == r.getInt(1))
      }
    }

  // independent naive BPE: list-of-strings symbols, scala-collection ops —
  // no shared code with the kernel's array/hashmap implementation
  private def naiveBpeCountWord(word: String, merges: List[(String, String)]): Int = {
    var syms = word.map(_.toString).toList
    var changed = true
    while (changed && syms.length >= 2) {
      val ranked = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, _) => merges.zipWithIndex.find(_._1 == p).map(_._2) }
      if (ranked.isEmpty) changed = false
      else {
        val (a, b) = merges(ranked.min)
        val out = scala.collection.mutable.ListBuffer[String]()
        var rest = syms
        while (rest.nonEmpty) rest match {
          case x :: y :: t if x == a && y == b => out += (x + y); rest = t
          case x :: t => out += x; rest = t
          case Nil => ()
        }
        syms = out.toList
      }
    }
    syms.length
  }

  private val bpeWordGen: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))

  property("bpe kernel count matches the naive list reference under any merge table") =
    forAll(
      Gen.listOfN(12, bpeWordGen),
      Gen.listOfN(6, Gen.zip(Gen.oneOf("a", "b", "c", "ab", "bc"), Gen.oneOf("a", "b", "c", "ca")))) {
      (wordLists, merges) =>
        val mergeStrs = merges.distinct.map { case (a, b) => s"$a $b" }
        val text = wordLists.mkString(" ")
        val df = spark.createDataFrame(Seq((1L, text))).toDF("doc_id", "text")
        functions.GraftFunctions.ensureRegistered(spark)
        val got = df.select(call_function(
          functions.GraftFunctions.BpeCountName, col("text"), typedlit(mergeStrs)))
          .collect()(0).getInt(0)
        val mergePairs = mergeStrs.map { s =>
          val Array(a, b) = s.split(" ", 2); (a, b)
        }
        // the same normalization the kernel applies: whitespace words
        val words = text.trim.split("\\s+", -1).toList match {
          case l if text.trim.isEmpty => List("")
          case l => l
        }
        val want = words.map(w => naiveBpeCountWord(w, mergePairs)).sum
        got == want
    }

  // SQL-replay twin of the r20 BPE checker oracle: the DuckDB recursive
  // CTE applies merges IN RANK ORDER, one rank per step, each step a
  // left-to-right consume-and-continue `replace` over the
  // double-space-delimited symbol string (every symbol wrapped in
  // single spaces). java String.replace has exactly DuckDB replace's
  // semantics (non-overlapping, continue after the replacement), so
  // this reimplements the oracle's mechanics verbatim.
  private def sqlReplayCountWord(word: String, merges: List[String]): Int = {
    if (word.isEmpty) return 0
    // initial symbols are CODE POINTS (ADVICE r20): the kernel and the
    // DuckDB oracle (`regexp_extract_all(word, '.')` — RE2 matches a
    // code point) both split by code point, so the replay must too or
    // the property's domain silently excludes supplementary-plane chars
    import scala.jdk.CollectionConverters._
    val cps = word.codePoints().iterator().asScala
      .map(cp => new String(Character.toChars(cp))).toSeq
    var s = " " + cps.mkString("  ") + " "
    merges.foreach { m =>
      val Array(a, b) = m.split(" ", 2)
      s = s.replace(" " + a + "  " + b + " ", " " + a + b + " ")
    }
    s.trim.split("  ", -1).length
  }

  /** Pins the two claims the r20 BPE checker oracle's exactness rests
    * on, against the greedy kernel: (1) in-rank-order application ≡
    * greedy lowest-rank-present encoding, and (2) one `replace` pass ≡
    * the kernel's all-occurrences left-to-right scan (self-overlap runs
    * like `aaa` under pair `a a` included — the {a,b,c} word alphabet
    * generates them constantly). The merge tables are TRAINED, not
    * arbitrary: equivalence (1) holds because a merge's output symbol
    * can only appear in higher-ranked pairs, which is a TRAINING
    * invariant (a pair is learned only after its constituents exist) —
    * an arbitrary table can violate it, and the oracle only ever
    * consumes tables Verify trains. */
  property("r20 BPE checker replay (rank-order string replace) matches the greedy kernel") =
    forAll(
      Gen.listOfN(10, Gen.zip(bpeWordGen, Gen.chooseNum(1L, 9L))),
      Gen.listOfN(10, bpeWordGen)) { (trainWcs, testWords) =>
      val merges = functions.BpeKernel
        .train(trainWcs.filter(_._1.nonEmpty), 12).toList
      val ranks = functions.BpeKernel.buildRanks(merges.toArray)
      testWords.forall { w =>
        sqlReplayCountWord(w, merges) == functions.BpeKernel.countWord(w, ranks)
      }
    }

  property("bpe training learns the most frequent pair first and is deterministic") =
    forAll(Gen.listOfN(8, Gen.zip(bpeWordGen.suchThat(_.length >= 2), Gen.chooseNum(1L, 9L)))) {
      wcs =>
        val t1 = functions.BpeKernel.train(wcs, 10).toSeq
        val t2 = functions.BpeKernel.train(wcs, 10).toSeq
        // deterministic, and every merge is a "a b" pair of non-empty symbols
        t1 == t2 && t1.forall(m => m.split(" ", 2).forall(_.nonEmpty))
    }

  property("native topk kernel matches the typed Aggregator reference") =
    forAll(scoredGen, Gen.oneOf(1, 3, 7)) { (rows, k) =>
      rows.isEmpty || {
        // one score per (query, neighbor): a neighbor must rank once
        val df = spark.createDataFrame(rows).toDF("query_id", "vec_id", "cosine")
          .groupBy("query_id", "vec_id").agg(max("cosine").as("cosine"))
          .repartition(5)
        def key(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
        key(operators.Similarity.topkRanked(df, k)) ==
          key(operators.Similarity.topkRankedRef(df, k))
      }
    }

  property("md5-bucket kernel equals the hex-prefix md5 on any long pair") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (a: Long, b: Long) =>
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$a-$b".getBytes("US-ASCII"))(0) & 0xFF
      graft.functions.Md5BucketKernel.compute(a, b) == want
    }

  property("argmin2 kernel returns the stable top-2 cells on any corpus") =
    forAll(
      // 1-centroid quantizers included: the kernel must PAD to
      // (primary, primary) so element_at(cs, 2) consumers stay total
      Gen.chooseNum(1, 20).flatMap(n =>
        Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-100, 100).map(_ / 10.0)))),
      Gen.listOfN(4, Gen.chooseNum(-100, 100).map(_ / 10.0))) { (cents0, v0) =>
      (cents0.nonEmpty) ==> {
        import spark.implicits._
        import org.apache.spark.sql.functions._
        graft.functions.GraftFunctions.ensureRegistered(spark)
        val centsCol = array(cents0.map(c => array(c.map(lit): _*)): _*)
        val got = Seq(Tuple1(v0.map(_.toFloat).toArray)).toDF("vec")
          .select(call_function(graft.functions.GraftFunctions.Argmin2L2Name,
            col("vec"), centsCol).as("cs"))
          .collect().head.getSeq[Int](0).toList
        // reference: stable sort of (distance, index), first two indices
        val ds = cents0.zipWithIndex.map { case (c, i) =>
          (c.zip(v0.map(_.toFloat.toDouble)).map { case (x, y) => (y - x) * (y - x) }.sum, i)
        }
        val want = ds.sortBy(identity).take(2).map(_._2) match {
          case only :: Nil => List(only, only) // padded single-centroid form
          case top2 => top2
        }
        got == want
      }
    }

  property("dup-spans gram-counts form matches the position-explode formulation") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
      def m(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      m(operators.Dedup.dupSpans(df)) == m(operators.Dedup.dupSpansExplode(df))
    }

  property("winnow kernel matches the window+distinct formulation") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
      def m(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      m(operators.TextAnalysis.winnowFingerprintOf(df)) ==
        m(operators.TextAnalysis.winnowFingerprintWindowOf(df))
    }

  property("bigram-counts kernel matches the explode+groupBy formulation") =
    forAll(Gen.listOfN(6, textGen)) { texts =>
      import org.apache.spark.sql.functions._
      val df = docsDf(texts)
      graft.functions.GraftFunctions.ensureRegistered(spark)
      def m(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val kernel = m(df.select(explode(call_function(
          graft.functions.GraftFunctions.BigramCountsName, col("text"))).as("bc"))
        .select(col("bc.a"), col("bc.b"), col("bc.c"))
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("c"))
        .collect())
      // the r10 column formulation: explode adjacent pairs, drop
      // empty-token edges, count
      val ref = m(df
        .select(operators.TextAnalysis.wsTokens(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] as a, w[i] as b))"))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= "" && col("b") =!= "")
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .collect())
      kernel == ref
    }

  property("excise kernel matches the coverage+filter formulation on any starts") =
    forAll(
      Gen.chooseNum(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).flatMap(toks =>
          // starts may exceed the token count or duplicate — the kernel
          // must agree with the HOF form on degenerate inputs too
          Gen.listOf(Gen.chooseNum(1, 45)).map(ss => (toks, ss.sorted)))),
      Gen.chooseNum(1, 6)) { case ((toks, starts), width) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val df = Seq((toks, starts)).toDF("w", "starts")
        .select(col("w"),
          col("starts").cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType, containsNull = false))
            .as("starts"))
      val kernel = df.select(call_function(
          graft.functions.GraftFunctions.ExciseName,
          col("w"), col("starts"), lit(width)).as("ex"))
        .select(col("ex.n_kept"), col("ex.clean_text"))
        .collect().head
      // the r10 formulation this kernel replaced: merged coverage
      // intervals + a per-token filter/exists HOF + array_join
      val ref = df.withColumn("iv", call_function(
          graft.functions.GraftFunctions.CoverageName,
          col("starts"), lit(width)))
        .select(expr("filter(w, (t, i) -> NOT exists(iv, " +
          "v -> i + 1 >= v.lo AND i + 1 <= v.hi))").as("kept"))
        .select(size(col("kept")), array_join(col("kept"), " "))
        .collect().head
      (kernel.getInt(0), kernel.getString(1)) == (ref.getInt(0), ref.getString(1))
    }

  property("funnel stamps aggregate matches the chained-window formulation") =
    forAll(
      Gen.listOfN(
        40,
        for {
          user <- Gen.chooseNum(1L, 4L)
          // heavy tie density: strict-< qualification must reject equal
          // stamps identically in both forms
          step <- Gen.oneOf("signup", "view", "click", "purchase", "error")
          ts <- Gen.chooseNum(0L, 12L)
        } yield (user, step, ts)),
      Gen.oneOf(1, 7, 32)) { (events, parts) =>
      events.nonEmpty ==> {
        val base = spark.createDataFrame(
          events.zipWithIndex.map { case ((u, s, t), i) => (u, i.toLong, s, t) })
          .toDF("user_id", "event_id", "event_type", "ts_ms")
          .repartition(parts)
        def m(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
        m(operators.Events.funnelStamps(base)) ==
          m(operators.Events.funnelStampsWindowed(base))
      }
    }

  property("capped band pairs equal the naive surviving-band + hot-star definition, exactly once") =
    forAll(
      Gen.listOfN(
        36,
        // a 5-value bucket alphabet over 3 bands: collisions are dense,
        // so small caps produce real hot buckets and real survivors
        Gen.listOfN(3, Gen.chooseNum(0L, 4L))),
      Gen.chooseNum(1, 15)) { (bksList, cap) =>
      bksList.nonEmpty ==> {
        val rows = bksList.zipWithIndex.map { case (bks, i) => (i.toLong, bks) }
        val counts = rows.flatMap { case (_, bks) =>
          bks.zipWithIndex.map { case (b, i) => (i, b) }
        }.groupBy(identity).map { case (k, v) => k -> v.size }
        def survives(band: Int, bucket: Long) = counts((band, bucket)) <= cap
        def sharesSurviving(ba: List[Long], bb: List[Long]) =
          (0 until 3).exists(i => ba(i) == bb(i) && survives(i, ba(i)))
        val expectSurvivors = (for {
          (a, ba) <- rows; (b, bb) <- rows if a < b
          if sharesSurviving(ba, bb)
        } yield (a, b)).toSet
        // hot buckets contribute a star: bucket-min id x each member,
        // minus pairs the survivor path already owns
        val expectStars = (for {
          band <- 0 until 3
          (bucket, members) <- rows.groupBy { case (_, bks) => bks(band) }.toList
          if members.size > cap
          (rep, repBks) = members.minBy(_._1)
          (m, mBks) <- members if m != rep
          if !sharesSurviving(repBks, mBks)
        } yield (rep, m)).toSet
        val expect = expectSurvivors ++ expectStars
        import spark.implicits._
        val got = operators.Dedup.firstSharedBandPairs(
          rows.toDF("id", "bks"), 3, bucketCap = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        got.length == got.distinct.length && got.toSet == expect
      }
    }
}
