package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic invariants for the seasonal/forecast/window/event operators. */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("graft-analytics-test")

  override def afterAll(): Unit = spark.stop()

  test("seasonal agg covers all four seasons and partitions all rows") {
    val df = operators.Seasonal.seasonalAgg(spark, sf)
    val seasons = df.select("season").distinct().collect().map(_.getString(0)).toSet
    assert(seasons == Set("winter", "spring", "summer", "autumn"))
    val total = df.agg(sum("n_obs")).collect()(0).getLong(0)
    val li = Tables.lineitem(spark, sf).count()
    assert(total == li)
  }

  test("moving average equals monthly average on each group's first month") {
    val df = operators.Seasonal.movingAvg(spark, sf)
    val firsts = df
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("brand").orderBy("year", "month")))
      .filter("rk = 1")
    assert(firsts.filter("abs(mov_avg_3m - avg_price) > 1e-9").count() == 0)
  }

  test("topk keeps at most 3 markets per brand, ranked ascending") {
    val df = operators.TopK.topkPerGroup(spark, sf)
    val bad = df.groupBy("brand").count().filter("count > 3").count()
    assert(bad == 0)
    val rows = df.filter("rk = 1").join(
      df.filter("rk = 2").withColumnRenamed("avg_price", "p2").select("brand", "p2"),
      "brand")
    assert(rows.filter("avg_price > p2").count() == 0)
  }

  test("rank-by-forecast composes the seasonal model mean with an ascending rank") {
    val df = operators.Forecast.forecastTopK(spark, sf).collect().sortBy(_.getInt(3))
    assert(df.nonEmpty && df.length <= 10)
    assert(df.map(_.getInt(3)).toSeq == (1 to df.length)) // dense ranks from 1
    assert(df.forall(_.getDouble(2) > 0)) // negative forecasts filtered
    assert(df.map(_.getDouble(2)).toSeq == df.map(_.getDouble(2)).toSeq.sorted) // cheapest first
    // closed form == explicit 12-row horizon mean for one brand
    val brand = df.head.getString(0)
    val sf12 = operators.Forecast.seasonalForecastHorizonMeanFor(spark, sf, brand)
    assert(math.abs(df.head.getDouble(2) - sf12) < 1e-6,
      s"closed-form mean ${df.head.getDouble(2)} vs explicit-grid mean $sf12")
  }

  test("recency horizons stretch stale groups to asof + 365 with exact row counts") {
    import org.apache.spark.sql.functions._
    val df = operators.Forecast.forecastRecency(spark, sf)
    val perBrand = df.groupBy("brand")
      .agg(max("horizon").as("h"), count(lit(1)).as("rows"),
        max("day_offset").as("max_off"))
      .collect()
    assert(perBrand.nonEmpty)
    perBrand.foreach { r =>
      assert(r.getAs[Int]("h") >= 365, s"horizon below floor: $r")
      assert(r.getAs[Long]("rows") == r.getAs[Int]("h").toLong, s"row count != horizon: $r")
      assert(r.getAs[Int]("max_off") == r.getAs[Int]("h"), s"offsets don't cover horizon: $r")
    }
  }

  test("forecast from a persisted model is bit-identical to a fresh fit") {
    val path = java.nio.file.Files.createTempDirectory("graftfc").toString + "/model"
    operators.Forecast.writeForecastModel(spark, sf, path)
    def rs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(rs(operators.Forecast.forecastFromModel(spark, path)) ==
      rs(operators.Forecast.forecastLinear(spark, sf)))
  }

  test("incrementally merged forecast model is bit-identical to retraining on the union") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graftfcm").toString + "/model"
    // split the fact by ship date: train on the first half, merge the rest
    val li = Tables.lineitem(spark, sf)
    val cutoff = "1998-01-01"
    def base(pred: org.apache.spark.sql.Column) = {
      val l = li.filter(pred).select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"))
      val p = broadcast(Tables.part(spark, sf).select(col("p_partkey"), col("p_brand")))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .select(
          col("p_brand").as("brand"),
          ((year(col("l_shipdate")) - 1995) * 12 + month(col("l_shipdate")) - 1)
            .cast("long").as("x"),
          col("l_extendedprice").as("y"))
    }
    assert(li.filter(col("l_shipdate") >= cutoff).count() > 0, "empty merge batch")
    operators.Forecast.writeForecastModelOf(base(col("l_shipdate") < cutoff), path)
    operators.Forecast.mergeForecastModelOf(base(col("l_shipdate") >= cutoff), path)
    def rs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(rs(operators.Forecast.forecastFromModel(spark, path)) ==
      rs(operators.Forecast.forecastLinear(spark, sf)),
      "merged model diverged from a full retrain")
  }

  test("changepoint trend recovers a planted piecewise-linear series exactly") {
    // x in [0, 40] -> knots at 40% / 80% of the range: s1 = 16, s2 = 32.
    // Plant slope breaks exactly there; the hinge basis then spans the
    // true function, so a noiseless fit must reproduce it (and the
    // one-step-ahead forecast) to floating-point accuracy.
    def yOf(x: Long): Double =
      10.0 + 2.0 * x +
        (if (x > 16) -3.0 * (x - 16) else 0.0) +
        (if (x > 32) 5.0 * (x - 32) else 0.0)
    val rows = (0L to 40L).map(x =>
      ("T", x, new java.math.BigDecimal(yOf(x)).setScale(2)))
    val base = spark.createDataFrame(rows).toDF("brand", "x", "y")
    val r = operators.Forecast.forecastChangepointOf(base).collect()(0)
    assert(r.getAs[Long]("s1") == 16L && r.getAs[Long]("s2") == 32L)
    assert(math.abs(r.getAs[Double]("b0") - 10.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b2") + 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b3") - 5.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("forecast_next") - yOf(41)) < 1e-5)
  }

  test("changepoint fit degrades to NULL betas on a degenerate single-point series") {
    val base = spark.createDataFrame(Seq(
      ("T", 5L, new java.math.BigDecimal("7.00")))).toDF("brand", "x", "y")
    val r = operators.Forecast.forecastChangepointOf(base).collect()(0)
    assert(r.isNullAt(r.fieldIndex("b1")) && r.isNullAt(r.fieldIndex("forecast_next")))
  }

  test("horizon forecast spans 365 offsets with additive dow+month components") {
    val df = operators.Forecast.forecastHorizon(spark, sf).cache()
    // the horizon contract: exactly 365 forecast rows per brand (unseen
    // dow/month combinations fall back to a 0 seasonal index, never drop)
    val perBrand = df.groupBy("brand").count()
    assert(perBrand.filter("count <> 365").count() == 0)
    assert(df.filter("forecast IS NULL").count() == 0)
    df.unpersist()
  }

  test("linear forecast slope matches a driver-side least squares on one brand") {
    val pts = operators.Seasonal.monthlyTrend(spark, sf)
      .filter("brand = 'Brand#2'")
      .select("year", "month", "avg_price").collect()
    // fit on raw observations instead: verify the distributed slope is finite
    val row = operators.Forecast.forecastLinear(spark, sf)
      .filter("brand = 'Brand#2'").collect()(0)
    assert(!row.getAs[Double]("slope").isNaN)
    assert(row.getAs[Double]("forecast_next") > 0 || pts.nonEmpty)
  }

  test("prediction interval brackets the forecast symmetrically with positive width") {
    val df = operators.Forecast.forecastInterval(spark, sf)
    assert(df.filter("se_pred IS NULL OR se_pred <= 0").count() == 0,
      "every brand has n > 2 and x-variance here: se must be positive")
    assert(df.filter("yhat_lo >= forecast_next OR yhat_hi <= forecast_next").count() == 0)
    // symmetric band: forecast is the midpoint (exactly, same-op arithmetic)
    assert(df.filter("abs((yhat_lo + yhat_hi) / 2 - forecast_next) > 1e-6").count() == 0)
  }

  test("weekly forecast covers 7 consecutive days with valid dows and additive seasonality") {
    val df = operators.Forecast.forecastWeekly(spark, sf)
    val perBrand = df.groupBy("brand").count()
    assert(perBrand.filter("count != 7").count() == 0, "7 forecast days per brand")
    assert(df.filter("dow < 1 OR dow > 7").count() == 0)
    // the 7 forecast days hit all 7 days of the week exactly once
    assert(df.groupBy("brand", "dow").count().filter("count > 1").count() == 0)
    // forecast date really is day_offset days after the brand's last observation
    assert(df.filter("dayofweek(forecast_date) != dow").count() == 0)
  }

  test("seasonal forecast emits one row per (brand, observed month)") {
    val df = operators.Forecast.seasonalForecast(spark, sf)
    assert(df.groupBy("brand", "month").count().filter("count > 1").count() == 0)
  }

  test("correlation is within [-1, 1]") {
    val df = operators.Stats.covariateCorr(spark, sf)
    assert(df.filter("corr_disc_qty < -1.0000001 OR corr_disc_qty > 1.0000001").count() == 0)
  }

  test("hdi-volatility study emits one bounded correlation over all nations") {
    val rows = operators.Stats.hdiVolatility(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0).getAs[Double]("corr_hdi_volatility")
    assert(r >= -1.0000001 && r <= 1.0000001, s"corr out of range: $r")
  }

  test("json extraction covers every event exactly once") {
    val df = operators.Events.jsonExtract(spark, sf)
    assert(df.agg(sum("n")).collect()(0).getLong(0) == Tables.events(spark, sf).count())
    assert(df.filter("min_k IS NULL OR max_k < min_k").count() == 0)
  }

  test("as-of join picks the latest prior rate, never a future one") {
    import org.apache.spark.sql.Row
    val facts = spark.createDataFrame(Seq(
      ("k", 1L, "f1"), ("k", 5L, "f2"), ("k", 6L, "f3"), ("j", 2L, "lonely"))).toDF("key", "t", "id")
    val rates = spark.createDataFrame(Seq(
      ("k", 0L, 10.0), ("k", 5L, 50.0), ("k", 9L, 90.0))).toDF("key", "t", "rate")
    val out = operators.AsOf.asofJoin(facts, rates, "key", "t", "rate")
      .collect().map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("rate"))).toMap
    assert(out("f1").contains(10.0)) // only t=0 is prior
    assert(out("f2").contains(50.0)) // same-instant rate visible
    assert(out("f3").contains(50.0)) // t=9 is future, stays at 50
    assert(out("lonely").isEmpty)    // key with no rates -> null
  }

  test("enrichment log resolution: latest refresh wins, uncorrected rows survive") {
    val log = spark.createDataFrame(Seq(
      ("k", 0L, 0L, 1.0),  // backfill
      ("k", 0L, 1L, 2.0),  // correction restates (k, 0) -> must win
      ("k", 3L, 0L, 3.0),  // never corrected -> backfill value survives
      ("j", 0L, 1L, 9.0)   // key arriving only at refresh 1
    )).toDF("key", "t", "refresh", "v")
    val got = operators.AsOf.resolveEnrichment(log, "key", "t", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map(("k", 0L) -> 2.0, ("k", 3L) -> 3.0, ("j", 0L) -> 9.0))
    // attach sees the resolved view: a fact between publications gets the
    // corrected value, not the superseded backfill
    val facts = spark.createDataFrame(Seq(("k", 2L, "f"))).toDF("key", "t", "id")
    val attached = operators.AsOf.asofJoinBroadcast(
      facts,
      operators.AsOf.resolveEnrichment(log, "key", "t", "v").withColumnRenamed("v", "rate"),
      "key", "t", "rate")
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("rate")).toMap
    assert(attached == Map("f" -> 2.0))
  }

  test("pivot then unpivot round-trips the monthly averages") {
    val direct = operators.Seasonal.monthlyTrend(spark, sf)
      .groupBy("brand", "month")
      .count()
    val melted = operators.Reshape.unpivotWide(spark, sf)
    // every (brand, month) present in the long form appears in the melt
    assert(melted.select("brand", "month").distinct().count() ==
      direct.select("brand", "month").distinct().count())
    // the generic melt of the wide matrix reproduces the long form
    // bit-exactly (pivot places each long cell; unpivot brings it back)
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(cells(operators.Reshape.unpivotFrom(
      operators.Reshape.pivotMonthly(spark, sf))) == cells(melted),
      "unpivot(pivot(x)) diverged from the long aggregate")
  }

  test("sessionization: session count equals number of >30min gaps + users") {
    val sessions = operators.Events.sessionize(spark, sf)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(sessions.groupBy("user_id").count().count() == users)
    // sessions are disjoint and ordered: start <= end everywhere
    assert(sessions.filter("session_start_ms > session_end_ms").count() == 0)
  }

  test("event windows partition all events") {
    val df = operators.Events.eventWindows(spark, sf)
    val total = df.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // window starts are hour-aligned
    assert(df.filter("window_start_ms % 3600000 != 0").count() == 0)
  }

  test("column profile counts nulls and distincts per column, one row per column") {
    import spark.implicits._
    val frame = Seq(
      (Some(1), Some("a")), (Some(1), None), (None, Some("b")), (Some(2), Some("a"))
    ).toDF("num", "txt")
    val prof = Catalog.columnProfile(frame).collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(prof.keySet == Set("num", "txt"))
    assert(prof("num") == ((3L, 1L, 2L, 4L)), s"num profile wrong: ${prof("num")}")
    assert(prof("txt") == ((3L, 1L, 2L, 4L)), s"txt profile wrong: ${prof("txt")}")
    // dtype strings come from the Spark schema
    val types = Catalog.columnProfile(frame).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(types == Map("num" -> "INT", "txt" -> "STRING"))
  }

  test("column profile: static oracle inventory matches the live ml-extract schema") {
    val live = operators.StarSchema.mlExtract(spark, sf)
      .schema.fields.map(f => f.name -> f.dataType.sql).toSeq
    assert(live == Catalog.MlExtractProfileCols,
      s"ml-extract schema drifted from the oracle inventory:\n$live")
  }

  test("column profile approx swap tracks exact distincts within hll rsd") {
    val frame = operators.StarSchema.mlExtract(spark, sf)
    def profile(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val exact = profile(Catalog.columnProfile(frame))
    val approx = profile(Catalog.columnProfileApprox(frame))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (name, (nn, nl, nd)) =>
      val (ann, anl, and) = approx(name)
      // null/non-null counts stay exact in the approx form
      assert(ann == nn && anl == nl, s"$name: approx swapped exact counts")
      // approx_count_distinct default rsd is 0.05; allow 3x for small-n
      assert(math.abs(and - nd) <= math.max(3, (nd * 0.15).toLong),
        s"$name: approx distinct $and too far from exact $nd")
    }
  }

  test("funnel: strict first-occurrence order — pre-step and tied events never count") {
    import spark.implicits._
    val e = Seq(
      // completes every step in order
      (1L, 1L, "signup", 10L), (1L, 2L, "view", 20L),
      (1L, 3L, "click", 30L), (1L, 4L, "purchase", 40L),
      // view BEFORE signup: step 2 never completes, later clicks/purchases
      // can't qualify without it
      (2L, 5L, "view", 5L), (2L, 6L, "signup", 10L),
      (2L, 7L, "click", 30L), (2L, 8L, "purchase", 20L),
      // view TIED with signup: strict < rejects the tie
      (3L, 9L, "signup", 10L), (3L, 10L, "view", 10L)
    ).toDF("user_id", "event_id", "event_type", "ts_ms")
    val got = operators.Events.funnelOf(e).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    assert(got == Map("signup" -> 3L, "view" -> 1L, "click" -> 1L, "purchase" -> 1L),
      s"funnel counts wrong: $got")
    val conv = operators.Events.funnelOf(e).collect()
      .map(r => r.getAs[Int]("step") -> r.getAs[Double]("conv_rate")).toMap
    assert(conv(1) == 1.0 && conv(4) == 1.0 / 3.0)
  }

  test("funnel: step counts are monotone non-increasing on real data") {
    val rows = operators.Events.funnel(spark, sf).collect().sortBy(_.getAs[Int]("step"))
    assert(rows.length == operators.Events.FunnelSteps.length)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_users") >= b.getAs[Long]("n_users"),
        s"funnel not monotone: $a -> $b")
    }
    // the stamps BUILD pays one hash exchange and — with the mergeable
    // aggregate replacing the chained windows — NO per-user sort: a hot
    // user's history no longer serializes through one task
    val base = Tables.events(spark, sf).selectExpr(
      "user_id", "event_id", "event_type",
      "(ts - pmod(ts, 1000000)) DIV 1000000 AS ts_ms")
    val buildPlan = operators.Events.funnelStamps(base)
      .queryExecution.executedPlan.toString
    val buildEx = "Exchange hashpartitioning".r.findAllIn(buildPlan).length
    assert(buildEx == 1, s"stamps build should shuffle once, saw $buildEx:\n$buildPlan")
    assert(!buildPlan.contains("Sort "),
      s"stamps build should not sort (skew bound):\n$buildPlan")
    assert(buildPlan.contains("ObjectHashAggregate"),
      s"stamps build should aggregate via ObjectHashAggregate:\n$buildPlan")
    // the aggregate form is row-identical to the chained-window
    // reference, including users whose chain never starts
    def key(r: org.apache.spark.sql.Row): String = r.toSeq.mkString("|")
    assert(operators.Events.funnelStamps(base).collect().map(key).sorted.toSeq ==
      operators.Events.funnelStampsWindowed(base).collect().map(key).sorted.toSeq,
      "stamps aggregate diverged from the window form")
    // the SERVE plan rides the persisted stamps store: no hash exchange
    // at all (only the single-partition gather of the global rollup)
    val servePlan = operators.Events.funnel(spark, sf).queryExecution.executedPlan.toString
    val serveEx = "Exchange hashpartitioning".r.findAllIn(servePlan).length
    assert(serveEx == 0, s"funnel serve should not hash-shuffle, saw $serveEx:\n$servePlan")
  }

  test("forecast family: state-served results are bit-equal to fact-scan fits") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val F = operators.Forecast
    val pairs = Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
      ("linear", F.forecastLinear(spark, sf), F.forecastLinearScratch(spark, sf)),
      ("interval", F.forecastInterval(spark, sf), F.forecastIntervalScratch(spark, sf)),
      ("weekly", F.forecastWeekly(spark, sf), F.forecastWeeklyScratch(spark, sf)),
      ("horizon", F.forecastHorizon(spark, sf), F.forecastHorizonScratch(spark, sf)),
      ("recency", F.forecastRecency(spark, sf), F.forecastRecencyScratch(spark, sf)),
      ("seasonal", F.seasonalForecast(spark, sf), F.seasonalForecastScratch(spark, sf)),
      ("changepoint", F.forecastChangepoint(spark, sf), F.forecastChangepointScratch(spark, sf)),
      ("topk", F.forecastTopK(spark, sf), F.forecastTopKScratch(spark, sf)),
      ("seasonal_agg", operators.Seasonal.seasonalAgg(spark, sf),
        operators.Seasonal.seasonalAggScratch(spark, sf)),
      ("monthly_trend", operators.Seasonal.monthlyTrend(spark, sf),
        operators.Seasonal.monthlyTrendScratch(spark, sf)),
      ("moving_avg", operators.Seasonal.movingAvg(spark, sf),
        operators.Seasonal.movingAvgScratch(spark, sf)))
    pairs.foreach { case (name, served, scratch) =>
      assert(rows(served) == rows(scratch),
        s"forecast $name: state serve diverged from the fact-scan fit")
    }
  }

  test("day-state append: delta fold is bit-identical to a rebuild over the union") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graftdaystate").toString
    val li = Tables.lineitem(spark, sf)
    val base = li.filter(col("l_orderkey") % 5 =!= 0)
    val delta = li.filter(col("l_orderkey") % 5 === 0)
    base.write.mode("overwrite").parquet(tmp + "/lineitem.parquet")
    Tables.part(spark, sf).write.mode("overwrite").parquet(tmp + "/part.parquet")
    // build the generation for the base corpus, serve once
    val before = operators.Forecast.forecastLinear(spark, tmp).collect()
    assert(before.nonEmpty)
    val preFp = {
      val p = operators.Forecast.dayServePath(tmp) + "_model"
      spark.read.parquet(p).collect()(0).getLong(0)
    }
    // the delta lands, then folds incrementally (appendPostings ordering)
    delta.write.mode("append").parquet(tmp + "/lineitem.parquet")
    val deltaFrame = delta
      .join(broadcast(Tables.part(spark, sf)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        datediff(col("l_shipdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("x"),
        col("l_extendedprice").as("y"))
    operators.Forecast.appendDayStats(spark, tmp, deltaFrame, preFp)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    // the merged generation serves WITHOUT rebuilding (fingerprint is
    // post-delta), bit-identical to the full-corpus fit
    val stamp = Option(new java.io.File(operators.Forecast.dayServePath(tmp)).listFiles)
      .get.map(f => f.getName -> f.lastModified).toMap
    assert(rows(operators.Forecast.forecastLinear(spark, tmp)) ==
      rows(operators.Forecast.forecastLinearScratch(spark, tmp)),
      "appended day state diverged from the union fit")
    assert(rows(operators.Forecast.seasonalForecast(spark, tmp)) ==
      rows(operators.Forecast.seasonalForecastScratch(spark, tmp)))
    assert(Option(new java.io.File(operators.Forecast.dayServePath(tmp)).listFiles)
      .get.map(f => f.getName -> f.lastModified).toMap == stamp,
      "serve after append rebuilt the generation instead of reusing it")
    // a stale generation must refuse the append
    val bad = intercept[IllegalArgumentException] {
      operators.Forecast.appendDayStats(spark, tmp, deltaFrame, preFp)
    }
    assert(bad.getMessage.contains("different corpus state"))
  }

  test("funnel family: store-served results equal the from-scratch frames") {
    val base = Tables.events(spark, sf).selectExpr(
      "user_id", "event_id", "event_type",
      "(ts - pmod(ts, 1000000)) DIV 1000000 AS ts_ms")
    def key(r: org.apache.spark.sql.Row): String = r.toSeq.mkString("|")
    assert(operators.Events.funnel(spark, sf).collect().map(key).sorted.toSeq ==
      operators.Events.funnelOf(base).collect().map(key).sorted.toSeq)
    assert(operators.Events.conversionLag(spark, sf).collect().map(key).sorted.toSeq ==
      operators.Events.conversionLagOf(base).collect().map(key).sorted.toSeq)
    assert(operators.Events.conversionCohort(spark, sf).collect().map(key).sorted.toSeq ==
      operators.Events.conversionCohortOf(base).collect().map(key).sorted.toSeq)
    val weekly = Tables.events(spark, sf).selectExpr(
      "user_id", "event_type",
      s"(ts - pmod(ts, ${operators.Events.WeekNs})) DIV ${operators.Events.WeekNs} AS week")
    assert(operators.Events.cohortRetention(spark, sf).collect().map(key).sorted.toSeq ==
      operators.Events.cohortOf(weekly).collect().map(key).sorted.toSeq)
  }

  test("conversion lag: counts track the funnel, lags positive, median computed on a known timeline") {
    import spark.implicits._
    val e = Seq(
      (1L, 1L, "signup", 0L), (1L, 2L, "view", 100L), (1L, 3L, "click", 150L),
      (2L, 4L, "signup", 0L), (2L, 5L, "view", 300L),
      (3L, 6L, "signup", 0L), (3L, 7L, "view", 200L)
    ).toDF("user_id", "event_id", "event_type", "ts_ms")
    val rows = operators.Events.conversionLagOf(e).collect()
    val got = rows.filter(_.getLong(1) > 0)
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      "signup_to_view" -> ((3L, 200.0, 200.0)),
      "view_to_click" -> ((1L, 50.0, 50.0))), s"$got")
    // a transition nobody completes keeps its row, with NULL lag stats
    val none = rows.find(_.getString(0) == "click_to_purchase").get
    assert(none.getLong(1) == 0L && none.isNullAt(2) && none.isNullAt(3))
    // real data: converted counts equal the funnel's step counts, lags positive
    val lag = operators.Events.conversionLag(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fun = operators.Events.funnel(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    assert(lag("signup_to_view") == fun("view") &&
      lag("view_to_click") == fun("click") &&
      lag("click_to_purchase") == fun("purchase"), s"$lag vs $fun")
    assert(operators.Events.conversionLag(spark, sf)
      .filter("n_converted > 0 AND (mean_lag_ms <= 0 OR p50_lag_ms <= 0)").count() == 0)
  }

  test("cohort retention: offset 0 is complete, cohorts partition signup users") {
    import spark.implicits._
    val e = Seq(
      (1L, "signup", 0L), (1L, "view", 0L), (1L, "view", 1L), (1L, "click", 3L),
      (2L, "signup", 1L), (2L, "view", 1L), (2L, "purchase", 2L),
      // user 3 never signs up: excluded from every cohort
      (3L, "view", 0L)
    ).toDF("user_id", "event_type", "week")
    val got = operators.Events.cohortOf(e).collect()
      .map(r => (r.getAs[Long]("cohort_week_ms") / operators.Events.WeekMs,
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_active")).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L), s"cohort cells wrong: $got")
    // real data: every cohort's offset-0 row covers the whole cohort (the
    // signup event itself is activity in the cohort week)
    val real = operators.Events.cohortRetention(spark, sf)
    assert(real.filter("week_offset = 0 AND n_active != n_cohort").count() == 0)
    assert(real.filter("week_offset < 0 OR n_active > n_cohort").count() == 0)
    val cohortTotal = real.filter("week_offset = 0")
      .agg(sum("n_cohort")).collect()(0).getLong(0)
    val signupUsers = Tables.events(spark, sf)
      .filter("event_type = 'signup'").select("user_id").distinct().count()
    assert(cohortTotal == signupUsers, s"$cohortTotal cohort users vs $signupUsers signups")
  }

  test("backfill splice equals the from-scratch rollup; rebuilt flags exactly the late partitions") {
    val res = operators.Incremental.backfillRollup(spark, sf)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4))
    val spliced = res.collect().map(r => key(r) -> r.getBoolean(5)).toMap
    // from-scratch rollup over ALL rows must match (brand,year,month,sum,n)
    val scratch = operators.Incremental
      .incrementalMonthly(spark, sf) // already the full-data rollup
      .collect().map(key).toSet
    assert(spliced.keySet == scratch,
      s"spliced rollup diverged from from-scratch (${spliced.size} vs ${scratch.size} rows)")
    // rebuilt flag == partition contains at least one late (md5-keyed) row
    val late = Tables.lineitem(spark, sf)
      .filter(substring(md5(concat_ws("-",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))),
        1, 2) < operators.Incremental.LateHexLt)
      .select(year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(late.nonEmpty, "late batch is empty — LateHexLt selects nothing at this SF")
    res.collect().foreach { r =>
      val expect = late.contains((r.getInt(1), r.getInt(2)))
      assert(r.getBoolean(5) == expect,
        s"rebuilt flag wrong for partition (${r.getInt(1)},${r.getInt(2)})")
    }
    // the rebuild really is selective: some partitions pass through untouched
    assert(res.filter("NOT rebuilt").count() > 0, "every partition was rebuilt")
  }
}
