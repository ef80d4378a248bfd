package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._
import org.apache.spark.sql.functions._

/** Ad-hoc 10x stress for the r10/r11 SERVING STORES (the Stress
  * discipline): the forecast day state and the funnel stamps store,
  * each under adversarial group skew.
  *
  *  - day state: 10x lineitem where HALF of all rows collapse onto ONE
  *    brand (replicas 5-9 rewrite l_partkey to a single hot part) — the
  *    per-(brand, day) build aggregate's skew worst case. Build must
  *    stay one scan + one partial-agg exchange (AQE splits the hot
  *    partition); the state stays bounded by brands x days; warm serves
  *    never rescan the fact.
  *  - incremental append: a further skewed delta folds into the stored
  *    generation — delta-sized work, not a history rescan.
  *  - stamps: 10x events with one user owning HALF of all rows (worse
  *    than StressR10's one-replica hot user) — the per-user skew worst
  *    case; serves stay user-cardinality. The r12 A/B rows time the
  *    mergeable-aggregate build against the retired sort-window form on
  *    the same frame: the window form serializes the hot user's half
  *    corpus through ONE task's sort, the aggregate folds it map-side.
  *
  * Not part of the driver contract.
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.StressR11'
  */
object StressR11 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-stress-r11")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      val rows = out match { case n: Long => f"$n%9d rows"; case _ => "" }
      println(f"[stress11] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs  $rows")
      out
    }

    // ---- day state: 10x fact, one brand owns HALF of all rows
    val tmp = java.nio.file.Files.createTempDirectory("stress11day").toString
    val li0 = Tables.lineitem(spark, dir)
    val hotKey = Tables.part(spark, dir).select(min(col("p_partkey"))).collect()(0).getLong(0)
    val li10 = (0 until 10).map { i =>
      val shifted = li0.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
      if (i >= 5) shifted.withColumn("l_partkey", lit(hotKey)) else shifted
    }.reduce(_ unionAll _)
    time("fact_write_10x") {
      li10.write.mode("overwrite").parquet(tmp + "/lineitem.parquet")
      Tables.part(spark, dir).write.mode("overwrite").parquet(tmp + "/part.parquet")
      spark.read.parquet(tmp + "/lineitem.parquet").count()
    }
    // cold serve pays the ONE build scan; the state is dims x days
    time("day_state_build+serve") { Forecast.forecastLinear(spark, tmp).count() }
    val stateRows = spark.read.parquet(
      ServingStore.currentGeneration(spark, "forecast-days",
        Forecast.dayServePath(tmp), Forecast.dayStatsFingerprint(spark, tmp)).get).count()
    val dimDays = Forecast.dailyBase(spark, tmp)
      .select(col("brand"), col("x")).distinct().count()
    assert(stateRows == dimDays, s"state rows $stateRows != brand-days $dimDays")
    println(s"[stress11] day-state rows: $stateRows (= distinct brand-days; " +
      "hot brand folded, not exploded)")
    // warm serves: state-read + closed-form math only
    time("forecast_linear_warm") { Forecast.forecastLinear(spark, tmp).count() }
    time("seasonal_agg_warm") { Seasonal.seasonalAgg(spark, tmp).count() }
    time("topk_forecast_warm") { Forecast.forecastTopK(spark, tmp).count() }

    // ---- incremental append: another ALL-HOT delta (worst skew) folds in
    val preFp = Forecast.dayStatsFingerprint(spark, tmp)
    val delta = li0
      .withColumn("l_orderkey", col("l_orderkey") + lit(2000000000L))
      .withColumn("l_partkey", lit(hotKey))
    time("delta_land") {
      delta.write.mode("append").parquet(tmp + "/lineitem.parquet"); 0L
    }
    val deltaFrame = delta
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        datediff(col("l_shipdate"), lit("1995-01-01").cast("date")).cast("long").as("x"),
        col("l_extendedprice").as("y"))
    time("day_state_append") {
      Forecast.appendDayStats(spark, tmp, deltaFrame, preFp); 0L
    }
    time("forecast_linear_apnd") { Forecast.forecastLinear(spark, tmp).count() }

    // ---- excise worst case at scale: ALTERNATING duplication — every
    // doc is M disjoint shared 5-grams separated by unique tokens, so
    // coverage CANNOT merge (M intervals per doc). The r10 HOF form was
    // O(tokens x intervals) here; the fused kernel must stay linear.
    val alt = {
      val m = 400
      val rows = (0 until 500).map { d =>
        val tag = s"d$d"
        (d.toLong, (0 until m).map(i =>
          s"p${i}a p${i}b p${i}c p${i}d p${i}e u$i$tag").mkString(" "))
      }
      import spark.implicits._
      rows.toDF("doc_id", "text")
    }
    time("excise_alternating") {
      val r = Dedup.dedupExcise(alt)
        .agg(sum(col("n_kept")).as("kept"), count(lit(1)).as("n")).collect()(0)
      // only the per-doc unique separators survive: 400 per doc
      assert(r.getLong(0) == 500L * 400, s"kept ${r.getLong(0)}")
      r.getLong(1)
    }

    // ---- stamps: 10x events, one user owns HALF of all rows
    val etmp = java.nio.file.Files.createTempDirectory("stress11ev").toString
    val e0 = Tables.events(spark, dir)
    val e10 = (0 until 10).map { i =>
      val shifted = e0.withColumn("event_id", col("event_id") + lit(i * 100000000L))
      if (i >= 5) shifted.withColumn("user_id", lit(424242L))
      else shifted.withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.reduce(_ unionAll _)
    time("events_write_10x") {
      e10.write.mode("overwrite").parquet(etmp + "/events.parquet")
      spark.read.parquet(etmp + "/events.parquet").count()
    }
    time("stamps_build+serve") { Events.funnel(spark, etmp).count() }
    val stampRows = spark.read.parquet(
      ServingStore.currentGeneration(spark, "funnel-stamps",
        Events.stampsServePath(etmp),
        Similarity.corpusFingerprint(spark, etmp, "events.parquet")).get).count()
    val userCount = e10.select("user_id").distinct().count()
    assert(stampRows == userCount, s"stamps rows $stampRows != users $userCount")
    println(s"[stress11] stamps rows: $stampRows (= users; half-corpus user folded)")
    time("funnel_warm") { Events.funnel(spark, etmp).count() }
    time("conv_cohort_warm") { Events.conversionCohort(spark, etmp).count() }
    time("conversion_lag_warm") { Events.conversionLag(spark, etmp).count() }

    // ---- stamps build A/B under the same half-corpus hot user: the
    // mergeable aggregate (shipped) vs the sort-window reference form.
    // The window form's hot-user partition sorts in one task; the
    // aggregate form's plan has NO sort node at all (spec-asserted) and
    // its hot-user work distributes across map-side partials.
    val ebase = spark.read.parquet(etmp + "/events.parquet").selectExpr(
      "user_id", "event_id", "event_type",
      "(ts - pmod(ts, 1000000)) DIV 1000000 AS ts_ms")
    time("stamps_agg_form") { Events.funnelStamps(ebase).count() }
    time("stamps_window_form") { Events.funnelStampsWindowed(ebase).count() }
    spark.stop()
  }
}
