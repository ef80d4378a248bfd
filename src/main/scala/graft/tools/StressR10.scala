package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._
import org.apache.spark.sql.functions._

/** Ad-hoc 10x stress for the r10 operators (the Stress discipline):
  *
  *  - funnel stamps at 10x events with an ADVERSARIAL hot user — all of
  *    one replica's events collapse onto a single user_id, the per-user
  *    window's skew worst case; builds the stamps frame and the three
  *    serving rollups from it.
  *  - mosaic matching at 10x media with a BOILERPLATE hub — every
  *    replica re-emits the same solid contact sheet, so its chunks hub
  *    across videos AND thumbnails; the hot-chunk cap must keep the
  *    candidate stream bounded (observed drops, not silence).
  *
  * Not part of the driver contract.
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.StressR10'
  */
object StressR10 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-stress-r10")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress10] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  $rows%9d rows")
    }

    // ---- funnel stamps: 10x events, replica 9 all on ONE hot user
    val e0 = Tables.events(spark, dir).selectExpr(
      "user_id", "event_id", "event_type",
      "(ts - pmod(ts, 1000000)) DIV 1000000 AS ts_ms")
    val e10 = (0 until 10).map { i =>
      val shifted = e0
        .withColumn("event_id", col("event_id") + lit(i * 100000000L))
      if (i == 9) shifted.withColumn("user_id", lit(424242L))
      else shifted.withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.reduce(_ unionAll _).localCheckpoint()
    println(s"[stress10] events: ${e10.count()} (10x, replica 9 on one hot user)")
    val stamps = Events.funnelStamps(e10).localCheckpoint()
    time("stamps_build") { stamps.count() }
    time("funnel_serve") { Events.funnelFromStamps(stamps).count() }
    time("conv_cohort_serve") { Events.conversionCohortFromStamps(stamps).count() }
    time("lag_serve") { Events.conversionLagFromStamps(stamps).count() }
    // hot user folded into ONE stamps row; rollups agree with user count
    val users = e10.select("user_id").distinct().count()
    assert(stamps.count() == users, "stamps cardinality != users")

    // ---- span excision at 10x with EVERYTHING shared (each doc has 9
    // exact dups, so every gram is cross-document and every position
    // excises — the interval-merge worst case must stay linear)
    val docs0 = Tables.documents(spark, dir)
    val docs10 = (0 until 10)
      .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _).localCheckpoint()
    time("dedup_excise_10x") {
      val r = Dedup.dedupExcise(docs10)
        .agg(sum(col("n_kept")).as("kept"), count(lit(1)).as("n")).collect()(0)
      assert(r.getLong(0) == 0L, s"all-shared corpus kept ${r.getLong(0)} tokens")
      r.getLong(1)
    }

    // ---- mosaic: 10x media plus a 500-video boilerplate hub
    val media0 = Multimodal.transcode(spark,
      Multimodal.fromDocuments(Tables.documents(spark, dir))).toDF()
      .localCheckpoint()
    val solid = {
      val raster = Array.fill(48 * 48 * 3)(77.toByte)
      PpmCodec.encode(48, 48, raster)
    }
    val hub = spark.range(500).select(
      (col("id") + 900000000L).as("media_id"),
      typedLit((1 to 3).flatMap(_ => solid).toArray).as("payload"),
      typedLit(Multimodal.MediaMeta("video", 48, 48, 0, 3)).as("meta"))
    val media10 = (0 until 10)
      .map(i => media0.withColumn("media_id", col("media_id") + lit(i * 10000000L)))
      .reduce(_ unionAll _)
      .unionByName(hub)
      .localCheckpoint()
    println(s"[stress10] media: ${media10.count()} items (10x + 500-video solid hub)")
    time("mosaic_hashes") { Multimodal.mosaicHashes(spark, media10).count() }
    val matches = Multimodal.mosaicMatches(spark, media10).localCheckpoint()
    time("mosaic_matches") { matches.count() }
    // the hub must not appear quadratically: its chunks are hot-capped
    val hubPairs = matches.filter(col("video_id") >= 900000000L).count()
    println(s"[stress10] hub-video pairs surfaced: $hubPairs (cap bounds the hub)")
    spark.stop()
  }
}
