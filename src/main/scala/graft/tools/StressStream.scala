package graft.tools

import graft.GraftSession
import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import java.sql.Timestamp

/** Streaming state-store stress: drives the stateful streaming operators
  * (windowed agg, sessionization via mapGroupsWithState, watermarked
  * dedup, stream-stream interval join) over a large MemoryStream in many
  * micro-batches, and reports sustained events/sec plus emitted rows —
  * the numbers behind the "state stays finite under watermarks" claims.
  * Ad-hoc (not part of the driver contract); results recorded in
  * PLANS.md.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.StressStream'
  */
object StressStream {
  val Users = 50000
  val EventsPerBatch = 100000
  val Batches = 20

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stress-stream")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // deterministic synthetic load: each batch advances simulated time by
    // 30 min, so watermarks advance and state actually evicts (the thing
    // being measured); ~20% duplicate event ids exercise dedup state
    def batchEvents(b: Int): Seq[EventStream.Event] = {
      val rnd = new scala.util.Random(b)
      (0 until EventsPerBatch).map { i =>
        val user = rnd.nextInt(Users).toLong
        val g = b.toLong * EventsPerBatch + i
        val id = if (g % 5 == 4) g - 1 else g // every 5th event repeats the prior id: 20% dups
        val ts = new Timestamp(base + b * 30L * 60 * 1000 + rnd.nextInt(30 * 60 * 1000))
        EventStream.Event(user, id, ts, if (i % 3 == 0) "click" else "view", (i % 100) / 10.0)
      }
    }

    def drive(name: String)(start: MemoryStream[EventStream.Event]
        => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val input = MemoryStream[EventStream.Event]
      val q = start(input)
      val total = Batches.toLong * EventsPerBatch
      val t0 = System.nanoTime()
      try {
        (0 until Batches).foreach { b =>
          input.addData(batchEvents(b): _*)
          q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val progress = q.lastProgress
        val stateRows = Option(progress)
          .flatMap(p => p.stateOperators.headOption)
          .map(_.numRowsTotal).getOrElse(-1L)
        println(f"[stress-stream] $name%-16s ${sec}%7.2fs  ${total / sec}%,10.0f ev/s  state_rows=$stateRows")
      } finally q.stop()
    }

    drive("windowed_agg") { in =>
      EventStream.windowedAgg(in.toDF())
        .writeStream.outputMode("update").format("noop").start()
    }
    drive("sessionize") { in =>
      EventStream.sessionize(spark, in.toDS())
        .writeStream.outputMode("append").format("noop").start()
    }
    drive("dedup") { in =>
      EventStream.dedupStream(in.toDF())
        .writeStream.outputMode("append").format("noop").start()
    }

    // interval join: rates tick every 10 simulated minutes for 1/10 of users
    val rateInput = MemoryStream[EventStream.Rate]
    val eventInput = MemoryStream[EventStream.Event]
    val joined = EventStream.enrichWithRates(eventInput.toDF(), rateInput.toDF())
    val q = joined.writeStream.outputMode("append").format("noop").start()
    val t0 = System.nanoTime()
    try {
      (0 until Batches).foreach { b =>
        val rnd = new scala.util.Random(1000 + b)
        rateInput.addData((0 until Users / 10).map { u =>
          EventStream.Rate(u.toLong * 10,
            new Timestamp(base + b * 30L * 60 * 1000 + (u % 3) * 600L * 1000),
            1.0 + (u % 7) / 10.0)
        }: _*)
        eventInput.addData(batchEvents(b): _*)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val total = Batches.toLong * (EventsPerBatch + Users / 10)
      println(f"[stress-stream] interval_join    ${sec}%7.2fs  ${total / sec}%,10.0f rows/s")
    } finally q.stop()

    // quality-floor sketch sink: per-language KLL state under many
    // micro-batches — throughput, state size (one blob per language),
    // and floor sanity on a known-uniform score distribution
    locally {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("stressfloors").toString + "/state"
      val batches = 20
      val rows = 200000L
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        val batch = spark.range(b * rows, (b + 1) * rows)
          .select(
            col("id").as("doc_id"),
            concat(lit("lang_"), pmod(col("id"), lit(7)).cast("string")).as("pred_lang"),
            (pmod(xxhash64(col("id")), lit(1000000)).cast("double") / 1e6).as("quality_score"))
        graft.streaming.QualityFloors.applyFloorBatch(batch, b.toLong, dir)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val floors = graft.streaming.QualityFloors.currentFloors(spark, dir).collect()
      val stateBytes = spark.read.parquet(dir)
        .select(sum(length(col("sketch")))).collect()(0).getLong(0)
      val total = batches * rows
      val worstOff = floors.map(r => math.abs(
        r.getDouble(2) - graft.operators.TextAnalysis.QualityQuantile)).max
      println(f"[stress-stream] kll_floors       ${sec}%7.2fs  ${total / sec}%,10.0f docs/s  " +
        f"state_bytes=$stateBytes  langs=${floors.length}  worst_floor_off=$worstOff%.4f")
    }

    spark.stop()
  }
}
