package graft.tools

import graft.{GraftSession, Lane, SparkEntry}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.collection.mutable

/** The fixed-cost / serving-profile measurement probes, consolidated
  * (r16 verdict: FloorProbe1-4 + LaneProbe were five near-duplicate
  * one-shot mains). One dispatcher, five modes:
  *
  *   sbt 'runMain graft.tools.FloorProbe query   [q_a,q_b] [iters]'
  *     — per-query scheduler decomposition: jobs/stages/tasks, task
  *       run/deser/GC ms vs wall (wall - taskSum/parallelism ~ driver
  *       orchestration + stage barriers)
  *   sbt 'runMain graft.tools.FloorProbe job     [iters]'
  *     — micro-decomposition of the per-JOB floor: raw RDD jobs, one-
  *       and two-shuffle SQL shapes with AQE on/off and varying
  *       shuffle partitions
  *   sbt 'runMain graft.tools.FloorProbe timeline [q_name]'
  *     — per-job timeline of one warm execution: submit/end walls,
  *       inter-job gaps (AQE replan / orchestration), task counts
  *   sbt 'runMain graft.tools.FloorProbe sched   [cores]'
  *     — bare-scheduler floor on a minimal session (no graft confs):
  *       stage/task-count sweeps isolating local-mode constants
  *   sbt 'runMain graft.tools.FloorProbe lane    [q_a,q_b] [iters]'
  *     — A/B the interactive lane ([[graft.Lane]]) against the default
  *       profile, per query, same JVM, interleaved samples
  *
  * Findings these probes produced (kept with the code): the 0.1-0.35 s
  * per trivial query is 89-97% execution-side ([[FixedCostProbe]]);
  * of that, AQE charges a 20-45 ms driver re-plan gap per exchange and
  * a 32-partition shuffle spends ~2-3 ms serialized task-launch per
  * task — the two constants the r16 `Lane` profile removes.
  */
object FloorProbe {
  private def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)

  def main(args: Array[String]): Unit = args.headOption.getOrElse("query") match {
    case "query" => query(args.drop(1))
    case "job" => job(args.drop(1))
    case "timeline" => timeline(args.drop(1))
    case "sched" => sched(args.drop(1))
    case "lane" => lane(args.drop(1))
    case other =>
      // legacy spellings: bare query lists ran mode `query`
      if (other.startsWith("q_")) query(args)
      else sys.error(s"unknown probe mode '$other' (query|job|timeline|sched|lane)")
  }

  private def query(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q_date_dim", "q_dim_build", "q_incremental_merge")
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.local("graft-floor")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskRunNs = new AtomicLong // executor run time (ms from metrics)
    val taskDeserNs = new AtomicLong
    val resultSerNs = new AtomicLong
    val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskRunNs.addAndGet(m.executorRunTime)
          taskDeserNs.addAndGet(m.executorDeserializeTime)
          resultSerNs.addAndGet(m.resultSerializationTime)
          gcMs.addAndGet(m.jvmGCTime)
        }
        ()
      }
    })
    println(f"[floor] ${"query"}%-22s  wall  jobs stages tasks  runMs deserMs  gcMs")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      val samples = (1 to iters).map { _ =>
        Thread.sleep(80) // let the listener bus drain (private API)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskRunNs.set(0); taskDeserNs.set(0); resultSerNs.set(0); gcMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(80) // let the listener bus drain (private API)
        (wall, jobs.get, stages.get, tasks.get, taskRunNs.get, taskDeserNs.get, gcMs.get)
      }
      val w = med(samples.map(_._1))
      // medians of counters (they're near-constant across iters)
      def medi(f: ((Double, Int, Int, Int, Long, Long, Long)) => Long): Long =
        samples.map(f).sorted.apply(samples.length / 2)
      println(f"[floor] $name%-22s $w%6.3f ${medi(_._2.toLong)}%5d ${medi(_._3.toLong)}%5d ${medi(_._4.toLong)}%6d ${medi(_._5)}%6d ${medi(_._6)}%7d ${medi(_._7)}%5d")
    }
    spark.stop()
  }

  private def job(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = if (args.nonEmpty) args(0).toInt else 15
    val spark = GraftSession.local("graft-floor2")
    import spark.implicits._
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor2] $label%-46s ${med(ts)}%7.4f s (min ${ts.min}%7.4f)")
    }
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.count()

    // 1. raw job floor: single-stage, single-task
    time("rdd 1-task count")(spark.sparkContext.parallelize(Seq(1), 1).count(): Unit)
    time("range(1e6) count (1 stage, 32 tasks)")(spark.range(1000000L).count(): Unit)
    // 2. one shuffle, AQE on (as configured)
    val agg = nation.groupBy($"n_regionkey").agg(count(lit(1)).as("n"))
    time("nation groupBy count, AQE on")(agg.count(): Unit)
    // 3. same with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("nation groupBy count, AQE OFF")(agg.count(): Unit)
    // 4. AQE off + 4 shuffle partitions
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("nation groupBy count, AQE OFF, shuf=4")(agg.count(): Unit)
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    time("nation groupBy count, AQE OFF, shuf=1")(agg.count(): Unit)
    spark.conf.set("spark.sql.shuffle.partitions", GraftSession.cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // 5. two shuffles (groupBy + orderBy), AQE on/off
    val agg2 = nation.groupBy($"n_regionkey").agg(count(lit(1)).as("n")).orderBy($"n")
    time("2-shuffle query, AQE on")(agg2.collect(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("2-shuffle query, AQE OFF")(agg2.collect(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // 6. broadcast-join query
    val region = spark.read.parquet(s"$dir/region.parquet")
    val bj = nation.join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name").agg(count(lit(1)).as("n"))
    time("broadcast join + agg, AQE on")(bj.count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("broadcast join + agg, AQE OFF")(bj.count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }

  private def timeline(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = if (args.nonEmpty) args(0) else "q_date_dim"
    val spark = GraftSession.local("graft-floor3")
    case class J(id: Int, var sub: Long = 0, var end: Long = 0, var tasks: Int = 0, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val r = jobs.getOrElseUpdate(j.jobId, J(j.jobId))
        r.sub = System.nanoTime(); r.stages = j.stageInfos.size
        r.tasks = j.stageInfos.map(_.numTasks).sum
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.get(j.jobId).foreach(_.end = System.nanoTime()); ()
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    fn(spark, dir).count() // warm more
    Thread.sleep(200)
    jobs.clear()
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val t1 = System.nanoTime()
    Thread.sleep(300)
    println(f"[floor3] $name total ${(t1 - t0) / 1e6}%.1f ms")
    var prev = t0
    jobs.values.toSeq.sortBy(_.sub).foreach { j =>
      val gapBefore = (j.sub - prev) / 1e6
      val dur = (j.end - j.sub) / 1e6
      prev = j.end
      println(f"[floor3]   job ${j.id}%3d  gapBefore $gapBefore%7.1f ms  run $dur%7.1f ms  stages ${j.stages}%2d tasks ${j.tasks}%3d")
    }
    println(f"[floor3]   tailGap ${(t1 - prev) / 1e6}%7.1f ms")
    spark.stop()
  }

  private def sched(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0) else "32"
    val spark = SparkSession.builder()
      .appName("graft-floor4").master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def time(label: String, iters: Int = 21)(f: => Unit): Unit = {
      f; f // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor4/$cores%s] $label%-42s med ${med(ts)}%7.4f  min ${ts.min}%7.4f")
    }
    time("1 stage, 1 task")(sc.parallelize(Seq(1), 1).count(): Unit)
    time("1 stage, 4 tasks")(sc.parallelize(1 to 4, 4).count(): Unit)
    time("1 stage, 32 tasks")(sc.parallelize(1 to 32, 32).count(): Unit)
    time("1 stage, 128 tasks")(sc.parallelize(1 to 128, 128).count(): Unit)
    time("2 stages, 1 task each")(
      sc.parallelize(Seq(1), 1).repartition(1).count(): Unit)
    time("3 stages, 1 task each")(
      sc.parallelize(Seq(1), 1).repartition(1).repartition(1).count(): Unit)
    time("5 stages, 1 task each")(
      sc.parallelize(Seq(1), 1).repartition(1).repartition(1)
        .repartition(1).repartition(1).count(): Unit)
    time("2 stages, 32 tasks each")(
      sc.parallelize(1 to 32, 32).repartition(32).count(): Unit)
    // SQL layer on the same session (default confs): same shapes
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    time("SQL: localrelation agg, AQE default")(df.groupBy($"x" % 5).count().count(): Unit)
    spark.stop()
  }

  private def lane(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val iters = if (args.length > 1) args(1).toInt else 7
    val spark = GraftSession.local("graft-laneprobe")
    println(f"[lane] ${"query"}%-26s default   lane   delta")
    var sumD = 0.0; var sumL = 0.0
    names.foreach { name =>
      // the RAW constructor: SparkEntry.queries is lane-wrapped, so
      // using it for the default arm would A/B the lane against itself
      // (r16 review)
      val fn = SparkEntry.rawQueries(name)
      val laneSession = Lane.sessionFor(spark, dir)
      try {
        fn(spark, dir).count(); fn(laneSession, dir).count() // warm both
        val ds = scala.collection.mutable.ArrayBuffer[Double]()
        val ls = scala.collection.mutable.ArrayBuffer[Double]()
        (1 to iters).foreach { _ =>
          var t0 = System.nanoTime(); fn(spark, dir).count()
          ds += (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime(); fn(laneSession, dir).count()
          ls += (System.nanoTime() - t0) / 1e9
        }
        val d = med(ds.toSeq); val l = med(ls.toSeq)
        sumD += d; sumL += l
        println(f"[lane] $name%-26s $d%7.3f $l%7.3f ${l - d}%+7.3f")
      } catch {
        case e: Throwable =>
          println(s"[lane] $name ERROR ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    println(f"[lane] ${"TOTAL"}%-26s $sumD%7.3f $sumL%7.3f ${sumL - sumD}%+7.3f")
    spark.stop()
  }
}
