package graft.tools

import graft.GraftSession
import graft.operators.ServingStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TWO-PROCESS contention stress for the serving-store protocol (r13
  * verdict #5): the lock/heartbeat/tombstone machinery is spec'd
  * in-process (threads in one JVM share the JVM's file-lock view and a
  * common heap); the r11 orphan-generation race was MULTI-SESSION, so
  * this drives two separate JVMs — real `java` children over the
  * compiled classes + the Spark jars — concurrently ensuring and
  * appending the same store and asserts, from both sides:
  *
  *  - NO TORN SIDECAR: every serve returns exactly the generation its
  *    requested fingerprint stamps — all rows tagged with the fp, full
  *    row count (a torn/mixed sidecar read would serve a partial or
  *    mismatched generation and trip the in-worker assertion).
  *  - NO DOUBLE-BUILD CORRUPTION: builds count their invocations into
  *    per-process marker files; after the run the store's surviving
  *    generation parses, and the generation directory holds at most
  *    the sidecar-stamped generation plus one predecessor.
  *  - READERS SURVIVE ONE REBUILD: a DataFrame served before a rival
  *    process rebuilds the store (fp bump) must still collect() after
  *    that rebuild — prune keeps the previous generation for exactly
  *    this window (file handshake sequences the two processes).
  *  - NO LOCK/TOMBSTONE LITTER: after both workers exit, no `_lock`
  *    and no `*_lock_tomb_*` path survives next to the store.
  *
  * Run: `sbt 'runMain graft.tools.StoreContention'` (driver mode —
  * spawns the two workers itself; requires a prior `sbt compile`).
  * Not part of the driver contract.
  */
object StoreContention {

  private val Rounds = 8
  private val RowsPerGen = 100

  def main(args: Array[String]): Unit = args.toList match {
    case "worker" :: name :: base :: Nil => worker(name, base)
    case _ => driver()
  }

  // ------------------------------------------------------------ driver

  private def driver(): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graftcontend").toString
    println(s"[contend] base=$base")
    val classes = "target/scala-2.13/classes"
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(classes)),
      s"run from the repo root after `sbt compile` (missing $classes)")
    val cp = classes + ":/opt/spark/jars/*"
    def spawn(name: String): Process = {
      val pb = new ProcessBuilder(
        "java", "-Xmx4g",
        "--add-exports=java.base/sun.nio.ch=ALL-UNNAMED",
        "-cp", cp, "graft.tools.StoreContention", "worker", name, base)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile(s"contend_$name", ".log"))
      pb.start()
    }
    val a = spawn("a"); val b = spawn("b")
    val okA = a.waitFor(15, java.util.concurrent.TimeUnit.MINUTES) && a.exitValue() == 0
    val okB = b.waitFor(15, java.util.concurrent.TimeUnit.MINUTES) && b.exitValue() == 0
    a.destroyForcibly(); b.destroyForcibly()
    require(okA && okB, s"worker failure: a=$okA b=$okB — see /tmp/contend_*.log")

    // post-run litter + generation-count audit, from the outside
    val store = java.nio.file.Paths.get(base, "store")
    val siblings = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(base))
      try s.iterator().asScala.map(_.getFileName.toString).toList finally s.close()
    }
    require(!siblings.exists(_.contains("_lock")),
      s"lock/tombstone litter survived the run: $siblings")
    val gens = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(store)
      try s.iterator().asScala.map(_.getFileName.toString).toList finally s.close()
    }
    require(gens.size <= 2, s"more than two generations survived: $gens")
    val spark = GraftSession.local("graft-contend-audit")
    val (fp, gen) = ServingStore.readSidecar(spark, "contend", store.toString)
      .getOrElse(sys.error("sidecar unreadable after the contention run"))
    val rows = spark.read.parquet(gen).collect()
    require(rows.length == RowsPerGen && rows.forall(_.getLong(1) == fp),
      s"stamped generation inconsistent: ${rows.length} rows for fp $fp")
    println(s"[contend] PASS: 2-process ensure/append/reader contention clean " +
      s"(final fp $fp, ${rows.length} rows, ${gens.size} generations)")
    spark.stop()
  }

  // ------------------------------------------------------------ worker

  private def build(spark: SparkSession, fp: Long)(gen: String): Unit =
    spark.range(RowsPerGen)
      .select(col("id"), lit(fp).as("fp"))
      .write.mode("overwrite").parquet(gen)

  private def serveAndCheck(spark: SparkSession, store: String, fp: Long): Unit = {
    val rows = ServingStore.ensure(spark, "contend", store, fp)(build(spark, fp))
      .collect()
    require(rows.length == RowsPerGen,
      s"fp $fp served ${rows.length} rows — torn generation")
    require(rows.forall(_.getLong(1) == fp),
      s"fp $fp served rows of another generation: " +
        rows.map(_.getLong(1)).distinct.mkString(","))
  }

  private def touch(p: java.nio.file.Path): Unit =
    java.nio.file.Files.write(p, Array.emptyByteArray)

  private def await(p: java.nio.file.Path): Unit = {
    val deadline = System.currentTimeMillis() + 10 * 60 * 1000
    while (!java.nio.file.Files.exists(p)) {
      require(System.currentTimeMillis() < deadline, s"timed out waiting for $p")
      Thread.sleep(100)
    }
  }

  private def worker(name: String, base: String): Unit = {
    val spark = GraftSession.local(s"graft-contend-$name")
    val store = base + "/store"
    val flags = java.nio.file.Paths.get(base)

    // phase 1 — free-for-all ensure contention over a rising fp chain:
    // both processes race every generation; whoever wins builds, the
    // loser must wait out the winner's lock and serve the winner's
    // build. Every serve is checked for fp purity and full row count.
    (1 to Rounds).foreach { i => serveAndCheck(spark, store, i.toLong) }
    touch(flags.resolve(s"phase1_$name"))
    await(flags.resolve(if (name == "a") "phase1_b" else "phase1_a"))

    // phase 2 — reader survival across a RIVAL process's rebuild:
    // `a` serves fp=100 and holds the plan; `b` rebuilds at fp=101;
    // `a` must still collect the held plan (prune keeps one
    // predecessor generation for exactly this window).
    if (name == "a") {
      val held = ServingStore.ensure(spark, "contend", store, 100L)(build(spark, 100L))
      require(held.collect().length == RowsPerGen)
      touch(flags.resolve("a_holding"))
      await(flags.resolve("b_rebuilt"))
      val again = held.collect()
      require(again.length == RowsPerGen && again.forall(_.getLong(1) == 100L),
        "held reader plan broke after one rival rebuild — predecessor pruned early")
    } else {
      await(flags.resolve("a_holding"))
      serveAndCheck(spark, store, 101L)
      touch(flags.resolve("b_rebuilt"))
    }
    touch(flags.resolve(s"phase2_$name"))
    await(flags.resolve(if (name == "a") "phase2_b" else "phase2_a"))

    // phase 3 — append under contention, lockstep: each process lands
    // its own disjoint delta on an agreed fp chain (a: even rounds,
    // b: odd). The append protocol's staleness proof requires the
    // exact stored fp, so the chain is sequenced by handshake files;
    // the LOCK correctness under two JVMs is what is under test (the
    // whole append runs inside withBuildLock).
    val appendRounds = 4
    serveAndCheck(spark, store, 200L)
    // both must finish the fp=200 ensure BEFORE any append: a straggler
    // ensure(200) against an already-appended (restamped) sidecar would
    // legitimately REBUILD at 200 and clobber the append chain — that
    // is correct protocol behavior (stale-fp callers rebuild), so the
    // harness sequences it away to keep the chain decidable
    touch(flags.resolve(s"pre_append_$name"))
    await(flags.resolve(if (name == "a") "pre_append_b" else "pre_append_a"))
    (0 until appendRounds).foreach { r =>
      val mine = (r % 2 == 0) == (name == "a")
      if (mine) {
        if (r > 0) await(flags.resolve(s"append_${r - 1}"))
        ServingStore.append(spark, "contend", store,
          expectedFp = 200L + r,
          delta = spark.range(10)
            .select((col("id") + 1000L * (r + 1)).as("id"),
              lit(201L + r).as("fp")),
          postFp = () => 201L + r,
          uniqueKey = Some("id"))
        touch(flags.resolve(s"append_$r"))
      } else await(flags.resolve(s"append_$r"))
    }
    // both processes read the final appended state and check it holds
    // every delta exactly once
    val finalRows = ServingStore.ensure(spark, "contend", store,
      200L + appendRounds)(_ => sys.error("final state must serve, not rebuild"))
      .collect()
    require(finalRows.length == RowsPerGen + 10 * appendRounds,
      s"appended store holds ${finalRows.length} rows, " +
        s"expected ${RowsPerGen + 10 * appendRounds}")
    // both must finish the serve-only final check before the closing
    // rebuild restamps the sidecar (same decidability sequencing as
    // pre_append above)
    touch(flags.resolve(s"final_check_$name"))
    await(flags.resolve(if (name == "a") "final_check_b" else "final_check_a"))
    // rebuild once more so the driver audit sees a clean stamped
    // generation (both processes race it; either's build is fine)
    serveAndCheck(spark, store, 300L)
    spark.stop()
  }
}
