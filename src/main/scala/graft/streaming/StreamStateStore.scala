package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared state machinery for `foreachBatch` sinks that maintain a
  * queryable parquet table incrementally (the rollup and quality-floor
  * sinks): batch-id idempotency under at-least-once replay, and
  * crash-safe state swaps.
  *
  * At-least-once safety: foreachBatch can REPLAY a batch after a
  * restart, and a naive merge would double-count it. The applied batch
  * id is stored in a `_last_batch` marker inside the state directory
  * (written before the swap, so marker and data move atomically);
  * replayed batches are skipped, loudly. Crash recovery compares
  * MARKERS, never directory existence: a complete tmp (parquet
  * _SUCCESS + parseable marker) with a HIGHER batch id than the live
  * state is the newest state — a crash mid-delete of the old directory
  * must not win over the finished merge. Unparseable/partial markers
  * read as absent, so a crash mid-marker-write degrades to a re-merge
  * of one batch from the previous state, never a poisoned stream.
  *
  * CAVEAT (logged when it bites): batch ids restart at 0 with a FRESH
  * checkpoint location, so a state directory is bound to one checkpoint
  * lineage — reuse with a new checkpoint requires clearing the state
  * dir, or early batches are skipped as replays. A production
  * deployment would get all of this from a transactional table format.
  */
private[graft] object StreamStateStore {

  @transient private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  private val Marker = "_last_batch"

  private def markerOf(dir: java.nio.file.Path): Option[Long] = {
    val f = dir.resolve(Marker)
    if (!java.nio.file.Files.exists(f)) None
    else
      // partial marker writes parse as None -> the directory is treated
      // as incomplete instead of crashing every restart
      scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toLong).toOption
  }

  /** Fold one micro-batch into the persisted state at `stateDir`:
    * `merge(prevState)` computes the new state table (prevState is None
    * on the first batch), which is written to a tmp directory, marked,
    * and swapped in. Replayed batch ids are skipped. */
  def applyBatch(spark: SparkSession, batchId: Long, stateDir: String, sinkName: String)(
      merge: Option[DataFrame] => DataFrame): Unit = {
    val state = java.nio.file.Paths.get(stateDir)
    val tmp = java.nio.file.Paths.get(stateDir + "_tmp")
    val stateMarker = if (java.nio.file.Files.exists(state)) markerOf(state) else None
    val tmpMarker =
      if (java.nio.file.Files.exists(tmp.resolve("_SUCCESS"))) markerOf(tmp) else None
    // crash recovery by marker comparison: tmp wins only if it is a
    // COMPLETE, NEWER merge (a crash mid-delete of the old state dir
    // leaves it present-but-partial; the finished tmp must still win)
    if (tmpMarker.exists(t => stateMarker.forall(t > _))) {
      deleteRecursively(state)
      java.nio.file.Files.move(tmp, state)
    } else if (java.nio.file.Files.exists(tmp))
      deleteRecursively(tmp) // stale or older partial write
    // idempotent replay: this batch is already folded into the state
    val applied = if (java.nio.file.Files.exists(state)) markerOf(state) else None
    if (applied.exists(_ >= batchId))
      logger.warn(
        s"$sinkName: skipping batch $batchId (already applied through " +
          s"${applied.get}); if this stream was restarted with a fresh " +
          "checkpoint over an existing state dir, clear the state dir")
    else {
      val prev =
        if (java.nio.file.Files.exists(state)) Some(spark.read.parquet(stateDir)) else None
      merge(prev).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.write(tmp.resolve(Marker), batchId.toString.getBytes("UTF-8"))
      deleteRecursively(state)
      java.nio.file.Files.move(tmp, state)
    }
  }

  // hardened like ServingStore.prune's inner loop: the walk stream is
  // closed eagerly (it holds a directory fd) and deletes tolerate files
  // vanishing concurrently (deleteIfExists, not delete)
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }

  // --------------------------------------------- bucketed (partitioned) state

  /** BUCKETED state: the fix for the whole-store rewrite caveat above.
    * State lives as hash-partitioned `b=<n>` directories (standard
    * partition layout — `spark.read.parquet(stateDir)` restores `b` as a
    * column and readers are unchanged), each bucket carries its OWN
    * `_last_batch` marker, and a micro-batch rewrites ONLY the buckets
    * its keys land in: per-batch IO drops from O(distinct content ever
    * seen) to O(content in the touched buckets) — with enough buckets,
    * O(batch). This is the upsert/MERGE shape a transactional table
    * format provides, expressed on plain parquet.
    *
    * Exactly-once per BUCKET instead of per store: foreachBatch replays
    * a batch deterministically (replayable-source contract), so a crash
    * that lands some buckets and not others self-heals on replay — the
    * landed buckets' markers skip them, the rest re-merge from their
    * intact previous state. The per-bucket swap is two-phase (stage the
    * old dir under an underscore-prefixed name Spark's file index
    * ignores, move the new dir in, drop the stage), and
    * [[recoverBucketSwaps]] rolls a torn swap forward or back by
    * inspecting which side exists before every batch. */
  def applyBatchBucketed(spark: SparkSession, batchId: Long, stateDir: String,
      sinkName: String, keyCol: String, nBuckets: Int)(cur: DataFrame)(
      merge: (Option[DataFrame], DataFrame) => DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val state = java.nio.file.Paths.get(stateDir)
    java.nio.file.Files.createDirectories(state)
    recoverBucketSwaps(state)
    checkBucketCount(state, nBuckets)
    val withB = cur.withColumn("b",
      pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).cast("int"))
      .localCheckpoint(eager = false)
    // the touched set is bounded by nBuckets — a driver-side list, never data
    val touchedAll = withB.select(col("b")).distinct()
      .collect().map(_.getInt(0)).sorted
    val touched = touchedAll.filterNot(b =>
      markerOf(state.resolve(s"b=$b")).exists(_ >= batchId))
    // a skipped bucket with marker == batchId is the normal crash-replay
    // self-heal; marker > batchId means the state dir belongs to another
    // checkpoint lineage and THIS batch's rows for that bucket are being
    // dropped — that must be loud even when other buckets still apply
    val lineageViolated = touchedAll.filter(b =>
      markerOf(state.resolve(s"b=$b")).exists(_ > batchId))
    if (lineageViolated.nonEmpty)
      logger.warn(s"$sinkName: buckets ${lineageViolated.mkString(",")} carry " +
        s"markers beyond batch $batchId — the state dir is bound to a " +
        "different checkpoint lineage and their rows from this batch are " +
        "DROPPED; clear the state dir to reuse it with a fresh checkpoint")
    if (touched.isEmpty) {
      if (touchedAll.nonEmpty && lineageViolated.isEmpty)
        logger.warn(s"$sinkName: skipping batch $batchId (every touched " +
          "bucket already applied it); if this stream was restarted with " +
          "a fresh checkpoint over an existing state dir, clear the state dir")
      return
    }
    val curTouched = withB.filter(col("b").isin(touched.map(Integer.valueOf): _*))
    // a live bucket is one whose swap completed — the per-bucket marker
    // is written before the move, so its presence IS completeness
    // (parquet's _SUCCESS lands at the partitioned write's top level,
    // never inside the bucket dirs)
    val prevDirs = touched
      .map(b => state.resolve(s"b=$b"))
      .filter(p => markerOf(p).isDefined)
      // a marker-only bucket (a past merge emitted zero rows for it) has
      // no parquet files: feeding it to the reader would fail schema
      // inference when EVERY touched bucket is such — and an empty
      // bucket contributes no prev rows either way
      .filter(p => Option(p.toFile.listFiles).exists(_.exists(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))))
      .map(_.toString)
    val prev =
      if (prevDirs.isEmpty) None
      else Some(spark.read.option("basePath", stateDir).parquet(prevDirs: _*))
    val tmp = java.nio.file.Paths.get(stateDir + "_tmp")
    deleteRecursively(tmp)
    // merge must key on `keyCol` only (b is hash-functional on it), and
    // must emit `b` — the partitioned write routes each bucket to its dir
    merge(prev, curTouched)
      .write.mode("overwrite").partitionBy("b").parquet(tmp.toString)
    touched.foreach { b =>
      val tb = tmp.resolve(s"b=$b")
      // the fold never drops rows, so every touched bucket has output;
      // guard anyway — an empty bucket dir must still carry its marker
      java.nio.file.Files.createDirectories(tb)
      java.nio.file.Files.write(tb.resolve(Marker), batchId.toString.getBytes("UTF-8"))
      // two-phase swap, one bucket at a time
      val live = state.resolve(s"b=$b")
      val stage = state.resolve(s"_swap_$b")
      if (java.nio.file.Files.exists(live)) java.nio.file.Files.move(live, stage)
      java.nio.file.Files.move(tb, live)
      deleteRecursively(stage)
    }
    deleteRecursively(tmp)
  }

  /** Roll torn per-bucket swaps forward or back: a `_swap_<b>` stage dir
    * means a swap was interrupted — if the live `b=<b>` landed, the new
    * state won (drop the stage); if not, the stage IS the state (restore
    * it). Runs before every bucketed batch and is idempotent. */
  private def recoverBucketSwaps(state: java.nio.file.Path): Unit = {
    val stages = Option(state.toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("_swap_"))
    stages.foreach { s =>
      val b = s.getName.stripPrefix("_swap_")
      val live = state.resolve(s"b=$b")
      if (java.nio.file.Files.exists(live)) deleteRecursively(s.toPath)
      else java.nio.file.Files.move(s.toPath, live)
    }
  }

  /** The bucket count is part of the state layout: a different count
    * re-routes keys to other buckets and silently splits hash groups.
    * Stamped on first use, required equal afterwards. */
  private def checkBucketCount(state: java.nio.file.Path, nBuckets: Int): Unit = {
    val f = state.resolve("_n_buckets")
    // the markerOf convention: a partial/unparseable stamp (crash
    // mid-write) reads as ABSENT and is re-stamped — never a
    // NumberFormatException poisoning every restart
    val stored =
      if (!java.nio.file.Files.exists(f)) None
      else scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toInt).toOption
    stored match {
      case Some(n) =>
        require(n == nBuckets,
          s"bucketed state at $state was laid out with $n buckets; " +
            s"reopening with $nBuckets would mis-route keys — migrate or clear")
      case None =>
        java.nio.file.Files.write(f, nBuckets.toString.getBytes("UTF-8"))
    }
  }
}
