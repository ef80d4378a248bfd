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

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.delete)
    }
}
