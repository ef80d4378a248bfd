package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fingerprint-keyed serving-generation ensure — the pattern the
  * model-serving family grew one copy at a time (posting index, IVF/PQ
  * models, classifier weights, funnel stamps, resolved enrichment): a
  * store under `path` is fresh iff the sidecar at `path + "_model"`
  * carries the corpus fingerprint; otherwise `build` writes a NEW
  * generation and the sidecar is stamped AFTER the write commits, so a
  * crash in between leaves a stale sidecar and the next ensure rebuilds
  * — never a fresh-looking stale store.
  *
  * Each build writes a UNIQUE subdirectory (`path/gen_<fp-hex>_<nonce>`,
  * nonce a random UUID — process-unique, not merely JVM-monotonic) and
  * the sidecar names it: a rebuild can never overwrite files ANY live
  * reader references — not even when a corpus cycles back to a
  * previously-seen fingerprint (A→B→A would have re-targeted a pure
  * fp-derived directory in place; the r11 review caught it). The
  * sidecar-named previous generation survives exactly one rebuild cycle
  * for readers handed out before the swap; older generations are
  * pruned, bounding the store at two generations of disk. When the
  * sidecar is unreadable the previous generation is UNKNOWN, so pruning
  * is skipped entirely rather than guessed. Pre-generation (flat
  * layout) sidecars carry no generation name and read as unproven —
  * they migrate with one rebuild, and the migration prunes the legacy
  * flat part-files: generation-layout code never hands the flat files
  * to a reader (a legacy sidecar always rebuilds), so no reader of THIS
  * code can hold them, and the two-generation disk bound holds across
  * the migration too.
  *
  * Builds run under a lock directory at `path + "_lock"`: two sessions
  * ensuring the same stale store no longer both build (the r11-disclosed
  * concurrent-builders race — never corrupting, but the loser's
  * generation was orphaned until a later prune). The loser waits, then
  * re-reads the sidecar and almost always serves the winner's fresh
  * generation without building at all. A crashed builder's lock is
  * taken over after [[ServingStore.LockStaleMs]] (lock-dir mtime).
  *
  * Callers with extra lifecycle (bucketed catalog registration,
  * appendable generations) keep their own copies; plain parquet stores
  * route here.
  */
private[graft] object ServingStore {

  /** Typed [[append]] refusals — protocol callers (the streaming
    * [[graft.streaming.SigSink]]) dispatch on the TYPE, never on the
    * human-readable message (the r14 review: substring dispatch turns
    * a message rewording into a stream-killing regression). They
    * extend IllegalArgumentException so existing intercepts and the
    * require-style call sites keep their contract. */
  private[graft] sealed abstract class AppendRefused(msg: String)
      extends IllegalArgumentException(msg)
  /** storedFp != the caller's pre-delta snapshot: the store is stale. */
  private[graft] final class StaleStoreRefusal(msg: String) extends AppendRefused(msg)
  /** The post-delta fingerprint did not advance: delta files not landed. */
  private[graft] final class DeltaNotLandedRefusal(msg: String) extends AppendRefused(msg)
  /** Delta unique keys already present in the generation: double append. */
  private[graft] final class KeysAlreadyPresentRefusal(msg: String) extends AppendRefused(msg)

  /** A corpus-global model (IDF weights) has drifted past its
    * staleness bound: serving it for one more delta would exceed the
    * operator's quantified accuracy contract — rebuild instead. */
  private[graft] final class ModelDriftRefusal(msg: String) extends AppendRefused(msg)

  /** What the sidecar proves about the store. */
  private[graft] sealed trait SidecarState
  /** Generation layout: fp + the generation directory it names. */
  private[graft] final case class Stamped(fp: Long, gen: String) extends SidecarState
  /** Readable sidecar from the pre-generation flat layout (fp only, no
    * generation name): the flat files are unproven and must migrate —
    * and since this code never serves them, they are safe to prune on
    * the migration rebuild. */
  private[graft] case object LegacyFlat extends SidecarState
  /** Missing or unreadable sidecar: the live generation is UNKNOWN. */
  private[graft] case object Unknown extends SidecarState

  /** Unique directory for a NEW generation build: fingerprint for
    * auditability plus a random-UUID nonce for uniqueness — never
    * reuses a directory a previous build (even of the same fp, even
    * from another process) may have handed to a live reader. */
  private[graft] def newGenerationPath(path: String, fp: Long): String =
    path + "/gen_" + java.lang.Long.toHexString(fp) + "_" +
      java.util.UUID.randomUUID().toString.replace("-", "")

  private[graft] def sidecarState(spark: SparkSession, what: String,
      path: String): SidecarState =
    try {
      val df = spark.read.parquet(path + "_model")
      if (!df.columns.contains("gen")) LegacyFlat
      else {
        val r = df.select(col("fp"), col("gen")).collect()(0)
        Stamped(r.getLong(0), path + "/" + r.getString(1))
      }
    } catch {
      // missing-vs-unreadable is distinguished INSIDE
      // warnUnreadableSidecar (a sidecar that does not exist yet is the
      // normal first build and logs nothing; only a present-but-broken
      // one warns) — keep that distinction in one place
      case e if scala.util.control.NonFatal(e) =>
        Similarity.warnUnreadableSidecar(what, path + "_model", e)
        Unknown
    }

  /** (fp, generation dir path) from the sidecar — None when unreadable
    * (warned) or when it predates the generation layout (no warn: that
    * is the documented migration path). */
  private[graft] def readSidecar(spark: SparkSession, what: String,
      path: String): Option[(Long, String)] =
    sidecarState(spark, what, path) match {
      case Stamped(fp, gen) => Some((fp, gen))
      case _ => None
    }

  private[graft] def writeSidecar(spark: SparkSession, path: String, fp: Long,
      gen: String): Unit =
    spark.range(1)
      .select(lit(fp).as("fp"),
        lit(java.nio.file.Paths.get(gen).getFileName.toString).as("gen"))
      .coalesce(1).write.mode("overwrite").parquet(path + "_model")

  /** The current sidecar-named generation directory, if fresh for `fp`. */
  private[graft] def currentGeneration(spark: SparkSession, what: String,
      path: String, fp: Long): Option[String] =
    readSidecar(spark, what, path).collect {
      case (f, g) if f == fp &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(g)) => g
    }

  /** Age after which another builder's lock is presumed crashed and
    * taken over. Volatile so the adversarial specs can shrink it. */
  @volatile private[graft] var LockStaleMs: Long = 30L * 60 * 1000

  /** Crash-point injection seam for the two-process crash harness
    * ([[graft.tools.StoreContention]]): when the GRAFT_CRASH_POINT env
    * var names this tag, halt the JVM on the spot — `Runtime.halt`
    * runs no shutdown hooks and no finally blocks, the closest
    * in-process stand-in for `kill -9` at an exact line. The points
    * sit inside the unprove-before-mutate windows (sidecar deleted,
    * live files half-swapped), the precise states the stores promise
    * to recover from. Unset in production: one map lookup, no hot
    * path. */
  private[graft] def crashPoint(tag: String): Unit =
    if (sys.env.get("GRAFT_CRASH_POINT").contains(tag)) {
      Console.err.println(s"[crash-point] halting at $tag")
      Runtime.getRuntime.halt(137)
    }

  private[graft] def lockPath(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path + "_lock")

  /** Run `body` holding the store's build lock (a lock DIRECTORY —
    * creation is atomic on every local filesystem). Contenders poll;
    * a lock older than [[LockStaleMs]] is presumed abandoned by a
    * crashed builder and taken over. The callback re-checks freshness
    * under the lock, so a waiting loser serves the winner's generation
    * instead of building again. */
  private[graft] def withBuildLock[T](path: String)(body: => T): T = {
    val lock = lockPath(path)
    Option(lock.getParent).foreach(java.nio.file.Files.createDirectories(_))
    // ownership nonce: release must only remove a lock THIS holder still
    // owns — after a (mistaken or legitimate) takeover, the original
    // holder's nonce went with the renamed tombstone, so its release
    // sees a foreign lock and leaves it alone instead of unlocking the
    // new holder's build
    val nonce = "owner_" + java.util.UUID.randomUUID().toString.replace("-", "")
    var acquired = false
    while (!acquired) {
      try {
        java.nio.file.Files.createDirectory(lock)
        java.nio.file.Files.createFile(lock.resolve(nonce))
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale =
            try {
              val age = System.currentTimeMillis() -
                java.nio.file.Files.getLastModifiedTime(lock).toMillis
              age > LockStaleMs
            } catch {
              // vanished between the failed create and the stat: retry
              case _: java.io.IOException => false
            }
          if (stale) {
            // takeover must be ATOMIC: delete-then-create lets contender
            // B's delayed delete remove contender A's freshly created
            // lock (two builders then hold it at once — r12 advice).
            // Rename the stale lock to a contender-unique tombstone
            // instead: same-directory Files.move with ATOMIC_MOVE is
            // atomic on local filesystems, so exactly ONE renamer owns
            // the stale lock; it removes the tombstone and loops into
            // the normal createDirectory race. Losers' moves throw (the
            // source is gone) and they just re-enter the loop. A crash
            // between move and delete leaks a tombstone dir that
            // blocks nothing (it is not the lock path).
            val tomb = java.nio.file.Paths.get(path + "_lock_tomb_" +
              java.util.UUID.randomUUID().toString.replace("-", ""))
            try {
              java.nio.file.Files.move(lock, tomb,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              // the renamed dir still carries the crashed holder's
              // owner_* nonce file — a bare delete on the dir throws
              // DirectoryNotEmptyException and leaks a tombstone on
              // EVERY takeover; delete bottom-up like prune
              val walked = {
                val s = java.nio.file.Files.walk(tomb)
                try { import scala.jdk.CollectionConverters._
                  s.iterator().asScala.toList } finally s.close()
              }
              walked.reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
            } catch { case _: java.io.IOException => () }
          } else Thread.sleep(50)
      }
    }
    // heartbeat: a legitimate build longer than LockStaleMs must not
    // read as abandoned — a daemon thread refreshes the lock mtime at a
    // third of the staleness bound, so takeover only ever fires on a
    // holder that actually stopped (crashed process, dead JVM). Touch
    // failures are swallowed: if the lock was stolen anyway (extreme
    // clock skew), the ownership check below keeps release correct.
    val beat = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(1000L, LockStaleMs / 3))
          try java.nio.file.Files.setLastModifiedTime(lock,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case _: java.io.IOException => () }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-${lock.getFileName}")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      beat.interrupt()
      try {
        // release ONLY if our nonce is still inside — i.e. the lock dir
        // is still the one we created, not a successor's
        if (java.nio.file.Files.deleteIfExists(lock.resolve(nonce)))
          java.nio.file.Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Freshness-aware serve memo: the sidecar parquet IS the freshness
    * proof, but re-reading it (plus re-listing the generation files)
    * through `spark.read.parquet` costs ~0.1s of driver fixed overhead
    * per serve — paid by every serving-store query every time. The memo
    * keys the served DataFrame on a driver-side stat SIGNATURE of the
    * sidecar directory (file names + lengths + mtimes — microseconds on
    * the node-local warehouse): any rebuild/append rewrites the sidecar,
    * changing the signature and invalidating the entry, so the
    * freshness semantics are exactly the sidecar read's, minus the
    * parquet round-trips. Session-scoped (DataFrames bind a session). */
  private val serveMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long, DataFrame)]()

  private def sidecarSig(path: String): String = {
    val dir = java.nio.file.Paths.get(path + "_model")
    if (!java.nio.file.Files.isDirectory(dir)) "absent"
    else
      try {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.toSeq
          .map(p => p.getFileName.toString + ":" + java.nio.file.Files.size(p) + ":" +
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .sorted.mkString("|")
        finally s.close()
      } catch {
        // a concurrent sidecar rewrite (writeSidecar's overwrite deletes
        // the old part files) can vanish a just-listed file before its
        // stat — the signature is mid-change, so return a UNIQUE token:
        // the memo misses and the slow path's own handlers take over,
        // instead of the stat race crashing the query
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          "racing_" + System.nanoTime()
      }
  }

  /** Ensure a generation of the store under `path` matching `fp`;
    * `build` must write the store to the directory it is handed.
    * Returns the fresh generation as a lazy parquet read. */
  def ensure(spark: SparkSession, what: String, path: String, fp: Long)(
      build: String => Unit): DataFrame = {
    def freshGen(state: SidecarState): Option[String] = state match {
      case Stamped(f, g) if f == fp &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(g)) => Some(g)
      case _ => None
    }
    val memoKey = System.identityHashCode(spark).toString + "|" + path
    val sig0 = sidecarSig(path)
    Option(serveMemo.get(memoKey)) match {
      // the identity hash is not unique across a collected session's
      // lifetime: verify the memo'd frame is bound to THIS session, or
      // a hash-reusing new session would be served a dead session's plan
      case Some((s, f, df)) if s == sig0 && f == fp &&
        (df.sparkSession eq spark) => return df
      case _ => ()
    }
    // `sig` must be a signature captured BEFORE the sidecar read that
    // chose `gen` (or computed under the build lock, where sidecar
    // writes are serialized): storing a signature recomputed AFTER the
    // choice would let a concurrent same-fp rebuild landing in between
    // bind the NEW sidecar signature to the OLD generation's frame, and
    // every later ensure would memo-hit a pruned generation — the
    // transient race pinned persistent. With the pre-read signature the
    // worst case is one stale memo MISS on the next call.
    def serve(gen: String, sig: String): DataFrame = {
      val df = spark.read.parquet(gen)
      // crude bound: the memo holds one entry per (session, store) —
      // dozens in any real process — but a session-cycling harness
      // would otherwise grow it without limit (each entry pins a full
      // QueryExecution); reset rather than LRU, the rebuild cost is one
      // sidecar read per store
      if (serveMemo.size > 256) serveMemo.clear()
      serveMemo.put(memoKey, (sig, fp, df))
      df
    }
    freshGen(sidecarState(spark, what, path)) match {
      case Some(gen) => serve(gen, sig0)
      case None =>
        withBuildLock(path) {
          // re-check under the lock: a concurrent builder we waited out
          // has usually stamped the store fresh already — serve it
          val state = sidecarState(spark, what, path)
          freshGen(state) match {
            case Some(gen) => serve(gen, sidecarSig(path))
            case None =>
              val target = newGenerationPath(path, fp)
              build(target)
              writeSidecar(spark, path, fp, target)
              // prune everything but the new generation and the
              // sidecar-named previous one (live readers hold it for one
              // rebuild cycle). A LEGACY sidecar proves the flat layout:
              // this code never served those files, so the migration
              // rebuild prunes them outright. An UNREADABLE sidecar
              // means the live generation is unknown — skip pruning
              // rather than delete what a reader may hold.
              state match {
                case Stamped(_, prevGen) => prune(path, keep = Set(target, prevGen))
                case LegacyFlat => prune(path, keep = Set(target))
                case Unknown => ()
              }
              serve(target, sidecarSig(path))
          }
        }
    }
  }

  /** Unconditionally build and stamp a NEW generation for `fp`, even
    * when the sidecar already claims `fp` — for the one case where the
    * fingerprint is current but the CONTENT is proven incomplete: the
    * streaming-append landing race ([[graft.streaming.SigSink]]), where
    * batch N's `postFp` stamped a fingerprint that also covered batch
    * N+1's files while only N's rows were merged. [[ensure]] cannot
    * repair that state (fp matches, so it serves the incomplete
    * generation); this rebuild covers every landed file by
    * construction. Same lock/stamp/prune discipline as ensure's build
    * branch; live readers keep the previous generation for one cycle. */
  private[graft] def rebuild(spark: SparkSession, what: String, path: String,
      fp: Long)(build: String => Unit): DataFrame =
    withBuildLock(path) {
      val state = sidecarState(spark, what, path)
      val target = newGenerationPath(path, fp)
      build(target)
      writeSidecar(spark, path, fp, target)
      state match {
        case Stamped(_, prevGen) => prune(path, keep = Set(target, prevGen))
        case LegacyFlat => prune(path, keep = Set(target))
        case Unknown => ()
      }
      // the sidecar rewrite changed its stat signature, so any memo
      // entry for this store misses naturally on the next ensure
      spark.read.parquet(target)
    }

  /** Merge-append a delta into the live generation — the shared
    * incremental-ingest protocol ([[Forecast.appendDayStats]]'s shape,
    * extracted): the WHOLE append runs under the build lock; the
    * sidecar must prove the live generation was built for `expectedFp`
    * (else the store is stale — rebuild, don't append); `postFp` is
    * evaluated under the lock AFTER the caller's invalidations and
    * must differ from the stored fp, so a delta whose files never
    * landed cannot stamp fresh-looking state; `merge(prev, delta)`
    * writes a NEW generation (live readers keep the previous one) and
    * prune keeps {new, prev}. With `uniqueKey` set, delta keys already
    * present in the live generation are refused loudly — for pure
    * per-row stores a key on both sides means the same rows were
    * appended twice and every downstream dedup would pair rows with
    * themselves.
    *
    * Only valid for stores whose rows are PURE functions of their own
    * input rows (media hashes, minhash/simhash/embedding-LSH
    * signatures): a store derived corpus-globally (IDF weights and the
    * signatures joined against them, hot-cell assignment masks) cannot
    * absorb a delta row-locally — its append IS the rebuild. (r16: the
    * IDF store now has a BOUNDED-staleness escape,
    * [[Dedup.appendSimhashIdf]] — delta signatures against the served
    * stale weights while corpus growth stays inside a quantified drift
    * bound, typed refusal beyond it.)
    *
    * DISCLOSED PRECONDITION (shared by every append API here,
    * [[Dedup.appendPostings]] included): the caller is the only agent
    * landing corpus files between its fingerprint snapshot and the
    * append — the single-ingest-writer contract of an ingest pipeline.
    * The stamped post-delta fingerprint hashes the WHOLE dir, so files
    * landed out-of-band in that window would be covered by the stamp
    * while their rows are absent from the merged store, and no refusal
    * can see it (a dir hash cannot prove which files a delta frame
    * came from; a writer-stamped manifest would — the same residual
    * the corpusFingerprint docstring discloses). */
  private[graft] def append(spark: SparkSession, what: String, path: String,
      expectedFp: Long, delta: DataFrame, postFp: () => Long,
      merge: (DataFrame, DataFrame) => DataFrame = _ unionByName _,
      uniqueKey: Option[String] = None): Unit = {
    withBuildLock(path) {
      val (storedFp, prevGen) = readSidecar(spark, what, path)
        .getOrElse(throw new IllegalStateException(
          s"$what sidecar at ${path}_model unreadable or pre-generation " +
            "layout — run the full ensure rebuild instead of appending " +
            "into an unproven generation"))
      if (storedFp != expectedFp) throw new StaleStoreRefusal(
        s"$what store at $path was built for a different corpus state " +
          s"(stored fp $storedFp != pre-delta fp $expectedFp): the store " +
          "is stale and must be rebuilt, not appended into")
      // the landed-delta refusal runs FIRST: it is a driver-side dir
      // listing, while the key probe and the merge evaluate the delta —
      // for media that is a decode pass, which a refused append must
      // not pay
      val newFp = postFp()
      if (newFp == storedFp) throw new DeltaNotLandedRefusal(
        s"corpus fingerprint unchanged after the delta (still $storedFp) — " +
          "land the delta files BEFORE appending, so the stamped " +
          "fingerprint proves the merged state")
      // one evaluation of the (possibly expensive) delta feeds BOTH the
      // key probe and the merge write
      val deltaOnce = delta.localCheckpoint(eager = false)
      val prev = spark.read.parquet(prevGen)
      uniqueKey.foreach { k =>
        // delta keys are few, but the checkpointed delta has no stats
        // (LogicalRDD defaults to unknown size), so auto-broadcast never
        // fires — hint it explicitly or the probe sort-merges, shuffling
        // the whole store on every append
        if (!prev.join(
            org.apache.spark.sql.functions.broadcast(
              deltaOnce.select(col(k)).distinct()), Seq(k)).isEmpty)
          throw new KeysAlreadyPresentRefusal(
            s"delta ${k}s already present in the generation at $prevGen — " +
              "the same rows were appended twice; rebuild instead")
      }
      val merged = merge(prev, deltaOnce)
      val newGen = newGenerationPath(path, newFp)
      merged.write.mode("overwrite").parquet(newGen)
      writeSidecar(spark, path, newFp, newGen)
      prune(path, keep = Set(newGen, prevGen))
    }
  }

  /** Delete everything under `path` except the directories in `keep`:
    * generations two or more rebuilds old (no plan handed out before the
    * previous rebuild can still be live across a later one without
    * having been re-ensured) and legacy flat-layout files. Local-fs
    * walk — the serving warehouse is node-local by design. Streams are
    * closed eagerly (each Files.list/walk holds a directory fd). */
  private[graft] def prune(path: String, keep: Set[String]): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root)) return
    val keepNames = keep.map(p => java.nio.file.Paths.get(p).getFileName.toString)
    import scala.jdk.CollectionConverters._
    val children = {
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.toList finally s.close()
    }
    children
      .filterNot(p => keepNames.contains(p.getFileName.toString))
      .foreach { p =>
        val toDelete = {
          val s = java.nio.file.Files.walk(p)
          try s.iterator().asScala.toList finally s.close()
        }
        toDelete.reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
      }
  }
}
