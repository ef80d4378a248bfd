package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prepared-plan cache for the serving surface ([[SparkEntry.queries]]).
  *
  * Building a query's DataFrame costs 10-45 ms of pure driver work per
  * call — plan assembly, serving-store sidecar reads, catalog existence
  * checks — paid on EVERY invocation although the result is a function
  * of (corpus state, query) only. That is the classic prepared-statement
  * problem, and this is the classic answer: memoize the built DataFrame
  * per (session, query, corpus dir), guarded by a corpus STAMP (name /
  * length / mtime fold over the dir's parquet payload — the same
  * driver-side listing the scan planner does, ~0.1 ms). A corpus swap
  * changes the stamp and misses; a stopped session's entries are
  * weakly held and collectable (the [[Tables]] discipline).
  *
  * What this does NOT skip: analysis/optimization of the action tree,
  * codegen, and execution — an action on the memoized frame replans and
  * re-executes in full; only CONSTRUCTION is cached. Serving-store
  * generations are fingerprint-keyed by the same corpus bytes this
  * stamp covers, so a memoized plan can only go stale through an
  * in-place store maintenance op (compaction rewrites live paths under
  * an unchanged corpus); those sites call [[invalidate]] — and the
  * exposure is loud (FileNotFound), never wrong data, the documented
  * reader-vs-compact contract. */
object PlanCache {
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), (Long, DataFrame)]]())

  /** Fold (name, length, mtime) over the dir's parquet payload — one
    * driver-side listing, one level deep into table directories. */
  private[graft] def dirStamp(dir: String): Long = {
    def fold(h0: Long, f: java.io.File): Long = {
      val h = ((h0 * 31 + f.getName.hashCode) * 31 + f.length()) * 31 + f.lastModified()
      if (f.isDirectory) {
        val c = f.listFiles()
        if (c == null) h else c.sortBy(_.getName).foldLeft(h)(fold)
      } else h
    }
    val root = new java.io.File(dir)
    val files = Option(root.listFiles()).getOrElse(Array.empty)
    files.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .foldLeft(1125899906842597L)(fold)
  }

  def cached(name: String,
      f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => {
      val perSession = memo.synchronized {
        var m = memo.get(spark)
        if (m == null) {
          m = scala.collection.concurrent.TrieMap.empty[(String, String), (Long, DataFrame)]
          memo.put(spark, m)
        }
        m
      }
      val stamp = dirStamp(dir)
      perSession.get((name, dir)) match {
        case Some((s, df)) if s == stamp => df
        case _ =>
          // a stamp miss proves the corpus files changed: the rebuild
          // must not read through table plans pinned to the old
          // listing (in ANY session — the constructor may build in an
          // interactive-lane child)
          Tables.invalidateDir(dir)
          val df = f(spark, dir)
          perSession.put((name, dir), (stamp, df))
          df
      }
    }

  /** Drop every memoized plan — called by in-place store maintenance
    * (compaction, forced rebuilds) whose live-path rewrites a
    * corpus-stamp guard cannot see. */
  def invalidate(): Unit = {
    memo.synchronized {
      val it = memo.values().iterator()
      while (it.hasNext) it.next().clear()
    }
  }
}
