package graft.ops

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Thread-local registry of persisted intermediates, giving long-running
  * drivers a bounded-cache contract: operators persist through
  * [[persistTracked]], and the query driver (the gateway's
  * `Engine.executeQuery`, `Verify`'s per-query loop) calls
  * [[releaseCurrent]] once the result is fully materialized. Without
  * this, correctness persists (GlobalRank's pinned range partitioning)
  * and cost persists (lshTuningCard's materialized pair sides)
  * accumulate blocks on the SHARED
  * block manager for the lifetime of the SparkContext — per-request
  * `newSession()` isolates conf and catalog, not storage.
  *
  * Thread-local because DataFrame construction and its consuming action
  * run on the same driver thread per request/query; a global registry
  * would let one request unpersist a concurrent request's pinned
  * partitioning MID-JOB, which for GlobalRank is a correctness persist
  * (two independent range exchanges may sample different boundaries).
  * For the same reason callers must release only AFTER the final
  * consuming action — a released GlobalRank relation must not be
  * re-collected.
  *
  * Tests that never call [[releaseCurrent]] see exactly the old
  * behavior; `Bench` keeps its coarser `spark.catalog.clearCache()`
  * between runs (which also covers these entries).
  */
object CacheScope {
  private val tracked = new ThreadLocal[java.util.ArrayDeque[DataFrame]] {
    override def initialValue(): java.util.ArrayDeque[DataFrame] =
      new java.util.ArrayDeque[DataFrame]()
  }

  /** Explicit release handle for cross-thread drivers (futures / thread
    * pools): the CONSTRUCTING thread captures [[currentToken]] after
    * building its DataFrames and hands the token to whichever thread
    * owns the consuming action; that thread calls [[Token.release]]
    * after the final action. Without a token, a deque populated on a
    * pool thread that never calls [[releaseCurrent]] would retain its
    * persisted plan trees forever — silently restoring the
    * unbounded-cache behavior this class exists to fix.
    */
  final class Token private[CacheScope] (
      q: java.util.ArrayDeque[DataFrame]) {
    /** Unpersist (non-blocking) everything currently registered on the
      * capturing thread's deque — including entries pushed after the
      * capture (the token aliases the thread's registry, it does not
      * snapshot it). Safe to call from any thread, and safe to call
      * more than once.
      */
    def release(): Unit = drain(q)
  }

  /** Capture a release token aliasing the CURRENT thread's registry:
    * whatever that thread has tracked — or goes on to track — is
    * released by `token.release()` from any thread. See [[Token]].
    */
  def currentToken(): Token = new Token(tracked.get())

  /** Persist `df` and register it for release by the current thread's
    * query driver. Returns `df` for chaining.
    *
    * CONTRACT: registration is per-thread — the thread that constructs
    * the DataFrame (and thus runs this call) is the one whose
    * [[releaseCurrent]] drains it. A driver that constructs on one
    * thread and consumes on another (futures, thread pools) must either
    * release on the constructing thread after the action completes, or
    * capture [[currentToken]] on the constructing thread and call
    * `token.release()` wherever the action finishes; otherwise the
    * constructing thread's deque retains the persisted plan trees
    * indefinitely.
    */
  def persistTracked(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    val q = tracked.get()
    q.synchronized { q.push(df) }
    df
  }

  /** Unpersist (non-blocking) everything the current thread tracked
    * since its last release. Safe to call when nothing is tracked.
    */
  def releaseCurrent(): Unit = drain(tracked.get())

  private def drain(q: java.util.ArrayDeque[DataFrame]): Unit = {
    while (true) {
      val df = q.synchronized {
        if (q.isEmpty) null else q.pop()
      }
      if (df == null) return
      try df.unpersist(false)
      catch { case NonFatal(_) => () }
    }
  }
}
