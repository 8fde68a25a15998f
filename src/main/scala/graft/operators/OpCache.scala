package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** Scoped lifecycle for caches created INSIDE operators.
  *
  * The dedup/similarity family caches heavy intermediates (shingle-hash
  * frames, LSH-keyed vectors) because several plan branches consume them and
  * recomputing the md5/dot-product pipelines per branch multiplies the scan
  * cost. Those caches outlive the operator call: a DataFrame is lazy, so the
  * operator cannot unpersist before the caller's terminal action without
  * un-caching its own result.
  *
  * Contract:
  *   - Called OUTSIDE any scope, [[cache]] is a plain `.cache()` — the frame
  *     persists for the session until LRU eviction (fine for one-shot jobs
  *     like Verify/Bench runs, which wrap each query in a scope anyway).
  *   - A long-lived session wraps the operator call AND its terminal action
  *     in `OpCache.scoped { ... }`: every frame cached inside the body is
  *     unpersisted (blocking) on exit, success or failure.
  *   - A result DataFrame evaluated AFTER its scope exits is still correct —
  *     it silently recomputes the uncached lineage ([[checkpoint]]ed frames
  *     excepted: their lineage is truncated, so they must be consumed inside
  *     the scope, the same rule every localCheckpoint in the repo follows).
  *
  * Scopes are per-thread (thread-local stack), so concurrent queries in one
  * SparkSession release only their own caches. Nested scopes release
  * innermost-first.
  */
object OpCache {
  private val scopes = new ThreadLocal[List[ArrayBuffer[() => Unit]]] {
    override def initialValue(): List[ArrayBuffer[() => Unit]] = Nil
  }

  private def register(release: () => Unit): Unit =
    scopes.get() match {
      case head :: _ => head.synchronized { head += release; () }
      case Nil       =>
    }

  /** Cache `df` and, when a [[scoped]] body is active on this thread,
    * register it for release when that scope exits. Registration is
    * synchronized on the scope buffer: [[Par.run]] shares the caller's
    * scope across worker threads, so concurrent branches may register
    * into one buffer.
    */
  def cache(df: DataFrame): DataFrame = {
    val cached = df.cache()
    register(() => { cached.unpersist(blocking = true); () })
    cached
  }

  /** EAGER localCheckpoint with scope-released blocks — for the frames
    * composed pipelines re-join many times (a funnel's per-stage id
    * sets): a `cache()` truncates RE-COMPUTATION but the cached plan's
    * full lineage still rides every consumer through analysis (cache
    * substitution happens after), so a k-stage composition re-analyzes
    * O(k²) lineage; a localCheckpoint truncates the PLAN itself to an
    * RDD-scan leaf. Blocks release when the scope exits (Spark has no
    * public unpersist for checkpointed Datasets — [[Checkpoints]]'
    * registry diff is reused, inheriting its no-concurrent-persist
    * requirement: call this from single-threaded driver code only,
    * never from [[Par]] branches).
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val (cp, release) = Checkpoints.releasable(df)
    register(release)
    cp
  }

  /** Run `body` on a WORKER thread under the scope stack captured from
    * the spawning thread ([[Par.run]]'s bridge): frames the body caches
    * release when the PARENT scope exits, exactly as if the body had run
    * inline. Restores the worker's own stack afterwards (pool threads
    * are reused).
    */
  private[operators] def withScopesOf[T](
      captured: List[ArrayBuffer[() => Unit]])(body: => T): T = {
    val own = scopes.get()
    scopes.set(captured)
    try body finally scopes.set(own)
  }

  private[operators] def capturedScopes: List[ArrayBuffer[() => Unit]] =
    scopes.get()

  /** Run `body`; unpersist (blocking) every frame cached via [[cache]]
    * during it, even on exception. The body must include the terminal
    * action — frames evaluated after exit recompute without the cache.
    */
  def scoped[T](body: => T): T = {
    val buf = ArrayBuffer[() => Unit]()
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.apply())
    }
  }
}
