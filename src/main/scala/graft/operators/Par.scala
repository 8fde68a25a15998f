package graft.operators

/** Overlap INDEPENDENT eager sub-pipelines of one query (the guide's
  * §2.6 discipline: Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because driver
  * code calls them sequentially). The multimodal gates build three
  * fully-independent pipelines (separate corpora, separate state dirs,
  * separate closures) whose work is EAGER — iterative CC loops,
  * staged-publish writes, bounded collects — so building them one after
  * another serializes dozens of small jobs that could back-fill each
  * other's stage tails. Running them from a small thread pool leaves
  * every per-branch plan, and therefore every result, bit-identical:
  * only the driver-side call order changes.
  *
  * Scope bridging: [[OpCache]] scopes are thread-local, so a branch
  * spawned on a pool thread would otherwise leak its caches past the
  * caller's `OpCache.scoped`. Each branch here runs under the SPAWNING
  * thread's captured scope stack (registration is synchronized), making
  * `Par.run` transparent to the cache-lifecycle contract.
  *
  * Failure contract: first branch exception propagates (after all
  * branches settle — no half-running branch escapes the call); results
  * return in argument order regardless of completion order.
  */
object Par {

  /** Two-lane pipeline over `n` sequential steps: `produce(i)` runs on
    * the calling thread in step order; `consume(i, produced(i))` runs on
    * a background lane, also in step order, OVERLAPPING `produce(i+1)`.
    * The incremental-index gates have exactly this dependence shape:
    * day k's cluster-state fold needs day k's frozen ledger and fold
    * k−1, but NOT append k+1 — so the fold lane hides behind the append
    * lane instead of serializing with it. Both lanes stay internally
    * ordered, so every publish and state write happens in the same
    * order with the same content as the sequential loop.
    */
  def pipeline2[A](n: Int)(produce: Int => A)(consume: (Int, A) => Unit): Unit = {
    val captured = OpCache.capturedScopes
    @volatile var failure: Throwable = null
    var lane: Thread = null
    def drainLane(): Unit = {
      if (lane != null) lane.join()
      if (failure != null) throw failure
    }
    try {
      (0 until n).foreach { i =>
        val a = produce(i)
        drainLane() // fold order: consume(i-1) completes before consume(i)
        val t = new Thread(() => {
          try OpCache.withScopesOf(captured)(consume(i, a))
          catch { case e: Throwable => failure = e }
        }, s"graft-pipe-$i")
        t.setDaemon(true)
        t.start()
        lane = t
      }
      drainLane()
    } catch {
      case e: Throwable =>
        if (lane != null) lane.join() // never leave a lane running
        throw e
    }
  }

  def run[T](branches: Seq[() => T]): Seq[T] = {
    require(branches.nonEmpty, "no branches to run")
    if (branches.size == 1) return Seq(branches.head())
    val captured = OpCache.capturedScopes
    val results =
      new java.util.concurrent.ConcurrentHashMap[Int, Either[Throwable, T]]()
    val threads = branches.zipWithIndex.map { case (b, i) =>
      val t = new Thread(() => {
        results.put(i,
          try Right(OpCache.withScopesOf(captured)(b()))
          catch { case e: Throwable => Left(e) })
        ()
      }, s"graft-par-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    branches.indices.map(i => results.get(i) match {
      case Right(v) => v
      case Left(e)  => throw e
      case null     => throw new IllegalStateException(s"branch $i vanished")
    })
  }
}
