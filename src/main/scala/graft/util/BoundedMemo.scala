package graft.util

import java.util.concurrent.{ExecutionException, FutureTask}

/** Get-or-build memo with an LRU bound — the shape every
  * build-once-per-corpus cache in the engine needs (near-dup pair
  * tables, ANN indexes): repeated contract-query invocations share one
  * expensive materialization, and roaming across corpora releases the
  * eldest entry's resources via `onEvict` (typically unpersist)
  * instead of accumulating cache entries for the session lifetime.
  *
  * Same-key callers build once (the first one runs the build, the rest
  * block on its FutureTask), but DISTINCT keys build concurrently: the
  * map lock is held only to install/look up the task, never across the
  * multi-second Spark materialization — two HTTP requests touching
  * different corpora no longer serialize behind one global monitor.
  * A failed build is uncached before rethrowing, so later callers
  * retry instead of inheriting the failure forever.
  */
final class BoundedMemo[K, V <: AnyRef](max: Int, onEvict: V => Unit) {

  private final class Cell(build: () => V) {
    val task = new FutureTask[V](() => build())
    // set under the map lock if the LRU evicts this cell mid-build;
    // the builder releases the value itself once it completes
    @volatile var evictedWhileBuilding = false
  }

  private val m = new java.util.LinkedHashMap[K, Cell](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Cell]): Boolean =
      if (size > max) { release(e.getValue); true } else false
  }

  private def release(c: Cell): Unit =
    if (c.task.isDone) {
      // a failed build holds no resources to release
      try onEvict(c.task.get()) catch { case _: ExecutionException => () }
    } else c.evictedWhileBuilding = true

  def getOrBuild(k: K)(build: => V): V = {
    var mine: Cell = null
    val cell = m.synchronized {
      val hit = m.get(k)
      if (hit != null) hit
      else {
        mine = new Cell(() => build)
        m.put(k, mine)
        mine
      }
    }
    if (mine != null) mine.task.run() // outside the lock: distinct keys overlap
    val v =
      try cell.task.get()
      catch {
        case e: ExecutionException =>
          m.synchronized { if (m.get(k) eq cell) { m.remove(k); () } }
          throw e.getCause
      }
    // evicted before the build finished: nobody else will release it
    if (mine != null && mine.evictedWhileBuilding) onEvict(v)
    v
  }
}
