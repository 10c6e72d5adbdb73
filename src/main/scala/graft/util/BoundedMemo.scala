package graft.util

/** Synchronized get-or-build memo with an LRU bound — the shape every
  * build-once-per-corpus cache in the engine needs (near-dup pair
  * tables, ANN indexes): repeated contract-query invocations share one
  * expensive materialization, and roaming across corpora releases the
  * eldest entry's resources via `onEvict` (typically unpersist)
  * instead of accumulating cache entries for the session lifetime.
  * Builds run inside the lock: two concurrent callers of the same key
  * must not both pay the materialization.
  */
final class BoundedMemo[K, V <: AnyRef](max: Int, onEvict: V => Unit) {
  private val m = new java.util.LinkedHashMap[K, V](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      if (size > max) { onEvict(e.getValue); true } else false
  }

  def getOrBuild(k: K)(build: => V): V = m.synchronized {
    val hit = m.get(k)
    if (hit != null) hit
    else { val v = build; m.put(k, v); v }
  }
}
