package graft.util

import java.nio.file.{Files, Path}

/** Cross-process mkdir(2) lock with an ATOMIC stale-break — extracted
  * from the catalog registry's mutate() so every config
  * read-modify-write (registry entries, table CHECK constraints)
  * shares one proven protocol instead of re-deriving the TOCTOU
  * subtleties.
  *
  * mkdir fails EEXIST atomically on every POSIX filesystem, so
  * exactly one process holds the lock. A holder that crashed leaves
  * the dir behind; a waiter that judges it stale (older than
  * `staleMs`) breaks it by RENAMING it aside — a bare delete is a
  * TOCTOU: two waiters both judge stale, the slower one's delete
  * removes the faster one's freshly created lock, and both enter the
  * critical section. rename(2) is atomic, so exactly one breaker wins
  * the move; it then re-verifies the MOVED instance's age (the path
  * may have been re-claimed between the staleness check and the move)
  * and hands a live lock straight back if it stole one.
  */
object DirLock {

  def withLock[T](lock: Path, staleMs: Long = 10000L)(body: => T): T = {
    acquire(lock, staleMs)
    try body
    finally { Files.deleteIfExists(lock); () }
  }

  private def acquire(lock: Path, staleMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + staleMs + 5000
    while (true) {
      try { Files.createDirectory(lock); return }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        val age =
          try System.currentTimeMillis() -
            Files.getLastModifiedTime(lock).toMillis
          catch { case scala.util.control.NonFatal(_) => 0L } // raced away
        if (age > staleMs) {
          val corpse = lock.resolveSibling(
            s"${lock.getFileName}.broken-${java.util.UUID.randomUUID().toString.take(8)}")
          try {
            Files.move(lock, corpse)
            val corpseAge = System.currentTimeMillis() -
              Files.getLastModifiedTime(corpse).toMillis
            if (corpseAge > staleMs) Files.deleteIfExists(corpse)
            else Files.move(corpse, lock) // stole a live lock — restore it
          } catch { case scala.util.control.NonFatal(_) => () } // lost the break race
        } else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(s"lock held too long: $lock")
        else Thread.sleep(25)
      }
    }
  }
}
