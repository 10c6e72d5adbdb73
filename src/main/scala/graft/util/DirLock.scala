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
  *
  * Unlock verifies OWNERSHIP with the same rename-then-verify
  * discipline: each holder stamps a token file inside its lock dir;
  * release atomically renames the dir aside, checks the moved
  * instance's token, and either deletes it (its own) or renames it
  * straight back (a successor's — the holder was stale-broken while
  * paused). Without this, a holder whose critical section outlives
  * `staleMs` (GC pause, slow storage) would — via a bare finally
  * delete — remove the lock a stale-breaker has since created,
  * re-opening the lost-update window for a THIRD writer. The slow
  * holder itself still overlaps the breaker (the stale-break's
  * documented trade-off against crashed holders); the rename-verify
  * release bounds any residual theft to the restore gap instead of a
  * whole critical section.
  */
object DirLock {

  private val TokenFile = "owner"

  def withLock[T](lock: Path, staleMs: Long = 10000L)(body: => T): T = {
    val token = java.util.UUID.randomUUID().toString
    sweepCorpses(lock, staleMs)
    acquire(lock, staleMs, token)
    try body
    finally release(lock, token)
  }

  /** Best-effort sweep of abandoned corpse dirs: the mid-break /
    * mid-release failure paths below deliberately swallow errors (a
    * lost race is not the caller's problem), which can strand
    * `.broken-*` / `.rel-*` dirs — without this, they'd accumulate
    * unboundedly next to correctness-bearing locations like
    * `_graft_log`. Each acquire clears siblings older than `staleMs`;
    * the age gate exists for the same reason the stale-break's does —
    * a YOUNG corpse may belong to a breaker or releaser mid-verify,
    * about to restore it. (Sweeping a corpse a >staleMs-paused
    * releaser was about to restore re-opens the same bounded overlap
    * the stale-break itself documents; nothing new is traded away.)
    */
  private def sweepCorpses(lock: Path, staleMs: Long): Unit =
    try {
      val parent = lock.getParent
      if (parent == null || !Files.isDirectory(parent)) return
      val name = lock.getFileName.toString
      val s = Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach { p =>
          val n = p.getFileName.toString
          val isCorpse =
            n.startsWith(s"$name.broken-") || n.startsWith(s"$name.rel-")
          val stale = isCorpse &&
            (try System.currentTimeMillis() -
              Files.getLastModifiedTime(p).toMillis > staleMs
            catch { case scala.util.control.NonFatal(_) => false })
          if (stale)
            try deleteCorpse(p)
            catch { case scala.util.control.NonFatal(_) => () }
        }
      } finally s.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  private def release(lock: Path, token: String): Unit =
    try {
      // rename-THEN-verify, the same discipline as the stale-break: a
      // read-check-delete sequence could pause between check and
      // delete (the very GC/slow-storage pause that triggers breaks)
      // and delete a SUCCESSOR's live lock. rename(2) is atomic, so
      // exactly one mover wins; verifying the token on the MOVED
      // instance and restoring a stolen live lock bounds the damage
      // to the restore gap instead of a full critical section.
      val corpse = lock.resolveSibling(
        s"${lock.getFileName}.rel-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.move(lock, corpse)
      val owned =
        try new String(Files.readAllBytes(corpse.resolve(TokenFile)),
          java.nio.charset.StandardCharsets.UTF_8) == token
        catch { case scala.util.control.NonFatal(_) => false }
      if (owned) deleteCorpse(corpse)
      else Files.move(corpse, lock) // a successor's lock — hand it back
      ()
    } catch {
      // lock renamed away by a stale-breaker, or already superseded:
      // not ours to delete
      case scala.util.control.NonFatal(_) => ()
    }

  private def deleteCorpse(corpse: Path): Unit = {
    // recursive: a corpse holding anything beyond the token file must
    // still go — a two-file-only delete would silently no-op on it
    // and strand the dir forever
    def rec(p: Path): Unit = {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.foreach(rec)
        } finally s.close()
      }
      Files.deleteIfExists(p)
      ()
    }
    rec(corpse)
  }

  private def acquire(lock: Path, staleMs: Long, token: String): Unit = {
    val deadline = System.currentTimeMillis() + staleMs + 5000
    while (true) {
      var acquired = false
      try { Files.createDirectory(lock); acquired = true }
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      if (acquired) {
        // stamp ownership; a breaker renaming our fresh dir away in
        // this gap (only possible under extreme clock skew) surfaces
        // as NoSuchFile — re-loop rather than proceed unlocked
        try { Files.write(lock.resolve(TokenFile),
          token.getBytes(java.nio.charset.StandardCharsets.UTF_8)); return }
        catch { case scala.util.control.NonFatal(_) => () }
      } else {
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
            if (corpseAge > staleMs) deleteCorpse(corpse)
            else Files.move(corpse, lock) // stole a live lock — restore it
          } catch { case scala.util.control.NonFatal(_) => () } // lost the break race
        } else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(s"lock held too long: $lock")
        else Thread.sleep(25)
      }
    }
  }
}
