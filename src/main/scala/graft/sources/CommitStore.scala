package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path}

/** The ONE storage primitive the versioned-table log's correctness
  * rests on: atomic put-if-absent of a version manifest. Every other
  * write in the format (data files, sidecars, checkpoints, advisory
  * pointers) is a plain write whose visibility the manifest gates;
  * only the claim decides OCC winners — so it is the one place the
  * 100 TB story must not silently assume POSIX rename semantics,
  * which object stores don't give.
  *
  * Implementations:
  *
  *  - [[CommitStore.AtomicRename]] — POSIX filesystems (the default):
  *    link(2) fails EEXIST atomically; filesystems without hard links
  *    fall back to a mkdir(2) claim directory. This is the
  *    historically-inlined behavior, extracted verbatim.
  *  - [[CommitStore.ConditionalPut]] — the object-store shape: ONE
  *    conditional write (S3 `If-None-Match: *`, GCS
  *    `ifGenerationMatch=0`, Azure Blob `If-None-Match: *`). No tmp
  *    file, no rename, no claim marker — the store's server-side
  *    precondition IS the atomicity. The sandbox has no object store,
  *    so [[CommitStore.simulatedConditionalPut]] supplies the
  *    precondition (serialize + exists-check + write) for the spec's
  *    OCC races; a real deployment plugs the SDK call into the same
  *    function slot.
  */
trait CommitStore {

  /** Publish `bytes` at `target` if and only if no writer has claimed
    * it. Throws `java.util.ConcurrentModificationException` when the
    * target is (or is being) claimed by another writer — `what`
    * describes the contested resource for that message (e.g.
    * "version 7 of /data/t") — and lets any real I/O failure
    * propagate untranslated.
    */
  def putIfAbsent(target: Path, bytes: Array[Byte], what: String): Unit
}

object CommitStore {

  private def conflict(what: String, cause: Throwable = null) =
    new java.util.ConcurrentModificationException(
      s"commit conflict: $what was claimed by another writer", cause)

  /** POSIX put-if-absent: write a same-directory temp file, then
    * link(2) it to the final name — link fails EEXIST atomically. On
    * filesystems without hard links (`linkless` also forces this
    * under test) the claim is a mkdir(2) directory, atomic on every
    * POSIX filesystem. (A verify-after-rename scheme can only DETECT
    * some lost commits — two racers can both rename and both re-read
    * their own bytes; a claim must be an atomic put-if-absent.) The
    * claim dir serializes the window before the manifest exists; once
    * it does, late arrivals fail the existence check. A writer that
    * crashes mid-claim leaves a stale .claim dir blocking its
    * version — surfaced in the conflict message for recovery, the
    * standard lock-dir trade-off.
    */
  final class AtomicRename(linkless: () => Boolean) extends CommitStore {
    override def putIfAbsent(target: Path, bytes: Array[Byte], what: String): Unit = {
      val tmp = target.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, bytes)
      try {
        try {
          if (linkless()) throw new UnsupportedOperationException("test-forced")
          Files.createLink(target, tmp) // link(2): fails EEXIST atomically
        } catch {
          case _: UnsupportedOperationException =>
            val claim = target.resolveSibling(
              target.getFileName.toString.stripSuffix(".json") + ".claim")
            try Files.createDirectory(claim)
            catch {
              case e: FileAlreadyExistsException =>
                throw new java.util.ConcurrentModificationException(
                  s"commit conflict: $what is being claimed by another " +
                    s"writer (if that writer crashed, remove $claim to recover)", e)
            }
            try {
              if (Files.exists(target)) throw conflict(what)
              Files.move(tmp, target)
            } finally { Files.deleteIfExists(claim); () }
        }
      } catch {
        case e: FileAlreadyExistsException => throw conflict(what, e)
      } finally Files.deleteIfExists(tmp)
    }
  }

  /** Object-store put-if-absent: `put` performs ONE conditional write
    * and reports whether the precondition held — the S3/GCS/Azure
    * "create only if nothing is there" call. A false return is a lost
    * race; exceptions from `put` propagate untranslated (they are I/O
    * failures, not conflicts — a caller must not retry a commit whose
    * durability is unknown as if it had cleanly lost).
    */
  final class ConditionalPut(put: (Path, Array[Byte]) => Boolean) extends CommitStore {
    override def putIfAbsent(target: Path, bytes: Array[Byte], what: String): Unit =
      if (!put(target, bytes)) throw conflict(what)
  }

  /** A simulated object store for tests and single-process dev: the
    * server-side `If-None-Match: *` semantics — serialize, existence
    * check, write. The claim DECISION uses no rename/link/mkdir (the
    * spec's OCC races run through exactly the code path a real
    * conditional-put deployment would, minus the HTTP); the write
    * itself lands via tmp + atomic move because a real store's PUT is
    * atomic to READERS too — a plain create+truncate at the final
    * path would let a concurrent reader observe a torn manifest, a
    * state no real backend (or the AtomicRename store) can expose.
    */
  def simulatedConditionalPut(): ConditionalPut = {
    val lock = new Object
    new ConditionalPut((target, bytes) =>
      lock.synchronized {
        if (Files.exists(target)) false
        else {
          val tmp = target.resolveSibling(
            s".put-${java.util.UUID.randomUUID()}")
          Files.write(tmp, bytes)
          try Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.AtomicMoveNotSupportedException =>
              Files.move(tmp, target)
          }
          true
        }
      })
  }
}
