package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The shared lock protocol (graft.util.DirLock) under contention:
  * the whole point is read-modify-write without lost updates, so
  * hammer exactly that — many threads incrementing a counter file —
  * plus the crashed-holder recovery path.
  */
class DirLockSpec extends AnyFunSuite {

  test("contended read-modify-write loses no updates") {
    val dir = Files.createTempDirectory("graft-dirlock")
    val lock = dir.resolve("x.lock")
    val counter = dir.resolve("counter")
    Files.writeString(counter, "0")
    val threads = 8
    val perThread = 25
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val errs = new java.util.concurrent.atomic.AtomicInteger
    (0 until threads).map { _ =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try (0 until perThread).foreach { _ =>
            graft.util.DirLock.withLock(lock) {
              val v = Files.readString(counter).trim.toInt
              Files.writeString(counter, (v + 1).toString)
              ()
            }
          } catch { case _: Throwable => errs.incrementAndGet(); () }
      })
    }.foreach(_.get())
    pool.shutdown()
    assert(errs.get() == 0)
    assert(Files.readString(counter).trim.toInt == threads * perThread,
      "a lost update means two holders overlapped")
    assert(!Files.exists(lock), "the lock must release")
  }

  test("a crashed holder's stale lock is broken, not waited on forever") {
    val dir = Files.createTempDirectory("graft-dirlock-stale")
    val lock = dir.resolve("y.lock")
    // simulate a crashed holder: lock dir + token, aged past staleMs
    Files.createDirectory(lock)
    Files.writeString(lock.resolve("owner"), "dead-holder")
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000))
    var ran = false
    graft.util.DirLock.withLock(lock, staleMs = 1000) { ran = true }
    assert(ran, "the stale lock must break and admit the waiter")
    assert(!Files.exists(lock))
    // the moved-aside corpse is cleaned up (no .broken-* accumulation)
    import scala.jdk.CollectionConverters._
    val leftovers = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.contains(".broken-")).toSeq
    assert(leftovers.isEmpty, s"corpse leaked: $leftovers")
  }

  test("abandoned corpse dirs are swept on acquire; young ones survive") {
    val dir = Files.createTempDirectory("graft-dirlock-sweep")
    val lock = dir.resolve("z.lock")
    // strand two OLD corpses as a swallowed failure path would — one
    // holding an unexpected extra entry (the two-file-only delete
    // used to no-op on exactly this shape)
    val old1 = dir.resolve("z.lock.broken-dead0001")
    val old2 = dir.resolve("z.lock.rel-dead0002")
    Seq(old1, old2).foreach { c =>
      Files.createDirectory(c)
      Files.writeString(c.resolve("owner"), "gone")
    }
    Files.writeString(old1.resolve("surprise"), "extra entry")
    val past = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 60000)
    Seq(old1, old2).foreach(Files.setLastModifiedTime(_, past))
    // a YOUNG corpse may be a releaser mid-verify about to restore
    // it — the sweep must leave it alone
    val young = dir.resolve("z.lock.rel-live0003")
    Files.createDirectory(young)
    Files.writeString(young.resolve("owner"), "in-flight")
    // an unrelated sibling never matches the corpse prefix
    val other = dir.resolve("other.lock.broken-xyz")
    Files.createDirectory(other)
    graft.util.DirLock.withLock(lock, staleMs = 1000) { () }
    import scala.jdk.CollectionConverters._
    val names = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(!names.contains(old1.getFileName.toString) &&
      !names.contains(old2.getFileName.toString),
      s"stale corpses must be swept: $names")
    assert(names.contains(young.getFileName.toString),
      "a young corpse may be mid-restore and must survive")
    assert(names.contains(other.getFileName.toString),
      "unrelated siblings are not the sweep's business")
  }
}
