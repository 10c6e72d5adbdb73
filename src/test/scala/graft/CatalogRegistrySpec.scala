package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.service.CatalogRegistry

/** The registry's durability contract without a SparkSession in the
  * loop: ordering, redefinition-moves-to-end, unregister-shrinks-file,
  * and — the active-active case — two REGISTRY INSTANCES on one
  * directory (two service processes) interleaving writes without
  * erasing each other (each mutation re-loads under the mkdir lock
  * before writing back; a stale whole-file snapshot can't clobber).
  */
class CatalogRegistrySpec extends AnyFunSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-reg-spec")

  test("definitions survive a new instance, in last-defined order") {
    val d = tmp()
    val r1 = new CatalogRegistry(Some(d))
    r1.recordSource("a", "parquet", "/p/a", Map("k" -> "v"))
    r1.recordView("b", "SELECT * FROM a")
    r1.recordSource("a", "csv", "/p/a2", Map.empty) // redefinition → end
    val r2 = new CatalogRegistry(Some(d))
    var seen = Vector.empty[(String, String)]
    r2.replay { e => seen :+= (e.name, e.kind); true }
    assert(seen == Vector(("b", "view"), ("a", "source")))
    var fmt = ""
    r2.replay { e => if (e.name == "a") fmt = e.format; true }
    assert(fmt == "csv", "latest definition wins")
  }

  test("remove shrinks the file; nothing resurrects") {
    val d = tmp()
    val r1 = new CatalogRegistry(Some(d))
    r1.recordSource("keep", "parquet", "/p/k", Map.empty)
    r1.recordView("drop_me", "SELECT 1")
    assert(r1.remove("drop_me"))
    assert(!r1.remove("drop_me"), "second remove reports absence")
    val r2 = new CatalogRegistry(Some(d))
    var names = Set.empty[String]
    r2.replay { e => names += e.name; true }
    assert(names == Set("keep"))
  }

  test("two instances on one directory interleave writes without loss") {
    val d = tmp()
    val a = new CatalogRegistry(Some(d))
    val b = new CatalogRegistry(Some(d))
    // two service processes registering concurrently: every name must
    // survive — whole-file last-write-wins would drop roughly half
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      val reg = if (t % 2 == 0) a else b
      new Thread(() =>
        try (0 until 25).foreach(i =>
          reg.recordSource(s"t${t}_n$i", "parquet", s"/p/$t/$i", Map.empty))
        catch { case e: Throwable => errs.add(e); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
    val fresh = new CatalogRegistry(Some(d))
    var n = 0
    fresh.replay { _ => n += 1; true }
    assert(n == 100, s"expected all 100 interleaved definitions, found $n")
    // and no lock left behind
    assert(!java.nio.file.Files.exists(d.resolve("_catalog.lock")))
  }

  test("a crashed holder's stale lock is broken, not fatal") {
    val d = tmp()
    java.nio.file.Files.createDirectory(d.resolve("_catalog.lock"))
    java.nio.file.Files.setLastModifiedTime(d.resolve("_catalog.lock"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000))
    val r = new CatalogRegistry(Some(d))
    r.recordSource("after_crash", "parquet", "/p/x", Map.empty) // must not hang
    var names = Set.empty[String]
    new CatalogRegistry(Some(d)).replay { e => names += e.name; true }
    assert(names == Set("after_crash"))
  }
}
