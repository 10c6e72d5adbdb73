package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.BoundedMemo

class BoundedMemoSpec extends AnyFunSuite {

  test("builds once per key and returns the cached value after") {
    var builds = 0
    val m = new BoundedMemo[Int, String](2, _ => ())
    assert(m.getOrBuild(1) { builds += 1; "a" } == "a")
    assert(m.getOrBuild(1) { builds += 1; "never" } == "a")
    assert(builds == 1)
  }

  test("evicts least-recently-used beyond the bound and releases it") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new BoundedMemo[Int, String](2, evicted += _)
    m.getOrBuild(1)("a"); m.getOrBuild(2)("b")
    m.getOrBuild(1)("a2") // touch 1 → 2 becomes eldest
    m.getOrBuild(3)("c")  // bound exceeded → evict 2
    assert(evicted.toSeq == Seq("b"))
    // 1 survived the eviction (access order, not insertion order)
    var rebuilt = false
    m.getOrBuild(1) { rebuilt = true; "a3" }
    assert(!rebuilt)
  }

  test("a build failure does not poison the key") {
    val m = new BoundedMemo[Int, String](2, _ => ())
    intercept[RuntimeException] {
      m.getOrBuild(9) { throw new RuntimeException("boom") }
    }
    assert(m.getOrBuild(9)("ok") == "ok")
  }
}
