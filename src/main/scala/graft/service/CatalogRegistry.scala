package graft.service

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper

/** Durable catalog definitions for [[QueryService]] — the piece that
  * makes the service a STANDING service: `_catalog.json` under the
  * registry directory holds one entry per registered name (source
  * format/path/options, or a submitted view's SQL), ordered by last
  * (re)definition, and a restarting service replays it before taking
  * traffic. Definitions only, never data: a replayed source re-reads
  * its path lazily, a replayed view re-plans its SQL.
  *
  * Write discipline mirrors the vtable manifest: serialize the whole
  * (small — one JSON object per name) registry to a temp file and
  * ATOMIC_MOVE it over `_catalog.json`, so a crash mid-write leaves
  * the previous intact version, never a torn file. Redefining a name
  * moves its entry to the END, preserving the invariant that an entry
  * only ever references names defined before it (the order they were
  * last defined in is an order that worked).
  *
  * Concurrent WRITERS (two services on one registryDir) are safe:
  * every mutation takes a mkdir(2) lock — the same atomic
  * put-if-absent the vtable commit claim uses — RE-LOADS the file
  * under it, applies the one-name op, and writes back, so writer A's
  * registration can never be erased by writer B persisting a stale
  * whole-file snapshot (a stale lock older than `lockStaleMs` is
  * broken — a crashed holder must not brick the catalog). Reads
  * (replay) stay lock-free against the atomic snapshot.
  *
  * Precedent: MaterializedView persists `_mv_def.json` next to its
  * state the same way (reference model: the service's tables survive
  * process death — wangpy1995/data-service registers against a
  * standing metastore).
  */
final class CatalogRegistry(dir: Option[Path]) {
  import CatalogRegistry.Entry

  private val mapper = new ObjectMapper()
  private val file = dir.map(_.resolve("_catalog.json"))
  // insertion-ordered name → entry; guarded by this
  private val entries = new java.util.LinkedHashMap[String, Entry]()

  dir.foreach(Files.createDirectories(_))
  load()

  private def load(): Unit = synchronized {
    val f = file.filter(Files.exists(_)).getOrElse(return)
    val root = mapper.readTree(Files.readAllBytes(f))
    if (root == null || !root.isArray) return
    (0 until root.size).foreach { i =>
      val n = root.get(i)
      def s(f: String) = Option(n.get(f)).map(_.asText()).getOrElse("")
      val opts = Option(n.get("options")).map { o =>
        import scala.jdk.CollectionConverters._
        o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty[String, String])
      val e = Entry(s("kind"), s("name"), s("format"), s("path"), opts, s("query"))
      if (e.name.nonEmpty && (e.kind == "source" || e.kind == "view")) {
        entries.remove(e.name)
        entries.put(e.name, e)
        ()
      }
    }
  }

  /** Replay every persisted definition in order through `apply`
    * (true = registered, false = skipped); runs at service
    * construction. Failures are the CALLER's policy — this class only
    * iterates.
    */
  def replay(apply: Entry => Boolean): Unit = synchronized {
    import scala.jdk.CollectionConverters._
    entries.values.asScala.toSeq.foreach(apply)
  }

  /** Point-in-time copy of every definition, in definition order —
    * lock-free against the in-memory cache, like replay().
    */
  def entriesSnapshot: Seq[Entry] = synchronized {
    import scala.jdk.CollectionConverters._
    entries.values.asScala.toSeq
  }

  def recordSource(name: String, format: String, path: String,
      options: Map[String, String]): Unit =
    record(Entry("source", name, format, path, options, ""))

  def recordView(name: String, query: String): Unit =
    record(Entry("view", name, "", "", Map.empty, query))

  private def record(e: Entry): Unit = mutate { () =>
    entries.remove(e.name) // redefinition moves to the end
    entries.put(e.name, e)
    ()
  }

  /** Drop a definition; true when it existed. The file shrinks with
    * it — an unregistered table must not resurrect on restart.
    */
  def remove(name: String): Boolean = {
    var had = false
    mutate { () => had = entries.remove(name) != null }
    had
  }

  /** Load-modify-write under the cross-process lock: re-sync the
    * in-memory map from disk FIRST so this op lands on the latest
    * state another writer may have persisted, then write back. The
    * in-memory map is also the read cache for lock-free replay().
    */
  private def mutate(op: () => Unit): Unit = synchronized {
    def run(): Unit = {
      if (file.isDefined) { entries.clear(); load() }
      op()
      persist()
    }
    dir.map(_.resolve("_catalog.lock")) match {
      case Some(lock) =>
        graft.util.DirLock.withLock(lock, lockStaleMs)(run())
      case None => run()
    }
  }

  private val lockStaleMs = 10000L

  private def persist(): Unit = {
    val target = file.getOrElse(return) // in-memory registry (session
    // sharing without durability): records replay into new sessions
    // but nothing lands on disk
    import scala.jdk.CollectionConverters._
    val arr = mapper.createArrayNode()
    entries.values.asScala.foreach { e =>
      val n = arr.addObject()
      n.put("kind", e.kind)
      n.put("name", e.name)
      if (e.kind == "source") {
        n.put("format", e.format)
        n.put("path", e.path)
        val o = n.putObject("options")
        e.options.foreach { case (k, v) => o.put(k, v) }
      } else n.put("query", e.query)
    }
    val tmp = Files.createTempFile(target.getParent, "_catalog", ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(arr).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}

object CatalogRegistry {
  /** One catalog definition: a registered source (`kind = "source"`,
    * format/path/options) or a submitted view (`kind = "view"`, SQL).
    */
  final case class Entry(kind: String, name: String, format: String,
      path: String, options: Map[String, String], query: String)
}
