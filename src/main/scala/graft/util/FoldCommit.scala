package graft.util

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Write-ahead ROLL-FORWARD commit for bare-parquet index maintenance
  * — the shared protocol behind every "rewrite files under a live
  * directory tree" operation ([[graft.operators.IvfIndex]] epoch
  * folds, [[graft.operators.DedupIndex]] /
  * [[graft.operators.SpanIndex]] bucket compaction). A maintenance op
  * that deletes-then-writes (or writes-then-deletes) has a crash
  * window that loses or doubles rows; this gives each op the vtable
  * commit's shape without the vtable:
  *
  *   1. STAGE — the op writes its replacement files whole under
  *      `<root>/_fold/<foldId>/`, mirroring the target tree's relative
  *      layout. Nothing visible changes; a crash here leaves garbage
  *      the next [[recover]] sweeps.
  *   2. COMMIT — [[commit]] lands `_fold_commit.txt` (fold id, target
  *      subtree, relative delete list) through a pluggable
  *      [[graft.sources.CommitStore]] claim — atomic PUT-IF-ABSENT,
  *      exactly the vtable log's one storage primitive. POSIX
  *      filesystems get link(2)/mkdir(2) (the default); object-store
  *      deployments plug [[graft.sources.CommitStore.ConditionalPut]]
  *      (S3 `If-None-Match: *`) so index maintenance never silently
  *      assumes atomic rename where the store doesn't give it. The
  *      claim is the point of no return — and it makes a second
  *      concurrent committer fail LOUDLY
  *      (`ConcurrentModificationException`) instead of clobbering the
  *      first writer's pending delete list.
  *   3. ROLL FORWARD — staged files MOVE into the target tree
  *      (per-file atomic renames, idempotent by deterministic
  *      `fold-<id>-` names), the listed paths delete, the marker
  *      clears. Every step is idempotent, so a crash anywhere after
  *      (2) is finished by the next [[recover]] — run it before any
  *      op (and on reopen) and no interleaving loses or doubles rows.
  *
  * Durability at the commit point: staged data files are fsync'd
  * BEFORE the claim and the landed marker (plus its directory) after
  * it, so an OS/power crash cannot leave a durable marker pointing at
  * vanished staged data — the interleaving that would skip the moves
  * and still execute the deletes. The marker additionally carries a
  * SHA-256 of its own payload; recovery treats a checksum mismatch as
  * an uncommitted fold (nothing moves, nothing deletes), so a torn
  * marker can never execute a partial delete list. On the
  * ConditionalPut path the store's own PUT durability contract
  * replaces the marker fsync (a successful object-store PUT is
  * durable by definition); staged-file durability still comes from
  * the pre-claim fsync. Roll-forward's per-file moves remain
  * rename-based — on an object store they degrade to idempotent
  * copy+delete by the same deterministic names; only the CLAIM
  * decides correctness, which is why it alone is pluggable.
  *
  * Readers racing step (3) can see old and new files together — the
  * single-writer, no-snapshot-isolation trade every bare-parquet
  * layout makes (documented at each call site); the versioned table
  * is the path for readers needing isolation.
  */
object FoldCommit {

  /** The default POSIX claim — same primitive as the vtable log. */
  val DefaultStore: graft.sources.CommitStore =
    new graft.sources.CommitStore.AtomicRename(() => false)

  def stageDir(root: String, foldId: String): Path =
    Paths.get(root, "_fold", foldId)

  private def markerPath(root: String): Path =
    Paths.get(root, "_fold_commit.txt")

  /** Commit a staged fold and roll it forward: record the intent
    * (fold id + target subtree + paths to delete, all relative to
    * `root`) by one atomic put-if-absent through `store`, then
    * complete it. A concurrent committer loses the claim with
    * `ConcurrentModificationException` — its staged files stay
    * invisible and the next writer-mode [[recover]] sweeps them.
    */
  def commit(root: String, foldId: String, targetSub: String,
      deletes: Seq[String],
      store: graft.sources.CommitStore = DefaultStore): Unit = {
    (Seq(foldId, targetSub) ++ deletes).foreach(validateRel)
    // staged data durable BEFORE the claim: a durable marker must
    // never point at staged files an OS crash rolled back
    val stage = stageDir(root, foldId)
    if (Files.isDirectory(stage)) {
      listDataFiles(stage).foreach(force)
      forceDirs(stage)
    }
    val payload = (Seq(foldId, targetSub) ++ deletes).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    store.putIfAbsent(markerPath(root),
      (s"#sha256=${sha256Hex(payload)}\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8) ++ payload,
      s"fold $foldId of $root")
    // marker durable BEFORE any delete runs (best-effort on the POSIX
    // path; the ConditionalPut path's PUT is durable by contract)
    force(markerPath(root)); force(Paths.get(root))
    rollForward(root, deleteMarker = true) // we are the writer
  }

  /** Best-effort fsync of a file or directory (directories force via
    * a read FileChannel — the Lucene recipe); no-ops where the
    * platform refuses, leaving durability to the commit store's own
    * contract.
    */
  def force(p: Path): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.READ)
      try { ch.force(true); () } finally ch.close()
    } catch { case _: Exception => () }

  /** fsync `leaf` and every directory between it and the fold root —
    * new bucket/cell directories need their PARENT's entry durable
    * too.
    */
  private def forceDirs(leaf: Path): Unit = {
    val s = Files.walk(leaf)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isDirectory(_)).foreach(force)
    } finally s.close()
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Finish a committed-but-interrupted fold (marker present); true
    * when one rolled forward. `sweepStaging` additionally deletes any
    * marker-less staging tree — that cleanup is for the WRITER ONLY
    * (the start of its next fold): a marker-less stage is either a
    * pre-commit abort (writer-side sweep is safe) or a fold the single
    * writer is staging RIGHT NOW — a reader sweeping it would let the
    * writer's commit roll forward with no staged files and execute
    * only the deletes, losing every folded row. Readers (load /
    * checkBatch recovery) must call with the default `false`.
    *
    * Marker lifetime is WRITER-owned the same way staging is: a
    * reader's roll-forward completes the fold's moves and deletes
    * (all idempotent) but leaves the marker for the single writer's
    * next op to clear. A reader's unconditional delete would race the
    * live writer — stall mid-roll-forward of fold N, wake after the
    * writer has claimed fold N+1, and the delete kills the NEWER
    * fold's marker, whose deletes then never run if the writer
    * crashes mid-roll-forward. Re-processing an already-completed
    * fold on later reader recoveries is a handful of no-op
    * existence checks; deleting another fold's claim is data
    * corruption. `sweepStaging=true` (the writer) clears it.
    */
  def recover(root: String, sweepStaging: Boolean = false): Boolean = {
    val did =
      if (Files.exists(markerPath(root))) {
        rollForward(root, deleteMarker = sweepStaging); true
      } else false
    if (sweepStaging) {
      val staging = Paths.get(root, "_fold")
      if (Files.isDirectory(staging)) rmTree(staging)
    }
    did
  }

  private def rollForward(root: String, deleteMarker: Boolean): Unit = {
    // a CONCURRENT recoverer (the writer finishing its own commit
    // while a reader rolls the same fold forward) can clear the marker
    // between our existence check and this read — that recoverer
    // completed the fold; nothing left to do
    val bytes =
      try Files.readAllBytes(markerPath(root))
      catch { case _: java.nio.file.NoSuchFileException => return }
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    // integrity-checked markers (the current format): a marker whose
    // payload doesn't hash to its recorded SHA-256 is TORN — executing
    // its (possibly truncated) delete list after the moves would
    // double every original the missing tail named. A torn marker is
    // an uncommitted fold: drop it, touch nothing; the staged files
    // stay invisible and the writer's next sweep reclaims them.
    // Markers without the prefix (pre-checksum format) parse as-is.
    val body =
      if (text.startsWith("#sha256=")) {
        val nl = text.indexOf('\n')
        val (head, rest) =
          if (nl < 0) (text, "") else (text.substring(0, nl), text.substring(nl + 1))
        if (sha256Hex(rest.getBytes(
            java.nio.charset.StandardCharsets.UTF_8)) !=
            head.stripPrefix("#sha256=")) {
          // torn = uncommitted: only the WRITER clears it (a reader's
          // delete could race a live writer's newer claim)
          if (deleteMarker) Files.deleteIfExists(markerPath(root))
          return
        }
        rest
      } else text
    val lines = body.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.size < 2) { // torn-impossible (atomic claim), but stale-empty isn't
      if (deleteMarker) Files.deleteIfExists(markerPath(root))
      return
    }
    val (foldId, targetSub, deletes) = (lines.head, lines(1), lines.drop(2))
    // marker bytes are world-editable; refuse traversal shapes
    lines.foreach(validateRel)
    val fold = stageDir(root, foldId)
    if (Files.isDirectory(fold)) {
      // the walk races the other recoverer's rmTree of the same fold
      // dir the same way the moves race — vanishing files mean the
      // other side finished them
      val staged =
        try listDataFiles(fold)
        catch {
          case _: java.nio.file.NoSuchFileException => Seq.empty
          case e: java.io.UncheckedIOException
              if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] =>
            Seq.empty
        }
      staged.foreach { f =>
        val rel = fold.relativize(f)
        val targetDir = Option(rel.getParent)
          .map(Paths.get(root, targetSub).resolve(_))
          .getOrElse(Paths.get(root, targetSub))
        Files.createDirectories(targetDir)
        // deterministic target name keyed on the fold id makes the
        // move idempotent across recovery re-runs; a CONCURRENT
        // recoverer (a reader rolling the same committed fold forward
        // while the writer finishes it) can win the exists→move race,
        // which is success, not failure
        val t = targetDir.resolve(s"fold-$foldId-${f.getFileName}")
        if (!Files.exists(t)) {
          try Files.move(f, t, StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileAlreadyExistsException => ()
            case _: java.nio.file.NoSuchFileException => ()
          }
          ()
        }
      }
      rmTree(fold)
    }
    // drop the staging PARENT only when empty — a reader rolling a
    // committed fold forward must not touch a sibling stage the live
    // writer may be building
    val staging = Paths.get(root, "_fold")
    if (Files.isDirectory(staging)) {
      try {
        val s = Files.list(staging)
        val empty = try !s.iterator().hasNext finally s.close()
        if (empty) rmTree(staging)
      } catch { // the other recoverer dropped it first: done
        case _: java.nio.file.NoSuchFileException => ()
      }
    }
    deletes.foreach(d => rmTree(Paths.get(root, d)))
    // WRITER-only (see recover's scaladoc): a reader's unconditional
    // delete here could kill the live writer's NEWER fold claim if the
    // reader stalled mid-roll-forward across the writer's next commit
    if (deleteMarker) Files.deleteIfExists(markerPath(root))
    ()
  }

  /** Rewrite a partitioned parquet subtree to ONE file per partition
    * directory — the OPTIMIZE for append-grown bucket indexes, whose
    * per-absorb appends otherwise accumulate a file per (batch ×
    * bucket) forever. Snapshot-scoped: exactly the files listed at
    * entry are read and replaced (`basePath` keeps the partition
    * column), so rows appended by a racing writer are never deleted
    * unseen — though the single-writer contract should make that moot.
    * Returns rows rewritten; 0 when the tree is already one file per
    * directory (nothing to gain).
    */
  def compactPartitionedTree(spark: SparkSession, root: String, sub: String,
      partitionCol: String,
      store: graft.sources.CommitStore = DefaultStore): Long = {
    recover(root, sweepStaging = true) // we ARE the single writer here
    val treeRoot = Paths.get(root, sub)
    if (!Files.isDirectory(treeRoot)) return 0L
    val files = listDataFiles(treeRoot)
    val dirs = files.map(_.getParent).distinct
    if (files.isEmpty || files.size == dirs.size) return 0L
    val rows = spark.read.option("basePath", treeRoot.toString)
      .parquet(files.map(_.toString): _*)
      .repartition(col(partitionCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = rows.count()
      val foldId = java.util.UUID.randomUUID().toString.take(8)
      rows.write.mode("overwrite").partitionBy(partitionCol)
        .parquet(stageDir(root, foldId).toString)
      commit(root, foldId, sub,
        files.map(f => Paths.get(root).relativize(f).toString), store)
      n
    } finally { rows.unpersist(); () }
  }

  /** Every data file under `root`, recursively (skips Spark's
    * `_SUCCESS`/CRC sidecars).
    */
  def listDataFiles(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).toSeq
    } finally s.close()
  }

  def rmTree(p: Path): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
  }

  private def validateRel(e: String): Unit =
    require(e.nonEmpty && !e.startsWith("/") && !e.split('/').contains(".."),
      s"suspicious fold-commit entry: $e")
}
