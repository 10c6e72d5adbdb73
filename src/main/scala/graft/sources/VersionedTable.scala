package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Merge

/** Minimal ACID table format over plain parquet — the Delta-lake
  * design (Armbrust et al., "Delta Lake: High-Performance ACID Table
  * Storage over Cloud Object Stores", VLDB 2020) reduced to its core:
  *
  *   table_dir/
  *     _graft_log/v00000001.json   ordered commit log; each entry
  *     _graft_log/v00000002.json   names the EXACT data files of that
  *     ...                         version (relative paths)
  *     files-<uuid>/part-*.parquet immutable data files
  *
  * A version is committed by writing its manifest to a temp name and
  * atomically renaming WITHOUT replace to `v{n+1}.json` — the rename
  * either claims the version or throws, so two writers can never both
  * commit version n+1 (optimistic concurrency; the loser retries on a
  * fresh snapshot). Data files are written before the commit and are
  * invisible until the manifest lands, so readers always see a
  * complete snapshot: reads resolve a version's fixed file list, never
  * a directory listing. This is exactly the object-store recipe —
  * rename-if-absent maps to HDFS rename / S3 conditional put.
  *
  * MERGE is copy-on-write over the whole snapshot (`Merge.upsert` +
  * rewrite), the Delta strategy before deletion vectors; at 100 TB
  * the rewrite narrows to the partitions whose keys appear in the
  * update set — the manifest already carries per-file paths, so a
  * partition-pruned variant only swaps the touched files. The log is
  * O(commits) small JSON files; long-lived tables periodically
  * compact it into a checkpoint manifest (not needed at this scale).
  */
final class VersionedTable private (val spark: SparkSession, val dir: String) {

  private val mapper = new ObjectMapper()
  private def logDir: Path = Paths.get(dir, "_graft_log")

  /** Latest committed version, 0 if the table is empty. */
  def currentVersion: Int = {
    val vs = listVersions()
    if (vs.isEmpty) 0 else vs.max
  }

  private def listVersions(): Seq[Int] = {
    val s = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toInt).toSeq
    } finally s.close()
  }

  private def manifest(version: Int): Seq[String] = {
    val node = mapper.readTree(logDir.resolve(f"v$version%08d.json").toFile)
    import scala.jdk.CollectionConverters._
    node.get("files").elements().asScala.map(_.asText()).toSeq
  }

  /** Snapshot read. `version = -1` reads the latest commit; any
    * earlier version stays readable (time travel) because data files
    * are immutable and manifests are never rewritten.
    */
  def read(version: Int = -1): DataFrame = {
    val v = if (version == -1) currentVersion else version
    require(v > 0, s"table at $dir has no committed version${if (version > 0) s" $version" else ""}")
    val fs = manifest(v).map(rel => s"$dir/$rel")
    if (fs.isEmpty) spark.read.parquet(s"$dir/_graft_empty") // unreachable: commits always carry files
    else spark.read.parquet(fs: _*)
  }

  /** Write `df`'s rows as new immutable files, return their relative
    * paths. Files live under a per-commit uuid directory, so
    * uncommitted writes never collide and are invisible to readers.
    */
  private def writeFiles(df: DataFrame): Seq[String] = {
    val sub = s"files-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$dir/$sub")
    val s = Files.list(Paths.get(dir, sub))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).map(n => s"$sub/$n").toSeq.sorted
    } finally s.close()
  }

  /** Atomically claim version `v` with the given file list; throws
    * ConcurrentModificationException if another writer got there
    * first. (private[graft]: the spec races two claims directly to
    * prove the rename-without-replace guarantee.)
    */
  private[graft] def commit(v: Int, op: String, fileList: Seq[String]): Int = {
    val node = mapper.createObjectNode()
    node.put("version", v)
    node.put("op", op)
    val arr = node.putArray("files")
    fileList.foreach(arr.add)
    val tmp = logDir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, mapper.writeValueAsBytes(node))
    try Files.move(tmp, logDir.resolve(f"v$v%08d.json")) // no REPLACE → throws if claimed
    catch {
      case NonFatal(e) =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"commit conflict: version $v of $dir was claimed by another writer", e)
    }
    v
  }

  /** Append: next version = previous file list + the new files. */
  def append(df: DataFrame): Int = {
    val prev = currentVersion
    val existing = if (prev == 0) Seq.empty else manifest(prev)
    commit(prev + 1, "append", existing ++ writeFiles(df))
  }

  /** Overwrite: next version = the new files only. Old versions stay
    * readable — nothing is deleted.
    */
  def overwrite(df: DataFrame): Int =
    commit(currentVersion + 1, "overwrite", writeFiles(df))

  /** Copy-on-write MERGE (update matched keys, insert new ones —
    * `Merge.upsert` semantics incl. the duplicate-source and null-key
    * raises): rewrites the snapshot into fresh files and commits them
    * as the next version.
    */
  def merge(updates: DataFrame, key: String): Int = {
    val next = Merge.upsert(read(), updates, key)
    commit(currentVersion + 1, "merge", writeFiles(next))
  }
}

object VersionedTable {

  /** Open (creating the log directory if absent). */
  def apply(spark: SparkSession, dir: String): VersionedTable = {
    Files.createDirectories(Paths.get(dir, "_graft_log"))
    new VersionedTable(spark, dir)
  }
}

/** Catalog integration: `read("vtable", dir)` serves the latest
  * snapshot; `options("version")` time-travels.
  */
object VTableSource extends SourceProvider {
  val format = "vtable"
  def read(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    VersionedTable(spark, path).read(options.get("version").map(_.toInt).getOrElse(-1))
}
