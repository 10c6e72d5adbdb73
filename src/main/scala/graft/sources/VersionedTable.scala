package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.Merge

/** Minimal ACID table format over plain parquet — the Delta-lake
  * design (Armbrust et al., "Delta Lake: High-Performance ACID Table
  * Storage over Cloud Object Stores", VLDB 2020) reduced to its core:
  *
  *   table_dir/
  *     _graft_log/v00000001.json   ordered commit log; each entry
  *     _graft_log/v00000002.json   names the EXACT data files of that
  *     ...                         version (relative paths) + schema
  *     files-<uuid>/part-*.parquet immutable data files
  *
  * A version is committed by writing its manifest to a temp name and
  * claiming `v{n+1}.json` with `Files.createLink` — link(2) fails
  * EEXIST atomically at the filesystem level, so two writers can never
  * both commit version n+1 (optimistic concurrency; the loser's data
  * files are cleaned up and it retries on a fresh snapshot). Data
  * files land before the commit and are invisible until the manifest
  * does, so readers always see a complete snapshot: reads resolve a
  * version's fixed file list, never a directory listing. On
  * filesystems without hard links the claim falls back to
  * rename-without-replace (the HDFS/object-store recipe — there the
  * store's own rename/conditional-put provides the same guarantee).
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
    if (!Files.isDirectory(logDir)) return Seq.empty
    val s = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toInt).toSeq
    } finally s.close()
  }

  private def manifest(version: Int): JsonNode =
    mapper.readTree(logDir.resolve(f"v$version%08d.json").toFile)

  private def manifestFiles(m: JsonNode): Seq[String] = {
    import scala.jdk.CollectionConverters._
    m.get("files").elements().asScala.map(_.asText()).toSeq
  }

  /** Snapshot read. `version = -1` reads the latest commit; any
    * earlier version stays readable (time travel) because data files
    * are immutable and manifests are never rewritten. An empty
    * snapshot (e.g. overwrite with zero rows) reads back as an empty
    * DataFrame with the committed schema.
    */
  def read(version: Int = -1): DataFrame = {
    val v = if (version == -1) currentVersion else version
    require(v > 0, s"table at $dir has no committed version${if (version > 0) s" $version" else ""}")
    val m = manifest(v)
    val fs = manifestFiles(m).map(rel => s"$dir/$rel")
    if (fs.nonEmpty) spark.read.parquet(fs: _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      DataType.fromJson(m.get("schema").asText()).asInstanceOf[StructType])
  }

  /** Write `df`'s rows as new immutable files under a per-commit uuid
    * directory (uncommitted writes never collide and are invisible to
    * readers); returns (subdir, relative file paths).
    */
  private def writeFiles(df: DataFrame): (String, Seq[String]) = {
    val sub = s"files-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$dir/$sub")
    val s = Files.list(Paths.get(dir, sub))
    try {
      import scala.jdk.CollectionConverters._
      (sub, s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).map(n => s"$sub/$n").toSeq.sorted)
    } finally s.close()
  }

  /** Atomically claim version `v` with the given file list; throws
    * ConcurrentModificationException ONLY if another writer holds the
    * version (any real I/O failure propagates untranslated).
    * (private[graft]: the spec races two claims directly to prove the
    * claim-once guarantee.)
    */
  private[graft] def commit(v: Int, op: String, fileList: Seq[String],
      schemaJson: String = null): Int = {
    val node = mapper.createObjectNode()
    node.put("version", v)
    node.put("op", op)
    if (schemaJson != null) node.put("schema", schemaJson)
    val arr = node.putArray("files")
    fileList.foreach(arr.add)
    Files.createDirectories(logDir)
    val tmp = logDir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, mapper.writeValueAsBytes(node))
    val target = logDir.resolve(f"v$v%08d.json")
    try {
      try Files.createLink(target, tmp) // link(2): fails EEXIST atomically
      catch {
        case _: UnsupportedOperationException =>
          Files.move(tmp, target) // no-replace rename: the HDFS/object-store path
      }
      v
    } catch {
      case e: FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"commit conflict: version $v of $dir was claimed by another writer", e)
    } finally Files.deleteIfExists(tmp)
  }

  /** Write + claim; a lost race deletes the just-written data files
    * before rethrowing, so conflicts leak nothing. (private[graft]
    * for the same race-injection reason as commit.)
    */
  private[graft] def commitData(v: Int, op: String, df: DataFrame,
      carryForward: Seq[String]): Int = {
    val (sub, fresh) = writeFiles(df)
    try commit(v, op, carryForward ++ fresh, df.schema.json)
    catch {
      case e: java.util.ConcurrentModificationException =>
        deleteTree(Paths.get(dir, sub))
        throw e
    }
  }

  private def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach(deleteTree)
      } finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  /** Append: next version = previous file list + the new files. */
  def append(df: DataFrame): Int = {
    val prev = currentVersion
    val existing = if (prev == 0) Seq.empty else manifestFiles(manifest(prev))
    commitData(prev + 1, "append", df, existing)
  }

  /** Overwrite: next version = the new files only. Old versions stay
    * readable — nothing is deleted.
    */
  def overwrite(df: DataFrame): Int =
    commitData(currentVersion + 1, "overwrite", df, Seq.empty)

  /** Copy-on-write MERGE (update matched keys, insert new ones —
    * `Merge.upsert` semantics incl. the duplicate-source and null-key
    * raises): rewrites the snapshot into fresh files and commits them
    * as the next version.
    */
  def merge(updates: DataFrame, key: String): Int =
    commitData(currentVersion + 1, "merge", Merge.upsert(read(), updates, key), Seq.empty)

  /** Bound storage: drop history older than the last `retainVersions`
    * commits — delete the older manifests, then every data file no
    * surviving manifest references. Time travel keeps working within
    * the retained window; copy-on-write tables need this or every
    * overwrite/merge retains a full snapshot forever (Delta's VACUUM).
    * Returns the number of data files deleted. Safe against
    * mid-vacuum readers of RETAINED versions (their manifests and
    * files are untouched); like Delta, readers of dropped history
    * race with the delete by design.
    */
  def vacuum(retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "must retain at least the current version")
    val vs = listVersions().sorted
    val (drop, keep) = vs.splitAt(math.max(vs.size - retainVersions, 0))
    if (drop.isEmpty) return 0
    val live = keep.flatMap(v => manifestFiles(manifest(v))).toSet
    val dead = drop.flatMap(v => manifestFiles(manifest(v))).distinct
      .filterNot(live)
    dead.foreach(rel => Files.deleteIfExists(Paths.get(dir, rel)))
    // drop data dirs with no parquet left (write markers like _SUCCESS
    // don't keep a dead dir alive) and the dropped manifests; a dir a
    // concurrent/interrupted vacuum removes UNDER us is fine — catch,
    // don't check-then-act
    dead.map(rel => Paths.get(dir, rel).getParent).distinct.foreach { d =>
      try {
        val s = Files.list(d)
        val hasParquet =
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
          } finally s.close()
        if (!hasParquet) deleteTree(d)
      } catch { case _: java.nio.file.NoSuchFileException => () }
    }
    drop.foreach(v => Files.deleteIfExists(logDir.resolve(f"v$v%08d.json")))
    dead.size
  }
}

object VersionedTable {

  /** Open a table handle. Opening has NO filesystem side effects —
    * the log directory is created by the first commit, and reads of a
    * never-committed path fail with a clear error instead of leaving
    * directories behind.
    */
  def apply(spark: SparkSession, dir: String): VersionedTable =
    new VersionedTable(spark, dir)
}

/** Catalog integration: `read("vtable", dir)` serves the latest
  * snapshot; `options("version")` time-travels. Read-only — never
  * touches the filesystem beyond the manifest + data files.
  */
object VTableSource extends SourceProvider {
  val format = "vtable"
  def read(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    VersionedTable(spark, path).read(options.get("version").map(_.toInt).getOrElse(-1))
}

/** Contract query over the versioned table: append an orders snapshot
  * (even keys), MERGE price-bumped updates (keys divisible by 3 —
  * half match, half insert), read the committed snapshot back and
  * aggregate. The oracle reproduces the MERGE result in plain SQL, so
  * the table format's write → claim → read path is itself under the
  * DuckDB gate. Memoized per (session, corpus) — contract queries are
  * constructed freely and table commits are not idempotent.
  */
object TableMerge {

  private case class Key(session: Int, sfDir: String)
  // eviction must NOT delete the directory — a lazily evaluated
  // DataFrame returned earlier still reads it; temp tables are cleaned
  // at JVM exit instead. Disk is bounded by the number of distinct
  // corpora a session touches (a few MB each; the gate/bench touch at
  // most three), not by the memo size — the memo only bounds how many
  // stay addressable for reuse.
  private val tables = new graft.util.BoundedMemo[Key, String](4, _ => ())

  private def builtTable(t: Tables): String =
    tables.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      import org.apache.spark.sql.functions._
      val parent = Files.createTempDirectory("graft-tmerge")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(parent.toFile)
      }
      val dir = parent.toString + "/orders_t"
      val vt = VersionedTable(t.spark, dir)
      val base = t.orders.select(col("o_orderkey"), col("o_totalprice").as("price"))
      vt.append(base.filter(col("o_orderkey") % 2 === 0))
      vt.merge(
        base.filter(col("o_orderkey") % 3 === 0)
          .withColumn("price", graft.operators.Rnd.round(col("price") * 1.1, 2)),
        "o_orderkey")
      dir
    }

  def qTableMerge(t: Tables): DataFrame = {
    import org.apache.spark.sql.functions._
    VersionedTable(t.spark, builtTable(t)).read()
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Rnd.round(sum("price"), 2).as("total"))
  }
}
