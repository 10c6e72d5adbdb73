package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.sources.VersionedTable

/** Structured-Streaming source over a [[VersionedTable]]'s change
  * feed (Delta's `readStream.option("readChangeFeed", true)` shape):
  *
  *   spark.readStream.format("graft.streaming.VTableChangeSourceProvider")
  *     .option("path", tableDir)
  *     .option("startingVersion", 0)       // omit = only NEW commits
  *     .load()
  *
  * Offsets ARE commit versions — the natural exactly-once cursor: a
  * micro-batch covers `(lastCommittedVersion, currentVersion]` via
  * [[VersionedTable.readChangesSince]], so each batch is the exact
  * row-level delta of a commit range, replayable from the checkpoint
  * after a crash (the log is immutable and version-addressed; the
  * same offset range always rebuilds the same batch until vacuum).
  * `startingVersion=0` bootstraps: version 1's files arrive as
  * `insert` rows (the initial snapshot), then the feed continues
  * incrementally. Omitting it tails only commits after stream start.
  *
  * Scale: getOffset is one checkpoint-pointer probe (no data IO);
  * each batch reads only the commit range's fresh/change files, never
  * the snapshot — a 100 TB table streams its deltas at the cost of
  * the deltas. An overwrite/restore inside the range (or a vacuumed
  * manifest) surfaces [[VersionedTable.ResyncRequired]] and fails the
  * stream: the consumer must re-read the snapshot — silently skipping
  * a full-table rewrite would corrupt every downstream aggregate.
  */
final class VTableChangeSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def tableDir(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdf needs .option(\"path\", <table dir>)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-cdf derives its schema from the table; don't pass one")
    ("graft-cdf", VTableChangeSource.feedSchema(
      VersionedTable(ctx.sparkSession, tableDir(params))))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val vt = VersionedTable(ctx.sparkSession, tableDir(params))
    val starting = params.get("startingVersion").orElse(params.get("startingversion"))
    val maxVersions = params.get("maxVersionsPerTrigger")
      .orElse(params.get("maxversionspertrigger")).map(_.toInt)
    maxVersions.foreach(m => require(m >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $m"))
    // the stream's checkpoint location is the stable consumer identity
    // (survives restarts, distinct per query) — it names the retention
    // lease this source maintains on the table. The starting REF is
    // passed raw: it resolves lazily at first use, so a restart whose
    // checkpoint already supersedes the bootstrap never re-resolves a
    // since-dropped tag (see the class's initialVersion note).
    new VTableChangeSource(vt, starting, maxVersions, Some(metadataPath))
  }
}

private[streaming] object VTableChangeSource {
  /** `startingVersion` operand: a commit number, or an immutable TAG
    * name — "replicate everything after the blessed snapshot" is the
    * natural bootstrap for a replication chain, and every other
    * version-taking surface (reads, RESTORE, CLONE, the TVFs) already
    * speaks tag names. Exclusive-start semantics are identical either
    * way: the feed covers `(resolved, head]`. A name that is no tag —
    * including an all-digit string outside Int range — fails naming
    * the roster, never a bare NumberFormatException.
    */
  private[streaming] def resolveStarting(vt: VersionedTable, s: String): Int =
    s.toIntOption.getOrElse(vt.tagVersion(s).getOrElse(
      throw new IllegalArgumentException(
        s"graft-cdf: startingVersion '$s' is neither a commit number nor a " +
          s"tag of ${vt.dir} (tags: ${vt.tagNames.mkString(", ")})")))

  /** The engine hands `metadataPath` as a Hadoop-style URI
    * (`file:/tmp/ckpt/sources/0`). The marker goes through the Hadoop
    * FileSystem API for the path's OWN scheme — a checkpoint on
    * hdfs:// or s3a:// persists the resolved bootstrap version exactly
    * like a local one, instead of silently downgrading to
    * resolve-per-start (where a restart that replays batch 0 after the
    * documented drop-the-bootstrap-tag two-step would fail).
    */
  private[streaming] def markerPath(mp: String): Option[org.apache.hadoop.fs.Path] =
    try Some(new org.apache.hadoop.fs.Path(mp, "graft-cdf-initial"))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Committed schema + the two feed columns. */
  def feedSchema(vt: VersionedTable): StructType = {
    val v = vt.currentVersion
    require(v > 0, s"table at ${vt.dir} has no committed version")
    StructType(vt.read(v).schema.fields.toSeq :+
      StructField(VersionedTable.ChangeTypeCol, StringType, nullable = true) :+
      StructField(VersionedTable.CommitVersionCol, IntegerType, nullable = false))
  }
}

private[streaming] final class VTableChangeSource(vt: VersionedTable,
    startingRef: Option[String], maxVersionsPerTrigger: Option[Int] = None,
    leaseId: Option[String] = None)
  extends Source {

  // last read-through version this source leased — skip rewriting the
  // lease file when progress hasn't moved
  @volatile private var lastLeased: Int = -1

  /** Advance the table's retention lease to the consumer's DURABLE
    * progress: `start` of a batch is the previously committed offset
    * (Spark replays from the checkpoint on restart), so everything
    * after it must stay replayable. Lease IO must never fail the
    * stream — vacuum protection is best-effort by design (the
    * ResyncRequired path below remains the correctness backstop).
    */
  private def lease(readThrough: Int): Unit =
    leaseId.foreach { id =>
      if (readThrough != lastLeased) {
        try { vt.registerFeedLease(id, readThrough); lastLeased = readThrough }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }

  // fixed at stream START (first run, not restart — restarts resume
  // from the checkpointed offset, which supersedes this). The ref
  // resolves exactly ONCE per checkpoint lifetime and the result
  // persists under the source's own metadataPath (the engine hands a
  // DSv1 source that directory precisely for initial-state
  // durability): a restart re-READS the resolved version instead of
  // re-resolving the name, so dropping the bootstrap tag afterwards —
  // the documented re-pin two-step — can never kill a stream whose
  // checkpoint already supersedes it, and a drop+re-create of the
  // same tag name can never silently re-base the feed.
  private lazy val initialVersion: Int = {
    val conf = vt.spark.sparkContext.hadoopConfiguration
    val marker = leaseId.flatMap(VTableChangeSource.markerPath)
    val persisted = marker.flatMap { p =>
      try {
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          try {
            val s = scala.io.Source.fromInputStream(in,
              java.nio.charset.StandardCharsets.UTF_8.name()).mkString
            s.trim.toIntOption
          } finally in.close()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    persisted.getOrElse {
      val v = startingRef
        .map(VTableChangeSource.resolveStarting(vt, _))
        .getOrElse(vt.currentVersion)
      marker.foreach { p =>
        // best-effort durability: a failed write only means the next
        // restart re-resolves (the pre-persistence behavior)
        try {
          val fs = p.getFileSystem(conf)
          val out = fs.create(p, true)
          try out.write(v.toString.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      v
    }
  }

  // high-water mark of batch ends already handed out — the base the
  // rate limit counts from. Starts UNSET: restart recovery calls
  // getBatch with the checkpointed range before the next getOffset,
  // which seeds the mark past the checkpoint without ever touching
  // initialVersion.
  @volatile private var lastEnd: Int = Int.MinValue

  override val schema: StructType = VTableChangeSource.feedSchema(vt)

  // works for LongOffset and the SerializedOffset a restart hands back
  private def v(o: Offset): Int = o.json.trim.toInt

  /** Without `maxVersionsPerTrigger` a batch covers everything up to
    * the current version — a backfill from version 0 of a long-lived
    * table is then ONE giant micro-batch (Delta's unthrottled shape).
    * With it, each trigger admits at most that many commit versions,
    * so the backlog drains as bounded batches and the sink's
    * per-batch memory/commit cost stays flat while the stream catches
    * up to the tail.
    */
  override def getOffset: Option[Offset] = {
    val cur = vt.currentVersion
    // the bootstrap ref resolves only on the FIRST offset probe of a
    // fresh stream; once any batch end is known (normal progress or a
    // restart's recovery getBatch), it alone is the base
    val base = if (lastEnd != Int.MinValue) lastEnd else initialVersion
    val capped = maxVersionsPerTrigger match {
      case Some(m) => math.min(cur, base + m)
      case None    => cur
    }
    if (capped > base) Some(LongOffset(capped.toLong))
    else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = v(end)
    if (lastEnd == Int.MinValue || e > lastEnd) lastEnd = e
    val s = start.map(v).getOrElse(initialVersion)
    lease(s)
    org.apache.spark.sql.GraftSqlBridge.asStreamingFrame(
      vt.readChangesSince(s, e))
  }

  override def stop(): Unit = ()
}
