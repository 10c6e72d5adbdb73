package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persisted IVF (inverted-file) ANN index: the k-row coarse-quantizer
  * centroid table plus the cell-assigned corpus (the inverted file).
  * Build once, probe many — a real similarity service trains the
  * quantizer off the query path and serves probes against the stored
  * index; `qAnnIvf` re-training Lloyd per call was round-2's
  * second-most expensive query.
  *
  * On disk the inverted file is PARTITIONED BY cell, so a probe's scan
  * prunes to the `nprobe` visited cells (PartitionFilters, not a full
  * read) — the layout that matters at 100 TB, where each cell is a
  * directory of parquet files and a probe touches nprobe/k of the
  * corpus.
  */
final case class IvfIndex(centroids: DataFrame, assigned: DataFrame) {

  def save(dir: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assigned")
    // the inverted file's schema, recorded once — ingest-batch shape
    // validation must not pay a full file listing of every cell dir
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "schema.json"),
      assigned.schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  def unpersist(): Unit = { centroids.unpersist(); assigned.unpersist(); () }
}

object IvfIndex {

  /** Train the coarse quantizer and assign the full corpus, eagerly.
    * `trainMod > 1` trains Lloyd on a deterministic 1/trainMod hash
    * sample of the corpus (the standard large-scale recipe — quantizer
    * quality needs a representative sample, not every vector) while
    * the assignment pass still covers every vector with one broadcast
    * join.
    */
  def build(e: DataFrame, cells: Int = 16, iters: Int = 2,
      trainMod: Int = 1): IvfIndex = {
    val train =
      if (trainMod > 1) {
        val sample = e.filter(pmod(xxhash64(col("vec_id")), lit(trainMod)) === 0)
        // a corpus too small for the hash sample to cover k seed
        // centroids trains on everything instead — sampling is a
        // large-corpus optimization, never a correctness gate (the
        // limit makes this an early-exit scan, not a full count)
        if (sample.limit(cells).count() < cells) e else sample
      } else e
    // seed thinning exists to avoid ranking a FULL corpus; derive the
    // flag from what train actually is — the small-sample fallback
    // above hands the full corpus back even when trainMod > 1
    val centroids = // persisted inside
      Similarity.ivfCentroids(train, cells, iters, preThinSeeds = train eq e)
    // persisted lazily: the first probe (or save) fills the cache with
    // the same single pass an eager count would spend
    val assigned = Similarity.assignCells(e, centroids)
      .persist(StorageLevel.MEMORY_AND_DISK)
    IvfIndex(centroids, assigned)
  }

  /** Reopen a saved index. The partition column comes back from
    * directory names (integer-inferred) — recast to long so probe
    * joins and saved/loaded plans are type-identical. Streamed epochs
    * (see [[appendEpoch]]) live in a sibling `epochs/` tree and are
    * unioned in here; `cell` is a partition column in BOTH trees, so a
    * probe's cell filter prunes directories on each side — the union
    * widens the file set, never the scan shape.
    */
  def load(spark: SparkSession, dir: String): IvfIndex = {
    // an interrupted compaction rolls forward before anything reads:
    // a marker-listed epoch may already be partially moved into
    // assigned/, and completing the fold is what restores the
    // exactly-once view (see compactEpochs)
    recoverCompaction(spark, dir)
    val base = spark.read.parquet(s"$dir/assigned")
      .withColumn("cell", col("cell").cast("long"))
    val withEpochs =
      if (hasEpochRows(dir))
        base.unionByName(spark.read.parquet(s"$dir/epochs")
          .withColumn("cell", col("cell").cast("long")).drop("epoch"))
      else base
    IvfIndex(spark.read.parquet(s"$dir/centroids").persist(), withEpochs)
  }

  /** Incremental index maintenance: assign NEW vectors against the
    * saved quantizer and append them to the on-disk inverted file —
    * no retraining, no rewrite of existing cells' data. This is how a
    * production index absorbs a daily ingest batch: the coarse
    * quantizer is stable (retrain is a scheduled rebuild, not a
    * per-batch cost), assignment is one broadcast join over only the
    * new vectors, and the partitioned append keeps probes
    * cell-pruned. Returns the number of vectors appended.
    */
  def appendToSaved(spark: SparkSession, dir: String, newVectors: DataFrame): Long = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    // the incoming batch must land with EXACTLY the saved inverted
    // file's shape — parquet append accepts mixed schemas silently and
    // a later read resolves from an arbitrary footer (columns vanish
    // or null out run-to-run). The schema comes from the sidecar
    // written at save time (never a full file listing of every cell
    // dir); older indexes without one fall back to the listing.
    val savedSchema = savedSchemaOf(spark, dir)
    val assigned = Similarity.assignCells(newVectors, centroids)
    requireShapeMatch(assigned.schema, savedSchema)
    // persist: the count and the write must be ONE materialization of
    // one assignment join, not two
    assigned.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = assigned.count()
      assigned.select(savedSchema.fieldNames.map(col).toSeq: _*)
        .write.mode("append").partitionBy("cell").parquet(s"$dir/assigned")
      n
    } finally { assigned.unpersist(); () }
  }

  /** Epoch-keyed STREAMING index maintenance: land one micro-batch of
    * new vectors as `epochs/epoch=<id>/cell=<c>/...` under the saved
    * index. The epoch stages outside the tree and lands by ONE
    * directory rename (atomic visibility — a partial epoch can never
    * appear under `epochs/`), and a replayed batch (foreachBatch
    * redelivery after restart) replaces the directory whole, so the
    * tree converges to exactly-once by construction. Cell stays a
    * partition column inside every epoch, so probes keep
    * directory-level pruning over streamed rows too.
    *
    * Single-writer contract (one streaming query per index, Structured
    * Streaming's own constraint) — and the writer's CHECKPOINT
    * DIRECTORY is part of the index's identity: epoch ids are the
    * checkpoint's batch ids, and the folded-epoch high-water mark
    * persists with the index, so resuming ingest with a FRESH
    * checkpointLocation against an existing index restarts ids at 0
    * and every batch skips as a "replay" (loudly — see the skip
    * warning). Resume with the original checkpoint or rebuild.
    * A probe racing the overwrite of a
    * replayed epoch can observe that epoch partially — the same
    * no-snapshot-isolation trade every bare-parquet layout makes; the
    * vtable sink is the path for readers that need isolation.
    */
  def appendEpoch(spark: SparkSession, dir: String, newVectors: DataFrame,
      epochId: Long): Long = {
    // a replay of an epoch that COMPACTION already folded into the
    // base file must skip whole: its directory no longer exists, so
    // the overwrite-in-place idempotence above can't help, and
    // re-appending would double every folded row. The high-water mark
    // is recorded BEFORE a fold commits (see compactEpochs), which is
    // safe in every crash interleaving: a skipped epoch's rows always
    // exist in the epochs tree (fold uncommitted) or the base file
    // (fold committed).
    //
    // LOUD on skip: the checkpoint directory is part of the index's
    // identity — restart a stream against an existing index with a
    // FRESH checkpointLocation and epoch ids restart at 0, making
    // every batch <= the high-water mark. Silently returning 0 there
    // would drop all new data forever; the warning names the only two
    // legitimate causes so the misconfiguration is visible in the
    // first micro-batch's logs.
    val folded = maxFoldedEpoch(dir)
    if (epochId <= folded) {
      System.err.println(
        s"[graft] IvfIndex.appendEpoch SKIPPED epoch $epochId at $dir " +
          s"(folded high-water mark $folded). Legitimate only as a " +
          "foreachBatch redelivery of an already-folded epoch; if this " +
          "fires on EVERY batch, the stream was restarted with a fresh " +
          "checkpointLocation against an existing index — unsupported: " +
          "the checkpoint directory is part of the index's identity. " +
          "Resume with the original checkpoint or rebuild the index.")
      return 0L
    }
    val centroids = spark.read.parquet(s"$dir/centroids")
    val savedSchema = savedSchemaOf(spark, dir)
    val assigned0 = Similarity.assignCells(newVectors, centroids)
    requireShapeMatch(assigned0.schema, savedSchema)
    val assigned = assigned0
      .select(savedSchema.fieldNames.map(col).toSeq: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = assigned.count()
      // an empty epoch writes nothing — replaying it is equally empty,
      // so idempotence holds without an empty parquet footprint
      if (n > 0) {
        // ATOMIC VISIBILITY: the epoch stages outside epochs/ and lands
        // by one directory rename, so `epochs/epoch=N` existing means
        // the epoch is COMPLETE. Without this, a crash mid-write leaves
        // a partial epoch that compaction could fold and mark — and the
        // folded-epoch replay skip would then orphan the missing rows
        // forever. With it, every crash shape is safe: stage-only
        // (swept; offset uncommitted → redelivered), old epoch deleted
        // pre-rename (redelivered → rewritten), or renamed (complete).
        val stage = java.nio.file.Paths.get(dir, "_epoch_stage", s"epoch=$epochId")
        if (java.nio.file.Files.isDirectory(stage))
          graft.util.FoldCommit.rmTree(stage)
        assigned.write.mode("overwrite").partitionBy("cell")
          .parquet(stage.toString)
        val target = java.nio.file.Paths.get(dir, "epochs", s"epoch=$epochId")
        java.nio.file.Files.createDirectories(target.getParent)
        if (java.nio.file.Files.isDirectory(target)) // replay overwrite
          graft.util.FoldCommit.rmTree(target)
        java.nio.file.Files.move(stage, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      n
    } finally { assigned.unpersist(); () }
  }

  /** Fold accumulated streamed epochs into the BASE inverted file —
    * the ANN index's OPTIMIZE: a long-running ingest leaves
    * `epochs/epoch=N/` trees whose per-epoch files stay small and
    * whose directory count grows with uptime; compaction rewrites
    * their rows cell-partition-aligned into `assigned/` and removes
    * the epoch trees, restoring one-listing probes. Returns rows
    * folded. Probes see the same row set throughout (modulo the
    * single-writer, no-snapshot-isolation trade [[appendEpoch]]
    * documents — the vtable sink is the path for readers that need
    * isolation).
    *
    * EXACTLY-ONCE under crashes via [[graft.util.FoldCommit]]'s
    * write-ahead roll-forward (stage whole → atomic intent marker →
    * idempotent moves + deletes): a crash before the marker leaves
    * only invisible staging, swept by the next run; a crash after it
    * rolls FORWARD to completion. No window loses rows and none
    * doubles them.
    */
  def compactEpochs(spark: SparkSession, dir: String,
      store: graft.sources.CommitStore = graft.util.FoldCommit.DefaultStore): Long = {
    // writer-side recovery: also sweeps aborted staging (we ARE the
    // single writer, so a marker-less stage here is dead, not live),
    // including any epoch stage a crashed appendEpoch left behind
    graft.util.FoldCommit.recover(dir, sweepStaging = true)
    val epochStage = java.nio.file.Paths.get(dir, "_epoch_stage")
    if (java.nio.file.Files.isDirectory(epochStage))
      graft.util.FoldCommit.rmTree(epochStage)
    dropEmptyEpochShell(dir)
    val epochsRoot = java.nio.file.Paths.get(dir, "epochs")
    if (!java.nio.file.Files.isDirectory(epochsRoot)) return 0L
    val epochNames = listEpochDirs(epochsRoot).map(_.getFileName.toString)
    if (epochNames.isEmpty) return 0L
    val savedSchema = savedSchemaOf(spark, dir)
    val rows = spark.read.parquet(s"$dir/epochs").drop("epoch")
      .withColumn("cell", col("cell").cast("long"))
      .select(savedSchema.fieldNames.map(col).toSeq: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = rows.count()
      val foldId = java.util.UUID.randomUUID().toString.take(8)
      if (n > 0)
        rows.write.mode("overwrite").partitionBy("cell")
          .parquet(graft.util.FoldCommit.stageDir(dir, foldId).toString)
      // the folded-epoch high-water mark lands BEFORE the commit: a
      // crash between the two leaves these epochs unfolded but
      // replay-skipped — harmless, their rows still sit in epochs/
      // (appendEpoch would only have overwritten them identically) and
      // the next maintenance pass folds them
      recordFoldedEpochs(dir,
        epochNames.map(_.stripPrefix("epoch=").toLong).max)
      graft.util.FoldCommit.commit(dir, foldId, "assigned",
        epochNames.map(e => s"epochs/$e"), store)
      dropEmptyEpochShell(dir)
      n
    } finally { rows.unpersist(); () }
  }

  private def foldedMarkPath(dir: String) =
    java.nio.file.Paths.get(dir, "_folded_epochs.txt")

  /** Highest epoch id ever folded into the base file; -1 when none. */
  def maxFoldedEpoch(dir: String): Long = {
    val p = foldedMarkPath(dir)
    if (!java.nio.file.Files.exists(p)) -1L
    else new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
  }

  private def recordFoldedEpochs(dir: String, maxId: Long): Unit = {
    val v = math.max(maxId, maxFoldedEpoch(dir))
    val tmp = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(dir), "_folded_epochs", ".tmp")
    java.nio.file.Files.write(tmp,
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, foldedMarkPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the mark must be durable BEFORE the fold commits: a durable fold
    // with a rolled-back mark would let a redelivered epoch re-append
    // rows the fold already moved into the base file (doubling) —
    // best-effort like the FoldCommit marker fsync
    graft.util.FoldCommit.force(foldedMarkPath(dir))
    graft.util.FoldCommit.force(java.nio.file.Paths.get(dir))
    ()
  }

  /** READER-side recovery: finish an interrupted-but-COMMITTED
    * [[compactEpochs]] (see [[graft.util.FoldCommit.recover]]).
    * Deliberately deletes NOTHING ELSE — not staging (a marker-less
    * stage may be the live writer mid-fold; sweeping it would turn the
    * writer's commit into pure deletes) and not an empty epochs/ shell
    * (a reader's list-then-delete races the writer's atomic epoch
    * rename: rmTree just after the rename destroys a complete landed
    * epoch, just before it yanks the parent from under the move).
    * Readers instead treat a FILE-LESS epochs tree as absent
    * ([[hasEpochRows]]); only the single writer ever removes the
    * shell. No-op on a quiescent index.
    */
  def recoverCompaction(spark: SparkSession, dir: String): Unit = {
    graft.util.FoldCommit.recover(dir, sweepStaging = false)
    ()
  }

  /** Does the epochs tree hold any data files? The read-side gate for
    * unioning `epochs/` in — robust to the empty shell a completed
    * fold leaves (a raw parquet read of a file-less dir refuses with
    * "unable to infer schema").
    */
  private[graft] def hasEpochRows(dir: String): Boolean = {
    val root = java.nio.file.Paths.get(dir, "epochs")
    java.nio.file.Files.isDirectory(root) &&
      graft.util.FoldCommit.listDataFiles(root).nonEmpty
  }

  private def dropEmptyEpochShell(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir, "epochs")
    if (java.nio.file.Files.isDirectory(root) && listEpochDirs(root).isEmpty)
      graft.util.FoldCommit.rmTree(root)
  }

  private def listEpochDirs(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p =>
        java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("epoch=")).toSeq
    } finally s.close()
  }

  /** The inverted file's schema from the save-time sidecar (never a
    * full file listing of every cell dir); pre-sidecar indexes fall
    * back to reading the tree's own footers.
    */
  private def savedSchemaOf(spark: SparkSession,
      dir: String): org.apache.spark.sql.types.StructType = {
    val schemaPath = java.nio.file.Paths.get(dir, "schema.json")
    if (java.nio.file.Files.exists(schemaPath))
      org.apache.spark.sql.types.DataType.fromJson(
        new String(java.nio.file.Files.readAllBytes(schemaPath),
          java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    else spark.read.parquet(s"$dir/assigned")
      .withColumn("cell", col("cell").cast("long")).schema
  }

  /** catalogString normalizes nullability at every nesting level: a
    * batch that is merely NARROWER (array<float> containsNull=false
    * vs true) is append-safe and must not be rejected.
    */
  private def requireShapeMatch(batch: org.apache.spark.sql.types.StructType,
      saved: org.apache.spark.sql.types.StructType): Unit = {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.catalogString)).sortBy(_._1).toSeq
    require(shape(batch) == shape(saved),
      s"ingest batch shape ${batch.simpleString} does not match the " +
        s"saved index ${saved.simpleString}")
  }
}
