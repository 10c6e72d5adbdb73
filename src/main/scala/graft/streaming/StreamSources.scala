package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

/** Streaming twin of `graft.sources.SourceProvider`: a named factory
  * for an unbounded DataFrame. Pipelines (`EventStreams.*`) take the
  * produced DataFrame, so "the source becomes Kafka with no code
  * change" is structural — swapping file → memory → kafka is a
  * constructor swap at the edge, never a pipeline edit.
  */
trait StreamSourceProvider {
  def name: String
  def readStream(spark: SparkSession): DataFrame
}

/** Drop-in directory source: new files under `path` are consumed
  * incrementally (the standard landing-zone pattern; at scale the
  * directory is an object-store prefix fed by an ingestion job).
  * Streaming file sources require an explicit schema — inference
  * would race the arriving files.
  */
final case class FileStreamSource(format: String, path: String, schema: StructType,
    options: Map[String, String] = Map.empty) extends StreamSourceProvider {
  val name = s"file-$format"
  def readStream(spark: SparkSession): DataFrame = {
    val r = spark.readStream.schema(schema).options(options)
    format match {
      case "parquet" => r.parquet(path)
      case "json"    => r.json(path)
      case "csv"     => r.csv(path)
      case other     => r.format(other).load(path)
    }
  }
}

/** Test/dev source over an in-process buffer; `add` feeds batches. */
final class MemoryStreamSource[A: Encoder](spark: SparkSession)
    extends StreamSourceProvider {
  val name = "memory"
  // MemoryStream is classic-only (it's a dev/test source; connect
  // sessions use file/kafka sources instead)
  private implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
    spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
  private val stream = MemoryStream[A]
  def add(rows: A*): Unit = { stream.addData(rows); () }
  def readStream(spark: SparkSession): DataFrame = {
    // a MemoryStream is bound to its construction session and cannot
    // serve another one — reject the mismatch instead of silently
    // returning a frame running under different session state
    require(spark eq this.spark,
      "MemoryStreamSource is bound to the session it was constructed with; " +
        "construct one per session")
    stream.toDF()
  }
}

/** Kafka-shaped source: the exact reader plan a production deployment
  * uses (topic subscription + offset policy). The kafka connector jar
  * is not in this environment, so `load()` raises
  * DATA_SOURCE_NOT_FOUND here; with `spark-sql-kafka` on the
  * classpath the same construction streams from a broker.
  */
final case class KafkaStreamSource(bootstrapServers: String, topic: String,
    startingOffsets: String = "latest") extends StreamSourceProvider {
  val name = "kafka"
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
}

/** Sink-side twin: a named factory that starts a streaming query over
  * a transformed DataFrame. Same structural claim as the source
  * trait — swapping memory → file → kafka is a constructor change.
  */
trait StreamSinkProvider {
  def name: String
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery
}

/** In-memory table sink (tests/dev; query results readable via
  * `spark.table(queryName)`).
  */
final case class MemoryStreamSink(queryName: String, outputMode: String = "append")
    extends StreamSinkProvider {
  val name = "memory"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(queryName)
      .outputMode(outputMode).start()
}

/** Checkpointed file sink — the exactly-once landing-zone writer.
  *
  * `trigger` selects the run mode: `None` is the continuous tail;
  * `Trigger.AvailableNow()` is the BACKFILL mode — drain everything
  * currently in the source (in rate-limited batches, not one giant
  * batch) and terminate, leaving the checkpoint positioned so the
  * next start resumes incrementally. Backfill-then-tail over the
  * same checkpoint is how a 100 TB historical pile and its live feed
  * share one pipeline.
  */
final case class FileStreamSink(format: String, path: String, checkpoint: String,
    outputMode: String = "append",
    trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
    extends StreamSinkProvider {
  val name = s"file-$format"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format(format)
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
    trigger.fold(w)(w.trigger).start()
  }
}

/** Streaming sink into a [[graft.sources.VersionedTable]] —
  * stream-to-ACID-table. foreachBatch delivers each micro-batch at
  * least once (a crash between sink write and checkpoint commit
  * replays the batch with the SAME epoch id); `appendEpoch` keys the
  * table commit by that id and skips already-committed epochs, so the
  * table lands each batch exactly once across restarts. Readers see
  * snapshot-consistent versions mid-stream, and the table's time
  * travel / vacuum / MERGE all apply to streamed data.
  *
  * Maintenance is part of the sink: every `compactEvery`-th landed
  * epoch triggers `compact(compactTargetBytes)` inline — each epoch
  * commits one small file, and a stream left running without
  * compaction degrades every downstream scan to per-file task
  * overhead. Compaction is a normal commit (replays still skip via
  * the epoch pointer; time travel keeps working); `compactEvery <= 0`
  * disables it for tables with an external maintenance job.
  */
/** STREAMING SIMILARITY-INDEX MAINTENANCE: each micro-batch of new
  * vectors is assigned against the saved IVF coarse quantizer and
  * landed as an epoch-keyed partition tree under the index
  * ([[graft.operators.IvfIndex.appendEpoch]]) — a replayed epoch
  * overwrites its own directory, so restarts converge to
  * exactly-once. Probes over a freshly loaded index see streamed
  * vectors with full cell pruning; the quantizer itself is stable
  * (retraining is a scheduled rebuild, never a per-batch cost).
  */
final case class IvfStreamSink(indexDir: String, checkpoint: String,
    compactEvery: Int = 16)
    extends StreamSinkProvider {
  val name = "ivf"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epochId: Long) =>
        val n = graft.operators.IvfIndex.appendEpoch(
          batch.sparkSession, indexDir, batch.toDF(), epochId)
        // self-maintaining index, same contract as VTableStreamSink's
        // inline pass: only the writer that landed a non-empty epoch
        // compacts (replays stay no-ops), only on the cadence boundary,
        // and best-effort — the epoch is already durable, so a compact
        // fault must not kill the stream; FoldCommit's roll-forward
        // makes a mid-compact crash finish on the next boundary.
        if (n > 0 && compactEvery > 0 && (epochId + 1) % compactEvery == 0)
          try {
            graft.operators.IvfIndex.compactEpochs(batch.sparkSession, indexDir)
            ()
          } catch {
            case scala.util.control.NonFatal(e) =>
              Console.err.println(
                s"[graft] ivf auto-compact at epoch $epochId deferred: $e")
          }
        ()
      }
      .start()
}

/** STREAMING TEXT-INDEX MAINTENANCE: each micro-batch of (doc_id,
  * text) documents lands as an epoch-keyed posting tree under the
  * inverted index ([[graft.operators.TextIndex.absorbEpoch]]) — a
  * replayed epoch overwrites its own directory, so restarts converge
  * to exactly-once, and every `compactEvery`-th landed epoch folds the
  * epoch trees into the base buckets inline (same self-maintenance
  * contract as [[IvfStreamSink]]: only the writer that landed a
  * non-empty epoch compacts, best-effort — the epoch is already
  * durable, and FoldCommit's roll-forward finishes a mid-compact
  * crash on the next boundary). Searches and BM25 over the index see
  * streamed documents immediately, with bucket pruning on both the
  * base and epoch trees.
  */
final case class TextIndexStreamSink(indexDir: String, checkpoint: String,
    compactEvery: Int = 16)
    extends StreamSinkProvider {
  val name = "text-index"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epochId: Long) =>
        val n = graft.operators.TextIndex.absorbEpoch(
          batch.sparkSession, indexDir, batch.toDF(), epochId)
        if (n > 0 && compactEvery > 0 && (epochId + 1) % compactEvery == 0)
          try {
            graft.operators.TextIndex.compactEpochs(batch.sparkSession, indexDir)
            ()
          } catch {
            case scala.util.control.NonFatal(e) =>
              Console.err.println(
                s"[graft] text-index auto-compact at epoch $epochId deferred: $e")
          }
        ()
      }
      .start()
}

final case class VTableStreamSink(dir: String, checkpoint: String,
    compactEvery: Int = 16, compactTargetBytes: Long = 128L << 20,
    refreshView: Option[graft.sources.MaterializedView] = None,
    clusterBy: Seq[String] = Seq.empty)
    extends StreamSinkProvider {
  // fail at CONSTRUCTION: an invalid spec inside the best-effort
  // maintenance catch would log once per boundary while the table
  // silently never compacts for the stream's lifetime
  require(clusterBy.size <= 4,
    s"clusterBy supports at most 4 columns (z-order bit budget), got ${clusterBy.size}")
  val name = "vtable"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epochId: Long) =>
        val t = graft.sources.VersionedTable(batch.sparkSession, dir)
        val landed = t.appendEpoch(batch.toDF(), epochId)
        // a STREAMING MATERIALIZED VIEW: refresh right after the epoch
        // lands — before any compaction commit — so the view's delta
        // path stays pure-append (cost O(epoch), not O(table)). Best-
        // effort like all maintenance below: a failed refresh leaves
        // the view consistently stale (coverage never drifts from
        // content) and the next epoch's refresh catches it up.
        if (landed.nonEmpty) refreshView.foreach { mv =>
          try { mv.refresh(); () }
          catch {
            case scala.util.control.NonFatal(e) =>
              Console.err.println(
                s"[graft] view refresh at epoch $epochId deferred: $e")
          }
        }
        // only the writer that actually landed the epoch compacts (a
        // replayed/skipped batch must stay a no-op), and only on the
        // cadence boundary. Maintenance is best-effort BY CONTRACT: the
        // epoch is already durably committed, so a compact fault (FS
        // hiccup, concurrent-writer conflict) must not kill the
        // streaming query — it logs and the next boundary retries.
        // (The refresh FOLLOWING a compact recomputes once — compact
        // rewrites files — then resumes incremental: 1/compactEvery of
        // refreshes pay the full path.)
        // clusterBy makes the inline maintenance pass also the
        // CLUSTERING pass: per-epoch files land append-ordered, and
        // every compaction boundary re-sorts the small tail into
        // tight per-file stats (1-col range, 2-4-col Z-order) — a
        // stream-fed table stays point-lookup-prunable with no
        // external OPTIMIZE job
        if (landed.nonEmpty && compactEvery > 0 && (epochId + 1) % compactEvery == 0)
          try { t.compact(compactTargetBytes, clusterBy); () }
          catch {
            case scala.util.control.NonFatal(e) =>
              Console.err.println(
                s"[graft] vtable auto-compact at epoch $epochId deferred: $e")
          }
      }
      .start()
}

/** CDC APPLY — streaming UPSERT into the ACID table, exactly-once
  * across restarts: each micro-batch MERGEs by `key` via
  * [[graft.sources.VersionedTable.mergeEpoch]] (epoch-keyed commit, a
  * replayed batch is skipped whole). `orderBy` names a monotonic
  * change-ordering column (CDC sequence number, source timestamp):
  * when a batch carries several changes to one key, only the LATEST
  * survives — resolved inside the batch with a per-key window (batch-
  * sized, not corpus-sized) before the merge, which requires
  * key-unique updates. Without `orderBy` the batch must already be
  * key-unique (the merge raises loudly if not — silent last-wins over
  * an arbitrary order would be a correctness trap).
  *
  * The 100 TB cadence: per batch cost is O(touched files + batch) —
  * manifest stats and bloom sidecars prune the untouched corpus, so a
  * trickle of updates against a huge clustered table rewrites only
  * the files its keys land in, never the table.
  */
final case class VTableMergeSink(dir: String, key: String, checkpoint: String,
    orderBy: Option[String] = None) extends StreamSinkProvider {
  val name = "vtable-merge"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epochId: Long) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{col, row_number}
        val latest = orderBy match {
          case Some(oc) => batch
            .withColumn("__rn", row_number().over(
              Window.partitionBy(key).orderBy(col(oc).desc)))
            .filter(col("__rn") === 1).drop("__rn")
          case None => batch.toDF()
        }
        graft.sources.VersionedTable(batch.sparkSession, dir)
          .mergeEpoch(latest, key, epochId)
        ()
      }
      .start()
}

/** Table→table REPLICATION — apply a versioned table's row-level
  * change feed onto a replica, exactly-once: pair a
  * [[VTableChangeSourceProvider]] stream (commit versions as offsets,
  * `maxVersionsPerTrigger` for bounded backfills) with this sink and
  * the replica CONVERGES to the source snapshot — inserts, updates,
  * and deletes included — via one epoch-keyed
  * [[graft.sources.VersionedTable.applyChangesEpoch]] commit per
  * micro-batch. Defaults speak this engine's own feed dialect
  * (`_change_type` / `_commit_version`); point `orderBy` at any other
  * feed's sequence column to apply foreign CDC. The first batch onto
  * an empty replica seeds it (backfill), every later batch is
  * O(touched files + batch) through stats + bloom pruning.
  */
final case class VTableApplySink(dir: String, key: String, checkpoint: String,
    orderBy: String = graft.sources.VersionedTable.CommitVersionCol,
    changeTypeCol: String = graft.sources.VersionedTable.ChangeTypeCol)
    extends StreamSinkProvider {
  val name = "vtable-apply"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epochId: Long) =>
        graft.sources.VersionedTable(batch.sparkSession, dir)
          .applyChangesEpoch(batch.toDF(), key, orderBy, epochId, changeTypeCol)
        ()
      }
      .start()
}

/** QUALITY-GATED streaming ingest — the dead-letter-queue pattern over
  * two ACID tables. Each micro-batch is split row-wise by a
  * [[graft.operators.Profile.Check]] suite: clean rows land in the
  * main table, violating rows land in a quarantine table with a
  * `violated` column naming every failed check (so an operator can
  * triage, fix, and MERGE the quarantine back). Both appends are
  * epoch-keyed ([[graft.sources.VersionedTable.appendEpoch]]), so a
  * crash between the two writes converges on replay: the landed side
  * skips, the missing side lands — exactly-once per table.
  *
  * At 100 TB the gate adds one predicate projection to the batch — no
  * shuffle, no second scan (the two filters read the same in-memory
  * micro-batch), and quarantine stays small because it only ever holds
  * violations.
  */
final case class QualityGatedVTableSink(dir: String, quarantineDir: String,
    checkpoint: String, checks: Seq[graft.operators.Profile.Check])
    extends StreamSinkProvider {
  require(checks.nonEmpty, "a quality gate needs at least one check")
  val name = "vtable-gated"
  def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epochId: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        // when() without otherwise() yields NULL for passing checks;
        // array_compact drops them, leaving exactly the failed names
        val flagged = batch.toDF().withColumn("__violated",
          array_compact(array(checks.map(c =>
            when(c.violation, lit(c.name))): _*)))
        val good = flagged.filter(size(col("__violated")) === 0)
          .drop("__violated")
        val bad = flagged.filter(size(col("__violated")) > 0)
          .withColumn("violated", concat_ws(",", col("__violated")))
          .drop("__violated")
        graft.sources.VersionedTable(spark, dir).appendEpoch(good, epochId)
        graft.sources.VersionedTable(spark, quarantineDir).appendEpoch(bad, epochId)
        ()
      }
      .start()
}
