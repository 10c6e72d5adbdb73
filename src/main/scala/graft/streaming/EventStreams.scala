package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.7).
  *
  * The reference is a batch SQL service; this is the added streaming
  * surface: the same event schema consumed incrementally. Both
  * pipelines are pure `readStream → transform → writeStream` plans —
  * at scale the source becomes Kafka and the sink a parquet/Delta
  * table, with no code change above the source/sink lines.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Int)

  case class SessionOut(user_id: Long, n_events: Int, dur_sec: Long)

  /** Windowed aggregation with a watermark: tumbling 1-hour windows
    * per event type. The watermark bounds state (windows older than
    * the watermark are evicted), so state size is O(active windows ×
    * types) regardless of stream length. Mirrors the batch
    * `q_events_hourly` oracle.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Windowed APPROXIMATE cardinality under a watermark: distinct
    * users per hour as an HLL sketch aggregation. COUNT(DISTINCT) is
    * unsupported in streaming for the same reason it hurts in batch —
    * exact distinct state is unbounded per window — while the sketch
    * keeps O(KB) state per (window) group and merges monotonically
    * across micro-batches, so this is THE way to watch unique-visitor
    * cardinality on an unbounded stream. rsd defaults to Spark's 5%;
    * the batch HLL rewrite rule (ApproxDistinctRewrite) makes the same
    * trade opt-in for batch SQL.
    */
  def hourlyUniqueUsers(events: DataFrame, watermark: String = "2 hours",
      rsd: Double = 0.05): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("approx_users"), col("n_events"))

  /** Windowed QUANTILES under a watermark: per-hour p50/p95 of the
    * value column via the KLL sketch aggregate — the latency-SLO /
    * value-distribution monitor exact percentiles cannot provide on a
    * stream (per-window sorted state is unbounded; the sketch keeps
    * O(KB) state per window and merges monotonically across
    * micro-batches, like the HLL cardinality twin above). The sketch
    * BYTES could be emitted instead to a store for later cross-window
    * re-aggregation — `kll_merge_agg` over the stored column.
    */
  def hourlyQuantiles(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.GraftFunctions
        .kllSketchAgg(col("value").cast("double")).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        round(graft.functions.GraftFunctions.kllValue(col("sk"), 0.5), 4).as("p50"),
        round(graft.functions.GraftFunctions.kllValue(col("sk"), 0.95), 4).as("p95"),
        col("n_events"))

  /** Windowed DISTINCT-KEY SKETCHES under a watermark: per-hour Theta
    * sketch BYTES of `user_id`, plus their estimate — the streaming
    * feed of the stored-sketch rollups (the set-algebra twin of
    * [[hourlyUniqueUsers]] and the key-domain sibling of
    * [[hourlyQuantiles]]). Downstream stores the emitted bytes and
    * answers ANY later cross-window question from them — overlap
    * (retention: `theta_intersect_agg`), reach (`theta_union_agg`),
    * churn (`theta_anotb`) — without re-touching raw events;
    * operations the HLL cardinality twin structurally cannot do.
    * O(KB) state per window, merging monotonically across
    * micro-batches. `lgK` is build-time precision (exact below 2^lgK
    * distincts per window); pass the same value to the re-aggregation
    * gadgets so roll-ups never silently degrade.
    */
  def hourlyKeySketches(events: DataFrame, watermark: String = "2 hours",
      lgK: Int = 12): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.GraftFunctions.thetaSketchAgg(col("user_id"), lgK).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("sk"),
        graft.functions.GraftFunctions.thetaEstimate(col("sk"))
          .cast("long").as("approx_users"),
        col("n_events"))

  /** NATIVE session windows in a stream: the same
    * `session_window` grouping the batch `Sessionize.qSessionWindow`
    * uses, under a watermark — Spark merges windows as late events
    * arrive and EMITS a session once the watermark passes its close
    * (append mode), evicting its state. This is the declarative twin
    * of the flatMapGroupsWithState `sessionize` below: no custom state
    * type, no timeout bookkeeping — the trade is less control over
    * emit timing (no mid-session progress events).
    */
  def sessionCounts(events: DataFrame, gapSec: Long = 600,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Streaming trending terms: the Misra-Gries sketch
    * ([[graft.functions.TopKAgg]]) as windowed streaming state — per
    * window, at most `capacity` counters live in the state store
    * whatever the term cardinality, which is the property that keeps a
    * "what's trending" aggregation viable over an unbounded
    * high-cardinality stream (an exact per-term count would grow state
    * with the vocabulary). Watermarked windows evict like any
    * streaming agg; counts are exact while a window's observed terms
    * fit the capacity (TopKAgg's contract), sketch-bounded beyond.
    */
  def trendingTerms(events: DataFrame, watermark: String = "2 hours",
      capacity: Int = 64): DataFrame = {
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKAgg(capacity),
      org.apache.spark.sql.Encoders.STRING)
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(mg(col("event_type")).as("terms"))
      .select(col("window.start").as("window_start"), explode(col("terms")).as(Seq("term", "cnt")))
  }

  /** Streaming exact dedup — the streaming twin of batch
    * `Dedup.qDedupExact`: drop events whose dedup key was already seen
    * within the watermark horizon. State is keyed on the (tiny) key
    * column, and the watermark bounds it — keys older than the horizon
    * are evicted, so state is O(keys per horizon) regardless of stream
    * length. This is how exactly-once ingest absorbs at-least-once
    * upstream delivery (Kafka producer retries, replayed batches).
    */
  def dedupStream(events: DataFrame, keyCol: String = "event_id",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Stream-stream interval join: clicks joined to the same user's
    * purchases within `windowSec` AFTER the click (attribution). Both
    * sides carry watermarks, and the time-bound condition lets the
    * engine evict state once the watermark passes — without the bound
    * a stream-stream join buffers forever. The streaming twin of the
    * batch RangeJoin.
    */
  def clickPurchaseAttribution(events: DataFrame, windowSec: Long = 300,
      watermark: String = "10 minutes"): DataFrame =
    attributionJoin(events, windowSec, watermark, "inner")
      .select("click_id", "purchase_id", "user_id", "value")

  /** ONE prep + interval-join body for all three attribution variants
    * — a fix to the window condition or watermark handling must hit
    * inner, left-outer, and full-outer alike, or the variants drift
    * into silently different attribution windows.
    */
  private def attributionJoin(events: DataFrame, windowSec: Long,
      watermark: String, joinType: String): DataFrame = {
    val base = events.withColumn("ts", col("ts").cast("timestamp"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSec SECONDS"),
      joinType)
  }

  /** LEFT OUTER stream-stream interval join: like
    * [[clickPurchaseAttribution]], but every click eventually emits —
    * matched rows as soon as the purchase arrives, UNMATCHED clicks
    * with null purchase columns once the watermark passes the end of
    * their attribution window (only then can the engine PROVE no
    * matching purchase can still arrive; outer results are inherently
    * watermark-delayed). Same state-eviction bound as the inner form —
    * the join never buffers past watermark + window. This is the
    * conversion-funnel shape: the null rows ARE the
    * clicked-but-never-purchased cohort, produced incrementally
    * instead of by a batch anti-join over the full history.
    */
  def clickPurchaseAttributionOuter(events: DataFrame, windowSec: Long = 300,
      watermark: String = "10 minutes"): DataFrame =
    attributionJoin(events, windowSec, watermark, "leftOuter")
      .select("click_id", "purchase_id", "user_id", "value")

  /** FULL OUTER stream-stream interval join: both unmatched sides
    * eventually emit — unmatched clicks with null purchase columns
    * AND unmatched purchases with null click columns, each once its
    * own side's watermark proves no partner can still arrive. The
    * purchase-side nulls are the orphan-conversion cohort (purchases
    * with no attributable click: lost tracking, direct entry) that
    * the left-outer form silently drops — attribution QA needs both
    * null populations. Same bounded state as the inner form: the
    * interval condition caps both buffers at watermark + window.
    */
  def clickPurchaseAttributionFull(events: DataFrame, windowSec: Long = 300,
      watermark: String = "10 minutes"): DataFrame =
    attributionJoin(events, windowSec, watermark, "fullOuter")
      .select(col("click_id"), col("purchase_id"),
        coalesce(col("user_id"), col("p_user")).as("user_id"), col("value"))

  /** Stream-static enrichment: each streaming event joined to a
    * STATIC dimension frame (user → segment, product → category). The
    * static side is planned per micro-batch as an ordinary batch join
    * — Spark broadcasts it when it fits — and needs no watermark or
    * join state at all: the canonical way to attach slowly-changing
    * reference data to a stream without paying a stream-stream join's
    * state cost. Left join so unmatched events pass through (an
    * enrichment must never drop facts). At scale the dimension is a
    * vtable snapshot: upstream MERGEs land in the table, and a
    * restart (or per-trigger re-read under availableNow) picks them
    * up with no change to the streaming plan.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    // no broadcast hint: the engine broadcasts when the dim fits the
    // threshold and falls back to a shuffled join when it doesn't — a
    // forced hint would OOM on a dimension too big to collect
    events.join(dim, Seq(key), "left")

  case class BucketState(tokens: Double, lastSec: Long)

  case class RateDecision(user_id: Long, event_id: Long, admitted: Boolean)

  /** Per-key token-bucket rate limiter (ingest protection for the
    * quality-gated pipeline): each key holds a bucket of `burst`
    * tokens refilling at `ratePerSec` in EVENT time; each event
    * consumes one token or, when the bucket is dry, is tagged
    * throttled. Emitting every event TAGGED (never silently dropped)
    * lets the caller route throttled traffic to the dead-letter table
    * the quality gate already maintains — throttling is a data-loss
    * decision and must stay auditable.
    *
    * Event-time refill makes the decision independent of WALL-CLOCK
    * replay timing (processing-time buckets re-admit different events
    * after a checkpoint recovery, silently breaking exactly-once
    * sinks): for a per-key IN-ORDER stream the admitted set is a pure
    * function of the event sequence. Within a batch events order by
    * (ts, event_id); a LATE event (ts behind the bucket clock) gets
    * zero refill — the conservative call — but its decision can still
    * depend on which micro-batch boundary it landed behind, so a
    * pipeline that needs bit-identical decisions under out-of-order
    * delivery should watermark-sort upstream first. State is one
    * (tokens, lastSec) pair per ACTIVE key — O(keys), the same bound
    * every keyed-state operator here carries; at 100 TB the keys
    * shard across executors with the state store.
    */
  def rateLimit(events: Dataset[Event], ratePerSec: Double, burst: Double)
      (implicit spark: SparkSession): Dataset[RateDecision] = {
    import spark.implicits._
    require(ratePerSec > 0 && burst >= 1, "need ratePerSec > 0 and burst >= 1")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[BucketState]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption.getOrElse(BucketState(burst, Long.MinValue))
          val out = sorted.map { e =>
            val sec = e.ts.getTime / 1000
            val refilled =
              if (cur.lastSec == Long.MinValue) burst
              else math.min(burst,
                cur.tokens + (sec - cur.lastSec).max(0L) * ratePerSec)
            val admit = refilled >= 1.0
            cur = BucketState(if (admit) refilled - 1.0 else refilled,
              math.max(sec, cur.lastSec))
            RateDecision(userId, e.event_id, admit)
          }
          state.update(cur)
          out.iterator
        })
  }

  /** Stateful gap sessionization via flatMapGroupsWithState: one state
    * record per active user. With `idleFlushMs > 0` (default 2× the
    * gap) a processing-time timeout flushes and evicts idle users'
    * open sessions — state stays O(active users) and a user who stops
    * sending still gets their final session emitted. Pass
    * `idleFlushMs <= 0` to disable (deterministic tests: pending
    * timers keep `processAllAvailable` from quiescing). The default
    * derives from gapSec directly — no sentinel value exists, so no
    * negative number secretly re-enables the timer.
    * The streaming twin of operators.Sessionize.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800)
      (implicit spark: SparkSession): Dataset[SessionOut] =
    sessionize(events, gapSec, gapSec * 2000)

  def sessionize(events: Dataset[Event], gapSec: Long, idleFlushMs: Long)
      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val flushMs = idleFlushMs
    val timeoutConf = if (flushMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // idle user: close + evict the open session
            val out = state.getOption.map(s => SessionOut(userId, s.n, s.last - s.start))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.last <= gapSec =>
                  // a LATE cross-batch event (sec < last) merges but
                  // must not move the session window backward: keep
                  // last/start monotone or durations go negative and
                  // the next gap is measured from the wrong edge
                  cur = Some(s.copy(start = math.min(s.start, sec),
                    last = math.max(s.last, sec), n = s.n + 1))
                case Some(s) =>
                  out += SessionOut(userId, s.n, s.last - s.start)
                  cur = Some(SessionState(sec, sec, 1))
                case None =>
                  cur = Some(SessionState(sec, sec, 1))
              }
            }
            cur.foreach(state.update)
            if (flushMs > 0) state.setTimeoutDuration(flushMs)
            out.iterator
          }
        })
  }
}
