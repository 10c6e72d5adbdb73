package graft.service

import java.util.concurrent.{ConcurrentHashMap, Executors, RejectedExecutionException, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

/** Asynchronous query jobs over a [[QueryService]] — the capability a
  * real SQL service needs once a query outlives an HTTP round-trip:
  * submit → job id immediately, poll status, page the cached result,
  * cancel. Each job runs in its own Spark job group (tagged
  * `graft-async-<id>`), so cancel maps to `cancelJobGroup` and a
  * runaway async query dies without touching its neighbors.
  *
  * Cancellation is three-layered, because each layer has a blind
  * spot: a FLAG (covers queued jobs and results that raced the
  * cancel — cancellation wins; "you cancelled it but it completed
  * anyway" is not an answer a client can act on), an immediate
  * `cancelJobGroup` (covers Spark jobs already registered), and a
  * job-start reaper listener (covers jobs that REGISTER after the
  * cancel — the DAGScheduler can register a job hundreds of ms after
  * submission, and an unreaped orphan scanning 10^12 rows would hog
  * every task slot and starve the whole service).
  *
  * Results are collected through the same hard `maxRows` cap as the
  * synchronous path (a service never streams an unbounded result into
  * the shared driver) and paged from the driver-cached rows —
  * repeated pages cost nothing after completion.
  *
  * Admission and retention are both bounded: at most
  * `maxConcurrent * 4` unfinished jobs may exist (further submits
  * throw [[AsyncQueries.TooManyJobsException]] → 503 at the HTTP
  * layer — the async mirror of the sync path's load shed), and
  * finished jobs beyond `retainJobs` are evicted oldest-first (their
  * cached rows freed with them). A poll for an evicted id reports
  * "unknown" — consumers page results promptly, same contract every
  * job API has.
  */
final class AsyncQueries(service: QueryService, maxRows: Int = 10000,
    retainJobs: Int = 64, maxConcurrent: Int = 4) {

  import AsyncQueries.{Done, Failed, Running, State, TooManyJobsException}

  private final class Job(val id: String, val submittedAtNanos: Long) {
    val state = new AtomicReference[State](Running)
    val cancelRequested = new AtomicBoolean(false)
  }

  private val jobs = new ConcurrentHashMap[String, Job]()
  // fixed pool = the async concurrency bound; admitted excess queues
  // (bounded by the admission check in start)
  private val pool = Executors.newFixedThreadPool(maxConcurrent)

  // Cancellation vs registration race: a Spark job can REGISTER in the
  // DAGScheduler hundreds of ms after the driver thread that submitted
  // it was interrupted — cancelJobGroup at cancel (or reap) time finds
  // nothing, then the orphan starts, hogs every task slot, and starves
  // all later queries. The listener closes the race from the other
  // side: any job that starts under a cancelled group is killed the
  // moment it registers, whenever that is.
  private val cancelledGroups =
    ConcurrentHashMap.newKeySet[String]()
  private val reaper = new org.apache.spark.scheduler.SparkListener {
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      // properties is nullable on the event (Spark's own listeners
      // Option-wrap it); an NPE here would just be swallowed by the
      // listener bus and silently disable the reaper
      for {
        p <- Option(js.properties)
        g <- Option(p.getProperty("spark.jobGroup.id"))
        if cancelledGroups.contains(g)
      } service.spark.sparkContext.cancelJob(js.jobId, s"async group $g cancelled")
  }
  service.spark.sparkContext.addSparkListener(reaper)

  private def unfinishedCount: Int = {
    import scala.jdk.CollectionConverters._
    jobs.asScala.values.count(_.state.get() == Running)
  }

  private val admission = new Object

  /** Submit; returns the job id immediately, or throws
    * TooManyJobsException when the unfinished-job bound is hit.
    */
  /** `svc` overrides which service EXECUTES the statement (the HTTP
    * layer passes a per-client isolated session); job bookkeeping,
    * admission, and the reaper stay on the constructor service's
    * shared SparkContext, which every isolated session shares.
    * `onComplete` fires exactly once when the job reaches a terminal
    * state (done, failed, or cancelled) — the HTTP layer uses it to
    * keep the submitting session marked busy for the job's whole
    * lifetime, not just the submit round-trip, so idle-session expiry
    * can never tear down a session with a live async job.
    */
  def start(query: String, limit: Int = 1000,
      svc: QueryService = service, onComplete: () => Unit = () => (),
      args: Map[String, Any] = Map.empty,
      posArgs: Seq[Any] = Seq.empty): String = {
    val id = java.util.UUID.randomUUID().toString.take(12)
    val job = new Job(id, System.nanoTime())
    // check-and-admit under one lock: concurrent submits must not both
    // pass the guard and breach the documented hard bound
    admission.synchronized {
      if (unfinishedCount >= maxConcurrent * 4)
        throw new TooManyJobsException(
          s"too many unfinished async jobs (bound ${maxConcurrent * 4}); " +
            "poll or cancel existing jobs")
      jobs.put(id, job)
    }
    try pool.execute { () =>
      // eviction runs even when a fatal throwable propagates below —
      // otherwise finished jobs (and their cached rows) linger until
      // some later completion happens to sweep them
      try {
        // every terminal transition is a CAS from Running: cancel()
        // itself CASes to Failed("cancelled") the moment the client is
        // told, so a completion racing the cancel can never overwrite
        // it — "you cancelled it but it completed anyway" stays
        // impossible no matter how the flag check interleaves
        if (job.cancelRequested.get)
          job.state.compareAndSet(Running, Failed("cancelled before start"))
        else {
          val sc = service.spark.sparkContext
          sc.setJobGroup(s"graft-async-$id", s"async query $id", interruptOnCancel = true)
          try {
            val cap = math.min(limit, maxRows)
            // parameterized jobs bind through the same value-only API
            // as the synchronous path (named :k / positional ?)
            val rows =
              if (args.nonEmpty) svc.sqlJson(query, args, cap, 0)
              else if (posArgs.nonEmpty) svc.sqlJsonPositional(query, posArgs, cap, 0)
              else svc.sqlJson(query, cap)
            if (job.cancelRequested.get)
              job.state.compareAndSet(Running, Failed("cancelled"))
            else job.state.compareAndSet(Running, Done(rows))
          }
          catch {
            // record a terminal state for EVERY throwable — a fatal
            // error escaping with the job still Running would pin an
            // admission slot forever; fatal ones propagate after
            case t: Throwable =>
              job.state.compareAndSet(Running, Failed(
                if (job.cancelRequested.get) s"cancelled: $t" else t.toString))
              if (!scala.util.control.NonFatal(t)) throw t
          }
          finally sc.clearJobGroup()
        }
        ()
      } finally {
        try onComplete() finally evictBeyondRetention()
      }
    } catch {
      case e: RejectedExecutionException =>
        // shutdown race: the entry must not linger as a forever-running
        // job — and the caller's completion hook must still fire, or
        // the submitting session would stay marked busy forever
        jobs.remove(id)
        try onComplete() catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    id
  }

  /** "running" | "done" | "failed" | "unknown" (+ row count when done). */
  def status(id: String): (String, Option[Int], Option[String]) =
    Option(jobs.get(id)).map(_.state.get()) match {
      case None            => ("unknown", None, None)
      case Some(Running)   => ("running", None, None)
      case Some(Done(rs))  => ("done", Some(rs.size), None)
      case Some(Failed(e)) => ("failed", None, Some(e))
    }

  /** Page a finished job's cached rows; None until done (or unknown). */
  def result(id: String, offset: Int = 0, limit: Int = 1000): Option[Seq[String]] = {
    require(offset >= 0, s"offset must be non-negative, got $offset")
    require(limit > 0, s"limit must be positive, got $limit")
    Option(jobs.get(id)).map(_.state.get()).collect {
      case Done(rows) => rows.slice(offset, offset + limit)
    }
  }

  /** Cancel: mark the job (covers queued / not-yet-started work),
    * register its group with the start-time reaper (covers jobs that
    * REGISTER after this call), and kill its already-running Spark
    * jobs. No-op for finished/unknown ids. A cancel that lands during
    * query planning takes effect at the first Spark job — planning
    * itself is not interruptible, deliberately: thread interrupts
    * mid-planning destabilize shared session state.
    */
  def cancel(id: String): Unit = {
    Option(jobs.get(id)).foreach { j =>
      j.cancelRequested.set(true)
      cancelledGroups.add(s"graft-async-$id")
      // the decisive step: once this CAS lands (job was Running), the
      // outcome IS cancelled — a completion racing us finds the state
      // taken and its CAS fails, so the result never surfaces as done
      j.state.compareAndSet(Running, Failed("cancelled"))
      ()
    }
    service.spark.sparkContext.cancelJobGroup(s"graft-async-$id")
  }

  private def evictBeyondRetention(): Unit = {
    import scala.jdk.CollectionConverters._
    val finished = jobs.asScala.values
      .filter(_.state.get() != Running).toSeq.sortBy(_.submittedAtNanos)
    finished.dropRight(retainJobs).foreach { j =>
      jobs.remove(j.id)
      cancelledGroups.remove(s"graft-async-${j.id}")
      ()
    }
  }

  def shutdown(): Unit = {
    // shutdown (NOT shutdownNow): queued jobs still execute and reach a
    // terminal state, and no worker is interrupted mid-planning — the
    // hazard the cancel path deliberately avoids applies doubly here,
    // on a SparkContext that outlives this service.
    pool.shutdown()
    // the reaper may only go once the drain REALLY finished — a job
    // cancelled near shutdown can still register its Spark job while
    // workers wind down. On a slow drain the listener stays registered:
    // one idle listener on the outliving context is a bounded cost;
    // an unreaped orphan scan is not.
    if (pool.awaitTermination(10, TimeUnit.SECONDS))
      service.spark.sparkContext.removeSparkListener(reaper)
    ()
  }
}

object AsyncQueries {
  sealed trait State
  case object Running extends State
  final case class Done(rows: Seq[String]) extends State
  final case class Failed(error: String) extends State

  /** Admission bound hit — the async mirror of the sync 503 shed. */
  final class TooManyJobsException(msg: String) extends RuntimeException(msg)
}
