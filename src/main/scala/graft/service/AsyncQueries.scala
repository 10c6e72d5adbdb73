package graft.service

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

/** Asynchronous query jobs over a [[QueryService]] — the capability a
  * real SQL service needs once a query outlives an HTTP round-trip:
  * submit → job id immediately, poll status, page the cached result,
  * cancel. Each job runs in its own Spark job group (tagged
  * `graft-async-<id>`), so cancel maps to `cancelJobGroup` and a
  * runaway async query dies without touching its neighbors.
  *
  * Results are collected through the same hard `maxRows` cap as the
  * synchronous path (a service never streams an unbounded result into
  * the shared driver) and paged from the driver-cached rows —
  * repeated pages cost nothing after completion.
  *
  * The registry is bounded: finished jobs beyond `retainJobs` are
  * evicted oldest-first (their cached rows freed with them). A poll
  * for an evicted id reports "unknown" — consumers page results
  * promptly, same contract every job API has.
  */
final class AsyncQueries(service: QueryService, maxRows: Int = 10000,
    retainJobs: Int = 64, maxConcurrent: Int = 4) {

  import AsyncQueries.{Done, Failed, Running, State}

  private final class Job(val id: String, val submittedAtNanos: Long) {
    val state = new AtomicReference[State](Running)
  }

  private val jobs = new ConcurrentHashMap[String, Job]()
  // fixed pool = the async concurrency bound; excess jobs queue (their
  // status stays "running" until a slot frees — a queue position, not
  // a lie: the work is admitted)
  private val pool = Executors.newFixedThreadPool(maxConcurrent)

  /** Submit; returns the job id immediately. */
  def start(query: String, limit: Int = 1000): String = {
    val id = java.util.UUID.randomUUID().toString.take(12)
    val job = new Job(id, System.nanoTime())
    jobs.put(id, job)
    pool.execute { () =>
      val sc = service.spark.sparkContext
      sc.setJobGroup(s"graft-async-$id", s"async query $id", interruptOnCancel = true)
      try job.state.set(Done(service.sqlJson(query, math.min(limit, maxRows))))
      catch { case scala.util.control.NonFatal(e) => job.state.set(Failed(e.toString)) }
      finally sc.clearJobGroup()
      evictBeyondRetention()
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
  def result(id: String, offset: Int = 0, limit: Int = 1000): Option[Seq[String]] =
    Option(jobs.get(id)).map(_.state.get()).collect {
      case Done(rows) => rows.slice(offset, offset + math.max(limit, 0))
    }

  /** Cancel the job's running Spark jobs (no-op when finished/unknown;
    * the job then lands as "failed" with the cancellation message).
    */
  def cancel(id: String): Unit =
    service.spark.sparkContext.cancelJobGroup(s"graft-async-$id")

  private def evictBeyondRetention(): Unit = {
    import scala.jdk.CollectionConverters._
    val finished = jobs.asScala.values
      .filter(_.state.get() != Running).toSeq.sortBy(_.submittedAtNanos)
    finished.dropRight(retainJobs).foreach(j => jobs.remove(j.id))
  }

  def shutdown(): Unit = {
    pool.shutdown()
    pool.awaitTermination(5, TimeUnit.SECONDS)
    ()
  }
}

object AsyncQueries {
  sealed trait State
  case object Running extends State
  final case class Done(rows: Seq[String]) extends State
  final case class Failed(error: String) extends State
}
