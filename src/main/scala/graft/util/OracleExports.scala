package graft.util

/** Per-run export root for oracle DECISION-REPLAY inputs.
  *
  * Some operators (MinHash/LSH banding, k-means cell assignment) use
  * functions that are not ANSI-SQL-expressible, but everything
  * DOWNSTREAM of them is — so the contract query exports the
  * non-SQL intermediate (band tables, cell assignments) as parquet,
  * and the DuckDB oracle re-derives the final decision set from those
  * bytes in plain SQL. The oracle SQL interpolates this path at dump
  * time (same JVM, same path), and the gate's DuckDB run happens
  * after this JVM exits — which is why exports are NOT
  * delete-on-exit temp dirs.
  *
  * Scoped per-user AND per-process: two concurrent verify/bench runs
  * on one host must not overwrite each other's exports (the replay
  * would silently compare mismatched inputs), and a fixed
  * world-writable literal could be pre-created or symlinked by any
  * local user.
  */
object OracleExports {
  val Base: String = {
    val user = System.getProperty("user.name", "unknown")
      .replaceAll("[^A-Za-z0-9_-]", "_")
    val tmp = System.getProperty("java.io.tmpdir", "/tmp")
    s"$tmp/graft_oracle_${user}_${ProcessHandle.current().pid()}"
  }

  def dir(sub: String): String = s"$Base/$sub"

  /** Exports are VERIFICATION instrumentation, off by default:
    * `graft.Verify` (the correctness gate's runner) switches them on
    * before running the contract queries, so its oracle replays have
    * their inputs — while the bench and any production caller run the
    * pure operator, unbilled for parquet writes the oracle alone
    * consumes. (Round-11 measurement: the always-on exports added
    * 1.5–2.4× to exactly the exporting queries' bench times.)
    */
  @volatile var enabled: Boolean = false

  /** Write `df`'s `cols` projection for the oracle when enabled. */
  def export(df: org.apache.spark.sql.DataFrame, sub: String): Unit =
    if (enabled) {
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir(sub))
      ()
    }

  /** Export-and-read-back when enabled (the exporting queries' joins
    * then provably consume the SAME bytes the oracle replays); the
    * unchanged lazy frame otherwise.
    */
  def materialize(df: org.apache.spark.sql.DataFrame,
      sub: String): org.apache.spark.sql.DataFrame =
    if (!enabled) df
    else {
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir(sub))
      df.sparkSession.read.parquet(dir(sub))
    }
}
