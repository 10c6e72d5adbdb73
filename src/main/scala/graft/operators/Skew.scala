package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew-handling utilities for joins whose hot keys would otherwise
  * pin one reducer (the classic 100 TB failure mode). AQE's skew-join
  * splitting covers sort-merge joins at runtime; explicit salting is
  * for when the skew is known and extreme (a null-ish key, a
  * power-law entity), or for aggregations.
  */
object Skew {

  /** Salted equi-join: the left side spreads each key over `salts`
    * sub-keys; the right side replicates `salts`-fold. The salt is a
    * DETERMINISTIC hash of the whole left row — critical on a real
    * cluster: a nondeterministic salt (rand, monotonic id) becomes a
    * shuffle key, and partial task re-execution after a fetch failure
    * would re-salt rows into different reducers, dropping or
    * duplicating join output. The cost: byte-identical duplicate rows
    * of a hot key share a salt and don't spread — acceptable, since
    * real payload rows differ.
    *
    * Use when right is small-ish (replication cost = |right|·salts);
    * for two huge skewed sides prefer AQE skew splitting or isolating
    * the hot keys into a broadcast sub-join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts.toLong)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    l.join(r, l(key) === r(key) && l("_salt") === r("_salt"))
      .drop(r(key)).drop(l("_salt")).drop(r("_salt"))
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final on key. For algebraic
    * aggregates Spark's hash-agg already does this map-side; this
    * explicit form is for when rows-per-group must be bounded per
    * task (e.g. collecting bounded samples per hot key).
    */
  def twoPhaseCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("cnt"))

  /** Contract query: salted fact⋈dim join + aggregation, DuckDB-oracled
    * against the PLAIN join — result identity under salting is the
    * whole point of the transform, so it's checked by the gate, not
    * just the spec.
    */
  def qSaltedJoin(t: Tables): DataFrame = {
    import graft.operators.Rnd.round
    val l = t.orders.select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val r = t.customer.select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    saltedJoin(l, r, "custkey", salts = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment")
  }
}
