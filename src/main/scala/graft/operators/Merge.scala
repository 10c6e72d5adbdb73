package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot upsert without a table format: MERGE semantics (update
  * matched keys, insert new ones) as a keyed full-outer coalesce.
  * With both sides bucketed on the key (BucketJoinSpec pattern) the
  * join is shuffle-free; output overwrites the snapshot partition-
  * atomically at the sink. This is the pre-Delta/Iceberg pattern a
  * plain-parquet service uses for slowly-changing reference data.
  */
object Merge {

  /** `snapshot ⟵ updates` by `key`: update rows present in both,
    * keep unmatched snapshot rows, insert unmatched update rows.
    * Row-level selection (a presence flag, not per-column coalesce —
    * coalesce would resurrect stale snapshot values under legit NULL
    * updates). Schemas must match.
    */
  def upsert(snapshot: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(snapshot.columns.sameElements(updates.columns),
      s"schema mismatch: ${snapshot.columns.toSeq} vs ${updates.columns.toSeq}")
    require(!snapshot.columns.contains("__graft_from_u"),
      "column name __graft_from_u is reserved by upsert")
    val cols = snapshot.columns.filterNot(_ == key)
    // A null merge key never matches in SQL (null = null is false), so
    // a null-key update would silently be retained ALONGSIDE a
    // null-key snapshot row — almost always a data bug. Raise at scan
    // time on either side instead of choosing a surprising semantic.
    def checkedKey(side: String) = when(col(key).isNull,
      raise_error(lit(s"upsert: null $key in $side"))).otherwise(col(key)).as(key)
    // SQL MERGE rejects multiple source rows per key; mirror that with
    // a runtime raise instead of silently duplicating snapshot rows
    val dupGuard = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val u = updates
      .withColumn(key, checkedKey("updates"))
      .withColumn("__graft_from_u",
        when(count(lit(1)).over(dupGuard) > 1,
          raise_error(concat(lit(s"upsert: multiple update rows for $key="),
            col(key).cast("string"))))
          .otherwise(lit(true)))
      .as("u")
    val s = snapshot.withColumn(key, checkedKey("snapshot")).as("s")
    s.join(u, col(s"s.$key") === col(s"u.$key"), "full_outer")
      .select(
        coalesce(col(s"u.$key"), col(s"s.$key")).as(key) +:
          cols.map(c =>
            when(col("u.__graft_from_u"), col(s"u.$c")).otherwise(col(s"s.$c")).as(c)): _*)
  }
}
