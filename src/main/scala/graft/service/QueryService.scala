package graft.service

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.sources.Catalog

/** The reference's query-service contract as a library API.
  *
  * wangpy1995/data-service fronts one shared SparkSession with a Play
  * REST layer (POST /sql → rows, plus source registration and result
  * caching). The HTTP frame is out of scope here (no Play in the
  * build env); this class is the same contract, callable: register
  * sources, run SQL, name + cache results. Any HTTP layer is a thin
  * adapter over these five methods.
  *
  * `registryDir`, when set, makes the catalog SURVIVE process death —
  * the posture a standing data service needs (registrations were
  * session temp views only, so a restart emptied the catalog). Every
  * [[registerSource]] and [[submit]] appends its definition — not its
  * data — to `<registryDir>/_catalog.json` (atomic tmp+move, ordered,
  * latest definition per name wins and replays last so redefinitions
  * can reference earlier names), and a new QueryService pointed at the
  * same directory replays the file at construction. A replay entry
  * that no longer resolves (deleted path, dropped upstream view) is
  * skipped with a stderr note instead of failing startup — one stale
  * table must not take the whole service down.
  *
  * A clone created with `parent` set is an ISOLATED twin: its own
  * SparkSession (`newSession()` — isolated SQL conf and temp views,
  * shared SparkContext and cached data) replaying the parent's
  * definition log at construction, and recording its own definitions
  * back into the SAME registry, so the parent, later clones, and the
  * persisted file all see them. One client's `SET
  * spark.sql.ansi.enabled` can then never change another client's
  * live semantics — the HTTP layer keys clones on a session header.
  */
object QueryService {
  // JVM-wide reference counts for name-keyed caches. The CacheManager
  // is SparkContext-shared, so per-service tracking alone cannot
  // decide eviction: the LAST holder's release is the one that
  // actually uncaches. Keyed by catalog name, like the caches.
  private val cacheHolds =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def retainCache(name: String): Unit = {
    cacheHolds.merge(name, Integer.valueOf(1),
      (a, b) => Integer.valueOf(a.intValue + b.intValue))
    ()
  }

  /** Drop one hold; true when that was the last (caller may evict). */
  private def releaseCacheHold(name: String): Boolean =
    cacheHolds.compute(name, (_, v) =>
      if (v == null || v.intValue <= 1) null
      else Integer.valueOf(v.intValue - 1)) == null

  private def isCacheHeld(name: String): Boolean =
    cacheHolds.containsKey(name)
}

final class QueryService(val spark: SparkSession,
    val registryDir: Option[String] = None,
    parent: Option[QueryService] = None) {

  val catalog = new Catalog(spark)

  /** An isolated-session twin of this service (see class doc). */
  def newIsolated(): QueryService = {
    val s = spark.newSession()
    // runtime-registered functions are session-scoped; re-register
    // (idempotent) so the clone speaks the same SQL dialect
    graft.functions.GraftFunctions.register(s)
    new QueryService(s, registryDir, parent = Some(this))
  }

  /** Version-aware SQL result cache (see [[ResultCache]]); opt-in per
    * call — `sqlJsonCached` — so the plain path stays cache-free.
    */
  lazy val results = new ResultCache(this)

  /** Cached [[sqlJson]]: (page, served-from-cache). Entries key on
    * normalized SQL + the live versions/nonces of every referenced
    * table, so a vtable commit or a re-registered source invalidates
    * dependents automatically.
    */
  def sqlJsonCached(query: String, limit: Int = 1000, offset: Int = 0)
      : (Seq[String], Boolean) =
    results.sqlJson(query, limit, offset)

  /** POST /sql — run a SQL statement, get the result as a DataFrame.
    * The plan stays lazy; callers page/collect as they choose.
    * Versioned-table DML verbs (MERGE INTO / UPDATE / DELETE FROM /
    * DESCRIBE HISTORY) against a registered vtable route to the table
    * API — see [[SqlDml]]; everything else is plain `spark.sql`.
    */
  def sql(query: String): DataFrame =
    SqlDml.dispatch(this, query)
      .orElse(SqlDml.timeTravelSelect(spark, query))
      .getOrElse(spark.sql(InfoSchema.prepare(this, query)))

  /** PARAMETERIZED statement: named markers (`:k`) bind server-side
    * through Spark's own parameterized-SQL API, so client values are
    * VALUES — never spliced text, never an injection surface (the
    * service version of a prepared statement). Parameter markers are
    * for queries; the vtable DML dispatcher and time-travel
    * substitution are text-shaped and deliberately bypassed — a
    * parameterized MERGE fails loudly rather than half-parsing.
    */
  def sql(query: String, args: Map[String, Any]): DataFrame =
    if (args.isEmpty) sql(query)
    else spark.sql(InfoSchema.prepare(this, query), args)

  /** [[sqlJson]] with named parameters — bypasses the result cache
    * (the cache keys on query TEXT; two binds of one text must never
    * share an entry) and the DML dispatcher, like `sql(query, args)`.
    */
  def sqlJson(query: String, args: Map[String, Any], limit: Int,
      offset: Int): Seq[String] =
    if (args.isEmpty) sqlJson(query, limit, offset)
    else jsonRows(spark.sql(InfoSchema.prepare(this, query), args),
      limit, offset)

  /** POSITIONAL parameters (`?` markers, bound left to right) — the
    * JDBC-prepared-statement spelling; same cache/dispatch bypass as
    * the named form.
    */
  def sqlJsonPositional(query: String, args: Seq[Any], limit: Int,
      offset: Int): Seq[String] =
    if (args.isEmpty) sqlJson(query, limit, offset)
    else jsonRows(spark.sql(InfoSchema.prepare(this, query), args.toArray),
      limit, offset)

  /** The reference's REST response shape: one JSON object per row,
    * with null fields RETAINED (`toJSON` would drop the key entirely,
    * giving rows inconsistent shapes — a trap for consumers indexing
    * by field). `limit` is a hard guard — a service must never
    * collect an unbounded result to the driver — and `offset` is the
    * server-driven page cursor (GlobalLimit/Offset execute driver-side
    * on the collected prefix, so a page costs the prefix scan, same as
    * SQL OFFSET). Pages are stable only when the query itself has a
    * deterministic ORDER BY — same contract as SQL paging.
    */
  def sqlJson(query: String, limit: Int = 1000, offset: Int = 0): Seq[String] = {
    // vtable DML arrives here too (SqlDml commits eagerly and already
    // invalidates the cache itself); its one-row version frame pages
    // through the same JSON contract as any result
    SqlDml.dispatch(this, query)
      .orElse(SqlDml.timeTravelSelect(spark, query)) match {
      case Some(dml) => return jsonRows(dml, limit, offset)
      case None      => ()
    }
    val df = spark.sql(InfoSchema.prepare(this, query)) // commands execute eagerly here
    // a command (CREATE/REPLACE VIEW, SET, INSERT...) can re-point
    // names or change session semantics underneath cached entries —
    // tell the cache so it invalidates (coarse, DDL is rare)
    val lp = df.queryExecution.logical
    if (lp.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command] ||
        lp.find(p =>
          p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command] ||
            p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement])
          .isDefined)
      results.noteCommand()
    jsonRows(df, limit, offset)
  }

  /** The service's single DataFrame→JSON-rows contract (nulls
    * RETAINED, bounded collect) — every endpoint serializing rows goes
    * through here so the shape can never drift between them.
    */
  def jsonRows(base: DataFrame, limit: Int, offset: Int = 0): Seq[String] = {
    import org.apache.spark.sql.functions.{struct, to_json, col}
    val df = (if (offset > 0) base.offset(offset) else base).limit(limit)
    df.select(to_json(struct(base.columns.map(col).toSeq: _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Register an external source as a named table. */
  def registerSource(name: String, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val df = catalog.register(name, format, path, options)
    results.noteRegistration(name, format, path)
    registry.recordSource(name, format, path, options)
    df
  }

  /** Run a query and publish the result under a name (temp view) —
    * the reference's named-result workflow.
    */
  def submit(name: String, query: String): DataFrame = {
    // REFUSE info-schema definitions: a submitted view stores its
    // ANALYZED plan, which would bake the backing views' rows at
    // submit time — a catalog listing frozen forever while looking
    // live. Loud beats silently stale; clients query
    // information_schema directly (always fresh by refresh-on-
    // reference). Both literal dialects are checked — a reference is a
    // reference under either.
    require(InfoSchema.rewrite(query).isEmpty &&
      InfoSchema.rewrite(query, backslashEscapes = false).isEmpty,
      "submit: information_schema views snapshot at definition time " +
        "and would serve stale catalog listings — query " +
        "information_schema directly instead")
    val df = spark.sql(query)
    df.createOrReplaceTempView(name)
    // bumps the name's nonce AND taints it if the definition is
    // non-deterministic, so cached queries over the view stay honest
    results.noteSubmission(name, query)
    // record ONLY pure queries: replay runs `spark.sql` on every
    // restart and every isolated-session creation, and a COMMAND
    // (INSERT/SET/DDL) executes eagerly there — recording one would
    // re-run a one-time authorized write N times with no further
    // request. The live submit above still behaves as before; the
    // definition just isn't durable (a command isn't a view anyway).
    if (isPureQuery(query)) registry.recordView(name, query)
    else System.err.println(
      s"[graft] submit '$name': statement is a command — registered live, NOT recorded for replay")
    df
  }

  /** True when `query` parses as a plain query (no Command / INSERT
    * anywhere in the tree) — the only statements safe to re-plan at
    * replay time. Parse failures are NOT pure (never record garbage).
    */
  private def isPureQuery(query: String): Boolean =
    try {
      val plan = spark.sessionState.sqlParser.parsePlan(query)
      !(plan.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command] ||
        plan.find(p =>
          p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command] ||
            p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement])
          .isDefined)
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Remove a registered source or submitted view: the temp view goes
    * from THIS session, the definition from the shared registry (so it
    * neither replays on restart nor seeds future isolated sessions).
    * Sibling sessions that already registered the view keep their live
    * copy until they drop it — temp views are session state. True when
    * the name was known to either.
    */
  def unregister(name: String): Boolean = {
    val dropped = spark.catalog.dropTempView(name)
    val removed = registry.remove(name)
    if (dropped || removed) results.noteRegistration(name, "", "") // nonce bump
    dropped || removed
  }

  // ---- persistent / shared catalog ---------------------------------
  // ONE registry per service family: clones share the parent's (so
  // definitions recorded anywhere replay into every later clone and,
  // when file-backed, persist once). A parentless service without a
  // registryDir gets an in-memory registry — still the clone-seeding
  // log, just not durable.
  private val registry: CatalogRegistry = parent.map(_.registry).getOrElse(
    new CatalogRegistry(registryDir.map(java.nio.file.Paths.get(_))))
  // replay BEFORE the service takes traffic (construction order: the
  // registry loads here, after catalog/results exist). Definitions
  // only — a source re-reads its path, a view re-plans its SQL (lazy:
  // nothing executes until queried).
  registry.replay { entry =>
    try {
      if (entry.kind == "source") {
        catalog.register(entry.name, entry.format, entry.path, entry.options)
        results.noteRegistration(entry.name, entry.format, entry.path)
      } else if (!isPureQuery(entry.query)) {
        // defense in depth vs a hand-edited registry file: replay must
        // never EXECUTE anything — a command here would re-run a write
        // on every restart/session creation
        System.err.println(
          s"[graft] catalog replay: refusing command view '${entry.name}'")
      } else {
        spark.sql(InfoSchema.prepare(this, entry.query))
          .createOrReplaceTempView(entry.name)
        results.noteSubmission(entry.name, entry.query)
      }
      true
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(
        s"[graft] catalog replay: skipping ${entry.kind} '${entry.name}': ${e.getMessage}")
      false
    }
  }

  /** Cache a named table/result by catalog name (survives view
    * re-registration, unlike plan-keyed df.persist).
    */
  def cache(name: String, level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Unit = {
    catalog.cacheTable(name, level)
    if (cachedNames.add(name)) QueryService.retainCache(name)
    ()
  }

  /** Release this service's hold on `name`. The cache itself is only
    * evicted when NO live service holds it: cached plans live in the
    * SparkContext-shared CacheManager, so an unconditional uncache
    * from one HTTP session would silently degrade another session
    * that cached the same name (it keeps "working", just slower —
    * the worst kind of cross-session interference to debug). A name
    * nobody tracked falls through to a plain uncache, preserving the
    * operator's explicit intent.
    */
  def uncache(name: String): Unit = {
    val lastHold =
      if (cachedNames.remove(name)) QueryService.releaseCacheHold(name)
      else !QueryService.isCacheHeld(name)
    if (lastHold) catalog.uncacheTable(name)
    ()
  }

  // names THIS service cached: cached plans live in the SparkContext-
  // shared CacheManager and outlive the session object, so dropping a
  // session must release them explicitly or a cache/drop/recreate
  // cycle accumulates persisted plans forever
  private val cachedNames =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Release every cache hold this service has (called by the HTTP
    * layer's /drop-session and session expiry); each name is evicted
    * only when this was its last holder. Best-effort per name: a view
    * dropped since caching must not block releasing the rest.
    */
  def releaseCaches(): Unit = {
    cachedNames.forEach { n =>
      if (QueryService.releaseCacheHold(n)) {
        try catalog.uncacheTable(n)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    cachedNames.clear()
  }

  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  /** Registry definitions, for catalog introspection ([[InfoSchema]]). */
  private[service] def catalogEntries: Seq[CatalogRegistry.Entry] =
    registry.entriesSnapshot

  /** Column profile of a registered table (one row per column). The
    * HTTP default is `approx=true` — the Expand-free single-pass form
    * is the right default against tables of service scale; exact
    * distincts are an explicit opt-in.
    */
  def profileTable(name: String, approx: Boolean = true): DataFrame =
    (if (approx) profileTableFast(name) else None)
      .getOrElse(graft.operators.Profile.profile(spark.table(name), approx))

  /** Zero-scan profile: when the registered view IS a bare lazy
    * vtable scan (the Catalog's default registration) and the
    * manifest + NDV sidecars cover every column, the profile answers
    * from metadata — no data file opened. None otherwise (view with
    * transformations, non-vtable source, missing sidecar coverage).
    */
  def profileTableFast(name: String): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, View}
    def bareMarker(p: LogicalPlan): Option[graft.plans.VTableRelation] = p match {
      case r: graft.plans.VTableRelation => Some(r)
      case s: SubqueryAlias              => bareMarker(s.child)
      case v: View                       => bareMarker(v.child)
      case _                             => None
    }
    bareMarker(spark.table(name).queryExecution.analyzed).flatMap(r =>
      graft.sources.VersionedTable(spark, r.dir).profileFromMetadata(r.version))
  }

  /** Commit history of a versioned table (DESCRIBE HISTORY): version,
    * op, wall time, file count, stream epoch — newest first.
    */
  def tableHistory(dir: String, maxVersions: Int = 100): DataFrame =
    graft.sources.VersionedTable(spark, dir).history(maxVersions)

  /** O(metadata) table summary: schema + manifest row count, per-column
    * non-null counts and numeric bounds. No data file is opened — the
    * instant complement to the scanning [[profileTable]].
    */
  def tableDescribe(dir: String, version: Int = -1): String =
    graft.sources.VersionedTable(spark, dir).describeJson(version)

  /** Roll a versioned table back to `version` (RESTORE — a new
    * audited commit carrying the old file list; nothing erased).
    * Returns the new version number.
    */
  def restoreTable(dir: String, version: Int): Int =
    graft.sources.VersionedTable(spark, dir).restore(version)

  /** Fork a zero-copy branch at `version` (head when -1); returns the
    * fork version recorded in the branch's provenance.
    */
  def createTableBranch(dir: String, name: String, version: Int = -1): Int = {
    val bt = graft.sources.VersionedTable(spark, dir).createBranch(name, version)
    bt.cloneProvenance(1).map(_._2).getOrElse(-1)
  }

  /** Drop a branch, releasing its holds on the parent's files; false
    * when no such branch exists (idempotent delete, like SQL's).
    */
  def dropTableBranch(dir: String, name: String): Boolean =
    graft.sources.VersionedTable(spark, dir).dropBranch(name)

  /** Merge a branch back (row-level three-way replay with the
    * un-forced conflict proof); returns the parent's new version.
    */
  def mergeTableBranch(dir: String, name: String, key: String,
      force: Boolean = false, dropAfter: Boolean = false): Int =
    graft.sources.VersionedTable(spark, dir)
      .mergeBranch(name, key, force, dropAfter)

  /** Pin an immutable tag at `version` (head when -1); returns the
    * pinned version. Vacuum keeps it live until [[dropTableTag]].
    */
  def createTableTag(dir: String, name: String, version: Int = -1,
      message: String = ""): Int =
    graft.sources.VersionedTable(spark, dir).createTag(name, version, message)

  /** Release a tag's pin; false when no such tag (idempotent). */
  def dropTableTag(dir: String, name: String): Boolean =
    graft.sources.VersionedTable(spark, dir).dropTag(name)

  /** The live tag roster: (tag, pinned version, created-at millis,
    * message — empty when none).
    */
  def tableTags(dir: String): Seq[(String, Int, Long, String)] =
    graft.sources.VersionedTable(spark, dir).tags()

  /** Retroactive snapshot diff between two committed versions —
    * manifest-pruned to files unique to either side.
    */
  def tableDiff(dir: String, v1: Int, v2: Int, key: String): DataFrame =
    graft.sources.VersionedTable(spark, dir).snapshotDiff(v1, v2, key)

  /** Rename a versioned table's column (metadata-only commit via
    * column mapping — no file rewritten). Returns the new version.
    */
  def renameTableColumn(dir: String, oldName: String, newName: String): Int =
    graft.sources.VersionedTable(spark, dir).renameColumn(oldName, newName)

  /** Drop a versioned table's column (metadata-only commit; the
    * storage name retires so a re-add gets fresh storage).
    */
  def dropTableColumn(dir: String, name: String): Int =
    graft.sources.VersionedTable(spark, dir).dropColumn(name)

  /** Add a nullable column to a versioned table (metadata-only
    * commit; existing rows read NULL). `typeDdl` is a Spark DDL type
    * string ("int", "decimal(10,2)", …).
    */
  def addTableColumn(dir: String, name: String, typeDdl: String): Int =
    graft.sources.VersionedTable(spark, dir).addColumn(name,
      org.apache.spark.sql.types.DataType.fromDDL(typeDdl))

  /** Row-level change feed of a versioned table in `(since, until]`
    * (until = -1 reads to the current version). Throws the table's
    * typed ResyncRequired when the window can't be answered — surfaced
    * to HTTP callers as a 409 so they know to re-read the snapshot
    * rather than retry.
    */
  def tableChanges(dir: String, since: Int, until: Int = -1): DataFrame =
    graft.sources.VersionedTable(spark, dir).readChangesSince(since, until)

  /** Predicate DELETE on a versioned table (retention sweeps over
    * HTTP). Stats-pruned: only files whose committed min/max overlap
    * the predicate are rewritten. Returns the new committed version.
    */
  def deleteWhere(dir: String, where: String): Int =
    graft.sources.VersionedTable(spark, dir)
      .deleteWhere(org.apache.spark.sql.functions.expr(where))

  /** Predicate UPDATE on a versioned table; assignments are SQL
    * expressions over the row's OLD values. Returns the new version.
    */
  def updateWhere(dir: String, where: String, set: Map[String, String]): Int =
    graft.sources.VersionedTable(spark, dir).updateWhere(
      org.apache.spark.sql.functions.expr(where),
      set.map { case (c, e) => c -> org.apache.spark.sql.functions.expr(e) })

  /** APPLY CHANGES INTO a versioned table over the service: `table`
    * names a REGISTERED view holding the change batch (change-type +
    * ordering columns included), applied as one copy-on-write commit
    * — mixed upserts and deletes, highest-`orderBy` change wins per
    * key. Returns the new committed version.
    */
  def applyTableChanges(dir: String, table: String, key: String,
      orderBy: String = graft.sources.VersionedTable.CommitVersionCol,
      changeType: String = graft.sources.VersionedTable.ChangeTypeCol): Int =
    graft.sources.VersionedTable(spark, dir)
      .applyChanges(spark.table(table), key, orderBy, changeType)

  /** Evaluate a named constraint suite over a registered table — each
    * violation predicate is a SQL boolean marking BAD rows; all checks
    * run in ONE conditional-agg pass.
    */
  def checkConstraints(table: String, checks: Seq[(String, String)]): DataFrame =
    graft.operators.Profile.checkConstraints(spark.table(table),
      checks.map { case (n, v) =>
        graft.operators.Profile.Check(n, org.apache.spark.sql.functions.expr(v)) })

  /** EXPLAIN endpoint: the optimized + physical plan for a statement
    * without executing it. Goes through SQL `EXPLAIN FORMATTED` —
    * `spark.sql(query).queryExecution` would EXECUTE command plans
    * (INSERT/DROP run eagerly at Dataset construction since Spark
    * 3.2); the EXPLAIN command only ever plans its child.
    */
  def explain(query: String): String =
    spark.sql(s"EXPLAIN FORMATTED $query").head().getString(0)
}
