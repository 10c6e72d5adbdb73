package graft.service

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable, View}

import graft.plans.VTableRelation
import graft.sources.VersionedTable

/** SQL-statement surface for versioned-table DML and maintenance.
  *
  * The service's pitch is "submit SQL" (the reference is a REST SQL
  * service), but Spark's own analyzer rejects `MERGE INTO` / `UPDATE`
  * / `DELETE FROM` against anything that is not a DSv2 row-level
  * table — so a user typing the standard verbs at `POST /sql` against
  * a registered vtable view would get an AnalysisException even though
  * the table API supports every one of those operations. This
  * dispatcher closes the gap: [[QueryService.sql]]/[[QueryService.sqlJson]]
  * probe the statement's leading verb, and when the statement parses to
  * a DML plan whose target resolves to a BARE registered vtable scan
  * (a [[graft.plans.VTableRelation]] leaf — the Catalog's default
  * registration), the statement routes to the corresponding
  * [[graft.sources.VersionedTable]] method. Anything else — other
  * verbs, non-vtable targets, views with baked-in transformations —
  * falls through to `spark.sql` untouched, so Spark's native error
  * surface (and any future DSv2 support) is preserved.
  *
  * Parsing uses Spark's OWN parser (`sessionState.sqlParser.parsePlan`)
  * rather than an injected parser extension: the grammar for these
  * verbs is already in Spark, so re-parsing them would only fork the
  * syntax; this dispatcher is purely a *routing* layer over the parsed
  * tree. Statements execute against the table's CURRENT version (DML
  * at a snapshot is meaningless — tables mutate at head), and when the
  * registered view was pinned at the pre-statement head it is
  * refreshed to the new head, so a follow-up SELECT over the same view
  * sees the change — the read-your-writes a SQL user expects. A view
  * deliberately time-traveled to an older version is left untouched.
  *
  * Supported statements:
  *
  *   - `DELETE FROM t WHERE cond` → [[VersionedTable.deleteWhere]]
  *     (stats+bloom file pruning; cond must be subquery-free)
  *   - `UPDATE t SET c = e, ... [WHERE cond]` →
  *     [[VersionedTable.updateWhere]] (expressions over the row's old
  *     values; subquery-free)
  *   - `MERGE INTO t [AS a] USING src [AS b] ON t.k = src.k` — full
  *     clause semantics, keyed by a single same-name equality:
  *       - the canonical upsert (`UPDATE SET *` + `INSERT *`, or
  *         explicit full-coverage identity lists) fast-paths to
  *         [[VersionedTable.merge]], matched-DELETE-only to
  *         [[VersionedTable.delete]];
  *       - everything else — clause conditions (`WHEN MATCHED AND
  *         …`), partial-column updates, several WHEN clauses in
  *         order, `WHEN NOT MATCHED BY SOURCE` — compiles via
  *         [[SqlDml.generalMerge]] into ONE
  *         [[VersionedTable.applyChanges]] commit. Duplicate matched
  *         target keys or duplicate acting source keys raise the
  *         standard MERGE cardinality error (keyed upsert cannot
  *         represent them). `WITH SCHEMA EVOLUTION` commits the
  *         source's added/widened columns as an empty evolving append
  *         first, then merges against the evolved schema.
  *     `src` may be any query — a registered view or inline subquery.
  *   - `INSERT INTO t [(cols…)] query|VALUES …` →
  *     [[VersionedTable.append]]; `INSERT OVERWRITE` →
  *     [[VersionedTable.overwrite]]. Positional inserts require the
  *     full column count; a column list (or BY NAME) maps by name
  *     with NULL for unlisted columns; values store-assign via cast.
  *   - `DESCRIBE HISTORY t` / `DESCRIBE HISTORY '/path'` →
  *     [[VersionedTable.history]]
  *   - maintenance: `VACUUM t [RETAIN n VERSIONS]` →
  *     [[VersionedTable.vacuum]] (result = files freed);
  *     `OPTIMIZE t [ZORDER BY (c1[, c2])]` →
  *     [[VersionedTable.compact]]; `RESTORE [TABLE] t [TO] VERSION AS
  *     OF v` → [[VersionedTable.restore]]
  *
  * DML statements return a single row `(version int)` — the committed
  * version, same contract as the HTTP mutation routes.
  */
object SqlDml {

  /** Statement classification for the HTTP layer's auth gate: verbs
    * that only ever READ. Closed-world on purpose — an unrecognized
    * leading verb classifies as a mutation, so a verb this list has
    * never heard of can never slip a write past a configured token
    * (the statement was going to error anyway if it was a typo'd
    * read). Leading parens are allowed (set-operation syntax).
    */
  private val ReadVerbs =
    Set("SELECT", "WITH", "VALUES", "TABLE", "SHOW", "DESCRIBE", "DESC",
      "EXPLAIN", "FROM")

  /** Offset of the first token after leading whitespace and SQL
    * comments (`-- …` and `/* … */`, arbitrarily many) — the verb
    * probes must see through a comment header, or a commented-out
    * preamble would hide a DML statement from dispatch (and make a
    * commented SELECT read as a mutation at the auth gate).
    */
  private def contentStart(query: String): Int = {
    val n = query.length
    var i = 0
    var moved = true
    while (moved) {
      moved = false
      while (i < n && query(i).isWhitespace) { i += 1; moved = true }
      if (i + 1 < n && query(i) == '-' && query(i + 1) == '-') {
        while (i < n && query(i) != '\n') i += 1
        moved = true
      } else if (i + 1 < n && query(i) == '/' && query(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(query(i) == '*' && query(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
        moved = true
      }
    }
    i
  }

  /** The statement body with comment/whitespace headers removed. */
  private def content(query: String): String =
    query.substring(contentStart(query))

  private def leadingVerb(query: String, skipParens: Boolean): String = {
    var i = contentStart(query)
    val n = query.length
    if (skipParens)
      while (i < n && (query(i) == '(' || query(i).isWhitespace)) i += 1
    val start = i
    while (i < n && query(i).isLetter) i += 1
    query.substring(start, i).toUpperCase
  }

  /** Whether `query` can change table/session state (MERGE / UPDATE /
    * DELETE / INSERT / CREATE / DROP / SET / ...). Pure text probe —
    * must stay cheap; it runs on every /sql request when auth is on.
    */
  def isMutation(query: String): Boolean =
    !ReadVerbs.contains(leadingVerb(query, skipParens = true))

  /** Route `query` to the vtable API if it is a supported DML /
    * maintenance statement against a registered vtable; None otherwise
    * (caller falls through to `spark.sql`). The service overload also
    * invalidates the result cache's command nonce on commit; the bare
    * overload (used by the injected parser — see [[GraftSqlParser]])
    * relies on the cache's version-keyed invalidation alone, which the
    * commit itself triggers.
    */
  def dispatch(svc: QueryService, query: String): Option[DataFrame] =
    dispatch(svc.spark, query, () => svc.results.noteCommand())

  def dispatch(spark: org.apache.spark.sql.SparkSession, query: String,
      onCommit: () => Unit): Option[DataFrame] = {
    leadingVerb(query, skipParens = false) match {
      case "DESCRIBE" => describeHistory(spark, query)
      case "MERGE" | "UPDATE" | "DELETE" | "INSERT" => dml(spark, query, onCommit)
      case "VACUUM" | "OPTIMIZE" | "RESTORE" => maintenance(spark, query, onCommit)
      case _ => None
    }
  }

  /** Leading-verb probe only — does [[dispatch]] even want to look at
    * this statement? (The injected parser uses it to skip the regex /
    * tree inspection on the hot non-DML path.)
    */
  def mightDispatch(query: String): Boolean = {
    val verb = leadingVerb(query, skipParens = false)
    verb == "DESCRIBE" || verb == "MERGE" || verb == "UPDATE" ||
      verb == "DELETE" || verb == "INSERT" ||
      verb == "VACUUM" || verb == "OPTIMIZE" || verb == "RESTORE"
  }

  /** `SELECT ... FROM t VERSION|TIMESTAMP AS OF ...` for sessions
    * WITHOUT the injected parser (the service may front a plain
    * session): a cheap textual probe, then the same parse-time
    * substitution [[GraftSqlParser]] applies. None when the statement
    * carries no time-travel clause (including the probe's false
    * positives — e.g. the words inside a string literal — which the
    * parsed tree disambiguates).
    */
  def timeTravelSelect(spark: org.apache.spark.sql.SparkSession,
      query: String): Option[DataFrame] = {
    if (!TimeTravelProbe.matcher(query).find()) return None
    val plan =
      try spark.sessionState.sqlParser.parsePlan(query)
      catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        return None
      }
    if (!graft.plans.VTableTimeTravel.hasTimeTravel(plan)) None
    else Some(GraftSqlBridge.ofRows(spark,
      graft.plans.VTableTimeTravel.substitute(spark, plan)))
  }

  private val TimeTravelProbe =
    java.util.regex.Pattern.compile("(?is)\\b(VERSION|TIMESTAMP)\\s+AS\\s+OF\\b")

  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*$""".r

  private[service] def describeHistory(spark: org.apache.spark.sql.SparkSession,
      query: String): Option[DataFrame] =
    content(query) match {
      case HistoryRe(target) =>
        val dir = unquotePath(target)
          .orElse(resolveVTable(spark, unquoteIdent(target)).map(_._1))
          .getOrElse(throw new IllegalArgumentException(
            s"DESCRIBE HISTORY: '$target' is not a registered vtable view or a quoted table path"))
        Some(VersionedTable(spark, dir).history())
      case _ => None // plain DESCRIBE t — Spark's own statement
    }

  private[service] def isDescribeHistory(query: String): Boolean =
    HistoryRe.findFirstIn(content(query)).isDefined

  // ---- maintenance statements (none are Spark grammar) -------------

  private[service] def isMaintenance(query: String): Boolean = {
    val verb = leadingVerb(query, skipParens = false)
    val body = content(query)
    (verb == "VACUUM" && VacuumRe.findFirstIn(body).isDefined) ||
      (verb == "OPTIMIZE" && OptimizeRe.findFirstIn(body).isDefined) ||
      (verb == "RESTORE" && RestoreRe.findFirstIn(body).isDefined)
  }

  private[service] def isVacuum(query: String): Boolean =
    leadingVerb(query, skipParens = false) == "VACUUM"

  private val VacuumRe =
    """(?is)^\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+(.+?)(?:\s+ZORDER\s+BY\s+\(?\s*([A-Za-z0-9_`\s,]+?)\s*\)?)?\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r

  /** Delta-shaped maintenance verbs over a registered vtable (or a
    * quoted table path):
    *
    *   VACUUM t [RETAIN n VERSIONS]          → vacuum(n); result = files freed
    *   OPTIMIZE t [ZORDER BY (c1[, c2])]     → compact(clusterBy); result = version
    *   RESTORE [TABLE] t [TO] VERSION AS OF v → restore(v); result = version
    *
    * Verb classification already treats all three as mutations at the
    * HTTP auth gate (closed-world: they're not in the read set).
    */
  private[service] def maintenance(spark: org.apache.spark.sql.SparkSession,
      query: String, onCommit: () => Unit): Option[DataFrame] = {
    import org.apache.spark.sql.functions.lit
    def table(target: String): VersionedTable = {
      val dir = unquotePath(target.trim)
        .orElse(resolveVTable(spark, unquoteIdent(target.trim)).map(_._1))
        .getOrElse(fail(s"'${target.trim}' is not a registered vtable view " +
          "or a quoted table path"))
      VersionedTable(spark, dir)
    }
    content(query) match {
      case VacuumRe(target, retain) =>
        val n = Option(retain).map(_.toInt).getOrElse(1)
        val freed = table(target).vacuum(retainVersions = n)
        onCommit()
        Some(spark.range(1).select(lit(freed).as("deleted_files")))
      case OptimizeRe(target, zorder) =>
        val cols = Option(zorder).toSeq
          .flatMap(_.split(",")).map(c => unquoteIdent(c.trim)).filter(_.nonEmpty)
        val vt = table(target)
        val preHead = vt.currentVersion
        val v = vt.compact(clusterBy = cols)
        onCommit()
        refreshViews(spark, vt.dir, preHead)
        Some(spark.range(1).select(lit(v).as("version")))
      case RestoreRe(target, ver) =>
        val vt = table(target)
        val preHead = vt.currentVersion
        val v = vt.restore(ver.toInt)
        onCommit()
        refreshViews(spark, vt.dir, preHead)
        Some(spark.range(1).select(lit(v).as("version")))
      case _ => None // malformed → spark.sql raises its parse error
    }
  }

  /** `'path'` / `"path"` literal → the table directory itself. */
  private def unquotePath(s: String): Option[String] =
    if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
      Some(s.substring(1, s.length - 1))
    else None

  private def unquoteIdent(s: String): String =
    if (s.length >= 2 && s.head == '`' && s.last == '`')
      s.substring(1, s.length - 1)
    else s

  private def dml(spark: org.apache.spark.sql.SparkSession, query: String,
      onCommit: () => Unit): Option[DataFrame] = {
    val plan =
      try spark.sessionState.sqlParser.parsePlan(query)
      catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        return None // let spark.sql raise the parse error itself
      }
    dmlPlan(spark, plan, onCommit)
  }

  /** Dispatch an ALREADY-PARSED DML tree (the injected parser hands
    * its delegate's output here so the statement parses exactly once).
    */
  private[service] def dmlPlan(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan, onCommit: () => Unit): Option[DataFrame] = {
    plan match {
      case DeleteFromTable(tbl, cond) =>
        target(spark, tbl).map { case (dir, quals, _) =>
          noSubquery(cond, "DELETE")
          commit(spark, onCommit, dir) { vt =>
            vt.deleteWhere(toColumn(strip(cond, quals)))
          }
        }
      case UpdateTable(tbl, assigns, cond) =>
        target(spark, tbl).map { case (dir, quals, _) =>
          val set = assigns.map { case Assignment(k, v) =>
            noSubquery(v, "UPDATE")
            colName(k, quals).getOrElse(fail(
              s"UPDATE supports only plain column assignment targets, got ${k.sql}")) ->
              toColumn(strip(v, quals))
          }.toMap
          commit(spark, onCommit, dir) { vt =>
            vt.updateWhere(
              cond.map(c => { noSubquery(c, "UPDATE"); toColumn(strip(c, quals)) })
                .getOrElse(org.apache.spark.sql.functions.lit(true)),
              set)
          }
        }
      case i: InsertIntoStatement if i.partitionSpec.isEmpty =>
        // INSERT INTO → append, INSERT OVERWRITE → overwrite.
        // Positional inserts rename the query's output to the
        // committed names (count must match); an explicit column list
        // (or BY NAME) maps by name with NULL for unlisted columns —
        // standard SQL insert semantics. Values store-assign via cast
        // to the committed types. Partitioned specs fall through (the
        // vtable has no partition concept).
        target(spark, i.table).map { case (dir, _, _) =>
          commit(spark, onCommit, dir) { vt =>
            val data = GraftSqlBridge.ofRows(spark, i.query)
            val committed = vt.read().schema
            import org.apache.spark.sql.functions.{col, lit}
            val named =
              if (i.userSpecifiedCols.nonEmpty) {
                if (i.userSpecifiedCols.length != data.columns.length)
                  fail(s"INSERT column list names ${i.userSpecifiedCols.length} " +
                    s"columns but the query produces ${data.columns.length}")
                val unknown = i.userSpecifiedCols
                  .filterNot(c => committed.fieldNames.exists(_.equalsIgnoreCase(c)))
                if (unknown.nonEmpty)
                  fail(s"INSERT column list names non-columns: ${unknown.mkString(", ")}")
                Some(data.toDF(i.userSpecifiedCols: _*))
              } else if (i.byName) Some(data)
              else None
            val aligned = named match {
              case Some(n) =>
                val have = n.columns.map(c => c.toLowerCase -> c).toMap
                n.select(committed.fields.toSeq.map { f =>
                  have.get(f.name.toLowerCase)
                    .map(col(_).cast(f.dataType))
                    .getOrElse(lit(null).cast(f.dataType)).as(f.name)
                }: _*)
              case None =>
                if (data.columns.length != committed.length)
                  fail(s"INSERT query produces ${data.columns.length} columns; " +
                    s"the table has ${committed.length} (name them with an " +
                    "INSERT (cols...) list for a partial insert)")
                data.toDF(committed.fieldNames.toSeq: _*)
                  .select(committed.fields.toSeq.map(f =>
                    col(f.name).cast(f.dataType).as(f.name)): _*)
            }
            if (i.overwrite) vt.overwrite(aligned) else vt.append(aligned)
          }
        }
      case m: MergeIntoTable =>
        target(spark, m.targetTable).map { case (dir, targetQuals, cols) =>
          val quals = targetQuals ++ aliasesOf(m.sourceTable)
          val key = mergeKey(m.mergeCondition, quals, cols)
          val source = GraftSqlBridge.ofRows(spark, m.sourceTable)
          commit(spark, onCommit, dir) { vt =>
            mergeForm(m, quals, cols) match {
              case Upsert    => vt.merge(source, key)
              case DeleteAll => vt.delete(source.select(key), key)
              case General   => generalMerge(spark, vt, m, key, quals)
            }
          }
        }
      case _ => None
    }
  }

  /** Run a committing op, invalidate the result cache, and refresh the
    * registered view when it tracked the pre-statement head. Returns
    * the single-row `(version int)` result frame.
    */
  private def commit(spark: org.apache.spark.sql.SparkSession,
      onCommit: () => Unit, dir: String)(op: VersionedTable => Int)
      : DataFrame = {
    val vt = VersionedTable(spark, dir)
    val preHead = vt.currentVersion
    val v = op(vt)
    onCommit()
    refreshViews(spark, dir, preHead)
    import org.apache.spark.sql.functions.lit
    spark.range(1).select(lit(v).as("version"))
  }

  /** Re-point every registered view that is a bare vtable scan of
    * `dir` pinned at `preHead` to the new head — read-your-writes for
    * the view the statement targeted (and any other registration of
    * the same table at head). Time-traveled pins are left alone.
    */
  private def refreshViews(spark: org.apache.spark.sql.SparkSession,
      dir: String, preHead: Int): Unit =
    spark.catalog.listTables().collect().map(_.name).foreach { name =>
      relationOf(spark, name).foreach { r =>
        if (r.dir == dir && r.version == preHead)
          VersionedTable(spark, dir).scan().createOrReplaceTempView(name)
      }
    }

  // ---- target resolution -------------------------------------------

  /** Resolve a DML target plan to (table dir, lowercased qualifier
    * names that may prefix its columns, committed column names). None
    * when the target is not a single-part name registered as a BARE
    * vtable scan.
    */
  private def target(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan)
      : Option[(String, Set[String], Seq[String])] = {
    def walk(p: LogicalPlan, quals: Set[String])
        : Option[(String, Set[String], Seq[String])] = p match {
      case SubqueryAlias(id, child) => walk(child, quals + id.name.toLowerCase)
      case UnresolvedRelation(parts, _, _) if parts.length == 1 =>
        val name = parts.head
        resolveVTable(spark, name).map { case (dir, cols) =>
          (dir, quals + name.toLowerCase, cols)
        }
      case _ => None
    }
    walk(plan, Set.empty)
  }

  /** A registered name whose analyzed view plan is a bare
    * [[VTableRelation]] → (dir, column names).
    */
  private def resolveVTable(spark: org.apache.spark.sql.SparkSession, name: String)
      : Option[(String, Seq[String])] =
    relationOf(spark, name).map(r => (r.dir, r.output.map(_.name)))

  private def relationOf(spark: org.apache.spark.sql.SparkSession,
      name: String): Option[VTableRelation] = {
    def bare(p: LogicalPlan): Option[VTableRelation] = p match {
      case r: VTableRelation   => Some(r)
      case s: SubqueryAlias    => bare(s.child)
      case v: View             => bare(v.child)
      case _                   => None
    }
    try bare(spark.table(name).queryExecution.analyzed)
    catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  private def aliasesOf(plan: LogicalPlan): Set[String] = plan match {
    case SubqueryAlias(id, child) => aliasesOf(child) + id.name.toLowerCase
    case UnresolvedRelation(parts, _, _) if parts.length == 1 =>
      Set(parts.head.toLowerCase)
    case _ => Set.empty
  }

  // ---- expression plumbing -----------------------------------------

  /** Strip known table/alias qualifiers so the expression resolves
    * against the table's own frame inside the vtable rewrite.
    */
  private def strip(e: Expression, quals: Set[String]): Expression =
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
          quals.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(a.nameParts.tail)
    }

  /** Plain single-column reference (after qualifier stripping), or
    * None for anything nested/computed.
    */
  private def colName(e: Expression, quals: Set[String]): Option[String] =
    strip(e, quals) match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => Some(a.nameParts.head)
      case _ => None
    }

  private def toColumn(e: Expression): Column = GraftSqlBridge.column(e)

  private def noSubquery(e: Expression, verb: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      fail(s"$verb on a versioned table does not support subqueries in " +
        "conditions or assignments; materialize the subquery as a " +
        "registered view and MERGE/DELETE against it by key")

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- MERGE shape classification ----------------------------------

  private sealed trait MergeForm
  private case object Upsert extends MergeForm
  private case object DeleteAll extends MergeForm
  private case object General extends MergeForm

  /** `ON a.k = b.k` (same column name both sides, any qualifiers) →
    * the committed-case key column name.
    */
  private def mergeKey(cond: Expression, quals: Set[String], cols: Seq[String])
      : String = cond match {
    case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
        if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
      val n = l.nameParts.last
      cols.find(_.equalsIgnoreCase(n)).getOrElse(fail(
        s"MERGE key '$n' is not a column of the target table (${cols.mkString(", ")})"))
    case other => fail(
      s"MERGE ON must be a single same-name key equality (t.k = s.k), got: ${other.sql}")
  }

  /** Every assignment is `col = src.col` for the SAME name, and the
    * assigned set covers the full committed schema — the only explicit
    * list equivalent to `SET *` / `INSERT *` under whole-row
    * replacement semantics.
    */
  private def identityCovering(assigns: Seq[Assignment], quals: Set[String],
      cols: Seq[String]): Boolean = {
    val assigned = assigns.flatMap { case Assignment(k, v) =>
      for {
        kn <- colName(k, quals)
        vn <- colName(v, quals)
        if kn.equalsIgnoreCase(vn)
      } yield kn.toLowerCase
    }
    assigned.length == assigns.length &&
      assigned.toSet == cols.map(_.toLowerCase).toSet
  }

  /** Pick the cheapest lowering: the two canonical shapes go straight
    * to the single-purpose table ops (pruned join built in, no
    * full-outer evaluation pass); everything else compiles through
    * [[generalMerge]].
    */
  private def mergeForm(m: MergeIntoTable, quals: Set[String], cols: Seq[String])
      : MergeForm = {
    // WITH SCHEMA EVOLUTION always takes the general path — it
    // pre-evolves the committed schema (generalMerge), after which
    // the canonical fast paths' schema-match preconditions no longer
    // describe the statement
    if (m.withSchemaEvolution) return General
    (m.matchedActions.toList, m.notMatchedActions.toList,
        m.notMatchedBySourceActions.toList) match {
      case (List(DeleteAction(None)), Nil, Nil) => DeleteAll
      case (List(matched), List(notMatched), Nil) =>
        val updOk = matched match {
          case UpdateStarAction(None)      => true
          case UpdateAction(None, as, _)   => identityCovering(as, quals, cols)
          case _                           => false
        }
        val insOk = notMatched match {
          case InsertStarAction(None)      => true
          case InsertAction(None, as)      => identityCovering(as, quals, cols)
          case _                           => false
        }
        if (updOk && insOk) Upsert else General
      case _ => General
    }
  }

  // ---- general MERGE lowering --------------------------------------

  /** Full MERGE semantics — clause conditions, partial-column updates,
    * multiple WHEN clauses in order, WHEN NOT MATCHED BY SOURCE —
    * compiled into ONE [[VersionedTable.applyChanges]] commit.
    *
    * Evaluation: one full-outer join of the target snapshot and the
    * source (both aliased exactly as the statement aliased them, so
    * the parsed clause expressions resolve unmodified), membership
    * markers split it into matched / not-matched / not-matched-by-
    * source branches, and per branch a CASE over the clause
    * conditions picks the FIRST matching clause (SQL's order
    * semantics). Each acting row becomes one change-batch row — the
    * full post-image for UPDATE/INSERT (unassigned columns keep the
    * target value for UPDATE, NULL for INSERT), a key-only row for
    * DELETE — and the batch lands as a single copy-on-write commit
    * with MERGE-grade stats+bloom file pruning (only files touched by
    * the batch's keys rewrite). Rows matching no clause are absent
    * from the batch and stay untouched.
    *
    * Keyed-upsert representability is enforced, not assumed: a key
    * with multiple matched target rows, or multiple acting change
    * rows (duplicate source keys), raises the standard MERGE
    * cardinality error instead of silently collapsing rows.
    */
  private def generalMerge(spark: org.apache.spark.sql.SparkSession,
      vt: VersionedTable, m: MergeIntoTable, key: String,
      quals: Set[String]): Int = {
    import org.apache.spark.sql.functions._
    (m.mergeCondition +:
      (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
        .flatMap(actionExprs)).foreach(noSubquery(_, "MERGE"))
    val tAlias = aliasHead(m.targetTable)
    val sAlias = aliasHead(m.sourceTable)
    // the source is pinned to ONE evaluation (localCheckpoint): the
    // branches, cardinality checks and batch assembly all re-read it,
    // and a non-deterministic source re-evaluating differently per
    // branch would classify rows inconsistently — same posture as
    // applyChanges' own input pin
    val sFrame = GraftSqlBridge.ofRows(spark, stripAliases(m.sourceTable))
      .localCheckpoint()
    // WITH SCHEMA EVOLUTION: an EMPTY evolving append commits the
    // union schema first (new nullable columns land, shared columns
    // may widen, zero rows move), then the merge proceeds against the
    // evolved schema — old rows read NULL for the added columns, and
    // the batch below can carry them (applyChanges projects upserts
    // to the committed schema, which now includes them)
    if (m.withSchemaEvolution) vt.appendEvolve(sFrame.limit(0))
    val schema = vt.read().schema
    val hasBySource = m.notMatchedBySourceActions.nonEmpty
    // with no BY SOURCE clause the statement is SOURCE-driven: target
    // rows matching no source key can't act, so the evaluation join's
    // target side prunes to the source's key range — Filter-over-
    // marker collapses it to the stats+bloom-pruned file scan, making
    // a sparse MERGE O(touched files) for EVALUATION, not just for
    // the write. (BY SOURCE clauses need every target row; no prune.)
    val tScan =
      if (hasBySource) vt.scan()
      else {
        val b = sFrame.agg(min(col(key)), max(col(key))).head()
        if (b.isNullAt(0)) vt.scan().where(lit(false)) // empty source
        else vt.scan().where(col(key).between(lit(b.get(0)), lit(b.get(1))))
      }
    // markers added BELOW the alias so clause expressions still
    // resolve through the user's qualifiers; marker names are
    // graft-prefixed to dodge data-column collisions
    val t = tScan.withColumn("__graft_t", lit(1)).alias(tAlias)
    val s = sFrame.withColumn("__graft_s", lit(1)).alias(sAlias)
    val joinType = if (hasBySource) "full_outer" else "right_outer"
    val fo = t.join(s, toColumn(m.mergeCondition), joinType)
    val matched = fo.filter(col("__graft_t").isNotNull && col("__graft_s").isNotNull)
    val notMatched = fo.filter(col("__graft_t").isNull)
    val notMatchedBySrc =
      if (hasBySource) fo.filter(col("__graft_s").isNull)
      else fo.filter(lit(false))

    def tCol(c: String) = col(s"$tAlias.$c")
    def sCol(c: String) = col(s"$sAlias.$c")
    val CT = VersionedTable.ChangeTypeCol

    /** Rows of `branch` acting under clause list `acts`, compiled to
      * change rows. `defaults` supplies unassigned columns (target
      * values for matched/by-source UPDATEs, NULL for INSERTs).
      */
    def changeRows(branch: DataFrame,
        acts: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
        defaults: String => Column): Seq[DataFrame] = {
      // first-match clause index; -1 = no clause applies (row no-ops)
      val action = acts.zipWithIndex.foldRight(lit(-1)) { case ((a, i), els) =>
        val c = a.condition.map(toColumn).getOrElse(lit(true))
        when(c, lit(i)).otherwise(els)
      }
      val tagged = branch.withColumn("__graft_act", action)
      acts.zipWithIndex.map { case (a, i) =>
        val rows = tagged.filter(col("__graft_act") === i)
        a match {
          case DeleteAction(_) =>
            rows.select(
              (schema.fields.map { f =>
                (if (f.name == key) coalesce(tCol(key), sCol(key))
                 else lit(null)).cast(f.dataType).as(f.name)
              } :+ lit("delete").as(CT)).toSeq: _*)
          case _ =>
            // star actions assign the SOURCE's columns (SQL's `SET *`
            // semantics); target columns the source lacks — possible
            // once the schema has evolved past the source — fall to
            // the branch defaults. A source column the TARGET lacks is
            // a loud error for star actions unless WITH SCHEMA
            // EVOLUTION consumed it (a silent drop hides data loss);
            // explicit assignment lists are free to ignore extras
            val assigned: Map[String, Column] = a match {
              case UpdateStarAction(_) | InsertStarAction(_) =>
                val extra = sFrame.columns
                  .filterNot(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
                if (extra.nonEmpty)
                  fail(s"MERGE ... SET */INSERT *: source has columns the " +
                    s"target lacks: ${extra.mkString(", ")}; add WITH SCHEMA " +
                    "EVOLUTION to evolve them in, or drop them from the source")
                sFrame.columns.map(c => c.toLowerCase -> sCol(c)).toMap
              case UpdateAction(_, as, _) => assignmentMap(as)
              case InsertAction(_, as)    => assignmentMap(as)
              case other => fail(s"unsupported MERGE action: $other")
            }
            rows.select(
              (schema.fields.map { f =>
                assigned.getOrElse(f.name.toLowerCase, defaults(f.name))
                  .cast(f.dataType).as(f.name)
              } :+ lit("update_postimage").as(CT)).toSeq: _*)
        }
      }
    }

    val pieces =
      changeRows(matched, m.matchedActions, tCol) ++
        changeRows(notMatched, m.notMatchedActions, _ => lit(null)) ++
        changeRows(notMatchedBySrc, m.notMatchedBySourceActions, tCol)
    val batch0 = pieces.reduceLeft(_.unionByName(_))
    // idempotent duplicate deletes collapse; anything else duplicated
    // is a genuine cardinality violation (duplicate source keys)
    val batch = batch0.filter(col(CT) === "delete").distinct()
      .unionByName(batch0.filter(col(CT) =!= "delete"))
      .withColumn("__graft_seq", lit(1L))
    // cardinality, ONE validation job for both classes: several
    // matched (target row × source row) pairs per key — duplicate
    // target or source keys — and several acting change rows per key
    // are both unrepresentable by a keyed upsert (row-wise SQL MERGE
    // could treat each pair differently); the standard MERGE error
    val viol = matched.groupBy(col(s"$tAlias.$key").as("k")).count()
      .filter(col("count") > 1)
      .select(lit("matched row pairs").as("what"), col("k"), col("count"))
      .unionByName(batch.groupBy(col(key).as("k")).count()
        .filter(col("count") > 1)
        .select(lit("acting changes").as("what"), col("k"), col("count")))
      .limit(1).collect()
    if (viol.nonEmpty)
      fail(s"MERGE produced ${viol.head.getLong(2)} ${viol.head.getString(0)} " +
        s"for key ${viol.head.get(1)} (duplicate source or target keys); " +
        "keyed upsert requires a unique match and one change per key")
    vt.applyChanges(batch, key, orderBy = "__graft_seq")
  }

  /** Innermost alias (or relation) name — the qualifier the
    * statement's expressions use for this side.
    */
  private def aliasHead(plan: LogicalPlan): String = plan match {
    case SubqueryAlias(id, _) => id.name
    case UnresolvedRelation(parts, _, _) => parts.last
    case _ => fail("MERGE source must be a (optionally aliased) table or subquery")
  }

  /** Drop the outer aliases — re-aliased after the marker column so
    * the alias covers marker + payload.
    */
  private def stripAliases(plan: LogicalPlan): LogicalPlan = plan match {
    case SubqueryAlias(_, child) => stripAliases(child)
    case other => other
  }

  private def actionExprs(
      a: org.apache.spark.sql.catalyst.plans.logical.MergeAction): Seq[Expression] =
    a.condition.toSeq ++ (a match {
      case UpdateAction(_, as, _) => as.flatMap(x => Seq(x.key, x.value))
      case InsertAction(_, as)    => as.flatMap(x => Seq(x.key, x.value))
      case _                      => Seq.empty
    })

  /** lowercase target column name → value expression (qualifiers kept;
    * they resolve against the aliased join).
    */
  private def assignmentMap(as: Seq[Assignment]): Map[String, Column] =
    as.map { case Assignment(k, v) =>
      val name = k match {
        case a: UnresolvedAttribute => a.nameParts.last.toLowerCase
        case other => fail(s"MERGE assignment target must be a column, got ${other.sql}")
      }
      name -> toColumn(v)
    }.toMap
}

/** Contract query for the SQL DML surface (`q_sql_merge`): the same
  * orders table [[graft.sources.TableMerge]] builds through the Scala
  * API is built here by SUBMITTING SQL TEXT — MERGE INTO (matched
  * update + unmatched insert), UPDATE with arithmetic assignments,
  * and a predicate DELETE, all through [[QueryService.sql]] — then the
  * committed snapshot is read back and aggregated. The DuckDB oracle
  * reproduces merge→update→delete in plain SQL, so statement routing,
  * qualifier stripping, and the three table rewrites are all under
  * the hash gate. Memoized per (session, corpus) like TableMerge
  * (commits are not idempotent).
  */
object SqlDmlDemo {

  private case class Key(session: Int, sfDir: String)
  private val tables = new graft.util.BoundedMemo[Key, String](4, _ => ())

  private def builtTable(t: graft.sources.Tables): String =
    tables.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      import org.apache.spark.sql.functions._
      val parent = java.nio.file.Files.createTempDirectory("graft-sqldml")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(parent.toFile)
      }
      val dir = parent.toString + "/orders_sql"
      val vt = VersionedTable(t.spark, dir)
      val base = t.orders.select(col("o_orderkey"), col("o_totalprice").as("price"))
      vt.append(base.filter(col("o_orderkey") % 2 === 0))
      // view names unique per (session, corpus) — the service model
      // runs concurrent requests over different corpora
      val suffix = s"${System.identityHashCode(t.spark)}_" +
        t.sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val tgt = s"__graft_sqldml_t_$suffix"
      val src = s"__graft_sqldml_s_$suffix"
      vt.scan().createOrReplaceTempView(tgt)
      base.filter(col("o_orderkey") % 3 === 0)
        .withColumn("price", graft.operators.Rnd.round(col("price") * 1.1, 2))
        .createOrReplaceTempView(src)
      val svc = new QueryService(t.spark)
      svc.sql(s"MERGE INTO `$tgt` AS t USING `$src` AS s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *").collect()
      svc.sql(s"UPDATE `$tgt` SET price = price * 2 WHERE o_orderkey % 5 = 0")
        .collect()
      svc.sql(s"DELETE FROM `$tgt` WHERE price > 400000").collect()
      dir
    }

  def qSqlMerge(t: graft.sources.Tables): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    VersionedTable(t.spark, builtTable(t)).read()
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Rnd.round(sum("price"), 2).as("total"),
        min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
  }
}

/** Contract query for the GENERAL MERGE lowering (`q_sql_merge_general`):
  * one statement exercising every clause class — conditional matched
  * DELETE, partial-column matched UPDATE mixing t. and s. values,
  * conditional NOT MATCHED INSERT with an explicit column list, and a
  * conditional NOT MATCHED BY SOURCE UPDATE — compiled through
  * [[SqlDml.generalMerge]] into one applyChanges commit. The DuckDB
  * oracle replays the clause algebra as a left-join CASE plus an
  * anti-join insert arm, so first-match clause order, the branch
  * membership split, and the batch commit are all under the hash
  * gate. Memoized per (session, corpus) like [[SqlDmlDemo]].
  */
object SqlMergeGeneralDemo {

  private case class Key(session: Int, sfDir: String)
  private val tables = new graft.util.BoundedMemo[Key, String](4, _ => ())

  private def builtTable(t: graft.sources.Tables): String =
    tables.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      import org.apache.spark.sql.functions._
      val parent = java.nio.file.Files.createTempDirectory("graft-sqlgm")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(parent.toFile)
      }
      val dir = parent.toString + "/orders_g"
      val vt = VersionedTable(t.spark, dir)
      val base = t.orders.select(col("o_orderkey"), col("o_totalprice").as("price"))
      vt.append(base.filter(col("o_orderkey") % 2 === 0))
      val suffix = s"${System.identityHashCode(t.spark)}_" +
        t.sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val tgt = s"__graft_sqlgm_t_$suffix"
      val src = s"__graft_sqlgm_s_$suffix"
      vt.scan().createOrReplaceTempView(tgt)
      base.filter(col("o_orderkey") % 3 === 0)
        .withColumn("price", graft.operators.Rnd.round(col("price") * 1.1, 2))
        .createOrReplaceTempView(src)
      new QueryService(t.spark).sql(
        s"MERGE INTO `$tgt` AS t USING `$src` AS s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED AND s.price > 200000 THEN DELETE " +
          "WHEN MATCHED THEN UPDATE SET price = t.price + s.price " +
          "WHEN NOT MATCHED AND s.price <= 150000 " +
          "THEN INSERT (o_orderkey, price) VALUES (s.o_orderkey, s.price) " +
          "WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 7 = 0 " +
          "THEN UPDATE SET price = t.price * 0.5").collect()
      dir
    }

  def qSqlMergeGeneral(t: graft.sources.Tables): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    VersionedTable(t.spark, builtTable(t)).read()
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Rnd.round(sum("price"), 2).as("total"),
        min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
  }
}

/** Contract query for the SQL INSERT path (`q_sql_insert`): the table
  * is built ENTIRELY by SQL statements — positional `INSERT INTO …
  * SELECT` (evens), a column-list insert that NULL-fills the omitted
  * column (a sentinel row), and `INSERT OVERWRITE … SELECT` replacing
  * everything with the div-3 slice — then the committed snapshot is
  * aggregated. The DuckDB oracle reproduces the final world (only the
  * overwrite survives), so append/overwrite routing, positional
  * renaming, and store-assignment casts are all under the hash gate.
  * Memoized per (session, corpus) like [[SqlDmlDemo]].
  */
object SqlInsertDemo {

  private case class Key(session: Int, sfDir: String)
  private val tables = new graft.util.BoundedMemo[Key, String](4, _ => ())

  private def builtTable(t: graft.sources.Tables): String =
    tables.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      import org.apache.spark.sql.functions._
      val parent = java.nio.file.Files.createTempDirectory("graft-sqlins")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(parent.toFile)
      }
      val dir = parent.toString + "/orders_ins"
      val vt = VersionedTable(t.spark, dir)
      // seed the schema with one appended row, then everything else
      // happens as SQL text
      vt.append(t.orders.limit(1)
        .select(lit(-1L).as("o_orderkey"), lit(0.0d).as("price")))
      val suffix = s"${System.identityHashCode(t.spark)}_" +
        t.sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val tgt = s"__graft_sqlins_t_$suffix"
      val src = s"__graft_sqlins_o_$suffix"
      vt.scan().createOrReplaceTempView(tgt)
      t.orders.createOrReplaceTempView(src)
      val svc = new QueryService(t.spark)
      svc.sql(s"INSERT INTO `$tgt` " +
        s"SELECT o_orderkey, o_totalprice FROM `$src` WHERE o_orderkey % 2 = 0")
        .collect()
      svc.sql(s"INSERT INTO `$tgt` (o_orderkey) VALUES (-2)").collect()
      svc.sql(s"INSERT OVERWRITE `$tgt` " +
        s"SELECT o_orderkey, o_totalprice FROM `$src` WHERE o_orderkey % 3 = 0")
        .collect()
      dir
    }

  def qSqlInsert(t: graft.sources.Tables): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    VersionedTable(t.spark, builtTable(t)).read()
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Rnd.round(sum("price"), 2).as("total"),
        min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
  }
}

/** Contract query for SQL TIME TRAVEL (`q_sql_timetravel`): an orders
  * snapshot lands (v1), a SQL DELETE rewrites it (v2), and ONE
  * statement reads both worlds — `FROM t VERSION AS OF 1` unioned
  * with the head — through [[QueryService.sql]] (exercising the
  * parser-less substitution path [[SqlDml.timeTravelSelect]]). The
  * DuckDB oracle reproduces both arms from the raw table, so the
  * version-pinned scan's CONTENT is hash-gated, not just its row
  * count. Memoized per (session, corpus) like [[SqlDmlDemo]].
  */
object SqlTimeTravelDemo {

  private case class Key(session: Int, sfDir: String)
  private val tables = new graft.util.BoundedMemo[Key, (String, String)](4, _ => ())

  /** Returns (table dir, registered view name). */
  private def builtTable(t: graft.sources.Tables): (String, String) =
    tables.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      import org.apache.spark.sql.functions._
      val parent = java.nio.file.Files.createTempDirectory("graft-sqltt")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(parent.toFile)
      }
      val dir = parent.toString + "/orders_tt"
      val vt = VersionedTable(t.spark, dir)
      vt.append(t.orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price")))
      val tgt = s"__graft_sqltt_${System.identityHashCode(t.spark)}_" +
        t.sfDir.replaceAll("[^A-Za-z0-9]", "_")
      vt.scan().createOrReplaceTempView(tgt)
      new QueryService(t.spark)
        .sql(s"DELETE FROM `$tgt` WHERE o_orderkey % 3 = 0").collect()
      (dir, tgt)
    }

  def qSqlTimeTravel(t: graft.sources.Tables): org.apache.spark.sql.DataFrame = {
    val (_, tgt) = builtTable(t)
    new QueryService(t.spark).sql(
      s"""SELECT 'v1' AS snap, count(*) AS n_rows,
         |  floor(sum(price) * 100 + 0.5) / 100 AS total
         |FROM `$tgt` VERSION AS OF 1
         |UNION ALL
         |SELECT 'head' AS snap, count(*) AS n_rows,
         |  floor(sum(price) * 100 + 0.5) / 100 AS total
         |FROM `$tgt`
         |ORDER BY snap""".stripMargin)
  }
}
