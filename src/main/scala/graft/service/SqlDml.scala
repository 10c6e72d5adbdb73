package graft.service

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable, View}

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
  * Supported statements (unsupported *shapes* of a supported verb get
  * a descriptive error naming these forms, not a silent fallback —
  * falling through would hand the user Spark's misleading "table does
  * not support row-level operations"):
  *
  *   - `DELETE FROM t WHERE cond` → [[VersionedTable.deleteWhere]]
  *     (stats+bloom file pruning; cond must be subquery-free)
  *   - `UPDATE t SET c = e, ... [WHERE cond]` →
  *     [[VersionedTable.updateWhere]] (expressions over the row's old
  *     values; subquery-free)
  *   - `MERGE INTO t [AS a] USING src [AS b] ON t.k = src.k` with
  *       `WHEN MATCHED THEN UPDATE SET *` (or an explicit
  *       full-coverage identity list `SET c = src.c, ...`) +
  *       `WHEN NOT MATCHED THEN INSERT *` (or full identity list)
  *       → [[VersionedTable.merge]] (keyed upsert; `src` may be any
  *       query — a registered view, or an inline subquery)
  *     `WHEN MATCHED THEN DELETE` as the ONLY clause
  *       → [[VersionedTable.delete]] (anti-join by key)
  *   - `DESCRIBE HISTORY t` / `DESCRIBE HISTORY '/path'` →
  *     [[VersionedTable.history]]
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

  /** Whether `query` can change table/session state (MERGE / UPDATE /
    * DELETE / INSERT / CREATE / DROP / SET / ...). Pure text probe —
    * must stay cheap; it runs on every /sql request when auth is on.
    */
  def isMutation(query: String): Boolean = {
    val s = query.dropWhile(c => c.isWhitespace || c == '(')
    val verb = s.takeWhile(_.isLetter).toUpperCase
    !ReadVerbs.contains(verb)
  }

  /** Route `query` to the vtable API if it is a supported DML /
    * maintenance statement against a registered vtable; None otherwise
    * (caller falls through to `spark.sql`).
    */
  def dispatch(svc: QueryService, query: String): Option[DataFrame] = {
    val verb = query.trim.takeWhile(c => !c.isWhitespace && c != '(').toUpperCase
    verb match {
      case "DESCRIBE" => describeHistory(svc, query)
      case "MERGE" | "UPDATE" | "DELETE" => dml(svc, query)
      case _ => None
    }
  }

  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*$""".r

  private def describeHistory(svc: QueryService, query: String): Option[DataFrame] =
    query match {
      case HistoryRe(target) =>
        val dir = unquotePath(target)
          .orElse(resolveVTable(svc, unquoteIdent(target)).map(_._1))
          .getOrElse(throw new IllegalArgumentException(
            s"DESCRIBE HISTORY: '$target' is not a registered vtable view or a quoted table path"))
        Some(VersionedTable(svc.spark, dir).history())
      case _ => None // plain DESCRIBE t — Spark's own statement
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

  private def dml(svc: QueryService, query: String): Option[DataFrame] = {
    val plan =
      try svc.spark.sessionState.sqlParser.parsePlan(query)
      catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        return None // let spark.sql raise the parse error itself
      }
    plan match {
      case DeleteFromTable(tbl, cond) =>
        target(svc, tbl).map { case (dir, quals, _) =>
          noSubquery(cond, "DELETE")
          commit(svc, dir) { vt =>
            vt.deleteWhere(toColumn(strip(cond, quals)))
          }
        }
      case UpdateTable(tbl, assigns, cond) =>
        target(svc, tbl).map { case (dir, quals, _) =>
          val set = assigns.map { case Assignment(k, v) =>
            noSubquery(v, "UPDATE")
            colName(k, quals).getOrElse(fail(
              s"UPDATE supports only plain column assignment targets, got ${k.sql}")) ->
              toColumn(strip(v, quals))
          }.toMap
          commit(svc, dir) { vt =>
            vt.updateWhere(
              cond.map(c => { noSubquery(c, "UPDATE"); toColumn(strip(c, quals)) })
                .getOrElse(org.apache.spark.sql.functions.lit(true)),
              set)
          }
        }
      case m: MergeIntoTable =>
        target(svc, m.targetTable).map { case (dir, targetQuals, cols) =>
          val quals = targetQuals ++ aliasesOf(m.sourceTable)
          val key = mergeKey(m.mergeCondition, quals, cols)
          val source = GraftSqlBridge.ofRows(svc.spark, m.sourceTable)
          commit(svc, dir) { vt =>
            mergeForm(m, quals, cols) match {
              case Upsert    => vt.merge(source, key)
              case DeleteAll => vt.delete(source.select(key), key)
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
  private def commit(svc: QueryService, dir: String)(op: VersionedTable => Int)
      : DataFrame = {
    val vt = VersionedTable(svc.spark, dir)
    val preHead = vt.currentVersion
    val v = op(vt)
    svc.results.noteCommand()
    refreshViews(svc, dir, preHead)
    import org.apache.spark.sql.functions.lit
    svc.spark.range(1).select(lit(v).as("version"))
  }

  /** Re-point every registered view that is a bare vtable scan of
    * `dir` pinned at `preHead` to the new head — read-your-writes for
    * the view the statement targeted (and any other registration of
    * the same table at head). Time-traveled pins are left alone.
    */
  private def refreshViews(svc: QueryService, dir: String, preHead: Int): Unit =
    svc.listTables().foreach { name =>
      relationOf(svc, name).foreach { r =>
        if (r.dir == dir && r.version == preHead)
          VersionedTable(svc.spark, dir).scan().createOrReplaceTempView(name)
      }
    }

  // ---- target resolution -------------------------------------------

  /** Resolve a DML target plan to (table dir, lowercased qualifier
    * names that may prefix its columns, committed column names). None
    * when the target is not a single-part name registered as a BARE
    * vtable scan.
    */
  private def target(svc: QueryService, plan: LogicalPlan)
      : Option[(String, Set[String], Seq[String])] = {
    def walk(p: LogicalPlan, quals: Set[String])
        : Option[(String, Set[String], Seq[String])] = p match {
      case SubqueryAlias(id, child) => walk(child, quals + id.name.toLowerCase)
      case UnresolvedRelation(parts, _, _) if parts.length == 1 =>
        val name = parts.head
        resolveVTable(svc, name).map { case (dir, cols) =>
          (dir, quals + name.toLowerCase, cols)
        }
      case _ => None
    }
    walk(plan, Set.empty)
  }

  /** A registered name whose analyzed view plan is a bare
    * [[VTableRelation]] → (dir, column names).
    */
  private def resolveVTable(svc: QueryService, name: String)
      : Option[(String, Seq[String])] =
    relationOf(svc, name).map(r => (r.dir, r.output.map(_.name)))

  private def relationOf(svc: QueryService, name: String): Option[VTableRelation] = {
    def bare(p: LogicalPlan): Option[VTableRelation] = p match {
      case r: VTableRelation   => Some(r)
      case s: SubqueryAlias    => bare(s.child)
      case v: View             => bare(v.child)
      case _                   => None
    }
    try bare(svc.spark.table(name).queryExecution.analyzed)
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

  private val SupportedMergeForms =
    "supported MERGE forms: 'WHEN MATCHED THEN UPDATE SET * WHEN NOT " +
      "MATCHED THEN INSERT *' (explicit full-coverage identity " +
      "assignment lists also accepted) for keyed upsert, or 'WHEN " +
      "MATCHED THEN DELETE' alone for keyed delete; clause conditions " +
      "(WHEN MATCHED AND ...) and partial-column updates are not " +
      "expressible against this table"

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

  private def mergeForm(m: MergeIntoTable, quals: Set[String], cols: Seq[String])
      : MergeForm = {
    if (m.notMatchedBySourceActions.nonEmpty)
      fail(s"MERGE WHEN NOT MATCHED BY SOURCE is not supported; $SupportedMergeForms")
    (m.matchedActions.toList, m.notMatchedActions.toList) match {
      case (List(DeleteAction(None)), Nil) => DeleteAll
      case (List(matched), List(notMatched)) =>
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
        if (updOk && insOk) Upsert
        else fail(s"unsupported MERGE clause shape; $SupportedMergeForms")
      case _ => fail(s"unsupported MERGE clause combination; $SupportedMergeForms")
    }
  }
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
