package graft

import graft.service.SqlDml

/** Randomized gate for the quote/comment-aware branch-read scanner
  * (`SqlDml.rewriteBranchReads`): two rounds of advisor findings were
  * scanner desyncs (the lifecycle-verb guard, then backslash escapes),
  * so this pins the two properties every future edit must keep:
  *
  *   1. LITERAL PRESERVATION — string literals (doubled-quote AND
  *      backslash-escaped dialects, adversarial contents including
  *      the word BRANCH followed by quotes) pass through byte-for-byte
  *      while a genuine `FROM t BRANCH 'b'` ref in the same statement
  *      still rewrites;
  *   2. IDENTITY — statements with no rewritable ref (lifecycle verbs,
  *      refs inside literals/comments/backticks, bare BRANCH with no
  *      following literal) come back unchanged.
  */
class BranchScanProps extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new scala.util.Random(20260816L)

  // adversarial literal CONTENTS (pre-escaping): quote runs, escape
  // runs, comment markers, the keyword itself in every case mix
  private def rawContent(): String = {
    val atoms = Seq("BRANCH", "branch", "Branch", "'", "''", "\\", "\\'",
      "--", "/*", "*/", "`", "\"", "b", " ", "BRANCH 'x'", "VERSION AS OF",
      "it's", "a\\b")
    (0 until rnd.nextInt(6)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
  }

  /** Render `content` as a single-quoted literal under the DOUBLING
    * convention (both lexer dialects read it identically) — backslashes
    * are excluded from the content for this form.
    */
  private def doubledLit(content: String): String =
    "'" + content.replace("\\", "").replace("'", "''") + "'"

  /** Render under the BACKSLASH convention (Spark's default lexer). */
  private def backslashLit(content: String): String =
    "'" + content.replace("\\", "\\\\").replace("'", "\\'") + "'"

  test("literals pass through byte-for-byte while the genuine ref still rewrites (randomized)") {
    (1 to 400).foreach { _ =>
      val content = rawContent()
      val lit =
        if (rnd.nextBoolean()) doubledLit(content) else backslashLit(content)
      val sql = s"SELECT $lit AS s FROM t BRANCH 'exp' WHERE x > 1"
      val want = s"SELECT $lit AS s FROM t VERSION AS OF 'exp' WHERE x > 1"
      val got = SqlDml.rewriteBranchReads(sql)
      assert(got == want, s"\nsql= $sql\ngot= $got\nwant=$want")
    }
  }

  test("statements with no rewritable ref come back unchanged (randomized)") {
    (1 to 400).foreach { _ =>
      val content = rawContent()
      val lit =
        if (rnd.nextBoolean()) doubledLit(content) else backslashLit(content)
      val shapes = Seq(
        s"SELECT $lit AS s FROM t WHERE x > 1",
        s"ALTER TABLE t CREATE BRANCH b",
        s"ALTER TABLE t DROP BRANCH b",
        s"ALTER TABLE t MERGE BRANCH b KEY k",
        s"SELECT * FROM t -- BRANCH 'c' in a line comment\nWHERE x = $lit",
        s"SELECT * FROM t /* BRANCH 'c' in a block comment */ WHERE x = $lit",
        s"SELECT `BRANCH` FROM t WHERE x = $lit",
        s"SELECT branchy, BRANCH2 FROM t_branch WHERE x = $lit",
        s"SELECT 'BRANCH ''q''' AS s, $lit AS u FROM t")
      val sql = shapes(rnd.nextInt(shapes.size))
      val got = SqlDml.rewriteBranchReads(sql)
      assert(got == sql, s"\nsql= $sql\ngot= $got")
    }
  }

  test("the escapedStringLiterals dialect lexes backslashes as literal characters") {
    // under spark.sql.parser.escapedStringLiterals=true the quote
    // ALWAYS closes ('a\' is a complete literal), so the scanner must
    // not let a trailing backslash open a phantom span that swallows a
    // genuine ref — and a decoy after such a literal stays data
    val sql = raw"SELECT 'C:\' AS p FROM t BRANCH 'exp'"
    val want = raw"SELECT 'C:\' AS p FROM t VERSION AS OF 'exp'"
    assert(SqlDml.rewriteBranchReads(sql, backslashEscapes = false) == want)
    val decoy = raw"SELECT 'a\' AS x, 'BRANCH ''b'' ' AS y FROM t"
    assert(SqlDml.rewriteBranchReads(decoy, backslashEscapes = false) == decoy)
    // the DEFAULT dialect processes the escape: '\'' stays one literal
    val dflt = raw"SELECT 'it\'s BRANCH ''q''' AS s FROM t BRANCH 'exp'"
    val dWant = raw"SELECT 'it\'s BRANCH ''q''' AS s FROM t VERSION AS OF 'exp'"
    assert(SqlDml.rewriteBranchReads(dflt, backslashEscapes = true) == dWant)
  }

  test("multiple genuine refs all rewrite; mixed with decoys in literals") {
    val sql = "SELECT a.x FROM t BRANCH 'a' a JOIN t BRANCH 'b' b " +
      "ON a.k = b.k WHERE a.s <> 'use BRANCH ''c'' here' AND b.s <> 'BRANCH \\'d\\''"
    val want = "SELECT a.x FROM t VERSION AS OF 'a' a JOIN t VERSION AS OF 'b' b " +
      "ON a.k = b.k WHERE a.s <> 'use BRANCH ''c'' here' AND b.s <> 'BRANCH \\'d\\''"
    assert(SqlDml.rewriteBranchReads(sql) == want)
  }

  // ---- the WRITE scanner (rewriteBranchWrites) ----------------------

  /** The write scanner shares the read scanner's lexer discipline but
    * resolves targets through the session catalog, so its properties
    * run against the shared test session. Identity must hold for:
    * read-position refs (the read scanner's territory), unresolvable
    * targets (aliases, native tables), lifecycle verbs, and any
    * BRANCH text inside literals/comments/backticks.
    */
  test("write scanner: identity on everything that is not a resolvable write target (randomized)") {
    val spark = TestSpark.spark
    (1 to 400).foreach { _ =>
      val content = rawContent()
      val useBackslash = rnd.nextBoolean()
      val lit = if (useBackslash) backslashLit(content) else doubledLit(content)
      val shapes = Seq(
        // read positions stay for the read scanner
        s"SELECT $lit AS s FROM t BRANCH 'exp' WHERE x > 1",
        s"MERGE INTO t AS x USING s BRANCH 'b' ON x.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET *",
        // unresolvable targets (no such view in the session)
        s"INSERT INTO no_such_vw_${rnd.nextInt(1000)} BRANCH 'b' VALUES (1)",
        s"UPDATE not_registered BRANCH 'b' SET x = $lit",
        s"DELETE FROM nothing_here BRANCH 'b' WHERE x = $lit",
        // lifecycle verbs use bare identifiers — never a literal
        "ALTER TABLE t CREATE BRANCH b",
        "ALTER TABLE t MERGE BRANCH b KEY k DROP",
        // decoys in literals/comments/backticks
        s"INSERT INTO x VALUES ($lit, 'INSERT INTO t BRANCH ''b''')",
        s"UPDATE x SET s = $lit -- UPDATE t BRANCH 'b' in a comment",
        s"SELECT `BRANCH` FROM x WHERE s = $lit")
      val sql = shapes(rnd.nextInt(shapes.size))
      val got = SqlDml.rewriteBranchWrites(spark, sql,
        backslashEscapes = useBackslash)
      assert(got == sql, s"\nsql= $sql\ngot= $got")
    }
  }

  test("write scanner: a resolvable target rewrites to the branch dir; literals survive byte-for-byte") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bwprops").toString + "/t"
    val vt = graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "a")).toDF("k", "s"))
    vt.createBranch("exp")
    vt.scan().createOrReplaceTempView("bwprops_t")
    val bdir = vt.branch("exp").dir
    (1 to 200).foreach { _ =>
      val content = rawContent()
      val useBackslash = rnd.nextBoolean()
      val lit = if (useBackslash) backslashLit(content) else doubledLit(content)
      val (sql, want) = rnd.nextInt(4) match {
        // UPDATE/DELETE/MERGE without a user alias re-alias AS the
        // original name, so qualified column refs keep resolving;
        // INSERT targets take no alias in the grammar, and an explicit
        // user alias is never overridden
        case 0 => (s"INSERT INTO bwprops_t BRANCH 'exp' VALUES (1, $lit)",
          s"INSERT INTO `$bdir` VALUES (1, $lit)")
        case 1 => (s"UPDATE bwprops_t BRANCH 'exp' SET s = $lit WHERE k = 1",
          s"UPDATE `$bdir` AS `bwprops_t` SET s = $lit WHERE k = 1")
        case 2 => (s"DELETE FROM bwprops_t BRANCH 'exp' WHERE s = $lit",
          s"DELETE FROM `$bdir` AS `bwprops_t` WHERE s = $lit")
        case _ => (s"MERGE INTO bwprops_t BRANCH 'exp' AS t USING s " +
          s"ON t.k = s.k WHEN MATCHED THEN UPDATE SET s = $lit",
          s"MERGE INTO `$bdir` AS t USING s " +
            s"ON t.k = s.k WHEN MATCHED THEN UPDATE SET s = $lit")
      }
      val got = SqlDml.rewriteBranchWrites(spark, sql,
        backslashEscapes = useBackslash)
      assert(got == want, s"\nsql= $sql\ngot= $got\nwant=$want")
    }
    spark.catalog.dropTempView("bwprops_t")
    ()
  }

  test("write scanner: backticked keywords never spoof a write-target position") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bwspoof").toString + "/t"
    val vt = graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "a")).toDF("k", "s"))
    vt.createBranch("exp")
    vt.scan().createOrReplaceTempView("bwspoof_t")
    // `UPDATE` here is a backtick-quoted COLUMN, not the verb: the
    // following `bwspoof_t BRANCH 'exp'` sits in READ position and
    // must stay for the read scanner (identity under the write pass)
    val readPos = "SELECT `UPDATE` FROM x JOIN bwspoof_t BRANCH 'exp' ON 1=1"
    // w2 = backticked `UPDATE`, w1 = bwspoof_t: looks like an UPDATE
    // target if bareness is ignored
    val spoof = "SELECT a, `UPDATE` bwspoof_t BRANCH 'exp' FROM x"
    Seq(readPos, spoof).foreach { sql =>
      val got = SqlDml.rewriteBranchWrites(spark, sql, backslashEscapes = true)
      assert(got == sql, s"\nsql= $sql\ngot= $got")
    }
    spark.catalog.dropTempView("bwspoof_t")
    ()
  }

  test("write scanner: a comment or hint between target and BRANCH survives the rewrite") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bwmid").toString + "/t"
    val vt = graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "a")).toDF("k", "s"))
    vt.createBranch("exp")
    vt.scan().createOrReplaceTempView("bwmid_t")
    val bdir = vt.branch("exp").dir
    val got = SqlDml.rewriteBranchWrites(spark,
      "INSERT INTO bwmid_t /*+ REPARTITION(4) */ BRANCH 'exp' VALUES (1, 'x')",
      backslashEscapes = true)
    assert(got.contains(s"`$bdir`"), got)
    assert(got.contains("/*+ REPARTITION(4) */"),
      s"hint between target and BRANCH was deleted: $got")
    spark.catalog.dropTempView("bwmid_t")
    ()
  }

  test("write scanner: a qualified write target fails with the guided message") {
    val spark = TestSpark.spark
    val e = intercept[Exception] {
      SqlDml.rewriteBranchWrites(spark,
        "INSERT INTO db.t BRANCH 'b' VALUES (1)", backslashEscapes = true)
    }
    assert(e.getMessage.contains("qualified"), e.getMessage)
    assert(e.getMessage.toLowerCase.contains("bare"), e.getMessage)
  }
}
