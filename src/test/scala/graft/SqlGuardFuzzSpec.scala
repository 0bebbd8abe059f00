package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.SqlGuard

/** Property-fuzz of the SqlGuard sandbox (r8 verdict task 4): two real
  * traversal bypasses were found BY HAND last round (banned functions in
  * named WINDOW specs; LATERAL VIEW's UnresolvedGenerator) — this suite
  * systematizes the hunt. A recursive generator over a small SQL grammar
  * (nested subqueries, CTEs, joins, set ops, window specs — inline and
  * named — generators, EXISTS/IN/scalar subqueries, higher-order lambdas,
  * HAVING, inline VALUES tables, TVF arguments, TABLESAMPLE, grouping
  * sets, DISTRIBUTE BY, PIVOT/UNPIVOT, correlated LATERAL subqueries,
  * join hints, aggregate FILTER clauses, LIMIT expressions) plants
  * exactly ONE poison — a banned
  * function, a non-allowlisted function, an unknown table, or a
  * non-allowlisted TVF — at a random expression/relation position and
  * asserts the verdict is NEVER Ok; the same skeletons rendered benign
  * must validate Ok, so the positive property keeps the grammar honest
  * (a generator emitting unparseable SQL would fail there, not vacuously
  * pass the poison side). Parse+validate only — no Spark jobs — so the
  * suite affords 1000+ cases.
  */
class SqlGuardFuzzSpec extends SparkSpec {

  private val views = Set("df", "t2")
  private val allowMode = Some(SqlGuard.defaultFunctionAllowlist)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default.withSize(40), Seed(seed))

  // ---------------------------------------------------------- grammar

  /** What must be smuggled into the query, exactly once. */
  private sealed trait Poison
  private case object Benign extends Poison
  private final case class PExpr(sql: String) extends Poison // expression slot
  private case object PTable extends Poison // unknown relation
  private case object PTvf extends Poison // non-allowlisted table function

  private val bannedExprs = Seq(
    "current_user()", "session_user()", "input_file_name()", "version()",
    "current_database()", "reflect('java.lang.System', 'getenv', 'PATH')",
    "java_method('java.lang.System', 'getProperty', 'user.dir')")
  private val nonAllowlisted = Seq(
    "rand()", "uuid()", "monotonically_increasing_id()",
    "spark_partition_id()", "shuffle(array(1, 2))")

  private val benignLeaf: Gen[String] =
    Gen.oneOf("a", "b", "c", "1", "2.5", "'x'", "NULL")

  private def benignExpr(depth: Int): Gen[String] =
    if (depth <= 0) benignLeaf
    else Gen.oneOf(
      benignLeaf,
      benignExpr(depth - 1).map(e => s"abs($e)"),
      benignExpr(depth - 1).map(e => s"coalesce($e, 0)"),
      Gen.zip(benignExpr(depth - 1), benignExpr(depth - 1))
        .map { case (x, y) => s"($x) + ($y)" },
      benignExpr(depth - 1)
        .map(e => s"CASE WHEN ($e) IS NOT NULL THEN 1 ELSE 0 END"),
      benignExpr(depth - 1)
        .map(e => s"transform(array(1, 2), x -> x + ($e))"))

  /** Wrap the poison expression in a random benign context so it lands in
    * lambda bodies, aggregate args, window args, window SPECS, CASE arms —
    * every expression position a traversal could plausibly skip. */
  private def poisonedExpr(p: String): Gen[String] = Gen.oneOf(
    Gen.const(p),
    Gen.const(s"($p) + 1"),
    Gen.const(s"abs($p)"),
    Gen.const(s"CASE WHEN ($p) IS NOT NULL THEN 1 ELSE 0 END"),
    Gen.const(s"transform(array(1, 2), x -> x + ($p))"),
    Gen.const(s"aggregate(array(1), 0, (acc, x) -> acc + ($p))"),
    Gen.const(s"filter(array(1, 2), x -> x > ($p))"),
    Gen.const(s"sum($p)"),
    Gen.const(s"lag($p, 1) OVER (ORDER BY a)"),
    Gen.const(s"row_number() OVER (PARTITION BY ($p) ORDER BY a)"),
    Gen.const(s"max(a) OVER (ORDER BY ($p) ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)"))

  private def exprSlot(depth: Int, poison: Poison): Gen[String] =
    poison match {
      case PExpr(p) => poisonedExpr(p)
      // relation poisons consumed at an EXPRESSION slot become scalar
      // subqueries over the poisoned relation — richer coverage (an
      // unknown table inside a SELECT-list subquery must also reject) and
      // no production can silently drop a poison
      case PTable => Gen.const("(SELECT max(a) FROM secrets)")
      case PTvf => Gen.const("(SELECT max(x) FROM sql_keywords())")
      case Benign => benignExpr(depth)
    }

  /** A relation (FROM-clause term). Consumes PTable/PTvf poisons; a PExpr
    * poison routed here goes into a derived-table subquery. */
  private def relation(depth: Int, poison: Poison): Gen[String] =
    poison match {
      case PTable => Gen.const("secrets")
      case PTvf => Gen.oneOf("sql_keywords()", "catalogs()")
      case Benign if depth <= 0 => Gen.oneOf("df", "t2")
      case _ if depth <= 0 =>
        // poison must not be dropped: force a derived table around it
        query(0, poison).map(q => s"($q) sq")
      case _ => Gen.frequency(
        3 -> (poison match {
          case Benign => Gen.oneOf("df", "t2")
          case _ => query(depth - 1, poison).map(q => s"($q) sq")
        }),
        2 -> query(depth - 1, poison).map(q => s"($q) sq"))
    }

  /** A full query. Exactly-once poison routing: each production picks one
    * slot to receive the poison; all other slots render benign. */
  private def query(depth: Int, poison: Poison): Gen[String] = {
    val d = math.max(depth - 1, 0)
    def slots(n: Int): Gen[Int] = poison match {
      case Benign => Gen.const(-1) // nobody gets it
      case _ => Gen.choose(0, n - 1)
    }
    def at(hit: Int, me: Int): Poison = if (hit == me) poison else Benign

    val simple = for {
      hit <- slots(4)
      e1 <- exprSlot(d, at(hit, 0))
      rel <- relation(d, at(hit, 1))
      wcond <- exprSlot(d, at(hit, 2))
      ord <- exprSlot(d, at(hit, 3))
    } yield s"SELECT $e1 AS out1, a FROM $rel WHERE ($wcond) IS NOT NULL " +
      s"ORDER BY ($ord), a LIMIT 10"

    val grouped = for {
      hit <- slots(4)
      g <- exprSlot(d, at(hit, 0))
      agg <- exprSlot(d, at(hit, 1))
      rel <- relation(d, at(hit, 2))
      hav <- exprSlot(d, at(hit, 3))
    } yield s"SELECT ($g) AS k, sum($agg) AS s FROM $rel GROUP BY ($g) " +
      s"HAVING count(*) > 0 AND ($hav) IS NOT NULL"

    val joined = for {
      hit <- slots(4)
      r1 <- relation(d, at(hit, 0))
      r2 <- relation(d, at(hit, 1))
      on <- exprSlot(d, at(hit, 2))
      sel <- exprSlot(d, at(hit, 3))
      jt <- Gen.oneOf("JOIN", "LEFT JOIN", "FULL JOIN", "LEFT SEMI JOIN",
        "LEFT ANTI JOIN")
      // no extra aliases: a derived-table relation already carries its own
      // (`(...) sq x` is a parse error)
    } yield s"SELECT $sel AS out1 FROM $r1 $jt $r2 ON ($on) IS NOT NULL"

    val cte = for {
      hit <- slots(3)
      inner <- query(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
      wcond <- exprSlot(d, at(hit, 2))
    } yield s"WITH cte1 AS ($inner) SELECT $sel AS out1 FROM cte1 " +
      s"WHERE ($wcond) IS NOT NULL"

    val setop = for {
      hit <- slots(2)
      q1 <- query(d, at(hit, 0))
      q2 <- query(d, at(hit, 1))
      op <- Gen.oneOf("UNION ALL", "UNION", "INTERSECT", "EXCEPT")
    } yield s"SELECT out1 FROM ($q1) u1 $op SELECT out1 FROM ($q2) u2"

    val lateral = for {
      hit <- slots(2)
      e <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
    } yield s"SELECT $sel AS out1, v FROM df " +
      s"LATERAL VIEW explode(array(($e), 1)) lv AS v"

    val namedWindow = for {
      hit <- slots(2)
      spec <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
    } yield s"SELECT row_number() OVER w AS r, $sel AS out1 FROM df " +
      s"WINDOW w AS (PARTITION BY ($spec) ORDER BY a)"

    val existsq = for {
      hit <- slots(3)
      sub <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
      subrel <- relation(d, at(hit, 2))
    } yield s"SELECT $sel AS out1 FROM df WHERE EXISTS " +
      s"(SELECT 1 FROM $subrel WHERE ($sub) IS NOT NULL)"

    val inq = for {
      hit <- slots(2)
      sub <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
    } yield s"SELECT $sel AS out1 FROM df WHERE a IN " +
      s"(SELECT ($sub) FROM t2)"

    val scalarSub = for {
      hit <- slots(2)
      sub <- exprSlot(d, at(hit, 0))
      wcond <- exprSlot(d, at(hit, 1))
    } yield s"SELECT (SELECT max($sub) FROM t2) AS out1 FROM df " +
      s"WHERE ($wcond) IS NOT NULL"

    val valuesTab = for {
      hit <- slots(2)
      e <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
      // single row: a second row would have to be type-compatible with
      // whatever $e renders as (the parser itself raises
      // INVALID_INLINE_TABLE on a mixed-type column)
    } yield s"SELECT $sel AS out1, x FROM VALUES (($e), 1) AS tab(x, y)"

    // TVF ARGUMENTS (r9 verdict task 7): an allowed TVF's argument list is
    // an expression position the relation-level TVF check does not cover —
    // a poison could hide INSIDE `range(...)`'s args (banned function,
    // scalar subquery over an unknown table / unlisted TVF via exprSlot's
    // relation-poison mapping). The guard must scan functionArgs like any
    // other expression root.
    val tvfArgs = for {
      hit <- slots(2)
      e <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
    } yield s"SELECT $sel AS out1, id FROM " +
      s"range(1, CAST(abs(coalesce(($e), 1)) AS BIGINT) + 2)"

    // TABLESAMPLE wraps a relation — the sampled relation (and a poison
    // next to it) must still be walked. The sample clause only attaches to
    // a plain table/TVF primary (an aliased derived table cannot carry
    // it), so relation poisons go straight on the sampled name and
    // expression poisons into the select list.
    val sampled = poison match {
      case PTable =>
        Gen.const("SELECT a AS out1 FROM secrets TABLESAMPLE (50 PERCENT)")
      case PTvf =>
        Gen.const("SELECT x AS out1 FROM sql_keywords() TABLESAMPLE (50 PERCENT)")
      case _ => for {
        sel <- exprSlot(d, poison)
        rel <- Gen.oneOf("df", "t2")
      } yield s"SELECT $sel AS out1 FROM $rel TABLESAMPLE (50 PERCENT)"
    }

    // GROUPING SETS / ROLLUP / CUBE hold expressions in a grouping
    // container some traversals treat specially
    val groupingSets = for {
      hit <- slots(3)
      g <- exprSlot(d, at(hit, 0))
      agg <- exprSlot(d, at(hit, 1))
      rel <- relation(d, at(hit, 2))
      form <- Gen.oneOf(
        (x: String) => s"GROUPING SETS ((a), (a, ($x)))",
        (x: String) => s"ROLLUP (a, ($x))",
        (x: String) => s"CUBE (a, ($x))")
    } yield s"SELECT a, sum($agg) AS s FROM $rel GROUP BY ${form(g)}"

    // DISTRIBUTE BY / SORT BY are read-only shuffle directives whose
    // expressions must still be scanned
    val distributed = for {
      hit <- slots(2)
      e <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
    } yield s"SELECT $sel AS out1, a FROM df DISTRIBUTE BY ($e) SORT BY a"

    // PIVOT carries its aggregate expressions on a dedicated Pivot node
    // (not a Project) — a poison inside the measure, or in the pivoted
    // source relation, must still be walked
    val pivoted = for {
      hit <- slots(2)
      agg <- exprSlot(d, at(hit, 0))
      rel <- relation(d, at(hit, 1))
    } yield s"SELECT * FROM (SELECT a, b FROM $rel) pvsrc " +
      s"PIVOT (sum($agg) FOR b IN (1, 2))"

    // UNPIVOT nests its id/value columns Seq[Seq[NamedExpression]]-deep in
    // the Unpivot node — the node must stay walked (relation poisons) and
    // expressions computed next to it scanned
    val unpivoted = for {
      hit <- slots(2)
      e <- exprSlot(d, at(hit, 0))
      rel <- relation(d, at(hit, 1))
    } yield s"SELECT k, v FROM (SELECT a, b, ($e) AS c0 FROM $rel) upsrc " +
      s"UNPIVOT (v FOR k IN (b, c0))"

    // LATERAL (correlated derived table): the subquery plan hangs off a
    // LateralSubquery PlanExpression on the LateralJoin node, NOT off
    // children — exactly the holder shape the r9 subPlans fix walks
    val lateralJoin = for {
      hit <- slots(2)
      sub <- query(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
    } yield s"SELECT $sel AS out1 FROM df, LATERAL ($sub) lj"

    // /*+ hints */: UnresolvedHint holds parameters as Seq[Any] (full
    // expressions allowed at parse time) AND wraps the child plan — both
    // positions must be walked
    val hinted = for {
      hit <- slots(2)
      e <- exprSlot(d, at(hit, 0))
      rel <- relation(d, at(hit, 1))
      h <- Gen.oneOf("BROADCAST(df)", "MERGE(t2)", "COALESCE(2)",
        "REPARTITION(4)")
    } yield s"SELECT /*+ $h */ ($e) AS out1 FROM $rel"

    // aggregate FILTER (WHERE ...) — the predicate hangs on
    // AggregateExpression.filter, a dedicated expression slot NEXT TO
    // (not inside) the function's argument list; a traversal that only
    // scans arguments would skip it
    val aggFiltered = for {
      hit <- slots(3)
      agg <- exprSlot(d, at(hit, 0))
      pred <- exprSlot(d, at(hit, 1))
      rel <- relation(d, at(hit, 2))
    } yield s"SELECT sum($agg) FILTER (WHERE ($pred) IS NOT NULL) AS s " +
      s"FROM $rel"

    // LIMIT holds a FULL expression at parse time (foldability is an
    // analysis-time rule) — GlobalLimit/LocalLimit sit above the Sort,
    // outside every SELECT/WHERE clause scan
    val limited = for {
      hit <- slots(2)
      e <- exprSlot(d, at(hit, 0))
      sel <- exprSlot(d, at(hit, 1))
    } yield s"SELECT $sel AS out1 FROM df ORDER BY a " +
      s"LIMIT abs(coalesce(CAST(($e) AS INT), 1))"

    if (depth <= 0) simple
    else Gen.oneOf(simple, grouped, joined, cte, setop, lateral,
      namedWindow, existsq, inq, scalarSub, valuesTab, tvfArgs,
      sampled, groupingSets, distributed, pivoted, unpivoted,
      lateralJoin, hinted, aggFiltered, limited)
  }

  private def verdict(sql: String,
      mode: Option[Set[String]]): SqlGuard.Verdict =
    SqlGuard.check(spark, sql, views, mode)

  // ---------------------------------------------------------- properties

  test("benign grammar validates Ok under the default allowlist (positive " +
      "control: the grammar parses and uses only sanctioned surface)") {
    (0 until 300).foreach { i =>
      val sql = sample(query(3, Benign), 1000L + i)
      val v = verdict(sql, allowMode)
      assert(v == SqlGuard.Ok, s"benign query rejected: $v\n$sql")
    }
  }

  test("a banned function is NEVER Ok, at any expression position, " +
      "under both modes") {
    var n = 0
    bannedExprs.foreach { p =>
      (0 until 60).foreach { i =>
        val sql = sample(query(3, PExpr(p)), 5000L + 100L * n + i)
        for (mode <- Seq(None, allowMode)) {
          val v = verdict(sql, mode)
          assert(v != SqlGuard.Ok,
            s"banned '$p' slipped through (mode=${mode.isDefined}):\n$sql")
        }
      }
      n += 1
    }
  }

  test("a non-allowlisted function is NEVER Ok under allowlist mode, " +
      "at any expression position") {
    var n = 0
    nonAllowlisted.foreach { p =>
      (0 until 60).foreach { i =>
        val sql = sample(query(3, PExpr(p)), 9000L + 100L * n + i)
        val v = verdict(sql, allowMode)
        assert(v != SqlGuard.Ok, s"non-allowlisted '$p' slipped through:\n$sql")
      }
      n += 1
    }
  }

  test("an unknown table is NEVER Ok, at any relation position " +
      "(incl. subqueries, CTE bodies, EXISTS)") {
    (0 until 200).foreach { i =>
      val sql = sample(query(3, PTable), 13000L + i)
      val v = verdict(sql, None)
      assert(v != SqlGuard.Ok, s"unknown table slipped through:\n$sql")
    }
  }

  test("a non-allowlisted TVF is NEVER Ok, at any relation position") {
    (0 until 200).foreach { i =>
      val sql = sample(query(3, PTvf), 17000L + i)
      val v = verdict(sql, None)
      assert(v != SqlGuard.Ok, s"TVF slipped through:\n$sql")
    }
  }

  test("a poison inside an ALLOWED TVF's argument list is NEVER Ok " +
      "(r9 task 7: functionArgs are an expression position)") {
    // dedicated sweep pinning the tvfArgs production specifically — the
    // mixed-grammar properties above hit it only 1/12th of the time
    def tvfWrap(arg: String) =
      s"SELECT id FROM range(1, CAST(abs(coalesce(($arg), 1)) AS BIGINT) + 2)"
    bannedExprs.foreach { p =>
      assert(verdict(tvfWrap(p), None) != SqlGuard.Ok,
        s"banned '$p' slipped through a range() argument")
    }
    assert(verdict(tvfWrap("(SELECT max(a) FROM secrets)"), None)
      != SqlGuard.Ok, "unknown table in a TVF-arg subquery slipped through")
    assert(verdict(tvfWrap("(SELECT max(x) FROM sql_keywords())"), None)
      != SqlGuard.Ok, "unlisted TVF in a TVF-arg subquery slipped through")
    nonAllowlisted.foreach { p =>
      assert(verdict(tvfWrap(p), allowMode) != SqlGuard.Ok,
        s"non-allowlisted '$p' slipped through a range() argument")
    }
    // positive control: benign args keep range() legal
    assert(verdict(tvfWrap("1 + 1"), allowMode) == SqlGuard.Ok)
  }

  test("EXECUTE IMMEDIATE and parameter markers: never Ok, never a crash") {
    // EXECUTE IMMEDIATE smuggles arbitrary SQL behind a string literal —
    // whatever node Spark 4 parses it to must land outside the node
    // allowlist (fail-closed), in both modes
    for (sql <- Seq(
        "EXECUTE IMMEDIATE 'SELECT * FROM secrets'",
        "EXECUTE IMMEDIATE 'SELECT 1'",
        "EXECUTE IMMEDIATE 'SELECT a FROM df' INTO v1",
        "EXECUTE IMMEDIATE 'SELECT ?' USING 5");
        mode <- Seq(None, allowMode)) {
      val v = verdict(sql, mode)
      assert(v != SqlGuard.Ok, s"EXECUTE IMMEDIATE was Ok: $sql")
    }
    // parameter markers are literal placeholders (nothing can hide behind
    // one); the walk must traverse them without crashing, and they must
    // not legalize an out-of-scope relation next to them
    assert(verdict("SELECT :p1 FROM df", None) != null)
    assert(verdict("SELECT ? FROM df", None) != null)
    assert(verdict("SELECT :p1 FROM secrets", None) != SqlGuard.Ok)
    assert(verdict("SELECT ? AS x FROM df WHERE a IN (SELECT a FROM secrets)",
      None) != SqlGuard.Ok)
  }

  test("IDENTIFIER() indirection never smuggles a relation or function " +
      "name behind a string literal") {
    // IDENTIFIER('x') defers name resolution past parse time — the guard
    // validates the PARSED plan, so both the relation form
    // (PlanWithUnresolvedIdentifier) and the function form
    // (ExpressionWithUnresolvedIdentifier) must fail closed rather than
    // slip past the name scans
    for (sql <- Seq(
        "SELECT a FROM IDENTIFIER('secrets')",
        "SELECT a FROM IDENTIFIER('sec' || 'rets')",
        "SELECT IDENTIFIER('current_user')() FROM df",
        "SELECT IDENTIFIER('reflect')('java.lang.System', 'getenv', 'PATH') FROM df",
        "SELECT IDENTIFIER(concat('current', '_user'))() FROM df",
        "SELECT x FROM IDENTIFIER('sql_keywords')()");
        mode <- Seq(None, allowMode)) {
      val v = verdict(sql, mode)
      assert(v != SqlGuard.Ok, s"IDENTIFIER indirection was Ok: $sql")
    }
  }

  test("bare literal-function keywords never leak identity (no-paren " +
      "current_user/session_user/user fallback)") {
    // Spark's LiteralFunctionResolution resolves a bare, otherwise
    // unresolvable attribute named current_user/user/session_user to the
    // corresponding nullary function — no UnresolvedFunction node exists
    // at parse time, so the function denylist alone never sees it
    for (sql <- Seq(
        "SELECT current_user FROM df",
        "SELECT session_user FROM df",
        "SELECT user FROM df",
        "SELECT upper(current_user) AS u FROM df",
        "SELECT a FROM df ORDER BY current_user");
        mode <- Seq(None, allowMode)) {
      val v = verdict(sql, mode)
      assert(v != SqlGuard.Ok, s"bare literal function was Ok: $sql")
    }
  }

  test("script transform, pipe syntax, recursive CTEs: walked or rejected, " +
      "never a blind spot") {
    // TRANSFORM ... USING pipes rows through an arbitrary shell command —
    // must never validate, in any mode
    for (sql <- Seq(
        "SELECT TRANSFORM(a) USING '/bin/cat' FROM df",
        "SELECT TRANSFORM(a) USING 'sh -c id' AS (x STRING) FROM df",
        "FROM df SELECT TRANSFORM(a) USING '/bin/cat'");
        mode <- Seq(None, allowMode)) {
      assert(verdict(sql, mode) != SqlGuard.Ok,
        s"script transform was Ok: $sql")
    }
    // SQL pipe syntax desugars to ordinary plan nodes — poisons in pipe
    // stages must still reject, and benign pipes must still pass (if the
    // parser accepts them at all; a parse rejection is also safe)
    assert(verdict("FROM secrets |> WHERE a > 1 |> SELECT a", None)
      != SqlGuard.Ok, "pipe syntax legalized an unknown table")
    assert(verdict("FROM df |> SELECT current_user() AS u", None)
      != SqlGuard.Ok, "pipe syntax smuggled a banned function")
    assert(verdict(
      "FROM df |> WHERE a IN (SELECT a FROM secrets) |> SELECT a", None)
      != SqlGuard.Ok, "pipe-stage subquery smuggled an unknown table")
    // recursive CTE (if parseable): whatever node it lands on must either
    // be walked (names checked) or fall outside the allowlist — an
    // out-of-scope relation in the recursive body must never be Ok
    assert(verdict(
      "WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL " +
        "SELECT n + 1 FROM secrets WHERE n < 3) SELECT n FROM r", None)
      != SqlGuard.Ok, "recursive CTE body legalized an unknown table")
  }

  test("hint parameters and time-travel clauses: never a blind spot") {
    // UnresolvedHint.parameters is Seq[Any] — the parser accepts full
    // expressions there, a position outside any SELECT/WHERE clause scan.
    // QueryPlan.expressions DOES collect them (Iterable recursion), so a
    // poison hint parameter must reject like any other expression; a
    // parse rejection is equally safe.
    for (sql <- Seq(
        "SELECT /*+ REPARTITION(4, current_user()) */ a FROM df",
        "SELECT /*+ RANGE_JOIN(df, reflect('java.lang.System', 'getenv', 'PATH')) */ a FROM df",
        "SELECT /*+ REPARTITION((SELECT max(a) FROM secrets)) */ a FROM df");
        mode <- Seq(None, allowMode)) {
      assert(verdict(sql, mode) != SqlGuard.Ok,
        s"poison hint parameter was Ok: $sql")
    }
    // an unknown hint NAME on a legal query is advisory noise, not a leak
    assert(verdict("SELECT /*+ TOTALLY_MADE_UP(df) */ a FROM df", None)
      == SqlGuard.Ok)
    // time travel (VERSION/TIMESTAMP AS OF) parses to RelationTimeTravel,
    // which is outside the node allowlist — fail closed in both modes
    // (the guard's registered views are session TEMP views; a time-travel
    // read would bypass them into a catalog table's history)
    for (sql <- Seq(
        "SELECT a FROM df VERSION AS OF 1",
        "SELECT a FROM df TIMESTAMP AS OF '2020-01-01'",
        "SELECT a FROM secrets VERSION AS OF 1");
        mode <- Seq(None, allowMode)) {
      assert(verdict(sql, mode) != SqlGuard.Ok,
        s"time-travel clause was Ok: $sql")
    }
    // session-variable references: the r10 pin accepted these because
    // rejecting session.* paths would break struct columns named
    // `session` — r12 FLIPPED that pin: qualifying through the view
    // (df.session.x) resolves the same column and passes, so the
    // fail-closed rejection costs only an alias, not the column (the
    // escape hatch the r10 rationale lacked). The flip is pinned in the
    // dedicated r12 session-variable test below; here keep the escape
    // hatch itself pinned.
    assert(verdict("SELECT system.session.x FROM df", None) != SqlGuard.Ok)
    assert(verdict("SELECT session.x FROM df", None) != SqlGuard.Ok)
    assert(verdict("SELECT df.session.x FROM df", None) == SqlGuard.Ok)
  }

  test("expression holders OFF the argument list — aggregate FILTER, " +
      "WITHIN GROUP order, named arguments, sample row counts, " +
      "LIMIT/OFFSET — are walked") {
    // Each of these clauses stores its expression somewhere other than a
    // plain child argument list: AggregateExpression.filter, the
    // SortOrder under an ordered-set aggregate, NamedArgumentExpression's
    // value, the sample/limit count above the Sort. All must reject a
    // poison exactly like a SELECT-list position would.
    for (sql <- Seq(
        "SELECT sum(a) FILTER (WHERE current_user() IS NOT NULL) AS s FROM df",
        "SELECT sum(a) FILTER (WHERE (SELECT max(x) FROM secrets) > 0) AS s FROM df",
        "SELECT count(a) FILTER (WHERE transform(array(1), x -> x + " +
          "(current_user())) IS NOT NULL) AS s FROM df",
        "SELECT percentile_cont(0.5) WITHIN GROUP " +
          "(ORDER BY length(current_user())) AS p FROM df",
        "SELECT listagg(a, ',') WITHIN GROUP " +
          "(ORDER BY length(current_user())) AS l FROM df",
        "SELECT mask('x', lowerChar => substr(current_user(), 1, 1)) AS m FROM df",
        "SELECT a FROM df TABLESAMPLE (length(current_user()) ROWS)",
        "SELECT a FROM df LIMIT abs(length(current_user()))",
        "SELECT a FROM df LIMIT (SELECT max(x) FROM secrets)",
        "SELECT a FROM df LIMIT 5 OFFSET length(current_user())",
        "SELECT a FROM df CLUSTER BY length(current_user())");
        mode <- Seq(None, allowMode)) {
      assert(verdict(sql, mode) != SqlGuard.Ok,
        s"holder expression was Ok (mode=${mode.isDefined}): $sql")
    }
    // positive controls under deny mode (WITHIN GROUP aggregates and mask
    // are not in the allowlist — allow-mode rejection reasons for those
    // are function-level, asserted via the loop above)
    for (sql <- Seq(
        "SELECT sum(a) FILTER (WHERE a > 0) AS s FROM df",
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY a) AS p FROM df",
        "SELECT mask('x', lowerChar => 'q') AS m FROM df",
        "SELECT a FROM df TABLESAMPLE (5 ROWS)",
        "SELECT a FROM df LIMIT 5 OFFSET 2"))
      assert(verdict(sql, None) == SqlGuard.Ok, s"benign holder rejected: $sql")
    // and the two that stay legal in allowlist mode
    for (sql <- Seq(
        "SELECT sum(a) FILTER (WHERE a > 0) AS s FROM df",
        "SELECT a FROM df LIMIT 5 OFFSET 2"))
      assert(verdict(sql, allowMode) == SqlGuard.Ok,
        s"benign holder rejected under allowlist: $sql")
  }

  test("a decoy CTE in a sibling branch NEVER legalizes an out-of-scope " +
      "table reference (r9 scope-awareness)") {
    // PTable plants `secrets` somewhere in a random skeleton; a sibling
    // branch defines a CTE of the same name in its own scope. Pre-fix the
    // guard collected CTE names globally, so the decoy legalized every
    // such query.
    (0 until 150).foreach { i =>
      val poisoned = sample(query(2, PTable), 21000L + i)
      val sql = s"SELECT out1 FROM ($poisoned) pz UNION ALL " +
        "SELECT a FROM (WITH secrets AS (SELECT 1 AS a) " +
        "SELECT a FROM secrets) dz"
      val v = verdict(sql, None)
      assert(v != SqlGuard.Ok, s"decoy CTE legalized an unknown table:\n$sql")
    }
    // positive control: the decoy branch alone is legal
    assert(verdict("SELECT a FROM (WITH secrets AS (SELECT 1 AS a) " +
      "SELECT a FROM secrets) dz", None) == SqlGuard.Ok)
  }

  // ------------------------------------------------ r11: new surfaces

  test("DML and commands are pinned Rejected: MERGE/UPDATE/DELETE/INSERT " +
      "and the DDL/session-command families, on legal AND unknown targets") {
    // every write/DDL statement must land on a Command (or outside the
    // node allowlist) — pinned here so a parser that someday gives MERGE
    // a non-Command node fails THIS test instead of silently validating
    val dml = Seq(
      "MERGE INTO df USING t2 ON df.a = t2.a WHEN MATCHED THEN UPDATE SET a = 1",
      "MERGE INTO df USING t2 ON df.a = t2.a WHEN NOT MATCHED THEN INSERT (a) VALUES (t2.a)",
      "MERGE INTO df USING (SELECT a FROM t2) s ON df.a = s.a WHEN MATCHED THEN DELETE",
      "MERGE INTO secrets USING df ON secrets.a = df.a WHEN MATCHED THEN DELETE",
      "UPDATE df SET a = 1 WHERE b > 0",
      "UPDATE df SET a = current_user()",
      "UPDATE secrets SET a = 1",
      "DELETE FROM df WHERE a > 0",
      "DELETE FROM secrets",
      "INSERT INTO df VALUES (1, 2)",
      "INSERT INTO df SELECT a, b FROM t2",
      "INSERT OVERWRITE TABLE df SELECT a FROM t2",
      "INSERT INTO secrets VALUES (1)",
      "TRUNCATE TABLE df",
      "CREATE TABLE newt AS SELECT a FROM df",
      "CREATE OR REPLACE TEMPORARY VIEW v1 AS SELECT a FROM df",
      "DROP TABLE df",
      "ALTER TABLE df ADD COLUMNS (z INT)",
      "ANALYZE TABLE df COMPUTE STATISTICS",
      "REFRESH TABLE df",
      "CACHE TABLE df",
      "UNCACHE TABLE df",
      "SET spark.sql.shuffle.partitions = 1",
      "DECLARE v1 INT DEFAULT 5",
      "SET VARIABLE v1 = (SELECT max(a) FROM df)",
      "SHOW TABLES",
      "DESCRIBE TABLE df",
      "EXPLAIN SELECT a FROM df",
      "CALL cat.proc(1)")
    for (sql <- dml; mode <- Seq(None, allowMode)) {
      val v = verdict(sql, mode)
      assert(v != SqlGuard.Ok, s"DML/command was Ok (mode=${mode.isDefined}): $sql")
    }
  }

  test("try_reflect is banned like reflect, at every fuzzed expression " +
      "position (Spark 4's try_* wrapper keeps the reflective reach)") {
    val p = "try_reflect('java.lang.System', 'getenv', 'PATH')"
    (0 until 60).foreach { i =>
      val sql = sample(query(3, PExpr(p)), 25000L + i)
      for (mode <- Seq(None, allowMode))
        assert(verdict(sql, mode) != SqlGuard.Ok,
          s"try_reflect slipped through (mode=${mode.isDefined}):\n$sql")
    }
    // the harmless try_* arithmetic family stays legal in BOTH modes —
    // the ban is the reflective member, not the prefix
    for (sql <- Seq(
        "SELECT try_add(a, 1), try_subtract(a, 1), try_multiply(a, 2) FROM df",
        "SELECT try_divide(a, b), try_mod(a, b) FROM df",
        "SELECT try_cast(a AS INT), try_to_number(s, '999') FROM df",
        "SELECT try_element_at(array(1, 2), 5) AS e FROM df",
        "SELECT try_to_date(s), try_to_timestamp(s) FROM df");
        mode <- Seq(None, allowMode))
      assert(verdict(sql, mode) == SqlGuard.Ok,
        s"harmless try_* rejected (mode=${mode.isDefined}): $sql")
  }

  test("named function arguments (fn(x => v)): the value slot is walked " +
      "like any expression position") {
    // NamedArgumentExpression holds its value one level down — a poison
    // there must reject; subquery poisons in the value must be walked too
    val shapes: Seq[String => String] = Seq(
      p => s"SELECT mask(s, lowerChar => substr(($p), 1, 1)) AS m FROM df",
      p => s"SELECT mask(s, upperChar => 'X', otherChar => substr(($p), 1, 1)) AS m FROM df",
      p => s"SELECT count(*) FROM df HAVING count(mask('x', lowerChar => substr(($p), 1, 1))) > 0")
    for (shape <- shapes) {
      bannedExprs.foreach { p =>
        assert(verdict(shape(p), None) != SqlGuard.Ok,
          s"banned in named-arg value slipped through: ${shape(p)}")
      }
      assert(verdict(shape("(SELECT max(a) FROM secrets)"), None)
        != SqlGuard.Ok, "unknown table in named-arg subquery slipped through")
      assert(verdict(shape("(SELECT max(x) FROM sql_keywords())"), None)
        != SqlGuard.Ok, "unlisted TVF in named-arg subquery slipped through")
    }
    // positive control: benign named args parse + validate (deny mode;
    // mask is off the curated allowlist by design)
    assert(verdict("SELECT mask(s, lowerChar => 'q') AS m FROM df", None)
      == SqlGuard.Ok)
  }

  test("collation clauses: COLLATE'd expressions are walked; collation " +
      "never hides a poison") {
    val shapes: Seq[String => String] = Seq(
      p => s"SELECT (($p)) COLLATE UNICODE_CI AS c FROM df",
      p => s"SELECT CAST(($p) AS STRING COLLATE UTF8_LCASE) AS c FROM df",
      p => s"SELECT a FROM df WHERE (($p)) COLLATE UTF8_LCASE = 'x'",
      p => s"SELECT a FROM df ORDER BY (($p)) COLLATE UNICODE_CI",
      p => s"SELECT collation(($p) COLLATE UTF8_LCASE) AS c FROM df")
    for (shape <- shapes) {
      bannedExprs.foreach { p =>
        assert(verdict(shape(p), None) != SqlGuard.Ok,
          s"banned under COLLATE slipped through: ${shape(p)}")
      }
      assert(verdict(shape("(SELECT max(a) FROM secrets)"), None)
        != SqlGuard.Ok, "unknown table under COLLATE slipped through")
    }
    // benign collation is legal (deny mode; collate fns are off-list)
    for (sql <- Seq(
        "SELECT s COLLATE UNICODE_CI AS c FROM df",
        "SELECT a FROM df ORDER BY s COLLATE UTF8_LCASE",
        "SELECT CAST(s AS STRING COLLATE UNICODE_CI) AS c FROM df"))
      assert(verdict(sql, None) == SqlGuard.Ok, s"benign COLLATE rejected: $sql")
  }

  test("variant functions and variant_explode: argument positions walked, " +
      "benign variant surface legal under deny mode") {
    val shapes: Seq[String => String] = Seq(
      p => s"SELECT parse_json(concat('{}', ($p))) AS v FROM df",
      p => s"SELECT variant_get(parse_json(js), concat('$$.', ($p)), 'int') AS g FROM df",
      p => s"SELECT try_variant_get(try_parse_json(($p)), '$$.a', 'int') AS g FROM df",
      p => s"SELECT v FROM variant_explode(parse_json(concat('[1]', ($p))))",
      p => s"SELECT schema_of_variant(parse_json(($p))) AS sch FROM df")
    for (shape <- shapes) {
      bannedExprs.foreach { p =>
        assert(verdict(shape(p), None) != SqlGuard.Ok,
          s"banned in variant arg slipped through: ${shape(p)}")
      }
      assert(verdict(shape("(SELECT max(a) FROM secrets)"), None)
        != SqlGuard.Ok, "unknown table in variant arg slipped through")
      assert(verdict(shape("(SELECT max(x) FROM sql_keywords())"), None)
        != SqlGuard.Ok, "unlisted TVF in variant arg slipped through")
    }
    // the benign semi-structured surface is deny-mode legal (variant fns
    // are deterministic and env-free; the TVF is on the allowedTvfs list)
    for (sql <- Seq(
        "SELECT parse_json('{\"a\": 1}') AS v FROM df",
        "SELECT variant_get(parse_json(js), '$.a', 'int') AS a FROM df",
        "SELECT * FROM variant_explode(parse_json('[1, 2]'))",
        "SELECT is_variant_null(try_parse_json(js)) AS n FROM df"))
      assert(verdict(sql, None) == SqlGuard.Ok,
        s"benign variant surface rejected: $sql")
  }

  // ------------------------------------------------ r12: new surfaces

  test("SQL scripting blocks (BEGIN...END) are pinned not-Ok in both " +
      "modes — legal bodies, DECLARE/SET inside, control flow, labels") {
    // Spark 4's SQL scripting is a separate statement kind the guard has
    // not audited: whether a given script fails at parsePlan (scripts go
    // through parseScript) or lands on an unlisted node, the verdict must
    // be a CAUGHT rejection, never Ok and never a thrown error.
    val bodies = Seq(
      "SELECT a FROM df;",
      "SELECT a FROM df; SELECT b FROM t2;",
      "DECLARE v1 INT DEFAULT 5; SELECT v1;",
      "DECLARE v1 INT; SET VAR v1 = (SELECT max(a) FROM df); SELECT v1;",
      "SET VARIABLE v1 = 1; SELECT a FROM df WHERE a > v1;",
      "IF (SELECT max(a) FROM df) > 0 THEN SELECT 1; ELSE SELECT 2; END IF;",
      "WHILE 1 = 0 DO SELECT a FROM df; END WHILE;",
      "REPEAT SELECT a FROM df; UNTIL 1 = 1 END REPEAT;",
      "FOR r AS SELECT a FROM df DO SELECT r.a; END FOR;",
      "LOOP SELECT 1; END LOOP;",
      "BEGIN SELECT a FROM df; END;", // nested block
      "SELECT current_user();", // poisoned body must reject a fortiori
      "SELECT a FROM secrets;",
      "EXECUTE IMMEDIATE 'SELECT 1';",
      "DECLARE c CURSOR FOR SELECT a FROM df; OPEN c;",
      "SIGNAL SQLSTATE '45000';")
    val wrappers: Seq[String => String] = Seq(
      b => s"BEGIN $b END",
      b => s"lbl: BEGIN $b END lbl",
      b => s"BEGIN DECLARE tmp INT DEFAULT 0; $b END",
      b => s"BEGIN BEGIN $b END; END")
    for (body <- bodies; wrap <- wrappers; mode <- Seq(None, allowMode)) {
      val sql = wrap(body)
      val v = verdict(sql, mode)
      assert(v != SqlGuard.Ok,
        s"scripting block was Ok (mode=${mode.isDefined}):\n$sql")
    }
  }

  test("function-DDL commands are pinned Rejected: CREATE [TEMPORARY] " +
      "FUNCTION / DROP FUNCTION / SHOW FUNCTIONS hit the Command gate") {
    // UDF registration via SQL is arbitrary-code reach (a jar/class of
    // the attacker's choosing) — must stay behind the fail-closed
    // Command rejection forever; pinned on legal AND unknown names
    val ddl = Seq(
      "CREATE TEMPORARY FUNCTION f AS 'com.example.Udf'",
      "CREATE OR REPLACE TEMPORARY FUNCTION f AS 'com.example.Udf'",
      "CREATE TEMPORARY FUNCTION f AS 'com.example.Udf' USING JAR '/tmp/x.jar'",
      "CREATE FUNCTION cat.db.f AS 'com.example.Udf'",
      "CREATE FUNCTION f AS 'com.example.Udf' USING FILE '/etc/passwd'",
      "CREATE OR REPLACE FUNCTION sq(x INT) RETURNS INT RETURN x * x",
      "CREATE FUNCTION tbl_f(x INT) RETURNS TABLE (y INT) RETURN SELECT x",
      "DROP FUNCTION f",
      "DROP TEMPORARY FUNCTION IF EXISTS f",
      "SHOW USER FUNCTIONS",
      "SHOW FUNCTIONS LIKE 'current*'",
      "DESCRIBE FUNCTION current_user",
      "REFRESH FUNCTION f")
    for (sql <- ddl; mode <- Seq(None, allowMode))
      assert(verdict(sql, mode) != SqlGuard.Ok,
        s"function DDL was Ok (mode=${mode.isDefined}): $sql")
  }

  test("session-variable namespace references are rejected at every " +
      "expression position; qualified column access stays legal") {
    // DECLARE/SET VARIABLE are Commands (already pinned), but READING a
    // host-declared variable needs no command: system.session.v and
    // session.v resolve as variables when no column matches. The guard
    // cannot see schemas, so the addressable namespace fails closed.
    val varRefs = Seq("system.session.v", "SYSTEM.SESSION.v",
      "session.v", "SESSION.secret", "system.session.api_key")
    val shapes: Seq[String => String] = Seq(
      r => s"SELECT $r FROM df",
      r => s"SELECT a FROM df WHERE b = $r",
      r => s"SELECT a FROM df ORDER BY $r",
      r => s"SELECT sum(a) FROM df GROUP BY b HAVING max(b) > $r",
      r => s"SELECT row_number() OVER (PARTITION BY $r ORDER BY a) FROM df",
      r => s"SELECT (SELECT max(a) FROM t2 WHERE t2.b = $r) FROM df",
      r => s"SELECT transform(array(1), x -> x + $r) FROM df",
      r => s"SELECT a FROM df LIMIT $r")
    for (r <- varRefs; shape <- shapes; mode <- Seq(None, allowMode)) {
      val sql = shape(r)
      assert(verdict(sql, mode) != SqlGuard.Ok,
        s"variable-namespace ref was Ok (mode=${mode.isDefined}): $sql")
    }
    // qualified struct/column access keeps its escape hatch, and tables
    // merely NAMED LIKE the namespace stay legal
    for (sql <- Seq(
        "SELECT df.session.field FROM df", // 3-part starting at the view
        "SELECT s.a FROM df s",
        "SELECT sessions.a FROM df AS sessions", // 'sessions' != 'session'
        "SELECT session_id FROM df", // 1-part names never match
        "SELECT a AS session FROM df")) // output alias, not a reference
      assert(verdict(sql, None) == SqlGuard.Ok,
        s"legal qualified access over-rejected: $sql")
  }

  test("streaming relations, WATERMARK clauses, and streaming TVFs " +
      "never validate Ok — batch-only guard surface") {
    // the engine's generated-SQL surface is batch analytics over
    // registered views; anything that parses to a streaming read (or a
    // new streaming clause we have not audited) must fail closed —
    // caught rejection or parse error, never Ok, never a crash
    val streaming = Seq(
      "SELECT * FROM STREAM(df)",
      "SELECT * FROM STREAM df",
      "SELECT * FROM STREAM(df) WATERMARK ts DELAY OF INTERVAL 10 SECONDS",
      "SELECT a FROM STREAM(secrets)",
      "SELECT * FROM STREAM(range(10))",
      "SELECT window(ts, '10 seconds'), count(*) FROM STREAM(df) GROUP BY 1",
      "SELECT * FROM changes(df, 'earliest')",
      "SELECT * FROM table_changes('df', 0)",
      "SELECT * FROM read_stream('df')",
      "SELECT * FROM stream_read('df')")
    for (sql <- streaming; mode <- Seq(None, allowMode)) {
      val v = verdict(sql, mode)
      assert(v != SqlGuard.Ok,
        s"streaming surface was Ok (mode=${mode.isDefined}): $sql")
    }
  }

  test("poisons inside scripting blocks still reject when fuzzed: a " +
      "script wrapper never launders a poison (60 sampled skeletons)") {
    // belt and braces over the scripting pin: even if a future parser
    // version makes parsePlan accept scripts, a poisoned body must still
    // land on the poison rejection or the node gate — sampled across the
    // full query grammar, wrapped in a block
    (0 until 60).foreach { i =>
      val poison =
        if (i % 3 == 0) PExpr(bannedExprs(i % bannedExprs.length))
        else if (i % 3 == 1) PTable
        else PTvf
      val inner = sample(query(3, poison), 37000L + i)
      val sql = s"BEGIN $inner; END"
      for (mode <- Seq(None, allowMode))
        assert(verdict(sql, mode) != SqlGuard.Ok,
          s"script-wrapped poison was Ok (mode=${mode.isDefined}):\n$sql")
    }
  }
}
