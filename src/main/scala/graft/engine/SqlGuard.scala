package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}

/** Pre-execution SQL validation — SURVEY.md §2.1 `_clean_code` /
  * `_check_imports` mapping (/root/reference/polarsai/__init__.py:403-430,
  * 351-384).
  *
  * The reference sandboxes generated Python by AST surgery against an import
  * whitelist; the SQL-target analog is stronger: parse to a LogicalPlan and
  * accept only plans built entirely from a closed allowlist of read-only
  * query node types. Anything else — DDL/DML/command nodes, statement kinds
  * introduced by newer parsers (e.g. EXECUTE IMMEDIATE), table references
  * outside the registered views — fails CLOSED. A denylist of
  * environment-leaking functions (the analog of the reference's weak
  * `__builtins__` whitelist, SURVEY §7.5.8) is applied on top, with an
  * optional caller-supplied function allowlist mirroring the reference's
  * whitelist philosophy (/root/reference/polarsai/constants.py:69-83).
  */
object SqlGuard {

  sealed trait Verdict
  case object Ok extends Verdict
  final case class Rejected(reason: String) extends Verdict

  /** The complete set of logical-plan node types a read-only SELECT can
    * parse to on Spark 4.1. Any node outside this set is rejected, so new
    * statement kinds (EXECUTE IMMEDIATE parses to
    * UnresolvedExecuteImmediate, scripting blocks, etc.) fail closed
    * instead of slipping past a pattern denylist. */
  private val allowedNodes: Set[String] = Set(
    // projection / predicates / aggregation
    "Project", "Filter", "Aggregate", "UnresolvedHaving", "Distinct",
    "Deduplicate",
    // ordering / limiting
    "Sort", "GlobalLimit", "LocalLimit", "Limit", "Offset", "Tail",
    // relations
    "UnresolvedRelation", "SubqueryAlias", "OneRowRelation",
    "UnresolvedInlineTable", "ResolvedInlineTable", "LocalRelation",
    "UnresolvedTableValuedFunction", "UnresolvedTVFAliases", "Range",
    // joins / set ops
    "Join", "LateralJoin", "Union", "Except", "Intersect",
    // CTEs / subquery plumbing
    "UnresolvedWith", "With", "UnresolvedSubqueryColumnAliases",
    "CTERelationRef", "Sample",
    // windows / reshape
    "WithWindowDefinition", "Pivot", "Unpivot", "Generate",
    // DISTRIBUTE BY / CLUSTER BY — a shuffle directive, read-only
    "RepartitionByExpression",
    // hints are advisory only
    "UnresolvedHint")

  /** Table-valued functions that generate rows without touching the
    * environment. Everything else fails closed. */
  private val allowedTvfs: Set[String] = Set(
    "range", "explode", "explode_outer", "posexplode", "posexplode_outer",
    "inline", "inline_outer", "stack", "json_tuple", "variant_explode",
    "variant_explode_outer")

  /** Functions that leak environment or files into results. Includes every
    * FunctionRegistry alias (`user`, `current_schema`, …) — banning only the
    * canonical name leaves the alias executable. */
  private val bannedFunctions = Set(
    "reflect", "java_method", "input_file_name", "input_file_block_start",
    "input_file_block_length", "current_user", "user", "session_user",
    "current_catalog", "current_database", "current_schema",
    "current_timezone", "version")

  def parse(spark: SparkSession, sql: String): Either[String, LogicalPlan] =
    try Right(spark.sessionState.sqlParser.parsePlan(sql))
    catch { case e: Exception => Left(e.getMessage) }

  private def isWith(p: LogicalPlan): Boolean =
    p.nodeName == "UnresolvedWith" || p.nodeName == "With"

  /** CTE definitions of an UnresolvedWith node: Seq of (name, plan, …)
    * tuples (a Tuple3 in Spark 4.1 — matched structurally so minor parser
    * changes don't silently disable the check). */
  private def cteDefs(w: LogicalPlan): Seq[(String, LogicalPlan)] =
    w.productIterator.collectFirst {
      case rs: Seq[_] => rs.collect {
        case t: Product if t.productArity >= 2 &&
          t.productElement(0).isInstanceOf[String] &&
          t.productElement(1).isInstanceOf[LogicalPlan] =>
          (t.productElement(0).asInstanceOf[String],
            t.productElement(1).asInstanceOf[LogicalPlan])
      }
    }.getOrElse(Nil)

  /** All plan nodes, including subqueries AND CTE definition bodies (which
    * are innerChildren the default traversal skips — an unvalidated CTE body
    * would be a sandbox hole). */
  private def allNodes(plan: LogicalPlan): Seq[LogicalPlan] = {
    val direct = plan.collectWithSubqueries { case p => p }
    direct ++ direct.filter(isWith).flatMap(cteDefs).flatMap {
      case (_, body) => allNodes(body)
    }
  }

  /** Validate a parsed plan against the registered view names.
    *
    * @param functionAllowlist when set, ONLY these function names may be
    *   called (the reference's whitelist mode); the env-leak denylist still
    *   applies on top, so allowlisting `current_user` does not re-enable it.
    */
  def validate(plan: LogicalPlan, allowedViews: Set[String],
      functionAllowlist: Option[Set[String]] = None): Verdict = {
    val nodes = allNodes(plan)

    // Fail-closed node allowlist: Command subclasses, DDL/DML, EXECUTE
    // IMMEDIATE, and any statement kind we have not audited all land here.
    nodes.collectFirst {
      case p if p.isInstanceOf[Command] =>
        Rejected(s"command node not allowed: ${p.nodeName}")
      case p if !allowedNodes.contains(p.nodeName) =>
        Rejected(s"statement not allowed: ${p.nodeName}")
    }.foreach(return _)

    // Row-generating TVFs only; no metadata/catalog TVFs.
    nodes.filter(_.nodeName == "UnresolvedTableValuedFunction").foreach { tvf =>
      val name = tvf.productIterator.collectFirst {
        case parts: Seq[_] if parts.forall(_.isInstanceOf[String]) =>
          parts.mkString(".").toLowerCase
        case s: String => s.toLowerCase
      }.getOrElse("")
      if (!allowedTvfs.contains(name))
        return Rejected(s"table function not allowed: $name")
    }

    // CTE names defined inside the query are legal relation targets.
    val cteNames = nodes.filter(isWith).flatMap(cteDefs(_).map(_._1.toLowerCase)).toSet

    val allowed = allowedViews.map(_.toLowerCase) ++ cteNames
    nodes.collect { case r: UnresolvedRelation => r }.foreach { r =>
      val name = r.multipartIdentifier.mkString(".").toLowerCase
      if (!allowed.contains(name))
        return Rejected(s"unknown table: $name (allowed: ${allowed.toSeq.sorted.mkString(", ")})")
    }

    val fns = nodes.flatMap(_.expressions.flatMap(_.collect {
      case f: UnresolvedFunction => f.nameParts.mkString(".").toLowerCase
    }))
    fns.find(bannedFunctions.contains).foreach { f =>
      return Rejected(s"function not allowed: $f")
    }
    functionAllowlist.foreach { wl =>
      val lower = wl.map(_.toLowerCase)
      fns.find(f => !lower.contains(f)).foreach { f =>
        return Rejected(s"function not in allowlist: $f")
      }
    }
    Ok
  }

  def check(spark: SparkSession, sql: String, allowedViews: Set[String],
      functionAllowlist: Option[Set[String]] = None): Verdict =
    parse(spark, sql) match {
      case Left(err) => Rejected(s"parse error: $err")
      case Right(plan) => validate(plan, allowedViews, functionAllowlist)
    }
}
