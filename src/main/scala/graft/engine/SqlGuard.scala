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
  * reject anything that is not a pure query — DDL/DML/command nodes, table
  * references outside the registered views (the reference's
  * `_is_df_overwrite` becomes moot: views are read-only), and a denylist of
  * environment-leaking functions (the analog of the weak `__builtins__`
  * whitelist the reference shipped, SURVEY §7.5.8).
  */
object SqlGuard {

  sealed trait Verdict
  case object Ok extends Verdict
  final case class Rejected(reason: String) extends Verdict

  /** Statement shapes that must never execute (class-name match keeps this
    * robust across parser node renames). */
  private val banned =
    ("(?i).*(insert|delete|update|merge|drop|create|alter|truncate|refresh" +
      "|cache|analyze|grant|revoke|addjar|addfile|setcommand|setcatalog" +
      "|setnamespace|resetcommand|explain|describe|show).*").r

  /** Functions that leak environment or files into results. */
  private val bannedFunctions = Set(
    "reflect", "java_method", "input_file_name", "input_file_block_start",
    "input_file_block_length", "current_user", "session_user",
    "current_catalog", "current_database", "version")

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

  /** Validate a parsed plan against the registered view names. */
  def validate(plan: LogicalPlan, allowedViews: Set[String]): Verdict = {
    val nodes = allNodes(plan)

    nodes.collectFirst {
      case p if p.isInstanceOf[Command] =>
        Rejected(s"command node not allowed: ${p.nodeName}")
      case p if banned.matches(p.nodeName) =>
        Rejected(s"statement not allowed: ${p.nodeName}")
    }.foreach(return _)

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
    Ok
  }

  def check(spark: SparkSession, sql: String,
      allowedViews: Set[String]): Verdict =
    parse(spark, sql) match {
      case Left(err) => Rejected(s"parse error: $err")
      case Right(plan) => validate(plan, allowedViews)
    }
}
