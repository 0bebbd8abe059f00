package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedGenerator, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, WithWindowDefinition}

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

  /** Curated DEFAULT-ON function allowlist — the SQL analog of the
    * reference's always-on import whitelist
    * (/root/reference/polarsai/__init__.py:351-384): generated SQL may
    * only call the deterministic, environment-free analytics surface below
    * unless the caller explicitly opts out (`functionAllowlist = None`).
    * Deliberately absent: nondeterministic generators (`rand`, `uuid`,
    * `shuffle`, `monotonically_increasing_id`), execution-layout probes
    * (`spark_partition_id`), and everything in [[bannedFunctions]] (which
    * applies on top regardless). `raise_error` IS allowed — the engine's
    * runtime-error capture/retry loop depends on errors surfacing at
    * execution, matching the reference's behavior of letting generated
    * code fail and feeding the message back. */
  val defaultFunctionAllowlist: Set[String] = Set(
    // aggregates
    "count", "sum", "avg", "mean", "min", "max", "median", "mode",
    "stddev", "stddev_pop", "stddev_samp", "std", "variance", "var_pop",
    "var_samp", "skewness", "kurtosis", "corr", "covar_pop", "covar_samp",
    "percentile", "percentile_approx", "approx_percentile",
    "approx_count_distinct", "count_if", "any_value", "first",
    "first_value", "last", "last_value", "collect_list", "collect_set",
    "array_agg", "bool_and", "bool_or", "every", "any", "some", "bit_and",
    "bit_or", "bit_xor", "grouping", "grouping_id", "sum_distinct",
    // windows
    "row_number", "rank", "dense_rank", "ntile", "percent_rank",
    "cume_dist", "lag", "lead", "nth_value", "window", "session_window",
    "window_time",
    // math
    "abs", "ceil", "ceiling", "floor", "round", "bround", "rint", "exp",
    "expm1", "ln", "log", "log10", "log2", "log1p", "sqrt", "cbrt", "pow",
    "power", "mod", "pmod", "factorial", "sign", "signum", "greatest",
    "least", "positive", "negative", "try_add", "try_subtract",
    "try_multiply", "try_divide", "try_mod", "div", "e", "pi", "sin",
    "cos", "tan", "cot", "sec", "csc", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "degrees",
    "radians", "width_bucket", "conv",
    // bits
    "shiftleft", "shiftright", "shiftrightunsigned", "bit_count", "getbit",
    // strings
    "length", "len", "char_length", "character_length", "octet_length",
    "bit_length", "lower", "lcase", "upper", "ucase", "initcap", "trim",
    "ltrim", "rtrim", "btrim", "lpad", "rpad", "concat", "concat_ws",
    "substring", "substr", "left", "right", "instr", "locate", "position",
    "charindex", "replace", "translate", "overlay", "repeat", "reverse",
    "space", "split", "split_part", "substring_index", "format_number",
    "format_string", "printf", "ascii", "chr", "char", "elt", "find_in_set",
    "levenshtein", "soundex", "sentences", "initials",
    "regexp_extract", "regexp_extract_all", "regexp_replace",
    "regexp_like", "regexp", "rlike", "like", "ilike", "regexp_count",
    "regexp_substr", "regexp_instr", "contains", "startswith", "endswith",
    // hashing / encoding (deterministic, env-free)
    "md5", "sha", "sha1", "sha2", "hash", "xxhash64", "crc32", "base64",
    "unbase64", "hex", "unhex", "encode", "decode", "to_binary",
    "to_char", "to_varchar", "to_number", "try_to_binary", "try_to_number",
    // null / conditional
    "coalesce", "nullif", "nullifzero", "zeroifnull", "nvl", "nvl2",
    "ifnull", "if", "isnull", "isnotnull", "nanvl", "equal_null",
    "try_cast", "typeof", "assert_true", "raise_error",
    // dates / times (current_* here are time, not environment identity)
    "current_date", "curdate", "current_timestamp", "now", "localtimestamp",
    "date_add", "dateadd", "date_sub", "datediff", "date_diff",
    "add_months", "months_between", "last_day", "next_day", "trunc",
    "date_trunc", "year", "quarter", "month", "day", "dayofmonth",
    "dayofweek", "weekday", "dayofyear", "weekofyear", "week", "hour",
    "minute", "second", "unix_timestamp", "to_unix_timestamp",
    "from_unixtime", "to_date", "try_to_date", "to_timestamp",
    "try_to_timestamp", "to_utc_timestamp", "from_utc_timestamp",
    "make_date", "make_timestamp", "make_interval", "make_dt_interval",
    "make_ym_interval", "timestampadd", "timestampdiff", "date_format",
    "extract", "date_part", "datepart", "unix_date", "unix_seconds",
    "unix_millis", "unix_micros", "date_from_unix_date",
    "timestamp_seconds", "timestamp_millis", "timestamp_micros",
    "dayname", "monthname",
    // arrays / maps / higher-order
    "array", "array_contains", "array_distinct", "array_except",
    "array_intersect", "array_join", "array_max", "array_min",
    "array_position", "array_remove", "array_repeat", "array_union",
    "array_append", "array_prepend", "array_compact", "array_insert",
    "array_size", "arrays_overlap", "arrays_zip", "size", "cardinality",
    "element_at", "try_element_at", "get", "slice", "sort_array",
    "array_sort", "flatten", "sequence", "zip_with", "transform",
    "filter", "exists", "forall", "aggregate", "reduce", "map_keys",
    "map_values", "map_entries", "map_from_arrays", "map_from_entries",
    "map_concat", "map_contains_key", "map_filter", "map_zip_with",
    "transform_keys", "transform_values", "str_to_map", "map",
    // generators (also gated by the TVF allowlist when table-valued)
    "explode", "explode_outer", "posexplode", "posexplode_outer",
    "inline", "inline_outer", "stack",
    // structs / json / csv
    "struct", "named_struct", "to_json", "from_json", "get_json_object",
    "json_tuple", "json_array_length", "json_object_keys",
    "schema_of_json", "to_csv", "from_csv", "schema_of_csv",
    // graft-registered kernels
    "dot_f", "might_contain_l")

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
    catch {
      case e: Exception => Left(e.getMessage)
      // ANTLR recursion blows the stack on pathologically nested
      // generated SQL (thousands of parens / OR terms) — that must be a
      // Rejected verdict feeding the correction loop, not an Error that
      // takes down the session (fail-closed means fail CAUGHT)
      case _: StackOverflowError =>
        Left("parser stack overflow: query too deeply nested")
    }

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

  /** Subquery PLANS hiding inside a named WINDOW definition's spec
    * expressions. windowDefinitions is a Map the default traversals skip
    * twice over: QueryPlan.expressions doesn't contain the specs (the r8
    * function-scan bypass), and collectWithSubqueries therefore never sees
    * a subquery nested in one — so `WINDOW w AS (PARTITION BY (SELECT max(a)
    * FROM secrets))` smuggled an UNVALIDATED plan (unknown tables, banned
    * TVFs, banned functions) past every check. Found by SqlGuardFuzzSpec
    * (r9); routed through allNodes like CTE bodies. */
  private def windowDefPlans(p: LogicalPlan): Seq[LogicalPlan] = p match {
    case w: WithWindowDefinition =>
      w.windowDefinitions.values.toSeq.flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          pe.plan match {
            case lp: LogicalPlan => Seq(lp)
            case _ => Nil
          }
      }.flatten)
    case _ => Nil
  }

  /** All plan nodes, including subqueries AND CTE definition bodies (which
    * are innerChildren the default traversal skips — an unvalidated CTE body
    * would be a sandbox hole) AND subqueries inside named WINDOW specs
    * (see [[windowDefPlans]]). */
  private def allNodes(plan: LogicalPlan): Seq[LogicalPlan] = {
    val direct = plan.collectWithSubqueries { case p => p }
    direct ++
      direct.filter(isWith).flatMap(cteDefs).flatMap {
        case (_, body) => allNodes(body)
      } ++
      direct.flatMap(windowDefPlans).flatMap(allNodes)
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

    // Two traversal blind spots closed here (both verified live bypasses):
    // named WINDOW definitions live in a Map[String, WindowSpecDefinition]
    // that QueryPlan.expressions does NOT descend into — a banned function
    // hidden in `WINDOW w AS (PARTITION BY current_user() …)` was invisible
    // — and LATERAL VIEW generators parse to UnresolvedGenerator, not
    // UnresolvedFunction, so they dodged both the denylist and the
    // allowlist contract.
    val exprRoots = nodes.flatMap { p =>
      p.expressions ++ (p match {
        case w: WithWindowDefinition => w.windowDefinitions.values.toSeq
        case _ => Nil
      })
    }
    val fns = exprRoots.flatMap(_.collect {
      case f: UnresolvedFunction => f.nameParts.mkString(".").toLowerCase
      case g: UnresolvedGenerator => g.name.unquotedString.toLowerCase
    })
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
