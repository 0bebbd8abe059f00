package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions wiring: a cluster operator sets
  * `spark.sql.extensions=graft.GraftExtensions` and gets the custom
  * operator + kernels with no code changes. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions class applies cleanly to a SparkSessionExtensions") {
    // Sessions share one JVM-wide context in tests, so the config-path
    // (a fresh builder) can't be exercised here; applying the extension
    // object directly verifies the injection is well-formed.
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("install() wires the strategy and both custom functions end-to-end") {
    GraftExtensions.install(spark)
    import spark.implicits._
    // dot_f kernel registered
    val d = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .selectExpr("dot_f(a, b) AS d").head.getDouble(0)
    assert(d == 11.0)
    // product_agg UDAF registered
    val p = Seq(1.0, 2.0, 3.0).toDF("x")
      .agg(expr("product_agg(x) AS p")).head.getDouble(0)
    assert(p == 6.0)
    // as-of strategy injected: the custom plan compiles to AsOfJoinExec
    val plan = SparkEntry.queries("q_join_asof_native")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
  }
}
