package graft

import org.apache.spark.sql.functions._

/** Harness-convention guard: the driver's correctness checker canonicalizes
  * rows by sorting every output column in pandas, which crashes on
  * collection-typed columns (round-2 regression: q_embed_quantize shipped a
  * raw array<int> and produced the round's only red row). Verify refuses
  * such schemas at dump time; this suite pins the guard itself AND sweeps
  * every registered query so the convention can't silently break again. */
class VerifyGuardSpec extends SparkSpec {

  test("guard refuses a raw array output column") {
    val df = spark.range(3).select(col("id"), array(col("id"), col("id")).as("xs"))
    val e = intercept[IllegalArgumentException] {
      Verify.requireScalarOutput("q_bad", df.schema)
    }
    assert(e.getMessage.contains("xs: array<bigint>"))
    assert(e.getMessage.contains("q_bad"))
  }

  test("guard refuses struct and map output columns") {
    val df = spark.range(1).select(
      struct(col("id")).as("st"), map(col("id"), col("id")).as("mp"))
    val e = intercept[IllegalArgumentException] {
      Verify.requireScalarOutput("q_bad2", df.schema)
    }
    assert(e.getMessage.contains("st:") && e.getMessage.contains("mp:"))
  }

  test("guard accepts an all-scalar schema") {
    val df = spark.range(1).select(col("id"), lit("s").as("name"), lit(1.5).as("v"))
    Verify.requireScalarOutput("q_ok", df.schema) // must not throw
  }

  test("every registered query declares a scalar-only output schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      Verify.requireScalarOutput(name, fn(spark, sf).schema)
    }
  }
}
