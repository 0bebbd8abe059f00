package graft

import org.apache.spark.sql.functions._
import graft.functions.FloatDotProduct

/** Native Catalyst expression: correctness vs the HOF formulation, codegen
  * and interpreted paths, SQL registration. */
class FunctionsSpec extends SparkSpec {

  test("dot_f equals the HOF fold bit-for-bit on real embeddings") {
    FloatDotProduct.register(spark)
    val diff = Tables.embeddings(spark, sf)
      .select(
        expr("dot_f(embedding, embedding)").as("native"),
        expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
          .as("hof"))
      .filter(col("native") =!= col("hof")) // bit-inequality, not tolerance
      .count()
    assert(diff == 0)
  }

  test("dot_f handles nulls and length mismatch") {
    FloatDotProduct.register(spark)
    val row = spark.sql(
      "SELECT dot_f(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a, " +
        "dot_f(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS b")
      .head()
    assert(row.isNullAt(0))
    assert(row.getDouble(1) == 8.0) // min-length semantics
  }

  test("dot_f survives both codegen and interpreted evaluation") {
    FloatDotProduct.register(spark)
    val df = Tables.embeddings(spark, sf).limit(10)
      .select(expr("dot_f(embedding, embedding)").as("d"))
    val withCodegen = df.collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(_.getDouble(0))
      assert(withCodegen.sameElements(interpreted))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
