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

  test("might_contain_l: no false negatives, bounded false positives") {
    import graft.functions.BloomFunctions
    BloomFunctions.register(spark)
    val members = spark.range(0, 1000)
      .select(concat(lit("doc-"), col("id")).as("k"))
    val bloom = members.select(xxhash64(col("k")).as("h"))
      .stat.bloomFilter("h", 1000L, 0.01)
    val bloomLit = lit(BloomFunctions.serialize(bloom))
    // every inserted key must probe true
    val missed = members
      .filter(!call_function("might_contain_l", bloomLit, xxhash64(col("k"))))
      .count()
    assert(missed == 0, "bloom filters must never be false-negative")
    // non-members pass at roughly the configured fpp, not en masse
    val fps = spark.range(1000, 11000)
      .select(concat(lit("doc-"), col("id")).as("k"))
      .filter(call_function("might_contain_l", bloomLit, xxhash64(col("k"))))
      .count()
    assert(fps <= 500, s"false-positive rate out of bounds: $fps / 10000")
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
