package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.{ArrowIO, AvroIO}

/** The hand-rolled Avro/Arrow container IO (no spark-avro / native Arrow
  * reader in this build): lossless round-trips over every supported scalar
  * type including nulls, multi-partition file fan-out, and — for Arrow —
  * cross-implementation interop pinned by a committed pyarrow-written
  * fixture (so "standard IPC format" is a tested claim, not an intention).
  */
class IOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cnt", IntegerType),
    StructField("score", DoubleType),
    StructField("ratio", FloatType),
    StructField("name", StringType),
    StructField("ok", BooleanType)))

  private def mixedDf = {
    val rows = (1L to 100L).map { i =>
      Row(i,
        if (i % 7 == 0) null else i.toInt,
        if (i % 5 == 0) null else i * 1.5,
        if (i % 3 == 0) null else i.toFloat / 3f,
        if (i % 11 == 0) null else s"name_$i",
        if (i % 13 == 0) null else (i % 2 == 0))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().toSeq

  test("AvroIO: multi-partition round-trip preserves all scalar types and nulls") {
    val path = java.nio.file.Files.createTempDirectory("graft_avro_rt").toString
    val in = mixedDf
    AvroIO.write(in, path)
    assert(new java.io.File(path).listFiles().count(_.getName.endsWith(".avro")) == 4,
      "one container per input partition")
    val back = AvroIO.read(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(collectSorted(back) == collectSorted(in))
  }

  test("ArrowIO: multi-partition round-trip preserves all scalar types and nulls") {
    val path = java.nio.file.Files.createTempDirectory("graft_arrow_rt").toString
    val in = mixedDf
    ArrowIO.write(in, path)
    assert(new java.io.File(path).listFiles().count(_.getName.endsWith(".arrow")) == 4,
      "one IPC file per input partition")
    val back = ArrowIO.read(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(collectSorted(back) == collectSorted(in))
  }

  test("ArrowIO reads a pyarrow-written IPC file (cross-implementation interop)") {
    val res = getClass.getResource("/interop/pyarrow_sample.arrow")
    assert(res != null, "committed pyarrow fixture must be on the test classpath")
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow_interop")
    java.nio.file.Files.copy(res.openStream(), dir.resolve("pyarrow_sample.arrow"))
    val got = ArrowIO.read(spark, dir.toString).orderBy("id").collect().toSeq
    assert(got == Seq(
      Row(1L, "ada", 1.5, true),
      Row(2L, null, 2.5, false),
      Row(3L, "grace", null, null)))
  }

  test("empty input directories fail with a clear error, not a NoSuchElement") {
    val empty = java.nio.file.Files.createTempDirectory("graft_io_empty").toString
    val eAvro = intercept[IllegalArgumentException](AvroIO.read(spark, empty))
    assert(eAvro.getMessage.contains("no .avro"))
    val eArrow = intercept[IllegalArgumentException](ArrowIO.read(spark, empty))
    assert(eArrow.getMessage.contains("no .arrow"))
  }

  test("ArrowIO batches large partitions into multiple record batches") {
    // > BatchRows rows in one partition forces the writer's batch loop
    val n = ArrowIO.BatchRows + 10
    val in = spark.range(1, n + 1, 1, 1).toDF("id")
    val path = java.nio.file.Files.createTempDirectory("graft_arrow_big").toString
    ArrowIO.write(in, path)
    val back = ArrowIO.read(spark, path)
    assert(back.count() == n)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == n.toLong * (n + 1) / 2)
  }
}
