package graft.sources

import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, BitVector, DateDayVector, DecimalVector, Float4Vector, Float8Vector, IntVector, TimeStampMicroTZVector, TimeStampMicroVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, SeekableReadChannel}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed Arrow IPC (Feather v2 / `.arrow` random-access file format)
  * read/write built on the arrow-vector jars Spark already ships for its
  * pandas interchange.
  *
  * The reference grants Arrow IPC scan (polars `read_ipc`, SURVEY §2.3);
  * Spark has no native reader, so the format is implemented here: WRITE
  * emits one IPC file per partition (record batches of `BatchRows` rows)
  * through the Hadoop filesystem API; READ scans the files with Spark's
  * `binaryFile` source and decodes per-file in `mapPartitions` (the same
  * justified imperative seam as AvroIO / the multimodal decode). Polars
  * can read these files and this reader accepts polars-written ones —
  * that is the interchange the reference's users actually exercise.
  *
  * Scalar schemas only (long/int/double/float/string/boolean plus the
  * logical types date32[day], timestamp[us] tz-naive/UTC ⇔
  * TimestampNTZ/Timestamp, decimal128 ⇔ DecimalType; all nullable).
  * `binaryFile` caps one file at 2 GB — size write-side partitions
  * accordingly.
  */
object ArrowIO {

  val BatchRows = 4096

  private def arrowField(f: StructField): Field = {
    import org.apache.arrow.vector.types.{DateUnit, TimeUnit}
    val t: ArrowType = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType  => new ArrowType.Utf8()
      case BooleanType => new ArrowType.Bool()
      // logical types, pinned to the representations pyarrow/polars emit by
      // default: date32[day], timestamp[us] (tz-naive ⇔ TimestampNTZ,
      // tz=UTC ⇔ Spark's session-TZ instant type), decimal128(p, s)
      case DateType         => new ArrowType.Date(DateUnit.DAY)
      case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case TimestampType    => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case d: DecimalType   => new ArrowType.Decimal(d.precision, d.scale, 128)
      case other => throw new IllegalArgumentException(
        s"ArrowIO supports scalar columns only, got: $other")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  private def structField(f: Field): StructField = {
    import org.apache.arrow.vector.types.{DateUnit, TimeUnit}
    val dt = f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8 => StringType
      // polars writes string columns as large_string (64-bit offsets);
      // map it on READ so polars interchange actually works. (Utf8View,
      // newer still, stays unmapped — narrow failure beats silent misread)
      case _: ArrowType.LargeUtf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
      case t: ArrowType.Timestamp if t.getUnit == TimeUnit.MICROSECOND =>
        if (t.getTimezone == null) TimestampNTZType else TimestampType
      case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
      case other => throw new IllegalArgumentException(
        s"ArrowIO cannot map Arrow type $other")
    }
    StructField(f.getName, dt, f.isNullable)
  }

  // datetime ↔ micros lives in TimeCodec (shared with AvroIO; accepts
  // both the java.sql and java.time families so the writers survive
  // spark.sql.datetime.java8API.enabled)
  private def setValue(root: VectorSchemaRoot, c: Int, i: Int, v: Any): Unit =
    root.getVector(c) match {
      case vec: BigIntVector  => vec.setSafe(i, v.asInstanceOf[Long])
      case vec: IntVector     => vec.setSafe(i, v.asInstanceOf[Int])
      case vec: Float8Vector  => vec.setSafe(i, v.asInstanceOf[Double])
      case vec: Float4Vector  => vec.setSafe(i, v.asInstanceOf[Float])
      case vec: BitVector     => vec.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
      case vec: VarCharVector =>
        vec.setSafe(i, v.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case vec: DateDayVector =>
        vec.setSafe(i, TimeCodec.toEpochDays(v))
      case vec: TimeStampMicroTZVector =>
        vec.setSafe(i, TimeCodec.toMicros(v))
      case vec: TimeStampMicroVector =>
        vec.setSafe(i, TimeCodec.ldtToMicros(v))
      case vec: DecimalVector =>
        // scale was fixed by the schema; setScale is exact (same scale or
        // zero-padding), never a silent rounding
        vec.setSafe(i, v.asInstanceOf[java.math.BigDecimal].setScale(vec.getScale))
      case other => throw new IllegalArgumentException(
        s"unsupported vector ${other.getClass}")
    }

  private def getValue(root: VectorSchemaRoot, c: Int, i: Int,
      java8: Boolean): Any = {
    val vec = root.getVector(c)
    if (vec.isNull(i)) null
    else vec match {
      case v: BigIntVector  => v.get(i)
      case v: IntVector     => v.get(i)
      case v: Float8Vector  => v.get(i)
      case v: Float4Vector  => v.get(i)
      case v: BitVector     => v.get(i) == 1
      case v: VarCharVector =>
        new String(v.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case v: org.apache.arrow.vector.LargeVarCharVector =>
        new String(v.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case v: DateDayVector =>
        TimeCodec.daysToDate(v.get(i), java8)
      case v: TimeStampMicroTZVector => TimeCodec.microsToTimestamp(v.get(i), java8)
      case v: TimeStampMicroVector   => TimeCodec.microsToLdt(v.get(i))
      case v: DecimalVector          => v.getObject(i)
      case other => throw new IllegalArgumentException(
        s"unsupported vector ${other.getClass}")
    }
  }

  /** Write `df` as Arrow IPC files, one per partition (`part-N.arrow`),
    * overwriting `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs0 = p0.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs0.delete(p0, true)
    fs0.mkdirs(p0)
    // the SESSION conf must travel into the tasks: a bare Configuration
    // there resolves schemeless paths against the classpath default
    // (file:///) — on a cluster that writes part files to executor-local
    // disk while the driver lists an empty target dir (silent data loss)
    val serConf = new org.apache.spark.sql.graftshim.SerConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new ArrowSchema(st.fields.map(arrowField).toSeq.asJava)
        val part = new org.apache.hadoop.fs.Path(s"$path/part-$pid.arrow")
        val fs = part.getFileSystem(serConf.value)
        val out = fs.create(part, true)
        val allocator = new RootAllocator(Long.MaxValue)
        val root = VectorSchemaRoot.create(schema, allocator)
        val w = new ArrowFileWriter(root, null, Channels.newChannel(out))
        w.start()
        var total = 0L
        val grouped = rows.grouped(BatchRows)
        grouped.foreach { batch =>
          root.allocateNew()
          var i = 0
          batch.foreach { r =>
            var c = 0
            while (c < st.length) {
              // allocateNew zeroes validity bits, so skipping a null cell
              // leaves it null
              if (!r.isNullAt(c)) setValue(root, c, i, r.get(c))
              c += 1
            }
            i += 1
          }
          root.setRowCount(i)
          w.writeBatch()
          total += i
        }
        w.end(); w.close(); root.close(); allocator.close()
        Iterator(total)
      }
    }.count(): Unit
    // A fully-empty frame writes no part files (tasks skip empty
    // partitions), which would make the directory unreadable — emit one
    // schema-only IPC file (zero record batches) from the driver so the
    // round-trip stays total, matching parquet's behavior.
    if (!fs0.listStatus(p0).exists(_.getPath.getName.endsWith(".arrow"))) {
      val schema = new ArrowSchema(st.fields.map(arrowField).toSeq.asJava)
      val out = fs0.create(new org.apache.hadoop.fs.Path(
        s"$path/part-empty.arrow"), true)
      val allocator = new RootAllocator(Long.MaxValue)
      val root = VectorSchemaRoot.create(schema, allocator)
      val w = new ArrowFileWriter(root, null, Channels.newChannel(out))
      w.start(); w.end(); w.close(); root.close(); allocator.close()
    }
  }

  /** Read a directory of Arrow IPC files as a DataFrame: `binaryFile`
    * scan, per-file decode in mapPartitions. Schema from one driver-side
    * file peek. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.arrow").load(path)
      .select("content").as[Array[Byte]](Encoders.BINARY)
    val headBytes = files.limit(1).collect().headOption.getOrElse(
      throw new IllegalArgumentException(
        s"ArrowIO.read: no .arrow IPC files under $path"))
    val st = {
      val alloc = new RootAllocator(Long.MaxValue)
      val rd = new ArrowFileReader(new SeekableReadChannel(
        new ByteArrayReadableSeekableByteChannel(headBytes)), alloc)
      try StructType(
        rd.getVectorSchemaRoot.getSchema.getFields.asScala.map(structField).toSeq)
      finally { rd.close(); alloc.close() }
    }
    val n = st.length
    val java8 = TimeCodec.java8Api(spark)
    files.mapPartitions { it =>
      it.flatMap { bytes =>
        val alloc = new RootAllocator(Long.MaxValue)
        val rd = new ArrowFileReader(new SeekableReadChannel(
          new ByteArrayReadableSeekableByteChannel(bytes)), alloc)
        val root = rd.getVectorSchemaRoot
        val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
        // decode the whole (2 GB-bounded) file eagerly, then free the
        // native buffers — lazy iteration over closed allocators is UB
        while (rd.loadNextBatch()) {
          var i = 0
          val m = root.getRowCount
          while (i < m) {
            val vals = new Array[Any](n)
            var c = 0
            while (c < n) { vals(c) = getValue(root, c, i, java8); c += 1 }
            rows += Row.fromSeq(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
            i += 1
          }
        }
        rd.close(); alloc.close()
        rows.iterator
      }
    }(Encoders.row(st))
  }
}
