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

  /** java.sql.Timestamp (an instant) → microseconds since epoch; exact for
    * pre-1970 instants too (getTime already folds the sub-second millis). */
  private def tsToMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def ldtToMicros(v: java.time.LocalDateTime): Long =
    v.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + v.getNano / 1000L

  private def microsToLdt(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)

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
        vec.setSafe(i, v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
      case vec: TimeStampMicroTZVector =>
        vec.setSafe(i, tsToMicros(v.asInstanceOf[java.sql.Timestamp]))
      case vec: TimeStampMicroVector =>
        vec.setSafe(i, ldtToMicros(v.asInstanceOf[java.time.LocalDateTime]))
      case vec: DecimalVector =>
        // scale was fixed by the schema; setScale is exact (same scale or
        // zero-padding), never a silent rounding
        vec.setSafe(i, v.asInstanceOf[java.math.BigDecimal].setScale(vec.getScale))
      case other => throw new IllegalArgumentException(
        s"unsupported vector ${other.getClass}")
    }

  private def getValue(root: VectorSchemaRoot, c: Int, i: Int): Any = {
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
      case v: DateDayVector =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(i).toLong))
      case v: TimeStampMicroTZVector => microsToTs(v.get(i))
      case v: TimeStampMicroVector   => microsToLdt(v.get(i))
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
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new ArrowSchema(st.fields.map(arrowField).toSeq.asJava)
        val part = new org.apache.hadoop.fs.Path(s"$path/part-$pid.arrow")
        val fs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
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
            while (c < n) { vals(c) = getValue(root, c, i); c += 1 }
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
