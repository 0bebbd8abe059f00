package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed Avro container read/write built on avro-core only.
  *
  * The reference grants `read_avro` (SURVEY §2.3); this Spark build ships
  * the Avro CORE jars but not the `spark-avro` datasource, so the format
  * is implemented here directly: the WRITE side emits one standard Avro
  * object-container file per partition through the Hadoop filesystem API
  * (shared-FS ready), and the READ side scans those containers through
  * Spark's `binaryFile` source and decodes per-file in `mapPartitions` —
  * the same justified imperative seam as the multimodal decode
  * (pipeline/Media.scala): scheduling, pruning, and everything downstream
  * of the decode stays declarative.
  *
  * Scalar schemas only (long/int/double/float/string/boolean plus the
  * spec logical types date, timestamp-micros, local-timestamp-micros and
  * bytes/decimal(p, s); all nullable) — the training-pipeline interchange
  * subset. `binaryFile` caps one container at 2 GB; write-side files are
  * one-per-partition, so size them with the upstream partitioning.
  */
object AvroIO {

  /** One column's Avro schema, logical types per the Avro spec: date =
    * int/date, timestamp ⇔ long/timestamp-micros (instant) or
    * long/local-timestamp-micros (NTZ), decimal = bytes/decimal(p, s) —
    * the annotations every Avro implementation (fastavro, avro-python,
    * spark-avro) resolves to the same logical values. */
  private def avroBase(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      org.apache.avro.LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case other => throw new IllegalArgumentException(
      s"AvroIO supports scalar columns only, got: $other")
  }

  /** StructType → Avro record schema (nullable columns become
    * union[null, T], Avro's idiom). */
  def avroSchemaFor(st: StructType, name: String = "graft_record"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      // Avro names must match [A-Za-z_][A-Za-z0-9_]* — fail with the
      // offending COLUMN up front instead of Avro's bare
      // SchemaParseException mid-write (ArrowIO/ExcelIO accept any name;
      // this is the one format that can't)
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"AvroIO: column name '${f.name}' is not a legal Avro field name " +
          "([A-Za-z_][A-Za-z0-9_]*) — rename it before the Avro sink")
      val base = avroBase(f.dataType)
      val s =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      fields.add(new Schema.Field(f.name, s, null, null))
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(fields)
    rec
  }

  private def structFor(schema: Schema): StructType = {
    import org.apache.avro.LogicalTypes
    def unwrap(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val nonNull = s.getTypes.stream()
          .filter(_.getType != Schema.Type.NULL).findFirst().get()
        (nonNull, true)
      } else (s, false)
    StructType(scala.jdk.CollectionConverters.ListHasAsScala(schema.getFields)
      .asScala.map { f =>
        val (s, nullable) = unwrap(f.schema())
        val dt = (s.getType, s.getLogicalType) match {
          case (_, _: LogicalTypes.Date)                 => DateType
          case (_, _: LogicalTypes.TimestampMicros)      => TimestampType
          case (_, _: LogicalTypes.LocalTimestampMicros) => TimestampNTZType
          case (_, d: LogicalTypes.Decimal) =>
            DecimalType(d.getPrecision, d.getScale)
          // an UNRECOGNIZED logical type must not silently decay to its
          // physical type (a fastavro timestamp-millis column reading
          // back as raw longs corrupts downstream date logic unnoticed)
          case (_, lt) if lt != null =>
            throw new IllegalArgumentException(
              s"AvroIO cannot map Avro logical type $lt (field ${f.name()}) — " +
                "convert to timestamp-micros/date/decimal or read the raw type explicitly")
          case (Schema.Type.LONG, _)    => LongType
          case (Schema.Type.INT, _)     => IntegerType
          case (Schema.Type.DOUBLE, _)  => DoubleType
          case (Schema.Type.FLOAT, _)   => FloatType
          case (Schema.Type.STRING, _)  => StringType
          case (Schema.Type.BOOLEAN, _) => BooleanType
          case (other, _) => throw new IllegalArgumentException(
            s"AvroIO cannot map Avro type $other")
        }
        StructField(f.name(), dt, nullable)
      }.toSeq)
  }

  /** External Row value → Avro-encodable value for one column. */
  private def toAvro(dt: DataType): Any => Any = dt match {
    // TimeCodec accepts both java.sql and java.time inputs, so the
    // writer survives spark.sql.datetime.java8API.enabled (a hard cast
    // to the java.sql family threw in every task under that conf)
    case DateType => TimeCodec.toEpochDays
    case TimestampType => TimeCodec.toMicros
    case TimestampNTZType => TimeCodec.ldtToMicros
    case d: DecimalType => v =>
      // big-endian unscaled two's complement at the declared scale — the
      // Avro decimal wire format
      java.nio.ByteBuffer.wrap(v.asInstanceOf[java.math.BigDecimal]
        .setScale(d.scale).unscaledValue().toByteArray)
    case _ => identity
  }

  /** Avro-decoded value → external Row value for one column (`java8`
    * picks the java.time family the session's encoders expect). */
  private def fromAvro(dt: DataType, java8: Boolean): Any => Any = dt match {
    case DateType => v =>
      TimeCodec.daysToDate(v.asInstanceOf[Int], java8)
    case TimestampType => v =>
      TimeCodec.microsToTimestamp(v.asInstanceOf[Long], java8)
    case TimestampNTZType => v =>
      TimeCodec.microsToLdt(v.asInstanceOf[Long])
    case d: DecimalType => v => {
      val buf = v.asInstanceOf[java.nio.ByteBuffer]
      val bytes = new Array[Byte](buf.remaining())
      buf.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    }
    case _ => identity
  }

  /** Write `df` as Avro object-container files, one per partition
    * (`part-N.avro`), overwriting `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    // ship the schema as its canonical JSON — cheap and version-stable
    val schemaJson = avroSchemaFor(st).toString
    val names = st.fieldNames
    val convs = st.fields.map(f => toAvro(f.dataType))
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs0 = p0.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs0.delete(p0, true)
    fs0.mkdirs(p0)
    // ship the SESSION conf into the tasks (see graftshim.SerConf): a
    // bare task-side Configuration resolves schemeless paths against the
    // classpath default and drops spark.hadoop.* credentials
    val serConf = new org.apache.spark.sql.graftshim.SerConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val part = new org.apache.hadoop.fs.Path(s"$path/part-$pid.avro")
        val fs = part.getFileSystem(serConf.value)
        val out = fs.create(part, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        var n = 0L
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            rec.put(names(i), if (r.isNullAt(i)) null else convs(i)(r.get(i)))
            i += 1
          }
          w.append(rec)
          n += 1
        }
        w.close()
        Iterator(n)
      }
    }.count(): Unit
    // A fully-empty frame writes no part files (tasks skip empty
    // partitions) — emit one schema-only container (header, no blocks)
    // from the driver so the round-trip stays total, like parquet.
    if (!fs0.listStatus(p0).exists(_.getPath.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(schemaJson)
      val out = fs0.create(new org.apache.hadoop.fs.Path(
        s"$path/part-empty.avro"), true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      w.close()
    }
  }

  /** Read a directory of Avro container files as a DataFrame: `binaryFile`
    * scan (Spark schedules/splits by file), per-file decode in
    * mapPartitions. The schema comes from one driver-side container peek. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select("content").as[Array[Byte]](Encoders.BINARY)
    val headBytes = files.limit(1).collect().headOption.getOrElse(
      throw new IllegalArgumentException(
        s"AvroIO.read: no .avro container files under $path"))
    val headReader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(headBytes),
      new GenericDatumReader[GenericRecord]())
    val st = try structFor(headReader.getSchema) finally headReader.close()
    val n = st.length
    val java8 = TimeCodec.java8Api(spark)
    val convs = st.fields.map(f => fromAvro(f.dataType, java8))
    files.mapPartitions { it =>
      it.flatMap { bytes =>
        val rd = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = rd.hasNext
            if (!h) rd.close()
            h
          }
          def next(): Row = {
            val rec = rd.next()
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) {
              vals(i) = rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case v => convs(i)(v)
              }
              i += 1
            }
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }
      }
    }(Encoders.row(st))
  }
}
