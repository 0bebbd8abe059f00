package graft.sources

/** Shared datetime ↔ epoch-integer conversions for the hand-rolled IO
  * formats (ArrowIO / AvroIO), factored so the sign-sensitive arithmetic
  * (floorDiv/floorMod, nanos folding — exact for pre-1970 instants) lives
  * once.
  *
  * Encode side accepts BOTH external representations Spark hands a
  * df.rdd row: java.sql.Date/Timestamp (default) and
  * java.time.LocalDate/Instant (`spark.sql.datetime.java8API.enabled`) —
  * a hard cast to the java.sql types broke every task under the java8
  * conf. Decode side produces whichever family the session expects
  * (`java8` flag, read off the conf once per read call).
  * TimestampNTZType is java.time.LocalDateTime under BOTH confs.
  */
private[sources] object TimeCodec {

  def toMicros(v: Any): Long = v match {
    // getTime already folds the sub-second millis; add the sub-milli rest
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000L))
    case other => throw new IllegalArgumentException(
      s"timestamp value of unexpected class ${other.getClass}")
  }

  def ldtToMicros(v: Any): Long = v match {
    case l: java.time.LocalDateTime =>
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L
    case other => throw new IllegalArgumentException(
      s"timestamp_ntz value of unexpected class ${other.getClass}")
  }

  def toEpochDays(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case l: java.time.LocalDate => l.toEpochDay.toInt
    case other => throw new IllegalArgumentException(
      s"date value of unexpected class ${other.getClass}")
  }

  def microsToTimestamp(us: Long, java8: Boolean): Any =
    if (java8)
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)
    else {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

  def microsToLdt(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)

  def daysToDate(days: Int, java8: Boolean): Any =
    if (java8) java.time.LocalDate.ofEpochDay(days.toLong)
    else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))

  /** The session's java.time preference, read once per read call. */
  def java8Api(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get("spark.sql.datetime.java8API.enabled", "false").toBoolean
}
