package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven algebraic laws over random small frames
  * (SURVEY.md §5.2.4). Spark jobs are slow per-check, so each property runs
  * a handful of seeded generated cases (raw ScalaCheck generators — the
  * scalatest bridge artifact is not in the offline cache). */
class PropertySpec extends SparkSpec {

  /** n deterministic samples from a generator. */
  private def forAll[T](g: Gen[T], n: Int = 5)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(30), Seed(42L + i)))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default.withSize(30), Seed(42L + i)),
        gb.pureApply(Gen.Parameters.default.withSize(30), Seed(1042L + i)))
    }

  private val rowsGen: Gen[List[(Int, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(-100.0, 100.0)))

  test("rolling mean over a 1-row frame is the identity") {
    import spark.implicits._
    forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, i.toLong, v) }.toDF("k", "seq", "v")
      val w1 = Window.partitionBy("k").orderBy("seq").rowsBetween(0, 0)
      val bad = df.withColumn("m", avg("v").over(w1))
        .filter(abs(col("m") - col("v")) > 1e-12).count()
      assert(bad == 0)
    }
  }

  test("cumsum's last element per key equals the key's sum") {
    import spark.implicits._
    forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, i.toLong, v) }.toDF("k", "seq", "v")
      val run = Window.partitionBy("k").orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lastCum = df.withColumn("c", sum("v").over(run))
        .groupBy("k").agg(max(struct(col("seq"), col("c"))).as("m"))
        .select(col("k"), col("m.c").as("c"))
      val totals = df.groupBy("k").agg(sum("v").as("s"))
      val bad = lastCum.join(totals, "k")
        .filter(abs(col("c") - col("s")) > 1e-9).count()
      assert(bad == 0)
    }
  }

  test("semi ∪ anti partitions the left frame for any key overlap") {
    import spark.implicits._
    forAll2(rowsGen, rowsGen) { (l, r) =>
      val left = l.map(_._1).toDF("k")
      val right = r.map(_._1).toDF("k")
      val semi = left.join(right, Seq("k"), "left_semi").count()
      val anti = left.join(right, Seq("k"), "left_anti").count()
      assert(semi + anti == left.count())
    }
  }

  test("unpivot ∘ pivot(first) restores the original cells") {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 1000), Gen.choose(-10.0, 10.0), Gen.choose(-10.0, 10.0)))) { rows =>
      val df = rows.map { case (id, a, b) => (id, a, b) }
        .distinctBy(_._1).toDF("id", "a", "b")
      val melted = df.unpivot(Array(col("id")), Array(col("a"), col("b")), "attr", "v")
      val back = melted.groupBy("id").pivot("attr", Seq("a", "b")).agg(first("v"))
      assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    }
  }

  test("zipfJoin equals the plain inner join for every head size") {
    // the corpus vocabulary is smaller than the default head, so the
    // SHUFFLED-TAIL branch only ever runs here: force it with tiny headK
    // values and require exact multiset equality with the naive join
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 99)))) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (s"k$k", i.toLong, v) }.toDF("term", "id", "v")
      val counts = df.groupBy("term").agg(count(lit(1)).as("cnt"))
      val expected = df.join(counts, Seq("term")).collect()
        .map(_.toString).sorted.toSeq
      for (headK <- Seq(1, 3, 1000)) {
        val got = ops.Curation.zipfJoin(df, counts, "term", headK)
          .select("term", "id", "v", "cnt").collect()
          .map(_.toString).sorted.toSeq
        assert(got == expected, s"headK=$headK diverges from the plain join")
      }
    }
  }

  test("sliding 8-word span expression matches a Scala reference on random texts") {
    import spark.implicits._
    // the core expr of q_span_dedup/q_span_flag, against List.sliding
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(6))
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    forAll(Gen.nonEmptyListOf(textGen), n = 3) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = df
        .select(col("doc_id"),
          expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 7), i -> array_join(slice(w, i, 8), ' '))"))
          .as("span"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val expected = texts.zipWithIndex.flatMap { case (t, i) =>
        val ws = t.split(" ").filter(_.nonEmpty).toList
        if (ws.length < 8) Nil
        else ws.sliding(8).map(s => (i.toLong, s.mkString(" "))).toList
      }.sorted
      assert(got == expected)
    }
  }

  test("interval bucket-decomposition finds exactly the θ-join's overlap pairs") {
    import spark.implicits._
    // random owner intervals; the q_join_overlap decomposition (explode to
    // width-10 buckets → equi-join → distinct → exact predicate) must
    // produce the SAME pair set as the naive two-inequality join, for any
    // interval layout — including touching endpoints and spans crossing
    // many buckets
    val ivGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 100L), Gen.choose(0L, 35L)))
    forAll(ivGen) { raw =>
      val ivs = raw.zipWithIndex
        .map { case ((u, st, len), i) => (u, i.toLong, st, st + len) }
        .toDF("u", "sid", "st", "en")
      val buck = ivs.select(col("u"), col("sid"), col("st"), col("en"),
        explode(expr("sequence(st div 10, en div 10)")).as("bk"))
      val decomposed = buck
        .select(col("bk"), col("u").as("ua"), col("sid").as("sa"),
          col("st").as("sta"), col("en").as("ena"))
        .join(buck.select(col("bk"), col("u").as("ub"), col("sid").as("sb"),
          col("st").as("stb"), col("en").as("enb")), Seq("bk"))
        .filter(col("ua") < col("ub")
          && col("sta") <= col("enb") && col("stb") <= col("ena"))
        .select("sa", "sb").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = ivs.select(col("u").as("ua"), col("sid").as("sa"),
          col("st").as("sta"), col("en").as("ena"))
        .join(ivs.select(col("u").as("ub"), col("sid").as("sb"),
          col("st").as("stb"), col("en").as("enb")),
          col("ua") < col("ub")
            && col("sta") <= col("enb") && col("stb") <= col("ena"))
        .select("sa", "sb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(decomposed == naive,
        s"missing=${naive -- decomposed} extra=${decomposed -- naive}")
    }
  }

  test("dot_f is symmetric and Cauchy-Schwarz-bounded on random float vectors") {
    import spark.implicits._
    graft.functions.FloatDotProduct.register(spark)
    forAll(Gen.nonEmptyListOf(Gen.listOfN(8, Gen.choose(-5.0f, 5.0f)))) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val a = df.select(col("id").as("ai"), col("v").as("va"))
      val b = df.select(col("id").as("bi"), col("v").as("vb"))
      val bad = a.crossJoin(b).select(
          expr("dot_f(va, vb)").as("ab"),
          expr("dot_f(vb, va)").as("ba"),
          expr("sqrt(dot_f(va, va)) * sqrt(dot_f(vb, vb))").as("bound"))
        .filter(col("ab") =!= col("ba") ||
          abs(col("ab")) > col("bound") + lit(1e-6)).count()
      assert(bad == 0)
    }
  }

  test("Avro/Arrow typed IO round-trips random decimal/date/timestamp rows") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DecimalType(12, 2)),
      StructField("day", DateType),
      StructField("at_utc", TimestampType),
      StructField("at_local", TimestampNTZType)))
    // generator bounds: decimal within 12-digit precision at scale 2;
    // dates/timestamps within ±50 years of epoch at micro precision
    val cell: Gen[(Option[Long], Option[Int], Option[Long])] = Gen.zip(
      Gen.option(Gen.choose(-9999999999L, 9999999999L)),
      Gen.option(Gen.choose(-18250, 18250)),
      Gen.option(Gen.choose(-1577880000000000L, 1577880000000000L)))
    val rowsGen = Gen.nonEmptyListOf(cell)
    forAll(rowsGen, n = 3) { cells =>
      val rows = cells.zipWithIndex.map { case ((dec, day, us), i) =>
        Row(i.toLong,
          dec.map(u => new java.math.BigDecimal(
            java.math.BigInteger.valueOf(u), 2)).orNull,
          day.map(d => java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(d.toLong))).orNull,
          us.map { u =>
            val t = new java.sql.Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
            t
          }.orNull,
          us.map(u => java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(u, 1000000L),
            (Math.floorMod(u, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)).orNull)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      for ((fmt, w, r) <- Seq(
          ("avro", graft.sources.AvroIO.write _, graft.sources.AvroIO.read _),
          ("arrow", graft.sources.ArrowIO.write _, graft.sources.ArrowIO.read _))) {
        val path = java.nio.file.Files
          .createTempDirectory(s"graft_prop_$fmt").toString
        w(df, path)
        val back = r(spark, path)
        assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          schema.fields.map(f => (f.name, f.dataType)).toSeq, s"$fmt schema")
        assert(back.orderBy("id").collect().toSeq ==
          df.orderBy("id").collect().toSeq, s"$fmt values")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      }
    }
  }
}
