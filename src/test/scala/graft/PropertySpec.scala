package graft

import java.time.{Duration, Instant, LocalDateTime, ZoneOffset}

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.types.GeoWkb

/** Property-based coverage of the pure kernels: the WKT⇄WKB codec, the
  * chunk grid, round_time laws, and the winnowing guarantee — the places
  * where a missed edge is a silent data corruption rather than a crash.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge in
    * the offline cache): fail the suite with the counterexample on falsify. */
  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private val coordGen: Gen[(Double, Double)] = for {
    x <- Gen.chooseNum(-180.0, 180.0)
    y <- Gen.chooseNum(-90.0, 90.0)
  } yield (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
           BigDecimal(y).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  private def fmtCoord(c: (Double, Double)) = s"${c._1} ${c._2}"

  private val wktGen: Gen[String] = Gen.oneOf(
    coordGen.map(c => s"POINT (${fmtCoord(c)})"),
    Gen.nonEmptyListOf(coordGen).map(cs =>
      s"LINESTRING (${cs.map(fmtCoord).mkString(", ")})"),
    Gen.listOfN(4, coordGen).map { cs =>
      val ring = (cs :+ cs.head).map(fmtCoord).mkString(", ")
      s"POLYGON (($ring))"
    },
    Gen.nonEmptyListOf(coordGen).map(cs =>
      s"MULTIPOINT (${cs.map(c => s"(${fmtCoord(c)})").mkString(", ")})"))

  test("WKT -> WKB -> WKT round-trips for generated 2D geometries") {
    check(forAll(wktGen) { wkt =>
      GeoWkb.wkbToWkt(GeoWkb.wktToWkb(wkt)) == wkt
    })
  }

  test("GPKG wrap/unwrap round-trips WKB bytes and SRID") {
    check(forAll(wktGen, Gen.chooseNum(0, 999999)) { (wkt, srid) =>
      val wkb  = GeoWkb.wktToWkb(wkt)
      val gpkg = GeoWkb.wkbToGpkg(wkb, srid)
      GeoWkb.gpkgToWkb(gpkg).toSeq == wkb.toSeq &&
        GeoWkb.gpkgSrid(gpkg).contains(srid)
    })
  }

  private val instGen: Gen[Instant] =
    Gen.chooseNum(0L, 4102444800L).map(Instant.ofEpochSecond)

  test("chunk grid covers [begin, end) exactly: contiguous, half-open, aligned") {
    val gen = for {
      a <- instGen; b <- instGen if a != b
      mins <- Gen.oneOf(60L, 1440L, 43200L)
    } yield (if (a.isBefore(b)) (a, b) else (b, a), mins)
    check(forAll(gen) { case ((begin, end), mins) =>
      val step = Duration.ofMinutes(mins)
      val bs = graft.dsl.ChunkGrid.bounds(begin, end, step)
      val contiguous = bs.zip(bs.drop(1)).forall { case ((_, hi), (lo2, _)) => hi == lo2 }
      val covers = bs.nonEmpty && bs.head._1 == begin && bs.last._2 == end
      val aligned = bs.drop(1).forall { case (lo, _) =>
        lo.toEpochMilli % step.toMillis == 0 }
      val ordered = bs.forall { case (lo, hi) => lo.isBefore(hi) }
      contiguous && covers && aligned && ordered
    })
  }

  test("round_time laws: floor <= t < floor+interval; ceil is the dual; closest picks the nearer") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val g = for {
      s <- Gen.chooseNum(0L, 4102444800L)
      us <- Gen.chooseNum(0L, 999999L)
    } yield LocalDateTime.ofInstant(Instant.ofEpochSecond(s, us * 1000), ZoneOffset.UTC)
    val samples = Gen.listOfN(200, g).sample.get
    val df = samples.map(Tuple1(_)).toDF("ts")
    val r = df.select(
        col("ts"),
        graft.dsl.RoundTime.floor(col("ts"), "hour").as("f"),
        graft.dsl.RoundTime.ceil(col("ts"), "hour").as("c"),
        graft.dsl.RoundTime.closest(col("ts"), "hour").as("n"))
      .as[(LocalDateTime, LocalDateTime, LocalDateTime, LocalDateTime)].collect()
    r.foreach { case (ts, f, c, n) =>
      assert(!f.isAfter(ts) && ts.isBefore(f.plusHours(1)))
      assert(!c.isBefore(ts) && (c == f || c == f.plusHours(1)))
      assert(n == f || n == c)
      val df1 = Duration.between(f, ts); val dc = Duration.between(ts, c)
      if (df1.compareTo(dc) < 0) assert(n == f)
      else if (dc.compareTo(df1) < 0) assert(n == c)
    }
  }

  test("params DSL: the Column form and the pushdown SQL form select identical rows") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.dsl.ParamsFilter
    // tag values deliberately include the DSL's meta-literals — a stored
    // value "None" (matches-null semantics) and "_x" (negation prefix) —
    // so the parity covers the full string-interpretation surface, plus a
    // boolean and a double column for the typed-literal rendering paths.
    // Quote-bearing strings are excluded: SqlText escapes '' for JDBC
    // targets, where Spark's own parser concatenates adjacent literals —
    // that path is covered against live Derby in JdbcInstanceSpec.
    val df = (0L until 300L).map { i =>
      (i, i % 7,
       if (i % 11 == 0) null else if (i % 13 == 0) "None" else s"k${i % 5}",
       if (i % 17 == 0) null else java.lang.Boolean.valueOf(i % 2 == 0),
       if (i % 19 == 0) null else java.lang.Double.valueOf((i % 4) * 1.5))
    }.toDF("id", "grp", "tag", "flag", "score")
    df.createOrReplaceTempView("prop_params_t")
    // values are drawn from the COLUMN's type domain — a mixed-type IN
    // list is caller error (ANSI Spark rejects the cast, correctly)
    val domains: Map[String, Gen[Any]] = Map(
      "grp" -> Gen.oneOf(Gen.chooseNum(0L, 7L).map(identity[Any]), Gen.const[Any](null)),
      "tag" -> Gen.oneOf(
        Gen.oneOf[Any]("k0", "k1", "k2", "k9", "None", "null", "_k0", "_k3", "_None"),
        Gen.const[Any](null)),
      "flag"  -> Gen.oneOf[Any](true, false, null),
      "score" -> Gen.oneOf[Any](0.0, 1.5, 3.0, 4.5, 9.0, null))
    // NOTE: `v: Any = ...` inside the for-comprehension would desugar to a
    // TYPE pattern, and type patterns never match null — which the domain
    // legitimately generates. Build the value in the yield instead.
    val entryGen: Gen[(String, Any)] = for {
      colName <- Gen.oneOf("grp", "tag", "flag", "score")
      vs  <- Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, domains(colName)))
      // per-element negation: mixed include/exclude lists exercise the
      // IN ∧ NOT-IN conjunction branch in both renderers
      negs <- Gen.listOfN(vs.length, Gen.oneOf(true, false))
      scalarNeg <- Gen.oneOf(true, false)
    } yield colName -> (vs.distinct match {
      case Seq(one) if scalarNeg  => ParamsFilter.Not(one)
      case Seq(one)               => one
      case many => many.zip(negs).map {
        case (v, true)  => ParamsFilter.Not(v)
        case (v, false) => v
      }
    })
    val paramsGen: Gen[Map[String, Any]] =
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, entryGen)).map(_.toMap)
    check(forAll(paramsGen) { params =>
      val viaColumn = df.where(ParamsFilter.toPredicate(params))
        .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
      val sql = ParamsFilter.toSql(params)
      val viaSql = spark.sql(
          s"SELECT id FROM prop_params_t WHERE ${if (sql.isEmpty) "TRUE" else sql} ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      viaColumn == viaSql
    })
  }

  test("dtype promotion lattice laws (commutative, associative mod areEqual, idempotent, MStr top)") {
    import graft.types.Dtypes
    import graft.types.MrsmType._
    val numGen: Gen[graft.types.MrsmType] = for {
      s <- Gen.chooseNum(0, 20)
      i <- Gen.chooseNum(0, 30)
    } yield MNumeric(math.min(38, i + s), s)
    val typeGen: Gen[graft.types.MrsmType] = Gen.frequency(
      8 -> Gen.oneOf[graft.types.MrsmType](MBool, MInt8, MInt16, MInt32, MInt64,
        MFloat, MStr, MDate, MBytes, MUuid, MJson, MGeometry),
      3 -> numGen,
      2 -> Gen.oneOf(true, false).map(MDatetime(_)))
    val mixedGen = Gen.oneOf(true, false)
    def isDt(t: graft.types.MrsmType) = t.isInstanceOf[MDatetime]
    check(forAll(typeGen, typeGen, mixedGen) { (a, b, m) =>
      val ab = Dtypes.promote(a, b, m); val ba = Dtypes.promote(b, a, m)
      // mixed-tz datetime pairs resolve FIRST-WINS by design (the stored
      // table keeps its axis flavor — commuting would force a 100 TB
      // rewrite on a tz-drifted batch); they still commute mod areEqual
      val exact = if (isDt(a) && isDt(b)) true else ab == ba
      exact && Dtypes.areEqual(ab, ba)
    })
    check(forAll(typeGen, typeGen, typeGen, mixedGen) { (a, b, c, m) =>
      Dtypes.areEqual(
        Dtypes.promote(Dtypes.promote(a, b, m), c, m),
        Dtypes.promote(a, Dtypes.promote(b, c, m), m))
    })
    check(forAll(typeGen, mixedGen) { (a, m) =>
      Dtypes.promote(a, a, m) == a &&
        Dtypes.areEqual(Dtypes.promote(a, MStr, m), MStr) &&
        Dtypes.areEqual(Dtypes.promote(MStr, a, m), MStr)
    })
  }

  test("SQ8 quantization laws: codes bounded, reconstruction within a half step") {
    val vecGen = for {
      n  <- Gen.chooseNum(1, 32)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3))
      if vs.exists(_ != 0.0)
    } yield vs
    check(forAll(vecGen) { vs =>
      val scale = vs.map(math.abs).max
      val codes = graft.ops.SimilaritySearch.int8Of(vs, scale)
      val step  = scale / 127.0
      codes.forall(c => c >= -127L && c <= 127L) &&
        vs.zip(codes).forall { case (x, c) =>
          // floor(x·127/scale + 0.5) is within 1/2 of x·127/scale, so the
          // reconstruction error is at most half a step (+ FP slack)
          math.abs(x - c * step) <= step * 0.5 + 1e-9 * scale
        }
    })
  }

  test("winnowing guarantee holds for random shared substrings (k=8, w=4)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val alpha = Gen.alphaLowerChar
    val strGen = (n: Int) => Gen.listOfN(n, alpha).map(_.mkString)
    val gen = for {
      shared <- strGen(11) // w + k - 1
      p1 <- strGen(12); s1 <- strGen(12)
      p2 <- strGen(12); s2 <- strGen(12)
    } yield (s"$p1 $shared $s1", s"$p2 $shared $s2")
    val cases = Gen.listOfN(25, gen).sample.get
    cases.zipWithIndex.foreach { case ((t1, t2), i) =>
      val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val fps = graft.ops.Corpus.winnowFingerprints(docs, "doc_id", "text", 8, 4)
      val common = fps.where($"doc_id" === 1L).select("fp")
        .intersect(fps.where($"doc_id" === 2L).select("fp")).count()
      assert(common >= 1, s"case $i: no shared fingerprint for '$t1' / '$t2'")
    }
  }
}

/** Unicode-normalization kernel laws (pure JVM kernel — the expression's
  * eval and codegen both call it, so these cover the engine behavior). */
class UnicodeNormalizePropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def nfc(s: String): String =
    graft.expressions.UnicodeNormalizeKernel.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      java.text.Normalizer.Form.NFC).toString

  // strings mixing ASCII, Latin-1 letters, and combining marks
  private val gen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\u00e9', '\u00fc', '\u00f1', '\u00e5'),
    2 -> Gen.oneOf('\u0301', '\u0308', '\u0303', '\u030a'),
    1 -> Gen.oneOf(' ', '.', '-'))).map(_.mkString)

  test("NFC is idempotent and stable in codepoint count") {
    check(forAll(gen) { s =>
      val once = nfc(s)
      nfc(once) == once &&
        once.codePointCount(0, once.length) <= s.codePointCount(0, s.length)
    })
  }

  test("NFC preserves canonical equivalence classes (decomposed == composed)") {
    check(forAll(Gen.alphaStr) { s =>
      nfc(s + "é") == nfc(s + "é")
    })
  }

  // ── RESP2 wire protocol: encode → parse is the identity ────────────────

  test("RESP command encode/parse round-trips arbitrary binary-ish args") {
    val argGen: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('\r', '\n', '$', '*', ':', '+', '-'),
      1 -> Gen.oneOf('\u00e9', '\u4e2d', '\u00df'),
      1 -> Gen.oneOf(' ', '"', '\\'))).map(_.mkString)
    check(forAll(Gen.nonEmptyListOf(argGen)) { args =>
      val bytes = graft.kv.Resp.encode(args)
      val in = new java.io.ByteArrayInputStream(bytes)
      graft.kv.Resp.readReply(in) match {
        case graft.kv.Resp.Arr(Some(items)) =>
          items.map { case graft.kv.Resp.Bulk(Some(v)) => v; case o => o.toString } == args
        case _ => false
      }
    })
  }

  test("SimHashKernel matches an independent md5-nibble reference on random texts") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent reference: hex-string md5 per token, parse nibbles from
    // the rendered digits (a different code path than the kernel's byte math)
    def reference(s: String, bits: Int): Long = {
      val toks = UTF8String.fromString(s).toLowerCase.trim().toString
        .split("\\s+", -1)
      val md = java.security.MessageDigest.getInstance("MD5")
      val sums = new Array[Int](bits)
      toks.foreach { t =>
        md.reset()
        val hex = md.digest(t.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        var j = 0
        while (j < bits) {
          val nib = Integer.parseInt(hex.charAt(j / 4).toString, 16)
          sums(j) += (if ((nib & (1 << (j % 4))) != 0) 1 else -1)
          j += 1
        }
      }
      (0 until bits).map(j => if (sums(j) > 0) 1L << j else 0L).sum
    }
    val tokenGen = Gen.frequency(
      5 -> Gen.alphaNumStr,
      2 -> Gen.oneOf("the", "a", "spark", "h\u00e9llo", "\u65e5\u672c\u8a9e", "ABC"),
      1 -> Gen.const(""))
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = for {
      toks <- Gen.listOf(tokenGen)
      seps <- Gen.listOfN(math.max(toks.size - 1, 0), sepGen)
    } yield toks.zipAll(seps :+ "", "", "").map { case (t, x) => t + x }.mkString
    check(forAll(textGen, Gen.oneOf(1, 16, 63)) { (s, bits) =>
      graft.expressions.SimHashKernel.compute(UTF8String.fromString(s), bits) ==
        reference(s, bits)
    })
  }
}
