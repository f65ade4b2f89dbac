package graft

import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.functions.DtypeFns
import graft.sync.SyncEngine
import graft.types.{GeoWkb, MrsmType}

/** Per-dtype sync → getData round-trip matrix — the Spark form of the
  * reference's tests/test_pipes_dtypes.py (1,320 LoC): each dtype syncs
  * twice (idempotency), reads back value- and schema-identical. */
class DtypeRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(name: String, schema: StructType, rows: Seq[Row],
                        dtypes: Map[String, MrsmType] = Map.empty): Unit = {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("dtypes", name),
      columns = ColumnRoles(Map("primary" -> "pk")), dtypes = dtypes)
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
    val r1 = eng.sync(spec, df)
    assert(r1.inserted == rows.size, s"$name insert")
    val r2 = eng.sync(spec, df)
    assert(r2.total == 0, s"$name idempotency")
    val back = eng.getData(spec).orderBy("pk")
    val expectedType = dtypes.get("a").map(_.spark)
      .getOrElse(schema("a").dataType)
    assert(back.schema("a").dataType == expectedType, s"$name schema")
    val vals = back.select("a").collect().map(_.get(0)).toSeq
    val orig = rows.sortBy(_.getLong(0)).map(_.get(1))
    (vals, orig).zipped.foreach { (got, want) =>
      (got, want) match {
        case (g: Array[Byte], w: Array[Byte]) => assert(g.sameElements(w), name)
        case (g, w)                           => assert(g == w, s"$name: $g != $w")
      }
    }
  }

  private def s2(t: DataType) = StructType(Seq(
    StructField("pk", LongType), StructField("a", t, nullable = true)))

  test("datetime naive (NTZ)") {
    roundTrip("dt_naive", s2(TimestampNTZType), Seq(
      Row(1L, LocalDateTime.parse("2022-01-01T00:00:00")),
      Row(2L, LocalDateTime.parse("2022-06-15T12:34:56.789")),
      Row(3L, null)))
  }

  test("date") {
    roundTrip("date", s2(DateType), Seq(
      Row(1L, java.sql.Date.valueOf("2022-01-01")), Row(2L, null)))
  }

  test("integer widths") {
    roundTrip("int64", s2(LongType), Seq(Row(1L, 42L), Row(2L, null)))
    roundTrip("int32", s2(IntegerType), Seq(Row(1L, 42), Row(2L, null)))
    roundTrip("int8", s2(ByteType), Seq(Row(1L, 7.toByte), Row(2L, null)))
  }

  test("float and nullable bool") {
    roundTrip("float", s2(DoubleType), Seq(Row(1L, 1.5), Row(2L, null)))
    roundTrip("bool", s2(BooleanType), Seq(Row(1L, true), Row(2L, null)))
  }

  test("str and json text") {
    roundTrip("str", s2(StringType), Seq(Row(1L, "foo"), Row(2L, null)))
    roundTrip("json", s2(StringType), Seq(
      Row(1L, """{"foo":"bar","n":[1,2]}"""), Row(2L, null)),
      dtypes = Map("a" -> MrsmType.MJson))
  }

  test("numeric(38,20) exact decimal") {
    roundTrip("numeric", s2(DecimalType(38, 20)), Seq(
      Row(1L, new java.math.BigDecimal("1.00000000000000100000")
        .setScale(20)), Row(2L, null)),
      dtypes = Map("a" -> MrsmType.MNumeric(38, 20)))
  }

  test("uuid canonical text") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("dtypes", "uuid"),
      columns = ColumnRoles(Map("primary" -> "pk")),
      dtypes = Map("a" -> MrsmType.MUuid))
    val df = Seq((1L, "550E8400E29B41D4A716446655440000"))
      .toDF("pk", "raw")
      .select(col("pk"), DtypeFns.uuidCanonical(col("raw")).as("a"))
    eng.sync(spec, df)
    assert(eng.getData(spec).select("a").as[String].head() ==
      "550e8400-e29b-41d4-a716-446655440000")
  }

  test("bytes binary") {
    roundTrip("bytes", s2(BinaryType), Seq(
      Row(1L, Array[Byte](0xde.toByte, 0xad.toByte)), Row(2L, null)))
  }

  test("geometry WKB binary") {
    val wkb = GeoWkb.wktToWkb("POINT (1 2)")
    roundTrip("geom", s2(BinaryType), Seq(Row(1L, wkb)),
      dtypes = Map("a" -> MrsmType.MGeometry))
    assert(GeoWkb.wkbToWkt(wkb) == "POINT (1.0 2.0)")
  }

  test("dtype enforcement casts a declared column on sync") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("dtypes", "enforce"),
      columns = ColumnRoles(Map("primary" -> "pk")),
      dtypes = Map("a" -> MrsmType.MNumeric(10, 2)))
    eng.sync(spec, Seq((1L, 1.555)).toDF("pk", "a")) // double in
    val t = eng.getData(spec).schema("a").dataType
    assert(t == DecimalType(10, 2))
  }
}
