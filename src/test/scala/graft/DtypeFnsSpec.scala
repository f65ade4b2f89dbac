package graft

import org.apache.spark.sql.functions._

import graft.functions.DtypeFns
import graft.types.GeoWkb

/** Dtype canonicalizer kit — mirrors the reference's per-dtype round-trip
  * matrix (tests/test_pipes_dtypes.py) for uuid, bytes, and geometry. */
class DtypeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("uuidCanonical: hyphenated, bare-hex, mixed case, invalid") {
    val df = Seq(
      "550E8400-E29B-41D4-A716-446655440000",
      "550e8400e29b41d4a716446655440000",
      "  550e8400-e29b-41d4-a716-446655440000 ",
      "not-a-uuid").toDF("u")
    val out = df.select(DtypeFns.uuidCanonical(col("u"))).as[String].collect()
    assert(out(0) == "550e8400-e29b-41d4-a716-446655440000")
    assert(out(1) == "550e8400-e29b-41d4-a716-446655440000")
    assert(out(2) == "550e8400-e29b-41d4-a716-446655440000")
    assert(out(3) == null)
  }

  test("bytes: base64 and hex round-trips") {
    val df = Seq("hello graft").toDF("s").select(col("s").cast("binary").as("b"))
    val r = df.select(
      DtypeFns.bytesToBase64(col("b")).as("b64"),
      DtypeFns.bytesToHex(col("b")).as("hx"),
      DtypeFns.base64ToBytes(DtypeFns.bytesToBase64(col("b"))).cast("string").as("rt1"),
      DtypeFns.hexToBytes(DtypeFns.bytesToHex(col("b"))).cast("string").as("rt2")).head()
    assert(r.getAs[String]("b64") == "aGVsbG8gZ3JhZnQ=")
    assert(r.getAs[String]("hx") == "68656c6c6f206772616674")
    assert(r.getAs[String]("rt1") == "hello graft")
    assert(r.getAs[String]("rt2") == "hello graft")
  }

  test("WKB known vectors (OGC little-endian)") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    assert(hex(GeoWkb.wktToWkb("POINT (1 2)")) ==
      "0101000000000000000000f03f0000000000000040")
    assert(hex(GeoWkb.wktToWkb("LINESTRING (1 2, 3 4)")) ==
      "010200000002000000000000000000f03f000000000000004000000000000008400000000000001040")
  }

  test("WKT⇄WKB round-trips across geometry types") {
    val wkts = Seq(
      "POINT (1.5 -2.25)",
      "LINESTRING (0.0 0.0, 1.0 1.0, 2.5 0.5)",
      "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0), (1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 1.0))",
      "MULTIPOINT ((1.0 2.0), (3.0 4.0))",
      "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 3.0))",
      "MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)), ((5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 5.0)))",
      "GEOMETRYCOLLECTION (POINT (1.0 2.0), LINESTRING (0.0 0.0, 1.0 1.0))")
    wkts.foreach { w =>
      assert(GeoWkb.wkbToWkt(GeoWkb.wktToWkb(w)) == w, s"round-trip failed for $w")
    }
    // bare-coordinate MULTIPOINT form is accepted on parse
    assert(GeoWkb.wkbToWkt(GeoWkb.wktToWkb("MULTIPOINT (1 2, 3 4)")) ==
      "MULTIPOINT ((1.0 2.0), (3.0 4.0))")
  }

  test("geometry UDFs: column-level round-trip with null passthrough") {
    val df = Seq(Some("POINT (3 42)"), None).toDF("wkt")
    val out = df.select(
      DtypeFns.wkbToWkt(DtypeFns.wktToWkb(col("wkt"))).as("rt")).as[Option[String]].collect()
    assert(out(0).contains("POINT (3.0 42.0)"))
    assert(out(1).isEmpty)
  }
}

/** SRID reprojection (4326 ⇄ 3857) over the WKB codec — the reference's
  * `project_geometry` (utils/dtypes/__init__.py:874-881); behavior mirrors
  * its pyproj EPSG transforms for the closed-form spherical-Mercator pair. */
class GeoProjectionSpec extends SparkSpec {
  import graft.types.GeoWkb
  import graft.types.Dtypes

  private def pointXY(wkb: Array[Byte]): (Double, Double) = {
    val w = GeoWkb.wkbToWkt(wkb)
    val m = "POINT \\((\\S+) (\\S+)\\)".r.findFirstMatchIn(w).get
    (m.group(1).toDouble, m.group(2).toDouble)
  }

  test("4326 -> 3857 matches independently computed spherical-Mercator values") {
    // x(180°) = π·R = 20037508.342789244 is the canonical published Web
    // Mercator extent; the other values were computed with an independent
    // libm (C, via CPython math) — tolerances absorb last-ulp tan/ln
    // differences across libms.
    val cases = Seq(
      ((-82.3511, 34.86965), (-9167282.518265951, 4146181.1787357563)),
      ((0.0, 0.0), (0.0, 0.0)),
      ((180.0, 85.06), (2.0037508342789244e7, 2.0048966104014594e7)))
    cases.foreach { case ((lon, lat), (ex, ey)) =>
      val wkb = GeoWkb.wktToWkb(s"POINT ($lon $lat)")
      val (x, y) = pointXY(GeoWkb.projectWkb(wkb, 4326, 3857))
      assert(math.abs(x - ex) < 1e-6, s"x: $x vs $ex")
      assert(math.abs(y - ey) < 1e-5, s"y: $y vs $ey")
    }
  }

  test("3857 -> 4326 inverts the forward transform") {
    val wkb = GeoWkb.wktToWkb("POINT (-82.3511 34.86965)")
    val back = GeoWkb.projectWkb(GeoWkb.projectWkb(wkb, 4326, 3857), 3857, 4326)
    val (lon, lat) = pointXY(back)
    assert(math.abs(lon - -82.3511) < 1e-9 && math.abs(lat - 34.86965) < 1e-9)
  }

  test("projection preserves structure across every geometry kind") {
    val wkts = Seq(
      "LINESTRING (0.0 0.0, 10.0 10.0, 20.0 5.0)",
      "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0), (0.2 0.2, 0.4 0.2, 0.4 0.4, 0.2 0.2))",
      "MULTIPOINT ((1.0 2.0), (3.0 4.0))",
      "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 3.0))",
      "MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)))",
      "GEOMETRYCOLLECTION (POINT (1.0 2.0), LINESTRING (0.0 0.0, 1.0 1.0))")
    wkts.foreach { w =>
      val proj = GeoWkb.projectWkb(GeoWkb.wktToWkb(w), 4326, 3857)
      val back = GeoWkb.projectWkb(proj, 3857, 4326)
      // same shape tokens; coordinates round-trip to ~1e-9 degrees
      val shape = GeoWkb.wkbToWkt(back).replaceAll("[-0-9.E]+", "#")
      assert(shape == w.replaceAll("[-0-9.E]+", "#"), s"structure changed for $w")
    }
  }

  test("big-endian member WKB reprojects (canonicalized to little-endian)") {
    import java.nio.{ByteBuffer, ByteOrder}
    val buf = ByteBuffer.allocate(1 + 4 + 4 + (1 + 4 + 16))
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(4).putInt(1)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte).putInt(1)
    buf.putDouble(30.0).putDouble(10.0)
    val proj = GeoWkb.projectWkb(buf.array(), 4326, 3857)
    val w = GeoWkb.wkbToWkt(proj)
    assert(w.startsWith("MULTIPOINT ((33395"), s"got $w") // 30° lon ≈ 3339584.7 m
  }

  test("identity and unsupported SRID pairs") {
    val wkb = GeoWkb.wktToWkb("POINT (1 2)")
    assert(GeoWkb.projectWkb(wkb, 4326, 4326) eq wkb)
    intercept[IllegalArgumentException] { GeoWkb.projectWkb(wkb, 4326, 2154) }
  }

  test("geometry dtype modifier parses type + SRID (reference doctests)") {
    assert(Dtypes.geometryTypeSrid("geometry[Point, 0]") == ("Point", "0"))
    assert(Dtypes.geometryTypeSrid("geometry[0, Point]") == ("Point", "0"))
    assert(Dtypes.geometryTypeSrid("geometry[0]") == ("geometry", "0"))
    assert(Dtypes.geometryTypeSrid("geometry[]") == ("geometry", "0"))
    assert(Dtypes.geometryTypeSrid("geometry[MULTILINESTRING, 4326]") ==
      ("MultiLineString", "4326"))
    assert(Dtypes.geometryTypeSrid("geography[POINT]") == ("Point", "0"))
    assert(Dtypes.geometryTypeSrid("geometry[POINT, ESRI:102003]") ==
      ("Point", "ESRI:102003"))
    assert(Dtypes.geometryTypeSrid("geometry(Point, srid=3857)") == ("Point", "3857"))
    // modifier forms parse to the geometry dtype instead of throwing
    assert(Dtypes.parse("geometry[Point, 4326]") == graft.types.MrsmType.MGeometry)
    assert(Dtypes.parse("geography(MultiPolygon)") == graft.types.MrsmType.MGeometry)
    assert(Dtypes.epsgCode("4326").contains(4326))
    assert(Dtypes.epsgCode("EPSG:3857").contains(3857))
    assert(Dtypes.epsgCode("ESRI:102003").isEmpty)
  }
}
