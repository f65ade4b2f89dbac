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
