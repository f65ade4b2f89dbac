package graft.types

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal 2D WKT ⇄ WKB codec — the engine's `geometry` dtype rides as WKB
  * bytes (`BinaryType`), these conversions are the ingest/egress seam
  * (reference: meerschaum/utils/dtypes/__init__.py:349-518,800-882, which
  * delegates to shapely; we implement the OGC well-known formats directly).
  *
  * Supported: POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING,
  * MULTIPOLYGON, GEOMETRYCOLLECTION — 2D, little-endian WKB (byte order 01),
  * no SRID header (EWKB is out of scope; the reference strips to plain WKB
  * for hashing too). Numbers format as Java shortest-roundtrip doubles,
  * which matches DuckDB/Ryu output for oracle comparison.
  */
object GeoWkb {

  // OGC geometry type codes
  private val Types = Map(
    "POINT" -> 1, "LINESTRING" -> 2, "POLYGON" -> 3,
    "MULTIPOINT" -> 4, "MULTILINESTRING" -> 5, "MULTIPOLYGON" -> 6,
    "GEOMETRYCOLLECTION" -> 7)
  private val Names = Types.map(_.swap)

  // ── WKT → WKB ──────────────────────────────────────────────────────────

  def wktToWkb(wkt: String): Array[Byte] = {
    val (name, body) = splitWkt(wkt)
    val out = ByteBuffer.allocate(wkbSize(name, body)).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(out, name, body)
    out.array()
  }

  private def splitWkt(wkt: String): (String, String) = {
    val t = wkt.trim
    val p = t.indexOf('(')
    require(p > 0, s"unparseable WKT: '$wkt'")
    val name = t.substring(0, p).trim.toUpperCase
    require(Types.contains(name), s"unknown WKT geometry type: '$name'")
    val body = t.substring(p + 1, t.lastIndexOf(')')).trim
    (name, body)
  }

  /** Split a paren-balanced list on top-level commas. */
  private def topSplit(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def inner(s: String): String = {
    val t = s.trim
    require(t.startsWith("(") && t.endsWith(")"), s"expected parenthesized: '$s'")
    t.substring(1, t.length - 1)
  }

  private def coord(s: String): (Double, Double) = {
    val parts = s.trim.split("\\s+")
    require(parts.length == 2, s"expected 2D coordinate: '$s'")
    (parts(0).toDouble, parts(1).toDouble)
  }

  private def wkbSize(name: String, body: String): Int = 5 + (name match {
    case "POINT"      => 16
    case "LINESTRING" => 4 + 16 * topSplit(body).size
    case "POLYGON"    => 4 + topSplit(body).map(r => 4 + 16 * topSplit(inner(r)).size).sum
    case "MULTIPOINT" =>
      4 + topSplit(body).size * (5 + 16)
    case "MULTILINESTRING" =>
      4 + topSplit(body).map(l => 5 + 4 + 16 * topSplit(inner(l)).size).sum
    case "MULTIPOLYGON" =>
      4 + topSplit(body).map { p =>
        5 + 4 + topSplit(inner(p)).map(r => 4 + 16 * topSplit(inner(r)).size).sum
      }.sum
    case "GEOMETRYCOLLECTION" =>
      4 + topSplit(body).map { g => val (n, b) = splitWkt(g); wkbSize(n, b) }.sum
  })

  private def writeGeom(out: ByteBuffer, name: String, body: String): Unit = {
    out.put(1.toByte) // little-endian marker
    out.putInt(Types(name))
    name match {
      case "POINT" =>
        val (x, y) = coord(body); out.putDouble(x); out.putDouble(y)
      case "LINESTRING" => writeRing(out, body)
      case "POLYGON" =>
        val rings = topSplit(body)
        out.putInt(rings.size)
        rings.foreach(r => writeRing(out, inner(r)))
      case "MULTIPOINT" =>
        val pts = topSplit(body)
        out.putInt(pts.size)
        // members carry their own WKB header; accept "(x y)" and bare "x y"
        pts.foreach { p =>
          val c = if (p.startsWith("(")) inner(p) else p
          writeGeom(out, "POINT", c)
        }
      case "MULTILINESTRING" =>
        val ls = topSplit(body)
        out.putInt(ls.size)
        ls.foreach(l => writeGeom(out, "LINESTRING", inner(l)))
      case "MULTIPOLYGON" =>
        val ps = topSplit(body)
        out.putInt(ps.size)
        ps.foreach(p => writeGeom(out, "POLYGON", inner(p)))
      case "GEOMETRYCOLLECTION" =>
        val gs = topSplit(body)
        out.putInt(gs.size)
        gs.foreach { g => val (n, b) = splitWkt(g); writeGeom(out, n, b) }
    }
  }

  private def writeRing(out: ByteBuffer, body: String): Unit = {
    val pts = topSplit(body)
    out.putInt(pts.size)
    pts.foreach { p => val (x, y) = coord(p); out.putDouble(x); out.putDouble(y) }
  }

  // ── WKB → WKT ──────────────────────────────────────────────────────────

  def wkbToWkt(wkb: Array[Byte]): String = {
    val in = ByteBuffer.wrap(wkb)
    readGeom(in)
  }

  /** Each multi-geometry MEMBER carries its own byte-order byte (WKB spec):
    * honor it — forcing little-endian (or inheriting the outer order) would
    * silently decode a big-endian producer's coordinates with reversed
    * bytes into garbage-but-finite doubles. */
  private def memberOrder(in: ByteBuffer): Unit = {
    val o = in.get()
    in.order(if (o == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
  }

  private def readGeom(in: ByteBuffer): String = {
    val order = in.get()
    in.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val code = in.getInt()
    val name = Names.getOrElse(code,
      throw new IllegalArgumentException(s"unknown WKB geometry type code: $code"))
    name match {
      case "POINT"      => s"POINT (${readCoord(in)})"
      case "LINESTRING" => s"LINESTRING (${readRing(in)})"
      case "POLYGON" =>
        val n = in.getInt()
        s"POLYGON (${Seq.fill(n)(s"(${readRing(in)})").mkString(", ")})"
      case "MULTIPOINT" =>
        val n = in.getInt()
        s"MULTIPOINT (${Seq.fill(n) { memberOrder(in); in.getInt(); s"(${readCoord(in)})" }.mkString(", ")})"
      case "MULTILINESTRING" =>
        val n = in.getInt()
        s"MULTILINESTRING (${Seq.fill(n) { memberOrder(in); in.getInt(); s"(${readRing(in)})" }.mkString(", ")})"
      case "MULTIPOLYGON" =>
        val n = in.getInt()
        s"MULTIPOLYGON (${
          Seq.fill(n) {
            memberOrder(in); in.getInt()
            val rings = in.getInt()
            s"(${Seq.fill(rings)(s"(${readRing(in)})").mkString(", ")})"
          }.mkString(", ")})"
      case "GEOMETRYCOLLECTION" =>
        val n = in.getInt()
        s"GEOMETRYCOLLECTION (${Seq.fill(n)(readGeom(in)).mkString(", ")})"
    }
  }

  // ── GeoPackage geometry blobs (OGC GeoPackage spec §2.1.3) ─────────────
  // The reference's GPKG branch detects the 'GP' magic and unwraps the
  // header before treating the payload as WKB
  // (meerschaum/utils/dtypes/__init__.py:349-518); same here, as pure byte
  // parsing: magic(2) + version(1) + flags(1) + srid(4) + envelope(0..64)
  // followed by standard WKB.

  def isGpkg(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && b(0) == 'G'.toByte && b(1) == 'P'.toByte

  /** SRID of a GPKG blob (byte order from flags bit 0). */
  def gpkgSrid(b: Array[Byte]): Option[Int] =
    if (!isGpkg(b)) None
    else {
      val order = if ((b(3) & 0x01) != 0) ByteOrder.LITTLE_ENDIAN
                  else ByteOrder.BIG_ENDIAN
      Some(ByteBuffer.wrap(b, 4, 4).order(order).getInt)
    }

  /** GPKG blob → the plain WKB payload (non-GPKG input passes through).
    * Envelope contents indicator (flags bits 1-3): 0 → none, 1 → XY
    * (4 doubles), 2/3 → XY+Z|M (6), 4 → XYZM (8). */
  def gpkgToWkb(b: Array[Byte]): Array[Byte] =
    if (!isGpkg(b)) b
    else {
      val envDoubles = ((b(3) >> 1) & 0x07) match {
        case 0 => 0
        case 1 => 4
        case 2 | 3 => 6
        case 4 => 8
        case e => throw new IllegalArgumentException(s"invalid GPKG envelope code $e")
      }
      java.util.Arrays.copyOfRange(b, 8 + envDoubles * 8, b.length)
    }

  /** Wrap WKB as a GPKG blob (version 0, little-endian srid, no envelope). */
  def wkbToGpkg(wkb: Array[Byte], srid: Int = 4326): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put('G'.toByte).put('P'.toByte).put(0.toByte).put(0x01.toByte)
    out.putInt(srid).put(wkb)
    out.array()
  }

  // ── SRID reprojection ──────────────────────────────────────────────────
  // The reference reprojects via pyproj (utils/dtypes/__init__.py:874-881
  // `project_geometry`; GeoJSON egress :833-835). We implement the
  // closed-form pairs a pipeline actually hits — WGS84 lon/lat ⇄ Web
  // Mercator (EPSG:4326 ⇄ EPSG:3857, the spherical-Mercator formulas every
  // web map uses) — as a WKB→WKB coordinate rewrite, walking the structure
  // once with no intermediate WKT. Unknown SRID pairs fail loudly rather
  // than passing coordinates through mislabeled.

  /** Spherical Web Mercator. Operation ORDER inside each formula is part of
    * the oracle contract (IEEE mult/div are exact-rounded, so an ANSI SQL
    * engine replaying `lon / 180 * pi() * R` reproduces x bit-for-bit; y
    * involves libm tan/ln and compares at fixed decimals instead). */
  object Crs {
    val EarthR = 6378137.0
    def to3857(lon: Double, lat: Double): (Double, Double) =
      (lon / 180.0 * math.Pi * EarthR,
       math.log(math.tan(lat / 180.0 * math.Pi / 2.0 + math.Pi / 4.0)) * EarthR)
    def to4326(x: Double, y: Double): (Double, Double) =
      (x / EarthR * 180.0 / math.Pi,
       (2.0 * math.atan(math.exp(y / EarthR)) - math.Pi / 2.0) * 180.0 / math.Pi)

    def transformer(fromSrid: Int, toSrid: Int): (Double, Double) => (Double, Double) =
      (fromSrid, toSrid) match {
        case (a, b) if a == b => (x, y) => (x, y)
        case (4326, 3857)     => to3857
        case (3857, 4326)     => to4326
        case _ => throw new IllegalArgumentException(
          s"unsupported SRID transform EPSG:$fromSrid -> EPSG:$toSrid " +
          "(supported: 4326 <-> 3857)")
      }
  }

  /** Reproject every coordinate of a WKB geometry; output is canonical
    * little-endian WKB of identical structure. */
  def projectWkb(wkb: Array[Byte], fromSrid: Int, toSrid: Int): Array[Byte] = {
    if (fromSrid == toSrid) return wkb
    val tf  = Crs.transformer(fromSrid, toSrid)
    val in  = ByteBuffer.wrap(wkb)
    val out = ByteBuffer.allocate(wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    copyGeom(in, out, tf)
    out.array()
  }

  private def copyTfCoord(in: ByteBuffer, out: ByteBuffer,
                          tf: (Double, Double) => (Double, Double)): Unit = {
    val (x, y) = tf(in.getDouble(), in.getDouble())
    out.putDouble(x); out.putDouble(y)
  }

  private def copyTfRing(in: ByteBuffer, out: ByteBuffer,
                         tf: (Double, Double) => (Double, Double)): Unit = {
    val n = in.getInt(); out.putInt(n)
    var i = 0
    while (i < n) { copyTfCoord(in, out, tf); i += 1 }
  }

  private def copyGeom(in: ByteBuffer, out: ByteBuffer,
                       tf: (Double, Double) => (Double, Double)): Unit = {
    val order = in.get()
    in.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    out.put(1.toByte) // canonical little-endian output
    val code = in.getInt(); out.putInt(code)
    val name = Names.getOrElse(code,
      throw new IllegalArgumentException(s"unknown WKB geometry type code: $code"))
    name match {
      case "POINT"      => copyTfCoord(in, out, tf)
      case "LINESTRING" => copyTfRing(in, out, tf)
      case "POLYGON" =>
        val n = in.getInt(); out.putInt(n)
        (0 until n).foreach(_ => copyTfRing(in, out, tf))
      case "MULTIPOINT" | "MULTILINESTRING" | "MULTIPOLYGON" | "GEOMETRYCOLLECTION" =>
        val n = in.getInt(); out.putInt(n)
        // members carry their own byte-order byte; copyGeom re-reads it
        // (and restores the member's order on `in` as it descends)
        (0 until n).foreach(_ => copyGeom(in, out, tf))
    }
  }

  private def num(d: Double): String = d.toString

  private def readCoord(in: ByteBuffer): String =
    s"${num(in.getDouble())} ${num(in.getDouble())}"

  private def readRing(in: ByteBuffer): String = {
    val n = in.getInt()
    Seq.fill(n)(readCoord(in)).mkString(", ")
  }
}
