package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Geometry decoding to the engine's documented `ArrayType(DoubleType)`
  * encodings (see [[TypeMapping]]):
  *   point=[x,y], line=[a,b,c], circle=[x,y,r], box/lseg=[x1,y1,x2,y2],
  *   path=[open,n,x1,y1,…], polygon=[x1,y1,…].
  *
  * Two input layers, mirroring the reference's split:
  *   - native Postgres geometric types arrive over JDBC as their text
  *     forms ("(x,y)", "((x1,y1),(x2,y2))", …) — `parseGeoText`
  *     (reference decoders: conecta-core/src/source/postgres.rs:31-290);
  *   - PostGIS `geometry` arrives as EWKB bytes — `decodeEwkb` flattens
  *     point/linestring/polygon into the same coordinate-array shape
  *     (reference golden test:
  *     conecta-python/conecta/tests/databases/test_postgres.py:13-31).
  *
  * Both are pure byte/string → Array[Double] functions, so they are
  * spec-testable without a live Postgres (GeoSpec builds synthetic EWKB
  * for both endiannesses, with and without the SRID flag).
  */
object Geo {

  // EWKB geometry type codes (low 16 bits of the type word)
  private val Point = 1
  private val LineString = 2
  private val Polygon = 3
  private val GeometryCollection = 7
  // EWKB flag bits in the type word
  private val SridFlag = 0x20000000
  private val ZFlag = 0x80000000
  private val MFlag = 0x40000000

  /** Decode an EWKB/WKB geometry into the flat coordinate encoding:
    * point → [x,y]; linestring → [x1,y1,x2,y2,…]; polygon → exterior-ring
    * [x1,y1,…] (interior rings appended in order — ring boundaries are
    * recoverable from the closing coordinate, and the reference's polygon
    * convention is a flat coordinate list); geometrycollection → members'
    * coordinates concatenated in order (each member is a complete WKB
    * geometry with its own endianness byte). Z/M dimensions are rejected
    * loudly rather than silently dropped. Golden vectors: the reference's
    * PostGIS test bytes (test_postgres.py:13-31, DialectConformanceSpec). */
  def decodeEwkb(bytes: Array[Byte]): Array[Double] =
    decodeFrom(ByteBuffer.wrap(bytes))

  private def decodeFrom(buf: ByteBuffer): Array[Double] = {
    buf.order(if (buf.get() == 0) ByteOrder.BIG_ENDIAN
              else ByteOrder.LITTLE_ENDIAN)
    val typeWord = buf.getInt
    require((typeWord & ZFlag) == 0 && (typeWord & MFlag) == 0,
      "Z/M dimensions not supported in the flat [x,y] encoding")
    if ((typeWord & SridFlag) != 0) buf.getInt // skip SRID
    (typeWord & 0xFFFF) match {
      case Point =>
        Array(buf.getDouble, buf.getDouble)
      case LineString =>
        val n = buf.getInt
        Array.fill(n * 2)(buf.getDouble)
      case Polygon =>
        val rings = buf.getInt
        (0 until rings).toArray.flatMap { _ =>
          val n = buf.getInt
          Array.fill(n * 2)(buf.getDouble)
        }
      case GeometryCollection =>
        val n = buf.getInt
        (0 until n).toArray.flatMap(_ => decodeFrom(buf))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported EWKB geometry type $other")
    }
  }

  /** Parse a native Postgres geometric type's JDBC text form into the
    * documented encoding for that type. `pgType` selects the layout:
    *   point "(x,y)" → [x,y]
    *   line "{a,b,c}" → [a,b,c]
    *   circle "<(x,y),r>" → [x,y,r]
    *   box/lseg "(x1,y1),(x2,y2)" / "[(x1,y1),(x2,y2)]" → [x1,y1,x2,y2]
    *   path "((…))" closed / "[(…)]" open → [open, n, x1,y1,…]
    *   polygon "((x1,y1),…)" → [x1,y1,…]
    */
  def parseGeoText(pgType: String, text: String): Array[Double] = {
    val nums = numbersOf(text)
    pgType.toLowerCase match {
      case "point" =>
        require(nums.length == 2, s"point needs 2 coords: $text"); nums
      case "line" =>
        require(nums.length == 3, s"line needs 3 coefficients: $text"); nums
      case "circle" =>
        require(nums.length == 3, s"circle needs (x,y),r: $text"); nums
      case "box" | "lseg" =>
        require(nums.length == 4, s"$pgType needs 4 coords: $text"); nums
      case "path" =>
        // open paths print as [(…)], closed as ((…)) — the reference
        // prepends [open, n] (postgres.rs path decoder)
        val open = if (text.trim.startsWith("[")) 1.0 else 0.0
        Array(open, nums.length / 2.0) ++ nums
      case "polygon" => nums
      case other =>
        throw new IllegalArgumentException(s"not a geometric type: $other")
    }
  }

  private def numbersOf(text: String): Array[Double] =
    "[-+]?[0-9]*\\.?[0-9]+(?:[eE][-+]?[0-9]+)?".r
      .findAllIn(text).map(_.toDouble).toArray
}
