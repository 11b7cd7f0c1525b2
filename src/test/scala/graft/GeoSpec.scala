package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Geo

/** Synthetic-EWKB decode tests for the geo conventions — the sandbox
  * counterpart of the reference's golden PostGIS test
  * (conecta-python/conecta/tests/databases/test_postgres.py:13-31): the
  * byte layouts are constructed here exactly as PostGIS emits them
  * (endianness byte, type word with optional SRID flag, coordinates) and
  * must decode into the documented ArrayType(Double) encodings. */
class GeoSpec extends AnyFunSuite {

  private def ewkb(order: ByteOrder, geoType: Int, srid: Option[Int],
      payload: ByteBuffer => Unit): Array[Byte] = {
    val buf = ByteBuffer.allocate(1024).order(order)
    buf.put(if (order == ByteOrder.BIG_ENDIAN) 0.toByte else 1.toByte)
    buf.putInt(geoType | srid.map(_ => 0x20000000).getOrElse(0))
    srid.foreach(buf.putInt)
    payload(buf)
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  test("EWKB point decodes to [x,y] in both endiannesses") {
    for (order <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val bytes = ewkb(order, 1, None, b => { b.putDouble(1.5); b.putDouble(-2.25) })
      assert(Geo.decodeEwkb(bytes).toSeq == Seq(1.5, -2.25), order.toString)
    }
  }

  test("EWKB point with SRID flag skips the SRID word") {
    val bytes = ewkb(ByteOrder.LITTLE_ENDIAN, 1, Some(4326),
      b => { b.putDouble(7.0); b.putDouble(8.0) })
    assert(Geo.decodeEwkb(bytes).toSeq == Seq(7.0, 8.0))
  }

  test("EWKB linestring flattens coordinate pairs in order") {
    val bytes = ewkb(ByteOrder.LITTLE_ENDIAN, 2, None, { b =>
      b.putInt(3)
      Seq(0.0, 0.0, 1.0, 1.0, 2.0, 4.0).foreach(b.putDouble)
    })
    assert(Geo.decodeEwkb(bytes).toSeq == Seq(0.0, 0.0, 1.0, 1.0, 2.0, 4.0))
  }

  test("EWKB polygon flattens its rings; closed ring round-trips") {
    val ring = Seq(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 0.0)
    val bytes = ewkb(ByteOrder.BIG_ENDIAN, 3, Some(3857), { b =>
      b.putInt(1); b.putInt(4); ring.foreach(b.putDouble)
    })
    assert(Geo.decodeEwkb(bytes).toSeq == ring)
  }

  test("EWKB rejects Z/M dimensions and unknown types loudly") {
    val z = ewkb(ByteOrder.LITTLE_ENDIAN, 1 | 0x80000000, None,
      b => Seq(1.0, 2.0, 3.0).foreach(b.putDouble))
    assertThrows[IllegalArgumentException](Geo.decodeEwkb(z))
    val multi = ewkb(ByteOrder.LITTLE_ENDIAN, 4, None, b => b.putInt(0))
    assertThrows[IllegalArgumentException](Geo.decodeEwkb(multi))
  }

  test("native geometric text forms parse to the documented encodings") {
    assert(Geo.parseGeoText("point", "(1.5,2.5)").toSeq == Seq(1.5, 2.5))
    assert(Geo.parseGeoText("line", "{1,-2,3.5}").toSeq == Seq(1.0, -2.0, 3.5))
    assert(Geo.parseGeoText("circle", "<(0,1),5>").toSeq == Seq(0.0, 1.0, 5.0))
    assert(Geo.parseGeoText("box", "(3,4),(1,2)").toSeq == Seq(3.0, 4.0, 1.0, 2.0))
    assert(Geo.parseGeoText("lseg", "[(0,0),(2,2)]").toSeq == Seq(0.0, 0.0, 2.0, 2.0))
    assert(Geo.parseGeoText("polygon", "((0,0),(1,0),(1,1))").toSeq ==
      Seq(0.0, 0.0, 1.0, 0.0, 1.0, 1.0))
    // path: open prints [(…)], closed ((…)); encoding prepends [open, n]
    assert(Geo.parseGeoText("path", "[(0,0),(1,1)]").toSeq ==
      Seq(1.0, 2.0, 0.0, 0.0, 1.0, 1.0))
    assert(Geo.parseGeoText("path", "((0,0),(1,1),(2,0))").toSeq ==
      Seq(0.0, 3.0, 0.0, 0.0, 1.0, 1.0, 2.0, 0.0))
  }

  test("scientific-notation coordinates survive parsing") {
    assert(Geo.parseGeoText("point", "(1e3,-2.5E-2)").toSeq == Seq(1000.0, -0.025))
  }

  test("property: random geometries round-trip through EWKB exactly") {
    // generator-driven encode→decode identity over random coordinate
    // lists, both endiannesses, with/without SRID (same raw-Gen pattern
    // as PartitionPropSpec — the scalatestplus bridge is offline)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    val coord = Gen.chooseNum(-1e6, 1e6)
    val geomGen = for {
      kind <- Gen.oneOf(1, 2, 3)
      nPts <- Gen.chooseNum(1, 40)
      pts <- Gen.listOfN(nPts * 2, coord)
      big <- Gen.oneOf(true, false)
      srid <- Gen.option(Gen.chooseNum(1, 999999))
    } yield (kind, pts, big, srid)
    samples(geomGen, 300).foreach { case (kind, pts, big, srid) =>
      val order = if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      val coords = if (kind == 1) pts.take(2) else pts
      val bytes = ewkb(order, kind, srid, { b =>
        if (kind == 2) b.putInt(coords.length / 2)
        if (kind == 3) { b.putInt(1); b.putInt(coords.length / 2) }
        coords.foreach(b.putDouble)
      })
      assert(Geo.decodeEwkb(bytes).toSeq == coords,
        s"kind=$kind n=${coords.length} big=$big srid=$srid")
    }
  }
}
