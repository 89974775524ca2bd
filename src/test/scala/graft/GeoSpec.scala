package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeoAlgos

/** Geohash vectors + properties. The two string vectors are the public
  * Niemeyer examples (geohash.org); the grid property checks that decode
  * lands inside the encoded cell at every precision.
  */
class GeoSpec extends AnyFunSuite {

  test("geohashEncode matches the public vectors") {
    assert(GeoAlgos.geohashEncode(-5.6, 42.6, 5).toString == "ezs42")
    assert(GeoAlgos.geohashEncode(10.40744, 57.64911, 11).toString ==
      "u4pruydqqvj")
  }

  test("decode(encode(p)) stays within the cell at precisions 1..12") {
    for {
      lon <- Seq(-179.9, -60.3, -0.1, 0.0, 45.7, 179.9)
      lat <- Seq(-89.9, -30.2, 0.0, 12.34, 89.9)
      p <- 1 to 12
    } {
      val gh = GeoAlgos.geohashEncode(lon, lat, p)
      val dec = GeoAlgos.geohashDecode(gh)
      val (dLon, dLat) = (dec.getDouble(0), dec.getDouble(1))
      // cell half-widths: lon gets ceil(5p/2) bits, lat floor(5p/2)
      val lonBits = (5 * p + 1) / 2
      val latBits = 5 * p / 2
      assert(math.abs(dLon - lon) <= 360.0 / (1L << lonBits) / 2 + 1e-12,
        s"lon $lon p$p gh=$gh dec=$dLon")
      assert(math.abs(dLat - lat) <= 180.0 / (1L << latBits) / 2 + 1e-12,
        s"lat $lat p$p gh=$gh dec=$dLat")
    }
  }

  test("geohashDecode returns null on invalid characters") {
    assert(GeoAlgos.geohashDecode(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab!c")) == null)
  }
}
