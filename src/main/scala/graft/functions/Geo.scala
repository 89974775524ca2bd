package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geo functions — daisy `geohashEncode`/`geohashDecode`
  * (`src/Functions/geohashEncode.cpp`, `geohashDecode.cpp`, bit logic in
  * `src/Functions/GeoHash.cpp`) and `pointInPolygon`
  * (`src/Functions/pointInPolygon.cpp`).
  *
  * Geohash is the public Niemeyer base32 interleaved-bit encoding — the
  * same algorithm the reference implements; it can't be composed from
  * Spark builtins (per-bit binary search + 5-bit repack), so it's a
  * codegen'd Catalyst expression over a static kernel, like the hash
  * family. pointInPolygon CAN be composed: the reference only accepts a
  * CONSTANT polygon (it precomputes a cell index over it), and with a
  * constant polygon each ray-casting edge test is a plain codegen'd
  * comparison — see [[GeoAlgos.pointInPolygonColumn]]. No custom node,
  * full Tungsten codegen, vectorizes over any table size.
  */
object GeoAlgos {

  private final val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Niemeyer geohash of (lon, lat) at `precision` chars (1..12). */
  def geohashEncode(lon: Double, lat: Double, precision: Int): UTF8String = {
    val p = math.max(1, math.min(12, precision))
    val out = new Array[Byte](p)
    var lonMin = -180.0; var lonMax = 180.0
    var latMin = -90.0; var latMax = 90.0
    var even = true // even bit index = longitude bit
    var ch = 0; var bit = 0; var i = 0
    while (i < p) {
      if (even) {
        val mid = (lonMin + lonMax) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonMin = mid }
        else { ch = ch << 1; lonMax = mid }
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latMin = mid }
        else { ch = ch << 1; latMax = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) {
        out(i) = Base32.charAt(ch).toByte
        i += 1; bit = 0; ch = 0
      }
    }
    UTF8String.fromBytes(out)
  }

  /** Decode a geohash to its cell-center [lon, lat] (the reference's
    * geohashDecode midpoint convention); null on an invalid character. */
  def geohashDecode(gh: UTF8String): ArrayData = {
    val s = gh.toString.toLowerCase
    var lonMin = -180.0; var lonMax = 180.0
    var latMin = -90.0; var latMax = 90.0
    var even = true
    var i = 0
    while (i < s.length) {
      val v = Base32.indexOf(s.charAt(i))
      if (v < 0) return null
      var b = 4
      while (b >= 0) {
        val bitSet = ((v >> b) & 1) == 1
        if (even) {
          val mid = (lonMin + lonMax) / 2
          if (bitSet) lonMin = mid else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (bitSet) latMin = mid else latMax = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    new GenericArrayData(Array[Any]((lonMin + lonMax) / 2, (latMin + latMax) / 2))
  }

  /** geohashesInBox (reference `src/Functions/geohashesInBox.cpp`): all
    * precision-`p` geohash cells whose area intersects
    * [lonMin,lonMax)×[latMin,latMax), row-major from the south-west
    * corner. Cell walk is over the aligned grid (lon gets ceil(5p/2)
    * bits, lat floor(5p/2)); output capped like the reference to keep a
    * bad box from materializing millions of cells. */
  def geohashesInBox(lonMin: Double, latMin: Double, lonMax: Double,
                     latMax: Double, precision: Int,
                     cap: Int = 65536): ArrayData = {
    val p = math.max(1, math.min(12, precision))
    val lonBits = (5 * p + 1) / 2
    val latBits = 5 * p / 2
    val lonStep = 360.0 / (1L << lonBits)
    val latStep = 180.0 / (1L << latBits)
    if (lonMax <= lonMin || latMax <= latMin) return new GenericArrayData(Array.empty[Any])
    // Clamp to the grid on BOTH ends: a box reaching past ±180/±90 would
    // otherwise walk negative (or past-the-edge) indices and emit
    // saturated garbage cells (geohashEncode silently clamps coords).
    val i0 = math.max(0L, math.floor((lonMin + 180.0) / lonStep).toLong)
    val i1 = math.min(math.ceil((lonMax + 180.0) / lonStep).toLong - 1, (1L << lonBits) - 1)
    val j0 = math.max(0L, math.floor((latMin + 90.0) / latStep).toLong)
    val j1 = math.min(math.ceil((latMax + 90.0) / latStep).toLong - 1, (1L << latBits) - 1)
    if (i1 < i0 || j1 < j0) return new GenericArrayData(Array.empty[Any])
    val count = (i1 - i0 + 1) * (j1 - j0 + 1)
    require(count <= cap, s"geohashes_in_box: $count cells exceeds cap $cap")
    val out = new Array[Any](count.toInt)
    var n = 0
    var j = j0
    while (j <= j1) {
      var i = i0
      while (i <= i1) {
        out(n) = geohashEncode(-180.0 + (i + 0.5) * lonStep,
          -90.0 + (j + 0.5) * latStep, p)
        n += 1; i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Ray-casting point-in-polygon over a CONSTANT polygon, composed from
    * builtin codegen'd expressions: one half-open crossing test per edge
    * (Franklin's PNPOLY rule — boundary membership follows the half-open
    * convention), XOR-folded as a sum-mod-2. */
  def pointInPolygonColumn(px: Column, py: Column,
                           poly: Seq[(Double, Double)]): Column = {
    require(poly.size >= 3, "polygon needs >= 3 vertices")
    val crossings = poly.indices.map { i =>
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % poly.size)
      // (y1 > py) != (y2 > py) && px < (py-y1)*(x2-x1)/(y2-y1) + x1;
      // multiply-then-divide matches the SQL oracle's association so
      // both sides produce bit-identical doubles near edges.
      (((lit(y1) > py) =!= (lit(y2) > py)) &&
        (px < (py - lit(y1)) * lit(x2 - x1) / lit(y2 - y1) + lit(x1)))
        .cast("int")
    }
    (crossings.reduce(_ + _) % 2) === 1
  }
}

/** geohashEncode(lon, lat) at a fixed precision — codegen'd. */
case class GeohashEncodeExpr(left: Expression, right: Expression,
                             precision: Int) extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"geohash_encode requires (double, double), got $t")
    }

  override def nullSafeEval(lon: Any, lat: Any): Any =
    GeoAlgos.geohashEncode(lon.asInstanceOf[Double],
      lat.asInstanceOf[Double], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat) =>
      s"${ev.value} = graft.functions.GeoAlgos.geohashEncode($lon, $lat, $precision);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeohashEncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** geohashesInBox(lonMin, latMin, lonMax, latMax) at a fixed precision —
  * returns array<string> of covering cells. Interpreted eval
  * (CodegenFallback): the output is a per-row ARRAY built in a loop with
  * data-dependent size, which whole-stage codegen cannot inline anyway —
  * and the function sits in query setup (box → cell list → join/prune),
  * never in a per-row hot path. */
case class GeohashesInBoxExpr(children: Seq[Expression], precision: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size == 4 && children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "geohashes_in_box requires (double, double, double, double)")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else GeoAlgos.geohashesInBox(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double], precision)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeohashesInBoxExpr =
    copy(children = newChildren)
}

/** geohashDecode(s) → array(lon, lat) cell center — codegen'd. */
case class GeohashDecodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"geohash_decode requires string, got $t")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(gh: Any): Any =
    GeoAlgos.geohashDecode(gh.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, gh => s"""
      ${ev.value} = graft.functions.GeoAlgos.geohashDecode($gh);
      ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(newChild: Expression): GeohashDecodeExpr =
    copy(child = newChild)
}
