package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** MessagePack source/sink — the reference parses MsgPack rows natively
  * (`src/Processors/Formats/Impl/MsgPackRowInputFormat.cpp`, each row one
  * msgpack array of column values). No msgpack library ships in this
  * environment, so the wire format is implemented directly from the
  * PUBLIC MessagePack spec (msgpack.org, spec v5): this codec covers the
  * subset the flat test schemas need — nil, int family (fixint/int8-64/
  * uint8-32), float64, str (fixstr/str8/16/32) and array (fixarray/
  * array16) headers.
  *
  * File layout matches the row formats family: one `part-N.msgpack` per
  * partition, each a standard concatenated msgpack stream of row arrays;
  * reads parallelize over files and stream-decode — per-task memory is
  * one row, nothing funnels through the driver.
  */
object MsgPackIO {

  // ---- encoder ------------------------------------------------------

  private def packLong(out: java.io.DataOutputStream, v: Long): Unit = {
    if (v >= 0) {
      if (v < 0x80L) out.writeByte(v.toInt)                        // pos fixint
      else if (v < 0x100L) { out.writeByte(0xcc); out.writeByte(v.toInt) }
      else if (v < 0x10000L) { out.writeByte(0xcd); out.writeShort(v.toInt) }
      else if (v < 0x100000000L) { out.writeByte(0xce); out.writeInt(v.toInt) }
      else { out.writeByte(0xd3); out.writeLong(v) }               // int64
    } else {
      if (v >= -32) out.writeByte(0xe0 | (v.toInt & 0x1f))         // neg fixint
      else if (v >= Byte.MinValue) { out.writeByte(0xd0); out.writeByte(v.toInt) }
      else if (v >= Short.MinValue) { out.writeByte(0xd1); out.writeShort(v.toInt) }
      else if (v >= Int.MinValue) { out.writeByte(0xd2); out.writeInt(v.toInt) }
      else { out.writeByte(0xd3); out.writeLong(v) }
    }
  }

  private def packString(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (b.length < 32) out.writeByte(0xa0 | b.length)              // fixstr
    else if (b.length < 0x100) { out.writeByte(0xd9); out.writeByte(b.length) }
    else if (b.length < 0x10000) { out.writeByte(0xda); out.writeShort(b.length) }
    else { out.writeByte(0xdb); out.writeInt(b.length) }
    out.write(b)
  }

  private def packRow(out: java.io.DataOutputStream, row: Row,
                      fields: Array[StructField]): Unit = {
    val n = fields.length
    require(n < 16, "MsgPackIO: fixarray rows only (<16 columns)")
    out.writeByte(0x90 | n)                                        // fixarray
    var i = 0
    while (i < n) {
      if (row.isNullAt(i)) out.writeByte(0xc0)                     // nil
      else fields(i).dataType match {
        case LongType    => packLong(out, row.getLong(i))
        case IntegerType => packLong(out, row.getInt(i).toLong)
        case DoubleType  => out.writeByte(0xcb); out.writeDouble(row.getDouble(i))
        case StringType  => packString(out, row.getString(i))
        case t => throw new IllegalArgumentException(s"MsgPackIO: unsupported $t")
      }
      i += 1
    }
  }

  /** Write `df` as one msgpack stream file per partition under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(
          new java.io.File(dir, f"part-$i%05d.msgpack"))))
      try rows.foreach(packRow(out, _, fields))
      finally out.close()
      Iterator.single(i)
    }.count(): Unit
  }

  // ---- decoder ------------------------------------------------------

  private def unpackValue(in: java.io.DataInputStream, dt: DataType): Any = {
    val b = in.readUnsignedByte()
    val raw: Any =
      if (b < 0x80) b.toLong                                       // pos fixint
      else if (b >= 0xe0) (b - 0x100).toLong                       // neg fixint
      else if ((b & 0xe0) == 0xa0) readStr(in, b & 0x1f)           // fixstr
      else b match {
        case 0xc0 => null
        case 0xc2 => false
        case 0xc3 => true
        case 0xcc => in.readUnsignedByte().toLong
        case 0xcd => in.readUnsignedShort().toLong
        case 0xce => in.readInt().toLong & 0xFFFFFFFFL
        case 0xcf => in.readLong()                                 // uint64 (as long)
        case 0xd0 => in.readByte().toLong
        case 0xd1 => in.readShort().toLong
        case 0xd2 => in.readInt().toLong
        case 0xd3 => in.readLong()
        case 0xca => in.readFloat().toDouble
        case 0xcb => in.readDouble()
        case 0xd9 => readStr(in, in.readUnsignedByte())
        case 0xda => readStr(in, in.readUnsignedShort())
        case 0xdb => readStr(in, in.readInt())
        case x => throw new java.io.IOException(
          f"MsgPackIO: unsupported type byte 0x$x%02x")
      }
    (raw, dt) match {
      case (null, _)            => null
      case (v: Long, LongType)  => v
      case (v: Long, IntegerType) => v.toInt
      case (v: Long, DoubleType)  => v.toDouble
      case (v: Double, DoubleType) => v
      case (v: String, StringType) => v
      case (v, t) => throw new java.io.IOException(
        s"MsgPackIO: $v does not fit $t")
    }
  }

  private def readStr(in: java.io.DataInputStream, len: Int): String = {
    val b = new Array[Byte](len)
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Read a MsgPackIO-written directory back with `schema`, one task per
    * file, streaming rows. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = RowBinaryIO.listPartFiles(path, ".msgpack")
    val fields = schema.fields
    val n = fields.length
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(f)))
        RowBinaryIO.closeOnTaskEnd(in)
        new Iterator[Row] {
          private var nextByte = in.read()
          override def hasNext: Boolean = {
            if (nextByte < 0) in.close()
            nextByte >= 0
          }
          override def next(): Row = {
            val header = nextByte
            require((header & 0xf0) == 0x90 && (header & 0x0f) == n,
              f"MsgPackIO: expected $n-col fixarray row, got 0x$header%02x")
            val vs = new Array[Any](n)
            var i = 0
            while (i < n) { vs(i) = unpackValue(in, fields(i).dataType); i += 1 }
            nextByte = in.read()
            Row.fromSeq(vs.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
