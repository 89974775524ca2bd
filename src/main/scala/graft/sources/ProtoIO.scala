package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Protobuf source/sink — the reference parses protobuf rows natively
  * against a .proto schema (`src/Processors/Formats/Impl/
  * ProtobufRowInputFormat.cpp`). No protobuf-java ships in this
  * environment, so the wire format is implemented directly from the
  * PUBLIC protobuf encoding spec (protobuf.dev/programming-guides/
  * encoding): varint (wire type 0) for integer fields, fixed64 (wire
  * type 1) for doubles, length-delimited (wire type 2) for strings.
  * Column `i` maps to field number `i + 1`; a NULL cell is an absent
  * field (and every present value is written explicitly, including
  * proto3 defaults, so absence decodes unambiguously to NULL).
  *
  * Stream framing is the standard delimited form (varint message length
  * + message bytes — protobuf-java's writeDelimitedTo). One file per
  * partition on write, file-parallel streaming decode on read; per-task
  * memory is one row.
  */
object ProtoIO {

  // ---- varint ---------------------------------------------------------

  private def writeVarint(out: java.io.OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def readVarint(in: java.io.InputStream): Long = {
    var shift = 0
    var result = 0L
    while (shift < 64) {
      val b = in.read()
      if (b < 0) throw new java.io.EOFException("ProtoIO: truncated varint")
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    throw new java.io.IOException("ProtoIO: varint too long")
  }

  // ---- encoder --------------------------------------------------------

  private def encodeRow(row: Row, fields: Array[StructField]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i < fields.length) {
      if (!row.isNullAt(i)) {
        val fieldNum = i + 1
        fields(i).dataType match {
          case LongType =>
            writeVarint(buf, (fieldNum << 3) | 0) // wire type 0
            writeVarint(buf, row.getLong(i))
          case IntegerType =>
            writeVarint(buf, (fieldNum << 3) | 0)
            writeVarint(buf, row.getInt(i).toLong) // int32: sign-extended varint
          case DoubleType =>
            writeVarint(buf, (fieldNum << 3) | 1) // wire type 1 (fixed64)
            val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
            var b = 0
            while (b < 8) { buf.write(((bits >>> (8 * b)) & 0xff).toInt); b += 1 }
          case StringType =>
            writeVarint(buf, (fieldNum << 3) | 2) // wire type 2
            val s = row.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            writeVarint(buf, s.length.toLong)
            buf.write(s)
          case t => throw new IllegalArgumentException(s"ProtoIO: unsupported $t")
        }
      }
      i += 1
    }
    buf.toByteArray
  }

  /** Write `df` as one delimited-protobuf stream file per partition. */
  def write(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        new java.io.File(dir, f"part-$i%05d.pb")))
      try rows.foreach { row =>
        val msg = encodeRow(row, fields)
        writeVarint(out, msg.length.toLong)
        out.write(msg)
      }
      finally out.close()
      Iterator.single(i)
    }.count(): Unit
  }

  // ---- decoder --------------------------------------------------------

  private def decodeRow(msg: Array[Byte], fields: Array[StructField]): Row = {
    val in = new java.io.ByteArrayInputStream(msg)
    val vs = new Array[Any](fields.length) // absent fields stay null
    while (in.available() > 0) {
      val tag = readVarint(in)
      val fieldNum = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      val idx = fieldNum - 1
      val dt = if (idx >= 0 && idx < fields.length) fields(idx).dataType
               else NullType // unknown field: skip by wire type
      wireType match {
        case 0 =>
          val v = readVarint(in)
          dt match {
            case LongType    => vs(idx) = v
            case IntegerType => vs(idx) = v.toInt
            case _           => // skipped
          }
        case 1 =>
          var bits = 0L
          var b = 0
          while (b < 8) {
            val x = in.read()
            if (x < 0) throw new java.io.EOFException("ProtoIO: truncated fixed64")
            bits |= (x & 0xffL) << (8 * b); b += 1
          }
          if (dt == DoubleType) vs(idx) = java.lang.Double.longBitsToDouble(bits)
        case 2 =>
          val len = readVarint(in).toInt
          val s = new Array[Byte](len)
          var off = 0
          while (off < len) {
            val n = in.read(s, off, len - off)
            if (n < 0) throw new java.io.EOFException("ProtoIO: truncated bytes")
            off += n
          }
          if (dt == StringType)
            vs(idx) = new String(s, java.nio.charset.StandardCharsets.UTF_8)
        case w => throw new java.io.IOException(s"ProtoIO: wire type $w unsupported")
      }
    }
    Row.fromSeq(vs.toIndexedSeq)
  }

  /** Read a ProtoIO-written directory back with `schema`. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = RowBinaryIO.listPartFiles(path, ".pb")
    val fields = schema.fields
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
        RowBinaryIO.closeOnTaskEnd(in)
        new Iterator[Row] {
          private var nextLen = -2
          private def peek(): Unit = if (nextLen == -2) {
            val first = in.read()
            if (first < 0) { in.close(); nextLen = -1 }
            else {
              // first varint byte already consumed — finish it
              var result = (first & 0x7fL)
              var shift = 7
              var b = first
              while ((b & 0x80) != 0) {
                b = in.read()
                if (b < 0) throw new java.io.EOFException(
                  "ProtoIO: EOF inside length varint")
                result |= (b & 0x7fL) << shift
                shift += 7
              }
              nextLen = result.toInt
            }
          }
          override def hasNext: Boolean = { peek(); nextLen >= 0 }
          override def next(): Row = {
            peek()
            val msg = new Array[Byte](nextLen)
            var off = 0
            while (off < nextLen) {
              val n = in.read(msg, off, nextLen - off)
              if (n < 0) throw new java.io.EOFException("ProtoIO: truncated message")
              off += n
            }
            nextLen = -2
            decodeRow(msg, fields)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
