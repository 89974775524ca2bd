package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** RowBinary source/sink — the reference's compact binary row format
  * (`src/Processors/Formats/Impl/BinaryRowInputFormat.cpp`: each row is
  * the per-column `deserializeBinary` concatenation, no framing). Wire
  * layout per the public format docs: fixed-width little-endian numerics
  * (Int32/Int64/Float64), String = varUInt (LEB128) byte length + UTF-8
  * bytes, Nullable(T) = one flag byte (1 = NULL, 0 = value follows).
  * The `WithNamesAndTypes` header variant (varUInt column count + name
  * strings + type strings, `BinaryRowInputFormat.cpp:29-55`) is written
  * so files are self-describing; the reader skips it the same way the
  * reference does.
  *
  * File layout matches the row-format family here: one
  * `part-N.rowbinary` per partition; reads parallelize over files and
  * stream one row at a time — nothing funnels through the driver.
  */
object RowBinaryIO {

  private[sources] def chType(dt: DataType): String = dt match {
    case LongType    => "Int64"
    case IntegerType => "Int32"
    case DoubleType  => "Float64"
    case StringType  => "String"
    case t => throw new IllegalArgumentException(s"RowBinaryIO: unsupported $t")
  }


  /** List the part files of a row-format directory, failing descriptively
    * on a missing/non-directory path (File.listFiles returns null there,
    * which would otherwise surface as an opaque NPE in the caller). */
  private[sources] def listPartFiles(path: String, suffix: String): Seq[String] = {
    val dir = new java.io.File(path)
    val files = dir.listFiles()
    if (files == null)
      throw new java.io.FileNotFoundException(
        s"$path is not a readable directory (expected *$suffix part files)")
    files.filter(_.getName.endsWith(suffix)).map(_.getAbsolutePath).toSeq
  }

  /** Register stream close on task completion — early-terminated scans
    * (limit/take) abandon decode iterators before EOF, and the
    * close-at-EOF path alone would leak one handle per such task. */
  private[sources] def closeOnTaskEnd(c: java.io.Closeable): Unit =
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ =>
        try c.close() catch { case _: java.io.IOException => () }))

  // ---- primitives (LE on a DataOutputStream, which is BE-native) ----

  private[sources] def writeVarUInt(out: java.io.OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private[sources] def readVarUInt(in: java.io.InputStream): Long = {
    var v = 0L; var shift = 0
    while (true) {
      if (shift >= 64)
        throw new java.io.IOException("RowBinaryIO: varUInt longer than 64 bits (corrupt stream)")
      val b = in.read()
      if (b < 0) throw new java.io.EOFException("RowBinaryIO: EOF in varUInt")
      // At shift 63 only the low bit of this byte still fits in 64 bits;
      // any higher payload bit would be silently shifted out — reject the
      // encoding as corrupt rather than decode a truncated value.
      if (shift == 63 && (b & 0x7e) != 0)
        throw new java.io.IOException("RowBinaryIO: varUInt overflows 64 bits (corrupt stream)")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    v
  }

  // Fixed-width values move through a per-thread scratch array so each
  // costs ONE buffered-stream call, not one per byte: BufferedInput/
  // OutputStream's single-byte methods are synchronized, and the r16
  // stage probe showed the format codecs spending their time in ~24M
  // such calls per 600k-row pass. Byte layout on the wire is identical.
  private val scratch8 = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8)
  }

  private[sources] def writeLongLE(out: java.io.OutputStream, v: Long): Unit = {
    val b = scratch8.get()
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out.write(b, 0, 8)
  }

  private[sources] def writeIntLE(out: java.io.OutputStream, v: Int): Unit = {
    val b = scratch8.get()
    var i = 0
    while (i < 4) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out.write(b, 0, 4)
  }

  private def readFully(in: java.io.InputStream, b: Array[Byte], len: Int,
                        what: String): Unit = {
    var off = 0
    while (off < len) {
      val n = in.read(b, off, len - off)
      if (n < 0) throw new java.io.EOFException(s"RowBinaryIO: EOF in $what")
      off += n
    }
  }

  private[sources] def readLongLE(in: java.io.InputStream): Long = {
    val b = scratch8.get()
    readFully(in, b, 8, "Int64")
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private[sources] def readIntLE(in: java.io.InputStream): Int = {
    val b = scratch8.get()
    readFully(in, b, 4, "Int32")
    var v = 0; var i = 0
    while (i < 4) { v |= (b(i) & 0xff) << (8 * i); i += 1 }
    v
  }

  private[sources] def writeString(out: java.io.OutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarUInt(out, b.length.toLong)
    out.write(b)
  }

  private[sources] def readString(in: java.io.InputStream): String = {
    val len = readVarUInt(in).toInt
    val b = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(b, off, len - off)
      if (n < 0) throw new java.io.EOFException("RowBinaryIO: EOF in String")
      off += n
    }
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  // ---- row codec ----------------------------------------------------

  private def writeRow(out: java.io.OutputStream, row: Row,
                       fields: Array[StructField]): Unit = {
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      if (f.nullable) out.write(if (row.isNullAt(i)) 1 else 0)
      else require(!row.isNullAt(i), s"RowBinaryIO: null in non-nullable ${f.name}")
      if (!row.isNullAt(i)) f.dataType match {
        case LongType    => writeLongLE(out, row.getLong(i))
        case IntegerType => writeIntLE(out, row.getInt(i))
        case DoubleType  => writeLongLE(out,
          java.lang.Double.doubleToLongBits(row.getDouble(i)))
        case StringType  => writeString(out, row.getString(i))
        case t => throw new IllegalArgumentException(s"RowBinaryIO: unsupported $t")
      }
      i += 1
    }
  }

  private def readValue(in: java.io.InputStream, dt: DataType): Any = dt match {
    case LongType    => readLongLE(in)
    case IntegerType => readIntLE(in)
    case DoubleType  => java.lang.Double.longBitsToDouble(readLongLE(in))
    case StringType  => readString(in)
    case t => throw new IllegalArgumentException(s"RowBinaryIO: unsupported $t")
  }

  /** Write `df` under `path`, one RowBinaryWithNamesAndTypes stream per
    * partition. */
  def write(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        new java.io.File(dir, f"part-$i%05d.rowbinary")))
      // WithNamesAndTypes prefix: varUInt n, then names, then CH types
      // (Nullable(T) wrapping mirrors the Spark-side nullability so the
      // flag bytes are self-describing).
      writeVarUInt(out, fields.length.toLong)
      fields.foreach(f => writeString(out, f.name))
      fields.foreach { f =>
        val t = chType(f.dataType)
        writeString(out, if (f.nullable) s"Nullable($t)" else t)
      }
      try rows.foreach(writeRow(out, _, fields))
      finally out.close()
      Iterator.single(i)
    }.count(): Unit
  }

  /** Read a RowBinaryIO-written directory back with `schema`, one task
    * per file, streaming rows (the header is read and checked against
    * the expected column count, then skipped — reference
    * `BinaryRowInputFormat::readPrefix`). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = listPartFiles(path, ".rowbinary")
    val fields = schema.fields
    val n = fields.length
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
        closeOnTaskEnd(in)
        val cols = readVarUInt(in).toInt
        require(cols == n, s"RowBinaryIO: header says $cols columns, expected $n")
        var k = 0
        while (k < 2 * cols) { readString(in); k += 1 }   // names + types
        new Iterator[Row] {
          private var nextByte = { in.mark(1); in.read() }
          override def hasNext: Boolean = {
            if (nextByte < 0) in.close()
            nextByte >= 0
          }
          override def next(): Row = {
            in.reset()                                     // un-consume probe byte
            val vs = new Array[Any](n)
            var i = 0
            while (i < n) {
              val f = fields(i)
              val isNull = f.nullable && in.read() == 1
              vs(i) = if (isNull) null else readValue(in, f.dataType)
              i += 1
            }
            in.mark(1); nextByte = in.read()
            Row.fromSeq(vs.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
