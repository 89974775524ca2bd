package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import RowBinaryIO.{chType, readIntLE, readLongLE, readString, readVarUInt,
  writeIntLE, writeLongLE, writeString, writeVarUInt}

/** Native format — the reference's columnar block wire format, used for
  * inter-server transport and `clickhouse-client` bulk I/O
  * (`src/DataStreams/NativeBlockOutputStream.cpp:77-122`): per block,
  * varUInt column count + varUInt row count, then per column its name
  * string, its type name string, and the column BODY laid out
  * column-contiguously — fixed-width LE arrays for numerics, per-value
  * varUInt-length strings, and for Nullable(T) a leading null-mask byte
  * vector followed by the T body with default values in null slots.
  *
  * The columnar body is what distinguishes Native from RowBinary: a
  * reader can skip whole columns without parsing rows (the same reason
  * the engine's processing is columnar). One file per partition, each
  * one block per 65 536 rows (the reference's default block size);
  * reads parallelize over files and decode block-at-a-time — per-task
  * memory is one block, not the file.
  */
object NativeIO {

  private val BlockRows = 65536

  // ---- write --------------------------------------------------------

  private def writeBlock(out: java.io.OutputStream, rows: Array[Row],
                         fields: Array[StructField]): Unit = {
    writeVarUInt(out, fields.length.toLong)
    writeVarUInt(out, rows.length.toLong)
    var c = 0
    while (c < fields.length) {
      val f = fields(c)
      writeString(out, f.name)
      val t = chType(f.dataType)
      writeString(out, if (f.nullable) s"Nullable($t)" else t)
      if (f.nullable) {
        // one buffered write per block, not one synchronized call per row
        val mask = new Array[Byte](rows.length)
        var r = 0
        while (r < rows.length) {
          mask(r) = if (rows(r).isNullAt(c)) 1 else 0; r += 1
        }
        out.write(mask)
      }
      var r = 0
      while (r < rows.length) {
        val row = rows(r)
        val isNull = row.isNullAt(c)
        f.dataType match {
          case LongType    => writeLongLE(out, if (isNull) 0L else row.getLong(c))
          case IntegerType => writeIntLE(out, if (isNull) 0 else row.getInt(c))
          case DoubleType  => writeLongLE(out, if (isNull) 0L
            else java.lang.Double.doubleToLongBits(row.getDouble(c)))
          case StringType  => writeString(out, if (isNull) "" else row.getString(c))
          case t2 => throw new IllegalArgumentException(s"NativeIO: unsupported $t2")
        }
        r += 1
      }
      c += 1
    }
  }

  /** Write `df` under `path`, one Native block stream per partition. */
  def write(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        new java.io.File(dir, f"part-$i%05d.native")))
      try rows.grouped(BlockRows)
        .foreach(g => writeBlock(out, g.toArray, fields))
      finally out.close()
      Iterator.single(i)
    }.count(): Unit
  }

  // ---- read ---------------------------------------------------------

  /** Decode one block into rows; None at clean EOF. */
  private def readBlock(in: java.io.BufferedInputStream,
                        fields: Array[StructField]): Option[Array[Row]] = {
    in.mark(1)
    if (in.read() < 0) return None
    in.reset()
    val ncols = readVarUInt(in).toInt
    require(ncols == fields.length,
      s"NativeIO: block has $ncols columns, expected ${fields.length}")
    val nrows = readVarUInt(in).toInt
    val cols = new Array[Array[Any]](ncols)
    var c = 0
    while (c < ncols) {
      val f = fields(c)
      val name = readString(in)
      require(name == f.name, s"NativeIO: column '$name', expected '${f.name}'")
      val typeName = readString(in)
      val nullable = typeName.startsWith("Nullable(")
      val mask = new Array[Boolean](nrows)
      if (nullable) {
        val mb = new Array[Byte](nrows)
        var off = 0
        while (off < nrows) {
          val n = in.read(mb, off, nrows - off)
          if (n < 0) throw new java.io.EOFException("NativeIO: EOF in null mask")
          off += n
        }
        var r = 0
        while (r < nrows) { mask(r) = mb(r) == 1; r += 1 }
      }
      val vals = new Array[Any](nrows)
      var r = 0
      while (r < nrows) {
        val v: Any = f.dataType match {
          case LongType    => readLongLE(in)
          case IntegerType => readIntLE(in)
          case DoubleType  => java.lang.Double.longBitsToDouble(readLongLE(in))
          case StringType  => readString(in)
          case t2 => throw new IllegalArgumentException(s"NativeIO: unsupported $t2")
        }
        vals(r) = if (mask(r)) null else v
        r += 1
      }
      cols(c) = vals
      c += 1
    }
    val rows = new Array[Row](nrows)
    var r = 0
    while (r < nrows) {
      val vs = new Array[Any](ncols)
      var c2 = 0
      while (c2 < ncols) { vs(c2) = cols(c2)(r); c2 += 1 }
      rows(r) = Row.fromSeq(vs.toIndexedSeq)
      r += 1
    }
    Some(rows)
  }

  /** Read a NativeIO-written directory back with `schema`, one task per
    * file, one block in memory at a time. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = RowBinaryIO.listPartFiles(path, ".native")
    val fields = schema.fields
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
        RowBinaryIO.closeOnTaskEnd(in)
        Iterator.continually(readBlock(in, fields))
          .takeWhile {
            case Some(_) => true
            case None => in.close(); false
          }
          .flatMap(_.get)
      }
    spark.createDataFrame(rdd, schema)
  }
}
