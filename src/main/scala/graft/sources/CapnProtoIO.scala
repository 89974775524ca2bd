package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Cap'n Proto source/sink — the reference parses capnp messages with a
  * compiled schema (`src/Processors/Formats/Impl/CapnProtoRowInputFormat
  * .cpp`, one message per row). No capnp library ships in this
  * environment, so the wire format is implemented directly from the
  * PUBLIC encoding spec (capnproto.org/encoding.html): each row is one
  * message — a segment table (4-byte segment-count-minus-1 + 4-byte
  * word sizes, padded to 8 bytes) and a single segment holding the root
  * STRUCT pointer (tag 0: signed word offset, data-section words,
  * pointer-section words), the data section (numerics at aligned
  * declaration-order offsets, little-endian), the pointer section (one
  * TEXT list pointer per string column — tag 1, element-size 2 = bytes,
  * element count includes the NUL terminator), and the padded string
  * bodies. A stock capnp implementation given the equivalent flat
  * schema reads these messages as-is.
  *
  * Null handling follows the reference's mapping (absent = default
  * value): capnp structs have no null representation, so the codec
  * requires non-null columns. One `part-N.capnp` stream per partition;
  * reads parallelize over files and decode one message at a time.
  */
object CapnProtoIO {

  private final case class Layout(dataOffsets: Array[Int], dataWords: Int,
                                  ptrCols: Array[Int])

  /** Aligned declaration-order offsets within the data section;
    * string columns go to the pointer section in order. */
  private def layout(fields: Array[StructField]): Layout = {
    var cur = 0
    val offs = new Array[Int](fields.length)
    val ptrCols = scala.collection.mutable.ArrayBuffer[Int]()
    fields.zipWithIndex.foreach { case (f, i) =>
      f.dataType match {
        case LongType | DoubleType =>
          cur = (cur + 7) & ~7; offs(i) = cur; cur += 8
        case IntegerType =>
          cur = (cur + 3) & ~3; offs(i) = cur; cur += 4
        case StringType =>
          offs(i) = -1; ptrCols += i
        case t => throw new IllegalArgumentException(s"CapnProtoIO: unsupported $t")
      }
    }
    Layout(offs, (cur + 7) / 8, ptrCols.toArray)
  }

  private def putLongLE(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def getLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def getIntLE(b: Array[Byte], off: Int): Int = {
    var v = 0; var i = 0
    while (i < 4) { v |= (b(off + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  /** One message: segment table + root pointer + struct + text bodies. */
  private def encodeRow(row: Row, fields: Array[StructField],
                        l: Layout): Array[Byte] = {
    val ptrWords = l.ptrCols.length
    val texts = l.ptrCols.map { c =>
      require(!row.isNullAt(c), s"CapnProtoIO: null in ${fields(c).name}")
      row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val textWords = texts.map(t => (t.length + 1 + 7) / 8).sum
    val segWords = 1 + l.dataWords + ptrWords + textWords
    // segment table: count-1 (=0) + size, already 8-byte aligned
    val msg = new Array[Byte](8 + segWords * 8)
    putIntLE(msg, 0, 0)
    putIntLE(msg, 4, segWords)
    val seg = 8
    // root struct pointer: offset 0, dataWords, ptrWords
    putLongLE(msg, seg,
      (l.dataWords.toLong << 32) | (ptrWords.toLong << 48))
    val dataStart = seg + 8
    var i = 0
    while (i < fields.length) {
      if (l.dataOffsets(i) >= 0) {
        require(!row.isNullAt(i), s"CapnProtoIO: null in ${fields(i).name}")
        val off = dataStart + l.dataOffsets(i)
        fields(i).dataType match {
          case LongType   => putLongLE(msg, off, row.getLong(i))
          case DoubleType => putLongLE(msg, off,
            java.lang.Double.doubleToLongBits(row.getDouble(i)))
          case IntegerType => putIntLE(msg, off, row.getInt(i))
          case _ => ()
        }
      }
      i += 1
    }
    // text list pointers + bodies
    var bodyWord = 1 + l.dataWords + ptrWords // word index of next body in segment
    var p = 0
    while (p < ptrWords) {
      val t = texts(p)
      val ptrWordIdx = 1 + l.dataWords + p
      val offsetWords = bodyWord - (ptrWordIdx + 1)
      // list pointer: tag 1 | offset<<2 | elemSize 2 (byte) <<32 | count<<35
      putLongLE(msg, seg + ptrWordIdx * 8,
        1L | (offsetWords.toLong << 2) | (2L << 32) |
          ((t.length + 1).toLong << 35))
      System.arraycopy(t, 0, msg, seg + bodyWord * 8, t.length)
      // NUL terminator + padding are already zero
      bodyWord += (t.length + 1 + 7) / 8
      p += 1
    }
    msg
  }

  private def decodeRow(msg: Array[Byte], fields: Array[StructField],
                        l: Layout): Row = {
    require(getIntLE(msg, 0) == 0, "CapnProtoIO: multi-segment message")
    val seg = 8
    val root = getLongLE(msg, seg)
    require((root & 3) == 0, "CapnProtoIO: root is not a struct pointer")
    val rootOffset = (root & 0xFFFFFFFFL).toInt >> 2 // signed bits 2..31
    val dataWords = ((root >>> 32) & 0xffff).toInt
    val ptrWords = ((root >>> 48) & 0xffff).toInt
    val dataStart = seg + 8 + rootOffset * 8
    val ptrStart = dataStart + dataWords * 8
    val vs = new Array[Any](fields.length)
    var p = 0
    var i = 0
    while (i < fields.length) {
      if (l.dataOffsets(i) >= 0) {
        val off = dataStart + l.dataOffsets(i)
        vs(i) = fields(i).dataType match {
          case LongType    => getLongLE(msg, off)
          case DoubleType  => java.lang.Double.longBitsToDouble(getLongLE(msg, off))
          case IntegerType => getIntLE(msg, off)
          case _ => null
        }
      } else {
        val ptrWordPos = ptrStart + p * 8
        val ptr = getLongLE(msg, ptrWordPos)
        if (ptr == 0L) {
          // An all-zero pointer word is capnp's null/absent pointer — a
          // stock writer emits it for an unset Text field; decode as "".
          vs(i) = ""
        } else {
          require((ptr & 3) == 1, "CapnProtoIO: expected list pointer")
          val elementSize = ((ptr >>> 32) & 7).toInt
          require(elementSize == 2,
            s"CapnProtoIO: Text requires 1-byte list elements (size tag 2), got $elementSize")
          val offsetWords = (ptr & 0xFFFFFFFFL).toInt >> 2
          val count = (ptr >>> 35).toInt
          require(count >= 1, s"CapnProtoIO: Text list count $count lacks NUL terminator")
          val bodyPos = ptrWordPos + 8 + offsetWords * 8
          // A corrupt offset/count lands outside the message; surface a
          // descriptive decode error, not StringIndexOutOfBounds.
          require(bodyPos >= 0 && bodyPos + count <= msg.length,
            s"CapnProtoIO: Text body [$bodyPos, ${bodyPos + count}) outside ${msg.length}-byte message")
          vs(i) = new String(msg, bodyPos, count - 1, // drop NUL
            java.nio.charset.StandardCharsets.UTF_8)
        }
        p += 1
      }
      i += 1
    }
    Row.fromSeq(vs.toIndexedSeq)
  }

  /** Write `df` under `path`, one capnp message stream per partition. */
  def write(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    val l = layout(fields)
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        new java.io.File(dir, f"part-$i%05d.capnp")))
      try rows.foreach(r => out.write(encodeRow(r, fields, l)))
      finally out.close()
      Iterator.single(i)
    }.count(): Unit
  }

  /** Read a CapnProtoIO-written directory back with `schema`. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = RowBinaryIO.listPartFiles(path, ".capnp")
    val fields = schema.fields
    val l = layout(fields)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
        RowBinaryIO.closeOnTaskEnd(in)
        new Iterator[Row] {
          private var nextMsg: Array[Byte] = readMsg()
          private def readMsg(): Array[Byte] = {
            val head = new Array[Byte](8)
            var got = 0
            val first = in.read()
            if (first < 0) { in.close(); return null }
            head(0) = first.toByte; got = 1
            while (got < 8) {
              val n = in.read(head, got, 8 - got)
              if (n < 0) throw new java.io.EOFException("CapnProtoIO: header")
              got += n
            }
            require(getIntLE(head, 0) == 0, "CapnProtoIO: multi-segment")
            val segWords = getIntLE(head, 4)
            val msg = new Array[Byte](8 + segWords * 8)
            System.arraycopy(head, 0, msg, 0, 8)
            var off = 8
            while (off < msg.length) {
              val n = in.read(msg, off, msg.length - off)
              if (n < 0) throw new java.io.EOFException("CapnProtoIO: body")
              off += n
            }
            msg
          }
          override def hasNext: Boolean = nextMsg != null
          override def next(): Row = {
            val r = decodeRow(nextMsg, fields, l)
            nextMsg = readMsg()
            r
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
