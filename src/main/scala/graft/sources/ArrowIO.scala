package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC (Feather v2) source/sink over arrow-vector — the columnar
  * interchange format the reference parses natively
  * (`src/Processors/Formats/Impl/ArrowBlockInputFormat.cpp`). Spark
  * ships the Arrow runtime for its Python interchange but no Arrow
  * *file* source, so the container format is driven through the public
  * arrow-vector API, same shape as [[AvroIO]]: one IPC file per
  * partition on write, file-parallel streaming decode on read — nothing
  * touches the driver, so the layout scales with the file count.
  * Flat primitive schemas (long/int/double/string), deliberately.
  */
object ArrowIO {

  private def arrowField(f: StructField): Field = {
    val t = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType  => ArrowType.Utf8.INSTANCE
      case t => throw new IllegalArgumentException(s"ArrowIO: unsupported $t")
    }
    new Field(f.name, FieldType.nullable(t), null)
  }

  /** Write `df` as one Arrow IPC file per partition under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val arrowSchema = new ArrowSchema(schema.fields.map(arrowField).toSeq.asJava)
      val alloc = new RootAllocator()
      val root = VectorSchemaRoot.create(arrowSchema, alloc)
      val ch = new java.io.FileOutputStream(
        new java.io.File(dir, f"part-$i%05d.arrow")).getChannel
      val writer = new ArrowFileWriter(root, null, ch)
      writer.start()
      val batch = 4096
      val buf = rows.grouped(batch)
      buf.foreach { chunk =>
        root.allocateNew()
        chunk.zipWithIndex.foreach { case (row, r) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            val v = root.getVector(c)
            if (row.isNullAt(c)) () // nullable vectors default unset=null
            else f.dataType match {
              case LongType    => v.asInstanceOf[BigIntVector].setSafe(r, row.getLong(c))
              case IntegerType => v.asInstanceOf[IntVector].setSafe(r, row.getInt(c))
              case DoubleType  => v.asInstanceOf[Float8Vector].setSafe(r, row.getDouble(c))
              case StringType  => v.asInstanceOf[VarCharVector].setSafe(r,
                row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
              case _ => ()
            }
          }
        }
        root.setRowCount(chunk.size)
        writer.writeBatch()
      }
      writer.end(); writer.close(); ch.close(); root.close(); alloc.close()
      Iterator.single(i)
    }.count(): Unit
  }

  /** Read an ArrowIO-written directory back with `schema`, one task per
    * IPC file, streaming record batches. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = RowBinaryIO.listPartFiles(path, ".arrow")
    val n = schema.length
    val fields = schema.fields
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        // Lazy per-batch decode: only ONE record batch is resident at a
        // time, so task memory is bounded by the batch size, not the file
        // size. Reader/allocator close when the last batch is exhausted.
        val alloc = new RootAllocator()
        val ch = new java.io.FileInputStream(f).getChannel
        val reader = new ArrowFileReader(ch, alloc)
        val root = reader.getVectorSchemaRoot
        def decodeBatch(): IndexedSeq[Row] = {
          val rows = root.getRowCount
          (0 until rows).map { r =>
            val vs = new Array[Any](n)
            var c = 0
            while (c < n) {
              val v = root.getVector(c)
              vs(c) =
                if (v.isNull(r)) null
                else fields(c).dataType match {
                  case LongType    => v.asInstanceOf[BigIntVector].get(r)
                  case IntegerType => v.asInstanceOf[IntVector].get(r)
                  case DoubleType  => v.asInstanceOf[Float8Vector].get(r)
                  case StringType  => new String(
                    v.asInstanceOf[VarCharVector].get(r),
                    java.nio.charset.StandardCharsets.UTF_8)
                  case _ => null
                }
              c += 1
            }
            Row.fromSeq(vs.toIndexedSeq)
          }
        }
        new Iterator[Row] {
          private var batch: Iterator[Row] = Iterator.empty
          private var open = true
          private def closeAll(): Unit =
            if (open) { reader.close(); ch.close(); alloc.close(); open = false }
          // early-terminated scans (limit/take) abandon the iterator
          // before EOF — the task-completion hook releases the reader,
          // channel and off-heap allocator deterministically.
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
          private def advance(): Unit =
            while (open && !batch.hasNext) {
              if (reader.loadNextBatch()) batch = decodeBatch().iterator
              else closeAll()
            }
          override def hasNext: Boolean = { advance(); batch.hasNext }
          override def next(): Row = { advance(); batch.next() }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
