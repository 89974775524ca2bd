package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on avro-core (the
  * reference parses Avro rows natively —
  * `src/Processors/Formats/Impl/AvroRowInputFormat.cpp`; this
  * environment has no spark-avro connector jar, so the container format
  * is driven through the public avro-core API instead).
  *
  * Distribution model matches any file sink: each task serializes its
  * partition to one `part-N.avro` container; reads parallelize over the
  * file list and stream-decode with DataFileStream. Nothing funnels
  * through the driver, so the same code holds at any scale — with the
  * caveat (documented, deliberate) that schema support covers the flat
  * primitive types the test tables use.
  */
object AvroIO {

  private def avroSchema(schema: StructType): Schema = {
    // Nullable fields map to ["null", T] unions (null first, default
    // null) — Spark columns are nullable by default and a bare T schema
    // would make DataFileWriter.append throw on the first null cell.
    var fields = SchemaBuilder.record("row").namespace("graft").fields()
    schema.fields.foreach { f =>
      fields = f.dataType match {
        case LongType if f.nullable    => fields.name(f.name).`type`().optional().longType()
        case IntegerType if f.nullable => fields.name(f.name).`type`().optional().intType()
        case DoubleType if f.nullable  => fields.name(f.name).`type`().optional().doubleType()
        case StringType if f.nullable  => fields.name(f.name).`type`().optional().stringType()
        case LongType    => fields.name(f.name).`type`().longType().noDefault()
        case IntegerType => fields.name(f.name).`type`().intType().noDefault()
        case DoubleType  => fields.name(f.name).`type`().doubleType().noDefault()
        case StringType  => fields.name(f.name).`type`().stringType().noDefault()
        case t => throw new IllegalArgumentException(s"AvroIO: unsupported $t")
      }
    }
    fields.endRecord()
  }

  /** Write `df` as one Avro container file per partition under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val avSchema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avSchema))
      val f = new java.io.File(dir, f"part-$i%05d.avro")
      w.create(avSchema, f)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(avSchema)
        var j = 0
        while (j < schema.length) { rec.put(j, row.get(j)); j += 1 }
        w.append(rec)
        n += 1
      }
      w.close()
      Iterator.single(n)
    }.count(): Unit
  }

  /** Read an AvroIO-written directory back as a DataFrame with `schema`.
    * Files are distributed across tasks; each streams its container. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = RowBinaryIO.listPartFiles(path, ".avro")
    val n = schema.length
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
        val reader = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        reader.iterator().asScala.map { rec =>
          val vs = new Array[Any](n)
          var j = 0
          while (j < n) {
            vs(j) = rec.get(j) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
            j += 1
          }
          Row.fromSeq(vs.toIndexedSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
