package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Null-cell round-trips for the hand-driven container formats: Spark
  * columns are nullable by default, so a writer that declares bare
  * (non-union) Avro types or skips Arrow validity would throw or corrupt
  * on the first null. Exercises every supported primitive with a null.
  */
class FormatsNullSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("s", StringType)))

  private val rows = Seq(
    Row(1L, 10, 1.5, "a"),
    Row(2L, null, null, null),
    Row(null, 20, 2.5, "b"))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  private def roundTrips(written: org.apache.spark.sql.DataFrame): Unit = {
    val got = written.collect().map(_.toSeq).toSet
    assert(got == rows.map(_.toSeq).toSet)
  }

  test("RowBinaryIO round-trips null cells (Nullable flag bytes)") {
    val dir = java.nio.file.Files.createTempDirectory("rowbinary_null").toString
    sources.RowBinaryIO.write(df, dir)
    roundTrips(sources.RowBinaryIO.read(spark, dir, schema))
  }

  test("NativeIO round-trips null cells (null-mask vectors) across blocks") {
    val dir = java.nio.file.Files.createTempDirectory("native_null").toString
    sources.NativeIO.write(df, dir)
    roundTrips(sources.NativeIO.read(spark, dir, schema))
    // early termination must not break (task-completion close)
    assert(sources.NativeIO.read(spark, dir, schema).limit(1).count() == 1)
  }

  test("CapnProtoIO rejects nulls loudly and round-trips non-null rows") {
    val dir = java.nio.file.Files.createTempDirectory("capnp_null").toString
    val ok = Seq(Row(1L, 10, 1.5, "a"), Row(2L, 20, -2.5, ""),
      Row(Long.MinValue, -7, 0.0, "яндекс длинная строка за пределами слова"))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(ok, 2), schema)
    sources.CapnProtoIO.write(d, dir)
    val got = sources.CapnProtoIO.read(spark, dir, schema)
      .collect().map(_.toSeq).toSet
    assert(got == ok.map(_.toSeq).toSet)
    val err = intercept[org.apache.spark.SparkException] {
      sources.CapnProtoIO.write(df, dir + "_bad")
    }
    assert(err.getMessage.contains("CapnProtoIO") ||
      Option(err.getCause).exists(_.getMessage.contains("CapnProtoIO")))
  }

  test("AvroIO round-trips null cells (nullable union schema)") {
    val dir = java.nio.file.Files.createTempDirectory("avro_null").toString
    sources.AvroIO.write(df, dir)
    roundTrips(sources.AvroIO.read(spark, dir, schema))
  }

  test("MsgPackIO round-trips null cells and the full int-width ladder") {
    val wide = Seq(
      Row(0L, 5, 1.5, "fix"),                      // pos fixint
      Row(-5L, -200, -2.5, "neg"),                 // neg fixint + int16
      Row(300L, 70000, 0.0, "a" * 40),             // uint8/uint32 + str8
      Row(5000000000L, null, null, null),          // int64 + nils
      Row(Long.MinValue, Int.MinValue, -0.25, "")) // int64/int32 + empty str
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(wide, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("msgpack_null").toString
    sources.MsgPackIO.write(d, dir)
    val got = sources.MsgPackIO.read(spark, dir, schema)
      .collect().map(_.toSeq).toSet
    assert(got == wide.map(_.toSeq).toSet)
  }

  test("ProtoIO round-trips null cells, negatives, and proto3 defaults") {
    val wide = Seq(
      Row(0L, 0, 0.0, ""),                          // explicit defaults
      Row(-1L, -1, -0.0, "neg"),                    // 10-byte varints
      Row(Long.MaxValue, Int.MinValue, 1.5e308, "été"), // extremes + utf8
      Row(null, null, null, null),                  // all absent
      Row(7L, null, 2.5, null))                     // mixed
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(wide, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("proto_null").toString
    sources.ProtoIO.write(d, dir)
    val got = sources.ProtoIO.read(spark, dir, schema)
      .collect().map(_.toSeq).toSet
    assert(got == wide.map(_.toSeq).toSet)
  }

  test("ArrowIO round-trips null cells across record batches, lazily") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_null").toString
    sources.ArrowIO.write(df, dir)
    val back = sources.ArrowIO.read(spark, dir, schema)
    roundTrips(back)
    // laziness smoke: a limit(1) terminates without decoding everything
    assert(back.limit(1).count() == 1)
  }
}
