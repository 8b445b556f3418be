package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.load.TableLoader

/** K1 AVRO loads end-to-end: real container files written with
  * avro-core round-trip through `TableLoader(format = "avro")` —
  * primitives, [null, T] unions, enum, bytes, array/map/nested record,
  * and the date / timestamp-micros logical types. */
class AvroReadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "avro-test")

  private def writeContainer(
      dir: java.nio.file.Path, name: String, schema: Schema,
      records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, dir.resolve(name).toFile)
    records.foreach(w.append)
    w.close()
  }

  private val schema: Schema = SchemaBuilder.record("doc").fields()
    .requiredLong("id")
    .requiredString("title")
    .optionalDouble("score")
    .name("day").`type`(LogicalTypes.date().addToSchema(
      Schema.create(Schema.Type.INT))).noDefault()
    .name("ts").`type`(LogicalTypes.timestampMicros().addToSchema(
      Schema.create(Schema.Type.LONG))).noDefault()
    .name("tags").`type`().array().items().stringType().noDefault()
    .name("attrs").`type`().map().values().longType().noDefault()
    .name("nested").`type`().record("inner").fields()
      .requiredInt("a").requiredBoolean("b").endRecord().noDefault()
    .name("payload").`type`().bytesType().noDefault()
    .endRecord()

  private def rec(id: Long, title: String, score: java.lang.Double): GenericRecord = {
    val inner = new GenericRecordBuilder(
      schema.getField("nested").schema())
      .set("a", id.toInt * 2).set("b", id % 2 == 0).build()
    new GenericRecordBuilder(schema)
      .set("id", id)
      .set("title", title)
      .set("score", score)
      .set("day", 19000 + id.toInt) // epoch days
      .set("ts", 1700000000000000L + id * 1000000L) // epoch micros
      .set("tags", Seq(s"t$id", "x").asJava)
      .set("attrs", Map(s"k$id" -> java.lang.Long.valueOf(id * 10)).asJava)
      .set("nested", inner)
      .set("payload", java.nio.ByteBuffer.wrap(Array[Byte](id.toByte, 7)))
      .build()
  }

  test("avro containers load through TableLoader with full type mapping") {
    val dir = Files.createTempDirectory("avro-in")
    writeContainer(dir, "part-0.avro", schema, (1L to 3L).map(i => rec(i, s"doc$i", i * 0.5)))
    writeContainer(dir, "part-1.avro", schema, Seq(rec(4L, "doc4", null)))

    val outcome = TableLoader.load(spark, TableLoader.LoadSpec(
      table = "avro_k1_tbl", sourcePath = dir.toString + "/*.avro", format = "avro"))
    assert(outcome.status == "PASS", outcome.message)
    assert(outcome.rowsLoaded == 4)

    val df = spark.table("avro_k1_tbl")
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("day").dataType == DateType)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("tags").dataType == ArrayType(StringType))
    assert(df.schema("attrs").dataType == MapType(StringType, LongType))
    assert(df.schema("nested").dataType ==
      StructType(Seq(StructField("a", IntegerType), StructField("b", BooleanType))))
    assert(df.schema("payload").dataType == BinaryType)

    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("title")).toSeq == Seq("doc1", "doc2", "doc3", "doc4"))
    assert(rows(3).isNullAt(rows(3).fieldIndex("score"))) // [null, double] union
    assert(rows(0).getAs[java.sql.Date]("day").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19001))
    assert(rows(1).getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.ofEpochSecond(1700000002L))
    assert(rows(0).getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("t1", "x"))
    assert(rows(2).getAs[scala.collection.Map[String, Long]]("attrs").toMap == Map("k3" -> 30L))
    assert(rows(1).getAs[org.apache.spark.sql.Row]("nested").getInt(0) == 4)
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 7))
  }

  test("unsupported avro shapes fail loudly") {
    // multi-branch (non-nullable) union has no Spark twin
    val bad = SchemaBuilder.record("r").fields()
      .name("u").`type`().unionOf().intType().and().stringType().endUnion().noDefault()
      .endRecord()
    val e = intercept[IllegalArgumentException](AvroRead.sparkType(bad))
    assert(e.getMessage.contains("union"))
  }
}
