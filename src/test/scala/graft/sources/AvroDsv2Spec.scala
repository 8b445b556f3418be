package graft.sources

import java.nio.file.Files

import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 face of the avro reader: `format("graft-avro")` loads must
  * match the RDD path exactly, and — the part the RDD bridge could not
  * do — Catalyst's own column-pruning rule must reach the decoder, so a
  * plain `.select` (no explicit columns argument) skips conversion of
  * dead fields, and a `count()` decodes zero fields. */
class AvroDsv2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "avro-dsv2")

  private def writeWide(dir: java.nio.file.Path): Unit =
    AvroTestData.writeWide(dir, n = 200, xStep = 0.5)

  test("format(graft-avro) full scan matches AvroRead.read") {
    val dir = Files.createTempDirectory("dsv2-full")
    writeWide(dir)
    val v2 = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
    val rdd = AvroRead.read(spark, dir.toString + "/*.avro")
    assert(v2.schema == rdd.schema)
    assert(v2.schema.fieldNames.toSeq == Seq("id", "a", "b", "c", "x"))
    assert(v2.orderBy("id").collect().toSeq == rdd.orderBy("id").collect().toSeq)
  }

  test("Catalyst pushes projection into the scan — no columns argument needed") {
    val dir = Files.createTempDirectory("dsv2-prune")
    writeWide(dir)
    val df = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
      .select("x", "id")
    // the scan itself reports the pruned schema
    val scan = df.queryExecution.executedPlan.toString
    assert(!scan.contains("a:") || scan.contains("ReadSchema"), scan)
    AvroRead.convertedCells.reset()
    val rows = df.collect().sortBy(_.getLong(1))
    assert(rows.length == 200)
    assert(rows(9).getDouble(0) == 5.0 && rows(9).getLong(1) == 10L)
    // only the two referenced fields were converted, not all five
    assert(AvroRead.convertedCells.sum() == 200L * 2)
  }

  test("count() prunes to zero fields — records skipped byte-wise") {
    val dir = Files.createTempDirectory("dsv2-count")
    writeWide(dir)
    AvroRead.convertedCells.reset()
    val n = spark.read.format("graft-avro").load(dir.toString + "/*.avro").count()
    assert(n == 200)
    assert(AvroRead.convertedCells.sum() == 0L)
  }

  test("schema evolution (absent field → null, int→long widening) through DSv2") {
    val dir = Files.createTempDirectory("dsv2-evo")
    val v1 = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredInt("n").endRecord()
    val v2s = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredLong("n").optionalDouble("score").endRecord()
    def write(name: String, s: org.apache.avro.Schema, recs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](s))
      w.create(s, dir.resolve(name).toFile)
      recs.foreach(w.append)
      w.close()
    }
    write("a-v1.avro", v1, Seq(
      new GenericRecordBuilder(v1).set("id", 1L).set("n", 7).build()))
    write("b-v2.avro", v2s, Seq(
      new GenericRecordBuilder(v2s).set("id", 2L).set("n", 9000000000L)
        .set("score", 0.5).build()))
    val df = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
    assert(df.schema("n").dataType == LongType)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(rows(0).fieldIndex("n")) == 7L)
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getLong(rows(1).fieldIndex("n")) == 9000000000L)
    // pruned read touching only the evolved column still widens
    val n = df.select("n").collect().map(_.getLong(0)).sorted
    assert(n.toSeq == Seq(7L, 9000000000L))
  }

  test("early-terminating consumers close streams (limit over DSv2)") {
    val dir = Files.createTempDirectory("dsv2-limit")
    writeWide(dir)
    val df = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
    assert(df.limit(3).collect().length == 3)
    // a second full pass over the same files still works
    assert(df.agg(sum("id")).collect().head.getLong(0) == 20100L)
  }
}
