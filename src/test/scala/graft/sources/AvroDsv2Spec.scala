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

  test("supported filters push into the scan and skip row conversion") {
    val dir = Files.createTempDirectory("dsv2-filter")
    writeWide(dir)
    val df = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
      .filter(col("id") > 190)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(id,190"), plan)
    AvroRead.convertedCells.reset()
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (191L to 200L))
    // 190 non-matching rows convert ONLY the predicate column (id);
    // the 10 matching rows convert all five cells (id once, reused)
    assert(AvroRead.convertedCells.sum() == 190L * 1 + 10L * 5)
  }

  test("filter + projection compose: predicate column converts for all, payload only for matches") {
    val dir = Files.createTempDirectory("dsv2-filter-prune")
    writeWide(dir)
    val df = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
      .filter(col("id") > 190).select("x")
    AvroRead.convertedCells.reset()
    val xs = df.collect().map(_.getDouble(0)).sorted
    assert(xs.toSeq == (191 to 200).map(_ * 0.5))
    // required schema is {x, id} (id kept for the residual filter):
    // id converts on every row, x only on the 10 matches
    assert(AvroRead.convertedCells.sum() == 200L * 1 + 10L * 1)
  }

  test("IsNull pushdown respects schema evolution (absent field reads as null)") {
    val dir = Files.createTempDirectory("dsv2-filter-null")
    val v1 = SchemaBuilder.record("doc").fields()
      .requiredLong("id").endRecord()
    val v2s = SchemaBuilder.record("doc").fields()
      .requiredLong("id").optionalDouble("score").endRecord()
    def write(name: String, s: org.apache.avro.Schema, recs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](s))
      w.create(s, dir.resolve(name).toFile)
      recs.foreach(w.append)
      w.close()
    }
    write("a-v1.avro", v1, Seq(new GenericRecordBuilder(v1).set("id", 1L).build()))
    write("b-v2.avro", v2s, Seq(
      new GenericRecordBuilder(v2s).set("id", 2L).set("score", 0.5).build()))
    val df = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
    assert(df.filter(col("score").isNull).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(df.filter(col("score").isNotNull).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("logical-type pushdown: date/timestamp/NTZ/decimal predicates push into the scan and skip row conversion") {
    import org.apache.avro.LogicalTypes
    import org.apache.avro.Schema
    val dir = Files.createTempDirectory("dsv2-logical")
    val dateT = LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    val tsT = LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    val ltsT = LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    val decT = LogicalTypes.decimal(10, 2).addToSchema(Schema.create(Schema.Type.BYTES))
    val s = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .name("d").`type`(dateT).noDefault()
      .name("ts").`type`(tsT).noDefault()
      .name("lts").`type`(ltsT).noDefault()
      .name("amt").`type`(decT).noDefault()
      .requiredString("pay")
      .endRecord()
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
    val d0 = java.time.LocalDate.of(2026, 1, 1)
    def amt(cents: Long) = java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(cents).toByteArray)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](s))
    w.setSyncInterval(64)
    w.create(s, dir.resolve("lt.avro").toFile)
    (1 to 100).foreach { i =>
      w.append(new GenericRecordBuilder(s)
        .set("id", i.toLong)
        .set("d", d0.plusDays(i).toEpochDay.toInt)
        .set("ts", base.plusSeconds(i * 3600L).getEpochSecond * 1000000L)
        .set("lts", base.plusSeconds(i * 60L).getEpochSecond * 1000000L)
        .set("amt", amt(i * 100L + 25))
        .set("pay", "p" * 20).build())
    }
    w.close()
    def load = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
    // date range: matches days 91..100; every row converts only (id?,d)
    val dq = load.filter(col("d") > java.sql.Date.valueOf("2026-04-01"))
      .select("id", "d")
    assert(dq.queryExecution.executedPlan.toString.contains("GreaterThan(d,"),
      dq.queryExecution.executedPlan.toString)
    AvroRead.convertedCells.reset()
    assert(dq.collect().map(_.getLong(0)).sorted.toSeq == (91L to 100L))
    // 90 non-matching rows convert only d; 10 matches also convert id
    assert(AvroRead.convertedCells.sum() == 100L * 1 + 10L * 1)
    // timestamp equality + range
    val cut = java.sql.Timestamp.from(base.plusSeconds(97 * 3600L))
    val tq = load.filter(col("ts") >= cut).select("id")
    assert(tq.queryExecution.executedPlan.toString.contains("GreaterThanOrEqual(ts,"),
      tq.queryExecution.executedPlan.toString)
    assert(tq.collect().map(_.getLong(0)).sorted.toSeq == (97L to 100L))
    val te = load.filter(col("ts") === java.sql.Timestamp.from(base.plusSeconds(3600L)))
    assert(te.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // NTZ + decimal compose in one conjunction
    val mq = load.filter(
        col("lts") > java.time.LocalDateTime.ofInstant(
          base.plusSeconds(95 * 60L), java.time.ZoneOffset.UTC) &&
        col("amt") <= new java.math.BigDecimal("99.25"))
      .select("id", "amt")
    val mplan = mq.queryExecution.executedPlan.toString
    assert(mplan.contains("GreaterThan(lts,") && mplan.contains("LessThanOrEqual(amt,"),
      mplan)
    assert(mq.collect().map(_.getLong(0)).sorted.toSeq == (96L to 99L))
  }

  test("unsupported predicates stay residual-only — empty PushedFilters, correct result") {
    val dir = Files.createTempDirectory("dsv2-filter-resid")
    writeWide(dir)
    val df = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
      .filter(length(col("a")) > 50) // no source-filter form of its own
    val plan = df.queryExecution.executedPlan.toString
    // Catalyst derives a pushable IsNotNull(a); the length predicate
    // itself has no source-filter form and must stay in the residual
    // Filter node above the scan
    assert(plan.contains("PushedFilters: [IsNotNull(a)]"), plan)
    assert(plan.contains("length("), plan)
    assert(df.count() == 0)
    // and a mixed case: the convertible conjunct pushes, the rest stays
    val mixed = spark.read.format("graft-avro").load(dir.toString + "/*.avro")
      .filter(col("id") <= 5 && length(col("b")) === 20)
    val mplan = mixed.queryExecution.executedPlan.toString
    assert(mplan.contains("LessThanOrEqual(id,5"), mplan)
    assert(mixed.collect().map(_.getLong(0)).sorted.toSeq == (1L to 5L))
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
