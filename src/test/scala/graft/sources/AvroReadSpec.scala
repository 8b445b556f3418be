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

  test("schema evolution: older file lacking an optional field resolves to null") {
    val dir = Files.createTempDirectory("avro-evo")
    // "old" writer schema: no score field; reader (file-1 lexicographic)
    // has [null, double] score with default null — avro resolution rules
    val oldSchema = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("title").endRecord()
    val evoReader = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("title")
      .optionalDouble("score").endRecord()
    writeContainer(dir, "a-first.avro", evoReader, Seq(
      new GenericRecordBuilder(evoReader)
        .set("id", 1L).set("title", "new").set("score", 0.5).build()))
    writeContainer(dir, "b-old.avro", oldSchema, Seq(
      new GenericRecordBuilder(oldSchema)
        .set("id", 2L).set("title", "old").build()))
    val df = AvroRead.read(spark, dir.toString + "/*.avro").orderBy("id")
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("score") == 0.5)
    assert(rows(1).isNullAt(rows(1).fieldIndex("score")))
  }

  test("schema widening: a column added by a LATER file survives, with nulls for older rows") {
    val dir = Files.createTempDirectory("avro-widen")
    val v1 = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("title").endRecord()
    val v2 = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("title")
      .optionalDouble("score").endRecord()
    // v1 is the lexicographically-FIRST file — under the old
    // first-file-wins resolution, score would have been dropped
    writeContainer(dir, "a-v1.avro", v1, Seq(
      new GenericRecordBuilder(v1).set("id", 1L).set("title", "old").build()))
    writeContainer(dir, "b-v2.avro", v2, Seq(
      new GenericRecordBuilder(v2)
        .set("id", 2L).set("title", "new").set("score", 0.75).build()))
    val df = AvroRead.read(spark, dir.toString + "/*.avro")
    assert(df.schema.fieldNames.toSeq == Seq("id", "title", "score"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // v1 row widened with null
    assert(rows(1).getAs[Double]("score") == 0.75)
  }

  test("int→long and float→double widen across files like Avro resolution") {
    val dir = Files.createTempDirectory("avro-promote")
    val narrow = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredInt("n").requiredFloat("x").endRecord()
    val wide = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredLong("n").requiredDouble("x").endRecord()
    // narrow file first lexicographically — widening must not depend on
    // which order the types are first seen
    writeContainer(dir, "a-narrow.avro", narrow, Seq(
      new GenericRecordBuilder(narrow)
        .set("id", 1L).set("n", 7).set("x", 1.5f).build()))
    writeContainer(dir, "b-wide.avro", wide, Seq(
      new GenericRecordBuilder(wide)
        .set("id", 2L).set("n", 9000000000L).set("x", 2.25).build()))
    val df = AvroRead.read(spark, dir.toString + "/*.avro")
    assert(df.schema("n").dataType == LongType)
    assert(df.schema("x").dataType == DoubleType)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(rows(0).fieldIndex("n")) == 7L)
    assert(rows(0).getDouble(rows(0).fieldIndex("x")) == 1.5)
    assert(rows(1).getLong(rows(1).fieldIndex("n")) == 9000000000L)
  }

  test("incompatible field types across files fail loudly naming the field and files") {
    val dir = Files.createTempDirectory("avro-conflict")
    val asLong = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredLong("v").endRecord()
    val asString = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("v").endRecord()
    writeContainer(dir, "a.avro", asLong, Seq(
      new GenericRecordBuilder(asLong).set("id", 1L).set("v", 5L).build()))
    writeContainer(dir, "b.avro", asString, Seq(
      new GenericRecordBuilder(asString).set("id", 2L).set("v", "five").build()))
    val e = intercept[IllegalArgumentException](
      AvroRead.read(spark, dir.toString + "/*.avro"))
    assert(e.getMessage.contains("'v'"))
    assert(e.getMessage.contains("a.avro") && e.getMessage.contains("b.avro"))
  }

  test("decode streams from FileSystem paths — no binaryFile content column in the plan") {
    val dir = Files.createTempDirectory("avro-stream")
    val s = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("pad").endRecord()
    // force a MULTI-BLOCK container: sync every ~64 bytes so 200 records
    // span many avro blocks inside one file
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](s))
    w.setSyncInterval(64)
    w.create(s, dir.resolve("multiblock.avro").toFile)
    (1L to 200L).foreach(i => w.append(
      new GenericRecordBuilder(s).set("id", i).set("pad", "x" * 32).build()))
    w.close()
    val df = AvroRead.read(spark, dir.toString + "/*.avro")
    // the plan must be an RDD scan over decoded rows, not a binaryFile
    // relation materializing whole containers as byte arrays
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("binaryFile") && !plan.contains("content"), plan)
    assert(df.count() == 200)
    assert(df.orderBy("id").limit(1).collect().head.getLong(0) == 1L)
    // early-terminating consumer (limit) must not wedge on unclosed
    // streams — a second full read over the same files still works
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).collect()
      .head.getLong(0) == 20100L)
  }

  test("sync-marker byte-range splits decode each block exactly once") {
    val dir = Files.createTempDirectory("avro-split")
    val s = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("pad").endRecord()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](s))
    w.setSyncInterval(64) // many small blocks inside one container
    w.create(s, dir.resolve("big.avro").toFile)
    (1L to 500L).foreach(i => w.append(
      new GenericRecordBuilder(s).set("id", i).set("pad", "x" * 32).build()))
    w.close()
    val len = Files.size(dir.resolve("big.avro"))
    // split sizes from pathological (every boundary lands mid-block)
    // to whole-file: the sync(start)/pastSync(end) ownership rule must
    // keep every id exactly once — no loss, no double-decode
    for (sb <- Seq(37L, 100L, 1000L, len)) {
      val df = AvroRead.read(spark, dir.toString + "/*.avro", splitBytes = sb)
      val ids = df.select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (1L to 500L), s"splitBytes=$sb lost or duplicated rows")
    }
  }

  test("planSplits tiles every file exactly, one range for small files") {
    val files = Seq(("a", 10L), ("b", 4000L), ("c", 1024L), ("d", 1025L))
    val splits = AvroRead.planSplits(files, 1024L)
    assert(splits.filter(_._1 == "a") == Seq(("a", 10L, 0L, 10L)))
    assert(splits.filter(_._1 == "c") == Seq(("c", 1024L, 0L, 1024L)))
    assert(splits.filter(_._1 == "d") ==
      Seq(("d", 1025L, 0L, 1024L), ("d", 1025L, 1024L, 1025L)))
    // tiling: per file, ranges run contiguously from 0 to len
    for ((p, len) <- files) {
      val rs = splits.filter(_._1 == p).map(t => (t._3, t._4)).sorted
      assert(rs.head._1 == 0L && rs.last._2 == len)
      rs.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2, s"$p gap/overlap at $e1")
        case _ => ()
      }
    }
    val e = intercept[IllegalArgumentException](AvroRead.planSplits(files, 0L))
    assert(e.getMessage.contains("splitBytes"))
  }

  test("metadata files are skipped and partitioned layouts recurse") {
    val dir = Files.createTempDirectory("avro-part")
    // _SUCCESS sorts before 'd…' — a naive head() would pick it as the
    // schema file; .crc twins must be invisible too
    Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
    val part = Files.createDirectories(dir.resolve("date=2026-01-01"))
    val s = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("v").endRecord()
    writeContainer(part, "part-0.avro", s, Seq(
      new GenericRecordBuilder(s).set("id", 1L).set("v", "a").build()))
    Files.write(part.resolve(".part-0.avro.crc"), Array[Byte](1, 2))
    val df = AvroRead.read(spark, dir.toString)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }

  test("corrupt and empty sources become FAIL outcomes, not crashes") {
    val dir = Files.createTempDirectory("avro-bad")
    Files.write(dir.resolve("junk.avro"), Array[Byte](1, 2, 3, 4, 5))
    val corrupt = TableLoader.load(spark, TableLoader.LoadSpec(
      table = "avro_bad_tbl", sourcePath = dir.toString + "/*.avro", format = "avro"))
    assert(corrupt.status == "FAIL" && corrupt.message.nonEmpty)
    val empty = TableLoader.load(spark, TableLoader.LoadSpec(
      table = "avro_empty_tbl",
      sourcePath = Files.createTempDirectory("avro-none").toString + "/*.avro",
      format = "avro"))
    // Spark's binaryFile source rejects the unmatched glob before our
    // own no-files require — either way a clear FAIL outcome
    assert(empty.status == "FAIL" &&
      (empty.message.contains("no files") || empty.message.contains("not exist")))
  }

  test("decimal logical type loads as DecimalType with exact values") {
    val dir = Files.createTempDirectory("avro-dec")
    val dec = LogicalTypes.decimal(10, 2).addToSchema(Schema.create(Schema.Type.BYTES))
    val s = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .name("amount").`type`(dec).noDefault()
      .endRecord()
    def amt(cents: Long) = java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(cents).toByteArray) // unscaled big-endian
    writeContainer(dir, "d.avro", s, Seq(
      new GenericRecordBuilder(s).set("id", 1L).set("amount", amt(12345)).build(),
      new GenericRecordBuilder(s).set("id", 2L).set("amount", amt(-99)).build()))
    val df = AvroRead.read(spark, dir.toString + "/*.avro").orderBy("id")
    assert(df.schema("amount").dataType == DecimalType(10, 2))
    val vals = df.collect().map(_.getAs[java.math.BigDecimal]("amount").toPlainString)
    assert(vals.toSeq == Seq("123.45", "-0.99"))
  }

  test("column pruning skips conversion of unrequested fields (round 8)") {
    val dir = Files.createTempDirectory("avro-prune")
    // multi-block (shared fixture), so pruning is exercised across blocks
    AvroTestData.writeWide(dir, n = 300, xStep = 0.25)

    // baseline: an unpruned read converts every cell of every row
    AvroRead.convertedCells.reset()
    assert(AvroRead.read(spark, dir.toString + "/*.avro").count() == 300)
    assert(AvroRead.convertedCells.sum() == 300L * 5)

    // pruned: only the requested cells are converted, request order kept
    AvroRead.convertedCells.reset()
    val pruned = AvroRead.read(spark, dir.toString + "/*.avro",
      columns = Seq("x", "id"), splitBytes = 0L)
    assert(pruned.schema.fieldNames.toSeq == Seq("x", "id"))
    // plain collect: orderBy would add a range-partitioner sampling pass
    // that decodes the data a second time and doubles the counter
    val rows = pruned.collect().sortBy(_.getLong(1))
    assert(rows.length == 300)
    assert(rows(9).getDouble(0) == 2.5 && rows(9).getLong(1) == 10L)
    assert(AvroRead.convertedCells.sum() == 300L * 2)

    // pruning composes with byte-range splits: every id exactly once
    val split = AvroRead.read(spark, dir.toString + "/*.avro",
      columns = Seq("id"), splitBytes = 100L)
    assert(split.collect().map(_.getLong(0)).sorted.toSeq == (1L to 300L))

    // unknown columns fail loudly naming what IS available
    val e = intercept[IllegalArgumentException](
      AvroRead.read(spark, dir.toString + "/*.avro", Seq("nope"), 0L))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("available"))
  }

  test("column pruning across schema evolution: absent field reads as null") {
    val dir = Files.createTempDirectory("avro-prune-evo")
    val v1 = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("title").endRecord()
    val v2 = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("title")
      .optionalDouble("score").endRecord()
    writeContainer(dir, "a-v1.avro", v1, Seq(
      new GenericRecordBuilder(v1).set("id", 1L).set("title", "old").build()))
    writeContainer(dir, "b-v2.avro", v2, Seq(
      new GenericRecordBuilder(v2)
        .set("id", 2L).set("title", "new").set("score", 0.75).build()))
    val df = AvroRead.read(spark, dir.toString + "/*.avro",
      columns = Seq("id", "score"), splitBytes = 0L)
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getDouble(1) == 0.75)
  }

  test("logical-type breadth: local-timestamp-micros + decimal(38,12) + fixed " +
      "round-trip TableLoader and DVT row validation") {
    // the reference's type-stress fixture (ppl_data_types.sql) exercises
    // TIMESTAMP(6) WITH[OUT] TIME ZONE and VARBYTE — the Avro twins are
    // local-timestamp-micros, bytes-decimal(38,12), and fixed
    val dir = Files.createTempDirectory("avro-types")
    val dec3812 = LogicalTypes.decimal(38, 12).addToSchema(Schema.create(Schema.Type.BYTES))
    val fixed8 = Schema.createFixed("fx8", null, null, 8)
    val s = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .name("wall").`type`(LogicalTypes.localTimestampMicros().addToSchema(
        Schema.create(Schema.Type.LONG))).noDefault()
      .name("amount").`type`(dec3812).noDefault()
      .name("raw").`type`(fixed8).noDefault()
      .endRecord()
    def amount(unscaled: String) = java.nio.ByteBuffer.wrap(
      new java.math.BigInteger(unscaled).toByteArray)
    def fx(b: Byte) = new GenericData.Fixed(fixed8, Array.fill[Byte](8)(b))
    // 2026-02-03T04:05:06.000007 wall time, in epoch micros at UTC
    val wallMicros = java.time.LocalDateTime.of(2026, 2, 3, 4, 5, 6, 7000)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 7L
    writeContainer(dir, "t.avro", s, Seq(
      new GenericRecordBuilder(s).set("id", 1L).set("wall", wallMicros)
        .set("amount", amount("123456789012345678901234567890123456")) // 38 digits scaled 12
        .set("raw", fx(0x5a.toByte)).build(),
      new GenericRecordBuilder(s).set("id", 2L).set("wall", 0L)
        .set("amount", amount("-1")).set("raw", fx(1)).build()))

    val outcome = TableLoader.load(spark, TableLoader.LoadSpec(
      table = "avro_types_tbl", sourcePath = dir.toString + "/*.avro", format = "avro"))
    assert(outcome.status == "PASS", outcome.message)
    val df = spark.table("avro_types_tbl")
    assert(df.schema("wall").dataType == TimestampNTZType)
    assert(df.schema("amount").dataType == DecimalType(38, 12))
    assert(df.schema("raw").dataType == BinaryType)
    val rows = df.orderBy("id").collect()
    // NTZ survives as wall-clock: no session-zone shift on read-back
    assert(rows(0).getAs[java.time.LocalDateTime]("wall") ==
      java.time.LocalDateTime.of(2026, 2, 3, 4, 5, 6, 7000))
    assert(rows(0).getAs[java.math.BigDecimal]("amount").toPlainString ==
      "123456789012345678901234.567890123456")
    assert(rows(1).getAs[java.math.BigDecimal]("amount").toPlainString ==
      "-0.000000000001")
    assert(rows(0).getAs[Array[Byte]]("raw").toSeq == Seq.fill(8)(0x5a.toByte))

    // DVT row validation over the loaded table: self-compare matches on
    // every row once the typed columns are cast to deterministic strings
    import org.apache.spark.sql.functions.col
    val typed = df.select(col("id"),
      col("wall").cast(StringType).as("wall_s"),
      col("amount").cast(StringType).as("amount_s"),
      org.apache.spark.sql.functions.hex(col("raw")).as("raw_s"))
    val v = graft.validate.RowValidator.validate(
      typed, typed, Seq("id"), Seq("wall_s", "amount_s", "raw_s"))
    assert(v.count() == 2)
    assert(v.filter(col("validation_status") =!= "match").count() == 0)
  }

  test("unsupported avro shapes fail loudly") {
    // multi-branch (non-nullable) union has no Spark twin
    val bad = SchemaBuilder.record("r").fields()
      .name("u").`type`().unionOf().intType().and().stringType().endUnion().noDefault()
      .endRecord()
    val e = intercept[IllegalArgumentException](AvroRead.sparkType(bad))
    assert(e.getMessage.contains("union"))
    // unknown logical types must throw, not silently load base primitives
    val timeMs = LogicalTypes.timeMillis().addToSchema(Schema.create(Schema.Type.INT))
    val badLt = SchemaBuilder.record("r2").fields()
      .name("t").`type`(timeMs).noDefault().endRecord()
    val e2 = intercept[IllegalArgumentException](AvroRead.sparkType(badLt))
    assert(e2.getMessage.contains("time-millis"))
  }
}
