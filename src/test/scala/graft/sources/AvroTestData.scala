package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}

/** Shared avro test fixture: the 5-field wide multi-block container the
  * pruning tests (RDD path and DSv2 path) both decode — one writer so
  * the two suites cannot silently diverge on the fixture. */
object AvroTestData {

  val wideSchema: Schema = SchemaBuilder.record("r").fields()
    .requiredLong("id").requiredString("a").requiredString("b")
    .requiredString("c").requiredDouble("x").endRecord()

  /** n records (id 1..n, x = id·xStep, 20-char string pads) in one
    * container with a tiny sync interval → many avro blocks. */
  def writeWide(dir: java.nio.file.Path, n: Int, xStep: Double): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](wideSchema))
    w.setSyncInterval(64)
    w.create(wideSchema, dir.resolve("wide.avro").toFile)
    (1L to n.toLong).foreach(i => w.append(
      new GenericRecordBuilder(wideSchema).set("id", i).set("a", "a" * 20)
        .set("b", "b" * 20).set("c", "c" * 20).set("x", i * xStep).build()))
    w.close()
  }
}
