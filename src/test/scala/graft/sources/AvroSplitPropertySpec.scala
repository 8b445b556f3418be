package graft.sources

import java.nio.file.Files

import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property form of the sync-marker split contract: for ANY split size
  * (including sizes around and past the container length), every record
  * is decoded exactly once — no loss at range boundaries, no
  * double-decode of the block straddling one. The fixed-size cases in
  * AvroReadSpec pin known pathologies; this generalizes them, for the
  * plain and the column-pruned read alike. */
object AvroSplitPropertySpec extends Properties("AvroSplits") {

  // each trial runs a full Spark read — keep the trial count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = graft.core.GraftSession.local("4", "avro-split-prop")

  private val schema = SchemaBuilder.record("r").fields()
    .requiredLong("id").requiredString("pad").endRecord()

  /** (container dir, file length, record count) — one multi-block and
    * one sparse-sync container, built once. */
  private lazy val containers: Seq[(String, Long, Int)] =
    Seq((137, 40), (311, 64)).map { case (n, sync) =>
      val dir = Files.createTempDirectory("avro-prop")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setSyncInterval(sync)
      w.create(schema, dir.resolve("c.avro").toFile)
      (1 to n).foreach(i => w.append(
        new GenericRecordBuilder(schema).set("id", i.toLong)
          .set("pad", "x" * (i % 37 + 1)).build()))
      w.close()
      (dir.toString, Files.size(dir.resolve("c.avro")), n)
    }

  private val pick: Gen[(Int, Long)] = for {
    c <- Gen.chooseNum(0, 1)
    sb <- Gen.chooseNum(1L, containers(c)._2 + 16)
  } yield (c, sb)

  property("every splitBytes decodes each record exactly once") =
    Prop.forAllNoShrink(pick) { case (c, sb) =>
      val (dir, _, n) = containers(c)
      val ids = AvroRead.read(spark, dir + "/*.avro", splitBytes = sb)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      Prop(ids == (1L to n)) :| s"container=$c splitBytes=$sb"
    }

  property("pruned reads obey the same ownership contract") =
    Prop.forAllNoShrink(pick) { case (c, sb) =>
      val (dir, _, n) = containers(c)
      val ids = AvroRead.read(spark, dir + "/*.avro", Seq("id"), sb)
        .collect().map(_.getLong(0)).sorted.toSeq
      Prop(ids == (1L to n)) :| s"container=$c splitBytes=$sb"
    }
}
