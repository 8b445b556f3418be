package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Content-defined chunking: lossless token coverage, boundary rule
  * fidelity, the CDC edit-locality property (an edit reshapes only the
  * chunks it touches), and the degenerate-input contract. */
class CdcChunkerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "cdc-test")

  private val D = 16

  private def chunks(rows: (Long, String)*): Map[Long, Seq[(Int, String, Int)]] = {
    import spark.implicits._
    Chunker.contentDefined(rows.toDF("doc_id", "text"), "doc_id", "text", D)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
          .sortBy(_._1).toSeq
      }
  }

  private def randText(rnd: Random, n: Int): String =
    (0 until n).map(_ => s"tok${rnd.nextInt(500)}").mkString(" ")

  test("chunks concatenate losslessly and token counts sum") {
    val rnd = new Random(7)
    val docs = (1 to 10).map(d => d.toLong -> randText(rnd, 20 + rnd.nextInt(200)))
    val m = chunks(docs: _*)
    docs.foreach { case (id, text) =>
      val norm = text.trim.toLowerCase.split("\\s+").toSeq
      val cs = m(id)
      assert(cs.map(_._1) == cs.indices, s"doc $id chunk_idx not dense")
      assert(cs.flatMap(_._2.split(" ")) == norm, s"doc $id lossy")
      assert(cs.map(_._3).sum == norm.size)
    }
  }

  test("every chunk start (except the first) is a divisible-hash token") {
    val rnd = new Random(13)
    val docs = (1 to 5).map(d => d.toLong -> randText(rnd, 150))
    val m = chunks(docs: _*)
    // recompute the boundary rule with the operator's own hash, one job
    import spark.implicits._
    val hashOf = docs.flatMap(_._2.split(" ")).distinct.toDF("t")
      .select(col("t"), TextOps.hexHash60(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").toSeq
      m(id).zipWithIndex.foreach { case ((_, ctext, _), i) =>
        val first = ctext.split(" ").head
        if (i > 0) assert(hashOf(first) % D == 0,
          s"doc $id chunk $i starts at non-boundary token '$first'")
        // interior tokens of a chunk are never boundaries
        ctext.split(" ").drop(1).foreach(t =>
          assert(hashOf(t) % D != 0, s"doc $id chunk $i swallows boundary '$t'"))
      }
      assert(m(id).head._2.split(" ").head == toks.head.toLowerCase)
    }
  }

  test("edit locality: chunks after the first boundary past the edit are unchanged") {
    val rnd = new Random(99)
    val base = (0 until 300).map(_ => s"tok${rnd.nextInt(500)}")
    // insert 3 tokens near the front — CDC must realign downstream
    val edited = base.take(5) ++ Seq("ins0", "ins1", "ins2") ++ base.drop(5)
    val m = chunks(1L -> base.mkString(" "), 2L -> edited.mkString(" "))
    val (a, b) = (m(1L).map(_._2), m(2L).map(_._2))
    // every base chunk except the leading (edited) ones reappears verbatim
    val common = a.toSet.intersect(b.toSet)
    assert(common.size >= a.toSet.size - 2,
      s"edit reshaped ${a.toSet.size - common.size} of ${a.toSet.size} chunks; CDC should localize")
    // fixed-size chunking over the same edit realigns NOTHING after the
    // insertion point — pin the contrast that motivates CDC
    import spark.implicits._
    def fixed(rows: (Long, String)*) =
      Chunker.chunk(rows.toDF("doc_id", "text"), "doc_id", "text", 16, 0)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rs) => id -> rs.map(_.getString(2)).toSet }
    val f = fixed(1L -> base.mkString(" "), 2L -> edited.mkString(" "))
    assert(common.size > f(1L).intersect(f(2L)).size,
      "CDC should preserve strictly more chunks across an edit than fixed-size")
  }

  test("degenerate inputs: null and empty text yield one empty chunk") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = Chunker.contentDefined(df, "doc_id", "text", D)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(got.sortBy(_._1).toSeq ==
      Seq((1L, 0, "", 1), (2L, 0, "", 1), (3L, 0, "solo", 1)))
  }

  test("divisor is validated") {
    import spark.implicits._
    val df = Seq(1L -> "a").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.contentDefined(df, "doc_id", "text", 1)
    }
  }
}
