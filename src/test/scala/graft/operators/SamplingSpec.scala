package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling: reproducible across partitionings, k per
  * group, uniform-ish coverage. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "sample-test")

  def data(parts: Int) = {
    import spark.implicits._
    (1 to 1000).map(i => (if (i % 3 == 0) "a" else "b", i.toLong))
      .toDF("g", "id").repartition(parts)
  }

  test("bottomK: same k rows whatever the partitioning") {
    def run(parts: Int) = Sampling.bottomK(data(parts), "id", 25)
      .select("id", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).toSeq
    val a = run(2)
    assert(a == run(16))
    assert(a.length == 25 && a.map(_._2) == (1 to 25))
  }

  test("stratified: exactly k per group, deterministic") {
    def run(parts: Int) = Sampling.stratified(data(parts), Seq("g"), "id", 10)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s = run(3)
    assert(s == run(13))
    assert(s.count(_._1 == "a") == 10 && s.count(_._1 == "b") == 10)
  }

  test("splitAssign: total coverage, expected proportions, incremental-consistent") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.splitAssign(df, "id", splits, seed = 5)
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = assign(data(4))
    // every row assigned, proportions within multinomial noise
    assert(m.size == 1000)
    val frac = m.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.04, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.04, frac.toString)
    // growing the corpus never reassigns an existing row
    val half = assign(data(4).filter($"id" <= 500))
    assert(half.forall { case (id, s) => m(id) == s })
    // partition-invariant
    assert(assign(data(16)) == m)
    // guards: fractions must sum to 1 and be positive
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(data(2), "id", Seq("a" -> 0.5, "b" -> 0.4), 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(data(2), "id", Seq("a" -> 1.0), 1)
    }
  }

  test("proportionalInterleave: sorting by (ikey, stratum, pos) yields the weighted schedule") {
    import spark.implicits._
    val df = ((1L to 30L).map(i => ("a", i)) ++ (31L to 40L).map(i => ("b", i)))
      .toDF("g", "id")
    val keyed = Sampling.proportionalInterleave(df.repartition(5), "g", "id",
        Map("a" -> 3), defaultWeight = 1)
      .select("g", "id", "pos", "ikey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val schedule = keyed.sortBy(t => (t._4, t._1, t._3))
    // every prefix of length 4k holds 3k a's and k b's (weights 3:1)
    for (k <- 1 to 10) {
      val prefix = schedule.take(4 * k)
      assert(prefix.count(_._1 == "a") == 3 * k, s"k=$k: $prefix")
    }
    // ids appear in order within each stratum
    assert(schedule.filter(_._1 == "a").map(_._2).toSeq == (1L to 30L))
    intercept[IllegalArgumentException] {
      Sampling.proportionalInterleave(df, "g", "id", Map("a" -> 0), 1)
    }
  }

  test("weightedUpsample: expected copies per stratum, deterministic, incremental-consistent") {
    import spark.implicits._
    val rates = Map("a" -> 2.5, "b" -> 0.25)
    def copies(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedUpsample(df, "g", "id", rates, defaultRate = 1.0, seed = 3)
        .groupBy("g", "id").count().collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m = copies(data(4))
    // stratum a: every row 2 or 3 copies; b: 0 or 1; fraction ≈ rate
    val aCopies = m.collect { case (("a", _), c) => c }
    assert(aCopies.forall(c => c == 2L || c == 3L))
    assert(math.abs(aCopies.sum.toDouble / aCopies.size - 2.5) < 0.15)
    val bIds = (1 to 1000).filter(_ % 3 != 0)
    val bKept = m.collect { case (("b", _), c) => c }
    assert(bKept.forall(_ == 1L)) // zero-copy rows are absent, not 0-counted
    assert(math.abs(bKept.size.toDouble / bIds.size - 0.25) < 0.1)
    // growing the corpus never changes an existing row's copy count
    val half = copies(data(4).filter($"id" <= 500))
    assert(half.forall { case (k, c) => m(k) == c })
    // copy_idx is dense 0..n-1 per row
    val idx = Sampling.weightedUpsample(data(2), "g", "id", rates, 1.0, seed = 3)
      .filter($"g" === "a").groupBy("id")
      .agg(sort_array(collect_list($"copy_idx")).as("is"))
      .collect().map(_.getSeq[Long](1))
    assert(idx.forall(is => is == (0L until is.size)))
  }

  test("temperatureRates: α=1 keeps everything, α=0 levels to the scarcest, α=0.5 is sqrt") {
    val counts = Map("en" -> 400L, "fr" -> 100L, "zh" -> 25L)
    assert(Sampling.temperatureRates(counts, 1.0) ==
      Map("en" -> 1.0, "fr" -> 1.0, "zh" -> 1.0))
    assert(Sampling.temperatureRates(counts, 0.0) ==
      Map("en" -> 25.0 / 400, "fr" -> 0.25, "zh" -> 1.0))
    val half = Sampling.temperatureRates(counts, 0.5)
    assert(half("zh") == 1.0 && half("fr") == 0.5 && half("en") == 0.25)
    intercept[IllegalArgumentException](Sampling.temperatureRates(counts, 1.5))
    intercept[IllegalArgumentException](
      Sampling.temperatureRates(Map("x" -> 0L), 0.5))
  }

  test("temperatureSample: kept sets match the independent rate-threshold reference") {
    import spark.implicits._
    val rows = (1L to 900L).map(i =>
      (i, if (i % 9 == 0) "zh" else if (i % 3 == 0) "fr" else "en"))
    val df = rows.toDF("id", "lang").repartition(5)
    val kept = Sampling.temperatureSample(df, "lang", "id", alpha = 0.5, seed = 11)
      .collect().map(_.getLong(0)).toSet
    // independent reference: recompute rates and thresholds by hand
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cmin = counts.values.min.toDouble
    def refHash(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val expect = rows.filter { case (i, l) =>
      refHash(s"11:$i") <
        (math.sqrt(cmin / counts(l)) * (1L << 60).toDouble).toLong
    }.map(_._1).toSet
    assert(kept == expect)
    // the dominant language thins hardest; the scarcest keeps all
    val keptByLang = rows.filter(r => kept(r._1)).groupBy(_._2).view.mapValues(_.size).toMap
    assert(keptByLang("zh") == counts("zh"))
    assert(keptByLang("en") < counts("en").toInt / 2)
  }

  test("temperatureSample: null strata fail loudly (defaultRate fallthrough trap)") {
    import spark.implicits._
    val df = Seq((1L, "en"), (2L, null.asInstanceOf[String]), (3L, "en"))
      .toDF("id", "lang")
    val e = intercept[IllegalArgumentException](
      Sampling.temperatureSample(df, "lang", "id", alpha = 0.5, seed = 1))
    assert(e.getMessage.contains("null"))
  }

  test("hash order is not id order (actually pseudo-random)") {
    val ids = Sampling.bottomK(data(4), "id", 20)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids != ids.sorted)
  }
}
