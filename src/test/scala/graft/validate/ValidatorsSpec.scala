package graft.validate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.validate.ColumnValidator.AggSpec

/** Semantics of the DVT-style validators (SURVEY §2.5 A7-A9). */
class ValidatorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "validate-test")

  def df(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("id", "grp", "v")
  }

  test("ColumnValidator: identical sides pass, differing sides fail") {
    val src = df(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0)))
    val out = ColumnValidator.validate(src, src,
      Seq(AggSpec("count", "v"), AggSpec("sum", "v")), groupBy = Seq("grp"))
      .collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[String]("validation_status") == "pass"))

    val tgt = df(Seq((1L, "a", 10.0), (3L, "b", 5.0))) // 'a' sum/count differ
    val out2 = ColumnValidator.validate(src, tgt,
      Seq(AggSpec("sum", "v")), groupBy = Seq("grp")).collect()
    val byGrp = out2.map(r => r.getAs[String]("grp") -> r.getAs[String]("validation_status")).toMap
    assert(byGrp("a") == "fail" && byGrp("b") == "pass")
  }

  test("ColumnValidator: missing group on one side fails") {
    val src = df(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    val tgt = df(Seq((1L, "a", 1.0)))
    val out = ColumnValidator.validate(src, tgt, Seq(AggSpec("sum", "v")),
      groupBy = Seq("grp")).collect()
    val b = out.find(_.getAs[String]("grp") == "b").get
    assert(b.getAs[String]("validation_status") == "fail")
    assert(b.getAs[Any]("target_agg_value") == null)
  }

  test("ColumnValidator: zero-source convention (0=0 pass, 0->x fail)") {
    val src = df(Seq((1L, "a", 0.0)))
    val tgtSame = df(Seq((1L, "a", 0.0)))
    val tgtDiff = df(Seq((1L, "a", 3.0)))
    val pass = ColumnValidator.validate(src, tgtSame, Seq(AggSpec("sum", "v")),
      groupBy = Seq("grp")).head()
    val fail = ColumnValidator.validate(src, tgtDiff, Seq(AggSpec("sum", "v")),
      groupBy = Seq("grp")).head()
    assert(pass.getAs[String]("validation_status") == "pass")
    assert(fail.getAs[String]("validation_status") == "fail")
    assert(fail.getAs[Any]("pct_difference") == null)
  }

  test("ColumnValidator: pct threshold tolerates small drift") {
    val src = df(Seq((1L, "a", 100.0)))
    val tgt = df(Seq((1L, "a", 100.5)))
    val strict = ColumnValidator.validate(src, tgt, Seq(AggSpec("sum", "v")),
      groupBy = Seq("grp"), pctThreshold = 0.0).head()
    val loose = ColumnValidator.validate(src, tgt, Seq(AggSpec("sum", "v")),
      groupBy = Seq("grp"), pctThreshold = 1.0).head()
    assert(strict.getAs[String]("validation_status") == "fail")
    assert(loose.getAs[String]("validation_status") == "pass")
  }

  test("RowValidator: match/mismatch/source_only/target_only") {
    val src = df(Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0)))
    val tgt = df(Seq((1L, "x", 1.0), (2L, "CHANGED", 2.0), (4L, "w", 4.0)))
    val out = RowValidator.validate(src, tgt, Seq("id"), Seq("grp"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("validation_status")).toMap
    assert(out == Map(1L -> "match", 2L -> "mismatch", 3L -> "source_only", 4L -> "target_only"))
  }

  test("RowValidator: sampling restricts to n source keys") {
    val src = df((1L to 100L).map(i => (i, s"g$i", i.toDouble)))
    val out = RowValidator.validateSample(src, src, Seq("id"), Seq("grp"), 10)
    assert(out.count() == 10)
    assert(out.filter(col("validation_status") === "match").count() == 10)
  }

  test("SchemaValidator: pass/type_mismatch/only + exclusions + allow-list") {
    import spark.implicits._
    val src = Seq((1L, "a", 1.0)).toDF("id", "name", "v")
    val tgt = Seq((1, "a", true)).toDF("id", "name", "flag")
    val out = SchemaValidator.validate(spark, src, tgt)
      .collect().map(r => r.getAs[String]("column_name") -> r.getAs[String]("validation_status")).toMap
    assert(out == Map("id" -> "type_mismatch", "name" -> "pass",
      "v" -> "source_only", "flag" -> "target_only"))

    val allowed = SchemaValidator.validate(spark, src, tgt,
      exclusionColumns = Set("v", "flag"),
      allowList = Map("bigint" -> Set("int")))
      .collect().map(_.getAs[String]("validation_status"))
    assert(allowed.forall(_ == "pass"))
  }

  test("CustomQueryValidator: scalar compare with threshold") {
    import spark.implicits._
    Seq((1, 10.0), (2, 20.0)).toDF("k", "v").createOrReplaceTempView("cq_t")
    val out = CustomQueryValidator.validate(spark,
      "SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(v) AS DOUBLE) AS sv FROM cq_t",
      "SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(v) AS DOUBLE) AS sv FROM cq_t WHERE k = 1",
      pctThreshold = 60.0)
      .collect().map(r => r.getAs[String]("validation_name") -> r.getAs[String]("validation_status")).toMap
    // n: 1 vs 2 = -50% (within 60) pass; sv: 10 vs 30 = -66.7% fail
    assert(out == Map("n" -> "pass", "sv" -> "fail"))
  }

  test("DistributionValidator: catches a shift every column aggregate misses") {
    import spark.implicits._
    // same count (10), min (1), max (9), sum/avg (50/5) — the mass just
    // moved from the middle to the extremes
    val src = Seq(1, 2, 3, 4, 5, 5, 6, 7, 8, 9).toDF("x")
    val tgt = Seq(1, 1, 1, 1, 5, 5, 9, 9, 9, 9).toDF("x")
    val aggs = ColumnValidator.validate(src, tgt,
      Seq(AggSpec("count", "x"), AggSpec("sum", "x"), AggSpec("min", "x"),
        AggSpec("max", "x"), AggSpec("avg", "x"))).collect()
    assert(aggs.forall(_.getAs[String]("validation_status") == "pass"),
      "premise broken: an aggregate already catches this shift")
    val dist = DistributionValidator.validate(src, tgt, Seq("x"),
      ps = Seq(0.25, 0.5, 0.75)).collect()
      .map(r => r.getAs[Double]("p") -> r.getAs[String]("validation_status")).toMap
    // p25: 3.25 vs 1, p75: 6.75 vs 9 — fail; the median is 5 on both
    assert(dist == Map(0.25 -> "fail", 0.5 -> "pass", 0.75 -> "fail"))
  }

  test("DistributionValidator: nulls excluded; a side with no values fails, not errors") {
    import spark.implicits._
    val src = Seq[Option[Int]](Some(1), Some(2), Some(3), None).toDF("x")
    val same = Seq[Option[Int]](Some(1), None, Some(2), Some(3)).toDF("x")
    val out = DistributionValidator.validate(src, same, Seq("x"), ps = Seq(0.5))
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("validation_status") == "pass"
      && out.head.getAs[Double]("source_value") == 2.0)
    // target all-null: its profile is empty → the source rows fail with
    // a null target side (the full-outer keeps the source profile)
    val empty = Seq[Option[Int]](None, None).toDF("x")
    val out2 = DistributionValidator.validate(src, empty, Seq("x"), ps = Seq(0.5))
      .collect()
    assert(out2.length == 1 && out2.head.getAs[String]("validation_status") == "fail"
      && out2.head.isNullAt(out2.head.fieldIndex("target_value")))
  }

  test("Uniqueness: clean key, duplicated key, null keys counted apart, composite key") {
    import spark.implicits._
    val clean = Seq(1, 2, 3).toDF("k")
    val duped = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    val nulls = Seq[Option[Int]](Some(1), None, None, Some(1)).toDF("k")
    val comp = Seq((1, "a"), (1, "b"), (1, "a")).toDF("k1", "k2")
    val out = Uniqueness.check(Seq(
        Uniqueness.Key("clean", clean, Seq("k")),
        Uniqueness.Key("duped", duped, Seq("k")),
        Uniqueness.Key("nulls", nulls, Seq("k")),
        Uniqueness.Key("comp", comp, Seq("k1", "k2"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("clean") == ((3L, 0L, 0L, 0L, 1L)))
    // 1×3 + 3×1: two duplicate keys, 3 excess rows, max multiplicity 3
    assert(out("duped") == ((6L, 0L, 2L, 3L, 3L)))
    // the two NULL rows are null_key_rows, NOT duplicates; the two 1s are
    assert(out("nulls") == ((4L, 2L, 1L, 1L, 2L)))
    // composite: (1,a) twice, (1,b) once
    assert(out("comp") == ((3L, 0L, 1L, 1L, 2L)))
  }

  test("DistributionValidator: bucketLocate path is bit-identical to the window path on the real table") {
    val src = graft.core.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val tgt = src.filter(org.apache.spark.sql.functions.col("l_quantity") <= 45.0)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def rows(bucketLocate: Option[Boolean]) =
      DistributionValidator.validate(src, tgt, cols, pctThreshold = 2.0,
          bucketLocate = bucketLocate)
        .orderBy("column_name", "p").collect().toSeq
    val forcedBucket = rows(Some(true))
    assert(forcedBucket == rows(Some(false)))
    // the default (auto) resolves to ONE of the two shapes — either
    // way the rows must be the same bits
    assert(forcedBucket == rows(None))
  }

  test("DistributionValidator: the auto shape decision follows the size estimate, not a counting job") {
    import org.apache.spark.sql.functions._
    // spark.range estimates 8 bytes/row, so the threshold in rows is
    // exact and NO job runs — stats are plan estimates by design
    val rowsAt = DistributionValidator.AutoBucketLocateBytes / 8L
    val small = spark.range(rowsAt / 2).toDF("x")
    val big = spark.range(rowsAt * 2).toDF("x")
    assert(!DistributionValidator.autoBucketLocate(small))
    assert(DistributionValidator.autoBucketLocate(big))
    // a filter narrows the estimate but never inflates it: a filtered
    // small side still picks the window shape
    assert(!DistributionValidator.autoBucketLocate(
      small.filter(col("x") % 2 === 0)))
  }

  test("DistributionValidator: the auto decision changes the PLAN, not just a flag") {
    val rowsAt = DistributionValidator.AutoBucketLocateBytes / 8L
    def plan(n: Long): String = {
      val df = spark.range(n).toDF("x")
      DistributionValidator.validate(df, df, Seq("x"), ps = Seq(0.5))
        .queryExecution.optimizedPlan.toString
    }
    // cum_before is the bucket-locate pass's cumulative-bucket-count
    // column (ScalableQuantile) — in the plan exactly when the bucket
    // shape was chosen; no job runs, the pin reads the optimized plan
    assert(!plan(rowsAt / 2).contains("cum_before"))
    assert(plan(rowsAt * 2).contains("cum_before"))
  }

  test("DistributionValidator: equi-depth boundaries answer identically on a skew-adversarial column") {
    import org.apache.spark.sql.functions._
    // the equi-width collapse profile: mass on tie-points near zero
    // plus sparse large outliers — both modes must agree bit-for-bit
    // (and with the window shape, which autoBucketLocate would pick
    // for a frame this small if not forced)
    val df = spark.range(0, 2000).toDF("id")
      .select(when(col("id") % 400 === 0, col("id").cast("double") * 1e6)
        .otherwise((col("id") % 25).cast("double") * 1e-9).as("x"))
    def rows(bucketLocate: Option[Boolean], equiDepth: Boolean) =
      DistributionValidator.validate(df, df, Seq("x"),
          bucketLocate = bucketLocate, equiDepth = equiDepth)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val window = rows(Some(false), equiDepth = false)
    assert(rows(Some(true), equiDepth = true) == window)
    assert(rows(Some(true), equiDepth = false) == window)
  }
}
