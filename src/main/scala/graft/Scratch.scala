package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the optimization round: builds
  * VARIANTS of one query in a single session and times them
  * INTERLEAVED (A,B,A,B,…), so host-level contention swings hit every
  * variant equally and the relative ordering is trustworthy even on a
  * noisy box. Not referenced by any pipeline or spec.
  */
object Scratch {
  def ivm10(s: SparkSession, dir: String, ckDlo: Boolean, ckNet: Boolean,
      ckStored: Boolean, ckAfter: Boolean): DataFrame = {
    import graft.operators.{IvmJoin, IvmFold}
    import graft.core.Exact.dec
    import graft.core.Tables
    def T(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
    def ck(df: DataFrame, on: Boolean) = if (on) df.localCheckpoint(false) else df
    val sup = T(s, dir, "supplier").select(col("s_suppkey").as("sk"),
      col("s_nationkey").as("nk"), col("s_acctbal").as("bal"))
    val cus = T(s, dir, "customer").select(col("c_custkey").as("ck"),
      col("c_nationkey").as("nk"))
    val ord = T(s, dir, "orders").select(col("o_orderkey").as("ok"),
      col("o_custkey").as("ck"), col("o_orderpriority").as("prio"))
    val repriced = pmod(col("sk"), lit(31)) === 0
    val cdropped = pmod(col("ck"), lit(89)) === 0
    val omoved = pmod(col("ok"), lit(101)) === 0
    val dS = sup.filter(repriced)
      .select(col("sk"), col("nk"), col("bal"), lit(-1L).as("__w"))
      .unionByName(sup.filter(repriced)
        .select(col("sk"), col("nk"), (col("bal") + 10.0).as("bal"),
          lit(1L).as("__w")))
    val dC = cus.filter(cdropped)
      .select(col("ck"), col("nk"), lit(-1L).as("__w"))
    val dO = ord.filter(omoved)
      .select(col("ok"), col("ck"), col("prio"), lit(-1L).as("__w"))
      .unionByName(ord.filter(omoved)
        .select(col("ok"), col("ck"),
          concat(lit("moved-"), col("prio")).as("prio"),
          lit(1L).as("__w")))
    def asSet(df: DataFrame) = df.withColumn("__mult", lit(1L))
    val d1 = IvmJoin.deltaJoinWeighted(dS, dC, asSet(sup), asSet(cus),
      Seq("nk"), "__w", "__mult", Seq("ck", "bal"))
    val dlo = ck(d1.groupBy(col("ck"), col("bal"))
      .agg(sum(col("__w")).as("__w")).filter(col("__w") =!= 0), ckDlo)
    val lo = sup.join(cus, Seq("nk"))
      .groupBy(col("ck"), col("bal")).agg(count(lit(1)).as("__mult"))
    val d2 = IvmJoin.deltaJoinWeighted(dlo, dO, lo, asSet(ord),
      Seq("ck"), "__w", "__mult", Seq("prio", "bal"))
    val net = ck(d2.groupBy(col("prio"), col("bal"))
      .agg(sum(col("__w")).as("__w")).filter(col("__w") =!= 0), ckNet)
    val stored = ck(sup.join(cus, Seq("nk")).join(ord, Seq("ck"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("bal"))).cast("decimal(28,4)").as("s"),
        min(col("bal")).as("mn"), max(col("bal")).as("mx")), ckStored)
    val sup2 = sup.select(col("sk"), col("nk"),
      when(repriced, col("bal") + 10.0).otherwise(col("bal")).as("bal"))
    val cus2 = cus.filter(!cdropped)
    val ord2 = ord.select(col("ok"), col("ck"),
      when(omoved, concat(lit("moved-"), col("prio")))
        .otherwise(col("prio")).as("prio"))
    val multisetAfter = ck(sup2.join(cus2, Seq("nk")).join(ord2, Seq("ck"))
      .groupBy(col("prio"), col("bal")).agg(count(lit(1)).as("__mult")), ckAfter)
    IvmFold.foldMinMaxWeighted(Some(stored), net, multisetAfter,
        Seq("prio"), "__w", "bal")
      .select(col("prio"), col("n"),
        col("s").cast("double").as("sum_bal"),
        col("mn").as("mn_bal"), col("mx").as("mx_bal"))
      .orderBy(col("prio"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "none " -> (() => ivm10(spark, dir, false, false, false, false)),
      "dn   " -> (() => ivm10(spark, dir, true, true, false, false)),
      "dns  " -> (() => ivm10(spark, dir, true, true, true, false)),
      "n    " -> (() => ivm10(spark, dir, false, true, false, false)))
    variants.foreach { case (_, f) => run(f()); spark.catalog.clearCache() }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to 3).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime(); run(f())
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        acc(name) = sec :: acc.getOrElse(name, Nil)
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, xs) =>
      println(f"SCRATCH $n min ${xs.min}%6.2f med ${xs.sorted.apply(xs.size / 2)}%6.2f all ${xs.reverse.map(x => f"$x%5.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
