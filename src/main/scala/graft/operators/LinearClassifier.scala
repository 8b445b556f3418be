package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed batch perceptron — a linear quality/language classifier
  * trained ON the corpus with full-pass gradient batches (the classic
  * parallel form of Rosenblatt's rule: one pass computes the summed
  * update over every currently-misclassified row, the driver applies
  * it, repeat). Training-data pipelines use exactly this shape for
  * cheap quality classifiers (fastText-style linear scorers gating
  * what enters the training mix); the perceptron variant is chosen
  * here because with integer features, unit learning rate, and a zero
  * initial weight vector EVERY quantity in training is an integer —
  * margins, updates, weights — so the whole training trajectory is
  * exactly reproducible across engines and partitionings (no float
  * summation order anywhere) and DuckDB can replay it as chained CTEs.
  *
  * Scale shape: one map-side-combinable aggregate pass per epoch over
  * the cached feature table (partial sums of `y·x` over misclassified
  * rows; the margin test is a per-row array fold against the
  * driver-broadcast weight literal). The driver holds only the weight
  * vector (dim longs) — the same per-round driver footprint as
  * [[Similarity.kmeansCentroids]]'s centroid table, and the natural
  * one: batch training IS an iterated aggregate. Nothing else leaves
  * the executors; epochs × one-shuffle-free pass is the entire cost.
  */
object LinearClassifier {

  /** (id, y, x) rows: y = +1 where `labelCol == positive` else -1, and
    * x = [1, n_words, n_distinct_words] — a bias term plus two integer
    * text statistics. The token array is bound once as a lambda
    * variable before both stats read it (Catalyst subexpression
    * elimination does not descend into lambdas, see
    * [[TextOps.wordNGrams]]), so the regex split runs once per row. */
  def featureTable(
      docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, positive: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      when(col(labelCol) === positive, 1L).otherwise(-1L).as("y"),
      element_at(
        transform(array(TextOps.words(col(textCol))), w =>
          array(lit(1L), size(w).cast("long"),
            size(array_distinct(w)).cast("long"))),
        1).as("x"))

  /** `w · x` for a driver-held integer weight vector: a fixed-order
    * fold over the feature array. Order is irrelevant here (integer
    * addition is associative) — the fold is just the codegen-friendly
    * no-UDF way to dot a literal into an array column. */
  def dot(x: Column, w: Seq[Long]): Column =
    aggregate(
      zip_with(x, array(w.map(lit): _*), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)

  /** One trained epoch: the miss count seen at `before` and the
    * updated weights `after` (= before + Σ y·x over missed rows). */
  final case class Epoch(epoch: Int, nMiss: Long, before: Seq[Long], after: Seq[Long])

  /** The one-pass epoch aggregate: a 1-row frame (d0..d{dim-1}, n_miss)
    * of summed `y·x` updates over rows misclassified by `w`. This is
    * the entire distributed cost of an epoch — a global aggregate with
    * map-side partials (shape pinned in PlanAuditSpec), the weight
    * vector riding as a plan literal. */
  def epochUpdate(feat: DataFrame, w: Seq[Long]): DataFrame = {
    val miss = (col("y") * dot(col("x"), w)) <= 0
    val aggs = w.indices.map(j =>
      sum(when(miss, col("y") * element_at(col("x"), j + 1))
        .otherwise(0L)).as(s"d$j")) :+
      sum(when(miss, 1L).otherwise(0L)).as("n_miss")
    feat.select(col("y"), col("x")).agg(aggs.head, aggs.tail: _*)
  }

  /** Run `epochs` full-batch perceptron passes from w = 0. A row is
    * misclassified when `y·(w·x) <= 0` (ties count as misses — the
    * zero-margin convention that makes epoch 1 update over every row).
    * The feature table is cached for the duration of training and
    * released on every exit path. */
  def trainPerceptron(feat: DataFrame, dim: Int, epochs: Int): Seq[Epoch] = {
    require(dim >= 1, s"need dim >= 1, got $dim")
    require(epochs >= 1, s"need epochs >= 1, got $epochs")
    val f = feat.select(col("y"), col("x")).cache()
    try {
      var w = Seq.fill(dim)(0L)
      (1 to epochs).map { e =>
        val row = epochUpdate(f, w).collect()(0)
        val delta = (0 until dim).map(j => if (row.isNullAt(j)) 0L else row.getLong(j))
        val before = w
        w = w.lazyZip(delta).map(_ + _)
        Epoch(e, if (row.isNullAt(dim)) 0L else row.getLong(dim), before, w)
      }
    } finally f.unpersist()
  }

  /** The training trajectory as a (epoch, n_miss, w) table — w is the
    * post-update weight vector, so the last row is the trained model. */
  def trace(spark: SparkSession, epochs: Seq[Epoch]): DataFrame = {
    import spark.implicits._
    epochs.map(e => (e.epoch, e.nMiss, e.after)).toDF("epoch", "n_miss", "w")
  }

  /** Score rows of a feature table with a trained weight vector:
    * (id, score, pass) where score = w·x (integer margin) and pass =
    * score > 0. Per-row fold against the broadcast literal — map-only,
    * the deployment face of the trained model. */
  def scoreWith(feat: DataFrame, w: Seq[Long]): DataFrame =
    feat.select(col("id"), dot(col("x"), w).as("score"))
      .withColumn("pass", col("score") > 0)
}
