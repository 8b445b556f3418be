package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity validation — the DVT check the column/row/
  * schema validators don't cover: for each declared FK relationship,
  * how many child rows point at no parent (orphans). A migration that
  * loads tables independently can silently break FKs the source
  * enforced; this is the post-load audit that catches it.
  *
  * Shape per relation: the parent's DISTINCT key column (key-sized)
  * left-joins under the child — one keyed exchange each, orphans
  * counted as a combinable aggregate; relations union into one result
  * frame, so the whole audit is a single action. NULL child keys are
  * counted separately (`null_keys`), not as orphans — SQL FKs ignore
  * NULLs, and conflating the two hides which discipline was broken. */
object RefIntegrity {

  final case class Relation(
      name: String, child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String)

  /** (relation, total_rows, null_keys, orphans) per declared FK. */
  def check(relations: Seq[Relation]): DataFrame = {
    require(relations.nonEmpty, "need at least one relation")
    relations.map { r =>
      val parentKeys = r.parent.select(col(r.pkCol).as("__pk")).distinct()
        .withColumn("__hit", lit(1))
      r.child.select(col(r.fkCol).as("__fk"))
        .join(parentKeys, col("__fk") === col("__pk"), "left")
        .agg(
          count(lit(1)).as("total_rows"),
          sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("null_keys"),
          sum(when(col("__fk").isNotNull && col("__hit").isNull, 1L)
            .otherwise(0L)).as("orphans"))
        .select(lit(r.name).as("relation"), col("total_rows"),
          col("null_keys"), col("orphans"))
    }.reduce(_ unionByName _)
  }
}
