package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream event correlation (the streaming twin of the engine's
  * as-of/range joins): two watermarked streams joined on a key plus an
  * event-time interval condition.
  *
  * The watermarks + time bound are what make this runnable forever:
  * each side buffers only rows younger than (watermark − interval), so
  * state is O(rate × window), not O(stream). Without the time bound
  * Spark would rightly refuse the join as unbounded-state.
  */
object StreamJoin {

  final case class Impression(imp_id: Long, imp_ts: Timestamp, campaign: String)
  final case class Click(imp_id: Long, click_ts: Timestamp)

  /** Clicks attributed to impressions: same imp_id, click within
    * `attributionWindow` AFTER the impression. Inner join → emits as
    * soon as both sides arrive; rows later than `lateness` drop. */
  def attribute(
      impressions: Dataset[Impression],
      clicks: Dataset[Click],
      lateness: String = "30 minutes",
      attributionWindow: String = "1 hour"): DataFrame = {
    val imp = impressions.toDF().withWatermark("imp_ts", lateness)
    val clk = clicks.toDF().withColumnRenamed("imp_id", "c_imp_id")
      .withWatermark("click_ts", lateness)
    imp.join(clk,
        col("imp_id") === col("c_imp_id") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $attributionWindow"))
      .select(col("imp_id"), col("campaign"), col("imp_ts"), col("click_ts"))
  }
}
