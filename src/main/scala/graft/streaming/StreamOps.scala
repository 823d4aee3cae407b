package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators.
  *
  * The reference has no streaming surface at all (SURVEY §2.8) — these
  * exist because a production linkage/training-data pipeline ingests
  * pages continuously: the same encode/block stages run incrementally,
  * with watermarked windows for monitoring and stateful dedup-on-entry.
  */
object StreamOps {

  /** Watermarked tumbling-window counts over an event stream —
    * the incremental form of the T1 histogram/monitoring queries. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp")) // NTZ → instant (watermarks require TIMESTAMP)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Streaming CLK encode: the batch encoder applied incrementally —
    * pages arriving on a stream get the same deterministic
    * (recId, clk, pop, bandKeys) as the batch path, so incremental
    * blocks can be unioned with historical ones. */
  def encodePages(
      pages: DataFrame,
      params: graft.LinkageParams,
      dsetIdExpr: org.apache.spark.sql.Column): DataFrame =
    graft.Linkage.encode(pages, params, dsetIdExpr).toDF()

  case class SeenState(count: Long)
  case class SeenOut(fingerprint: Long, occurrence: Long, firstSeen: Boolean)

  /** Stateful exact-dedup-on-entry: tracks per-fingerprint occurrence
    * counts with `mapGroupsWithState`; emits whether each micro-batch's
    * fingerprint was new. The streaming analogue of Dedup.exact. */
  def dedupOnEntry(fingerprints: DataFrame): DataFrame = {
    val spark = fingerprints.sparkSession
    import spark.implicits._
    fingerprints.select(col("fingerprint").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (fp: Long, rows: Iterator[Long], state: GroupState[SeenState]) =>
          val prior = state.getOption.map(_.count).getOrElse(0L)
          val n = rows.size
          state.update(SeenState(prior + n))
          SeenOut(fp, prior + n, firstSeen = prior == 0)
      }
      .toDF()
  }
}
