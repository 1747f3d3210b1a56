package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Event-stream operators over the `events` fixture (batch forms; the
 * streaming forms live in `graft.streaming`).
 *
 * Scale note: all windows partition by `user_id` — state for one user fits
 * one task; the only shuffle is the hash partition on user, identical to
 * what a 1000-executor run needs.
 */
object Sessionize {

  /** Epoch seconds of the `ts` column. Parquet TIMESTAMP(NANOS) is not a
    * Spark type: with `spark.sql.legacy.parquet.nanosAsLong=true` it reads
    * as Long nanoseconds — handle both representations. */
  private def secOf(events: DataFrame): org.apache.spark.sql.Column =
    events.schema("ts").dataType match {
      case LongType => expr("ts div 1000000000")
      case _        => expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
    }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSeconds`. Adds
    * `session_id` (0-based per user) and `sec` (epoch seconds). */
  def sessions(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val sec = secOf(events)
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val withGap = events.withColumn("sec", sec)
      .withColumn("_prev", lag("sec", 1).over(w))
      .withColumn("_new", when(col("_prev").isNull ||
        col("sec") - col("_prev") > gapSeconds, 1L).otherwise(0L))
    withGap
      .withColumn("session_id",
        sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_prev", "_new")
  }

  /** Per-session stats. */
  def sessionStats(events: DataFrame, gapSeconds: Long = 1800): DataFrame =
    sessions(events, gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("sec") - min("sec")).as("duration_sec"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))

  /** Tumbling-window counts — batch analog of the streaming windowed agg:
    * bucket = epoch-seconds div windowSeconds. */
  def tumbling(events: DataFrame, windowSeconds: Long = 1800): DataFrame =
    events
      .withColumn("bucket", secOf(events).divide(windowSeconds).cast(LongType))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
}
