package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructType}

import graft.store.{AttrValue, HDFStore}

/**
 * Structured-Streaming surface of the engine. The reference's only
 * stream-shaped operation is chunked `append` (`nimtables.nim:173-175`);
 * here that becomes a real streaming sink: micro-batches append segments
 * to an [[HDFStore]] table. Plus the standard streaming analytics the
 * `events` fixture calls for: watermarked tumbling windows and session
 * windows.
 *
 * Scale: the sink writes one segment per micro-batch per table — append
 * is metadata + new files only (never rewrites history), which is exactly
 * the behavior wanted on a 1000-executor cluster; segment compaction
 * ([[graft.table.HDFTable.compact]]) runs out-of-band.
 */
object EventStream {

  /** Normalize the fixture's `ts` (Long nanos under nanosAsLong, or a
    * timestamp) to a proper TimestampType column named `event_time`. */
  def withEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("event_time",
        // integer division — `col / 1000` would go through double and lose
        // precision beyond 2^53 (≈ ±256 ns on 2024 epoch-nanos)
        timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("event_time", col("ts").cast("timestamp"))
    }

  /** Streaming append sink into a store table. Exactly-once per batch via
    * a recorded last-batch-id attribute (idempotent replay guard — the
    * standard foreachBatch discipline). Batch ids are PER CHECKPOINT, so
    * the guard attribute is keyed by the checkpoint location: a second
    * ingestion job with its own checkpoint starts at batch 0 without
    * having its data silently dropped. Table must already exist. */
  def appendSink(stream: DataFrame, store: HDFStore, table: String,
                 checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val guardKey = "lastBatchId:" +
      java.util.UUID.nameUUIDFromBytes(checkpoint.getBytes("UTF-8")).toString
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val done = store.attr(table, guardKey) match {
          case Some(AttrValue.I64(v)) => v
          case _                      => -1L
        }
        if (batchId > done) {
          // ONE atomic manifest commit: data + guard watermark together —
          // a crash between separate commits would re-append on replay
          store.table(table).appendWithAttr(batch, Some(guardKey -> batchId))
        }
      }
      .start()
  }

  /** Watermarked tumbling-window counts per event type. The value sum
    * accumulates as exact decimal before the double cast — float
    * summation order differs between micro-batch boundaries, engines,
    * and partitionings, while decimal sums do not, so the streaming
    * result is bit-identical to the batch aggregation and a SQL oracle
    * (the `x_stream_window` gate relies on this). */
  def windowedCounts(stream: DataFrame, window: String = "30 minutes",
                     watermark: String = "1 hour"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))

  /** Streaming exact dedup — the streaming form of
    * [[graft.ops.Dedup.exact]]: keep the first document per content
    * digest, dropping any duplicate that arrives within the watermark
    * horizon (`dropDuplicatesWithinWatermark`, so state is evicted by
    * the watermark without forcing event-time into the dedup key).
    *
    * Scale: state holds one 16-byte md5 digest per distinct document
    * seen inside the horizon — documents themselves never enter the
    * state store or shuffle beyond their digest-keyed exchange — and the
    * watermark bounds that state regardless of total stream volume. */
  def dedupStream(stream: DataFrame, textCol: String, eventTimeCol: String,
                  watermark: String = "1 hour"): DataFrame =
    stream.withWatermark(eventTimeCol, watermark)
      .withColumn("_digest", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("_digest")
      .drop("_digest")

  /** Session windows (gap-based) per user — the streaming form of
    * [[graft.ops.Sessionize.sessions]]. */
  def sessionWindows(stream: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
}
