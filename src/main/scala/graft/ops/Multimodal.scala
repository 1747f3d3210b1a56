package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads are opaque
 * `BinaryType` columns with a typed metadata struct beside them. The
 * Spark-side contract (schema, batch shape, partition discipline) is real
 * and tested; the actual media decode is STUBBED behind [[decodeStub]] —
 * this container has no image/audio libraries, so the stub derives
 * deterministic fake properties from the bytes. A production deployment
 * swaps `decodeStub` for a JNI/ImageIO call without touching anything else.
 *
 * Scale notes: payloads never pass through a shuffle (all derivations are
 * map-side); `featurize` uses `mapPartitions` so a real decoder can batch
 * per-partition (model-per-partition, JNI context reuse) — the Scala
 * equivalent of a Pandas-UDF `mapInPandas` batch contract.
 */
object Multimodal {

  /** One decoded-media metadata record. */
  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  /** Featurized media row (what a vision tower would emit). */
  case class MediaFeatures(id: Long, nBytes: Long, features: Array[Float])

  /** Attach a binary payload column. For the fixture tables the payload is
    * the UTF-8 text — a stand-in with realistic size distribution. */
  def attachPayload(df: DataFrame, textCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /** ===== the pluggable decode boundary =====
    * Deterministic fake decode: "dimensions" derived from the payload's
    * sha-256. Replace with a real decoder (`javax.imageio`, ffmpeg JNI…)
    * in production; everything downstream only sees the struct. */
  def decodeStub(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val h = conv(substring(sha2(col(payloadCol), 256), 1, 15), 16, 10).cast(LongType)
    df.withColumn("media_meta", struct(
      lit("fake-rgb").as("format"),
      (pmod(h, lit(512L)) + 64L).cast(IntegerType).as("width"),
      (pmod(shiftright(h, 9), lit(512L)) + 64L).cast(IntegerType).as("height"),
      length(col(payloadCol)).cast(LongType).as("nBytes")))
  }

  /** Frame sampling (video analog): n evenly spaced byte-slices of the
    * payload as an array of binary "frames". Pure expressions. */
  def frameSample(df: DataFrame, n: Int, payloadCol: String = "payload"): DataFrame = {
    val len = length(col(payloadCol))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(col(payloadCol), (i * greatest(len / n, lit(1)) + 1).cast(IntegerType),
          greatest(len / n, lit(1)).cast(IntegerType))))
  }

  /** Resize (image analog): deterministic fake that CROPS the payload to
    * the clamped `width × height` byte budget and rewrites the metadata
    * struct beside it — the plumbing contract (payload + decoded meta
    * in, `resized` payload + `resized_meta` out, pure map-side
    * expressions, no shuffle) is real; a production deployment swaps the
    * crop for a real scaler behind the same signature. Requires
    * [[decodeStub]]'s `media_meta` upstream.
    *
    * Null handling, explicit: a row whose decoded dims are NULL (a
    * failed decode) gets a NULL `resized` payload and NULL dims in
    * `resized_meta` — the row survives so the pipeline can route or
    * count failures, rather than dropping them silently. The byte
    * budget multiplies in LONG (two clamped ints can overflow 32-bit:
    * 65536×65536 is negative in int) and is capped at Int.MaxValue,
    * the JVM byte-array bound `substr` can address. */
  def resizeStub(df: DataFrame, maxW: Int, maxH: Int,
                 payloadCol: String = "payload"): DataFrame = {
    require(maxW > 0 && maxH > 0, s"target dims must be positive, got ($maxW, $maxH)")
    val meta = col("media_meta")
    val anyNull = meta.getField("width").isNull || meta.getField("height").isNull
    // `least` SKIPS nulls (a missing dim would silently clamp to the
    // target) — null dims must null the clamped dims explicitly
    def clamp(f: Column, m: Int): Column =
      when(anyNull, lit(null).cast(IntegerType)).otherwise(least(f, lit(m)))
    val w = clamp(meta.getField("width"), maxW)
    val h = clamp(meta.getField("height"), maxH)
    val budget = least(w.cast(LongType) * h.cast(LongType),
      lit(Int.MaxValue.toLong)).cast(IntegerType)
    df.withColumn("resized",
        when(anyNull, lit(null).cast(BinaryType))
          .otherwise(col(payloadCol).substr(lit(1), budget)))
      .withColumn("resized_meta", struct(
        meta.getField("format").as("format"),
        w.as("width"), h.as("height"),
        length(col("resized")).cast(LongType).as("nBytes")))
  }

  /** Batch featurization via `mapPartitions` — the real-decoder batch
    * contract: one iterator per partition, reusable per-partition context,
    * fixed-dim `Array[Float]` out. The fake featurizer is a deterministic
    * byte-histogram projection. */
  def featurize(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .mapPartitions { it =>
        // per-partition context setup would happen HERE (decoder handle)
        it.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val feats = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            feats(math.floorMod(bytes(i), dim)) += 1.0f
            i += 1
          }
          var j = 0
          while (j < dim) { feats(j) /= math.max(bytes.length, 1).toFloat; j += 1 }
          MediaFeatures(id, bytes.length.toLong, feats)
        }
      }
  }
}
