package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Range (interval) joins — the non-equi join family Spark has no native
 * physical strategy for. A naive `a.join(b, a.t >= b.lo && a.t <= b.hi)`
 * has NO equi key, so Spark plans a broadcast-nested-loop (or cartesian)
 * join: every left row tested against every right row — O(|L|·|R|)
 * comparisons, the textbook scale-killer once neither side broadcasts.
 *
 * Both entry points here rewrite the range condition into an EQUI join on
 * a derived bucket key (time bucketed by a caller-chosen width), so the
 * plan is an ordinary shuffle/broadcast hash join whose cost tracks real
 * temporal proximity, never the cross product:
 *
 *  - a point lands in exactly ONE bucket;
 *  - an interval is exploded to every bucket it touches (guarded — see
 *    `maxBucketsPerInterval`);
 *  - the equi-join on the bucket key finds every candidate, and the exact
 *    range predicate filters AFTER the join (cheap: both operands ride
 *    the joined row).
 *
 * Pair-uniqueness is BY CONSTRUCTION, not by dropDuplicates:
 * [[pointInInterval]] joins each point's single bucket against the
 * interval's bucket list (a qualifying pair meets in exactly one bucket);
 * [[intervalOverlap]] assigns each candidate pair a canonical bucket —
 * the one containing `greatest(lo_left, lo_right)`, the start of the
 * overlap — and keeps the pair only when the join bucket IS that bucket.
 * No distinct-shuffle over the candidate set in either path.
 *
 * At 100 TB: both sides shuffle once on an 8-byte bucket key (or the
 * small side broadcasts — AQE decides); a hot bucket (event spike) is an
 * ordinary skewed join key that AQE's skew-join splits, unlike a window
 * or cross product which cannot be split. `bucketWidth` is the knob: it
 * should be on the order of the TYPICAL interval length, so most
 * intervals explode into O(1) bucket rows while buckets stay fine-grained
 * enough to prune far-apart candidates.
 */
object RangeJoin {

  /** Working-column guard: the join temporaries are `_rj_*`-named, and
    * `withColumn` would silently REPLACE a same-named input column and
    * feed the corrupted value back through the final select. */
  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val clash = df.columns.filter(_.startsWith("_rj_"))
    require(clash.isEmpty,
      s"$side columns may not use the reserved _rj_ prefix: ${clash.mkString(", ")}")
  }

  /** Exact floor-division bucket of `x` (works for negative values —
    * `pmod` is non-negative, so the numerator is exactly divisible and
    * truncation equals floor; the subtraction runs in DECIMAL so
    * `Long.MinValue - pmod` cannot overflow). */
  private def bucketOf(x: Column, w: Long): Column =
    ((x.cast(DecimalType(38, 0)) - pmod(x, lit(w))) / lit(w)).cast(LongType)

  /** Interval-side bucket list with loud per-row guards: a reversed
    * interval (`hi < lo`) and an interval exploding past
    * `maxBuckets` buckets both `raise_error` naming the offender —
    * silently dropping the first hides data bugs, and silently exploding
    * the second lets one open-ended interval (e.g. a sentinel hi =
    * Long.MaxValue) generate ~2^63/w rows inside one task. */
  private def bucketSeq(lo: Column, hi: Column, w: Long,
                        maxBuckets: Long): Column = {
    val bLo = bucketOf(lo, w)
    val bHi = bucketOf(hi, w)
    // the count runs in DECIMAL (like bucketOf's subtraction): a Long
    // `bHi - bLo + 1` can wrap negative when an interval spans more than
    // 2^63 buckets (lo near Long.MinValue, hi near Long.MaxValue, small
    // w) and a wrapped-negative n would sail past the maxBuckets guard
    // this expression exists to enforce
    val n = bHi.cast(DecimalType(38, 0)) - bLo.cast(DecimalType(38, 0)) + 1
    when(hi < lo, raise_error(concat(
        lit("RangeJoin: reversed interval [lo, hi]: ["),
        lo.cast(StringType), lit(", "), hi.cast(StringType), lit("]"))))
      .when(n > maxBuckets, raise_error(concat(
        lit("RangeJoin: interval ["), lo.cast(StringType), lit(", "),
        hi.cast(StringType), lit(s"] spans "), n.cast(StringType),
        lit(s" buckets of width $w (max $maxBuckets) — raise bucketWidth " +
          "or maxBucketsPerInterval deliberately"))))
      .otherwise(sequence(bLo, bHi))
  }

  /** Inner join of point rows to every interval row whose `[lo, hi]`
    * (both inclusive) contains the point. Output: all columns of
    * `points` followed by all columns of `intervals` (names must be
    * disjoint). Rows with a NULL point or NULL endpoint match nothing
    * and are dropped (inner-join semantics).
    *
    * @param pointExpr  point value over `points` columns (integral —
    *                   epoch seconds, positions, versions …)
    * @param loExpr     interval start over `intervals` columns
    * @param hiExpr     interval end, inclusive
    * @param bucketWidth bucket size in the point's units; choose ~ the
    *                   typical interval length
    * @param maxBucketsPerInterval per-row explosion guard (raise_error
    *                   past it — see class doc) */
  def pointInInterval(points: DataFrame, pointExpr: Column,
                      intervals: DataFrame, loExpr: Column, hiExpr: Column,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals must have disjoint column names, both have: " +
        overlap.toSeq.sorted.mkString(", "))
    requireNoReserved(points, "points"); requireNoReserved(intervals, "intervals")
    val pCols = points.columns.map(col).toSeq
    val iCols = intervals.columns.map(col).toSeq
    val p = points
      .filter(pointExpr.isNotNull)
      .withColumn("_rj_p", pointExpr)
      .withColumn("_rj_b", bucketOf(col("_rj_p"), bucketWidth))
    val i = intervals
      .filter(loExpr.isNotNull && hiExpr.isNotNull)
      .withColumn("_rj_lo", loExpr).withColumn("_rj_hi", hiExpr)
      .withColumn("_rj_b", explode(
        bucketSeq(col("_rj_lo"), col("_rj_hi"), bucketWidth,
          maxBucketsPerInterval)))
    p.join(i, "_rj_b")
      .filter(col("_rj_p") >= col("_rj_lo") && col("_rj_p") <= col("_rj_hi"))
      .select(pCols ++ iCols: _*)
  }

  /** Inner join of `left` interval rows to every `right` interval row
    * whose `[rLo, rHi]` OVERLAPS `[lLo, lHi]` (both inclusive:
    * `greatest(lo) <= least(hi)`). Output: all columns of `left`
    * followed by all columns of `right` (names must be disjoint). For a
    * self-overlap join pass the same data under renamed columns and
    * filter `leftId < rightId` on the result.
    *
    * Each candidate pair is emitted from exactly one bucket — the one
    * containing the overlap's start, `greatest(lLo, rLo)` — so the
    * output needs no dedup shuffle (see class doc). */
  def intervalOverlap(left: DataFrame, lLo: Column, lHi: Column,
                      right: DataFrame, rLo: Column, rHi: Column,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right must have disjoint column names, both have: " +
        overlap.toSeq.sorted.mkString(", "))
    requireNoReserved(left, "left"); requireNoReserved(right, "right")
    val lCols = left.columns.map(col).toSeq
    val rCols = right.columns.map(col).toSeq
    def banded(df: DataFrame, lo: Column, hi: Column,
               loOut: String, hiOut: String): DataFrame =
      df.filter(lo.isNotNull && hi.isNotNull)
        .withColumn(loOut, lo).withColumn(hiOut, hi)
        .withColumn("_rj_b", explode(
          bucketSeq(col(loOut), col(hiOut), bucketWidth,
            maxBucketsPerInterval)))
    val l = banded(left, lLo, lHi, "_rj_llo", "_rj_lhi")
    val r = banded(right, rLo, rHi, "_rj_rlo", "_rj_rhi")
    l.join(r, "_rj_b")
      .filter(
        greatest(col("_rj_llo"), col("_rj_rlo")) <=
          least(col("_rj_lhi"), col("_rj_rhi")) &&
        col("_rj_b") === bucketOf(
          greatest(col("_rj_llo"), col("_rj_rlo")), bucketWidth))
      .select(lCols ++ rCols: _*)
  }
}
