package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — for each left row, the latest right row whose time is `<=`
 * the left row's time, per key. Spark has no built-in as-of join; rather
 * than a custom physical operator, this composes built-ins with the
 * union + last-non-null-window technique:
 *
 *   1. tag both sides, union them (right payload packed in ONE struct so
 *      a match is atomic — never columns from different right rows);
 *   2. window per key ordered by (time, side) — right rows sort before
 *      left rows at equal times, giving inclusive `>=` semantics;
 *   3. `last(_, ignoreNulls)` over the running frame carries the most
 *      recent right payload onto each left row.
 *
 * Scale: ONE hash shuffle on the key (both inputs), then a per-key sort —
 * identical shape to a regular sort-merge join, with none of the range-
 * condition explosion a naive `left.join(right, key && t >= rt)` +
 * `row_number` suffers (that builds every (left × earlier-right) pair).
 */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto matching left rows
    *                     (left-join semantics: unmatched → nulls). */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: Column, rightTime: Column,
           rightPayload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", leftTime)
      .withColumn("_side", lit(1))
    val r = right.select(
      col(rightKey).as("_k"),
      rightTime.as("_t"),
      lit(0).as("_side"),
      struct(rightPayload.map(col): _*).as("_asof"))
    val all = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = all.withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = rightPayload.foldLeft(matched) { (d, c) =>
      d.withColumn(c, col("_asof").getField(c))
    }
    out.drop("_k", "_t", "_side", "_asof")
  }
}
