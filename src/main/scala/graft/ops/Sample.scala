package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.native

/**
 * Deterministic sampling for training-mix construction. A 100 TB corpus
 * is sampled per stratum (language, source, quality bucket) at different
 * rates; the selection must be reproducible run-to-run and engine-to-
 * engine, so it is keyed on a portable content hash, not on an RNG:
 * a row is kept iff `hash60(stratum ':' id) mod 1e6 < rate * 1e6`.
 *
 * Scale shape: a pure per-row filter — no shuffle, no sort, no driver
 * state; it composes with scan pruning and runs embarrassingly parallel.
 * Changing one stratum's rate only flips membership within that stratum
 * (selections are independent per key), and raising a rate strictly
 * grows the sample — the properties a reproducible training mix needs.
 */
object Sample {

  /** Keep each row of `df` with probability `rates(stratum)` (exactly:
    * the deterministic hash-bucket rule above), rows of unlisted strata
    * with probability `defaultRate`. Rates are in [0, 1]. */
  def stratifiedHash(df: DataFrame, stratumCol: String, idCol: String,
                     rates: Map[String, Double],
                     defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be in [0, 1]")
    // per-stratum integer thresholds, constant-folded into the row filter.
    // Math.round, not toLong: 0.3*1e6 is 299999.99999999994 in binary —
    // truncation would shift the threshold off its decimal value
    val thr = rates.foldLeft(lit(Math.round(defaultRate * 1e6))) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(Math.round(v * 1e6))).otherwise(acc)
    }
    // NULL stratum = unlisted stratum (defaultRate). The hash key must
    // coalesce first: concat(NULL, ...) nulls the whole key, the bucket
    // comparison would go NULL, and filter would silently DROP every
    // null-stratum row whatever the defaultRate. NULL shares buckets
    // with the empty string — documented, portable (oracle: COALESCE).
    val bucket = pmod(native.hash60(
      concat(coalesce(col(stratumCol), lit("")), lit(":"),
        col(idCol).cast("string"))), lit(1000000L))
    df.filter(bucket < thr)
  }
}
