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
    val bucket = hashBucket("sample", stratumCol, idCol)
    df.filter(bucket < thr)
  }

  /** Deterministic train/validation/test split: adds a `split` column
    * assigning each row to the named fraction, by the same hash-bucket
    * rule as [[stratifiedHash]] (so splits are reproducible, disjoint,
    * and stable under corpus growth — a row's split never changes when
    * other rows are added). `fractions` must sum to <= 1; rows past the
    * cumulative total get the `rest` label. Pure per-row projection —
    * no shuffle, no RNG state. */
  def assignSplits(df: DataFrame, stratumCol: String, idCol: String,
                   fractions: Seq[(String, Double)],
                   rest: String = "rest"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0.0) &&
      fractions.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must be >= 0 and sum to <= 1")
    val bucket = hashBucket("split", stratumCol, idCol)
    // cumulative thresholds: [0, f1), [f1, f1+f2), ...
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val split = fractions.map(_._1).zip(cum.map(c => Math.round(c * 1e6)))
      .foldRight(lit(rest): org.apache.spark.sql.Column) {
        case ((name, thr), alt) => when(bucket < thr, lit(name)).otherwise(alt)
      }
    df.withColumn("split", split)
  }

  /** The per-row bucket in [0, 1e6). `salt` decorrelates independent
    * decisions over the same corpus — without it, a 10% sample would sit
    * entirely inside the first 10% of every split. NULL stratum = the
    * unlisted/default stratum; the key must coalesce it first —
    * concat(NULL, ...) nulls the whole key, the bucket comparison would
    * go NULL, and a filter would silently DROP every null-stratum row.
    * NULL shares buckets with the empty string (oracle: COALESCE).
    *
    * A NULL id, by contrast, is NOT coalesced — it nulls the key, so
    * [[stratifiedHash]] drops the row and [[assignSplits]] labels it
    * `rest`. That is deliberate: ids are the sampling identity, and two
    * distinct null-id rows coalesced to one key would always land in the
    * same bucket (correlated fate with no identity to justify it). A SQL
    * oracle using the raw id behaves identically (NULL comparisons are
    * falsy there too). Require non-null ids upstream if every row must
    * be eligible. */
  private def hashBucket(salt: String, stratumCol: String,
                         idCol: String): org.apache.spark.sql.Column =
    pmod(native.hash60(
      concat(lit(salt), lit(":"), coalesce(col(stratumCol), lit("")), lit(":"),
        col(idCol).cast("string"))), lit(1000000L))

}
