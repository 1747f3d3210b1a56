package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * DSIR-style data selection: importance weights over hashed n-gram
 * features (Xie et al., "Data Selection for Language Models via
 * Importance Resampling", NeurIPS 2023 — public). Each raw document
 * gets the log importance ratio of a target-distribution unigram model
 * over the raw-distribution model, both estimated on HASHED word-bigram
 * features:
 *
 *   feature(g)  = hash60(g) mod nBuckets          (bounded feature space)
 *   p_m(b)      = (c_m(b) + 1) / (T_m + nBuckets) (add-one over buckets)
 *   log w(d)    = Σ_b tf_d(b) · (ln p_target(b) − ln p_raw(b))
 *
 * High log-weight documents look like the target corpus; resampling by
 * these weights is the published recipe for steering a 100 TB crawl
 * toward a quality/domain target without training a classifier.
 *
 * Why this shape scales: hashing the grams bounds BOTH model tables at
 * `nBuckets` rows regardless of corpus size, so the models and their
 * totals ride broadcast joins — per-(doc, bucket) aggregation gets
 * map-side combine, and nothing corpus-sized is ever joined. The plan
 * tokenizes raw twice (model estimation + scoring) and target once; a
 * caller scoring one raw corpus against MANY targets should persist the
 * (id, bucket, tf) feature table and reuse it. Per-term products are
 * cast to exact DECIMAL before the per-doc sum (associative —
 * aggregation order cannot wobble the rounded score; the
 * [[TextStats.lmScore]] discipline).
 */
object Importance {

  /** Word-bigram stream of `textCol` as (id?, bucket) rows — the gram
    * window is [[Dedup.ngramArray]] (WITH repeats: these are term
    * frequencies, not shingle sets), so the short-doc clamp is the one
    * shared definition; whitespace-only documents contribute nothing. */
  private def bucketed(df: DataFrame, idCol: Option[String],
                       textCol: String, nBuckets: Int): DataFrame = {
    val grams = Dedup.ngramArray(col(textCol), 2)
    val idCols: Seq[Column] = idCol.map(c => col(c)).toSeq
    df.select(idCols :+ explode(grams).as("g"): _*)
      .filter(col("g") =!= "")
      .withColumn("b", pmod(TextStats.hash60(col("g")), lit(nBuckets.toLong)))
      .drop("g")
  }

  /** Importance weights for every document of `raw` against the model
    * of `target`: one row per input document — (`idCol`, `n_feats`,
    * `log_weight`), where `n_feats` is the document's bigram count and
    * `log_weight` its summed log ratio (null for featureless
    * documents). Select by descending weight (or resample with Gumbel
    * noise on top) to steer toward the target distribution. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, nBuckets: Int = 8192): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20),
      s"nBuckets must be in [2, ${1 << 20}], got $nBuckets")
    // raw doc features once; the raw MODEL folds out of the same rows
    val dtf = bucketed(raw, Some(idCol), textCol, nBuckets)
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("tf"))
    val rawModel = dtf.groupBy("b").agg(sum(col("tf")).as("c_raw"))
    val tgtModel = bucketed(target, None, textCol, nBuckets)
      .groupBy("b").agg(count(lit(1)).as("c_tgt"))
    val rawTot = broadcast(rawModel.agg(
      coalesce(sum(col("c_raw")), lit(0L)).as("t_raw")))
    val tgtTot = broadcast(tgtModel.agg(
      coalesce(sum(col("c_tgt")), lit(0L)).as("t_tgt")))
    // a bucket unseen in the target still has add-one mass; every raw
    // doc bucket exists in the raw model by construction (inner join)
    val lnT = log((coalesce(col("c_tgt"), lit(0L)) + lit(1L)).cast(DoubleType) /
      (col("t_tgt") + lit(nBuckets.toLong)).cast(DoubleType))
    val lnR = log((col("c_raw") + lit(1L)).cast(DoubleType) /
      (col("t_raw") + lit(nBuckets.toLong)).cast(DoubleType))
    val scored = dtf
      .join(broadcast(rawModel), "b")
      .join(broadcast(tgtModel), Seq("b"), "left")
      .crossJoin(rawTot).crossJoin(tgtTot)
      .select(col(idCol), col("tf"),
        (col("tf").cast(DoubleType) * (lnT - lnR))
          .cast(DecimalType(28, 12)).as("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_feats"),
        sum(col("term")).cast(DoubleType).as("log_weight"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("log_weight"))
  }

  /** Denominator that keeps the hash-derived uniform strictly below 1:
    * 2^60 + 1024 (exactly representable as a double; hash60 < 2^60, and
    * doubles within 128 of 2^60 round UP to it, so a bare 2^60
    * denominator could yield u = 1.0 and an infinite Gumbel). */
  private val UniformDenom = 1152921504606848000.0d

  /** Sample `k` documents without replacement with probability
    * proportional to `exp(logWeightCol)` — the resampling half of the
    * DSIR recipe — via the Gumbel top-k trick: each document's key is
    * `log w + G` where `G = -ln(-ln(u))` and `u` is derived
    * DETERMINISTICALLY from `hash60(id ":" seed)`, so the "random"
    * draw is reproducible across runs, engines, and retries (the
    * [[Sample]] discipline: re-runs of a 100 TB selection job must pick
    * the same documents). Rows with a null log-weight (featureless
    * documents) are never selected. Output: the weight row plus its
    * `gumbel_key`, the `k` largest keys.
    *
    * Scale shape: the key is one codegen'd expression per row and the
    * top-k plans as TakeOrdered (per-partition heaps, no global sort) —
    * but the k winners land on the driver, so k is a SAMPLE size
    * (bounded by contract like [[Sample.bottomK]]), not a corpus-sized
    * retention filter; for "keep half the corpus" selection, filter on
    * a key threshold instead. */
  def resampleByWeight(weights: DataFrame, idCol: String,
                       logWeightCol: String, k: Int,
                       seed: Long = 0L): DataFrame = {
    require(k >= 1 && k <= 10000000,
      s"k must be in [1, 10000000] (driver-sized sample), got $k")
    val h = TextStats.hash60(
      concat(col(idCol).cast(StringType), lit(":"), lit(seed.toString)))
    val u = (h.cast(DoubleType) + lit(0.5d)) / lit(UniformDenom)
    weights.filter(col(logWeightCol).isNotNull)
      .withColumn("gumbel_key", col(logWeightCol) + -log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
