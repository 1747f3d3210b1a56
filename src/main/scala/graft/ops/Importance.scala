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
 * `nBuckets` rows regardless of corpus size, so the models LOCALIZE
 * (the CMSketch counter-table discipline) and scoring is one broadcast
 * lookup join — per-(doc, bucket) aggregation gets map-side combine,
 * and nothing corpus-sized is ever joined. Raw is tokenized twice (one
 * model-estimation job + the scoring query) and target once; a caller
 * scoring one raw corpus against MANY targets should persist the
 * (id, bucket, tf) feature table and reuse it. Per-term products are
 * cast to exact DECIMAL before the per-doc sum (associative —
 * aggregation order cannot wobble the rounded score; the
 * [[TextStats.lmScore]] discipline).
 */
object Importance {

  /** Word-bigram stream of `textCol` as (id?, bucket) rows — the gram
    * window is [[Dedup.ngramArray]]'s (WITH repeats: these are term
    * frequencies, not shingle sets; whitespace-only documents contribute
    * nothing), fused into the native
    * [[graft.functions.native.gram_buckets]] kernel: the explode happens
    * on the per-document bucket-id LONG array, so no gram string and no
    * pre-hash gram row is ever materialized ([[bucketedSpec]] keeps the
    * composed built-ins form as the executable specification). */
  private[graft] def bucketed(df: DataFrame, idCol: Option[String],
                              textCol: String, nBuckets: Int): DataFrame = {
    val idCols: Seq[Column] = idCol.map(c => col(c)).toSeq
    df.select(idCols :+ explode(graft.functions.native.gram_buckets(
      TextStats.tokens(col(textCol)), 2, nBuckets.toLong)).as("b"): _*)
  }

  /** Pure built-ins formulation of [[bucketed]] — ExprSpec parity-tests
    * the kernel against it. */
  private[graft] def bucketedSpec(df: DataFrame, idCol: Option[String],
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
    val spark = raw.sparkSession
    val dtf = bucketed(raw, Some(idCol), textCol, nBuckets)
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("tf"))
    // Both models are bucket-bounded (≤ nBuckets ≤ 2^20 rows by the
    // require above), so they are LOCALIZED — one job each — and the
    // per-bucket log ratio is computed driver-side into one broadcast
    // lookup frame. Leaving the models as lazy lineage instead re-runs
    // the tokenize+hash scan (the dominant per-row cost) once per model
    // and once per TOTAL — raw three times, target twice — because the
    // differing projections around each aggregation defeat exchange
    // reuse (measured 20× on the resample query). With localization
    // the final scoring query tokenizes raw exactly once.
    val rawModel = dtf.groupBy("b").agg(sum(col("tf")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tgtModel = bucketed(target, None, textCol, nBuckets)
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tRaw = rawModel.valuesIterator.sum
    val tTgt = tgtModel.valuesIterator.sum
    // identical arithmetic to the executor-side formulation (same
    // divisions, same java.lang.Math.log), so scores are bit-stable
    // across the refactor; a bucket unseen in the target still has
    // add-one mass, and every raw doc bucket exists in the raw model
    // by construction (inner join below)
    def lnP(c: Long, t: Long): Double =
      math.log((c + 1L).toDouble / (t + nBuckets.toLong).toDouble)
    val ratios = rawModel.iterator.map { case (b, cRaw) =>
      (b, lnP(tgtModel.getOrElse(b, 0L), tTgt) - lnP(cRaw, tRaw))
    }.toSeq
    val ratioDf = broadcast(spark.createDataFrame(ratios).toDF("b", "lr"))
    val scored = dtf
      .join(ratioDf, "b")
      .select(col(idCol), col("tf"),
        (col("tf").cast(DoubleType) * col("lr"))
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
