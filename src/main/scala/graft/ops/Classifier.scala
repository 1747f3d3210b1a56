package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Supervised quality classification over hashed unigram features — the
 * LABELED-data counterpart of [[Importance]] (DSIR): multinomial Naive
 * Bayes with add-one smoothing on a bounded hashed feature space, the
 * fastText-style linear filter public pipelines (CCNet, the Llama
 * pretraining recipe) use to keep crawl pages that look like a curated
 * corpus. Train on a small labeled sample, score the whole crawl:
 *
 *   feature(t) = hash60(t) mod nBuckets            (bounded feature space)
 *   p_c(b)     = (c_c(b) + 1) / (T_c + nBuckets)   (add-one over buckets)
 *   score(d)   = ln(D_1/D_0) + Σ_b tf_d(b)·(ln p_1(b) − ln p_0(b))
 *   predict(d) = 1  iff  score > 0
 *
 * Why this shape scales (the [[Importance]] discipline): hashing bounds
 * BOTH class models at `nBuckets` rows regardless of corpus size, so
 * they localize into one driver-side log-likelihood-ratio table that
 * broadcasts to the scoring join — nothing corpus-sized ever shuffles,
 * the per-(doc, bucket) term frequencies get map-side combine, and
 * scoring a 100 TB crawl is a single broadcast-join pass over the
 * documents. Per-term products are cast to exact DECIMAL before the
 * per-doc sum (associative — aggregation order cannot wobble the
 * score), and every hash is the portable [[TextStats.hash60]], so the
 * whole chain replays bit-for-bit in any engine.
 */
object Classifier {

  /** Bucket-bounded binary NB model: log-likelihood ratios for buckets
    * seen in training, the smoothed ratio for unseen buckets, and the
    * log prior ratio. Pure data — broadcastable and reusable across
    * scoring runs. */
  final case class NbModel(nBuckets: Int, logPrior: Double,
                           defaultLlr: Double, llr: Map[Long, Double])

  /** (idCols..., _b) hashed-unigram feature stream — the explode runs on
    * the per-document bucket-id LONG array from the fused
    * [[graft.functions.native.gram_buckets]] kernel (empty tokens
    * skipped inside the kernel, no token row pre-hash). */
  private def features(df: DataFrame, idCols: Seq[String], textCol: String,
                       nBuckets: Int): DataFrame =
    df.select(idCols.map(c => col(c)) :+ explode(
      graft.functions.native.gram_buckets(
        TextStats.tokens(col(textCol)), 1, nBuckets.toLong)).as("_b"): _*)

  /** Estimate the model from `labeled` — `labelCol` must be 0/1 and both
    * classes must be present (refused loudly otherwise). Two localizing
    * jobs: per-(class, bucket) token counts (≤ 2·nBuckets rows) and the
    * per-class document counts for the prior. */
  def trainNaiveBayes(labeled: DataFrame, labelCol: String, textCol: String,
                      nBuckets: Int = 8192): NbModel = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20),
      s"nBuckets must be in [2, ${1 << 20}], got $nBuckets")
    val docs = labeled.groupBy(col(labelCol).cast(LongType).as("_y"))
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0)) -> r.getLong(1)).toMap
    require(docs.keySet.forall(k => k == 0L || k == 1L),
      s"$labelCol must be 0/1 and non-null, got classes ${docs.keySet}")
    require(docs.contains(0L) && docs.contains(1L),
      s"training data must contain both classes, got ${docs.keySet}")
    val counts = features(labeled, Seq(labelCol), textCol, nBuckets)
      .groupBy(col(labelCol).cast(LongType).as("_y"), col("_b"))
      .agg(count(lit(1)).as("_c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val t1 = counts.iterator.collect { case ((1L, _), c) => c }.sum
    val t0 = counts.iterator.collect { case ((0L, _), c) => c }.sum
    def lnP(c: Long, t: Long): Double =
      math.log((c + 1L).toDouble / (t + nBuckets.toLong).toDouble)
    val llr = counts.keysIterator.map(_._2).toSet.iterator.map { b: Long =>
      b -> (lnP(counts.getOrElse((1L, b), 0L), t1) -
            lnP(counts.getOrElse((0L, b), 0L), t0))
    }.toMap
    NbModel(nBuckets, math.log(docs(1L).toDouble / docs(0L).toDouble),
      lnP(0L, t1) - lnP(0L, t0), llr)
  }

  /** Persist a model for reuse across scoring runs: (b, lr) rows plus a
    * `_meta` sidecar with (nBuckets, logPrior, defaultLlr). Table first,
    * then the sidecar — overwrite of `path` wipes the tree, so the
    * reverse order would delete the fresh `_meta` (the [[Sketch]]
    * discipline). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: NbModel,
                path: String): Unit = {
    // driver-direct writes (MetaIO): the ratio table is a driver-local
    // map by construction — no Spark job needed to serialize it
    val conf = spark.sparkContext.hadoopConfiguration
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(conf).delete(hp, true)
    graft.store.MetaIO.writeRows(conf, path, Seq("b" -> 0L, "lr" -> 0.0),
      model.llr.toSeq.sortBy(_._1).iterator
        // Seq[Any] ascription matters: a bare Seq(b, lr) would let Scala
        // numeric widening unify (Long, Double) to Seq[Double], silently
        // turning the bucket ids into doubles
        .map { case (b, lr) => Seq[Any](b, lr) })
    graft.store.MetaIO.writeRow(conf, s"$path/_meta", Seq(
      "n_buckets" -> model.nBuckets, "log_prior" -> model.logPrior,
      "default_llr" -> model.defaultLlr))
  }

  /** Load a [[saveModel]] tree back through the SAME validation a fresh
    * train passes: the bucket bound, every ratio row inside
    * [0, nBuckets) with a finite value, no duplicate bucket. A
    * hand-edited table would silently mis-score a 100 TB crawl; refuse
    * at load instead. Driver-side is bounded by the grid check
    * (≤ nBuckets ≤ 2^20 rows). */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): NbModel = {
    val conf = spark.sparkContext.hadoopConfiguration
    val m = graft.store.MetaIO.readRow(conf, s"$path/_meta")
      .getOrElse(throw new IllegalStateException(
        s"model at $path has no readable _meta"))
    val (nb, lp, dl) = (m("n_buckets").asInstanceOf[Int],
      m("log_prior").asInstanceOf[Double], m("default_llr").asInstanceOf[Double])
    require(nb >= 2 && nb <= (1 << 20),
      s"corrupt model at $path: nBuckets=$nb outside [2, 2^20]")
    require(java.lang.Double.isFinite(lp) && java.lang.Double.isFinite(dl),
      s"corrupt model at $path: non-finite prior/default ratio")
    val rows = graft.store.MetaIO.readRows(conf, path)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val llr = rows.map { r =>
      val (b, lr) = (r("b").asInstanceOf[Long], r("lr").asInstanceOf[Double])
      require(b >= 0 && b < nb && java.lang.Double.isFinite(lr),
        s"corrupt model at $path: bucket $b (lr=$lr) outside the declared grid")
      require(seen.add(b), s"corrupt model at $path: duplicate bucket $b")
      b -> lr
    }.toMap
    NbModel(nb, lp, dl, llr)
  }

  /** Score every document of `df` under `model`: one row per input —
    * (`idCol`, `n_feats`, `nb_score`, `nb_pred`), where `n_feats` is
    * the document's (non-empty) token count and `nb_pred` the hard 0/1
    * decision. Featureless documents (empty or NULL text) score NULL
    * and predict NULL — route them to a length filter, don't let the
    * bare prior decide. One broadcast lookup join, then one combinable
    * per-doc aggregation. */
  def scoreNaiveBayes(df: DataFrame, model: NbModel, idCol: String,
                      textCol: String): DataFrame = {
    require(!idCol.startsWith("_"),
      s"column names starting with _ are reserved here, got $idCol")
    val spark = df.sparkSession
    val ratio = broadcast(spark.createDataFrame(model.llr.toSeq)
      .toDF("_b", "_lr"))
    val scored = features(df, Seq(idCol), textCol, model.nBuckets)
      .groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_tf"))
      .join(ratio, Seq("_b"), "left")
      .select(col(idCol), col("_tf"),
        (col("_tf").cast(DoubleType) *
          coalesce(col("_lr"), lit(model.defaultLlr)))
          .cast(DecimalType(28, 12)).as("_term"))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_feats"),
        (sum(col("_term")).cast(DoubleType) + lit(model.logPrior))
          .as("nb_score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("nb_score"),
        when(col("nb_score").isNotNull,
          when(col("nb_score") > 0d, 1L).otherwise(0L)).as("nb_pred"))
  }
}
