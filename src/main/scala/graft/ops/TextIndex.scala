package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Persisted inverted TEXT index — the retrieval sibling of the IVF
 * vector index ([[Similarity.buildIvfIndex]]): build once, probe many,
 * with every probe reading only the token buckets it needs.
 *
 * Build writes the distinct (token, doc) posting pairs hive-partitioned
 * by `bucket = hash60(token) mod nBuckets`; a query computes its
 * tokens' buckets DRIVER-SIDE (same portable hash) and scans only those
 * directories — the `bucket IN (...)` predicate lands in
 * `PartitionFilters` (pruned at file listing, unprobed buckets never
 * opened) and the `token IN (...)` predicate pushes into the parquet
 * scan. Query cost is O(matched postings), independent of corpus size
 * for fixed token frequencies — the candidate-generation primitive a
 * retrieval stack needs at 100 TB, where "grep the corpus per query"
 * is a non-starter.
 *
 * Scoring is the integer OVERLAP (number of distinct query tokens a
 * document contains), ties broken by id — deliberately no floats
 * (tf-idf/BM25 weighting can sit on top), so probes are oracle-exact
 * in any engine. The same hashed freshness contract as the IVF index
 * guards staleness ([[requireTextIndexFresh]]).
 */
object TextIndex {

  /** Build the index at `path`: one distinct pass over the (doc, token)
    * pairs (map-side partial dedup — only distinct 8-byte-hash-keyed
    * postings shuffle, not every token occurrence), bucketed and
    * written one hive directory per bucket, postings sorted by
    * (token, id) within each so per-bucket scans stay min/max-prunable
    * on token. The `_meta` sidecar carries `nBuckets` plus the source
    * stamp (row count, id-hash sum — [[Similarity.sourceStamp]], a
    * column-pruned id-only scan). NULL/empty tokens are never indexed;
    * ids must cast to Long (the posting key type). */
  def buildTextIndex(df: DataFrame, idCol: String, textCol: String,
                     path: String, nBuckets: Int = 256): Unit = {
    require(nBuckets >= 1 && nBuckets <= (1 << 16),
      s"nBuckets must be in [1, 65536], got $nBuckets")
    val spark = df.sparkSession
    // the build stamp rides the write job itself (Observation on the
    // source rows BEFORE the explode) so it describes exactly the
    // snapshot the postings came from — a post-write re-scan could
    // stamp a corpus that churned between write and stamp, and the
    // freshness check would then pass against an index missing those
    // rows (the buildIvfIndex discipline)
    val obs = org.apache.spark.sql.Observation()
    val postings = df
      .select(col(idCol).cast(LongType).as("id"), col(textCol).as("text"))
      .observe(obs, Similarity.stampExprs.head, Similarity.stampExprs.tail: _*)
      .select(col("id"), explode(TextStats.tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .distinct()
      .withColumn("bucket",
        pmod(TextStats.hash60(col("token")), lit(nBuckets.toLong)))
    // bucket leads the sort: it satisfies the partitionBy writer's
    // required ordering, so the writer inserts NO second sort and the
    // (token, id) order inside each bucket is guaranteed (a writer-side
    // re-sort by bucket alone is not stable once spilled runs merge)
    postings.repartition(col("bucket"))
      .sortWithinPartitions("bucket", "token", "id")
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    val stamp = Similarity.stampOf(obs.get)
    // _meta INSIDE the tree (underscore paths are invisible to parquet
    // listing) — the index is self-describing at one path, the
    // _codebook discipline of the IVF index
    spark.range(1).select(
        lit(nBuckets).as("n_buckets"),
        lit(stamp.nRows).as("n_rows"),
        lit(stamp.idHashSum).cast(DecimalType(38, 0)).as("id_hash_sum"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** Query tokens, mirroring [[TextStats.tokens]] + the build's
    * non-empty filter + set semantics (each distinct token counts
    * once). Lowercasing goes through `UTF8String.toLowerCase` — the
    * EXACT routine Spark's `lower` ran on the corpus side — so query
    * and index casing agree byte-for-byte under any JVM default locale
    * (a `Locale.ROOT` String.toLowerCase would diverge from Spark's
    * slow path on non-ASCII text under special-casing locales). */
  private[ops] def queryTokens(query: String): Seq[String] =
    org.apache.spark.unsafe.types.UTF8String.fromString(query)
      .toLowerCase.toString
      .split("\\s+").toSeq.filter(_.nonEmpty).distinct

  /** The `_meta` sidecar: (nBuckets, build stamp) in ONE driver read. */
  private def loadMeta(spark: org.apache.spark.sql.SparkSession,
                       path: String): (Int, Similarity.IvfStamp) = {
    val r = spark.read.parquet(s"$path/_meta")
      .select("n_buckets", "n_rows", "id_hash_sum").head()
    (r.getInt(0), Similarity.IvfStamp(r.getLong(1), r.getDecimal(2)))
  }

  /** Probe: top-`k` documents by distinct-query-token overlap,
    * (`id`, `overlap`), ordered by (overlap desc, id) so the cut is
    * total. Reads ONLY the query tokens' bucket directories —
    * `.explain` shows `PartitionFilters: [bucket IN (...)]` — then
    * one small aggregation over the matched postings. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  query: String, k: Int): DataFrame =
    searchWith(spark, path, loadMeta(spark, path)._1, query, k)

  /** [[searchIndex]] through the freshness contract: verifies the
    * build stamp against the live source before probing (one `_meta`
    * read serves both the check and the bucket count). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  query: String, k: Int,
                  verifyAgainst: (DataFrame, String)): DataFrame = {
    val (nBuckets, built) = loadMeta(spark, path)
    Similarity.requireStampFresh("text index", path, built,
      Similarity.sourceStamp(verifyAgainst._1, verifyAgainst._2),
      "buildTextIndex")
    searchWith(spark, path, nBuckets, query, k)
  }

  private def searchWith(spark: org.apache.spark.sql.SparkSession,
                         path: String, nBuckets: Int, query: String,
                         k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = queryTokens(query)
    require(toks.nonEmpty, "query contains no tokens")
    // driver-side bucket set via the SAME portable hash the build used
    val buckets = toks.map(t => graft.functions.Hash60Kernel.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) % nBuckets)
      .distinct
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("token").isin(toks: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("overlap"))
      .orderBy(col("overlap").desc, col("id"))
      .limit(k)
  }

  /** Same contract as [[Similarity.requireIvfFresh]]: recompute the
    * live source's hashed stamp (ids only) and compare to the one
    * persisted at build; a probe against an index whose corpus has
    * since churned would silently serve stale candidates. */
  def requireTextIndexFresh(spark: org.apache.spark.sql.SparkSession,
                            path: String, df: DataFrame,
                            idCol: String): Unit =
    Similarity.requireStampFresh("text index", path,
      loadMeta(spark, path)._2, Similarity.sourceStamp(df, idCol),
      "buildTextIndex")
}
