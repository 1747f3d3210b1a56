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
    val postings = df.select(col(idCol).cast(LongType).as("id"),
        explode(TextStats.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .distinct()
      .withColumn("bucket",
        pmod(TextStats.hash60(col("token")), lit(nBuckets.toLong)))
    postings.repartition(col("bucket"))
      .sortWithinPartitions("token", "id")
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    val stamp = Similarity.sourceStamp(df, idCol)
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
    * once). Locale.ROOT: query casing must not depend on the JVM's
    * default locale where the corpus side used Spark's `lower`. */
  private[ops] def queryTokens(query: String): Seq[String] =
    query.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toSeq.filter(_.nonEmpty).distinct

  /** Probe: top-`k` documents by distinct-query-token overlap,
    * (`id`, `overlap`), ordered by (overlap desc, id) so the cut is
    * total. Reads ONLY the query tokens' bucket directories —
    * `.explain` shows `PartitionFilters: [bucket IN (...)]` — then
    * one small aggregation over the matched postings. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  query: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val nBuckets = spark.read.parquet(s"$path/_meta")
      .select("n_buckets").head().getInt(0)
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

  /** [[searchIndex]] through the freshness contract: verifies the
    * build stamp against the live source before probing. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  query: String, k: Int,
                  verifyAgainst: (DataFrame, String)): DataFrame = {
    requireTextIndexFresh(spark, path, verifyAgainst._1, verifyAgainst._2)
    searchIndex(spark, path, query, k)
  }

  /** Same contract as [[Similarity.requireIvfFresh]]: recompute the
    * live source's hashed stamp (ids only) and compare to the one
    * persisted at build; a probe against an index whose corpus has
    * since churned would silently serve stale candidates. */
  def requireTextIndexFresh(spark: org.apache.spark.sql.SparkSession,
                            path: String, df: DataFrame,
                            idCol: String): Unit = {
    val r = spark.read.parquet(s"$path/_meta")
      .select("n_rows", "id_hash_sum").head()
    val built = Similarity.IvfStamp(r.getLong(0), r.getDecimal(1))
    val live = Similarity.sourceStamp(df, idCol)
    if (live.nRows != built.nRows ||
        live.idHashSum.compareTo(built.idHashSum) != 0)
      throw new IllegalStateException(
        s"text index at $path is STALE: built over ${built.nRows} rows " +
          s"(id hash sum ${built.idHashSum}) but the live table has " +
          s"${live.nRows} (id hash sum ${live.idHashSum}); rebuild with " +
          "buildTextIndex")
  }
}
