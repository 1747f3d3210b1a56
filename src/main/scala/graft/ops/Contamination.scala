package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.native

/**
 * Benchmark-contamination detection — the decontamination step of a
 * training-data pipeline: find corpus documents that share word n-grams
 * with any document of an evaluation/benchmark set, so they can be
 * dropped before training (the classic n-gram-overlap rule used for
 * held-out benchmark hygiene).
 *
 * Scale shape: the benchmark side is small (benchmarks are MBs; the
 * corpus is the 100 TB side), so its exploded (bench_id, hash) index is
 * `broadcast()` — the corpus side never shuffles: per-row shingle
 * hashing (native [[graft.functions.ShingleHash60]] kernel, whole-stage
 * codegen), explode, broadcast-hash-join on the 8-byte hash, and a
 * partial-aggregated count per (doc, bench) pair. Document text never
 * leaves its scan partition.
 *
 * Cross-engine determinism: shingle hashes are the portable md5-based
 * [[TextStats.hash60]]; the output is integer counts only (no float
 * ratios), so the DuckDB oracle is hash-exact.
 */
object Contamination {

  /** Per (corpus doc, benchmark doc) n-gram overlap: distinct shared
    * n-gram hashes (`shared`) and the corpus doc's distinct n-gram count
    * (`n_sh`), for rows with `shared >= minShared`. Output columns:
    * `doc_id`, `bench_id`, `shared`, `n_sh`. */
  def ngramOverlap(corpus: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   n: Int = 3, minShared: Long = 1L): DataFrame = {
    def shingled(df: DataFrame, id: String, text: String) =
      // shingle_hash60 already returns sorted DISTINCT hashes (set semantics)
      df.select(col(id),
        native.shingle_hash60(TextStats.tokens(col(text)), n).as("hs"))
    val c = shingled(corpus, idCol, textCol)
      .select(col(idCol).as("doc_id"), size(col("hs")).cast("long").as("n_sh"),
        explode(col("hs")).as("h"))
    val b = shingled(bench, benchIdCol, benchTextCol)
      .select(col(benchIdCol).as("bench_id"), explode(col("hs")).as("h"))
    c.join(broadcast(b), "h")
      // both sides are per-doc distinct, so count(*) = |intersection|
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"), max(col("n_sh")).as("n_sh"))
      .filter(col("shared") >= minShared)
  }
}
