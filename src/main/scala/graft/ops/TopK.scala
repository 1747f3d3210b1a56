package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The repo's ONE bounded per-group top-k cut. Every "best k candidates
 * per query" stage (ANN joins, batch BM25) funnels through here instead
 * of a rank-filtered window: a `row_number().over(Window...) <= k` must
 * SORT each group's full candidate relation per partition — the memory
 * structure that sat at the executor heap edge in the >64k ANN re-rank
 * — where the [[graft.functions.TopKByScore]] aggregate holds O(k)
 * triples per group at every stage. Partial aggregation caps each map
 * task's contribution at k triples per group BEFORE the shuffle, and
 * the reduce side is a k-heap insert per triple — no full-width row
 * ever sorts, no candidate pool ever materializes.
 *
 * Ordering is (score desc, id asc) with Spark's double total order
 * (NaN greatest, -0.0 < 0.0), bit-identical to the window it replaces
 * — ties and NaN placement pinned by ExprSpec; PlanSpec fails if a
 * WindowExec reappears in any converted plan. NULL scores/ids are
 * dropped (a NULL is not a ranking); callers whose ids arrive non-LONG
 * must pre-cast loudly ([[Similarity.checkedLongId]]) — a silent
 * cast-to-NULL would vanish rows here.
 *
 * Centralized so a future call site cannot re-introduce the window by
 * copy-editing one of five near-identical blocks (they drifted apart
 * only in column names before this helper existed).
 */
object TopK {

  /** The k best (by `scoreCol` desc, `idCol` asc) rows per `groupCol`
    * value, best first within each group. Output columns: `groupCol`
    * (verbatim), `idCol` (the winning id), `scoreCol` (its score), and
    * `payload` (the LONG `payloadCol` carried through the cut — a list
    * id, a bucket; pass `lit(0L)` when unused). `scoreCol` must be
    * DOUBLE and `idCol` LONG ([[graft.functions.TopKByScore]]'s input
    * contract — cast upstream, loudly). */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, payloadCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(col(groupCol))
      .agg(graft.functions.native.top_k_by_score(
        col(scoreCol), col(idCol), payloadCol, k).as("_tk"))
      .select(col(groupCol), explode(col("_tk")).as("_e"))
      .select(col(groupCol), col("_e.id").as(idCol),
        col("_e.score").as(scoreCol), col("_e.payload").as("payload"))
  }
}
