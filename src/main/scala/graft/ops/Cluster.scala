package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Near-duplicate CLUSTERING: the step that turns a pair list (from
 * [[Dedup.jaccardPairs]] / [[Dedup.minhashPairs]] / [[Dedup.embeddingNearDup]])
 * into dedup groups — each document labeled with the minimum document id
 * reachable through the near-dup relation, so "keep one per cluster" is a
 * single `filter(id === cluster)` afterwards.
 *
 * Algorithm: hash-min label propagation (each round every vertex takes the
 * min of its own label and its neighbors' labels) PLUS pointer jumping
 * (each round also takes the label of its current label — label chains
 * halve per round), a sequence of DataFrame joins. Propagation alone is
 * O(component diameter) rounds; with the jump it is O(log diameter) —
 * the union-find path-halving idea in dataflow form, same family as the
 * large-star/small-star contraction of Kiveris et al. ("Connected
 * Components in MapReduce and Beyond", SoCC'14). Near-dup graphs are
 * piles of small dense cliques (diameter 2-3), so both terms are tiny;
 * the log bound is what survives adversarial chain-shaped graphs.
 *
 * Scale notes: only (id, label) pairs — 16 bytes — ever shuffle; document
 * text/vectors never enter the loop. Each round is one shuffle of the
 * edge list joined to the label table plus one groupBy on vertex id.
 * Convergence is detected by the monotone sum of labels (labels only
 * decrease), a cheap scalar aggregate instead of a change-count join.
 * Each round's labeling is `localCheckpoint`ed, not merely cached:
 * caching keeps the logical plan, so N rounds nest N join plans and both
 * analysis time and plan size grow without bound (a 50-round chain graph
 * OOMed the driver stringifying the plan); checkpointing truncates the
 * lineage to the materialized rows, keeping every round's plan constant-
 * size. The superseded round's blocks are unpersisted explicitly each
 * round (the context cleaner would only reclaim them at a future GC).
 */
object Cluster {

  /** Label every vertex of the undirected pair graph with the minimum id
    * in its connected component. Output: (`id`, `cluster`), both Long.
    * Vertices are exactly the ids appearing in `edges`. The result is a
    * localCheckpoint (materialized rows, no lineage back to `edges`). */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 100): DataFrame = {
    val sym = edges
      .select(col(aCol).cast(LongType).as("src"), col(bCol).cast(LongType).as("dst"))
      .unionByName(edges.select(col(bCol).cast(LongType).as("src"),
                                col(aCol).cast(LongType).as("dst")))
      .distinct().cache()

    // lazy localCheckpoint: truncates lineage (the per-round plan stays
    // constant-size across arbitrarily many rounds) and is materialized by
    // the checksum aggregate — ONE job per round. The init FUSES the
    // first hash-min step (label = min(own id, min neighbor) — one agg
    // over the edge list, same cost as the old identity-init distinct):
    // dense near-dup cliques converge in this step alone, so the loop
    // then runs ONE confirming round instead of two.
    var labels = sym.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("cluster"))
      .select(col("src").as("id"), col("cluster"))
      .localCheckpoint(false)
    // sum(cluster) strictly decreases while any label changes (labels are
    // min-monotone); decimal(38,0) so huge id sums can't overflow
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast(DecimalType(38, 0)))).collect()(0).getDecimal(0)
    var prevSum = checksum(labels)
    // a pair-free corpus is a legitimate "no duplicates" outcome: null
    // checksum == zero vertices — return the empty labeling (no extra job)
    if (prevSum == null) { sym.unpersist(); return labels }
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("cluster")).as("nmin"))
      val stepped0 = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
      // jump rounds read `stepped` from TWO subtrees (the deduped lookup
      // and the big side); cache it so the edge-join + min-aggregate above
      // runs once per round, not twice (ReuseExchange dedupes only the
      // shuffle writes, not the post-shuffle operators). Freed below.
      val stepped = stepped0.cache()
      // pointer jumping: also take the label OF the current label (every
      // label is a vertex id, so the lookup always lands). cluster(v) and
      // label-of-label are both ids within v's component and
      // min-monotone, so correctness is unchanged — but label chains now
      // halve per round: O(log diameter) rounds instead of O(diameter)
      // (a 50-chain converges in 7 rounds incl. the detection round, not
      // 50). Runs from the first loop round: the init is already one
      // hash-min step, so prev is never the identity labeling.
      val prev = labels
      val next = (locally {
        // dedupe the lookup to ONE row per distinct label before joining:
        // as components collapse their labels converge (exactly when a
        // label-keyed join would skew), so the deduped side shrinks
        // toward #components and AQE can broadcast it — the big side then
        // never shuffles on the skewed key. The distinct itself absorbs
        // the heavy key map-side (partial hash aggregate). Residual SMJ
        // skew (huge #components AND a huge single component) is AQE
        // skew-join territory.
        val jump = stepped.select(col("cluster").as("jc")).distinct()
          .join(prev.select(col("id").as("pid"), col("cluster").as("pcluster")),
            col("jc") === col("pid"))
          .select(col("jc"), col("pcluster"))
        stepped.as("a").join(jump, col("a.cluster") === col("jc"), "left")
          .select(col("a.id").as("id"),
            least(col("a.cluster"), coalesce(col("pcluster"), col("a.cluster")))
              .as("cluster"))
      }).localCheckpoint(false)
      val curSum = checksum(next) // materializes `next`'s checkpoint
      // free the superseded round's blocks NOW — the ContextCleaner only
      // reclaims them at some future GC, which may be never mid-loop
      stepped.unpersist(blocking = false)
      org.apache.spark.sql.graftx.Bridge.unpersistCheckpoint(prev)
      labels = next
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
