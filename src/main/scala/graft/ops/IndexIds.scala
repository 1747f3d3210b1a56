package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Additive id-membership sidecar shared by the persisted-index family
 * ([[TextIndex]], [[Similarity.buildIvfIndex]], [[DedupIndex]]) — the
 * structure that makes the append-path "ids must be NEW" guard O(delta)
 * instead of O(index).
 *
 * The guard's contract is unchanged: an append whose ids are already
 * indexed is refused loudly (a re-appended id would double its
 * postings / band rows / list entries). What changes is the COST: the
 * old guard verified novelty with a column-pruned scan of the whole
 * index per append — at corpus scale, a daily append paid a full-index
 * id scan to admit a sliver of new rows. Now a Bloom filter over every
 * indexed id rides the index tree at `_idbloom/` (underscore paths are
 * invisible to parquet listings, the `_meta` discipline):
 *
 *  - the default check probes each delta id against the broadcast Bloom
 *    — O(delta) work, ZERO index reads in the all-novel common case
 *    (Blooms have no false negatives, so a clean pass is proof);
 *  - a Bloom hit falls back to a precise left-semi verify of just the
 *    suspect ids against the index — paid only on real duplicates
 *    (which are about to be refused anyway) and on the ~fpp fraction of
 *    false positives;
 *  - appends grow the sidecar by UNION: a delta Bloom built with the
 *    SAME (expectedIds, fpp) sizing is bit-or-merged into the stored
 *    one (`mergeInPlace` — sizes match by construction, so the merge
 *    can never be refused), keeping the maintenance additive like every
 *    other `_meta` quantity.
 *
 * Crash ordering, deliberate: the merged Bloom is written BEFORE the
 * index data append. A crash in between leaves the Bloom
 * over-approximating (ids marked present that never landed) — the next
 * append of the same batch Bloom-hits, precise-verifies, finds the ids
 * absent, and proceeds; cost, not corruption. The reverse order would
 * leave appended ids missing from the Bloom, and the guard would wave a
 * re-append of the same batch straight through — silent double-posting,
 * the exact corruption the guard exists to refuse.
 *
 * Sizing: `expectedIds` fixes the Bloom's bit count FOREVER (merges
 * require identical sizing), so size it for the index's target id
 * count, not the build batch — overfilling past it degrades fpp (more
 * fallback verifies), never correctness. At the default (4M ids, 1%)
 * the sidecar is ~5 MB; a billion-id index wants `expectedIds` ~1e9
 * (~1.2 GB broadcast) — beyond that, prefer `skipIdCheck` with
 * upstream id discipline (e.g. monotonically assigned crawl ids).
 *
 * Legacy indexes (built before this sidecar) self-heal: their first
 * guarded append falls back to the old full-index scan, then builds and
 * writes the Bloom from the index's own ids — one extra pass, after
 * which every later append is O(delta).
 */
private[graft] object IndexIds {

  /** Default Bloom sizing: 4M ids at 1% false-positive rate (~5 MB). */
  val DefaultExpectedIds: Long = 4L * 1024 * 1024
  val DefaultFpp: Double = 0.01

  private def sidecar(indexPath: String): String = s"$indexPath/_idbloom"

  final case class IdBloom(bloom: BloomFilter, expected: Long, fpp: Double,
                           nIds: Long)

  /** Serialize + write the sidecar (one binary row) — driver-direct
    * ([[graft.store.MetaIO]]): the old `coalesce(1).write` Spark job
    * cost ~100 ms of scheduling per append for one row of metadata. */
  private def write(spark: SparkSession, indexPath: String, bloom: BloomFilter,
                    expected: Long, fpp: Double, nIds: Long): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    graft.store.MetaIO.writeRow(spark.sparkContext.hadoopConfiguration,
      sidecar(indexPath), Seq("bloom" -> bos.toByteArray,
        "expected" -> expected, "fpp" -> fpp, "n_ids" -> nIds))
  }

  /** Load the sidecar; `None` when missing OR unreadable — an
    * unreadable Bloom (e.g. a crash mid-overwrite) degrades the guard
    * to the precise full scan, never to a wrong answer. Driver-direct
    * read: no Spark job for one row of metadata. */
  def load(spark: SparkSession, indexPath: String): Option[IdBloom] =
    try {
      graft.store.MetaIO.readRow(spark.sparkContext.hadoopConfiguration,
          sidecar(indexPath)).map { m =>
        IdBloom(
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(
            m("bloom").asInstanceOf[Array[Byte]])),
          m("expected").asInstanceOf[Long], m("fpp").asInstanceOf[Double],
          m("n_ids").asInstanceOf[Long])
      }
    } catch { case _: Exception => None }

  /** The sidecar's SCALAR columns without deserializing the Bloom
    * binary — the health/maintenance read path. A billion-id sidecar is
    * GBs of filter bits; a health check wired into a streaming hook
    * must stay metadata-sized, and parquet column pruning makes this
    * exactly that (the `bloom` column is never read). */
  final case class IdBloomStats(expected: Long, fpp: Double, nIds: Long)
  def loadStats(spark: SparkSession,
                indexPath: String): Option[IdBloomStats] =
    try {
      // driver-direct column-pruned read: the parquet reader only
      // materializes the requested columns, so the (possibly GBs) bloom
      // binary is never read — same property the Spark path had
      graft.store.MetaIO.readRowColumns(
          spark.sparkContext.hadoopConfiguration, sidecar(indexPath),
          Seq("expected", "fpp", "n_ids")).map { m =>
        IdBloomStats(m("expected").asInstanceOf[Long],
          m("fpp").asInstanceOf[Double], m("n_ids").asInstanceOf[Long])
      }
    } catch { case _: Exception => None }

  /** Distributed Bloom build over `ids` (a single LongType `id`
    * column) with fixed sizing — `DataFrameStatFunctions.bloomFilter`
    * aggregates per-partition filters, no driver-side row loop. */
  private def bloomOf(ids: DataFrame, expected: Long, fpp: Double): BloomFilter =
    ids.stat.bloomFilter("id", expected, fpp)

  /** Build + write the sidecar at index-build time. `ids` may be a
    * SUPERSET of the ids the index physically contains (e.g. a text
    * corpus's null-text rows index no postings): extra ids only add
    * fallback verifies for those ids, never a wrong refusal — the
    * precise verify against the index itself stays authoritative. */
  def writeFresh(spark: SparkSession, indexPath: String, ids: DataFrame,
                 nIds: Long, expected: Long = DefaultExpectedIds,
                 fpp: Double = DefaultFpp): Unit =
    write(spark, indexPath, bloomOf(ids, expected, fpp), expected, fpp, nIds)

  /** The append-path novelty guard. Throws `IllegalArgumentException`
    * naming the offending id on violation; returns the delta's
    * (non-null) id count on success so callers can fold it into their
    * additive stamps without a second scan.
    *
    * Checks, in order:
    *  1. duplicate ids WITHIN the batch itself (one O(delta) agg —
    *     count vs distinct): a batch that repeats an id would double
    *     its rows just as surely as a re-append of old ids, and the
    *     ids-vs-index scan alone cannot see it;
    *  2. delta ids vs the index: Bloom probe (O(delta), zero index
    *     reads on a clean pass) with precise fallback on suspects;
    *     without a sidecar, the legacy full `indexIds` scan.
    *
    * `indexIds` is by-name: the Bloom fast path never evaluates it. */
  def guardAppend(spark: SparkSession, indexPath: String, op: String,
                  indexIds: => DataFrame, deltaIds: DataFrame): Long = {
    val agg = deltaIds.agg(
      count(col("id")).as("n"), count_distinct(col("id")).as("nd")).head()
    val (n, nd) = (agg.getLong(0), agg.getLong(1))
    require(n == nd,
      s"$op: the batch itself contains duplicate ids ($n rows, $nd " +
        "distinct) — appending it would double their entries exactly " +
        "like a re-append of already-indexed ids; de-duplicate the " +
        "batch first")
    def refuse(dupId: Long): Nothing = throw new IllegalArgumentException(
      s"$op: id $dupId is already indexed at $indexPath — re-appending " +
        "would double its entries; rebuild the index (or pass " +
        "skipIdCheck only when ids are guaranteed new)")
    load(spark, indexPath) match {
      case Some(ib) =>
        val bc = spark.sparkContext.broadcast(ib.bloom)
        try {
          // codegen'd primitive-long probe (graft.functions
          // .BloomMightContain) — no per-row boxing on the hot guard
          val suspects = deltaIds
            .filter(graft.functions.native.bloom_might_contain(col("id"), bc))
            .distinct()
          // emptiness probe first: in the all-novel common case this is
          // the ONLY work — the index is never opened
          if (suspects.limit(1).collect().nonEmpty) {
            val dup = indexIds.join(suspects, Seq("id"), "left_semi")
              .limit(1).collect()
            if (dup.nonEmpty) refuse(dup(0).getLong(0))
          }
        } finally bc.destroy()
      case None =>
        // legacy / unreadable sidecar: the old precise full scan, then
        // SELF-HEAL — write a Bloom of the index's CURRENT ids (the
        // caller's mergeAppend folds the delta in, same as every other
        // append), making every later append O(delta)
        val dup = indexIds.join(deltaIds.distinct(), Seq("id"), "left_semi")
          .limit(1).collect()
        if (dup.nonEmpty) refuse(dup(0).getLong(0))
        val cur = indexIds.select(col("id")).distinct()
        write(spark, indexPath, bloomOf(cur, DefaultExpectedIds, DefaultFpp),
          DefaultExpectedIds, DefaultFpp, cur.count())
    }
    nd
  }

  /** The subset of `ids` (single LongType `id` column) already present
    * in the index — the membership QUERY twin of [[guardAppend]]'s
    * refusal, used by the streaming ingest sink to detect a replayed
    * batch. Bloom-prefiltered: when no id hits the Bloom the answer is
    * the empty frame with ZERO index reads (no false negatives);
    * suspects are verified precisely against `indexIds`. Without a
    * sidecar, one precise semi-join. */
  def presentIds(spark: SparkSession, indexPath: String, ids: DataFrame,
                 indexIds: => DataFrame): DataFrame =
    load(spark, indexPath) match {
      case Some(ib) =>
        val bc = spark.sparkContext.broadcast(ib.bloom)
        val suspects = ids
          .filter(graft.functions.native.bloom_might_contain(col("id"), bc))
          .distinct()
        if (suspects.limit(1).collect().isEmpty) ids.limit(0)
        else suspects.join(indexIds, Seq("id"), "left_semi")
      case None =>
        ids.distinct().join(indexIds, Seq("id"), "left_semi")
    }

  /** Compaction-path sidecar carry for an index whose id set is NOT
    * fully enumerable from its data rows (a text index holding
    * token-free documents: their ids were appended — counted in
    * `_meta`, merged into the Bloom — but index zero postings). An
    * exact rebuild from the staged rows would DROP those ids,
    * reintroducing false negatives and breaking [[allPresentInBloom]]'s
    * soundness (a replayed token-free batch would re-append and
    * double-count `_meta`). The LIVE sidecar is carried over UNCHANGED:
    * every staged id is already in it (no-false-negative invariant), so
    * a union could never set a new bit — the carry is bit-identical and
    * costs no scan. `nIds` keeps the sidecar's own running count: it
    * tracks the BITS in the filter (what fill/fpp health measures),
    * which a carry — unlike an exact rebuild — cannot shed. Returns
    * false when no live sidecar exists (the caller must then fail: a
    * fresh exact build would silently drop the unenumerable ids). */
  def carryLive(spark: SparkSession, livePath: String,
                tmpPath: String): Boolean =
    load(spark, livePath) match {
      case Some(ib) =>
        write(spark, tmpPath, ib.bloom, ib.expected, ib.fpp, ib.nIds)
        true
      case None => false
    }

  /** True iff EVERY (non-null) id in `ids` hits the Bloom sidecar —
    * the replay signal for an append whose data footprint may be EMPTY
    * (a token-free document batch indexes no postings, so membership
    * against the index itself cannot see its replay). Sound in one
    * direction: Blooms have no false negatives, and [[mergeAppend]]
    * runs BEFORE the data append, so a batch whose append ever STARTED
    * has all its ids in the Bloom — a `false` here proves the batch
    * was never appended. A `true` over-approximates (all-ids-false-
    * positive probability fpp^n), so callers must only consult it when
    * the precise check is structurally blind. `false` when no sidecar
    * exists. */
  def allPresentInBloom(spark: SparkSession, indexPath: String,
                        ids: DataFrame): Boolean =
    load(spark, indexPath) match {
      case Some(ib) =>
        val bc = spark.sparkContext.broadcast(ib.bloom)
        try {
          ids.filter(col("id").isNotNull)
            .filter(!graft.functions.native.bloom_might_contain(col("id"), bc))
            .limit(1).collect().isEmpty
        } finally bc.destroy()
      case None => false
    }

  /** Small-delta cutoff for [[mergeAppend]]: up to this many ids are
    * collected and folded into the loaded Bloom on the driver (≤ 800 KB
    * of longs). Above it, the distributed build runs. The distributed
    * path allocates one FULL-SIZE bitset per input partition and merges
    * them (`BloomFilterAggregate` partials — ~5 MB each at the default
    * sizing), so for the streaming-append common case (a micro-batch of
    * thousands of ids) the driver fold is strictly cheaper: one
    * limit-collect job instead of a bitset-per-partition aggregate. */
  private val MaxLocalMergeIds = 100000

  /** Fold a delta's ids into the sidecar (call BEFORE the data append —
    * see the crash-ordering note in the class doc). A missing sidecar
    * stays missing: without one the guard's legacy scan is still
    * correct, and [[guardAppend]]'s self-heal (or the next rebuild)
    * creates it with the index's full id set.
    *
    * The small/large split gates on `deltaCount` — already measured by
    * every caller ([[guardAppend]]'s return) — so the delta's lineage is
    * never evaluated twice (the old limit-probe collect was discarded
    * and recomputed inside the distributed build just past the
    * threshold). Duplicate ids (possible only under a violated
    * `skipIdCheck` contract) merely inflate the small path's collect;
    * folding an id twice sets the same bits.
    *
    * Bit-identical either way: `putLong` into the loaded filter sets
    * exactly the bits a same-sized delta filter's `mergeInPlace` would
    * OR in (same `expected`/`fpp` ⇒ same bit count and hash family). */
  def mergeAppend(spark: SparkSession, indexPath: String,
                  deltaIds: DataFrame, deltaCount: Long): Unit =
    load(spark, indexPath).foreach { ib =>
      val nn = deltaIds.filter(col("id").isNotNull)
      if (deltaCount <= MaxLocalMergeIds) {
        nn.collect().foreach(r => ib.bloom.putLong(r.getLong(0)))
      } else {
        val add = bloomOf(nn, ib.expected, ib.fpp)
        ib.bloom.mergeInPlace(add)
      }
      write(spark, indexPath, ib.bloom, ib.expected, ib.fpp,
        ib.nIds + deltaCount)
    }

  /** [[guardAppend]] + [[mergeAppend]] FUSED for the append hot path:
    * the unfused pair costs three delta-sized jobs per append (the
    * dup-check aggregate, the Bloom suspect probe, the merge collect) —
    * a streaming micro-batch pays all three per batch for a few
    * thousand ids. Here one bounded collect serves every check: the
    * within-batch duplicate test, the Bloom membership probe (same
    * filter, same `mightContainLong` bits), and the merge fold, all
    * driver-side. Semantics are [[guardAppend]]'s exactly — same
    * refusal messages, same precise fallback verify against `indexIds`
    * on Bloom hits, same self-heal for sidecar-less legacy trees (which
    * takes the unfused path, as does any delta past the local-merge
    * bound). Returns the delta's (non-null) distinct id count.
    *
    * `skipIdCheck` skips the duplicate/membership checks but never the
    * Bloom bookkeeping — identical to the unfused contract. */
  def guardAndMerge(spark: SparkSession, indexPath: String, op: String,
                    indexIds: => DataFrame, deltaIds: DataFrame,
                    skipIdCheck: Boolean): Long = {
    def unfused(): Long = {
      val nd =
        if (!skipIdCheck) guardAppend(spark, indexPath, op, indexIds, deltaIds)
        else deltaIds.filter(col("id").isNotNull).distinct().count()
      mergeAppend(spark, indexPath, deltaIds, nd)
      nd
    }
    load(spark, indexPath) match {
      case None => unfused() // legacy tree: full-scan guard + self-heal
      case Some(ib) =>
        val local = deltaIds.filter(col("id").isNotNull)
          .limit(MaxLocalMergeIds + 1).collect()
        if (local.length > MaxLocalMergeIds) unfused()
        else {
          val ids = local.map(_.getLong(0))
          val distinctIds = ids.distinct
          if (!skipIdCheck) {
            require(ids.length == distinctIds.length,
              s"$op: the batch itself contains duplicate ids " +
                s"(${ids.length} rows, ${distinctIds.length} distinct) — " +
                "appending it would double their entries exactly like a " +
                "re-append of already-indexed ids; de-duplicate the batch " +
                "first")
            val suspects = distinctIds.filter(ib.bloom.mightContainLong)
            if (suspects.nonEmpty) {
              // precise verify, only for the suspect ids (real dups about
              // to be refused, or the ~fpp false-positive fraction)
              import spark.implicits._
              val dup = indexIds
                .join(broadcast(suspects.toSeq.toDF("id")), Seq("id"),
                  "left_semi")
                .limit(1).collect()
              if (dup.nonEmpty) throw new IllegalArgumentException(
                s"$op: id ${dup(0).getLong(0)} is already indexed at " +
                  s"$indexPath — re-appending would double its entries; " +
                  "rebuild the index (or pass skipIdCheck only when ids " +
                  "are guaranteed new)")
            }
          }
          ids.foreach(ib.bloom.putLong)
          write(spark, indexPath, ib.bloom, ib.expected, ib.fpp,
            ib.nIds + distinctIds.length)
          distinctIds.length.toLong
        }
    }
  }
}
