package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Fuzzy key matching at edit distance ≤ k (k = 1 or 2) — the
 * entity-resolution primitive (near-identical titles, usernames, product
 * names) that a naive `levenshtein(a, b) <= k` join plans as an
 * O(|L|·|R|) cross product.
 *
 * Scheme (FastSS / deletion neighborhoods, Bocek et al. 2007, public):
 * if `ed(a, b) = d <= k`, an optimal alignment's matched (unedited)
 * positions form a common string reachable from `a` by at most d
 * deletions and from `b` by at most d deletions — so two strings within
 * edit distance k ALWAYS share a member of their ≤k-deletion
 * neighborhoods `N_k(s) = {s minus any 0..k characters}`. Each side
 * explodes into its neighborhood (distinct variants — deleting equal
 * characters at different positions collapses), candidates come from an
 * equi-join on the variant's 8-byte `xxhash64` (the hash is INTERNAL —
 * never oracle-compared — so the cheap codegen hash beats the portable
 * md5 family here, and a collision only costs one extra verify), and
 * one exact `levenshtein` per deduped candidate pair resolves both hash
 * collisions and the neighborhood's false positives (two different
 * deletion combinations can collide at distance > k). A pair can meet
 * on several variants, so candidates dedup on the id pair BEFORE the
 * verify — the dup factor is bounded by the neighborhood size, not the
 * corpus. The original keys do ride the candidate rows through that
 * dedup shuffle, but each is bounded by `maxKeyLen`, so shuffle width
 * stays O(candidates · maxKeyLen).
 *
 * Neighborhood sizes: |N_1| ≤ len + 1, |N_2| ≤ len·(len−1)/2 + len + 1 —
 * quadratic in key length at k = 2, which is exactly the per-row
 * explosion `maxKeyLen` exists to bound loudly. Keys are expected SHORT
 * (names/titles); NULL keys match nothing.
 */
object FuzzyJoin {

  /** Deletion neighborhood of `s` with up to `maxDel` deletions, as a
    * distinct array: `s` itself, each single-character deletion, and
    * (maxDel = 2) each two-character deletion — characters, not bytes
    * (`substring` is codepoint-aware in both engines for BMP text). */
  private def neighborhood(s: Column, maxDel: Int): Column = {
    // sequence(1, 0) would generate DESCENDING [1, 0] — the empty key's
    // neighborhood is just itself, a 1-char key's 2-deletion set is empty
    val d1 = when(length(s) >= 1,
        transform(sequence(lit(1), length(s)),
          i => concat(substring(s, lit(1), i - 1),
            substring(s, i + 1, length(s)))))
      .otherwise(array().cast("array<string>"))
    val base = concat(array(s), d1)
    val all = if (maxDel < 2) base else {
      // delete positions i < j: the middle slice [i+1, j-1] has length
      // j - i - 1 (possibly 0 — adjacent deletions), the tail starts at
      // j + 1
      val d2 = when(length(s) >= 2,
          flatten(transform(sequence(lit(1), length(s) - 1),
            i => transform(sequence(i + 1, length(s)),
              j => concat(substring(s, lit(1), i - 1),
                substring(s, i + 1, j - i - 1),
                substring(s, j + 1, length(s)))))))
        .otherwise(array().cast("array<string>"))
      concat(base, d2)
    }
    // distinct BEFORE the explode: deleting either of two equal adjacent
    // characters yields the same variant — repeated-character keys would
    // otherwise multiply candidate rows for zero recall
    array_distinct(all)
  }

  /** Pairs (`leftId`, `rightId`, `dist`) with
    * `levenshtein(leftKey, rightKey) <= maxDist`, exactly once per pair.
    * For a self-join pass the same frame twice under different column
    * names and filter `leftId < rightId` on the result (identical
    * strings match at distance 0).
    *
    * @param maxDist 1 or 2 — the supported FastSS depths (deletion
    *                neighborhoods grow O(len^maxDist), so deeper radii
    *                want a different candidate scheme)
    * @param maxKeyLen per-row explosion guard: keys longer than this
    *                `raise_error` naming the offender (at maxDist = 2 a
    *                key of length L explodes into ~L²/2 variants) */
  def editDistancePairs(left: DataFrame, leftId: String, leftKey: String,
                        right: DataFrame, rightId: String, rightKey: String,
                        maxDist: Int, maxKeyLen: Int = 256): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2, got $maxDist")
    require(maxKeyLen >= 1, s"maxKeyLen must be positive, got $maxKeyLen")
    require(leftId != rightId,
      s"leftId and rightId must differ in the output (both '$leftId'): " +
        "rename one side before joining")
    // candidate generation shuffles a 16-byte PROXY per variant — (id,
    // variant hash) — never the key text (guide-§8 discipline: decide on
    // lightweight rows, move the payload once). The neighborhood factor
    // (~len at k=1, ~len²/2 at k=2) multiplies every byte that rides the
    // explode, so a 25-char key that used to widen each exploded row by
    // 25+ bytes now costs 8: ~3× less shuffle for typical name keys, and
    // the ratio grows with key length exactly when the explosion is at
    // its worst. Keys re-attach AFTER the (lid, rid) pair dedup via two
    // id-keyed joins against the (tiny by comparison) key projections —
    // one (id, key) row per input row, no explode factor.
    // ONE guard message for both sides — byte-identical literals keep
    // the two exploded subtrees CANONICALLY EQUAL for a self-join (same
    // source, same filters), so Spark plans the second proxy exchange
    // as a ReusedExchange of the first: the scan + neighborhood explode
    // + hash + shuffle write run ONCE instead of twice. A per-side
    // message ("key 'lname'" vs "key 'rname'") was the only literal
    // difference breaking that equality; the offending VALUE prefix in
    // the error still identifies the row.
    val guardMsg = s"editDistancePairs: key ('$leftKey' left / " +
      s"'$rightKey' right) longer than maxKeyLen=$maxKeyLen: "
    def side(df: DataFrame, id: String, key: String,
             idOut: String, keyOut: String): DataFrame = {
      val guarded = when(length(col(key)) > maxKeyLen, raise_error(concat(
          lit(guardMsg), substring(col(key), 1, 64), lit("…"))))
        .otherwise(col(key))
      df.filter(col(key).isNotNull)
        .select(col(id).as(idOut), guarded.as(keyOut))
    }
    def variants(keys: DataFrame, idOut: String, keyOut: String): DataFrame =
      keys
        .select(col(idOut),
          explode(neighborhood(col(keyOut), maxDist)).as("_v"))
        .select(col(idOut), xxhash64(col("_v")).as("_vh"))
    val lk = side(left, leftId, leftKey, "_fz_lid", "_fz_lkey")
    val rk = side(right, rightId, rightKey, "_fz_rid", "_fz_rkey")
    val l = variants(lk, "_fz_lid", "_fz_lkey")
    val r = variants(rk, "_fz_rid", "_fz_rkey")
    // pin the sort-MERGE join: the planner's size estimate for a
    // Generate keeps the child's stats — it cannot see the ~len (k=1) /
    // ~len² (k=2) explode factor — so a modest key table can look
    // broadcastable while its neighborhood relation is GBs; a broadcast
    // pick then collects the whole exploded side to the driver
    // (observed: >1 GiB task results at 200k keys, k=2). Of the
    // non-broadcast strategies, SMJ (not shuffle-hash) is the one that
    // SPILLS: a shuffle-hash build of a 17M-row neighborhood partition
    // wants the whole hash relation in task memory and dies where the
    // sort spills to disk and finishes (observed at 1M keys, k=1).
    l.hint("merge").join(r.hint("merge"), "_vh")
      .select(col("_fz_lid"), col("_fz_rid"))
      .dropDuplicates("_fz_lid", "_fz_rid")
      // re-attach the keys to the DEDUPED pairs (collision-bounded, no
      // neighborhood factor) via id-DEDUPED key projections: a duplicate
      // id keeps ONE (arbitrary) key copy, so the output stays exactly
      // one row per (lid, rid) pair — the documented arbitrary-key
      // semantics — instead of re-expanding each pair by the duplicate
      // multiplicity. Unique-id inputs are unchanged; the dedup rides
      // the (small) re-attach side, not the exploded relation.
      .join(lk.dropDuplicates("_fz_lid"), "_fz_lid")
      .join(rk.dropDuplicates("_fz_rid"), "_fz_rid")
      // ONE levenshtein per surviving pair: computed in this projection,
      // then filtered on — a filter-side copy of the expression would be
      // a second evaluation (filter and project are separate operators)
      .select(col("_fz_lid").as(leftId), col("_fz_rid").as(rightId),
        levenshtein(col("_fz_lkey"), col("_fz_rkey")).cast(LongType).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Pairs at edit distance ≤ 1 — [[editDistancePairs]] at depth 1 (the
    * original FastSS radius; kept as the named common case). */
  def editDistance1Pairs(left: DataFrame, leftId: String, leftKey: String,
                         right: DataFrame, rightId: String, rightKey: String,
                         maxKeyLen: Int = 256): DataFrame =
    editDistancePairs(left, leftId, leftKey, right, rightId, rightKey,
      maxDist = 1, maxKeyLen = maxKeyLen)
}
