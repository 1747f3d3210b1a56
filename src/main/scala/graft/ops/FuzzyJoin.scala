package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Fuzzy key matching at edit distance ≤ 1 — the entity-resolution
 * primitive (near-identical titles, usernames, product names) that a
 * naive `levenshtein(a, b) <= 1` join plans as an O(|L|·|R|) cross
 * product.
 *
 * Scheme (FastSS / deletion neighborhoods, Bocek et al. 2007, public):
 * two strings are within edit distance 1 iff their deletion
 * neighborhoods `N(s) = {s} ∪ {s minus one character}` intersect —
 * a substitution meets at the common deletion, an insertion/deletion
 * meets at the shorter string, equality at the strings themselves. Each
 * side explodes into its ≤ `len+1` variants, candidates come from an
 * equi-join on the variant's 8-byte `xxhash64` (strings never shuffle
 * beyond their own row; the hash is INTERNAL — never oracle-compared —
 * so the cheap codegen hash beats the portable md5 family here, and a
 * collision only costs one extra verify), and the exact `levenshtein` predicate
 * resolves both hash collisions and the neighborhood's false positives
 * (e.g. two different deletions of different characters can collide at
 * distance 2). A pair can meet on several variants, so candidates
 * dedup on the id pair BEFORE the verify — the dup factor is bounded by
 * the key length, not the corpus.
 *
 * Keys are expected SHORT (names/titles); `maxKeyLen` bounds the per-row
 * explosion loudly. NULL keys match nothing.
 */
object FuzzyJoin {

  /** Deletion neighborhood of `s` as an array: `s` itself plus each
    * single-character deletion (characters, not bytes — `substring` is
    * codepoint-aware in both engines for BMP text). */
  private def neighborhood(s: Column): Column =
    // sequence(1, 0) would generate DESCENDING [1, 0] — the empty key's
    // neighborhood is just itself
    concat(array(s), when(length(s) >= 1,
        transform(sequence(lit(1), length(s)),
          i => concat(substring(s, lit(1), i - 1),
            substring(s, i + 1, length(s)))))
      .otherwise(array().cast("array<string>")))

  /** Pairs (`leftId`, `rightId`, `dist`) with
    * `levenshtein(leftKey, rightKey) <= 1`, exactly once per pair. For
    * a self-join pass the same frame twice under different column
    * names and filter `leftId < rightId` on the result (identical
    * strings match at distance 0). */
  def editDistance1Pairs(left: DataFrame, leftId: String, leftKey: String,
                         right: DataFrame, rightId: String, rightKey: String,
                         maxKeyLen: Int = 256): DataFrame = {
    require(maxKeyLen >= 1, s"maxKeyLen must be positive, got $maxKeyLen")
    require(leftId != rightId,
      s"leftId and rightId must differ in the output (both '$leftId'): " +
        "rename one side before joining")
    def side(df: DataFrame, id: String, key: String,
             idOut: String, keyOut: String): DataFrame = {
      val guarded = when(length(col(key)) > maxKeyLen, raise_error(concat(
          lit(s"editDistance1Pairs: key '$key' longer than maxKeyLen=$maxKeyLen: "),
          substring(col(key), 1, 64), lit("…"))))
        .otherwise(col(key))
      df.filter(col(key).isNotNull)
        .select(col(id).as(idOut), guarded.as(keyOut))
        .select(col(idOut), col(keyOut),
          explode(neighborhood(col(keyOut))).as("_v"))
        .withColumn("_vh", xxhash64(col("_v")))
        .drop("_v")
    }
    val l = side(left, leftId, leftKey, "_fz_lid", "_fz_lkey")
    val r = side(right, rightId, rightKey, "_fz_rid", "_fz_rkey")
    l.join(r, "_vh")
      .select(col("_fz_lid"), col("_fz_lkey"), col("_fz_rid"), col("_fz_rkey"))
      .dropDuplicates("_fz_lid", "_fz_rid")
      .filter(levenshtein(col("_fz_lkey"), col("_fz_rkey")) <= 1)
      .select(col("_fz_lid").as(leftId), col("_fz_rid").as(rightId),
        levenshtein(col("_fz_lkey"), col("_fz_rkey")).cast(LongType).as("dist"))
  }
}
