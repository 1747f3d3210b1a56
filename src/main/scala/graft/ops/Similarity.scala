package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Approximate-nearest-neighbor / similarity search over an embedding
 * column (`ArrayType(FloatType)`).
 *
 *  - [[cosine]] / [[dot]]: higher-order-function kernels (codegen'd,
 *    no UDF boxing).
 *  - [[topK]]: brute-force scored top-k — the exact baseline. One scan,
 *    one small TakeOrdered; at 100 TB this is the map-side-only pattern
 *    (scores never shuffle, only the per-partition top-k rows do).
 *  - [[lshTopK]]: hyperplane-LSH bucketed variant — the scale path. The
 *    query probes only buckets within `probeHamming` of its own
 *    signature, so the candidate set (and scan) shrinks ~2^planes-fold
 *    on clustered data.
 *  - decimal-exact kernels ([[dotDecimal]]) for cross-engine oracle
 *    comparison (float summation order differs between engines; exact
 *    decimal accumulation does not).
 */
object Similarity {

  /** Reference HOF kernel (kept for parity tests; [[dotFast]] is the
    * production path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Native codegen kernel — primitive float loop, no lambda boxing. */
  def dotFast(a: Column, b: Column): Column = graft.functions.native.float_dot(a, b)

  def norm(a: Column): Column = sqrt(dotFast(a, a))

  def cosine(a: Column, b: Column): Column = dotFast(a, b) / (norm(a) * norm(b))

  /** Exact fixed-point dot product: each double product is rounded to an
    * integer number of 1e-15 units and summed as a Long — exact integer
    * accumulation, bit-identical across engines regardless of their float
    * summation strategy. Safe while |dot| * 1e15 < 2^63 (unit vectors:
    * always). DuckDB mirror: `SUM(CAST(round((x*y)*1e15) AS BIGINT))`.
    * Production path is the native [[graft.functions.FixedDot]] kernel;
    * [[dotFixedSpec]] keeps the HOF formulation as the executable
    * specification it is parity-tested against. */
  def dotFixed(a: Column, b: Column): Column = graft.functions.native.fixed_dot(a, b)

  private[graft] def dotFixedSpec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast(DoubleType) * y.cast(DoubleType) * lit(1e15)).cast(LongType)),
      lit(0L), (acc, v) => acc + v)

  def cosineFixed(a: Column, b: Column): Column =
    dotFixed(a, b).cast(DoubleType) /
      (sqrt(dotFixed(a, a).cast(DoubleType)) * sqrt(dotFixed(b, b).cast(DoubleType)))

  /** Brute-force cosine top-k against a literal query vector. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
           query: Seq[Float], k: Int, exactDecimal: Boolean = false): DataFrame = {
    val q = typedLit(query)
    val score = if (exactDecimal) cosineFixed(col(vecCol), q) else cosine(col(vecCol), q)
    df.select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic ±1 hyperplane weights for plane `p`: sign of bit 0 of
    * the portable hash of "p:d". Computed DRIVER-SIDE into a literal float
    * vector — the per-row work is then a single native [[dotFast]] per
    * plane instead of an md5 per element per plane. No RNG, no model. */
  private[graft] def planeWeights(p: Int, dim: Int): Seq[Float] =
    (0 until dim).map(d => graft.functions.HyperplaneSig.weight(p, d).toFloat)

  /** LSH bucket id: `planes` sign bits of hyperplane projections.
    *
    * The projection is computed in FIXED POINT — each element is rounded
    * to an integer number of 1e-7 units (`floor(x*1e7 + 0.5)`, identical
    * IEEE ops in any engine) and the ±1-weighted sum accumulates as a
    * Long. Integer accumulation is order-independent, so the bucket id is
    * bit-identical across engines / partitionings — a float dot product's
    * sign can flip near the hyperplane depending on summation order. */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int): Column =
    graft.functions.native.hyperplane_sig(vec, planes, dim)

  /** Built-ins-only formulation kept as the executable specification the
    * native [[graft.functions.HyperplaneSig]] kernel is tested against. */
  private[graft] def hyperplaneSignatureSpec(vec: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val w = typedLit(planeWeights(p, dim).map(_.toLong))
      val proj = aggregate(
        zip_with(vec, w, (x, wv) =>
          floor(x.cast(DoubleType) * lit(1e7) + lit(0.5)).cast(LongType) * wv),
        lit(0L), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN top-k — the classic nlist/nprobe scheme:
    * every vector is assigned to its nearest of `nlist` centroid lists;
    * a query scores only vectors in its `nprobe` best lists.
    *
    * The codebook here is the `nlist` smallest-id vectors — a
    * deterministic stand-in for a trained k-means codebook (a kmeans||
    * fit would slot into `cents` without touching the assignment/probe
    * machinery, which is the part that matters at scale).
    *
    * Scale shape: the codebook is a driver-side literal (nlist × dim
    * floats — broadcast-sized); assignment is ONE scan with nlist fused
    * fixed-point dot products per row and NO shuffle; candidates are the
    * ~nprobe/nlist fraction of rows whose list is probed; the top-k is a
    * TakeOrdered (per-partition heads, only k rows reach the driver).
    *
    * Cross-engine determinism: list affinity is ranked by
    * `dxy / sqrt(dyy)` (cosine with the row-norm factor dropped — a
    * positive per-row constant that cannot change the argmax), computed
    * from the same 1e-15 fixed-point dots as [[cosineFixed]]; ties break
    * to the smaller list id. The per-centroid norms `dyy` and the
    * query's probe ranking are evaluated by Spark itself in one tiny
    * driver job, so oracle SQL reproduces them term-for-term. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val cents: Seq[(Long, Seq[Float])] = df
      .select(col(idCol).cast(LongType), col(vecCol))
      .orderBy(col(idCol)).limit(nlist)
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qc = typedLit(query)
    // one tiny Spark job evaluates each centroid's fixed-point self-dot
    // and the query→centroid affinity with the ENGINE's own arithmetic
    // (never reimplemented driver-side, so the oracle can mirror it)
    val centStats = spark.range(1).select(cents.zipWithIndex.flatMap {
      case ((_, cv), i) =>
        Seq(dotFixed(typedLit(cv), typedLit(cv)).as(s"dyy_$i"),
            dotFixed(qc, typedLit(cv)).as(s"dxy_$i"))
    }: _*).collect()(0)
    val dyy: Seq[Long] = cents.indices.map(i => centStats.getAs[Long](s"dyy_$i"))
    // a zero-norm centroid (empty-document embedding) would make every
    // row's affinity to it NaN — and Spark ranks NaN above all doubles
    // while the driver/DuckDB rank it differently, silently emptying the
    // result. Fail fast: the codebook must contain usable vectors.
    dyy.zipWithIndex.foreach { case (n, i) =>
      require(n > 0L, s"ivfTopK: centroid ${cents(i)._1} has zero norm; " +
        "choose a codebook of non-zero vectors (filter empty embeddings first)")
    }
    val probes: Seq[Long] = cents.indices
      .map(i => (centStats.getAs[Long](s"dxy_$i").toDouble / math.sqrt(dyy(i).toDouble),
                 cents(i)._1))
      .sortBy { case (s, cid) => (-s, cid) }.take(nprobe).map(_._2)
    // per-row argmax over list affinities; struct max compares (score,
    // -cid) so ties go to the smaller list id
    val affinities = cents.zipWithIndex.map { case ((cid, cv), i) =>
      struct((dotFixed(col(vecCol), typedLit(cv)).cast(DoubleType) /
        sqrt(lit(dyy(i)).cast(DoubleType))).as("s"), lit(-cid).as("n"))
    }
    val listId = -array_max(array(affinities: _*)).getField("n")
    df.select(col(idCol), cosineFixed(col(vecCol), qc).as("score"),
        listId.as("list"))
      .filter(col("list").isin(probes: _*))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Bucketed ANN top-k: score only vectors whose bucket is within
    * `probeHamming` bits of the query's bucket. `exactDecimal` scores
    * candidates with the fixed-point kernel (cross-engine exact). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, planes: Int = 8,
              probeHamming: Int = 1, exactDecimal: Boolean = false): DataFrame = {
    val q = typedLit(query)
    val dim = query.size
    val withBucket = df.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), planes, dim).as("bucket"))
    // query bucket is a scalar expression over the literal vector
    val qBucket = hyperplaneSignature(q, planes, dim)
    val score = if (exactDecimal) cosineFixed(col(vecCol), q) else cosine(col(vecCol), q)
    withBucket
      .filter(bit_count(col("bucket").bitwiseXOR(qBucket)) <= probeHamming)
      .select(col(idCol), score.as("score"), col("bucket"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
