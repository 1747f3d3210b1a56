package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}

/**
 * K-minimum-values (KMV) distinct-count sketch — the sketch alternative
 * to `count(DISTINCT x)` for 100 TB aggregations: a single pass with
 * O(k) state per group, partial-aggregated map-side, merged by unioning
 * k-min sets; only k 8-byte hashes per partition cross the shuffle,
 * where exact distinct must shuffle every distinct value.
 *
 * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
 * stream", RANDOM'02): with h_k the k-th smallest distinct hash on a
 * [0, 2^60) scale, est = (k-1) * 2^60 / h_k; below k distinct values the
 * sketch is exact.
 *
 * Unlike engine-private HLL sketches (`approx_count_distinct`), every
 * term here is portable: hashes are [[TextStats.hash60]], (k-1)*2^60 is
 * an exactly-representable double, and the rounding is half-up — so any
 * SQL engine reproduces the estimate BIT-FOR-BIT (the `x_sketch_distinct`
 * DuckDB oracle does, via a row_number window).
 */
object Sketch {

  val Two60: Double = 1152921504606846976.0 // 2^60, exact as a double

  /** Aggregator over 60-bit hash values; buffer = the sorted distinct
    * k-min set. Use via `functions.udaf(KMV(k), Encoders.LONG)` on a
    * hash column. Input is BOXED so a NULL hash is skipped like
    * `count(DISTINCT x)` skips NULLs — a primitive Long input would
    * decode NULL as 0 and insert a phantom minimum hash. */
  case class KMV(k: Int) extends Aggregator[java.lang.Long, Array[Long], Long] {
    require(k >= 2, "KMV needs k >= 2")

    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
      if (h == null) buf else insert(buf, h.longValue())

    /** Two-pointer merge of two sorted distinct k-min sets, truncated to
      * k — O(|a| + |b|) per partial-aggregate merge (the fold-insert
      * formulation was O(k²) worst-case). Contents are identical to
      * inserting every element, so the estimator is bit-for-bit
      * unchanged. */
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.length == 0) return b
      if (b.length == 0) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        out(n) =
          if (j >= b.length)      { val v = a(i); i += 1; v }
          else if (i >= a.length) { val v = b(j); j += 1; v }
          else if (a(i) < b(j))   { val v = a(i); i += 1; v }
          else if (a(i) > b(j))   { val v = b(j); j += 1; v }
          else                    { val v = a(i); i += 1; j += 1; v }
        n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong
      else Math.floor((k - 1).toDouble * Two60 / buf.last + 0.5).toLong

    private[graft] def insert(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf                            // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          // growth phase: at most k allocations over a group's lifetime
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {
          // steady state (the 100 TB regime): displace the current max
          // IN PLACE — zero allocation per insert (the per-insert copy
          // was real GC churn at corpus scale × k=256). Safe: the
          // aggregator owns its buffer between encoder round-trips.
          System.arraycopy(buf, ins, buf, ins + 1, k - ins - 1)
          buf(ins) = h
          buf
        } else buf
      }
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong

    /** The udaf-wrapped column function with the boxed input encoder. */
    def toUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
      org.apache.spark.sql.functions.udaf(this, Encoders.LONG)
  }

  /** [[KMV]] with the raw k-min set as the OUTPUT instead of the
    * estimate — the composable form: two corpora's k-min sets support
    * union/intersection estimates ([[kmvOverlap]]) that a scalar
    * estimate cannot. Same buffer, same merge, so the retained set is
    * bit-identical to [[KMV]]'s. */
  case class KMVSet(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    private val base = KMV(k)
    override def zero: Array[Long] = base.zero
    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
      base.reduce(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      base.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def toUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
      org.apache.spark.sql.functions.udaf(this, Encoders.LONG)
  }

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** A built Count-Min sketch: the (i, bucket, cnt) counter table —
    * held LOCAL (collected at build, ≤ depth×width rows), so actions
    * against the sketch never re-scan the corpus — PLUS the depth/width
    * it was hashed with. The parameters travel with the table because a
    * lookup or merge against mismatched parameters would silently break
    * the no-undercount guarantee (wrong buckets probe unrelated
    * counters). Validation lives HERE so `copy()`-modified or
    * hand-rehydrated sketches (e.g. a persisted table read back) obey
    * the same bounds — a depth of 0 would make every estimate silently
    * vanish rather than fail. */
  final case class CMSketch(table: DataFrame, depth: Int, width: Int) {
    Sketch.validateCmShape(depth, width)
  }

  private[ops] def validateCmShape(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
    require(width >= 2, "width must be >= 2")
    // the always-local invariant needs a table bound: 2^20 counters
    // (~24 MB of rows) is far beyond any useful CM accuracy (ε = e/width
    // is already ~1e-5·N at width 2^18) yet safely driver-sized
    require(depth.toLong * width <= (1L << 20),
      s"depth*width must be <= 2^20 counters to stay driver-local, " +
        s"got ${depth}x$width")
  }

  /** Count-Min frequency sketch — the mergeable approximate-FREQUENCY
    * companion of [[KMV]]: `depth` hash rows × `width` buckets of exact
    * integer counters, built in ONE aggregation whose per-partition
    * state is bounded by depth×width counters regardless of corpus size
    * (map-side partials; the shuffle moves at most depth×width rows per
    * partition, where an exact frequency table must shuffle every
    * distinct token). NULL tokens are skipped.
    *
    * Guarantee (Cormode & Muthukrishnan '04): for any token,
    * `true <= estimate <= true + εN` with ε = e/width at probability
    * 1 − e^−depth — overestimates only, never undercounts.
    *
    * Every term is portable: bucket = `hash60("cm:<i>:" + token) mod
    * width`, counters are exact sums — so a SQL engine reproduces the
    * sketch AND every estimate bit-for-bit (`x_sketch_countmin`),
    * unlike engine-private `count_min_sketch()` binaries. Sketches over
    * corpus slices merge by adding counters ([[countMinMerge]]). */
  def countMin(df: DataFrame, tokenCol: String,
               depth: Int = 4, width: Int = 1024): CMSketch = {
    validateCmShape(depth, width) // fail BEFORE the corpus pass
    val agg = df.filter(col(tokenCol).isNotNull)
      .select(posexplode(array((0 until depth).map(i =>
        cmBucket(col(tokenCol), i, width)): _*)))
      .select(col("pos").cast("long").as("i"), col("col").as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))
    // LOCALIZE the counter table (bounded at depth×width rows by
    // construction): the corpus pass runs exactly once, here — a lazy
    // plan would silently re-scan the corpus on every estimate, merge,
    // or count against the sketch
    CMSketch(df.sparkSession.createDataFrame(
      java.util.Arrays.asList(agg.collect(): _*), agg.schema),
      depth, width)
  }

  /** Point estimates for `queries`' distinct tokens against a
    * [[countMin]] sketch: `est = min over rows i of counter(i,
    * bucket_i(token))`, 0 for never-seen buckets. The sketch side is at
    * most depth×width rows — broadcast — so the lookup never shuffles
    * the query tokens. Returns (`token`, `est`). */
  def countMinEstimate(sketch: CMSketch, queries: DataFrame,
                       tokenCol: String): DataFrame = {
    // project to the token column BEFORE distinct: extra query columns
    // must not keep duplicate tokens alive (each duplicate would cost
    // `depth` redundant join probes)
    val qb = queries.select(col(tokenCol).as("token"))
      .filter(col("token").isNotNull).distinct()
      .select(col("token"),
        posexplode(array((0 until sketch.depth).map(i =>
          cmBucket(col("token"), i, sketch.width)): _*)))
      .select(col("token"), col("pos").cast("long").as("i"), col("col").as("bucket"))
    qb.join(broadcast(sketch.table), Seq("i", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Persist a [[CMSketch]]: the counter table at `path` plus a one-row
    * `_meta` sidecar (depth, width) INSIDE the tree — underscore-prefixed
    * paths are invisible to parquet file listing, so the sketch is
    * self-describing at a single path, the `_codebook` discipline of the
    * IVF index. This is what makes the sketch mergeable ACROSS JOBS: each
    * corpus slice sketches independently, persists, and any later job
    * [[loadCountMin]]s + [[countMinMerge]]s without ever re-scanning a
    * slice. The table is ≤ depth×width rows by invariant — the write is
    * one small file, not a distributed job worth parallelizing. */
  def saveCountMin(sketch: CMSketch, path: String): Unit = {
    val spark = sketch.table.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // table first, then the sidecar: overwrite of `path` wipes the tree,
    // so the reverse order would delete the fresh _meta. Both writes are
    // driver-direct (MetaIO): the table is local by invariant (≤
    // depth×width rows), so the old coalesce(1) Spark write serialized
    // rows the driver already held.
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(conf).delete(hp, true)
    graft.store.MetaIO.writeRows(conf, path,
      Seq("i" -> 0L, "bucket" -> 0L, "cnt" -> 0L),
      sketch.table.collect().iterator
        .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2))))
    graft.store.MetaIO.writeRow(conf, s"$path/_meta",
      Seq("depth" -> sketch.depth, "width" -> sketch.width))
  }

  /** Load a [[saveCountMin]] sketch back through the SAME validation a
    * fresh build passes: the shape bounds (via the `CMSketch`
    * constructor) plus a content check — every counter row must sit
    * inside the declared depth×width grid with a non-negative count and
    * no duplicate cell. A hand-edited or truncated-width table would
    * otherwise probe the wrong buckets and silently break the
    * no-undercount guarantee; better to refuse at load. The table is
    * localized on load, preserving the actions-never-rescan invariant. */
  def loadCountMin(spark: org.apache.spark.sql.SparkSession,
                   path: String): CMSketch = {
    val conf = spark.sparkContext.hadoopConfiguration
    val m = graft.store.MetaIO.readRow(conf, s"$path/_meta")
      .getOrElse(throw new IllegalStateException(
        s"CM sketch at $path has no readable _meta"))
    val (depth, width) = (m("depth").asInstanceOf[Int], m("width").asInstanceOf[Int])
    validateCmShape(depth, width) // fail BEFORE reading the table
    // driver-direct read: the table is ≤ depth×width rows by invariant
    // and was collect()ed right after the old Spark read anyway
    val rows = graft.store.MetaIO.readRows(conf, path).map { r =>
      org.apache.spark.sql.Row(r("i").asInstanceOf[Long],
        r("bucket").asInstanceOf[Long], r("cnt").asInstanceOf[Long])
    }
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    rows.foreach { r =>
      val (i, bkt, cnt) = (r.getLong(0), r.getLong(1), r.getLong(2))
      require(i >= 0 && i < depth && bkt >= 0 && bkt < width && cnt >= 0,
        s"corrupt CM table at $path: cell ($i, $bkt) cnt=$cnt outside " +
          s"the declared ${depth}x$width grid")
      require(seen.add((i, bkt)),
        s"corrupt CM table at $path: duplicate cell ($i, $bkt)")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType)))
    CMSketch(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema), depth, width)
  }

  /** EXACT heavy hitters — every token with frequency `>= minCount`,
    * with its exact count — in two bounded passes, never a full
    * distinct-token shuffle. Pass 1 builds a [[countMin]] sketch
    * (per-partition state bounded by depth×width regardless of corpus
    * size). Pass 2 filters the corpus against the sketch with the
    * native [[graft.functions.CmEstimate]] kernel BEFORE the count
    * shuffle: Count-Min never undercounts, so every true heavy hitter
    * survives the prefilter (no false negatives), and the exact
    * recount of the survivors removes the collision-admitted false
    * positives. The output is therefore EXACTLY
    * `GROUP BY token HAVING count(*) >= minCount` — deterministic and
    * independent of the sketch parameters — but the count shuffle only
    * moves rows whose token's estimate clears `minCount`: with
    * `width` sized so `εN = e/width · N < minCount`, that is the heavy
    * tokens plus an εN-bounded fringe, a vanishing fraction of a
    * 100 TB corpus (where `vocab`'s groupBy shuffles every token
    * occurrence). Returns (`token`, `cnt`), NULL tokens skipped. */
  def heavyHitters(df: DataFrame, tokenCol: String, minCount: Long,
                   depth: Int = 4, width: Int = 1024): DataFrame = {
    // fail BEFORE the sketch build pays a corpus pass (countMin is
    // eager), same discipline as validateCmShape
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    heavyHittersWithSketch(countMin(df, tokenCol, depth, width),
      df, tokenCol, minCount)
  }

  /** [[heavyHitters]] against a PREBUILT sketch (e.g. [[loadCountMin]]
    * from another job). Contract: the sketch must have been built over
    * a SUPERSET of `df`'s tokens — CM overestimates only, so a
    * superset sketch still never misses a heavy hitter; a sketch over
    * a smaller/different corpus voids the no-false-negative guarantee
    * (that cannot be validated here — the sketch carries no
    * provenance). */
  def heavyHittersWithSketch(sketch: CMSketch, df: DataFrame,
                             tokenCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    // dense depth×width table (bounded <= 2^20 cells by the CMSketch
    // shape invariant); absent cells are zero-count buckets
    val dense = new Array[Long](sketch.depth * sketch.width)
    sketch.table.collect().foreach { r =>
      dense(r.getLong(0).toInt * sketch.width + r.getLong(1).toInt) = r.getLong(2)
    }
    df.select(col(tokenCol).as("token")).filter(col("token").isNotNull)
      .filter(graft.functions.native.cm_estimate(col("token"),
        sketch.depth, sketch.width, dense) >= minCount)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Merge two [[countMin]] sketches: counters add. (CM has no
    * cross-slice interaction — the merged table estimates the
    * concatenated corpus exactly as a one-pass build would.) Refuses
    * mismatched parameters — adding counters hashed with different
    * depth/width would silently corrupt every estimate. */
  def countMinMerge(a: CMSketch, b: CMSketch): CMSketch = {
    require(a.depth == b.depth && a.width == b.width,
      s"cannot merge sketches of different shape: " +
        s"${a.depth}x${a.width} vs ${b.depth}x${b.width}")
    // both tables are LOCAL by invariant — fold them driver-side (a
    // distributed union+shuffle would pay a full Spark job to add
    // kilobytes of counters)
    val m = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    (a.table.collect() ++ b.table.collect()).foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      m(k) = m.getOrElse(k, 0L) + r.getLong(2)
    }
    val rows: Seq[org.apache.spark.sql.Row] = m.toSeq.sortBy(_._1)
      .map { case ((i, bkt), c) => org.apache.spark.sql.Row(i, bkt, c) }
    CMSketch(a.table.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), a.table.schema),
      a.depth, a.width)
  }

  /** Recover a [[countMinMergeInto]] tree from the between-renames crash
    * window: if the live path is missing but the `.graft-cm-old` backup
    * exists, the backup is restored (the previous state — whose guard
    * does NOT record the interrupted batch, so the replay re-merges it
    * and nothing is lost or doubled). */
  def restoreCountMinAfterCrash(spark: org.apache.spark.sql.SparkSession,
                                path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(path + ".graft-cm-old")
    if (!fs.exists(hp) && fs.exists(old))
      require(fs.rename(old, hp),
        s"restoreCountMinAfterCrash: rename $old -> $path failed")
  }

  /** One guarded merge step of the streaming statistics sink
    * ([[graft.streaming.EventStream.countMinIngestSink]]): fold the
    * batch's Count-Min sketch into the persisted tree at `path`,
    * exactly once per (checkpoint guard, batchId). Returns false (and
    * does nothing) for a replayed batch the tree already records.
    *
    * The guard rides the tree's own `_meta` (guard key + last merged
    * batch id), and the merged tree lands via staged write + two-rename
    * swap — the [[graft.ops.IndexMaintenance]] compaction discipline —
    * so a crash leaves the OLD tree (guard unbumped: the replay
    * re-merges, nothing doubles) or the NEW one (guard bumped: the
    * replay skips), never a torn mix. A tree maintained under a
    * DIFFERENT checkpoint, or written by plain [[saveCountMin]]
    * (no guard — merging a stream into it cannot be exactly-once), is
    * refused loudly rather than silently double-counted. */
  def countMinMergeInto(spark: org.apache.spark.sql.SparkSession,
                        path: String, batch: DataFrame, tokenCol: String,
                        depth: Int, width: Int, guardKey: String,
                        batchId: Long): Boolean = {
    validateCmShape(depth, width)
    restoreCountMinAfterCrash(spark, path)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val conf = spark.sparkContext.hadoopConfiguration
    val exists = fs.exists(new org.apache.hadoop.fs.Path(s"$path/_meta"))
    val done: Long = if (!exists) -1L else {
      val m = graft.store.MetaIO.readRow(conf, s"$path/_meta")
        .getOrElse(throw new IllegalStateException(
          s"sketch at $path has no readable _meta"))
      require(m.contains("guard_key"),
        s"sketch at $path was not written by the ingest sink (no batch " +
          "guard): merging a stream into it cannot be made exactly-once")
      require(m("guard_key") == guardKey,
        s"sketch at $path is maintained under a different checkpoint " +
          "(guard mismatch): each sink needs its own tree")
      m("last_batch").asInstanceOf[Long]
    }
    if (batchId <= done) return false
    val bs = countMin(batch, tokenCol, depth, width)
    val merged =
      if (exists) countMinMerge(loadCountMin(spark, path), bs) else bs
    val tmp = new org.apache.hadoop.fs.Path(path + ".graft-cm-tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".graft-cm-old")
    fs.delete(tmp, true); fs.delete(old, true)
    // both sketch tables are local by invariant, so these writes are
    // driver-direct (MetaIO) and read nothing from the live tree —
    // safe to swap immediately after
    graft.store.MetaIO.writeRows(conf, tmp.toString,
      Seq("i" -> 0L, "bucket" -> 0L, "cnt" -> 0L),
      merged.table.collect().iterator
        .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2))))
    graft.store.MetaIO.writeRow(conf, s"$tmp/_meta", Seq(
      "depth" -> merged.depth, "width" -> merged.width,
      "guard_key" -> guardKey, "last_batch" -> batchId))
    if (fs.exists(hp))
      require(fs.rename(hp, old), s"countMinMergeInto: rename $path aside failed")
    require(fs.rename(tmp, hp),
      s"countMinMergeInto: rename $tmp -> $path failed (RECOVER: " +
        s"restoreCountMinAfterCrash, then re-run the stream)")
    fs.delete(old, true)
    true
  }

  // bucket_i(token) = hash60("cm:<i>:" + token) mod width — row-salted
  // portable hashing, reproducible in any engine
  /** Corpus-overlap estimate from two KMV sketches (Beyer et al.,
    * SIGMOD'07 set-operation estimators): how much does corpus B's
    * vocabulary / shingle set overlap corpus A's? The question behind
    * "is this new crawl snapshot worth ingesting" and "how redundant
    * are these two sources", answered WITHOUT a distinct-join between
    * corpora.
    *
    * Method: the k smallest distinct hashes of A ∪ B are a uniform
    * sample of the union, and they are fully contained in
    * kmin(A) ∪ kmin(B) — moreover membership of each union-k-min hash
    * in A (resp. B) is decidable from A's (resp. B's) own k-min set
    * alone (a union k-min hash that belongs to A must be among A's k
    * smallest). So two bounded single-pass aggregations suffice:
    * Jaccard ≈ |{h ∈ kmin(A∪B) : h ∈ A ∧ h ∈ B}| / |kmin(A∪B)|, the
    * union size by the [[KMV]] estimator, and the intersection size as
    * their product. Below k distinct union hashes everything is exact.
    *
    * Scale shape: one bounded-state aggregation per side (map-side
    * combined, k 8-byte values per partition cross the shuffle); only
    * 2k longs reach the driver, where the merge is a 2k two-pointer
    * pass. Nothing corpus-sized moves — compare an exact overlap, which
    * shuffles every distinct hash of both corpora.
    *
    * Determinism: hashes are the caller's (use [[TextStats.hash60]]),
    * the union k-min is [[KMV]]'s merge, and every estimate is the
    * portable floor(·+0.5) arithmetic — a SQL engine reproduces all six
    * output values bit-for-bit.
    *
    * Output (one row): `k`, `n_kmin` (union k-min size, < k iff exact),
    * `union_est`, `inter_kmin` (intersection hits inside the k-min
    * sample), `jaccard_est`, `inter_est`. */
  def kmvOverlap(a: DataFrame, hashColA: String,
                 b: DataFrame, hashColB: String, k: Int = 256): DataFrame = {
    val agg = KMVSet(k).toUdaf
    def kmin(df: DataFrame, c: String): Array[Long] =
      df.agg(agg(col(c))).collect()(0).getSeq[Long](0).toArray
    overlapOf(a.sparkSession, k, kmin(a, hashColA), kmin(b, hashColB))
  }

  /** [[kmvOverlap]] when both corpora live in ONE relation under a
    * side tag (0 = A, 1 = B) — e.g. two partitions of the same table,
    * or a crawl snapshot with a batch column. A single pass builds both
    * sketches (one grouped aggregation, bounded state per side), where
    * the two-DataFrame form evaluates each side's input subtree
    * separately — at corpus scale that halves the scan/tokenize/hash
    * work whenever both sides derive from the same source. Rows with a
    * side other than 0/1 are rejected up front. */
  def kmvOverlapTagged(df: DataFrame, sideCol: String, hashCol: String,
                       k: Int = 256): DataFrame = {
    val agg = KMVSet(k).toUdaf
    val rows = df.groupBy(col(sideCol).cast("int").as("side"))
      .agg(agg(col(hashCol)).as("kmin"))
      .collect()
    // NULL forms its own group — surface it through the same require
    // instead of an opaque NPE from getInt
    val bad = rows.filter(r => r.isNullAt(0) ||
      (r.getInt(0) != 0 && r.getInt(0) != 1))
    require(bad.isEmpty,
      "kmvOverlapTagged: side column must be 0 or 1, got " +
        bad.map(r => if (r.isNullAt(0)) "NULL" else r.getInt(0).toString)
          .mkString(","))
    def sideOf(s: Int): Array[Long] = rows.find(_.getInt(0) == s)
      .map(_.getSeq[Long](1).toArray).getOrElse(Array.empty[Long])
    overlapOf(df.sparkSession, k, sideOf(0), sideOf(1))
  }

  /** The shared estimator tail: merge the per-side k-min sets, decide
    * membership, emit the one-row estimate table. */
  private def overlapOf(spark: org.apache.spark.sql.SparkSession, k: Int,
                        sa: Array[Long], sb: Array[Long]): DataFrame = {
    val merged = KMV(k).merge(sa, sb)
    val (inA, inB) = (sa.toSet, sb.toSet)
    val nk = merged.length
    val inter = merged.count(h => inA(h) && inB(h))
    val unionEst =
      if (nk < k) nk.toLong
      else Math.floor((k - 1).toDouble * Two60 / merged.last + 0.5).toLong
    val jaccard = if (nk == 0) 0.0 else inter.toDouble / nk.toDouble
    val interEst = Math.floor(jaccard * unionEst.toDouble + 0.5).toLong
    import spark.implicits._
    Seq((k.toLong, nk.toLong, unionEst, inter.toLong, jaccard, interEst))
      .toDF("k", "n_kmin", "union_est", "inter_kmin", "jaccard_est",
        "inter_est")
  }

  private def cmBucket(token: org.apache.spark.sql.Column, i: Int,
                       width: Int): org.apache.spark.sql.Column =
    pmod(TextStats.hash60(concat(lit(s"cm:$i:"), token)), lit(width.toLong))
}
