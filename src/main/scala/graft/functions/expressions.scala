package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the engine's hot paths — full
 * whole-stage-codegen implementations (a codegen'd `Expression` beats a
 * Scala UDF by avoiding boxing/serialization per row; see the custom-
 * expression preference order in the build notes).
 */

/** Polynomial rolling hash over the UTF-8 bytes of a string:
  * `h = h * 31 + byte` in wrapping 64-bit arithmetic — the classic
  * content-defined-chunking / fingerprinting primitive. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}Acc = ${ev.value}Acc * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Primitive float-array dot product accumulated in double — the ANN
  * scoring kernel without per-element lambda boxing. Null or
  * length-mismatched inputs yield null. */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null is also produced for non-null inputs (length mismatch)
  override def nullable: Boolean = true
  // without this, array<double>/array<int> inputs would be reinterpreted
  // through getFloat and yield garbage silently
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two array<float> arguments, got ${l.sql} and ${r.sql}")
    }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      acc
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

/** Exact fixed-point float dot product: each element product rounded to
  * an integer number of 1e-15 units and summed as a Long — the
  * cross-engine-exact ANN scoring primitive, as a native loop instead of
  * an interpreted `aggregate`/`zip_with` nest. Rounding replicates
  * Spark's `round(double)` exactly (shortest-decimal BigDecimal,
  * HALF_UP), so values are bit-identical to the HOF formulation and the
  * DuckDB oracle's `round(...)`. Null or length-mismatched inputs yield
  * null (mirrors [[FloatDot]]). */
case class FixedDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  // null is also produced for non-null inputs (length mismatch, null
  // element) — without this override, non-nullable inputs would coerce
  // the null result to 0 silently
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fixed_dot requires two array<float|double> arguments, got ${l.sql} and ${r.sql}")
    }
  // float elements are widened to double (exact); a double-element side —
  // e.g. a trained k-means centroid literal — is read as-is, so mixed
  // float-row × double-codebook dots stay bit-identical to the all-double
  // formulation the oracle computes
  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    FixedDot.kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      elemIsDouble(left), elemIsDouble(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = graft.functions.FixedDot.kernel($a, $b,
         |  ${elemIsDouble(left)}, ${elemIsDouble(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FixedDot =
    copy(left = l, right = r)
}

object FixedDot {
  /** Null on length mismatch or any null element — exactly the HOF spec's
    * behavior (`zip_with` pads/nulls, and one null product nulls the
    * aggregate). Boxed return so null is representable. */
  def kernel(a: ArrayData, b: ArrayData,
             aIsDouble: Boolean, bIsDouble: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      val q = x * y * 1e15
      // non-finite products cannot round-trip the fixed-point contract —
      // fail loudly (the HOF spec also errors here, via ANSI cast)
      if (q.isNaN || q.isInfinite)
        throw new ArithmeticException(
          s"fixed_dot: non-finite element product at index $i")
      // outside the documented |dot|*1e15 < 2^63 range the result must
      // fail loudly (as ANSI mode would), not wrap or saturate silently:
      // the range check catches a single huge product (double→long
      // conversion would CLAMP to Long.MaxValue), addExact catches
      // overflow of the running sum. 9.223372036854776E18 is 2^63 as a
      // double; every double strictly below it fits in a Long.
      if (q >= 9.223372036854776e18 || q < -9.223372036854776e18)
        throw new ArithmeticException(
          s"fixed_dot: element product at index $i exceeds the 1e-15 " +
            "fixed-point range (|x*y| must stay below ~9.2e3)")
      acc = Math.addExact(acc, roundHalfUp(q))
      i += 1
    }
    acc
  }

  /** Spark's `Round(HALF_UP)` on a double, with a fast path. The spec
    * path rounds the SHORTEST-DECIMAL representation of q
    * (`BigDecimal.valueOf`), which can sit up to ulp(q)/2 away from q —
    * and `Double.toString` costs ~100 ns, which dominated the kernel
    * (1e9 products in a 1M×64-dim k-means round). When the fractional
    * part of q is more than ulp(q) from the .5 boundary, q and its
    * shortest decimal are provably on the same side, so plain
    * floor-based rounding gives the identical result for a few ns; only
    * the boundary band (~1e-16 of inputs at unit scale) pays for
    * BigDecimal. Parity-tested against the HOF spec in ExprSpec. */
  def roundHalfUp(q: Double): Long = {
    val fl = Math.floor(q)
    val frac = q - fl
    if (Math.abs(frac - 0.5) > Math.ulp(q)) {
      if (frac > 0.5) fl.toLong + 1L else fl.toLong
    } else {
      java.math.BigDecimal.valueOf(q)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    }
  }
}

/** Hyperplane-LSH bucket id as one native loop: `planes` sign bits of
  * fixed-point ±1-weighted projections (each element rounded to 1e-7
  * units via `floor(x*1e7 + 0.5)` — identical IEEE ops in any engine, so
  * the bucket is bit-identical to the HOF formulation in
  * `Similarity.hyperplaneSignature` and the DuckDB oracle). Weights are
  * the same md5-derived ±1 pattern, built once per (planes, dim). */
case class HyperplaneSig(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 62 && dim >= 1, "1 <= planes <= 62, dim >= 1")
  override def dataType: DataType = LongType
  // the HOF spec maps a NULL vector to bucket 0 (null projections fall
  // through when(proj > 0).otherwise(0)) — so this never returns null
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig requires array<float>, got ${other.sql}")
    }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else HyperplaneSig.kernel(v.asInstanceOf[ArrayData], planes, dim)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral,
      code = c.code +
        code"""
           |long ${ev.value} = ${c.isNull} ? 0L :
           |  graft.functions.HyperplaneSig.kernel(${c.value}, $planes, $dim);
         """)
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Single source of truth for the md5-derived ±1 plane weight
    * (`Similarity.planeWeights` delegates here — the derivation is
    * determinism-critical and must never fork). */
  def weight(p: Int, d: Int): Long = {
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ((java.lang.Long.parseLong(md5hex.take(15), 16) & 1L) == 1L) 1L else -1L
  }
  private val weights =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()
  private def weightsFor(planes: Int, dim: Int): Array[Array[Long]] =
    weights.computeIfAbsent((planes, dim), { case (p0, d0) =>
      Array.tabulate(p0)(p => Array.tabulate(d0)(d => weight(p, d)))
    })
  def kernel(vec: ArrayData, planes: Int, dim: Int): Long = {
    // dim mismatch or a null element -> bucket 0, mirroring the HOF spec
    // (zip_with pads the shorter side with null / a null element nulls
    // the projection, so when(proj > 0) falls through to 0 on all planes)
    if (vec.numElements() != dim) return 0L
    var d0 = 0
    while (d0 < dim) { if (vec.isNullAt(d0)) return 0L; d0 += 1 }
    val w = weightsFor(planes, dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var acc = 0L
      var d = 0
      while (d < dim) {
        acc += math.floor(vec.getFloat(d).toDouble * 1e7 + 0.5).toLong * wp(d)
        d += 1
      }
      if (acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}

/** Static kernel for the portable 60-bit md5 hash — digest bytes → top
  * 60 bits, identical to `conv(substring(md5(s),1,15),16,10)` but without
  * materializing the 32-char hex string, the substring copy, or the
  * base-16 parse (the hash sits on the inverted-index hot path: once per
  * shingle per document). */
object Hash60Kernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val SPACE = Array[Byte](' ')

  private def top60(b: Array[Byte]): Long = {
    var h = 0L
    var j = 0
    while (j < 7) { h = (h << 8) | (b(j) & 0xffL); j += 1 }
    (h << 4) | ((b(7) & 0xf0L) >>> 4)
  }

  def compute(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    top60(digest.digest(s.getBytes))
  }

  /** hash60 of the space-joined token window `[start, end)` — md5 fed
    * incrementally, byte-identical to hashing `concat_ws(" ", ...)` but
    * with no joined-string materialization. Null elements are SKIPPED
    * (no token bytes, no separator), exactly as `concat_ws` drops null
    * arguments — internal callers tokenize first (never null), but the
    * SQL-registered surface accepts arbitrary `array<string>`. */
  def hashWindow(toks: ArrayData, start: Int, end: Int,
                 digest: java.security.MessageDigest): Long = {
    digest.reset()
    var j = start
    var emitted = false
    while (j < end) {
      if (!toks.isNullAt(j)) {
        if (emitted) digest.update(SPACE)
        digest.update(toks.getUTF8String(j).getBytes)
        emitted = true
      }
      j += 1
    }
    top60(digest.digest())
  }

  /** Distinct hash60 values of all word n-gram shingles of `toks` —
    * fuses shingle construction + hashing + array_distinct into one
    * loop. Mirrors `shingleArray` exactly: positions 0 until
    * max(numToks - n + 1, 1), each window clamped to the array end (so a
    * short document yields its single full-text shingle, and an empty
    * one the hash of ""). Output sorted ascending (set semantics — every
    * consumer aggregates). */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val hs = shingleHashesSorted(toks, n)
    var uniq = if (hs.length > 0) 1 else 0
    var k = 1
    while (k < hs.length) { if (hs(k) != hs(k - 1)) { hs(uniq) = hs(k); uniq += 1 }; k += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(hs, uniq))
  }

  /** ALL window hashes (one per position, duplicates kept), sorted
    * ascending — the multiset form that frequency-style per-row stats
    * (n-gram repetition) need. */
  def shingleHashesSorted(toks: ArrayData, n: Int): Array[Long] = {
    val digest = md.get()
    val m = toks.numElements()
    val positions = math.max(m - n + 1, 1)
    val hs = new Array[Long](positions)
    var i = 0
    while (i < positions) {
      hs(i) = hashWindow(toks, i, math.min(i + n, m), digest)
      i += 1
    }
    java.util.Arrays.sort(hs)
    hs
  }

  /** Hashed-feature buckets of ALL word n-gram windows (repeats kept,
    * document order): `hash60(joined window) mod nBuckets` per
    * position, SKIPPING windows whose joined string is empty — fuses
    * `explode(ngramArray) → filter(g ≠ '') → pmod(hash60(g), nBuckets)`
    * into one loop with no gram-string or gram-row materialization
    * (the [[graft.ops.Importance]] feature hot path: one md5 per gram
    * is already the floor; this removes the per-gram UTF8String concat
    * and the pre-hash row explosion). Window and join semantics are
    * [[hashWindow]]'s (null tokens skipped like `concat_ws`; the window
    * clamp mirrors `ngramArray`), so the output is value-identical to
    * the composed form. */
  def gramBuckets(toks: ArrayData, n: Int, nBuckets: Long): ArrayData = {
    val digest = md.get()
    val m = toks.numElements()
    val positions = math.max(m - n + 1, 1)
    val out = new Array[Long](positions)
    var cnt = 0
    var i = 0
    while (i < positions) {
      val end = math.min(i + n, m)
      digest.reset()
      var joinedLen = 0
      var emitted = false
      var j = i
      while (j < end) {
        if (!toks.isNullAt(j)) {
          if (emitted) { digest.update(SPACE); joinedLen += 1 }
          val b = toks.getUTF8String(j).getBytes
          digest.update(b)
          joinedLen += b.length
          emitted = true
        }
        j += 1
      }
      if (joinedLen > 0) {
        // hash60 is non-negative (top 60 bits), so % == pmod
        out(cnt) = top60(digest.digest()) % nBuckets
        cnt += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(out, cnt))
  }

  /** Max multiplicity of any window hash — the longest run in the
    * sorted multiset. One native pass; no array materialization beyond
    * the hash buffer. */
  def maxShingleMultiplicity(toks: ArrayData, n: Int): Long = {
    val hs = shingleHashesSorted(toks, n)
    var best = 1
    var run = 1
    var k = 1
    while (k < hs.length) {
      if (hs(k) == hs(k - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      k += 1
    }
    best.toLong
  }
}

/** Static kernel for the first-occurrence line filter — the
  * intra-document line-dedup core as one native pass: a hash-set
  * membership test per line instead of the HOF spec's `array_position`
  * full-array scan, O(lines) total vs O(lines²) (a pathological
  * million-line document is ~10⁶ set probes, not ~10¹² comparisons).
  * Semantics mirror the HOF predicate exactly (ExprSpec-tested):
  * space-only lines (every byte 0x20, including "") are always kept —
  * Spark's default `trim` strips spaces only; null elements are dropped
  * (the HOF predicate evaluates to NULL for them). */
object DedupLinesKernel {
  private def isSpaceOnly(s: UTF8String): Boolean = {
    val b = s.getBytes
    var i = 0
    while (i < b.length) { if (b(i) != 0x20) return false; i += 1 }
    true
  }
  def firstOccurrences(lines: ArrayData): ArrayData = {
    val n = lines.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      if (!lines.isNullAt(i)) {
        val l = lines.getUTF8String(i)
        // space-only lines never enter `seen`: the first-occurrence
        // branch only ever tests non-space-only lines, which cannot
        // equal a space-only one
        if (isSpaceOnly(l) || seen.add(l)) kept.add(l)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      kept.toArray(new Array[UTF8String](kept.size())))
  }
}

/** TRUE iff any element of an `array<long>` might be in the Bloom
  * filter serialized in `bloomBytes` (the `BloomFilterAggregate` wire
  * format) — the document-level decontamination prefilter as one native
  * loop. The HOF formulation (`exists(hs, h -> might_contain(...))`)
  * is identical UNDER FILTER SEMANTICS but runs interpreted with
  * per-element boxing, which measurably loses to the exact join it is
  * meant to beat; this kernel stays inside whole-stage codegen.
  * NULL elements are skipped (a NULL gram is not evidence); a NULL
  * array yields NULL like any unary null-safe expression. Deliberate
  * spec divergence: for an array holding a NULL element and no match,
  * the HOF's three-valued OR yields NULL while this returns FALSE —
  * both drop the row in a filter (the kernel's one call site), but a
  * projection would see false vs NULL (ExprSpec pins this). */
case class BloomContainsAny(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  require(bloomBytes != null && bloomBytes.nonEmpty, "empty bloom filter")
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_contains_any requires array<bigint>, got ${other.sql}")
    }
  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
  def anyMatch(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && bf.mightContainLong(a.getLong(i))) return true
      i += 1
    }
    false
  }
  override def nullSafeEval(v: Any): Any = anyMatch(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression instance: the deserialized filter is a
    // lazy val on it, built once per task and shared with interpreted eval
    val self = ctx.addReferenceObj("bloomAny", this, classOf[BloomContainsAny].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.anyMatch($c);")
  }
  // the case-class defaults compare the byte array by REFERENCE, which
  // breaks canonicalization/semanticEquals (and thus common-subexpression
  // elimination) for equal filters built twice; compare contents
  override def equals(other: Any): Boolean = other match {
    case b: BloomContainsAny =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  // cache the array walk: TreeNode hashCode runs repeatedly during
  // analysis/optimization, and the filter bytes can run to megabytes
  @transient private lazy val bytesHash = java.util.Arrays.hashCode(bloomBytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash
  override protected def withNewChildInternal(newChild: Expression): BloomContainsAny =
    copy(child = newChild)
}

/** Count-Min point estimate of a string token against a driver-local
  * DENSE counter table: `min over rows i of
  * counters[i·width + hash60("cm:<i>:" + token) mod width]` — the same
  * terms as [[graft.ops.Sketch.countMinEstimate]], as one native loop
  * inside whole-stage codegen. This is what lets a heavy-hitters pass
  * filter an entire corpus against the sketch BEFORE any shuffle: the
  * join formulation explodes `depth` rows per input row and shuffles
  * them, which is right for a handful of probe tokens and wrong as a
  * corpus-wide per-row filter. Value-identical to `countMinEstimate`
  * for non-null tokens (ExprSpec pins the parity); a NULL token yields
  * NULL like any unary null-safe expression. */
case class CmEstimate(child: Expression, depth: Int, width: Int,
                      counters: Array[Long]) extends UnaryExpression {
  require(depth >= 1 && width >= 2 && counters.length == depth.toLong * width,
    s"counters must be a dense depth*width table: got ${counters.length} " +
      s"cells for ${depth}x$width")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cm_estimate requires a string argument, got ${other.sql}")
    }
  // row-salt prefixes built once per task (they are tiny; the md5 per
  // row dominates), shared by interpreted eval and generated code
  @transient private lazy val prefixes: Array[UTF8String] =
    Array.tabulate(depth)(i => UTF8String.fromString(s"cm:$i:"))
  def estimate(token: UTF8String): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < depth) {
      // hash60 is non-negative (top 60 bits of md5), so plain % == pmod
      val h = Hash60Kernel.compute(UTF8String.concat(prefixes(i), token))
      val c = counters(i * width + (h % width).toInt)
      if (c < m) m = c
      i += 1
    }
    m
  }
  override def nullSafeEval(v: Any): Any = estimate(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS instance: the prefix table is a lazy val on it,
    // built once per task and shared with interpreted eval
    val self = ctx.addReferenceObj("cmEst", this, classOf[CmEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.estimate($c);")
  }
  // the case-class defaults compare the counter array by REFERENCE,
  // breaking canonicalization/semanticEquals for equal sketches built
  // twice (same hazard as BloomContainsAny); compare contents
  override def equals(other: Any): Boolean = other match {
    case e: CmEstimate =>
      child == e.child && depth == e.depth && width == e.width &&
        java.util.Arrays.equals(counters, e.counters)
    case _ => false
  }
  // cached: the counter table can be 2^20 longs, and TreeNode hashCode
  // runs repeatedly during analysis/optimization
  @transient private lazy val countersHash = java.util.Arrays.hashCode(counters)
  override def hashCode(): Int =
    ((31 * child.hashCode() + depth) * 31 + width) * 31 + countersHash
  override protected def withNewChildInternal(newChild: Expression): CmEstimate =
    copy(child = newChild)
}

/** Shared fixed-point dot kernel for the codebook argmax expressions
  * ([[PqCodes]], [[NearestCentroidK]]) — element-for-element identical
  * to [[FixedDot.kernel]] over `slice(vec, base+1, cw.length)` against
  * a double codeword: same 1e-15 rounding, same addExact overflow and
  * non-finite failures, same null-on-mismatch contract. `exact = true`
  * replicates the WHOLE-vector dot (`fixed_dot(vec, cw)` nulls when the
  * vector is LONGER than the codeword too); `exact = false` replicates
  * the slice form (a longer vector just has elements past the slice
  * never read). */
object CodebookKernels {
  def fixedDotSlice(vec: ArrayData, base: Int, cw: Array[Double],
                    vecIsDouble: Boolean, exact: Boolean): java.lang.Long = {
    val n = vec.numElements()
    if (n < base + cw.length || (exact && n != base + cw.length)) return null
    var acc = 0L
    var i = 0
    while (i < cw.length) {
      if (vec.isNullAt(base + i)) return null
      val x = if (vecIsDouble) vec.getDouble(base + i)
              else vec.getFloat(base + i).toDouble
      val q = x * cw(i) * 1e15
      if (q.isNaN || q.isInfinite)
        throw new ArithmeticException(
          s"fixed_dot: non-finite element product at index $i")
      if (q >= 9.223372036854776e18 || q < -9.223372036854776e18)
        throw new ArithmeticException(
          s"fixed_dot: element product at index $i exceeds the 1e-15 " +
            "fixed-point range (|x*y| must stay below ~9.2e3)")
      acc = Math.addExact(acc, FixedDot.roundHalfUp(q))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** [[FixedDot.kernel]] invoked DIRECTLY on driver-side constants —
    * the engine's own arithmetic (same static kernel the codegen'd
    * expression calls), without routing two literal arrays through a
    * one-row Spark projection. The old `spark.range(1).select(...)`
    * idiom generated one projection COLUMN per constant dot; at
    * production shapes (nlist ≈ 1000 centroid norms, m·ksub ≈ 2048 ADC
    * table cells) the single generated class overflowed janino's 64 KB
    * method limit — an ERROR-logged compile failure and interpreted
    * fallback on every probe call, plus one scheduled job per table.
    * Floats must be widened by the CALLER (exact) — mixed float×double
    * dots are bit-identical either way because the kernel widens floats
    * to double before multiplying. Fails loudly on length mismatch (the
    * projection form returned SQL NULL; every call site immediately
    * `require`d it away). */
  def fixedDotDriver(a: Seq[Double], b: Seq[Double]): Long = {
    val r = FixedDot.kernel(
      ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray),
      aIsDouble = true, bIsDouble = true)
    require(r != null, s"fixed_dot: length mismatch ${a.length} vs ${b.length}")
    r.longValue()
  }
}

/** All `m` PQ codes of a vector in ONE native loop — the fused form of
  * `array(nearestCode(v, 0), ..., nearestCode(v, m-1))`, where each
  * composed `nearestCode` unrolled `ksub` fixed-point sub-dots into an
  * `array_max`-of-structs chain: at realistic (m, ksub) the enclosing
  * stage's generated method overflowed janino's 64 KB limit (observed
  * in the PQ training explode), silently dropping the whole stage to
  * interpreted evaluation. Argmax semantics replicate the struct-max
  * bit-for-bit: key_j = 2·⟨sub, c_j⟩ − ‖c_j‖² in 1e-15 fixed point,
  * ties to the smaller j, null keys (malformed slice / null element /
  * NULL vector) lose to any non-null key, and an all-null subspace
  * yields code 0 — exactly what `-array_max(...).getField("n")`
  * evaluates to. A NULL input vector therefore yields the all-zero
  * code row, NOT null (pinned in ExprSpec). */
case class PqCodes(child: Expression, cbs: Array[Array[Array[Double]]],
                   cc: Array[Array[Long]]) extends UnaryExpression {
  require(cbs.nonEmpty && cbs.forall(_.nonEmpty) &&
    cbs.forall(_.forall(_.nonEmpty)), "empty PQ codebook")
  // subspace offsets assume one shared sub-dimension — a heterogeneous
  // codebook would silently slice the wrong elements
  require(cbs.forall(_.forall(_.length == cbs(0)(0).length)),
    "PQ codebook subspaces must share one sub-dimension")
  require(cc.length == cbs.length &&
    cc.indices.forall(s => cc(s).length == cbs(s).length),
    "codeword-norm table shape mismatch")
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_codes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_codes requires array<float|double>, got ${other.sql}")
    }
  private def vecIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  def codes(vec: ArrayData): ArrayData = {
    val m = cbs.length
    val out = new Array[Short](m)
    var s = 0
    while (s < m) {
      val cb = cbs(s)
      val base = s * cb(0).length
      var bestKey = 0L
      var bestJ = -1
      var j = 0
      while (j < cb.length) {
        val dot = if (vec == null) null
          else CodebookKernels.fixedDotSlice(vec, base, cb(j),
            vecIsDouble, exact = false)
        if (dot != null) {
          val key = 2L * dot.longValue() - cc(s)(j)
          // strict >: equal keys keep the earlier (smaller) j
          if (bestJ < 0 || key > bestKey) { bestKey = key; bestJ = j }
        }
        j += 1
      }
      out(s) = math.max(bestJ, 0).toShort
      s += 1
    }
    ArrayData.toArrayData(out)
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    codes(if (v == null) null else v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral,
      code = c.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  $self.codes(${c.isNull} ? null : ${c.value});
         """)
  }
  override def equals(other: Any): Boolean = other match {
    case p: PqCodes =>
      child == p.child &&
        java.util.Arrays.deepEquals(
          cbs.asInstanceOf[Array[AnyRef]], p.cbs.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(
          cc.asInstanceOf[Array[AnyRef]], p.cc.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient private lazy val tabHash =
    31 * java.util.Arrays.deepHashCode(cbs.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.deepHashCode(cc.asInstanceOf[Array[AnyRef]])
  override def hashCode(): Int = 31 * child.hashCode() + tabHash
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Nearest-centroid index over a driver-side codebook in ONE native
  * loop — the fused form of the k-wide `array_max`-of-structs argmax in
  * `Similarity.nearestCentroid` (same 64 KB-overflow hazard as
  * [[PqCodes]] once k reaches production `nlist ≈ √N`). Key_j is the
  * cosine with the row-norm factor dropped:
  * `⟨v, c_j⟩.toDouble / √‖c_j‖²` from the same 1e-15 fixed-point dot;
  * comparison is `java.lang.Double.compare` (Spark's double ordering),
  * ties to the smaller j, null keys lose, all-null yields 0 — the
  * struct-max semantics bit-for-bit, including a NULL/malformed vector
  * mapping to list 0, not null. */
case class NearestCentroidK(child: Expression, cents: Array[Array[Double]],
                            dyy: Array[Long]) extends UnaryExpression {
  require(cents.nonEmpty && cents.forall(_.nonEmpty), "empty codebook")
  require(dyy.length == cents.length && dyy.forall(_ > 0L),
    "centroid-norm table shape mismatch or zero norm")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires array<float|double>, got ${other.sql}")
    }
  private def vecIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  // √dyy once per plan, not per row — the composed form's sqrt(lit(..))
  // constant-folds to the identical Math.sqrt double
  @transient private lazy val sqrtDyy: Array[Double] = dyy.map(d => Math.sqrt(d.toDouble))
  def nearest(vec: ArrayData): Long = {
    var bestS = 0.0
    var bestJ = -1
    var j = 0
    while (j < cents.length) {
      val dot = if (vec == null) null
        else CodebookKernels.fixedDotSlice(vec, 0, cents(j),
          vecIsDouble, exact = true)
      if (dot != null) {
        val s = dot.longValue().toDouble / sqrtDyy(j)
        // strict >: equal affinities keep the earlier (smaller) j
        if (bestJ < 0 || java.lang.Double.compare(s, bestS) > 0) {
          bestS = s; bestJ = j
        }
      }
      j += 1
    }
    math.max(bestJ, 0).toLong
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    nearest(if (v == null) null else v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("nearestK", this, classOf[NearestCentroidK].getName)
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral,
      code = c.code +
        code"""
           |long ${ev.value} = $self.nearest(${c.isNull} ? null : ${c.value});
         """)
  }
  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroidK =>
      child == n.child &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], n.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(dyy, n.dyy)
    case _ => false
  }
  @transient private lazy val tabHash =
    31 * java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.hashCode(dyy)
  override def hashCode(): Int = 31 * child.hashCode() + tabHash
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidK =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) cosine score of a PQ `codes` row against a
  * query's lookup tables — the IVFPQ probe hot path
  * ([[graft.ops.Quantize]]) as ONE native loop:
  *
  *   score = Σ_s lut[s][code_s]  /  ( √qq · √(Σ_s cc[s][code_s]) )
  *
  * with every term in 1e-15 fixed-point units. The composed-Column form
  * (a reduce over m unrolled nested `element_at` chains) generates
  * O(m·nesting) Java per score and at realistic m overflows janino's
  * 64 KB method limit — Spark then silently falls back to interpreted
  * evaluation for the WHOLE stage, exactly where codegen matters most.
  * This kernel is a fixed-size call whatever m is, and its integer sums
  * and double chain (`(double)dot / (sqrt(qq) · sqrt(nn))`) replicate
  * the composed form's IEEE operation order bit-for-bit, so oracle SQL
  * replays scores unchanged.
  *
  * `lut` is an expression — a `typedLit` for single-query probes, the
  * per-row ADC table column for batch kNN joins; `qq` likewise (literal
  * or column). Codeword self-norms `cc` are part of the INDEX, never
  * the query, so they stay a constructor constant. NULL children, a
  * short/over-length codes row, a NULL element, or an out-of-range code
  * yield NULL — the same null-propagation the `element_at` composition
  * had (one divergence, pinned in ExprSpec: `element_at(tab, 0)` ERRORS
  * while a corrupt code byte of -1 nulls here; only the engine's own
  * encoder writes codes, and a corrupt row must not rank). */
case class AdcScore(codes: Expression, lut: Expression, qq: Expression,
                    cc: Array[Array[Long]]) extends TernaryExpression {
  require(cc.nonEmpty && cc.forall(_.nonEmpty), "empty codeword-norm table")
  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = qq
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (codes.dataType, lut.dataType, qq.dataType) match {
      case (ArrayType(ShortType, _), ArrayType(ArrayType(LongType, _), _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, l, q) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adc_score requires (array<smallint>, array<array<bigint>>, bigint), " +
          s"got (${c.sql}, ${l.sql}, ${q.sql})")
    }
  def score(codesV: ArrayData, lutV: ArrayData, qqV: Long): java.lang.Double =
    AdcScore.kernel(codesV, lutV, qqV, cc)
  override def nullSafeEval(c: Any, l: Any, q: Any): Any =
    score(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData],
      q.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS instance: the cc table rides it (megabyte-scale at
    // large ksub — embedded once per plan, not per call site)
    val self = ctx.addReferenceObj("adcScore", this, classOf[AdcScore].getName)
    nullSafeCodeGen(ctx, ev, (c, l, q) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $self.score($c, $l, $q);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin
    })
  }
  // the case-class default compares cc by REFERENCE, breaking
  // canonicalization/semanticEquals for equal tables built twice (the
  // BloomContainsAny hazard); compare contents
  override def equals(other: Any): Boolean = other match {
    case a: AdcScore =>
      codes == a.codes && lut == a.lut && qq == a.qq &&
        java.util.Arrays.deepEquals(
          cc.asInstanceOf[Array[AnyRef]], a.cc.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient private lazy val ccHash =
    java.util.Arrays.deepHashCode(cc.asInstanceOf[Array[AnyRef]])
  override def hashCode(): Int =
    ((31 * codes.hashCode() + lut.hashCode()) * 31 + qq.hashCode()) * 31 + ccHash
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): AdcScore =
    copy(codes = newFirst, lut = newSecond, qq = newThird)
}

object AdcScore {
  /** Boxed return so null is representable. Sums wrap in 64-bit exactly
    * as the non-ANSI LongType `+` chain did. */
  def kernel(codes: ArrayData, lut: ArrayData, qq: Long,
             cc: Array[Array[Long]]): java.lang.Double = {
    val m = cc.length
    // the composed form reads exactly elements 1..m of each array —
    // a SHORT row nulls (element_at past the end), extra elements are
    // simply never read
    if (codes.numElements() < m || lut.numElements() < m) return null
    var dot = 0L
    var nn = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || lut.isNullAt(s)) return null
      val code = codes.getShort(s).toInt
      val tab = lut.getArray(s)
      if (code < 0 || code >= tab.numElements() || code >= cc(s).length ||
        tab.isNullAt(code)) return null
      dot += tab.getLong(code)
      nn += cc(s)(code)
      s += 1
    }
    java.lang.Double.valueOf(
      dot.toDouble / (Math.sqrt(qq.toDouble) * Math.sqrt(nn.toDouble)))
  }
}

/** The full m×ksub ADC lookup table of a query VECTOR COLUMN in ONE
  * native loop — the batch-kNN-join counterpart of the driver-side
  * [[CodebookKernels.fixedDotDriver]] tables: `lut[s][j] =
  * fixed_dot(sub_s(vec), codeword_sj)`. The composed form (an `array`
  * of m `array`s of ksub inline [[FixedDot]] calls) generated O(m·ksub)
  * Java in the query-side projection and overflowed janino's 64 KB
  * method limit at production ksub = 256 (observed: every
  * `ivfPqKnnJoin` probe logged a compile ERROR and ran interpreted).
  * Cell semantics replicate `fixed_dot(slice(vec, s·dsub+1, dsub), c)`
  * exactly: a NULL vector, a vector too short for the slice, or a NULL
  * element nulls THAT CELL (not the row), extra trailing elements are
  * never read. */
case class PqLut(child: Expression, cbs: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(cbs.nonEmpty && cbs.forall(_.nonEmpty) &&
    cbs.forall(_.forall(_.nonEmpty)), "empty PQ codebook")
  // subspace offsets assume one shared sub-dimension — a heterogeneous
  // codebook would silently slice the wrong elements
  require(cbs.forall(_.forall(_.length == cbs(0)(0).length)),
    "PQ codebook subspaces must share one sub-dimension")
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = true), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_lut"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_lut requires array<float|double>, got ${other.sql}")
    }
  private def vecIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  def lut(vec: ArrayData): ArrayData = {
    val m = cbs.length
    val out = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val cb = cbs(s)
      val base = s * cb(0).length
      val row = new Array[Any](cb.length)
      var j = 0
      while (j < cb.length) {
        row(j) = if (vec == null) null
          else CodebookKernels.fixedDotSlice(vec, base, cb(j),
            vecIsDouble, exact = false)
        j += 1
      }
      out(s) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    lut(if (v == null) null else v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral,
      code = c.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  $self.lut(${c.isNull} ? null : ${c.value});
         """)
  }
  override def equals(other: Any): Boolean = other match {
    case p: PqLut =>
      child == p.child && java.util.Arrays.deepEquals(
        cbs.asInstanceOf[Array[AnyRef]], p.cbs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient private lazy val tabHash =
    java.util.Arrays.deepHashCode(cbs.asInstanceOf[Array[AnyRef]])
  override def hashCode(): Int = 31 * child.hashCode() + tabHash
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** The `nprobe` best list ids for a query VECTOR COLUMN in ONE native
  * loop — the fused form of the nlist-wide
  * `transform(slice(array_sort(array(struct(-affinity, cid), ...)), 1,
  * nprobe), _.cid)` probe ranking used by every batch kNN join: at
  * production `nlist ≈ √N ≈ 1000` the composed array generated O(nlist)
  * Java per query row and overflowed janino's 64 KB method limit.
  * Ordering replicates the struct sort bit-for-bit: key_j =
  * `-(⟨vec, c_j⟩.toDouble / √‖c_j‖²)` (1e-15 fixed-point dot), sorted
  * ascending with a NULL key FIRST (Catalyst's ascending struct
  * ordering is null-first per FIELD — a malformed/NULL vector probes
  * the smallest cids), ties to the smaller cid, first `nprobe` taken.
  * `cids` carries the caller's list ids (arbitrary, e.g. corpus-seed
  * row ids) so the output is the final probe list, not indices. */
case class TopListsK(child: Expression, cents: Array[Array[Double]],
                     cids: Array[Long], dyy: Array[Long], nprobe: Int)
    extends UnaryExpression {
  require(cents.nonEmpty && cents.forall(_.nonEmpty), "empty codebook")
  require(cids.length == cents.length, "list-id table shape mismatch")
  require(dyy.length == cents.length && dyy.forall(_ > 0L),
    "centroid-norm table shape mismatch or zero norm")
  require(nprobe >= 1 && nprobe <= cents.length,
    s"need 1 <= nprobe <= ${cents.length}, got $nprobe")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_lists"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_lists requires array<float|double>, got ${other.sql}")
    }
  private def vecIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  @transient private lazy val sqrtDyy: Array[Double] = dyy.map(d => Math.sqrt(d.toDouble))
  def probes(vec: ArrayData): ArrayData = {
    val n = cents.length
    // (negated affinity, null flag) per centroid; then an index sort
    val ns = new Array[Double](n)
    val isNull = new Array[Boolean](n)
    var j = 0
    while (j < n) {
      val dot = if (vec == null) null
        else CodebookKernels.fixedDotSlice(vec, 0, cents(j),
          vecIsDouble, exact = true)
      if (dot == null) isNull(j) = true
      else ns(j) = -(dot.longValue().toDouble / sqrtDyy(j))
      j += 1
    }
    val order = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val (i1, i2) = (a.intValue(), b.intValue())
        if (isNull(i1) || isNull(i2)) {
          // ascending struct ordering: a null field sorts FIRST
          if (isNull(i1) && isNull(i2)) java.lang.Long.compare(cids(i1), cids(i2))
          else if (isNull(i1)) -1 else 1
        } else {
          val c = java.lang.Double.compare(ns(i1), ns(i2))
          if (c != 0) c else java.lang.Long.compare(cids(i1), cids(i2))
        }
      }
    })
    val out = new Array[Long](nprobe)
    var i = 0
    while (i < nprobe) { out(i) = cids(order(i).intValue()); i += 1 }
    ArrayData.toArrayData(out)
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    probes(if (v == null) null else v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("topLists", this, classOf[TopListsK].getName)
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral,
      code = c.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  $self.probes(${c.isNull} ? null : ${c.value});
         """)
  }
  override def equals(other: Any): Boolean = other match {
    case t: TopListsK =>
      child == t.child && nprobe == t.nprobe &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], t.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(cids, t.cids) &&
        java.util.Arrays.equals(dyy, t.dyy)
    case _ => false
  }
  @transient private lazy val tabHash =
    (31 * java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.hashCode(cids)) * 31 + java.util.Arrays.hashCode(dyy)
  override def hashCode(): Int =
    (31 * child.hashCode() + tabHash) * 31 + nprobe
  override protected def withNewChildInternal(newChild: Expression): TopListsK =
    copy(child = newChild)
}

/** Bloom-filter membership of a LongType id against a BROADCAST
  * `BloomFilter` — the persisted-index family's per-row novelty/replay
  * probe ([[graft.ops.IndexIds]]) as a codegen'd expression instead of a
  * boxed Scala udf: the guard runs on every append and every streaming
  * micro-batch, and the udf paid per-row `java.lang.Long` boxing plus
  * closure dispatch. The filter itself rides a Spark broadcast (torrent-
  * distributed once per executor, NOT embedded in the serialized plan —
  * an id sidecar can reach hundreds of MB at billion-id scale), fetched
  * lazily once per task and probed with a primitive-long call. NULL ids
  * yield NULL (the call sites filter, where NULL and the old udf's
  * `false` drop the row identically). */
case class BloomMightContain(child: Expression,
                             bloom: org.apache.spark.broadcast.Broadcast[
                               org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a bigint argument, got ${other.sql}")
    }
  override def prettyName: String = "bloom_might_contain"
  // one broadcast-cache lookup per task, not per row
  @transient private lazy val bf = bloom.value
  def test(id: Long): Boolean = bf.mightContainLong(id)
  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS instance: the dereferenced filter is a lazy val on
    // it, resolved once per task and shared with interpreted eval
    val self = ctx.addReferenceObj("bloomMc", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.test($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Code-point segmentation shared by the BPE kernel and the trainer
  * ([[graft.ops.Bpe]]) — ONE definition so the apply-side symbols can
  * never drift from the dictionary symbols the merges were learned
  * over. A surrogate pair is ONE symbol, matching code-point string
  * semantics in Spark's and DuckDB's substr. (The test suite keeps its
  * own independent splitter as the executable reference.) */
object CodePoints {
  def split(word: String): Array[String] = {
    val out = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out.add(word.substring(i, i + n))
      i += n
    }
    out.toArray(new Array[String](out.size()))
  }
}

/** The byte-fallback token surface forms — the byte-BPE convention
  * (SentencePiece's `<0xNN>` rendering): 256 reserved tokens, one per
  * byte value, always present in a fallback-enabled vocabulary so
  * encoding is TOTAL on any input (an unseen code point encodes as its
  * UTF-8 bytes instead of an out-of-vocabulary sentinel). Hex is
  * UPPERCASE: the tokenizer lowercases its input, so a corpus-derived
  * token can never spell a form containing `A`–`F`; only the 210
  * digit-only forms are theoretically reachable by a merge chain that
  * reassembles the literal 6-char string — such a merge product gets
  * its OWN vocab id after the reserved block ([[graft.ops.Bpe
  * .buildVocab]] excludes the block from dedup), so the literal
  * spelling round-trips verbatim and reserved ids stay exclusively
  * byte-fallback. */
object ByteTokens {
  def token(b: Int): String = f"<0x$b%02X>"
  /** All 256 forms in byte order — the vocabulary block. */
  val all: IndexedSeq[String] = (0 until 256).map(token)
}

/** Rank-greedy BPE segmenter shared by the BPE kernels ([[BpeEncode]],
  * [[BpeChunk]]) — ONE merge-application loop so the chunker can never
  * count tokens differently than the encoder emits them. Each word
  * splits into Unicode CODE POINTS ([[CodePoints]]), then the
  * lowest-RANK adjacent pair present in the table is merged repeatedly
  * (leftmost occurrence first on equal rank) until no adjacent pair
  * remains — Sennrich's standard application, replaying the learn-time
  * merge order exactly.
  *
  * Words repeat zipfianly, so segmentations are memoized (bounded by
  * entry count AND per-word length: without the latter, 64k distinct
  * doc-sized "words" — whitespace-free spam — would pin gigabytes per
  * task; long words are rare enough that re-segmenting beats retaining
  * them). Instantiate per task inside a `@transient lazy val`: the map
  * is single-threaded by construction. */
private[graft] final class BpeSegmenter(merges: Array[Array[String]]) {
  // boxed Integer values: a primitive-Int value type would make the
  // missing-key `get` unbox null to 0 — rank 0, the BEST merge
  private val ranks: java.util.HashMap[(String, String), java.lang.Integer] = {
    val m = new java.util.HashMap[(String, String), java.lang.Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case (p, i) =>
      m.put((p(0), p(1)), java.lang.Integer.valueOf(i))
    }
    m
  }
  private val memo = new java.util.HashMap[String, Array[UTF8String]]()
  private def split(word: String): Array[UTF8String] = {
    val syms = {
      val cps = CodePoints.split(word)
      val out = new java.util.ArrayList[String](cps.length)
      var i = 0
      while (i < cps.length) { out.add(cps(i)); i += 1 }
      out
    }
    var done = false
    while (!done && syms.size() > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.size() - 1) {
        val r = ranks.get((syms.get(i), syms.get(i + 1)))
        // strict <: equal ranks keep the earlier (leftmost) position
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = i
        }
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
      }
    }
    val out = new Array[UTF8String](syms.size())
    var j = 0
    while (j < out.length) { out(j) = UTF8String.fromString(syms.get(j)); j += 1 }
    out
  }
  def segment(word: String): Array[UTF8String] = {
    var seg = memo.get(word)
    if (seg == null) {
      seg = split(word)
      if (word.length <= 256 && memo.size() < (1 << 16))
        memo.put(word, seg)
    }
    seg
  }
}

/** Shared plan-time validation of a BPE merge table (the [[BpeEncode]]
  * discipline: validated HERE, not in the lazy rank map — a lazy-val
  * require would pass analysis and only throw inside executor tasks,
  * 4x retries with the failure buried in executor logs). */
private[functions] object BpeMerges {
  def validate(merges: Array[Array[String]]): Unit = {
    require(merges.forall(m => m.length == 2 && m(0) != null && m(1) != null &&
      m(0).nonEmpty && m(1).nonEmpty), "merges must be non-empty [l, r] pairs")
    require(merges.map(m => (m(0), m(1))).distinct.length == merges.length,
      "duplicate merge pair in the table")
  }
}

/** BPE subword segmentation of an `array<string>` of WORDS against a
  * rank-ordered merge table (Sennrich et al. 2016, ACL: "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-apply
  * side of [[graft.ops.Bpe]] as one native loop per row
  * ([[BpeSegmenter]]). Output concatenates every word's subword tokens
  * in word order; token concatenation per word equals the word (no
  * end-of-word marker — a presentation divergence from Sennrich's
  * `</w>`, documented in [[graft.ops.Bpe]]). NULL input yields NULL;
  * NULL/empty words are skipped (the `tokens()` discipline: `split`
  * never yields nulls, but the kernel must not depend on it). */
case class BpeEncode(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {
  BpeMerges.validate(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires array<string>, got ${other.sql}")
    }
  @transient private lazy val seg = new BpeSegmenter(merges)
  def encode(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val toks = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (w.numBytes() > 0) {
          val s = seg.segment(w.toString)
          var j = 0
          while (j < s.length) { toks.add(s(j)); j += 1 }
        }
      }
      i += 1
    }
    ArrayData.toArrayData(toks.toArray(new Array[UTF8String](toks.size())))
  }
  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeEnc", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.encode($c);")
  }
  // case-class default compares merges by reference (the AdcScore
  // hazard); compare contents so semanticEquals holds for equal tables
  override def equals(other: Any): Boolean = other match {
    case b: BpeEncode =>
      child == b.child && java.util.Arrays.deepEquals(
        merges.asInstanceOf[Array[AnyRef]], b.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient private lazy val tabHash =
    java.util.Arrays.deepHashCode(merges.asInstanceOf[Array[AnyRef]])
  override def hashCode(): Int = 31 * child.hashCode() + tabHash
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Greedy word-boundary CHUNKING of an `array<string>` of WORDS with
  * the budget measured in BPE TOKENS ([[graft.ops.Bpe
  * .chunkByTokenBudget]] — the RAG/context-window prep step in ACTUAL
  * model tokens, where the whitespace-token variant
  * ([[graft.ops.TextStats.chunk]]) budgets in words). One native loop
  * per row: each non-null, non-empty word is segmented by the SAME
  * [[BpeSegmenter]] the encoder uses (its token count under the model
  * is the word's cost), and words are packed left to right — a word
  * joins the current chunk unless that would push the chunk past
  * `budget`, in which case it STARTS the next chunk. The first word of
  * a chunk is always accepted, so a single word costing more than the
  * whole budget yields a chunk of itself (words are never split across
  * chunks — splitting would break the subword⇄word alignment the
  * no-`</w>` convention guarantees). Output: `array<struct<chunk_text,
  * n_tokens>>` — words re-joined with single spaces, and the chunk's
  * exact model-token count. Every word lands in exactly one chunk; no
  * chunk is empty; Σ n_tokens = the document's total token count. A
  * word-free input (empty array, or only null/empty words) yields ONE
  * empty chunk — [[graft.ops.TextStats.chunk]]'s convention, so a doc
  * count survives the op. NULL input yields NULL. */
case class BpeChunk(child: Expression, merges: Array[Array[String]],
                    budget: Long) extends UnaryExpression {
  BpeMerges.validate(merges)
  require(budget > 0, s"token budget must be positive, got $budget")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bpe_chunk"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_chunk requires array<string>, got ${other.sql}")
    }
  @transient private lazy val seg = new BpeSegmenter(merges)
  def chunk(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[InternalRow]()
    val sb = new java.lang.StringBuilder()
    var running = 0L
    var inChunk = 0
    def flush(): Unit = {
      out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(sb.toString), running)))
      sb.setLength(0); running = 0L; inChunk = 0
    }
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (w.numBytes() > 0) {
          val key = w.toString
          val c = seg.segment(key).length.toLong
          if (inChunk > 0 && running + c > budget) flush()
          if (inChunk > 0) sb.append(' ')
          sb.append(key); running += c; inChunk += 1
        }
      }
      i += 1
    }
    // trailing chunk; a word-free document still yields one empty chunk
    if (inChunk > 0 || out.isEmpty) flush()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[InternalRow](out.size())).asInstanceOf[Array[Any]])
  }
  override def nullSafeEval(v: Any): Any = chunk(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeChunk", this, classOf[BpeChunk].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.chunk($c);")
  }
  // content equality over the merge table (the AdcScore
  // reference-compare hazard) so semanticEquals holds for equal tables
  override def equals(other: Any): Boolean = other match {
    case b: BpeChunk =>
      child == b.child && budget == b.budget && java.util.Arrays.deepEquals(
        merges.asInstanceOf[Array[AnyRef]], b.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient private lazy val tabHash =
    java.util.Arrays.deepHashCode(merges.asInstanceOf[Array[AnyRef]])
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + tabHash) + java.lang.Long.hashCode(budget)
  override protected def withNewChildInternal(newChild: Expression): BpeChunk =
    copy(child = newChild)
}

/** Dense-id mapping of an `array<string>` of tokens against a fixed
  * VOCABULARY (position = id) — the id-emitting half of the BPE
  * tokenizer ([[graft.ops.Bpe.encodeIdsCol]]), composable with any
  * token-array column. Without fallback it is positional: one id per
  * input element; a token absent from the vocabulary (or a NULL
  * element) maps to -1 rather than being dropped, so `token_ids[i]`
  * always describes `tokens[i]`. With `byteFallback` (the byte-BPE
  * convention — requires every [[ByteTokens]] form in the vocab) the
  * mapping is TOTAL instead: an out-of-vocabulary token expands to the
  * ids of its UTF-8 bytes in order (a NULL element, which has no
  * bytes, expands to nothing), so -1 is never emitted — at the price
  * of the 1:1 positional alignment, which byte expansion inherently
  * breaks. The vocab rides the serialized expression (a production
  * 32k-merge vocabulary is a few hundred KB) and the string→id map is
  * built once per task. */
case class TokenIds(child: Expression, vocab: Array[String],
                    byteFallback: Boolean = false)
    extends UnaryExpression {
  require(vocab.nonEmpty && vocab.forall(t => t != null && t.nonEmpty),
    "vocab must be non-empty tokens")
  // validated HERE, not in the lazy id map: a lazy-val require would
  // only throw inside executor tasks (the BpeEncode discipline).
  // Under byteFallback ONE duplication is legal: a byte-token spelling
  // may appear twice — the reserved block entry plus a LITERAL entry
  // for a merge product that spells the same 6 characters (the vocab
  // builder keeps both so literal text round-trips). The string then
  // maps to the LITERAL id; the reserved id is reachable only through
  // byte expansion (resolved positionally below).
  if (!byteFallback)
    require(vocab.distinct.length == vocab.length,
      "duplicate token in the vocabulary")
  else {
    val bt = ByteTokens.all.toSet
    vocab.groupBy(identity).foreach { case (t, occ) =>
      require(occ.length == 1 || (occ.length == 2 && bt.contains(t)),
        s"duplicate token in the vocabulary: '$t' (only a byte-token " +
          "spelling may appear twice: reserved block + literal entry)")
    }
    val vs = vocab.toSet
    require(ByteTokens.all.forall(vs.contains),
      "byteFallback needs all 256 byte tokens (<0x00>..<0xFF>) in the " +
        "vocabulary — build the model with byteFallback = true")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ids"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_ids requires array<string>, got ${other.sql}")
    }
  // boxed Long values so a missing key is a null, not an unboxed 0 —
  // id 0, the FIRST vocab entry (the BpeEncode rank-map hazard).
  // Forward put = LAST occurrence wins: for the one legal duplicate (a
  // literal byte-token spelling after the reserved block) the string
  // maps to the LITERAL id, so literal text never encodes to a
  // reserved id.
  @transient private lazy val ids: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { m.put(vocab(i), java.lang.Long.valueOf(i.toLong)); i += 1 }
    m
  }
  // byte value -> its byte token's id, resolved by FIRST-occurrence
  // position (the reserved block) — NOT through the id map, where a
  // literal duplicate would redirect the expansion to the literal id
  // and decode would then render text instead of the raw byte
  @transient private lazy val byteIds: Array[Long] = {
    val first = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    var i = vocab.length - 1
    while (i >= 0) { first.put(vocab(i), java.lang.Long.valueOf(i.toLong)); i -= 1 }
    val a = new Array[Long](256)
    var b = 0
    while (b < 256) { a(b) = first.get(ByteTokens.token(b)).longValue(); b += 1 }
    a
  }
  def map(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    var out = new Array[Long](n)
    var m = 0
    def push(v: Long): Unit = {
      if (m == out.length)
        out = java.util.Arrays.copyOf(out, math.max(4, out.length * 2))
      out(m) = v; m += 1
    }
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) { if (!byteFallback) push(-1L) }
      else {
        val t = toks.getUTF8String(i)
        val id = ids.get(t.toString)
        if (id != null) push(id.longValue())
        else if (!byteFallback) push(-1L)
        else {
          // UTF8String already holds the UTF-8 bytes — expand in order
          val bs = t.getBytes
          var j = 0
          while (j < bs.length) { push(byteIds(bs(j) & 0xff)); j += 1 }
        }
      }
      i += 1
    }
    ArrayData.toArrayData(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }
  override def nullSafeEval(v: Any): Any = map(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenIds", this, classOf[TokenIds].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.map($c);")
  }
  // content equality over the vocab (the AdcScore reference-compare
  // hazard) so semanticEquals holds for equal tables
  override def equals(other: Any): Boolean = other match {
    case t: TokenIds =>
      child == t.child && byteFallback == t.byteFallback &&
        java.util.Arrays.equals(
          vocab.asInstanceOf[Array[AnyRef]], t.vocab.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient private lazy val tabHash =
    java.util.Arrays.hashCode(vocab.asInstanceOf[Array[AnyRef]])
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + tabHash) + byteFallback.hashCode()
  override protected def withNewChildInternal(newChild: Expression): TokenIds =
    copy(child = newChild)
}

/** Bounded top-k buffer: a k-sized min-heap whose root is the WORST
  * retained entry under (score desc, id asc) — [[TopKByScore]]'s
  * aggregation state. Insertion is O(log k); memory is O(k) triples no
  * matter how many rows stream through — the bound that replaces a
  * full partition sort in the ANN re-rank paths. Double ordering is
  * `java.lang.Double.compare` (NaN greatest, -0.0 < 0.0) — the same
  * total order Spark's sort uses, so results match a `row_number`
  * window over (score desc, id asc) exactly. */
private[graft] final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val pays = new Array[Long](k)
  var n = 0
  // entry (s1, i1) ranks strictly BELOW (s2, i2)
  private def worseThan(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }
  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
    val p = pays(a); pays(a) = pays(b); pays(b) = p
  }
  def insert(s: Double, id: Long, p: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = id; pays(n) = p; n += 1
      var i = n - 1
      var done = false
      while (!done && i > 0) {
        val par = (i - 1) >> 1
        if (worseThan(scores(i), ids(i), scores(par), ids(par))) {
          swap(i, par); i = par
        } else done = true
      }
    } else if (worseThan(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id; pays(0) = p
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worseThan(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worseThan(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }
  /** Indices 0..n-1 in best-first order (score desc, id asc). */
  def rankedIdx: Array[Int] = {
    val idx = Array.tabulate[Integer](n)(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Double.compare(scores(b), scores(a))
        if (c != 0) c else java.lang.Long.compare(ids(a), ids(b))
      }
    })
    idx.map(_.intValue())
  }
}

/** Per-group bounded TOP-K aggregate under (score desc, id asc) —
  * `array<struct<id, score, payload>>` of the k best (score, id,
  * payload) triples per group, best first. The scale-shape alternative
  * to `row_number().over(Window...) <= k`: a rank-filtered window must
  * SORT each group's full candidate relation (per-partition sort
  * footprint proportional to candidates, the structure that sat at the
  * heap edge in the >64k ANN re-rank), where this aggregate holds O(k)
  * per group at every stage — partial aggregation caps each map task's
  * contribution at k triples per group BEFORE the shuffle, and the
  * merge is heap-insert of ≤ k entries. Ties and NaN ordering match
  * the window exactly ([[TopKHeap]]); NULL scores/ids are dropped (a
  * NULL is not a ranking — the window would surface them only in
  * groups with fewer than k real candidates). `payload` carries one
  * LONG of row context (a list id, a bucket) through the cut; NULL
  * payload stores 0. */
case class TopKByScore(score: Expression, id: Expression,
                       payload: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[TopKHeap] {
  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")
  override def children: Seq[Expression] = Seq(score, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType, payload.dataType) match {
      case (DoubleType, LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score requires (double, bigint, bigint), got $other")
    }
  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)
  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = payload.eval(input)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) 0L else p.asInstanceOf[Long])
    }
    b
  }
  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = {
    var j = 0
    while (j < o.n) { b.insert(o.scores(j), o.ids(j), o.pays(j)); j += 1 }
    b
  }
  override def eval(b: TopKHeap): Any = {
    val idx = b.rankedIdx
    val rows = new Array[Any](idx.length)
    var j = 0
    while (j < idx.length) {
      val i = idx(j)
      rows(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b.ids(i), b.scores(i), b.pays(i)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
  override def serialize(b: TopKHeap): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.n * 24)
    buf.putInt(b.n)
    var j = 0
    while (j < b.n) {
      buf.putDouble(b.scores(j)); buf.putLong(b.ids(j)); buf.putLong(b.pays(j))
      j += 1
    }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new TopKHeap(k)
    var j = 0
    while (j < n) {
      val s = buf.getDouble(); val i = buf.getLong(); val p = buf.getLong()
      b.insert(s, i, p)
      j += 1
    }
    b
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
}

/** Per-group k-th smallest LONG key (the group's max when it holds
  * fewer than k non-null keys; NULL for an all-null group) — the
  * THRESHOLD half of a bounded bottom-k-rows-per-group cut
  * ([[graft.ops.Sample.bottomKPerGroup]]): rows with `key <= threshold`
  * are exactly the bottom k plus any key ties at the boundary, so a
  * cheap rank over that O(k)-sized survivor set replaces a full
  * per-partition sort of every group's rows. State is a k-bounded
  * max-heap of the smallest keys seen — O(k) longs per group at every
  * stage, ≤ k values per group per map task across the shuffle
  * (the [[TopKByScore]] discipline, scalar-threshold form; exact where
  * a double score could not hold a 60-bit hash key losslessly). */
case class BottomKthKey(key: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[BottomKthKey.Heap] {
  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")
  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "bottom_kth_key"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    key.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_kth_key requires bigint, got ${other.sql}")
    }
  override def createAggregationBuffer(): BottomKthKey.Heap =
    new BottomKthKey.Heap(k)
  override def update(b: BottomKthKey.Heap, input: InternalRow): BottomKthKey.Heap = {
    val v = key.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }
  override def merge(b: BottomKthKey.Heap, o: BottomKthKey.Heap): BottomKthKey.Heap = {
    var j = 0
    while (j < o.n) { b.insert(o.keys(j)); j += 1 }
    b
  }
  override def eval(b: BottomKthKey.Heap): Any =
    if (b.n == 0) null else b.keys(0) // heap root = worst retained
  override def serialize(b: BottomKthKey.Heap): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.n * 8)
    buf.putInt(b.n)
    var j = 0
    while (j < b.n) { buf.putLong(b.keys(j)); j += 1 }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): BottomKthKey.Heap = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new BottomKthKey.Heap(k)
    var j = 0
    while (j < n) { b.insert(buf.getLong()); j += 1 }
    b
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKthKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKthKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKthKey =
    copy(key = newChildren(0))
}

object BottomKthKey {
  /** k-bounded MAX-heap of the smallest keys seen: the root (index 0)
    * is the LARGEST retained key — the running k-th-smallest. */
  private[graft] final class Heap(val k: Int) {
    val keys = new Array[Long](k)
    var n = 0
    private def swap(a: Int, b: Int): Unit = {
      val t = keys(a); keys(a) = keys(b); keys(b) = t
    }
    def insert(v: Long): Unit = {
      if (n < k) {
        keys(n) = v; n += 1
        var i = n - 1
        var done = false
        while (!done && i > 0) {
          val par = (i - 1) >> 1
          if (keys(i) > keys(par)) { swap(i, par); i = par } else done = true
        }
      } else if (v < keys(0)) {
        keys(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var w = i
          if (l < n && keys(l) > keys(w)) w = l
          if (r < n && keys(r) > keys(w)) w = r
          if (w == i) done = true else { swap(i, w); i = w }
        }
      }
    }
  }
}

/** Bounded CONSERVATIVE (score, mass) histogram —
  * [[ScoreMassThreshold]]'s aggregation state. Holds at most `2·cap`
  * (score, mass) entries; when full, entries are sorted by score
  * descending (Spark's double total order: NaN greatest, -0.0 < 0.0)
  * and ADJACENT PAIRS collapse into one entry carrying the pair's
  * summed mass at the pair's LOWER score. The invariant that makes the
  * downstream prefix cut sound: every unit of mass only ever moves to
  * a score ≤ its true score, so for ANY s the sketch's
  * mass-at-score-≥-s is an UNDERestimate — a threshold read off the
  * sketch can only be too deep (keep extra survivors for the exact
  * pass to re-cut), never too shallow (lose a row the exact answer
  * keeps). Total mass is preserved exactly. Accuracy degrades
  * gracefully with group size (one pairwise collapse per doubling over
  * `cap`); the structure never exceeds O(cap) memory per group at any
  * stage. */
private[graft] final class MassSketch(val cap: Int) {
  var scores = new Array[Double](2 * cap)
  var masses = new Array[Long](2 * cap)
  var n = 0
  /** Entry indices sorted by score descending. */
  private def rankedIdx: Array[Integer] = {
    val idx = Array.tabulate[Integer](n)(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int =
        java.lang.Double.compare(scores(b), scores(a))
    })
    idx
  }
  private def compact(): Unit = {
    val idx = rankedIdx
    val ns = new Array[Double](2 * cap)
    val nm = new Array[Long](2 * cap)
    var i = 0
    var j = 0
    while (i < n) {
      if (i + 1 < n) {
        // pair's lower score (desc order: the second of the pair)
        ns(j) = scores(idx(i + 1))
        nm(j) = masses(idx(i)) + masses(idx(i + 1))
        i += 2
      } else {
        ns(j) = scores(idx(i)); nm(j) = masses(idx(i)); i += 1
      }
      j += 1
    }
    scores = ns; masses = nm; n = j
  }
  def insert(s: Double, m: Long): Unit = {
    if (n == 2 * cap) compact()
    scores(n) = s; masses(n) = m; n += 1
  }
  /** Smallest sketched score at which cumulative mass (walking scores
    * descending) STRICTLY exceeds `budget`; null when total mass stays
    * within it (no cut needed — the exact pass keeps everything).
    * Strict, not ≥: with `≥` a zero-mass row tied exactly at the budget
    * boundary could be cut out of the survivor set the exact window
    * still keeps. */
  def threshold(budget: Long): java.lang.Double = {
    val idx = rankedIdx
    var cum = 0L
    var i = 0
    while (i < n) {
      cum += masses(idx(i))
      if (cum > budget) return java.lang.Double.valueOf(scores(idx(i)))
      i += 1
    }
    null
  }
}

/** Per-group APPROXIMATE budget-prefix score threshold — the bounded
  * pre-cut that lets [[graft.ops.Sample.selectByBudget]] survive one
  * giant skewed group: a value T such that filtering the group to
  * `score >= T` provably RETAINS every row of the exact budget prefix
  * (rows ranked (score desc, id asc), kept while the running `mass`
  * sum stays ≤ `budget`) while bounding the survivor set to roughly
  * the budget's worth of mass — the exact window then sorts only the
  * survivors instead of the whole group. NULL when the group's total
  * mass fits the budget (nothing to cut).
  *
  * Safety is structural, not statistical ([[MassSketch]]): compaction
  * only ever moves mass to LOWER scores, so the sketch's
  * mass-above-any-score is an underestimate and the first score whose
  * sketched cumulative mass strictly exceeds the budget is ≤ the exact
  * boundary score. Ties/NaN/−0.0 follow Spark's double total order,
  * and score-cast rounding is monotone, so the guarantee carries
  * through a lossy integer→double cast. State is O(cap) entries per
  * group at every stage — partial aggregation ships ≤ 2·cap (score,
  * mass) pairs per group per map task, never rows. NULL scores/masses
  * are dropped here; the op-level callers fail loudly on them upstream
  * before this aggregate ever sees one. */
case class ScoreMassThreshold(score: Expression, mass: Expression,
                              budget: Long, cap: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[MassSketch] {
  require(budget > 0L, s"budget must be positive, got $budget")
  require(cap >= 16 && cap <= (1 << 20), s"cap must be in [16, 2^20], got $cap")
  override def children: Seq[Expression] = Seq(score, mass)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "score_mass_threshold"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, mass.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"score_mass_threshold requires (double, bigint), got $other")
    }
  override def createAggregationBuffer(): MassSketch = new MassSketch(cap)
  override def update(b: MassSketch, input: InternalRow): MassSketch = {
    val s = score.eval(input)
    val m = mass.eval(input)
    if (s != null && m != null)
      b.insert(s.asInstanceOf[Double], m.asInstanceOf[Long])
    b
  }
  override def merge(b: MassSketch, o: MassSketch): MassSketch = {
    var j = 0
    while (j < o.n) { b.insert(o.scores(j), o.masses(j)); j += 1 }
    b
  }
  override def eval(b: MassSketch): Any = {
    val t = b.threshold(budget)
    if (t == null) null else t.doubleValue()
  }
  override def serialize(b: MassSketch): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.n * 16)
    buf.putInt(b.n)
    var j = 0
    while (j < b.n) { buf.putDouble(b.scores(j)); buf.putLong(b.masses(j)); j += 1 }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): MassSketch = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val cnt = buf.getInt()
    val b = new MassSketch(cap)
    var j = 0
    while (j < cnt) {
      val s = buf.getDouble(); val m = buf.getLong()
      b.insert(s, m)
      j += 1
    }
    b
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): ScoreMassThreshold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScoreMassThreshold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ScoreMassThreshold =
    copy(score = newChildren(0), mass = newChildren(1))
}

/** [[ScoreMassThreshold]] with the budget as a FRACTION of the group's
  * own mass (`keepPpm` millionths) instead of a constant — the
  * per-group quantile cut ("top q% per domain") where every group has
  * a different absolute budget. Sound for the same structural reason,
  * plus one fact: [[MassSketch]] compaction moves mass between scores
  * but PRESERVES total mass exactly, so the group budget
  * `⌊total·keepPpm/1e6⌋` computed at eval time is the exact one the
  * caller's exact pass recomputes from `sum(mass)` — the two sides
  * cannot disagree. Returns NULL when the whole group fits (keepPpm =
  * 1e6, or every row ties above the cut). */
case class ScoreMassQuantileThreshold(score: Expression, mass: Expression,
                                      keepPpm: Long, cap: Int,
                                      mutableAggBufferOffset: Int = 0,
                                      inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[MassSketch] {
  require(keepPpm >= 0L && keepPpm <= 1000000L,
    s"keepPpm must be in [0, 1e6], got $keepPpm")
  require(cap >= 16 && cap <= (1 << 20), s"cap must be in [16, 2^20], got $cap")
  override def children: Seq[Expression] = Seq(score, mass)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "score_mass_quantile_threshold"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, mass.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"score_mass_quantile_threshold requires (double, bigint), got $other")
    }
  override def createAggregationBuffer(): MassSketch = new MassSketch(cap)
  override def update(b: MassSketch, input: InternalRow): MassSketch = {
    val s = score.eval(input)
    val m = mass.eval(input)
    if (s != null && m != null)
      b.insert(s.asInstanceOf[Double], m.asInstanceOf[Long])
    b
  }
  override def merge(b: MassSketch, o: MassSketch): MassSketch = {
    var j = 0
    while (j < o.n) { b.insert(o.scores(j), o.masses(j)); j += 1 }
    b
  }
  override def eval(b: MassSketch): Any = {
    // exact: compaction preserves total mass
    var total = BigInt(0)
    var j = 0
    while (j < b.n) { total += b.masses(j); j += 1 }
    val budget = total * keepPpm / 1000000
    // budget 0 is fine: threshold's strict walk returns the highest
    // positive-mass score, which retains exactly the zero-mass prefix
    // the exact pass can still keep
    val t = b.threshold(
      if (budget > BigInt(Long.MaxValue)) Long.MaxValue else budget.toLong)
    if (t == null) null else t.doubleValue()
  }
  override def serialize(b: MassSketch): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.n * 16)
    buf.putInt(b.n)
    var j = 0
    while (j < b.n) { buf.putDouble(b.scores(j)); buf.putLong(b.masses(j)); j += 1 }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): MassSketch = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val cnt = buf.getInt()
    val b = new MassSketch(cap)
    var j = 0
    while (j < cnt) {
      val s = buf.getDouble(); val m = buf.getLong()
      b.insert(s, m)
      j += 1
    }
    b
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): ScoreMassQuantileThreshold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScoreMassQuantileThreshold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ScoreMassQuantileThreshold =
    copy(score = newChildren(0), mass = newChildren(1))
}

/** First-occurrence line filter over an array of lines (kernel in
  * [[DedupLinesKernel]]) — keeps space-only lines unconditionally and
  * the first occurrence of every other distinct line, dropping null
  * elements; value-identical to the HOF formulation in
  * `Dedup.dedupLinesWithinHof`. */
case class DedupLinesFirst(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dedup_lines_first requires array<string>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    DedupLinesKernel.firstOccurrences(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DedupLinesKernel.firstOccurrences($c);")
  override protected def withNewChildInternal(newChild: Expression): DedupLinesFirst =
    copy(child = newChild)
}

/** Portable 60-bit md5 hash as a native expression (kernel in
  * [[Hash60Kernel]]); value-identical to the hex-string formulation and
  * to the DuckDB oracle's `('0x'||substr(md5(s),1,15))::BIGINT`. */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash60 requires a string argument, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    Hash60Kernel.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60Kernel.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

/** Single-pass character-class counts over a string — the quality-stat
  * kernel. `length(regexp_replace(text, CLASS, ""))` builds a whole new
  * string per class just to measure what was removed; three classes
  * meant three regex passes and three allocations per document. This
  * counts all three in ONE pass with zero allocation, value-identical:
  * `n_ws` counts Java-regex `\s` (exactly ' ', \t, \n, \u000B, \f, \r
  * without UNICODE_CHARACTER_CLASS — what Spark's regexp_replace ran),
  * `n_punct` counts [.,!?;:], `n_digit` counts [0-9]; all three classes
  * are single-code-unit ASCII, so code-point and code-unit counting
  * agree and `numChars - n_ws` equals the old no-space length. */
object CharClassCountsKernel {
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    var ws = 0L; var punct = 0L; var digit = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\u000B' | '\f' | '\r' => ws += 1
        case '.' | ',' | '!' | '?' | ';' | ':' => punct += 1
        case _ => if (c >= '0' && c <= '9') digit += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](ws, punct, digit))
  }
}

case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_ws", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_class_counts requires a string argument, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    CharClassCountsKernel.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharClassCountsKernel.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

/** Per-language stopword votes in ONE token-array pass — the langId
  * kernel. The declarative form built five `size(filter(toks,
  * array_contains(...)))` counts whose expressions were then each
  * duplicated across every argmax branch of the when-chain (conditional
  * branches defeat common-subexpression elimination), so a document's
  * tokens were re-scanned up to ~25×. One pass, one hash probe per
  * token, counts exactly equal to the per-language filter counts
  * (tokens with multiplicity; null tokens dropped like `array_contains`
  * dropping them through the filter). Language order is pinned by
  * [[LangVotesKernel.Langs]]; the stopword lists are the fixed
  * [[graft.ops.TextStats.Stopwords]] (duplicated here as the kernel's
  * own constant so `functions` stays independent of `ops`; a spec pins
  * the two in sync). */
object LangVotesKernel {
  val Langs: Array[String] = Array("en", "de", "es", "fr", "zh")
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "los", "y", "que", "es", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "pas", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))
  private val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    Langs.zipWithIndex.foreach { case (l, i) =>
      Stopwords(l).foreach(w => m.put(UTF8String.fromString(w), Integer.valueOf(i)))
    }
    m
  }
  def compute(arr: ArrayData): InternalRow = {
    val counts = new Array[Long](Langs.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val li = lookup.get(arr.getUTF8String(i))
        if (li != null) counts(li.intValue()) += 1L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(counts.map(c => c: Any))
  }
}

case class LangVotes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    LangVotesKernel.Langs.map(l => StructField(l, LongType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_votes requires array<string>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    LangVotesKernel.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangVotesKernel.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): LangVotes =
    copy(child = newChild)
}

/** Static MinHash kernel shared by the interpreted eval AND generated
  * code — whole-stage codegen emits a direct static call, so the hot
  * dedup loop stays inside the generated stage (no per-row virtual
  * `Expression.eval` dispatch). */
object MinHashKernel {
  final val P = 2147483647L
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  // per-signature-width coefficient arrays, built once per JVM
  private val coeffs =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffsFor(n: Int): (Array[Long], Array[Long]) =
    coeffs.computeIfAbsent(n, k => (
      Array.tabulate(k)(i => (i * 2654435761L) % P + 1L),
      Array.tabulate(k)(i => (i * 40503L) % P + 7L)))

  /** Per shingle md5 → top-60-bits → `mod P`, then
    * `sig[i] = min((a_i·h + b_i) mod P)` — same formula coefficients as
    * the SQL oracle (`graft.ops.Dedup.rehash`). */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val (as, bs) = coeffsFor(numHashes)
    val sig = Array.fill(numHashes)(P)
    val digest = md.get()
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      // null shingles are SKIPPED, matching the HOF spec (hash60(null) is
      // null and `least(m, null)` keeps m) — the SQL-registered surface
      // accepts arbitrary array<string>, internal callers never pass null
      if (!arr.isNullAt(s)) {
        digest.reset()
        val b = digest.digest(arr.getUTF8String(s).getBytes)
        // top 15 hex digits == top 60 bits of the digest
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (b(j) & 0xffL); j += 1 }
        h = (h << 4) | ((b(7) & 0xf0L) >>> 4)
        val hm = h % P
        var i = 0
        while (i < numHashes) {
          val r = (as(i) * hm + bs(i)) % P
          if (r < sig(i)) sig(i) = r
          i += 1
        }
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  /** [[compute]] fused over the raw token array: hashes each word n-gram
    * window incrementally (no shingle-string materialization) and skips
    * the distinct step — duplicate shingles cannot change a min, so the
    * signature is value-identical to `compute(shingleArray(...))`. */
  def computeFromTokens(toks: ArrayData, n: Int, numHashes: Int): ArrayData = {
    val (as, bs) = coeffsFor(numHashes)
    val sig = Array.fill(numHashes)(P)
    val digest = md.get()
    val m = toks.numElements()
    val positions = math.max(m - n + 1, 1)
    var s = 0
    while (s < positions) {
      val h = Hash60Kernel.hashWindow(toks, s, math.min(s + n, m), digest)
      val hm = h % P
      var i = 0
      while (i < numHashes) {
        val r = (as(i) * hm + bs(i)) % P
        if (r < sig(i)) sig(i) = r
        i += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }
}

/** Distinct hash60 values of the word n-gram shingles of a token array —
  * the inverted-index build in ONE native loop (kernel in
  * [[Hash60Kernel.shingleHashes]]): no per-position `slice`/`concat_ws`
  * allocations and no separate `array_distinct` passes. */
case class ShingleHash60(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hash60 requires array<string>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    Hash60Kernel.shingleHashes(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60Kernel.shingleHashes($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

/** Hashed n-gram feature buckets, repeats kept (kernel in
  * [[Hash60Kernel.gramBuckets]]) — the fused per-row form of
  * `transform(ngrams, g -> pmod(hash60(g), nBuckets))` minus empty
  * grams, for feature-hashing consumers ([[graft.ops.Importance]]). */
case class GramBuckets(child: Expression, n: Int, nBuckets: Long)
    extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")
  require(nBuckets >= 1, "nBuckets must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gram_buckets requires array<string>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    Hash60Kernel.gramBuckets(v.asInstanceOf[ArrayData], n, nBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60Kernel.gramBuckets($c, $n, ${nBuckets}L);")
  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

/** Max multiplicity of any word n-gram (kernel in
  * [[Hash60Kernel.maxShingleMultiplicity]]) — the per-row core of the
  * n-gram repetition quality filter. */
case class MaxShingleRun(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"max_shingle_run requires array<string>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    Hash60Kernel.maxShingleMultiplicity(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60Kernel.maxShingleMultiplicity($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): MaxShingleRun =
    copy(child = newChild)
}

/** MinHash signature straight from the token array (kernel in
  * [[MinHashKernel.computeFromTokens]]) — fuses shingling, hashing, and
  * the signature fold; value-identical to `MinHashSig(shingleArray(...))`. */
case class MinHashSigTokens(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(n >= 1 && numHashes >= 1, "shingle width and signature width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig_tokens requires array<string>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    MinHashKernel.computeFromTokens(v.asInstanceOf[ArrayData], n, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.computeFromTokens($c, $n, $numHashes);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigTokens =
    copy(child = newChild)
}

/** MinHash signature over a shingle array in one native loop (kernel in
  * [[MinHashKernel]]); replaces an interpreted nest of
  * `aggregate`/`zip_with` lambdas (~13 ms/doc → tight JVM loop). */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    MinHashKernel.compute(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.compute($c, $numHashes);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Column wrappers + SQL registration for the native expressions. */
object native {
  import org.apache.spark.sql.graftx.Bridge

  def rolling_hash(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))
  def hash60(c: Column): Column = Bridge.column(Hash60(Bridge.expression(c)))
  def float_dot(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))
  def fixed_dot(a: Column, b: Column): Column =
    Bridge.column(FixedDot(Bridge.expression(a), Bridge.expression(b)))
  def hyperplane_sig(vec: Column, planes: Int, dim: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(vec), planes, dim))
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), numHashes))
  def shingle_hash60(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHash60(Bridge.expression(tokens), n))
  def max_shingle_run(tokens: Column, n: Int): Column =
    Bridge.column(MaxShingleRun(Bridge.expression(tokens), n))
  def gram_buckets(tokens: Column, n: Int, nBuckets: Long): Column =
    Bridge.column(GramBuckets(Bridge.expression(tokens), n, nBuckets))
  def minhash_sig_tokens(tokens: Column, n: Int, numHashes: Int): Column =
    Bridge.column(MinHashSigTokens(Bridge.expression(tokens), n, numHashes))
  def dedup_lines_first(lines: Column): Column =
    Bridge.column(DedupLinesFirst(Bridge.expression(lines)))
  def char_class_counts(text: Column): Column =
    Bridge.column(CharClassCounts(Bridge.expression(text)))
  def lang_votes(tokens: Column): Column =
    Bridge.column(LangVotes(Bridge.expression(tokens)))
  def bloom_contains_any(hashes: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(BloomContainsAny(Bridge.expression(hashes), bloomBytes))
  def pq_codes(vec: Column, cbs: Seq[Seq[Seq[Double]]],
               cc: Seq[Seq[Long]]): Column =
    Bridge.column(PqCodes(Bridge.expression(vec),
      cbs.map(_.map(_.toArray).toArray).toArray,
      cc.map(_.toArray).toArray))
  def nearest_centroid(vec: Column, cents: Seq[Seq[Double]],
                       dyy: Seq[Long]): Column =
    Bridge.column(NearestCentroidK(Bridge.expression(vec),
      cents.map(_.toArray).toArray, dyy.toArray))
  def adc_score(codes: Column, lut: Column, qq: Column,
                cc: Array[Array[Long]]): Column =
    Bridge.column(AdcScore(Bridge.expression(codes), Bridge.expression(lut),
      Bridge.expression(qq), cc))
  def pq_lut(vec: Column, cbs: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqLut(Bridge.expression(vec),
      cbs.map(_.map(_.toArray).toArray).toArray))
  def top_lists(vec: Column, cents: Seq[Seq[Double]], cids: Seq[Long],
                dyy: Seq[Long], nprobe: Int): Column =
    Bridge.column(TopListsK(Bridge.expression(vec),
      cents.map(_.toArray).toArray, cids.toArray, dyy.toArray, nprobe))
  def bloom_might_contain(id: Column,
                          bloom: org.apache.spark.broadcast.Broadcast[
                            org.apache.spark.util.sketch.BloomFilter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(id), bloom))
  def bpe_encode(words: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(words),
      merges.map(p => Array(p._1, p._2)).toArray))
  def token_ids(tokens: Column, vocab: Seq[String],
                byteFallback: Boolean = false): Column =
    Bridge.column(TokenIds(Bridge.expression(tokens), vocab.toArray,
      byteFallback))
  def top_k_by_score(score: Column, id: Column, payload: Column,
                     k: Int): Column =
    Bridge.column(TopKByScore(Bridge.expression(score), Bridge.expression(id),
      Bridge.expression(payload), k).toAggregateExpression())
  def bottom_kth_key(key: Column, k: Int): Column =
    Bridge.column(BottomKthKey(Bridge.expression(key), k)
      .toAggregateExpression())
  def score_mass_threshold(score: Column, mass: Column, budget: Long,
                           cap: Int = 4096): Column =
    Bridge.column(ScoreMassThreshold(Bridge.expression(score),
      Bridge.expression(mass), budget, cap).toAggregateExpression())
  def score_mass_quantile_threshold(score: Column, mass: Column,
                                    keepPpm: Long, cap: Int = 4096): Column =
    Bridge.column(ScoreMassQuantileThreshold(Bridge.expression(score),
      Bridge.expression(mass), keepPpm, cap).toAggregateExpression())
  def bpe_chunk(words: Column, merges: Seq[(String, String)],
                budget: Long): Column =
    Bridge.column(BpeChunk(Bridge.expression(words),
      merges.map(p => Array(p._1, p._2)).toArray, budget))
  def cm_estimate(token: Column, depth: Int, width: Int,
                  counters: Array[Long]): Column =
    Bridge.column(CmEstimate(Bridge.expression(token), depth, width, counters))

  /** Register every native kernel for SQL use in this session, so the
    * SQL surface matches the Column surface. Width/shape parameters
    * (`n`, `numHashes`, `planes`, `dim`) must be integer literals — they
    * size per-JVM tables at plan time. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def intLit(e: Expression, fn: String, arg: String): Int = e match {
      case l if l.foldable => l.eval() match {
        case i: Int  => i
        case l2: Long =>
          // toInt alone would wrap silently: minhash_sig(s, 4294967297L)
          // must error, not become width 1
          if (l2 < Int.MinValue || l2 > Int.MaxValue)
            throw new IllegalArgumentException(
              s"$fn: $arg must fit in an Int, got $l2")
          l2.toInt
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(s"$fn: $arg must be a literal")
    }
    reg.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("hash60", es => Hash60(es.head), "built-in")
    reg.createOrReplaceTempFunction("float_dot", es => FloatDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("fixed_dot", es => FixedDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", es => {
      require(es.length == 2, "minhash_sig(shingles, numHashes)")
      MinHashSig(es(0), intLit(es(1), "minhash_sig", "numHashes"))
    }, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig_tokens", es => {
      require(es.length == 3, "minhash_sig_tokens(tokens, n, numHashes)")
      MinHashSigTokens(es(0), intLit(es(1), "minhash_sig_tokens", "n"),
        intLit(es(2), "minhash_sig_tokens", "numHashes"))
    }, "built-in")
    reg.createOrReplaceTempFunction("shingle_hash60", es => {
      require(es.length == 2, "shingle_hash60(tokens, n)")
      ShingleHash60(es(0), intLit(es(1), "shingle_hash60", "n"))
    }, "built-in")
    reg.createOrReplaceTempFunction("max_shingle_run", es => {
      require(es.length == 2, "max_shingle_run(tokens, n)")
      MaxShingleRun(es(0), intLit(es(1), "max_shingle_run", "n"))
    }, "built-in")
    reg.createOrReplaceTempFunction("gram_buckets", es => {
      require(es.length == 3, "gram_buckets(tokens, n, nBuckets)")
      GramBuckets(es(0), intLit(es(1), "gram_buckets", "n"),
        intLit(es(2), "gram_buckets", "nBuckets").toLong)
    }, "built-in")
    reg.createOrReplaceTempFunction("dedup_lines_first",
      es => DedupLinesFirst(es.head), "built-in")
    reg.createOrReplaceTempFunction("bloom_contains_any", es => {
      require(es.length == 2, "bloom_contains_any(hashes, bloomBytes)")
      val bytes = es(1) match {
        case l if l.foldable => l.eval() match {
          case b: Array[Byte] => b
          case other => throw new IllegalArgumentException(
            s"bloom_contains_any: bloomBytes must be a binary literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "bloom_contains_any: bloomBytes must be a literal")
      }
      BloomContainsAny(es(0), bytes)
    }, "built-in")
    reg.createOrReplaceTempFunction("hyperplane_sig", es => {
      require(es.length == 3, "hyperplane_sig(vec, planes, dim)")
      HyperplaneSig(es(0), intLit(es(1), "hyperplane_sig", "planes"),
        intLit(es(2), "hyperplane_sig", "dim"))
    }, "built-in")
  }
}
