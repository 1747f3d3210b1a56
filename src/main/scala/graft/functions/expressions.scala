package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }
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
  def float_dot(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), numHashes))

  /** Register `rolling_hash` / `float_dot` / `minhash_sig` for SQL use in
    * this session. `minhash_sig(shingles, n)` needs a literal signature
    * width — it sizes the per-JVM coefficient arrays at plan time. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("float_dot", es => FloatDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", es => {
      require(es.length == 2, "minhash_sig(shingles, numHashes)")
      val n = es(1) match {
        case e if e.foldable => e.eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_sig: numHashes must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "minhash_sig: numHashes must be a literal")
      }
      MinHashSig(es(0), n)
    }, "built-in")
  }
}
