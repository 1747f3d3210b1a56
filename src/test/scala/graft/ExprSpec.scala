package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.native
import graft.ops.Similarity

/** Native Catalyst expressions: interpreted vs codegen vs reference. */
class ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rolling_hash matches a Scala reference implementation") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val df = Seq("", "a", "hello world", "ünïcødé ♞").toDF("s")
    val got = df.select($"s", native.rolling_hash($"s")).collect()
    got.foreach(r => assert(r.getLong(1) == ref(r.getString(0))))
  }

  test("rolling_hash works from SQL after registration") {
    native.register(spark)
    val r = spark.sql("SELECT rolling_hash('abc')").collect()(0).getLong(0)
    assert(r == ("abc".getBytes.foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))))
  }

  test("float_dot equals the HOF dot kernel and survives codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
      .select($"vec_id", $"embedding")
    val both = df.select(
      native.float_dot($"embedding", $"embedding").as("fast"),
      Similarity.dot($"embedding", $"embedding").as("hof")).collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("MinHashSig native expression == HOF executable spec") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    val fast = graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val spec = graft.ops.Dedup.minhashSignaturesHof(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast.keySet == spec.keySet)
    fast.keys.foreach(k => assert(fast(k) == spec(k), s"doc $k"))
  }

  test("minhash_sig works from SQL after registration") {
    native.register(spark)
    val viaSql = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d', 'c d e'), 8) AS sig")
      .collect()(0).getSeq[Long](0)
    val viaCol = Seq(Seq("a b c", "b c d", "c d e")).toDF("sh")
      .select(native.minhash_sig($"sh", 8).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 8)
    // non-literal signature width is rejected at plan time
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('x'), cast(rand()*4 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("native expressions generate code (no CodegenFallback)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types._
    // CODEGEN_ONLY-style check: generating a projection over the
    // expression must succeed without the fallback path
    val exprs = Seq(
      graft.functions.MinHashSig(
        BoundReference(0, ArrayType(StringType), nullable = true), 16),
      graft.functions.RollingHash(
        BoundReference(1, StringType, nullable = true)),
      graft.functions.FloatDot(
        BoundReference(2, ArrayType(FloatType), nullable = true),
        BoundReference(2, ArrayType(FloatType), nullable = true)))
    exprs.foreach { e =>
      assert(!e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
      GenerateMutableProjection.generate(Seq(e), useSubexprElimination = false)
    }
  }

  test("float_dot yields null on length mismatch") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(df.select(native.float_dot($"a", $"b")).collect()(0).isNullAt(0))
  }
}
