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

  test("hash60 native == built-ins spec, incl. unicode and empty; SQL-registered") {
    val df = Seq("", "a", "the quick brown", "ünïcødé ♞", "zzz").toDF("s")
    val got = df.select(native.hash60($"s").as("n"),
      graft.ops.TextStats.hash60Spec($"s").as("spec")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    native.register(spark)
    val viaSql = spark.sql("SELECT hash60('abc')").collect()(0).getLong(0)
    val viaSpec = df.sparkSession.range(1)
      .select(graft.ops.TextStats.hash60Spec(lit("abc"))).collect()(0).getLong(0)
    assert(viaSql == viaSpec)
  }

  test("shingle_hash60 == distinct hash60 of shingleArray (set-equal); edge docs") {
    val df = Seq("the quick brown fox jumps over it", "one two", "solo", "")
      .toDF("text")
    val toks = graft.ops.TextStats.tokens($"text")
    val got = df.select(
      native.shingle_hash60(toks, 3).as("fused"),
      array_sort(array_distinct(transform(
        graft.ops.Dedup.shingleArray($"text", 3),
        s => graft.ops.TextStats.hash60Spec(s)))).as("spec")).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("shingle_hash60 skips null tokens exactly like concat_ws") {
    // internal callers tokenize first (never null), but the SQL-registered
    // surface accepts arbitrary array<string>: a null element must be
    // dropped (no bytes, no separator) exactly as concat_ws drops it
    val df = Seq(1).toDF("one").select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("toks"))
    val spec = array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size($"toks") - 2, lit(1))),
      i => graft.ops.TextStats.hash60Spec(concat_ws(" ", slice($"toks", i, lit(3)))))))
    val got = df.select(native.shingle_hash60($"toks", 3).as("fused"),
      spec.as("spec")).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("gram_buckets == composed explode/filter/pmod spec; edge docs, null tokens, SQL") {
    // order AND multiplicity must match (term frequencies, not sets)
    val docs = Seq(
      (1L, "the quick brown fox the quick brown fox"),
      (2L, "one two"), (3L, "solo"), (4L, ""), (5L, "   "),
      (6L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val fused = graft.ops.Importance.bucketed(docs, Some("id"), "text", 8192)
      .groupBy("id", "b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val spec = graft.ops.Importance.bucketedSpec(docs, Some("id"), "text", 8192)
      .groupBy("id", "b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fused == spec)
    assert(fused.exists(_._3 > 1))  // repeated bigram kept with multiplicity
    // null tokens dropped like concat_ws (SQL-surface input)
    native.register(spark)
    val viaSql = spark.sql(
      "SELECT gram_buckets(array('a', CAST(NULL AS STRING), 'b'), 2, 64) AS b")
      .collect()(0).getSeq[Long](0)
    val viaSpec = spark.range(1).select(
      transform(sequence(lit(1), lit(2)),
        i => pmod(graft.ops.TextStats.hash60Spec(
          concat_ws(" ", slice(typedLit(Seq[String]("a", null, "b")), i, lit(2)))),
          lit(64L))).as("b")).collect()(0).getSeq[Long](0)
    assert(viaSql == viaSpec)
  }

  test("SQL width literals reject longs outside Int range") {
    native.register(spark)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    val e = intercept[Throwable] {
      spark.sql("SELECT minhash_sig(array('a'), 4294967297)").collect()
    }
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("must fit in an Int"))),
      s"expected a width-overflow error, got: $e")
  }

  test("fixed_dot fails loudly when the fixed-point sum overflows a Long") {
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    // accumulation overflow across elements
    val df = Seq((Seq(3e2f, 3e2f), Seq(3e2f, 3e2f))).toDF("a", "b")
    val e = intercept[Throwable] { df.select(native.fixed_dot($"a", $"b")).collect() }
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in the cause chain, got: $e")
    // a SINGLE huge product must also throw — double→long conversion
    // would otherwise silently CLAMP to Long.MaxValue
    val one = Seq((Seq(1e3f), Seq(1e3f))).toDF("a", "b")
    val e2 = intercept[Throwable] { one.select(native.fixed_dot($"a", $"b")).collect() }
    assert(chain(e2).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException for a clamped single product, got: $e2")
  }

  test("minhash_sig skips null shingles like the HOF spec (SQL-surface inputs)") {
    // HOF spec: hash60(null) is null and least(m, null) keeps m — a null
    // shingle contributes nothing; the native kernel must not NPE
    val df = Seq(1).toDF("one").select(
      array(lit("a"), lit(null).cast("string"), lit("b")).as("sh"),
      array(lit("a"), lit("b")).as("shClean"))
    val got = df.select(native.minhash_sig($"sh", 8).as("withNull"),
      native.minhash_sig($"shClean", 8).as("clean")).collect()(0)
    assert(got.getSeq[Long](0) == got.getSeq[Long](1))
  }

  test("minhash_sig_tokens == minhash_sig over shingleArray") {
    val df = Seq("the quick brown fox jumps over the lazy dog", "tiny", "")
      .toDF("text")
    val got = df.select(
      native.minhash_sig_tokens(graft.ops.TextStats.tokens($"text"), 3, 16).as("fused"),
      native.minhash_sig(graft.ops.Dedup.shingleArray($"text", 3), 16).as("spec"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("bloom_contains_any == exists(might_contain) HOF; null element/array semantics") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    Seq(1L, 42L, 777L).foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    import org.apache.spark.sql.graftx.Bridge
    def mc(h: org.apache.spark.sql.Column) = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.expression(lit(bytes)), Bridge.expression(h)))
    val df = Seq(Seq(1L, 2L), Seq(5L, 6L), Seq(777L), Seq.empty[Long]).toDF("hs")
    val got = df.select(native.bloom_contains_any($"hs", bytes).as("k"),
      exists($"hs", h => mc(h)).as("spec")).collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    assert(got.map(_.getBoolean(0)).toSeq == Seq(true, false, true, false))
    // null ELEMENT skipped; null ARRAY -> null
    val withNull = spark.range(1).select(
      array(lit(null).cast("long"), lit(42L)).as("hs"))
    assert(withNull.select(native.bloom_contains_any($"hs", bytes))
      .collect()(0).getBoolean(0))
    assert(spark.range(1)
      .select(native.bloom_contains_any(lit(null).cast("array<long>"), bytes))
      .collect()(0).isNullAt(0))
    // PINNED spec divergence (documented on the kernel): null element +
    // NO match — the HOF's three-valued OR yields NULL, the kernel FALSE;
    // identical under the filter semantics of the one call site
    val nullNoMatch = spark.range(1).select(
      array(lit(null).cast("long"), lit(5L)).as("hs"))
    val d = nullNoMatch.select(native.bloom_contains_any($"hs", bytes).as("k"),
      exists($"hs", h => mc(h)).as("spec")).collect()(0)
    assert(!d.getBoolean(0) && d.isNullAt(1))
    // SQL-registered (binary literal argument)
    native.register(spark)
    val hex = bytes.map("%02X".format(_)).mkString
    assert(spark.sql(
      s"SELECT bloom_contains_any(array(42L), X'$hex')").collect()(0).getBoolean(0))
    // equality is by filter CONTENT, not array reference — two kernels
    // built from equal-but-distinct byte arrays must canonicalize as the
    // same expression (semanticEquals / common-subexpression elimination)
    def litChild = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(1L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    val ka = graft.functions.BloomContainsAny(litChild, bytes.clone())
    val kb = graft.functions.BloomContainsAny(litChild, bytes.clone())
    assert(ka == kb && ka.hashCode == kb.hashCode)
    assert(ka != graft.functions.BloomContainsAny(litChild, bytes.drop(1)))
  }

  test("cm_estimate == countMinEstimate term-for-term; null token, shape guard, content equality") {
    import graft.ops.Sketch
    val toks = Seq("a", "b", "a", "c", "a", "b", "a", "d", "e", "a")
      .toDF("t")
    val (depth, width) = (3, 8) // narrow on purpose: collisions exercised
    val sketch = Sketch.countMin(toks, "t", depth, width)
    val dense = new Array[Long](depth * width)
    sketch.table.collect().foreach { r =>
      dense(r.getLong(0).toInt * width + r.getLong(1).toInt) = r.getLong(2)
    }
    // parity with the join formulation over seen AND never-seen tokens
    val probes = Seq("a", "b", "c", "d", "e", "never-1", "never-2").toDF("t")
    val viaJoin = Sketch.countMinEstimate(sketch, probes, "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaKernel = probes
      .select($"t", native.cm_estimate($"t", depth, width, dense).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaJoin)
    // NULL token -> NULL (null-safe unary), not zero
    assert(probes.select(native.cm_estimate(lit(null).cast("string"),
      depth, width, dense)).collect()(0).isNullAt(0))
    // a counter table of the wrong shape is rejected at construction
    intercept[IllegalArgumentException] {
      native.cm_estimate(lit("x"), depth, width, new Array[Long](depth * width - 1))
    }
    // content-based equality: equal-but-distinct counter arrays
    // canonicalize as the same expression
    def litTok = org.apache.spark.sql.catalyst.expressions.Literal.create(
      "x", org.apache.spark.sql.types.StringType)
    val ea = graft.functions.CmEstimate(litTok, depth, width, dense.clone())
    val eb = graft.functions.CmEstimate(litTok, depth, width, dense.clone())
    assert(ea == eb && ea.hashCode == eb.hashCode)
    val other = dense.clone(); other(0) += 1
    assert(ea != graft.functions.CmEstimate(litTok, depth, width, other))
  }

  test("dedup_lines_first == HOF array_position spec; null elements, SQL registration") {
    // parity over the tricky line shapes: dups, empty lines, space-only
    // vs tab-only runs, trailing separators, whole-text edge cases
    val df = Seq(
      "a\nb\na\n\n  \n  \nb\nc\n",
      "\t\n\t",
      "x",
      "",
      " \n \n ",
      "a a\na  a\na a"
    ).toDF("text")
    val lines = split($"text", "\n", -1)
    val spec = element_at(transform(array(lines), ls =>
      filter(ls, (l, i) => trim(l) === "" ||
        array_position(ls, l) === (i + 1).cast("long"))), 1)
    val got = df.select(native.dedup_lines_first(lines).as("fused"), spec.as("spec"))
      .collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // null ELEMENTS (not producible via split, but the registered surface
    // accepts arbitrary array<string>): dropped, exactly like the spec's
    // NULL predicate
    val arr = spark.range(1).select(
      array(lit("a"), lit(null).cast("string"), lit("a"), lit(" ")).as("ls"))
    assert(arr.select(native.dedup_lines_first($"ls")).collect()(0)
      .getSeq[String](0) == Seq("a", " "))
    // NULL array -> NULL
    assert(spark.range(1)
      .select(native.dedup_lines_first(lit(null).cast("array<string>")))
      .collect()(0).isNullAt(0))
    native.register(spark)
    assert(spark.sql("SELECT dedup_lines_first(array('a','a','b'))")
      .collect()(0).getSeq[String](0) == Seq("a", "b"))
  }

  test("fixed_dot == HOF round/sum spec on real embeddings and signed values") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val q = emb.filter($"vec_id" === 0).select("embedding").collect()(0).getSeq[Float](0)
    val got = emb.select(
      native.fixed_dot($"embedding", typedLit(q)).as("n"),
      Similarity.dotFixedSpec($"embedding", typedLit(q)).as("spec")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val signed = Seq((Seq(-0.75f, 0.5f, -0.001f), Seq(0.3f, -0.9f, 0.0001f)))
      .toDF("a", "b")
    val s = signed.select(native.fixed_dot($"a", $"b").as("n"),
      Similarity.dotFixedSpec($"a", $"b").as("spec")).collect()(0)
    assert(s.getLong(0) == s.getLong(1))
    // length mismatch -> null, like float_dot — including over NON-NULLABLE
    // literal inputs (requires the nullable override, else null -> 0)
    val mm = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    assert(mm.select(native.fixed_dot($"a", $"b")).collect()(0).isNullAt(0))
    val lits = spark.range(1)
      .select(native.fixed_dot(typedLit(Seq(1.0f, 2.0f)), typedLit(Seq(1.0f))).as("d"))
    assert(lits.schema("d").nullable && lits.collect()(0).isNullAt(0))
    // a null ELEMENT nulls the product chain in the spec — kernel matches
    val ne = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 1.0f)))
      .toDF("a", "b")
    val neR = ne.select(native.fixed_dot($"a", $"b").as("n"),
      Similarity.dotFixedSpec($"a", $"b").as("spec")).collect()(0)
    assert(neR.isNullAt(0) && neR.isNullAt(1))
    // mixed float-row x double-codebook (the trained-kmeans shape): the
    // kernel reads doubles as-is and must equal the all-double HOF spec
    val dq: Seq[Double] = Seq(0.25, -0.5000000000000001, 0.1)
    val mixed = Seq(Tuple1(Seq(0.3f, -0.9f, 0.0001f))).toDF("a")
    val mr = mixed.select(native.fixed_dot($"a", typedLit(dq)).as("n"),
      Similarity.dotFixedSpec($"a", typedLit(dq)).as("spec")).collect()(0)
    assert(mr.getLong(0) == mr.getLong(1))
  }

  test("max_shingle_run == multiplicity of the most frequent 3-gram string") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    def toks = graft.ops.TextStats.tokens($"text")
    val grams = explode(transform(sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3))))).as("g")
    val spec = docs.select($"doc_id", grams)
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").as("spec"))
    docs.select($"doc_id", native.max_shingle_run(toks, 3).as("n"))
      .join(spec, "doc_id").collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}"))
    // planted heavy repetition: "x y z" appears at positions 0,3,6,9
    val rep = Seq(Tuple1("x y z x y z x y z x y z")).toDF("text")
    assert(rep.select(native.max_shingle_run(
      graft.ops.TextStats.tokens($"text"), 3)).collect()(0).getLong(0) == 4L)
  }

  test("fixed_dot fast-path rounding == spec on a seeded sweep + boundary products") {
    // 20k seeded random element pairs plus constructed near-half-integer
    // products, one pair per row so a rounding disagreement is
    // attributable to its exact product
    val rnd = new scala.util.Random(42)
    val rand = (1 to 20000).map(_ =>
      (Seq(rnd.nextFloat() * 2 - 1), Seq(rnd.nextFloat() * 2 - 1)))
    // products landing exactly on / near .5 fixed-point boundaries
    val boundary = Seq(
      (Seq(0.5f), Seq(1.0e-15f)), (Seq(1.5f), Seq(1.0e-15f)),
      (Seq(-0.5f), Seq(1.0e-15f)), (Seq(-2.5f), Seq(1.0e-15f)),
      (Seq(0.4999999f), Seq(1.0e-15f)), (Seq(0.5000001f), Seq(1.0e-15f)),
      (Seq(0.75f), Seq(0.75f)), (Seq(0.1f), Seq(0.1f)))
    val got = (rand ++ boundary).toDF("a", "b")
      .select(native.fixed_dot($"a", $"b").as("n"),
        Similarity.dotFixedSpec($"a", $"b").as("spec")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("hyperplane_sig == HOF spec on real embeddings; dim mismatch -> bucket 0") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val got = emb.select(
      native.hyperplane_sig($"embedding", 8, 64).as("n"),
      Similarity.hyperplaneSignatureSpec($"embedding", 8, 64).as("spec")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val short = Seq(Seq(1.0f, -2.0f)).toDF("v")
    val s = short.select(native.hyperplane_sig($"v", 8, 64).as("n"),
      Similarity.hyperplaneSignatureSpec($"v", 8, 64).as("spec")).collect()(0)
    assert(s.getLong(0) == 0L && s.getLong(0) == s.getLong(1))
    // NULL vector and null element both -> bucket 0 in the spec (null
    // projections fall through when().otherwise(0)) — kernel matches
    val nulls = Seq(null, Seq[java.lang.Float](1.0f, null) ++ Seq.fill(62)(
      java.lang.Float.valueOf(0.5f))).toDF("v")
    val nr = nulls.select(native.hyperplane_sig($"v", 8, 64).as("n"),
      Similarity.hyperplaneSignatureSpec($"v", 8, 64).as("spec")).collect()
    nr.foreach(r => assert(!r.isNullAt(0) && r.getLong(0) == 0L
      && r.getLong(0) == r.getLong(1)))
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

  test("every native kernel is callable from SQL and matches its Column form") {
    native.register(spark)
    val row = spark.sql(
      """SELECT shingle_hash60(array('a','b','c','d'), 3) AS sh,
        |       max_shingle_run(array('x','y','x','y','x'), 2) AS mr,
        |       fixed_dot(array(0.5f, -0.25f), array(0.5f, 0.5f)) AS fd,
        |       hyperplane_sig(array(0.1f, -0.2f, 0.3f, 0.4f), 8, 4) AS hp,
        |       minhash_sig_tokens(array('a','b','c','d'), 3, 8) AS mst
        |""".stripMargin).collect()(0)
    val colRow = spark.range(1).select(
      native.shingle_hash60(typedLit(Seq("a", "b", "c", "d")), 3).as("sh"),
      native.max_shingle_run(typedLit(Seq("x", "y", "x", "y", "x")), 2).as("mr"),
      native.fixed_dot(typedLit(Seq(0.5f, -0.25f)), typedLit(Seq(0.5f, 0.5f))).as("fd"),
      native.hyperplane_sig(typedLit(Seq(0.1f, -0.2f, 0.3f, 0.4f)), 8, 4).as("hp"),
      native.minhash_sig_tokens(typedLit(Seq("a", "b", "c", "d")), 3, 8).as("mst"))
      .collect()(0)
    assert(row.getSeq[Long](0) == colRow.getSeq[Long](0))
    assert(row.getLong(1) == colRow.getLong(1) && row.getLong(1) == 2L)
    assert(row.getLong(2) == colRow.getLong(2))
    assert(row.getLong(3) == colRow.getLong(3))
    assert(row.getSeq[Long](4) == colRow.getSeq[Long](4))
  }

  test("adc_score == composed element_at chain; null/short/corrupt codes") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(41)
    val m = 8; val ksub = 16
    val cc = Array.fill(m)(Array.fill(ksub)(rnd.nextLong().abs % 1000000L + 1L))
    val lut = Seq.fill(m)(Seq.fill(ksub)(rnd.nextLong() % 1000000L))
    val qq = 123456789L
    // the pre-kernel composed-Column formulation, verbatim
    def composed(codesCol: Column): Column = {
      def at(tab: Seq[Long], s: Int): Column = element_at(typedLit(tab),
        element_at(codesCol, s + 1).cast(IntegerType) + 1)
      val dotSum = (0 until m).map(s => at(lut(s), s)).reduce(_ + _)
      val nnSum = (0 until m).map(s => at(cc(s).toSeq, s)).reduce(_ + _)
      dotSum.cast(DoubleType) /
        (sqrt(lit(qq).cast(DoubleType)) * sqrt(nnSum.cast(DoubleType)))
    }
    val codes = Seq.fill(200)(Array.fill(m)(rnd.nextInt(ksub).toShort))
    val df = codes.map(c => Tuple1(c)).toDF("codes")
    val both = df.select(
      native.adc_score($"codes", typedLit(lut), lit(qq), cc).as("k"),
      composed($"codes").as("c")).collect()
    both.foreach { r =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // column-lut form == literal-lut form for the same query
    val withLut = df.withColumn("lut", typedLit(lut)).withColumn("qq", lit(qq))
    val colForm = withLut.select(
      native.adc_score($"codes", $"lut", $"qq", cc).as("k"),
      composed($"codes").as("c")).collect()
    colForm.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // null propagation: null codes row, SHORT codes row, out-of-range
    // code (the composed form errors on element_at index 0; the kernel
    // nulls — the documented divergence, a corrupt row must not rank)
    val edge = Seq(
      (null: Array[Short]),
      Array.fill(m - 1)(0.toShort),
      Array.fill(m)(ksub.toShort),     // one past the table end
      Array.fill(m)((-1).toShort)      // corrupt negative byte
    ).map(Tuple1(_)).toDF("codes")
    val er = edge.select(
      native.adc_score($"codes", typedLit(lut), lit(qq), cc)).collect()
    er.foreach(r => assert(r.isNullAt(0)))
  }

  test("pq_codes / nearest_centroid == composed struct-max argmax; malformed vecs -> 0") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(43)
    val dim = 8; val m = 4; val dsub = dim / m; val ksub = 5; val k = 7
    def rvec(d: Int) = Seq.fill(d)((rnd.nextDouble() * 2 - 1))
    val cbs: Seq[Seq[Seq[Double]]] = Seq.fill(m)(Seq.fill(ksub)(rvec(dsub)))
    val cents: Seq[Seq[Double]] = Seq.fill(k)(rvec(dim))
    // engine-evaluated norm tables, the production discipline
    val ccRow = spark.range(1).select((for {
      (cb, s) <- cbs.zipWithIndex; (c, j) <- cb.zipWithIndex
    } yield Similarity.dotFixed(typedLit(c), typedLit(c)).as(s"cc_${s}_$j")): _*)
      .collect()(0)
    val cc = cbs.zipWithIndex.map { case (cb, s) =>
      cb.indices.map(j => ccRow.getAs[Long](s"cc_${s}_$j")) }
    val dyyRow = spark.range(1).select(cents.zipWithIndex.map { case (c, j) =>
      Similarity.dotFixed(typedLit(c), typedLit(c)).as(s"dyy_$j") }: _*).collect()(0)
    val dyy = cents.indices.map(j => dyyRow.getAs[Long](s"dyy_$j"))
    // the pre-kernel composed formulations, verbatim
    def composedCode(vec: Column, s: Int): Column = {
      val keys = cbs(s).zipWithIndex.map { case (c, j) =>
        struct((lit(2L) * Similarity.dotFixed(
            slice(vec, s * dsub + 1, dsub), typedLit(c)) -
          lit(cc(s)(j))).as("s"), lit(-j.toLong).as("n"))
      }
      -array_max(array(keys: _*)).getField("n")
    }
    def composedNearest(vec: Column): Column = {
      val affs = cents.zipWithIndex.map { case (c, j) =>
        struct((Similarity.dotFixed(vec, typedLit(c)).cast(DoubleType) /
          sqrt(lit(dyy(j)).cast(DoubleType))).as("s"), lit(-j.toLong).as("n"))
      }
      -array_max(array(affs: _*)).getField("n")
    }
    val vecs = Seq.fill(100)(Array.fill(dim)(rnd.nextFloat() * 2 - 1)) ++
      Seq(null, Array.empty[Float], Array.fill(dim - 1)(0.5f),
        Array.fill(dim + 3)(0.25f)) // malformed: null, empty, short, long
    val df = vecs.map(Tuple1(_)).toDF("v")
    val rows = df.select(
      native.pq_codes($"v", cbs, cc).as("kc"),
      array((0 until m).map(s => composedCode($"v", s).cast(ShortType)): _*).as("cc"),
      native.nearest_centroid($"v", cents, dyy).as("kn"),
      composedNearest($"v").as("cn")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Short](0) == r.getSeq[Short](1),
        s"pq_codes mismatch: ${r.getSeq[Short](0)} vs ${r.getSeq[Short](1)}")
      assert(r.getLong(2) == r.getLong(3),
        s"nearest_centroid mismatch: ${r.getLong(2)} vs ${r.getLong(3)}")
    }
    // the malformed tail must exercise the null-key path, not crash:
    // nearest_centroid's whole-vector dot nulls on ANY dim mismatch
    // (all four land on 0); pq_codes' slices null per-subspace (null
    // and empty vecs are all-zero; the short vec zeroes only its
    // truncated last subspace, the long one encodes normally — the
    // slice semantics, already pinned by the parity loop above)
    val tail = rows.takeRight(4)
    tail.foreach(r => assert(r.getLong(2) == 0L))
    tail.take(2).foreach(r => assert(r.getSeq[Short](0).forall(_ == 0.toShort)))
  }

  test("pq_lut / top_lists / fixedDotDriver == composed forms; ties and malformed vecs") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(47)
    val dim = 8; val m = 4; val dsub = dim / m; val ksub = 5
    def rvec(d: Int) = Seq.fill(d)((rnd.nextDouble() * 2 - 1))
    val cbs: Seq[Seq[Seq[Double]]] = Seq.fill(m)(Seq.fill(ksub)(rvec(dsub)))
    // duplicate centroid values at two cids to force an exact affinity
    // tie — the composed struct sort resolves it by the smaller cid
    val base = Seq.fill(5)(rvec(dim))
    val cents: Seq[Seq[Double]] = base :+ base(2)
    val cids: Seq[Long] = Seq(10L, 3L, 7L, 42L, 5L, 8L) // arbitrary, non-sorted
    // fixedDotDriver must equal the engine's own projection evaluation
    val dyyRow = spark.range(1).select(cents.zipWithIndex.map { case (c, j) =>
      Similarity.dotFixed(typedLit(c), typedLit(c)).as(s"dyy_$j") }: _*).collect()(0)
    val dyy = cents.indices.map { j =>
      val driver = graft.functions.CodebookKernels.fixedDotDriver(cents(j), cents(j))
      assert(driver == dyyRow.getAs[Long](s"dyy_$j"),
        s"fixedDotDriver != engine projection for centroid $j")
      driver
    }
    val nprobe = 4
    // the pre-kernel composed formulations, verbatim
    def composedLut(vec: Column): Column = array(cbs.zipWithIndex.map {
      case (cb, s) => array(cb.map(c => Similarity.dotFixed(
        slice(vec, s * dsub + 1, dsub), typedLit(c))): _*) }: _*)
    def composedProbes(vec: Column): Column = transform(
      slice(array_sort(array(cents.zipWithIndex.map { case (c, j) =>
        struct((-(Similarity.dotFixed(vec, typedLit(c)).cast(DoubleType) /
          sqrt(lit(dyy(j)).cast(DoubleType)))).as("ns"), lit(cids(j)).as("cid"))
      }: _*)), 1, nprobe),
      s => s.getField("cid"))
    val vecs = Seq.fill(100)(Array.fill(dim)(rnd.nextFloat() * 2 - 1)) ++
      Seq(null, Array.empty[Float], Array.fill(dim - 1)(0.5f),
        Array.fill(dim + 3)(0.25f)) // malformed: null, empty, short, long
    val df = vecs.map(Tuple1(_)).toDF("v")
    val rows = df.select(
      native.pq_lut($"v", cbs).as("kl"),
      composedLut($"v").as("cl"),
      native.top_lists($"v", cents, cids, dyy, nprobe).as("kp"),
      composedProbes($"v").as("cp")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Seq[java.lang.Long]](0) == r.getSeq[Seq[java.lang.Long]](1),
        s"pq_lut mismatch: ${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3),
        s"top_lists mismatch: ${r.getSeq[Long](2)} vs ${r.getSeq[Long](3)}")
    }
    // the duplicated centroid pair (cids 7 and 8, identical values) must
    // appear in ascending-cid order whenever both are probed — the
    // composed sort's tie rule, held by construction above; and the
    // malformed tail (whole-vector dots all null) must probe the
    // nprobe SMALLEST cids in ascending order (null keys sort first)
    rows.takeRight(4).foreach { r =>
      assert(r.getSeq[Long](2) == Seq(3L, 5L, 7L, 8L),
        s"null-key probe order: ${r.getSeq[Long](2)}")
    }
  }

  test("bloom_might_contain == BloomFilter.mightContainLong; null id drops in filter") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (1L to 500L).foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)
    val ids = ((1L to 600L).map(java.lang.Long.valueOf) :+
      (null: java.lang.Long)).toDF("id")
    val kept = ids.filter(native.bloom_might_contain(col("id"), bc))
      .collect().map(_.getLong(0)).toSet
    // no false negatives; the null row drops in the three-valued filter
    // (kept is built via getLong, which would throw on a surviving null)
    assert((1L to 500L).forall(kept.contains))
    val expected = (1L to 600L).filter(bf.mightContainLong).toSet
    assert(kept == expected)
    bc.destroy()
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
      graft.functions.Hash60(
        BoundReference(1, StringType, nullable = true)),
      graft.functions.ShingleHash60(
        BoundReference(0, ArrayType(StringType), nullable = true), 3),
      graft.functions.MaxShingleRun(
        BoundReference(0, ArrayType(StringType), nullable = true), 3),
      graft.functions.MinHashSigTokens(
        BoundReference(0, ArrayType(StringType), nullable = true), 3, 16),
      graft.functions.FloatDot(
        BoundReference(2, ArrayType(FloatType), nullable = true),
        BoundReference(2, ArrayType(FloatType), nullable = true)),
      graft.functions.FixedDot(
        BoundReference(2, ArrayType(FloatType), nullable = true),
        BoundReference(2, ArrayType(FloatType), nullable = true)),
      graft.functions.HyperplaneSig(
        BoundReference(2, ArrayType(FloatType), nullable = true), 8, 64),
      graft.functions.GramBuckets(
        BoundReference(0, ArrayType(StringType), nullable = true), 2, 8192L),
      graft.functions.AdcScore(
        BoundReference(3, ArrayType(ShortType), nullable = true),
        BoundReference(4, ArrayType(ArrayType(LongType)), nullable = true),
        BoundReference(5, LongType, nullable = true),
        Array(Array(1L, 2L), Array(3L, 4L))),
      graft.functions.BloomMightContain(
        BoundReference(5, LongType, nullable = true),
        spark.sparkContext.broadcast(
          org.apache.spark.util.sketch.BloomFilter.create(100, 0.01))),
      graft.functions.PqCodes(
        BoundReference(2, ArrayType(FloatType), nullable = true),
        Array(Array(Array(1.0, 2.0), Array(3.0, 4.0))), Array(Array(5L, 25L))),
      graft.functions.NearestCentroidK(
        BoundReference(2, ArrayType(FloatType), nullable = true),
        Array(Array(1.0, 2.0), Array(3.0, 4.0)), Array(5L, 25L)),
      graft.functions.BpeEncode(
        BoundReference(0, ArrayType(StringType), nullable = true),
        Array(Array("a", "b"), Array("ab", "c"))))
    exprs.foreach { e =>
      assert(!e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
      GenerateMutableProjection.generate(Seq(e), useSubexprElimination = false)
    }
  }

  test("float_dot yields null on length mismatch") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(df.select(native.float_dot($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("top_k_by_score == rank-filtered window: ties, NaN, -0.0, small groups, shuffled merge") {
    // deterministic pseudo-random rows: duplicate scores (id tie-break),
    // NaN (Spark's double order puts it FIRST under desc), +/-0.0,
    // groups with fewer rows than k, and enough rows across 16 input
    // partitions that partial buffers serialize through the shuffle
    val rows = (0 until 4000).map { i =>
      val g = i % 17
      val score =
        if (i % 97 == 0) Double.NaN
        else if (i % 13 == 0) 0.5                  // heavy score ties
        else if (i % 31 == 0) (if (i % 2 == 0) 0.0 else -0.0)
        else ((i * 2654435761L) % 1000L).toDouble / 100.0
      (g.toLong, score, i.toLong, (i % 7).toLong)
    }
    val df = spark.createDataFrame(rows).repartition(16)
      .toDF("g", "score", "id", "pay")
    val k = 5
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("_rn", row_number().over(w))
      .filter($"_rn" <= k)
      .select($"g", $"id", $"score", $"pay", $"_rn".cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(4)) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val viaAgg = df.groupBy($"g")
      .agg(native.top_k_by_score($"score", $"id", $"pay", k).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", ($"pos" + 1).cast("long").as("rank"),
        $"col.id", $"col.score", $"col.payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (key, (id, s, p)) =>
      val (wid, ws, wp) = viaWindow(key)
      assert(id == wid && p == wp &&
        java.lang.Double.compare(s, ws) == 0, s"at $key")
    }
    // a group smaller than k returns all of it, ranked
    val tiny = Seq((1L, 2.0, 10L, 0L), (1L, 3.0, 11L, 0L))
      .toDF("g", "score", "id", "pay")
    val t = tiny.groupBy($"g")
      .agg(native.top_k_by_score($"score", $"id", $"pay", 5).as("tk"))
      .select(explode($"tk")).select($"col.id").as[Long].collect()
    assert(t.toSeq == Seq(11L, 10L))
    // NULL scores / ids are dropped, not ranked
    val withNull = Seq((1L, Some(1.0), 1L), (1L, None, 2L))
      .toDF("g", "score", "id")
    val n = withNull.groupBy($"g")
      .agg(native.top_k_by_score($"score", $"id", lit(0L), 3).as("tk"))
      .select(explode($"tk")).select($"col.id").as[Long].collect()
    assert(n.toSeq == Seq(1L))
  }

  test("bottom_kth_key == sorted k-th smallest: extremes, ties, small groups, null groups, shuffled merge") {
    // 60-bit-hash-shaped keys plus Long extremes and duplicates, across
    // 16 input partitions so partial heaps serialize through the shuffle
    val rows = (0 until 4000).map { i =>
      val g = i % 17
      val key =
        if (i % 101 == 0) Long.MinValue
        else if (i % 103 == 0) Long.MaxValue
        else if (i % 13 == 0) 424242L            // heavy key ties
        else (i * 2654435761L) ^ (i.toLong << 31)
      (g.toLong, key)
    }
    val df = spark.createDataFrame(rows).repartition(16).toDF("g", "key")
    for (k <- Seq(1, 5, 64)) {
      val expect = rows.groupBy(_._1).map { case (g, gs) =>
        val sorted = gs.map(_._2).sorted
        g -> sorted(math.min(k, sorted.length) - 1)
      }
      val got = df.groupBy($"g")
        .agg(native.bottom_kth_key($"key", k).as("thr"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"k=$k")
    }
    // fewer rows than k: the group max; all-null keys: NULL
    val edge = Seq((1L, Some(7L)), (1L, Some(3L)), (2L, None))
      .toDF("g", "key")
      .groupBy($"g").agg(native.bottom_kth_key($"key", 5).as("thr"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(edge == Map(1L -> Some(7L), 2L -> None))
  }

  test("score_mass_threshold: conservative cut — never shaves the exact budget prefix") {
    // heavy score ties, zero-mass rows, 16 input partitions (partial
    // sketches serialize and merge through the shuffle) and a tiny
    // cap=16 so compaction fires constantly — the hardest setting for
    // the conservative-direction invariant (MassSketch doc): the
    // threshold may only land AT or BELOW the exact prefix's minimum
    // kept score, and the mass above it must strictly exceed the budget
    val rows = (0 until 6000).map { i =>
      val g = i % 7
      val score =
        if (i % 13 == 0) 0.5 // heavy ties
        else ((i * 2654435761L) % 997L).toDouble / 10.0
      (g.toLong, score, i.toLong, (i % 21).toLong) // masses 0..20
    }
    val df = spark.createDataFrame(rows).repartition(16)
      .toDF("g", "score", "id", "mass")
    for (budget <- Seq(50L, 500L, 4000L, 9999999L)) {
      val thr = df.groupBy($"g")
        .agg(native.score_mass_threshold($"score", $"mass", budget, cap = 16)
          .as("t"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      rows.groupBy(_._1).foreach { case (g, gs) =>
        val total = gs.map(_._4).sum
        if (total <= budget)
          assert(thr(g).isEmpty, s"g=$g budget=$budget: expected NULL")
        else {
          val t = thr(g).getOrElse(
            sys.error(s"g=$g budget=$budget: expected a threshold"))
          val massAtT = gs.filter(r =>
            java.lang.Double.compare(r._2, t) >= 0).map(_._4).sum
          assert(massAtT > budget,
            s"g=$g budget=$budget t=$t: cut leaves only $massAtT mass")
          val ordered = gs.sortBy(r => (-r._2, r._3))
          var cum = 0L
          val kept = ordered.takeWhile { r => cum += r._4; cum <= budget }
          if (kept.nonEmpty)
            assert(java.lang.Double.compare(t, kept.map(_._2).min) <= 0,
              s"g=$g budget=$budget: t=$t cuts into the prefix " +
                s"(min kept score ${kept.map(_._2).min})")
        }
      }
    }
  }

  test("score_mass_quantile_threshold: conservative under compaction, budget from exact total") {
    // same adversarial setting as the constant-budget pin (ties,
    // zero masses, 16 partitions, cap=16 compaction churn) but the
    // budget derives from each group's OWN total — the invariant adds
    // that the eval-time total must be exact despite compaction
    val rows = (0 until 6000).map { i =>
      val g = i % 7
      val score =
        if (i % 13 == 0) 0.5
        else ((i * 2654435761L) % 997L).toDouble / 10.0
      (g.toLong, score, i.toLong, (i % 21).toLong)
    }
    val df = spark.createDataFrame(rows).repartition(16)
      .toDF("g", "score", "id", "mass")
    for (ppm <- Seq(0L, 1000L, 250000L, 999999L, 1000000L)) {
      val thr = df.groupBy($"g")
        .agg(native.score_mass_quantile_threshold($"score", $"mass", ppm,
          cap = 16).as("t"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      rows.groupBy(_._1).foreach { case (g, gs) =>
        val total = gs.map(_._4).sum
        val budget = BigInt(total) * ppm / 1000000
        if (total <= budget)
          assert(thr(g).isEmpty, s"g=$g ppm=$ppm: expected NULL")
        else {
          val t = thr(g).getOrElse(
            sys.error(s"g=$g ppm=$ppm: expected a threshold"))
          val massAtT = gs.filter(r =>
            java.lang.Double.compare(r._2, t) >= 0).map(_._4).sum
          assert(BigInt(massAtT) > budget,
            s"g=$g ppm=$ppm t=$t: cut leaves only $massAtT mass")
          val ordered = gs.sortBy(r => (-r._2, r._3))
          var cum = 0L
          val kept = ordered.takeWhile { r =>
            cum += r._4; BigInt(cum) <= budget }
          if (kept.nonEmpty)
            assert(java.lang.Double.compare(t, kept.map(_._2).min) <= 0,
              s"g=$g ppm=$ppm: t=$t cuts into the prefix " +
                s"(min kept score ${kept.map(_._2).min})")
        }
      }
    }
  }
}
