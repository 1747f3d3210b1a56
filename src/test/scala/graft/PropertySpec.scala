package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaUtil
import graft.store.{HDFStore, StoreMode}

/** Property-style tests (absent in the reference, SURVEY §5): positional-
  * read algebra against the in-memory golden value over seeded random
  * parameter sweeps, and schema-utility laws. */
class PropertySpec extends AnyFunSuite {
  import Fixture._
  private lazy val spark = TestSpark.spark
  private val rnd = new scala.util.Random(42)

  // one shared store: reads are pure, so properties can share it
  private lazy val table = {
    import spark.implicits._
    val st = HDFStore.open(spark, TestSpark.tmpDir("prop"), StoreMode.Overwrite)
    st.put("p", particles)
    // second segment exercises the multi-segment read path
    val t = st.typed[Particle]("p")
    t.append(particles.map(p => p.copy(lati = p.lati + 100)))
    t
  }
  private lazy val golden: Seq[Particle] =
    particles ++ particles.map(p => p.copy(lati = p.lati + 100))

  test("∀ valid (a,b): slice(a,b) == golden.slice(a,b+1)") {
    val n = golden.size
    (1 to 60).foreach { _ =>
      val x = rnd.nextInt(n); val y = rnd.nextInt(n)
      val (a, b) = (math.min(x, y), math.max(x, y))
      assert(table(a.toLong, b.toLong) == golden.slice(a, b + 1), s"slice [$a,$b]")
    }
  }

  test("∀ valid i: point(i) == golden(i); fromEnd mirrors") {
    val n = golden.size
    (0 until n).foreach { i =>
      assert(table(i.toLong) == golden(i), s"point $i")
    }
    (1 to n).foreach { i =>
      assert(table.fromEnd(i.toLong) == golden(n - i), s"fromEnd $i")
    }
  }

  test("∀ hyperslab params: matches the index formula") {
    val n = golden.size
    (1 to 40).foreach { _ =>
      val off = rnd.nextInt(n - 1)
      val stride = 1 + rnd.nextInt(8)
      val block = 1 + rnd.nextInt(stride)
      val maxCount = math.max(1, (n - off - block) / stride + 1)
      val count = 1 + rnd.nextInt(maxCount)
      val last = off + (count - 1) * stride + block - 1
      if (last < n) {
        val got = table.table.hyperslab(off, count, stride, block)
          .select("_rowid").collect().map(_.getLong(0)).sorted.toSeq
        val expect = (0 until count).flatMap(k =>
          (0 until block).map(b => (off + k * stride + b).toLong))
        assert(got == expect, s"hyperslab($off,$count,$stride,$block)")
      }
    }
  }

  test("∀ slab params: writeHyperslab then hyperslab reads back the values") {
    val st = HDFStore.open(spark, TestSpark.tmpDir("prop-w"), StoreMode.Overwrite)
    var marker = 1000.0
    // 1-D sweep (150 cases): selection row-major order is monotone in the
    // linear index (block <= stride), so the ordered read-back must equal
    // the written sequence exactly — regardless of earlier writes.
    val n1 = 60L
    val a1 = graft.ndarray.NDArray.create(st, "w1",
      spark.range(n1).selectExpr("id as i0", "cast(id as double) as value"), Seq(n1), Seq(n1))
    (1 to 150).foreach { _ =>
      val off = rnd.nextInt(20).toLong
      val stride = (1 + rnd.nextInt(6)).toLong
      val block = (1 + rnd.nextInt(stride.toInt)).toLong
      val maxCount = ((n1 - off - block) / stride + 1).toInt
      val count = (1 + rnd.nextInt(maxCount)).toLong
      val vals = (0 until (count * block).toInt).map(p => marker + p)
      a1.writeHyperslab(Seq(off), Seq(count), Seq(stride), Seq(block), vals)
      val got = a1.hyperslab(Seq(off), Seq(count), Seq(stride), Seq(block))
        .collect().map(_.getDouble(1)).toSeq
      assert(got == vals, s"1-D slab($off,$count,$stride,$block)")
      marker += 10000
    }
    // 2-D sweep (60 cases): mixed-radix pos -> (i0, i1) decomposition
    val (n0, m0) = (6L, 8L)
    val a2 = graft.ndarray.NDArray.create(st, "w2",
      spark.range(n0 * m0).selectExpr(s"id div $m0 as i0", s"id % $m0 as i1", "cast(id as double) as value"),
      Seq(n0, m0), Seq(n0, m0))
    (1 to 60).foreach { _ =>
      def dim(n: Long): (Long, Long, Long, Long) = {
        val off = rnd.nextInt((n / 2).toInt).toLong
        val stride = (1 + rnd.nextInt(3)).toLong
        val block = (1 + rnd.nextInt(stride.toInt)).toLong
        val maxCount = ((n - off - block) / stride + 1).toInt
        (off, (1 + rnd.nextInt(maxCount)).toLong, stride, block)
      }
      val (o0, c0, s0, b0) = dim(n0); val (o1, c1, s1, b1) = dim(m0)
      val vals = (0 until (c0 * b0 * c1 * b1).toInt).map(p => marker + p)
      a2.writeHyperslab(Seq(o0, o1), Seq(c0, c1), Seq(s0, s1), Seq(b0, b1), vals)
      val got = a2.hyperslab(Seq(o0, o1), Seq(c0, c1), Seq(s0, s1), Seq(b0, b1))
        .collect().map(_.getDouble(2)).toSeq
      assert(got == vals, s"2-D slab(($o0,$o1),($c0,$c1),($s0,$s1),($b0,$b1))")
      marker += 10000
    }
    st.close()
  }

  test("∀ schemas: flatten idempotent, nested naming, compat laws") {
    import org.apache.spark.sql.types._
    val types = Seq[DataType](LongType, DoubleType, StringType, IntegerType)
    def randSchema(): StructType = {
      val k = 1 + rnd.nextInt(6)
      StructType((0 until k).map(i => StructField(s"f$i", types(rnd.nextInt(types.size)))))
    }
    (1 to 100).foreach { _ =>
      val a = randSchema(); val b = randSchema()
      assert(SchemaUtil.flatten(SchemaUtil.flatten(a)) == SchemaUtil.flatten(a))
      SchemaUtil.checkCompatibility(a, a) // reflexive: must not throw
      val nested = StructType(Seq(StructField("outer", a), StructField("tail", LongType)))
      assert(SchemaUtil.flatten(nested).fieldNames.toSeq ==
        a.fieldNames.map("outer-" + _).toSeq :+ "tail")
      if (SchemaUtil.flatten(a) != SchemaUtil.flatten(b))
        intercept[IllegalStateException] { SchemaUtil.checkCompatibility(a, b) }
    }
  }

  test("∀ random docs: dedup_lines_first kernel == array_position HOF spec") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random documents over a tiny line alphabet (forces repeats), with
    // blank / space-only / tab-only lines and trailing newlines mixed in
    val alphabet = Vector("alpha", "beta", "gamma", "", " ", "  ", "\t", "x y")
    val docs = (1 to 120).map { _ =>
      val n = rnd.nextInt(12)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString("\n")
    }
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val viaKernel = graft.ops.Dedup.dedupLinesWithin(df, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val viaSpec = graft.ops.Dedup.dedupLinesWithinHof(df, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(viaKernel == viaSpec)
  }

  test("∀ random corpora: simhashPairs banding == brute-force hamming filter") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // small vocabularies force near-dup fingerprints, so the sweep hits
    // pairs on BOTH sides of every tested hamming bound
    (1 to 4).foreach { round =>
      val vocab = (0 until 12).map(v => s"tok$v")
      val docs = (0 until 40).map { i =>
        (i.toLong, (0 until 8 + rnd.nextInt(8))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val sims = graft.ops.Dedup.simhash(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Seq(0, 2, 5).foreach { h =>
        val got = graft.ops.Dedup.simhashPairs(df, "doc_id", "text", maxHamming = h)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val brute = (for {
          a <- sims.keys; b <- sims.keys if a < b
          hd = java.lang.Long.bitCount(sims(a) ^ sims(b)).toLong if hd <= h
        } yield (a, b, hd)).toSet
        assert(got == brute, s"round $round maxHamming $h")
      }
    }
  }

  // ------------------------------------------------------------------ //
  // persisted-index lifecycle properties: random append/delete/compact //
  // sequences on all three index families, probes compared against a   //
  // scratch index rebuilt from the live corpus AFTER EVERY op — the    //
  // edge space (token-free carries, stamp subtraction, Bloom resize,   //
  // tombstone purge ordering) is exactly where hand-picked sequences   //
  // have historically missed bugs                                      //
  // ------------------------------------------------------------------ //

  private val lcWords = (0 until 24).map(i => s"w$i")
  private def lcText(r: scala.util.Random, tokenFreeOk: Boolean): String =
    if (tokenFreeOk && r.nextInt(8) == 0) "   " // whitespace-only: token-free
    else Seq.fill(3 + r.nextInt(4))(lcWords(r.nextInt(lcWords.size)))
      .mkString(" ")
  private def hasTokens(t: String) = t.trim.nonEmpty

  test("∀ random op sequences: text index probes == scratch rebuild (incl. token-free)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.{IndexMaintenance, TextIndex}
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    for (seed <- 0 until 8) {
      val r = new scala.util.Random(7000 + seed)
      var nextId = seed * 100000L
      def fresh(n: Int): Seq[(Long, String)] = (0 until n).map { _ =>
        val id = nextId; nextId += 1; (id, lcText(r, tokenFreeOk = true)) }
      val live = scala.collection.mutable.Map[Long, String]()
      val path = TestSpark.tmpDir(s"prop-ti-$seed") + "/ti"
      val scratch = TestSpark.tmpDir(s"prop-ti-s-$seed") + "/ti"
      val init = fresh(5) :+ { val id = nextId; nextId += 1
        (id, "w0 w1 w2") } // >= one tokened doc, always
      TextIndex.buildTextIndex(df(init), "doc_id", "text", path, nBuckets = 8)
      live ++= init
      val q = s"${lcWords(r.nextInt(lcWords.size))} ${lcWords(r.nextInt(lcWords.size))}"
      def probes(p: String) = (
        TextIndex.searchIndexBM25(spark, p, q, 10)
          .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq,
        TextIndex.searchIndex(spark, p, q, 10)
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq)
      def check(op: String): Unit = {
        TextIndex.buildTextIndex(df(live.toSeq), "doc_id", "text", scratch,
          nBuckets = 8)
        assert(probes(path) == probes(scratch),
          s"seed $seed after $op: live=${live.keys.toSeq.sorted}")
      }
      check("build")
      for (step <- 0 until 4) {
        r.nextInt(4) match {
          case 0 | 1 =>
            val d = fresh(1 + r.nextInt(3))
            TextIndex.appendTextIndex(df(d), "doc_id", "text", path)
            live ++= d
            check(s"append#$step")
          case 2 =>
            // at most one victim per step, and a tokened doc only while
            // >2 tokened remain — the scratch build (and a later
            // compact) must never hit the all-token-free refusal
            val tokened = live.filter(kv => hasTokens(kv._2)).keys.toSet
            val victim = r.shuffle(live.keys.toSeq.sorted).headOption
              .filter(id => !tokened(id) || tokened.size > 2)
            victim.foreach { id =>
              IndexMaintenance.deleteFromTextIndex(spark, path, Seq(id))
              live -= id
              check(s"delete#$step")
            }
          case 3 =>
            if (r.nextBoolean())
              IndexMaintenance.compactTextIndex(spark, path)
            else
              IndexMaintenance.compactTextIndex(spark, path,
                bloomResize = Some((512L + r.nextInt(512), 0.01)))
            check(s"compact#$step")
        }
      }
    }
  }

  test("∀ random op sequences: dedup index pair probes == scratch rebuild") {
    import spark.implicits._
    import graft.ops.{DedupIndex, IndexMaintenance}
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    for (seed <- 0 until 8) {
      val r = new scala.util.Random(8000 + seed)
      var nextId = seed * 100000L
      def fresh(n: Int): Seq[(Long, String)] = (0 until n).map { _ =>
        val id = nextId; nextId += 1; (id, lcText(r, tokenFreeOk = false)) }
      val live = scala.collection.mutable.Map[Long, String]()
      val path = TestSpark.tmpDir(s"prop-di-$seed") + "/di"
      val scratch = TestSpark.tmpDir(s"prop-di-s-$seed") + "/di"
      val init = fresh(6)
      DedupIndex.buildDedupIndex(df(init), "doc_id", "text", path,
        n = 2, numHashes = 16, bands = 4)
      live ++= init
      // a fixed probe batch per sequence, drawn from the same tight
      // vocabulary so banding collisions actually happen
      val probeBatch = df((0 until 4).map(i =>
        (900000L + i, lcText(r, tokenFreeOk = false))))
      def probes(p: String) = DedupIndex.pairsAgainstIndex(spark, p,
          probeBatch, "doc_id", "text")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
        .toSet
      def check(op: String): Unit = {
        DedupIndex.buildDedupIndex(df(live.toSeq), "doc_id", "text",
          scratch, n = 2, numHashes = 16, bands = 4)
        assert(probes(path) == probes(scratch),
          s"seed $seed after $op: live=${live.keys.toSeq.sorted}")
      }
      check("build")
      for (step <- 0 until 4) {
        r.nextInt(4) match {
          case 0 | 1 =>
            val d = fresh(1 + r.nextInt(3))
            DedupIndex.appendDedupIndex(df(d), "doc_id", "text", path)
            live ++= d
            check(s"append#$step")
          case 2 if live.size > 2 =>
            val id = r.shuffle(live.keys.toSeq.sorted).head
            IndexMaintenance.deleteFromDedupIndex(spark, path, Seq(id))
            live -= id
            check(s"delete#$step")
          case 2 => // too small to delete — grow instead
            val d = fresh(2)
            DedupIndex.appendDedupIndex(df(d), "doc_id", "text", path)
            live ++= d
            check(s"append2#$step")
          case 3 =>
            IndexMaintenance.compactDedupIndex(spark, path)
            check(s"compact#$step")
        }
      }
    }
  }

  test("∀ random op sequences: IVFPQ probes == scratch rebuild (same codebooks)") {
    import spark.implicits._
    import graft.ops.{IndexMaintenance, Quantize}
    def vecOf(r: scala.util.Random): Seq[Float] =
      Seq.fill(8)(r.nextFloat() * 2f - 1f)
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
    for (seed <- 0 until 8) {
      val r = new scala.util.Random(9000 + seed)
      var nextId = seed * 100000L
      def fresh(n: Int): Seq[(Long, Seq[Float])] = (0 until n).map { _ =>
        val id = nextId; nextId += 1; (id, vecOf(r)) }
      val live = scala.collection.mutable.Map[Long, Seq[Float]]()
      val path = TestSpark.tmpDir(s"prop-ipq-$seed") + "/ipq"
      val scratch = TestSpark.tmpDir(s"prop-ipq-s-$seed") + "/ipq"
      val init = fresh(12)
      val initDf = df(init)
      // codebooks are trained ONCE and shared by every rebuild — the
      // property is about index MAINTENANCE, not retraining
      val coarse = init.sortBy(_._1).take(4).map(_._2.map(_.toDouble))
      val cbs = Quantize.pqCodebooks(initDf, "vec_id", "embedding",
        m = 4, ksub = 4, iters = 0)
      Quantize.buildIvfPqIndex(initDf, "vec_id", "embedding", coarse, cbs, path)
      live ++= init
      val q = init.head._2
      def probes(p: String) = Quantize.ivfPqTopKIndexed(spark, p, q, 6, 2)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      def check(op: String): Unit = {
        Quantize.buildIvfPqIndex(df(live.toSeq), "vec_id", "embedding",
          coarse, cbs, scratch)
        assert(probes(path) == probes(scratch),
          s"seed $seed after $op: live=${live.keys.toSeq.sorted}")
      }
      check("build")
      for (step <- 0 until 4) {
        r.nextInt(4) match {
          case 0 | 1 =>
            val d = fresh(1 + r.nextInt(3))
            Quantize.appendIvfPqIndex(df(d), "vec_id", "embedding", path)
            live ++= d
            check(s"append#$step")
          case 2 if live.size > 2 =>
            val id = r.shuffle(live.keys.toSeq.sorted).head
            IndexMaintenance.deleteFromIvfPqIndex(spark, path, Seq(id))
            live -= id
            check(s"delete#$step")
          case 2 =>
            val d = fresh(2)
            Quantize.appendIvfPqIndex(df(d), "vec_id", "embedding", path)
            live ++= d
            check(s"append2#$step")
          case 3 =>
            if (r.nextBoolean())
              IndexMaintenance.compactIvfPqIndex(spark, path)
            else
              IndexMaintenance.compactIfOverdue(spark, path,
                maxTombstoneBytes = 0L)
            check(s"compact#$step")
        }
      }
    }
  }
}
