package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE tokenizer: trainer semantics (Sennrich et al. 2016), rank-greedy
  * apply kernel, model persistence, and the greedy-equivalence law the
  * oracle's recursive CTE relies on. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference apply: replay merges IN LEARN ORDER, each applied
    * left-to-right with skip — the textbook formulation. The kernel
    * instead repeatedly merges the minimum-rank adjacent pair (leftmost
    * first); the two are equivalent for any rank-ordered table, which
    * the property test below pins. */
  private def refApply(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        b += word.substring(i, i + n); i += n
      }
      b.result()
    }
    for ((l, r) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def kernelApply(words: Seq[String],
                          merges: Seq[(String, String)]): Seq[String] = {
    val df = Seq(Tuple1(words)).toDF("w")
    df.select(graft.functions.native.bpe_encode($"w", merges))
      .collect()(0).getSeq[String](0)
  }

  test("learnBpe replays Sennrich's merge dynamics on a planted dictionary") {
    // 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 — the paper's
    // running example (without </w>): first merges are (e,s) 9,
    // (es,t) 9, then 'lo' from low/lower (7), then 'low' (7), ...
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
      ).zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
    val m = Bpe.learnBpe(docs, "text", nMerges = 4)
    assert(m.merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(m.totalMass == 16L && m.coveredMass == 16L)
    // vocab = base alphabet in byte order, then merge products in rank
    // order, dense ids by position
    assert(m.vocab == Vector("d", "e", "i", "l", "n", "o", "r", "s", "t", "w",
      "es", "est", "lo", "low"))
  }

  test("incremental merge loop is bit-identical to the naive recount loop") {
    // the production trainer (pair-stat deltas + occurrence lists +
    // lazy-deletion heap) must replay the textbook loop EXACTLY — same
    // argmax, same tie-breaks, same early stop — on arbitrary
    // dictionaries, including multi-byte symbols where UTF-8 byte order
    // and UTF-16 order disagree
    val rnd = new scala.util.Random(1234)
    val alphabets = Seq("ab", "abc", "abcde", "aé😀b", "xyz✓")
    for (trial <- 0 until 300) {
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      val cps = graft.functions.CodePoints.split(alpha)
      def randWord() = (0 until (1 + rnd.nextInt(8)))
        .map(_ => cps(rnd.nextInt(cps.length))).mkString
      val dict = (0 until (1 + rnd.nextInt(30)))
        .map(_ => randWord()).distinct
        .map(w => (w, 1L + rnd.nextInt(20))).toArray
      val nMerges = 1 + rnd.nextInt(30)
      val minPair = 1L + rnd.nextInt(3)
      val naive = Bpe.mergeLoopNaive(dict, nMerges, minPair)
      val incr = Bpe.mergeLoop(dict, nMerges, minPair)
      assert(incr == naive,
        s"trial $trial diverged: dict=${dict.toSeq} nMerges=$nMerges " +
          s"minPair=$minPair\n  naive=$naive\n  incr =$incr")
    }
  }

  test("buildVocab: first rank wins when two merges produce the same string") {
    // (a,bc) at rank 1 and (ab,c) at rank 2 both produce "abc"
    val v = Bpe.buildVocab(Seq("c", "a", "b"),
      Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")))
    assert(v == Vector("a", "b", "c", "bc", "abc", "ab"))
  }

  test("token ids: positional mapping, OOV and null elements -> -1") {
    val vocab = Seq("a", "b", "ab")
    val df = Seq(Tuple1(Seq("ab", "zz", "a"))).toDF("t")
    val got = df.select(graft.functions.native.token_ids($"t", vocab))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(2L, -1L, 0L))
    // null elements keep their position as -1 (token_ids[i] always
    // describes tokens[i])
    val withNull = Seq(Tuple1(Seq("a", null, "b"))).toDF("t")
    assert(withNull.select(graft.functions.native.token_ids($"t", vocab))
      .collect()(0).getSeq[Long](0) == Seq(0L, -1L, 1L))
    // NULL array -> NULL ids
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
    assert(nullArr.select(graft.functions.native.token_ids($"t", vocab))
      .collect()(0).isNullAt(0))
    // a duplicate vocabulary is refused at construction
    val e = intercept[Exception] {
      df.select(graft.functions.native.token_ids($"t", Seq("a", "a"))).collect()
    }
    assert(e.getMessage.contains("duplicate token"))
  }

  test("encodeIds: ids decode back to the kernel's tokens through the vocab") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val m = Bpe.learnBpe(docs, "text", nMerges = 4)
    val toks = Bpe.encode(docs, "id", "text", m.merges).orderBy("id").collect()
    val ids = Bpe.encodeIds(docs, "id", "text", m).orderBy("id").collect()
    toks.zip(ids).foreach { case (t, i) =>
      val decoded = i.getSeq[Long](1).map(x => m.vocab(x.toInt))
      assert(decoded == t.getSeq[String](1))
    }
  }

  test("learnBpe tie-break: equal counts pick the byte-order-smaller pair") {
    // 'ba' and 'ab' both occur twice; (a,b) < (b,a)
    val docs = Seq("ab ab ba ba").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val m = Bpe.learnBpe(docs, "text", nMerges = 1)
    assert(m.merges == Seq(("a", "b")))
  }

  test("learnBpe stops at minPairCount and honors the maxWords cap mass") {
    val docs = Seq((0L, "xy qqqq qqqq zz")).toDF("id", "text")
    // (q,q) count 4 via two words... one merge lands; the singleton
    // pairs (x,y)/(z,z) are below minPairCount = 2
    val m = Bpe.learnBpe(docs, "text", nMerges = 10)
    assert(m.merges.head == ("q", "q"))
    // qq qq after merge -> (qq,qq) count 2 continues; (x,y) count 1 never merges
    assert(!m.merges.contains(("x", "y")) && !m.merges.contains(("z", "z")))
    val capped = Bpe.learnBpe(docs, "text", nMerges = 1, maxWords = 1)
    // dict keeps only 'qqqq' (count 2 beats count-1 words)
    assert(capped.coveredMass == 2L && capped.totalMass == 4L)
    assert(capped.merges == Seq(("q", "q")))
  }

  test("kernel rank-greedy == learn-order replay on random words and tables") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    def randWord() =
      (0 until (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(4))).mkString
    for (_ <- 0 until 200) {
      // random merge table over the alphabet and its one-step merges,
      // rank order = generation order, no duplicates
      val seen = scala.collection.mutable.LinkedHashSet[(String, String)]()
      val pool = for (a <- alpha.map(_.toString); b <- alpha.map(_.toString))
        yield (a, b)
      val firsts = rnd.shuffle(pool).take(1 + rnd.nextInt(6))
      firsts.foreach(seen += _)
      // chain a few second-level merges of already-merged symbols
      for (_ <- 0 until rnd.nextInt(4)) {
        val merged = seen.toSeq.map { case (l, r) => l + r }
        val l = merged(rnd.nextInt(merged.size))
        val r = alpha(rnd.nextInt(4)).toString
        if (!seen.contains((l, r))) seen += ((l, r))
      }
      val merges = seen.toSeq
      val words = (0 until (1 + rnd.nextInt(5))).map(_ => randWord())
      val expect = words.flatMap(w => refApply(w, merges))
      assert(kernelApply(words, merges) == expect,
        s"words=$words merges=$merges")
    }
  }

  test("kernel edges: null text, empty words, single char, code points") {
    val df = Seq(
      (1L, "ab a  b"), (2L, null.asInstanceOf[String]), (3L, ""),
      (4L, "😀ab x😀")).toDF("id", "text")
    val merges = Seq(("a", "b"))
    val got = Bpe.encode(df, "id", "text", merges).orderBy("id").collect()
    assert(got(0).getSeq[String](1) == Seq("ab", "a", "b"))
    assert(got(1).isNullAt(1)) // NULL text -> NULL tokens
    assert(got(2).getSeq[String](1) == Seq.empty) // '' tokenizes to nothing
    // the emoji (a surrogate pair) is ONE symbol: never split, never
    // merged into its ascii neighbors
    assert(got(3).getSeq[String](1) == Seq("😀", "ab", "x", "😀"))
  }

  test("duplicate merge pairs are refused") {
    val e = intercept[Exception] {
      kernelApply(Seq("ab"), Seq(("a", "b"), ("a", "b")))
    }
    assert(e.getMessage.contains("duplicate merge pair"))
  }

  test("model save/load round-trips merges, mass stats AND the vocab") {
    val path = TestSpark.tmpDir("bpe-model") + "/m"
    val m = Bpe.BpeModel(Seq(("e", "r"), ("er", "s"), ("a", "n")), 77L, 99L,
      Vector("a", "e", "n", "r", "s", "er", "ers", "an"))
    Bpe.saveBpeModel(spark, m, path)
    assert(Bpe.loadBpeModel(spark, path) == m)
    // a legitimately EMPTY model (every pair under minPairCount) keeps
    // its mass stats through the sentinel row
    val empty = Bpe.BpeModel(Seq.empty, 5L, 9L)
    Bpe.saveBpeModel(spark, empty, path)
    assert(Bpe.loadBpeModel(spark, path) == empty)
  }

  test("legacy pre-vocab model layout loads with empty vocab; id paths refuse it") {
    // the old single-parquet-at-path layout, written by hand
    val path = TestSpark.tmpDir("bpe-legacy") + "/m"
    Seq((-1L, null: String, null: String), (0L, "a", "b"))
      .toDF("rank", "l", "r")
      .withColumn("covered_mass", lit(7L)).withColumn("total_mass", lit(9L))
      .coalesce(1).write.parquet(path)
    val m = Bpe.loadBpeModel(spark, path)
    assert(m.merges == Seq(("a", "b")) && m.vocab.isEmpty)
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeIdsCol(lit("ab"), m)
    }
    assert(e.getMessage.contains("vocabulary"))
  }

  test("chunkByTokenBudget: greedy law, overlong word alone, exact counts") {
    // merges: "ab" fuses (1 token), everything else stays per-char.
    // words: ab(1) ab(1) xyz(3) ab(1) wxyzv(5) ab(1); budget 4:
    //   [ab ab]            1+1, +3 would be 5 > 4
    //   [xyz ab]           3+1
    //   [wxyzv]            5 > 4 but first word of its chunk
    //   [ab]
    val docs = Seq((0L, "ab ab xyz ab wxyzv ab")).toDF("doc_id", "text")
    val got = Bpe.chunkByTokenBudget(docs, "doc_id", "text",
        Seq(("a", "b")), budget = 4L)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, "ab ab", 2L), (1L, "xyz ab", 4L),
      (2L, "wxyzv", 5L), (3L, "ab", 1L)))
  }

  test("chunkByTokenBudget: null/empty text yields ONE empty chunk") {
    val docs = Seq((0L, null: String), (1L, "   "), (2L, "ab"))
      .toDF("doc_id", "text")
    val got = Bpe.chunkByTokenBudget(docs, "doc_id", "text",
        Seq(("a", "b")), budget = 4L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, "", 0L), (1L, 0L, "", 0L),
      (2L, 0L, "ab", 1L)))
  }

  test("chunkByTokenBudget: 200-trial property vs a reference greedy walk") {
    // laws: chunks reassemble to the word sequence; n_tokens is the
    // exact sum of per-word kernel counts; every chunk respects the
    // budget unless it is a single overlong word; no chunk is empty
    val rnd = new scala.util.Random(99)
    val merges = Seq(("a", "b"), ("ab", "c"), ("x", "y"))
    for (trial <- 0 until 200) {
      val words = (0 until rnd.nextInt(30)).map { _ =>
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => "abcxyz" (rnd.nextInt(6))).mkString
      }
      val budget = 1L + rnd.nextInt(8)
      val counts = words.map(w => kernelApply(Seq(w), merges).length.toLong)
      // reference walk, independently written
      val expected = Seq.newBuilder[(String, Long)]
      var cur = Vector.empty[String]; var run = 0L
      for ((w, c) <- words.zip(counts)) {
        if (cur.nonEmpty && run + c > budget) {
          expected += ((cur.mkString(" "), run)); cur = Vector.empty; run = 0L
        }
        cur :+= w; run += c
      }
      if (cur.nonEmpty) expected += ((cur.mkString(" "), run))
      val exp = { val e = expected.result(); if (e.isEmpty) Seq(("", 0L)) else e }
      val got = Bpe.chunkByTokenBudget(
          Seq((0L, words.mkString(" "))).toDF("doc_id", "text"),
          "doc_id", "text", merges, budget)
        .orderBy("chunk_id").collect()
        .map(r => (r.getString(2), r.getLong(3))).toSeq
      assert(got == exp, s"trial $trial: words=$words budget=$budget")
      got.zip(got.indices).foreach { case ((text, n), _) =>
        assert(n <= budget || !text.contains(" "),
          s"trial $trial: over-budget multi-word chunk '$text' ($n > $budget)")
      }
    }
  }

  test("decodeIds: inverse of encodeIds; out-of-vocab ids decode to null") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val m = Bpe.learnBpe(docs, "text", nMerges = 4)
    val ids = Bpe.encodeIds(docs, "id", "text", m)
    val decoded = Bpe.decodeIds(ids, "id", "token_ids", m).orderBy("id").collect()
    val toks = Bpe.encode(docs, "id", "text", m.merges).orderBy("id").collect()
    decoded.zip(toks).foreach { case (d, t) =>
      assert(d.getSeq[String](1) == t.getSeq[String](1))
    }
    // -1 (OOV) and any out-of-range id -> null element, never a throw —
    // including ids past Int range (the long→int cast must be gated or
    // ANSI mode throws CAST_OVERFLOW)
    val stray = Seq(Tuple1(Seq(-1L, 0L, 9999L, 3000000000L, Long.MinValue)))
      .toDF("token_ids")
    val got = stray.select(Bpe.decodeIdsCol($"token_ids", m)).collect()(0)
      .getSeq[String](0)
    assert(got == Seq(null, m.vocab.head, null, null, null))
    // a vocab-less legacy model is refused loudly
    val e = intercept[IllegalArgumentException] {
      Bpe.decodeIdsCol($"token_ids", Bpe.BpeModel(Seq(("a", "b")), 1L, 1L))
    }
    assert(e.getMessage.contains("vocabulary"))
  }

  test("learn -> encode: concatenation law and compression on a zipfian corpus") {
    val docs = spark.range(500).select($"id",
      concat_ws(" ",
        lit("the"), lit("merge"), lit("window"),
        concat(lit("w"), ($"id" % 7).cast("string")),
        lit("the"), lit("stream")).as("text"))
    val m = Bpe.learnBpe(docs, "text", nMerges = 20)
    assert(m.merges.nonEmpty && m.coveredMass == m.totalMass)
    val enc = Bpe.encode(docs, "id", "text", m.merges)
      .select(concat_ws("", col("tokens")).as("glued"),
        size(col("tokens")).as("n"))
      .collect()
    // tokens concatenate back to the whitespace-stripped lowercased text
    enc.foreach { r =>
      assert(r.getString(0).matches("themergewindoww\\dthestream"))
      // trained merges compress: far fewer tokens than characters
      assert(r.getInt(1) < r.getString(0).length)
    }
  }

  test("byte fallback: vocab layout; unseen code points expand to byte ids; -1 never emitted") {
    val docs = Seq((0L, "the cat"), (1L, "that hat the"), (2L, "chat the"))
      .toDF("id", "text")
    val m = Bpe.learnBpe(docs, "text", nMerges = 3,
      byteFallback = true, specials = Seq("<eos>", "<pad>"))
    // layout: specials at 0..1, the 256 byte tokens at 2..257, then the
    // corpus alphabet (byte order), then merge products by rank
    assert(m.vocab.take(2) == Seq("<eos>", "<pad>"))
    assert(m.vocab.slice(2, 258) == graft.functions.ByteTokens.all)
    val alpha = m.vocab.drop(258).takeWhile(t => t.codePointCount(0, t.length) == 1)
    assert(alpha == alpha.sorted && alpha.contains("a") && alpha.contains("t"))
    // post-training data with code points the corpus never saw: every
    // token gets >= 1 id, OOV single symbols expand to their UTF-8
    // byte ids, and -1 never appears — mirrored against the kernel's
    // own token stream + a driver-side byte expansion
    val post = Seq((0L, "thé cat"), (1L, "δδ λx7"), (2L, "💩th"),
      (3L, "日本語 mixed"), (4L, ""), (5L, "ça va")).toDF("id", "text")
    val vidx = m.vocab.zipWithIndex.toMap
    val toks = Bpe.encode(post, "id", "text", m.merges).orderBy("id").collect()
    val ids = Bpe.encodeIds(post, "id", "text", m).orderBy("id").collect()
    toks.zip(ids).foreach { case (t, i) =>
      val expect = t.getSeq[String](1).flatMap { tok =>
        vidx.get(tok) match {
          case Some(v) => Seq(v.toLong)
          case None => tok.getBytes("UTF-8").toSeq
            .map(b => vidx(graft.functions.ByteTokens.token(b & 0xff)).toLong)
        }
      }
      val got = i.getSeq[Long](1)
      assert(got == expect, s"id row ${i.getLong(0)}")
      assert(got.forall(_ >= 0L), "fallback must never emit -1")
    }
    // a fallback model without the byte block is refused at plan time
    val e = intercept[Exception] {
      post.select(graft.functions.native.token_ids(
        Bpe.encodeCol($"text", m.merges), Seq("a", "b"),
        byteFallback = true)).collect()
    }
    assert(e.getMessage.contains("byteFallback needs all 256"))
  }

  test("byte fallback: decodeText round-trips ANY input to its lowercased word concat") {
    val train = Seq((0L, "the cat sat"), (1L, "that chat")).toDF("id", "text")
    val m = Bpe.learnBpe(train, "text", nMerges = 2, byteFallback = true)
    val inputs = Seq("Hello Λόγος x", "日本語 テスト", "mixed λx7 💩th",
      "the cat", "  spaced   out  ", "")
    val df = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select($"id", $"text",
        Bpe.decodeTextCol(Bpe.encodeIdsCol($"text", m), m).as("rt"))
      .orderBy("id").collect()
    got.foreach { r =>
      val expect = r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).mkString("")
      assert(r.getString(2) == expect, s"input '${r.getString(1)}'")
    }
    // NULL text stays NULL; a corrupt id nulls the decode loudly
    val nullRow = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
    assert(nullRow.select(Bpe.decodeTextCol(
      Bpe.encodeIdsCol($"text", m), m)).collect()(0).isNullAt(0))
    val corrupt = Seq(Tuple1(Seq(0L, 999999L))).toDF("ids")
    assert(corrupt.select(Bpe.decodeTextCol($"ids", m))
      .collect()(0).isNullAt(0))
  }

  test("byte fallback: literal <0xNN> spellings round-trip verbatim, reserved ids stay byte-only") {
    // merges that reassemble the literal 6 characters "<0x09>" into one
    // token — the digit-only collision ByteTokens documents; under a
    // spelling-keyed decode this token would reassemble to a TAB byte
    val merges = Seq(("<", "0"), ("<0", "x"), ("<0x", "0"),
      ("<0x0", "9"), ("<0x09", ">"))
    val base = Seq("0", "9", "<", ">", "a", "x")
    val vocab = Bpe.buildVocab(base, merges, byteFallback = true,
      specials = Seq("<eos>"))
    // the reserved block keeps all 256 entries (ids 1..256) AND the
    // merge product gets its OWN literal id after it — no dedup onto
    // the reserved block
    assert(vocab.slice(1, 257) == graft.functions.ByteTokens.all)
    assert(vocab.count(_ == "<0x09>") == 2,
      s"expected reserved + literal entries, got ${vocab.count(_ == "<0x09>")}")
    val literalId = vocab.lastIndexOf("<0x09>").toLong
    val reservedId = vocab.indexOf("<0x09>").toLong
    assert(reservedId == 1L + 0x09L && literalId > 256L)
    val m = Bpe.BpeModel(merges, 0L, 0L, vocab, byteFallback = true,
      specials = Seq("<eos>"))
    val df = Seq((0L, "<0x09> a")).toDF("id", "text")
    // encoding the literal text emits the LITERAL id, not the reserved one
    val ids = df.select(Bpe.encodeIdsCol($"text", m)).collect()(0).getSeq[Long](0)
    assert(ids.contains(literalId) && !ids.contains(reservedId), ids.toString)
    // ...and decode reproduces the 6 characters verbatim
    assert(df.select(Bpe.decodeTextCol(Bpe.encodeIdsCol($"text", m), m))
      .collect()(0).getString(0) == "<0x09>a")
    // the reserved id itself still reassembles to the raw byte: an OOV
    // code point whose UTF-8 contains 0x09 does not exist, so drive the
    // reserved id directly
    val tab = Seq(Tuple1(Seq(reservedId))).toDF("ids")
    assert(tab.select(Bpe.decodeTextCol($"ids", m))
      .collect()(0).getString(0) == "\t")
    // a special spelling a byte-token form is refused at vocab build
    val e = intercept[IllegalArgumentException] {
      Bpe.buildVocab(base, merges, byteFallback = true,
        specials = Seq("<0x41>"))
    }
    assert(e.getMessage.contains("reserved byte-token"), e.getMessage)
  }

  test("model card + fingerprint: save/load round-trip, content keying, torn trees refused") {
    val docs = Seq((0L, "the cat the"), (1L, "that hat")).toDF("id", "text")
    val m = Bpe.learnBpe(docs, "text", nMerges = 4,
      byteFallback = true, specials = Seq("<eos>"))
    assert(m.bytesPerTokenCovered > 0.0) // measured on the training dict
    val path = TestSpark.tmpDir("bpe-card") + "/m"
    Bpe.saveBpeModel(spark, m, path)
    // flags, specials, and the compression stat all survive the disk
    assert(Bpe.loadBpeModel(spark, path) == m)
    val card = Bpe.modelCard(spark, m).collect()(0)
    assert(card.getAs[Long]("n_merges") == m.merges.length.toLong)
    assert(card.getAs[Long]("vocab_size") == m.vocab.length.toLong)
    assert(card.getAs[Long]("alphabet_size") ==
      m.vocab.drop(1).count(t => t.codePointCount(0, t.length) == 1).toLong)
    assert(card.getAs[Boolean]("byte_fallback"))
    assert(card.getAs[String]("fingerprint") == Bpe.fingerprint(m))
    // the fingerprint keys CONTENT: any behavioral change moves it,
    // non-behavioral stats (mass, compression) do not
    assert(Bpe.fingerprint(m) != Bpe.fingerprint(
      m.copy(merges = m.merges.dropRight(1))))
    assert(Bpe.fingerprint(m) != Bpe.fingerprint(
      m.copy(vocab = m.vocab :+ "zzz")))
    assert(Bpe.fingerprint(m) != Bpe.fingerprint(m.copy(byteFallback = false)))
    assert(Bpe.fingerprint(m) == Bpe.fingerprint(
      m.copy(coveredMass = 1L, bytesPerTokenCovered = 0.0)))
    // the serialization is INJECTIVE (length-prefixed framing): token
    // content containing a would-be terminator byte cannot make two
    // different models collide — under in-band NUL framing these two
    // hashed identically
    assert(Bpe.fingerprint(Bpe.BpeModel(Nil, 0L, 0L, Seq("a\u0000b"))) !=
      Bpe.fingerprint(Bpe.BpeModel(Nil, 0L, 0L, Seq("a", "b"))))
    val m2 = Bpe.BpeModel(m.merges.dropRight(1), 0L, 0L,
      Bpe.buildVocab(Seq("a", "c", "e", "h", "t"), m.merges.dropRight(1),
        byteFallback = true, specials = Seq("<eos>")),
      byteFallback = true, specials = Seq("<eos>"))
    // a TORN tree (vocab from one save, merges/card from another — what
    // a partial mode-overwrite re-save leaves) is refused at load
    m2.vocab.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("token_id", "token")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    val e = intercept[IllegalArgumentException] {
      Bpe.loadBpeModel(spark, path)
    }
    assert(e.getMessage.contains("TORN"))
    // a card stamped under the PRE-r14 legacy fingerprint scheme is a
    // sound old save, not a torn tree: restore the vocab, rewrite the
    // card with the legacy fingerprint, and the load must accept it
    m.vocab.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("token_id", "token")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    def rewriteCardFp(fp: String): Unit = {
      val c = spark.read.parquet(s"$path/card")
        .withColumn("fingerprint", lit(fp)).collect()
      spark.createDataFrame(spark.sparkContext.parallelize(c.toSeq),
          spark.read.parquet(s"$path/card").schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$path/card")
    }
    rewriteCardFp(Bpe.fingerprintLegacy(m))
    assert(Bpe.loadBpeModel(spark, path) == m,
      "legacy-scheme card must load, not read as torn")
    // a fingerprint matching NEITHER scheme is real damage
    rewriteCardFp("deadbeef")
    val e2 = intercept[IllegalArgumentException] {
      Bpe.loadBpeModel(spark, path)
    }
    assert(e2.getMessage.contains("legacy"), e2.getMessage)
  }

  test("sepCost: chunk reserves per-chunk headroom; pack budgets one separator per doc") {
    val docs = Seq((0L, "aa bb cc dd ee"), (1L, "aaa bb")).toDF("id", "text")
    // chunking with sepCost is BY LAW chunking against budget - sepCost
    val withSep = Bpe.chunkByTokenBudget(docs, "id", "text", Seq(("a", "a")),
        budget = 8L, sepCost = 3L).orderBy("id", "chunk_id").collect()
    val direct = Bpe.chunkByTokenBudget(docs, "id", "text", Seq(("a", "a")),
        budget = 5L).orderBy("id", "chunk_id").collect()
    assert(withSep.toSeq == direct.toSeq)
    withSep.foreach(r => assert(r.getAs[Long]("n_tokens") + 3L <= 8L))
    intercept[IllegalArgumentException] {
      Bpe.chunkByTokenBudget(docs, "id", "text", Seq(("a", "a")), 8L,
        sepCost = 8L)
    }
    // packing: each doc's stream footprint becomes n + sepCost, so
    // offsets shift by exactly one per PRECEDING doc in the group
    val counted = docs.select($"id", lit("g").as("g"),
      size(Bpe.encodeCol($"text", Seq(("a", "a")))).cast("long").as("n"))
    val plain = graft.ops.Sample.packByTokenBudget(counted, "g", "id", "n", 100L)
      .orderBy("id").collect()
    val sep = graft.ops.Sample.packByTokenBudget(counted, "g", "id", "n", 100L,
        sepCost = 1L).orderBy("id").collect()
    plain.zip(sep).zipWithIndex.foreach { case ((p, s), i) =>
      assert(s.getAs[Long]("pack_offset") ==
        p.getAs[Long]("pack_offset") + i.toLong)
    }
  }
}
