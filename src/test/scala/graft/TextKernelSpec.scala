package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextStats

/** Pins the single-pass text kernels to the declarative formulations
  * they replaced in [[TextStats.quality]] / [[TextStats.langId]]: the
  * oracle SQL still replays the regex/filter formulations, so kernel ==
  * declarative is exactly the engine↔oracle equivalence. */
class TextKernelSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def textsDf = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
  }

  private val texts = Seq(
    "The quick brown fox, jumps; over: the lazy dog! 123 45?",
    "  \t\n\f\r mixedwhitespace  ",
    "", "no-punct-here", "1234567890", ".,!?;:",
    "der die das und ist ein nicht",
    "el los y que es una por",
    "le les et est une pas pour",
    "的 是 了 在 我 有 的 的",
    "Üñïçødé tæxt — with dashes…and “smart quotes”",
    "the the the a of to and in is it",
    null
  )

  test("char_class_counts == three length(regexp_replace(...)) passes") {
    val df = textsDf
    val cc = graft.functions.native.char_class_counts(col("text"))
    val rows = df.select(
      length(regexp_replace(col("text"), "\\s", "")).cast("long").as("ns_old"),
      (length(col("text")).cast("long") - cc.getField("n_ws")).as("ns_new"),
      length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("long").as("p_old"),
      cc.getField("n_punct").as("p_new"),
      length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("d_old"),
      cc.getField("n_digit").as("d_new")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) {
        assert(r.getLong(0) == r.getLong(1), s"no-space length: $r")
        assert(r.getLong(2) == r.getLong(3), s"punct: $r")
        assert(r.getLong(4) == r.getLong(5), s"digit: $r")
      }
    }
  }

  test("lang_votes == per-language size(filter(array_contains)) counts") {
    val df = textsDf
    val toks = TextStats.tokens(col("text"))
    val votes = graft.functions.native.lang_votes(toks)
    val langs = Seq("en", "de", "es", "fr", "zh")
    val olds = langs.map(l =>
      size(filter(toks, t => array_contains(
        typedLit(TextStats.Stopwords(l)), t))).cast("long").as(s"${l}_old"))
    val news = langs.map(l => votes.getField(l).as(s"${l}_new"))
    val rows = df.select(olds ++ news: _*).collect()
    rows.foreach { r =>
      langs.indices.foreach { i =>
        assert(r.isNullAt(i) == r.isNullAt(langs.length + i))
        if (!r.isNullAt(i))
          assert(r.getLong(i) == r.getLong(langs.length + i),
            s"${langs(i)}: $r")
      }
    }
  }

  test("kernel stopword lists stay in sync with TextStats.Stopwords") {
    assert(graft.functions.LangVotesKernel.Langs.toSeq ==
      Seq("en", "de", "es", "fr", "zh"))
    graft.functions.LangVotesKernel.Langs.foreach { l =>
      assert(graft.functions.LangVotesKernel.Stopwords(l) ==
        TextStats.Stopwords(l), s"stopwords diverge for $l")
    }
    // the kernel's one-HashMap-per-word probe silently assumes the
    // language lists are pairwise DISJOINT (a shared word would keep
    // only the last language's vote slot) — pin the assumption, not
    // just list equality, so an added stopword that overlaps refuses
    // here instead of skewing votes at runtime
    val langs = graft.functions.LangVotesKernel.Langs.toSeq
    for {
      i <- langs.indices; j <- (i + 1) until langs.size
    } {
      val shared = graft.functions.LangVotesKernel.Stopwords(langs(i)).toSet
        .intersect(graft.functions.LangVotesKernel.Stopwords(langs(j)).toSet)
      assert(shared.isEmpty,
        s"stopword lists for ${langs(i)} and ${langs(j)} overlap on " +
          s"$shared — the kernel's hash probe would drop one side's vote")
    }
  }

  test("quality/langId outputs unchanged on the corpus sample (golden)") {
    // a direct golden check against the pre-kernel formulation, computed
    // inline: same frame, old vs new expressions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextStats.tokens(col("text"))
    val cOld = Seq("en", "de", "es", "fr", "zh").map(l => l ->
      size(filter(toks, t => array_contains(
        typedLit(TextStats.Stopwords(l)), t))).cast("long")).toMap
    val order = Seq("en", "de", "es", "fr", "zh")
    val oldLang = order.foldRight(lit("unk")) { (l, alt) =>
      val ge = order.filter(_ != l).map(o => cOld(l) >= cOld(o)).reduce(_ && _)
      when(cOld(l) > 0 && ge, lit(l)).otherwise(alt)
    }
    val cmp = docs.select(
      TextStats.langId(col("text")).as("new"), oldLang.as("old"))
      .filter(col("new") =!= col("old") ||
        col("new").isNull =!= col("old").isNull)
    assert(cmp.count() == 0L)
  }
}
