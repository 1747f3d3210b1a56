package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Byte-pair-encoding subword tokenizer (Sennrich et al. 2016, ACL:
 * "Neural Machine Translation of Rare Words with Subword Units") — the
 * tokenizer-TRAINING step of a training-data pipeline, plus its apply
 * side as a codegen'd kernel ([[graft.functions.BpeEncode]]).
 *
 * Scale shape, by construction:
 *
 *  - **Learning runs on the word-frequency DICTIONARY, not the corpus.**
 *    [[wordFreqs]] is the only corpus-sized pass (explode + ONE hash
 *    shuffle with map-side partial aggregation — the [[TextStats.vocab]]
 *    discipline); its output is vocabulary-sized, and [[learnBpe]] then
 *    caps it at the `maxWords` most frequent words (deterministic:
 *    count desc, word asc) before collecting — a bounded collect, the
 *    codebook discipline. The merge loop itself is driver-side over
 *    ≤ `maxWords` short symbol arrays: this is not a compromise but the
 *    shape of the algorithm — every production BPE trainer runs its
 *    merge loop on a word dict (the corpus only ever contributes word
 *    counts), and a distributed merge loop would pay `nMerges` full
 *    shuffles to compute the same counts the dict already holds.
 *    The cap is NOT silent: [[BpeModel.coveredMass]] / `totalMass`
 *    report exactly how much word mass trained the merges.
 *  - **Encoding is one narrow kernel call per row** wherever the corpus
 *    lives — no shuffle, no lookup join; the merge table rides the
 *    serialized expression (KBs for any realistic merge count).
 *
 * Determinism (oracle discipline): the merge argmax breaks count ties
 * by UNSIGNED UTF-8 BYTE order on (left, right) — the binary string
 * ordering Spark and DuckDB share — so a learned table is a pure
 * function of the word-count multiset. Symbols are Unicode code
 * points; merges never cross word boundaries; token concatenation per
 * word equals the word (no `</w>` end-of-word marker — Sennrich's
 * marker is a reversibility convenience the array-of-tokens output
 * does not need).
 */
object Bpe {

  /** A learned merge table (rank order = `merges` order) plus the word
    * mass that trained it: `coveredMass` of `totalMass` whitespace-token
    * occurrences were inside the `maxWords` dictionary cap. */
  final case class BpeModel(merges: Seq[(String, String)],
                            coveredMass: Long, totalMass: Long)

  /** Word-frequency dictionary of the corpus: whitespace tokens of the
    * lowercased text ([[TextStats.tokens]]), empties dropped —
    * `(word, cnt)`. One explode + one hash shuffle with map-side
    * partial aggregation; token skew collapses per partition before
    * the exchange. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol-pair counts at the CHARACTER level, weighted by
    * word frequency — iteration 0 of the BPE merge loop, fully
    * distributed (the dictionary never leaves the cluster): the top
    * `top` pairs as `(l, r, cnt)`, ordered (cnt desc, l, r) — a total
    * order on distinct pairs, so the cut is deterministic. */
  def pairCounts(df: DataFrame, textCol: String, top: Int): DataFrame = {
    require(top >= 1, s"top must be >= 1, got $top")
    val wlen = length(col("word"))
    val pairs = transform(sequence(lit(1), wlen - 1), i => struct(
      col("word").substr(i, lit(1)).as("l"),
      col("word").substr(i + 1, lit(1)).as("r")))
    wordFreqs(df, textCol)
      .filter(wlen >= 2) // sequence(1, 0) would DESCEND, not empty out
      .select(explode(pairs).as("p"), col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("l"), col("r"))
      .limit(top)
  }

  /** Unsigned UTF-8 byte order — the binary string collation Spark's
    * orderBy and DuckDB's default collation share. Java's
    * `String.compareTo` is UTF-16 code-UNIT order, which disagrees for
    * supplementary characters. */
  private def byteLt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  // ONE splitter definition with the apply kernel — dictionary symbols
  // and kernel symbols can never drift
  private def cpSplit(word: String): Array[String] =
    graft.functions.CodePoints.split(word)

  /** Learn `nMerges` BPE merges from the corpus. The distributed part
    * is ONE [[wordFreqs]] pass; the dictionary is capped at `maxWords`
    * (count desc, word asc — deterministic) and collected, then the
    * classic merge loop runs driver-side: count adjacent symbol pairs
    * weighted by word frequency, merge the argmax (count desc, then
    * (l, r) ascending in UTF-8 byte order), repeat. Stops early when
    * the best pair's count falls below `minPairCount` (a merge seen
    * once is memorization, not structure — Sennrich's convention).
    * Pair counting restarts per iteration: `maxWords · avgLen · nMerges`
    * driver ops, microseconds at any realistic setting. */
  def learnBpe(df: DataFrame, textCol: String, nMerges: Int,
               maxWords: Int = 1 << 16, minPairCount: Long = 2L): BpeModel = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val wf = wordFreqs(df, textCol).localCheckpoint(true)
    val totalMass = wf.agg(coalesce(sum(col("cnt")), lit(0L)))
      .head().getLong(0)
    val dict = wf.orderBy(col("cnt").desc, col("word")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // both consumers are done — release the checkpoint's blocks now
    // rather than at session end (a training sweep would otherwise pin
    // one vocabulary-sized cache per call)
    wf.unpersist()
    val coveredMass = dict.map(_._2).sum
    val words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (cpSplit(w), c) }
    val syms: Array[Array[String]] = words.map(_._1)
    val merges = Seq.newBuilder[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val c = words(wi)._2
        var i = 0
        while (i < s.length - 1) {
          counts.merge((s(i), s(i + 1)), c, (a, b) => a + b); i += 1
        }
        wi += 1
      }
      var best: (String, String) = null
      var bestCnt = 0L
      counts.forEach { (p, c) =>
        if (best == null || c > bestCnt ||
          (c == bestCnt && (byteLt(p._1, best._1) ||
            (p._1 == best._1 && byteLt(p._2, best._2))))) {
          best = p; bestCnt = c
        }
      }
      if (best == null || bestCnt < minPairCount) exhausted = true
      else {
        merges += best
        // apply the new merge left-to-right in every dictionary word
        var wj = 0
        while (wj < syms.length) {
          val s = syms(wj)
          if (s.length >= 2) {
            val out = new java.util.ArrayList[String](s.length)
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
                out.add(s(i) + s(i + 1)); i += 2
              } else { out.add(s(i)); i += 1 }
            }
            if (out.size() < s.length)
              syms(wj) = out.toArray(new Array[String](out.size()))
          }
          wj += 1
        }
        iter += 1
      }
    }
    BpeModel(merges.result(), coveredMass, totalMass)
  }

  /** Persist a model as one parquet: `(rank, l, r)` plus the constant
    * mass columns — the saved-model discipline of
    * [[Classifier.saveNaiveBayes]]. A rank = -1 sentinel row (NULL
    * pair) always carries the mass stats, so a legitimately EMPTY model
    * (a corpus whose every pair count falls under `minPairCount`)
    * round-trips instead of losing its stats in a zero-row file. */
  def saveBpeModel(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    ((-1L, null: String, null: String) +: model.merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) })
      .toDF("rank", "l", "r")
      .withColumn("covered_mass", lit(model.coveredMass))
      .withColumn("total_mass", lit(model.totalMass))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted model back, merges in rank order. */
  def loadBpeModel(spark: SparkSession, path: String): BpeModel = {
    val rows = spark.read.parquet(path)
      .select("rank", "l", "r", "covered_mass", "total_mass")
      .orderBy("rank").collect()
    require(rows.nonEmpty && rows.head.getLong(0) == -1L,
      s"loadBpeModel: $path is not a saved BPE model (no sentinel row)")
    BpeModel(rows.tail.map(r => (r.getString(1), r.getString(2))).toSeq,
      rows.head.getLong(3), rows.head.getLong(4))
  }

  /** Subword-token column for `textCol` under a merge table: whitespace
    * tokens of the lowercased text, each segmented by the rank-greedy
    * kernel. NULL text yields NULL, empty/whitespace text an empty
    * array. */
  def encodeCol(textCol: Column, merges: Seq[(String, String)]): Column =
    graft.functions.native.bpe_encode(TextStats.tokens(textCol), merges)

  /** `(idCol, tokens)` — the corpus under the tokenizer: one narrow
    * kernel projection, no shuffle, whatever the corpus size. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame =
    df.select(col(idCol), encodeCol(col(textCol), merges).as("tokens"))
}
