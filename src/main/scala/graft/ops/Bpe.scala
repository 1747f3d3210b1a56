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

  /** A learned merge table (rank order = `merges` order), the word mass
    * that trained it (`coveredMass` of `totalMass` whitespace-token
    * occurrences were inside the `maxWords` dictionary cap), and the
    * VOCABULARY: every token the tokenizer can emit — `specials` first
    * (reserved control tokens: EOS/PAD/separators, never produced by
    * encoding), then (under `byteFallback`) the 256 byte tokens
    * `<0x00>..<0xFF>` ([[graft.functions.ByteTokens]]), then the
    * training corpus's base symbols (distinct code points, unsigned
    * UTF-8 byte order), then the merge products in rank order (first
    * occurrence wins when two entries produce the same string) — with
    * dense ids `0 .. vocab.size-1` by position.
    *
    * `byteFallback` makes encoding TOTAL on any input (the byte-BPE
    * convention): a post-training code point the corpus never saw
    * encodes as its UTF-8 bytes instead of the -1 OOV sentinel, so ids
    * can always feed a training run. `bytesPerTokenCovered` is the
    * compression stat measured over the capped training dictionary
    * (UTF-8 bytes per emitted token, mass-weighted; -1.0 when
    * unmeasured — e.g. a hand-built fixture model or an empty dict;
    * -1.0 rather than NaN so model equality stays reflexive).
    * Models saved before the vocab existed load with `vocab` empty;
    * id-emitting paths refuse them loudly. */
  final case class BpeModel(merges: Seq[(String, String)],
                            coveredMass: Long, totalMass: Long,
                            vocab: Seq[String] = Seq.empty,
                            byteFallback: Boolean = false,
                            specials: Seq[String] = Seq.empty,
                            bytesPerTokenCovered: Double = -1.0)

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
  private[graft] def byteCompare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
  private def byteLt(a: String, b: String): Boolean = byteCompare(a, b) < 0

  // ONE splitter definition with the apply kernel — dictionary symbols
  // and kernel symbols can never drift
  private def cpSplit(word: String): Array[String] =
    graft.functions.CodePoints.split(word)

  /** Apply one merge left-to-right with skip in one word's symbol array:
    * the classic in-word application both trainer loops and (in spirit)
    * the rank-greedy kernel share. Returns the SAME array reference when
    * nothing merged — the no-op signal the incremental loop's stale
    * occurrence entries rely on. */
  private def mergeWord(s: Array[String], l: String, r: String): Array[String] = {
    if (s.length < 2) return s
    val out = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
        out.add(s(i) + s(i + 1)); i += 2
      } else { out.add(s(i)); i += 1 }
    }
    if (out.size() == s.length) s
    else out.toArray(new Array[String](out.size()))
  }

  /** The textbook merge loop — recount every adjacent pair from scratch
    * each iteration, O(dictChars) per merge. Kept as the EXECUTABLE
    * REFERENCE for [[mergeLoop]]: BpeSpec asserts bit-identical merge
    * sequences between the two on random dictionaries, and ScaleDrive
    * pins the incremental loop's production-width prefix against this
    * one. Not the production path (32k merges × 64k words would cost
    * ~10^10 driver ops here). */
  private[graft] def mergeLoopNaive(dict: Array[(String, Long)], nMerges: Int,
                                    minPairCount: Long): Seq[(String, String)] = {
    val syms: Array[Array[String]] = dict.map(w => cpSplit(w._1))
    val cnts: Array[Long] = dict.map(_._2)
    val merges = Seq.newBuilder[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val c = cnts(wi)
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
        var wj = 0
        while (wj < syms.length) {
          syms(wj) = mergeWord(syms(wj), best._1, best._2)
          wj += 1
        }
        iter += 1
      }
    }
    merges.result()
  }

  /** The PRODUCTION merge loop: incremental pair statistics instead of a
    * per-merge full recount. State: live pair → weighted count, pair →
    * word-index occurrence list (append-only, stale-tolerant: a listed
    * word that no longer contains the pair is a cheap no-op on
    * [[mergeWord]]'s same-reference signal), and a lazy-deletion max-heap
    * over (count desc, l, r in unsigned UTF-8 byte order) — every count
    * CHANGE pushes a fresh heap entry, and a popped entry is live iff it
    * still matches the count map, so the first live pop IS the argmax
    * under exactly [[mergeLoopNaive]]'s total order. Per merge, only the
    * words CONTAINING the merged pair are rescanned: their old adjacent
    * pairs are decremented and their new ones incremented, so each word
    * of length L costs O(L) per merge it participates in and a word
    * participates in at most L−1 merges ever — total work
    * O(Σ L² + pushes·log heap) over the WHOLE training run, independent
    * of `nMerges`. A 64k-word dictionary trains a 32k-merge production
    * vocabulary in seconds where the naive loop needs ~10^10 ops
    * (ScaleDrive pins the budget; BpeSpec pins bit-identical output). */
  private[graft] def mergeLoop(dict: Array[(String, Long)], nMerges: Int,
                               minPairCount: Long): Seq[(String, String)] = {
    val nW = dict.length
    val syms = new Array[Array[String]](nW)
    val wcnt = new Array[Long](nW)
    var k = 0
    while (k < nW) { syms(k) = cpSplit(dict(k)._1); wcnt(k) = dict(k)._2; k += 1 }

    // growable int list without boxing: occurrence lists hold word idxs
    final class IntVec {
      var a = new Array[Int](4); var n = 0
      def add(x: Int): Unit = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
        a(n) = x; n += 1
      }
    }
    final class Cand(val l: String, val r: String, val cnt: Long)

    val counts = new java.util.HashMap[(String, String), java.lang.Long]()
    val occ = new java.util.HashMap[(String, String), IntVec]()
    def bump(p: (String, String), d: Long): Unit = {
      val cur = counts.get(p)
      val nv = (if (cur == null) 0L else cur.longValue()) + d
      if (nv <= 0L) counts.remove(p)
      else counts.put(p, java.lang.Long.valueOf(nv))
    }
    // append wi unless it is already the list's LAST element — adds come
    // grouped per word scan, so this dedupes within a scan; rare cross-
    // merge repeats only cost a stale no-op rescan later
    def note(p: (String, String), wi: Int): Unit = {
      var v = occ.get(p)
      if (v == null) { v = new IntVec; occ.put(p, v) }
      if (v.n == 0 || v.a(v.n - 1) != wi) v.add(wi)
    }
    var wi = 0
    while (wi < nW) {
      val s = syms(wi); val c = wcnt(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1)); bump(p, c); note(p, wi); i += 1
      }
      wi += 1
    }
    val ord = new java.util.Comparator[Cand] {
      def compare(x: Cand, y: Cand): Int = {
        if (x.cnt != y.cnt) java.lang.Long.compare(y.cnt, x.cnt)
        else {
          val c = byteCompare(x.l, y.l)
          if (c != 0) c else byteCompare(x.r, y.r)
        }
      }
    }
    val heap = new java.util.PriorityQueue[Cand](math.max(16, counts.size()), ord)
    counts.forEach { (p, c) => heap.add(new Cand(p._1, p._2, c.longValue())) }

    val merges = Seq.newBuilder[(String, String)]
    val touched = new java.util.HashSet[(String, String)]()
    var made = 0
    var exhausted = false
    while (made < nMerges && !exhausted) {
      // drop stale heap entries until the top matches the live count map
      var top: Cand = null
      while (top == null && !heap.isEmpty) {
        val t = heap.peek()
        val cur = counts.get((t.l, t.r))
        if (cur == null || cur.longValue() != t.cnt) heap.poll()
        else top = t
      }
      if (top == null || top.cnt < minPairCount) exhausted = true
      else {
        heap.poll()
        val bl = top.l; val br = top.r
        merges += ((bl, br))
        touched.clear()
        val wlist = occ.remove((bl, br))
        if (wlist != null) {
          var j = 0
          while (j < wlist.n) {
            val w = wlist.a(j)
            val s = syms(w)
            val ns = mergeWord(s, bl, br)
            if (ns ne s) { // stale occurrence entries no-op here
              val c = wcnt(w)
              var i = 0
              while (i < s.length - 1) {
                val p = (s(i), s(i + 1)); bump(p, -c); touched.add(p); i += 1
              }
              i = 0
              while (i < ns.length - 1) {
                val p = (ns(i), ns(i + 1)); bump(p, c); touched.add(p)
                note(p, w); i += 1
              }
              syms(w) = ns
            }
            j += 1
          }
        }
        // re-publish every changed count (lazy deletion invalidates the
        // old entries); the merged pair itself always delta-counts to
        // zero — left-to-right application leaves no (l, r) adjacency —
        // so it never re-enters
        touched.forEach { p =>
          val cur = counts.get(p)
          if (cur != null) heap.add(new Cand(p._1, p._2, cur.longValue()))
        }
        made += 1
      }
    }
    merges.result()
  }

  /** Learn `nMerges` BPE merges from the corpus. The distributed part
    * is ONE [[wordFreqs]] pass (plus a symbol-alphabet `distinct` over
    * the same checkpointed dictionary); the dictionary is capped at
    * `maxWords` (count desc, word asc — deterministic) and collected,
    * then the merge loop runs driver-side over incremental pair
    * statistics ([[mergeLoop]] — only words containing the merged pair
    * are rescanned, so a production 32k-merge vocabulary trains in
    * seconds). Stops early when the best pair's count falls below
    * `minPairCount` (a merge seen once is memorization, not structure —
    * Sennrich's convention). The model carries the [[BpeModel.vocab]]
    * built from the FULL corpus alphabet (not just the capped dict), so
    * encoding the training corpus never yields an out-of-vocabulary
    * base symbol. */
  def learnBpe(df: DataFrame, textCol: String, nMerges: Int,
               maxWords: Int = 1 << 16, minPairCount: Long = 2L,
               byteFallback: Boolean = false,
               specials: Seq[String] = Seq.empty): BpeModel = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val wf = wordFreqs(df, textCol).localCheckpoint(true)
    val totalMass = wf.agg(coalesce(sum(col("cnt")), lit(0L)))
      .head().getLong(0)
    val base = baseSymbols(wf)
    val dict = wf.orderBy(col("cnt").desc, col("word")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // all consumers are done — release the checkpoint's blocks now
    // rather than at session end (a training sweep would otherwise pin
    // one vocabulary-sized cache per call)
    wf.unpersist()
    val coveredMass = dict.map(_._2).sum
    val merges = mergeLoop(dict, nMerges, minPairCount)
    BpeModel(merges, coveredMass, totalMass,
      buildVocab(base, merges, byteFallback, specials),
      byteFallback, specials, bytesPerToken(dict, merges))
  }

  /** Mass-weighted UTF-8 bytes per emitted token over a word dictionary
    * under the learned merges (the capped training dict in [[learnBpe]])
    * — the model-card compression stat: how many corpus bytes one model
    * token carries on the data that trained it. -1.0 on an empty dict. */
  private[graft] def bytesPerToken(dict: Array[(String, Long)],
                                   merges: Seq[(String, String)]): Double = {
    val seg = new graft.functions.BpeSegmenter(
      merges.map(p => Array(p._1, p._2)).toArray)
    var bytes = 0L
    var toks = 0L
    dict.foreach { case (w, c) =>
      bytes += c * w.getBytes("UTF-8").length
      toks += c * seg.segment(w).length
    }
    if (toks == 0L) -1.0 else bytes.toDouble / toks
  }

  /** Deterministic CONTENT fingerprint of a model: SHA-256 over a
    * canonical serialization of (merges, vocab, byteFallback,
    * specials-count), hex. Two saves of the same learned model agree;
    * any behavioral difference — one merge, one vocab entry, the
    * fallback flag — changes it. The ingest stamp keys on THIS, not the
    * save path: retraining over the same path must be refused, and the
    * same model at two paths must be accepted
    * ([[graft.streaming.EventStream]]).
    *
    * The serialization is INJECTIVE by construction: every string is
    * length-prefixed (4-byte big-endian count of its UTF-8 bytes) and
    * each section is count-prefixed, so no token content — tokens may
    * legally contain ANY non-whitespace byte, including control
    * characters — can imitate a framing byte and make two different
    * models serialize identically (the in-band-terminator hazard of a
    * NUL/marker scheme). */
  def fingerprint(model: BpeModel): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def putInt(n: Int): Unit = md.update(Array[Byte](
      (n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte))
    def put(s: String): Unit = {
      val b = s.getBytes("UTF-8"); putInt(b.length); md.update(b)
    }
    putInt(model.merges.length)
    model.merges.foreach { case (l, r) => put(l); put(r) }
    putInt(model.vocab.length)
    model.vocab.foreach(put)
    md.update(if (model.byteFallback) 1.toByte else 0.toByte)
    putInt(model.specials.length)
    md.digest().map(b => f"$b%02x").mkString
  }

  /** The PRE-r14 fingerprint scheme (NUL-terminated strings, section
    * marker bytes) — kept VERBATIM so artifacts persisted under it keep
    * verifying: [[loadBpeModel]] and the ingest stamp accept a legacy
    * fingerprint that matches the loaded content (then re-stamp under
    * the current scheme where they own the stamp), instead of
    * mislabeling every old save as a torn overwrite. Never used for
    * NEW fingerprints: the scheme is not injective (a token containing
    * a NUL byte can imitate the terminator), which is why it was
    * replaced. */
  private[graft] def fingerprintLegacy(model: BpeModel): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def put(s: String): Unit = {
      md.update(s.getBytes("UTF-8")); md.update(0.toByte)
    }
    model.merges.foreach { case (l, r) => put(l); put(r) }
    md.update(1.toByte)
    model.vocab.foreach(put)
    md.update(if (model.byteFallback) 2.toByte else 3.toByte)
    put(model.specials.length.toString)
    md.digest().map(b => f"$b%02x").mkString
  }

  /** The corpus's base-symbol alphabet: distinct code points across the
    * word dictionary, collected (intrinsically bounded — Unicode itself
    * has ~1.1M code points; real corpora have thousands) and sorted in
    * unsigned UTF-8 byte order — the collation Spark's `orderBy` and
    * DuckDB's default share, so a SQL oracle reproduces the order
    * exactly. */
  private[graft] def baseSymbols(wf: DataFrame): Array[String] = {
    val syms = wf
      .select(explode(transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("sym"))
      .distinct().collect().map(_.getString(0))
    syms.sortWith(byteLt)
  }

  /** Deterministic vocabulary: `specials` in their given order, then
    * (under `byteFallback`) the 256 byte tokens in byte order, then
    * base symbols (byte order), then merge products in rank order —
    * first occurrence winning the id when two entries produce the same
    * string ((a,bc) and (ab,c) both yield "abc"); a merge product can
    * never collide with a base symbol (one code point vs at least
    * two), and byte tokens can never collide with base symbols (six
    * code points vs one). Position = dense token id.
    *
    * The RESERVED byte-token block is EXCLUDED from that dedup: a merge
    * product that literally spells a byte-token form (the 6 characters
    * `<0x09>` — reachable only for digit-only hex, encoding lowercases
    * everything else) gets its OWN id after the block instead of being
    * folded onto the reserved id, so literal spellings round-trip
    * through encode→decode verbatim while the reserved ids stay
    * exclusively byte-fallback ([[graft.functions.TokenIds]] maps the
    * string to the literal id; [[decodeTextCol]] reassembles bytes by
    * ID, not by spelling). A SPECIAL spelling a byte-token form is
    * refused — it would sit before the block and shadow the reserved
    * id itself. */
  def buildVocab(base: Seq[String], merges: Seq[(String, String)],
                 byteFallback: Boolean = false,
                 specials: Seq[String] = Seq.empty): Vector[String] = {
    require(specials.forall(s => s != null && s.nonEmpty) &&
      specials.distinct.length == specials.length,
      "specials must be distinct non-empty tokens")
    val out = Vector.newBuilder[String]
    // dedup set for specials/base/merges — reserved byte tokens are
    // emitted but NOT entered, so a literal spelling still gets an id
    val seen = scala.collection.mutable.HashSet[String]()
    specials.foreach { t => seen += t; out += t }
    if (byteFallback) {
      val bt = graft.functions.ByteTokens.all
      require(!specials.exists(bt.toSet.contains),
        "a special token must not spell a reserved byte-token form " +
          "(<0xNN>) — it would shadow the reserved id")
      bt.foreach(out += _)
    }
    base.distinct.sortWith(byteLt)
      .foreach(t => if (!seen.contains(t)) { seen += t; out += t })
    merges.foreach { case (l, r) =>
      val t = l + r; if (!seen.contains(t)) { seen += t; out += t }
    }
    out.result()
  }

  /** The (token_id, token) vocabulary TABLE for a fixed merge table over
    * `df`'s corpus — [[buildVocab]] on the corpus alphabet, as a
    * DataFrame (the oracle-gated surface: a SQL engine reproduces it
    * from the same corpus and merge literal). */
  def vocabTable(spark: SparkSession, df: DataFrame, textCol: String,
                 merges: Seq[(String, String)],
                 byteFallback: Boolean = false,
                 specials: Seq[String] = Seq.empty): DataFrame = {
    import spark.implicits._
    buildVocab(baseSymbols(wordFreqs(df, textCol)).toSeq, merges,
        byteFallback, specials).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("token_id", "token")
  }

  /** The MODEL CARD as a one-row DataFrame — the summary stats a 100-TB
    * operator asks of any stored artifact before trusting it: size
    * dials (merge count, vocab size, alphabet size = single-code-point
    * entries outside the specials prefix), training mass
    * (covered/total + their ratio), measured compression
    * (bytes/token over the covered dictionary), the fallback/specials
    * flags, and the content [[fingerprint]]. Pure function of the
    * model, queryable beside `merges`/`vocab` in any engine. */
  def modelCard(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    val alphabet = model.vocab.drop(model.specials.length)
      .count(t => t.codePointCount(0, t.length) == 1)
    Seq((model.merges.length.toLong, model.vocab.length.toLong,
        alphabet.toLong, model.coveredMass, model.totalMass,
        if (model.totalMass == 0L) -1.0
        else model.coveredMass.toDouble / model.totalMass,
        model.bytesPerTokenCovered, model.byteFallback,
        model.specials.length.toLong, fingerprint(model)))
      .toDF("n_merges", "vocab_size", "alphabet_size", "covered_mass",
        "total_mass", "covered_frac", "bytes_per_token_covered",
        "byte_fallback", "n_specials", "fingerprint")
  }

  /** Persist a model: merge-table parquet at `path/merges` (`(rank, l,
    * r)` plus the constant mass columns, rank = -1 sentinel row
    * carrying the stats so a legitimately EMPTY model round-trips),
    * the vocabulary at `path/vocab` (`(token_id, token)`), and the
    * [[modelCard]] at `path/card` — the saved-model discipline of
    * [[Classifier.saveNaiveBayes]], split so the id mapping and the
    * card are first-class queryable tables (join a token column, or
    * audit the fingerprint, in ANY engine). */
  def saveBpeModel(spark: SparkSession, model: BpeModel, path: String): Unit = {
    // driver-direct writes (MetaIO): merges/vocab/card are driver-local
    // Seqs already — the old coalesce(1) writes paid three Spark jobs to
    // serialize rows the driver was holding
    val conf = spark.sparkContext.hadoopConfiguration
    graft.store.MetaIO.writeRows(conf, s"$path/merges",
      Seq("rank" -> 0L, "l" -> "", "r" -> "",
        "covered_mass" -> 0L, "total_mass" -> 0L),
      (Seq[Seq[Any]](Seq(-1L, null, null, model.coveredMass, model.totalMass)) ++
        model.merges.zipWithIndex.map { case ((l, r), i) =>
          Seq[Any](i.toLong, l, r, model.coveredMass, model.totalMass) }).iterator)
    graft.store.MetaIO.writeRows(conf, s"$path/vocab",
      Seq("token_id" -> 0L, "token" -> ""),
      model.vocab.zipWithIndex.iterator.map { case (t, i) => Seq[Any](i.toLong, t) })
    val card = modelCard(spark, model).collect().head
    graft.store.MetaIO.writeRow(conf, s"$path/card",
      card.schema.fields.map(_.name).zip(card.toSeq).toSeq)
  }

  /** Read a persisted model back, merges in rank order, vocab in id
    * order, flags/stats from the card — and VERIFY the card's
    * fingerprint against the loaded content (a mismatch means the
    * model tree was partially overwritten: merges from one save, vocab
    * or card from another — exactly the torn state a later
    * mode-overwrite re-save can leave, refused loudly here). Pre-card
    * models load with default flags and an unmeasured (-1.0) compression stat;
    * pre-vocab models (a single parquet directly at `path`) load with
    * an empty vocab and [[encodeIdsCol]] refuses them loudly. */
  def loadBpeModel(spark: SparkSession, path: String): BpeModel = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    val v2 = fs.exists(new org.apache.hadoop.fs.Path(s"$path/merges"))
    // driver-direct reads (MetaIO): the model is collected whole anyway
    val rows = graft.store.MetaIO
      .readRows(conf, if (v2) s"$path/merges" else path)
      .sortBy(m => m("rank").asInstanceOf[Long])
    require(rows.nonEmpty && rows.head("rank") == -1L,
      s"loadBpeModel: $path is not a saved BPE model (no sentinel row)")
    val vocab =
      if (v2) graft.store.MetaIO.readRows(conf, s"$path/vocab")
        .sortBy(m => m("token_id").asInstanceOf[Long])
        .map(m => m("token").asInstanceOf[String])
      else Seq.empty[String]
    val hasCard =
      v2 && fs.exists(new org.apache.hadoop.fs.Path(s"$path/card"))
    val (fb, nSpecials, bpt, cardFp) =
      if (hasCard) {
        val c = graft.store.MetaIO.readRow(conf, s"$path/card")
          .getOrElse(throw new IllegalStateException(
            s"loadBpeModel: unreadable card at $path/card"))
        (c("byte_fallback").asInstanceOf[Boolean],
          c("n_specials").asInstanceOf[Long].toInt,
          c("bytes_per_token_covered").asInstanceOf[Double],
          Some(c("fingerprint").asInstanceOf[String]))
      } else (false, 0, -1.0, None)
    val model = BpeModel(
      rows.tail.map(m => (m("l").asInstanceOf[String],
        m("r").asInstanceOf[String])).toSeq,
      rows.head("covered_mass").asInstanceOf[Long],
      rows.head("total_mass").asInstanceOf[Long], vocab,
      fb, vocab.take(nSpecials), bpt)
    // a card stamped under the PRE-r14 fingerprint scheme is a sound
    // save, not a torn one — accept it (content still verifies, just
    // under the old serialization); only a card matching NEITHER scheme
    // is real damage
    cardFp.foreach(f => require(
      f == fingerprint(model) || f == fingerprintLegacy(model),
      s"loadBpeModel: $path is TORN — the card's fingerprint matches " +
        "neither the current nor the legacy fingerprint scheme of the " +
        "merges+vocab on disk (partial overwrite of the model tree); " +
        "re-save the model. (A card from an old save that merely " +
        "predates the r14 length-prefixed scheme would have verified " +
        "against the legacy scheme and loaded fine.)"))
    model
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

  /** Dense token-ID column for `textCol` under a model: the
    * [[encodeCol]] kernel composed with the [[graft.functions.TokenIds]]
    * id-mapping kernel — still one narrow codegen'd projection, no
    * shuffle, no lookup join (the vocab rides the serialized expression;
    * 32k merges ≈ a few hundred KB). Tokens outside the vocabulary map
    * to -1 (possible only on post-training data with base symbols the
    * training corpus never saw — the vocab covers the FULL training
    * alphabet). Refuses a legacy model with no vocab. */
  def encodeIdsCol(textCol: Column, model: BpeModel): Column = {
    require(model.vocab.nonEmpty,
      "encodeIdsCol needs a model with a vocabulary — re-learn or re-save " +
        "(pre-vocab saved models load with vocab empty)")
    graft.functions.native.token_ids(
      encodeCol(textCol, model.merges), model.vocab, model.byteFallback)
  }

  /** `(idCol, token_ids)` — the corpus as `array<long>` model tokens,
    * ready for token-budget ops (pack / chunk / count by ACTUAL
    * tokenizer tokens, not whitespace ones). */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
                model: BpeModel): DataFrame =
    df.select(col(idCol), encodeIdsCol(col(textCol), model).as("token_ids"))

  /** Inverse of [[encodeIdsCol]]: dense ids back to their token strings
    * through the model's vocabulary — pure Spark built-ins (`get` is
    * 0-based and null-safe, so the kernel's −1 OOV sentinel and any
    * out-of-range id decode to NULL instead of throwing under ANSI).
    * Composing `decodeIdsCol(encodeIdsCol(text))` reproduces
    * [[encodeCol]]'s token array exactly (the training corpus has no
    * OOV by construction — the vocab carries its full alphabet). */
  def decodeIdsCol(idsCol: Column, model: BpeModel): Column = {
    require(model.vocab.nonEmpty,
      "decodeIdsCol needs a model with a vocabulary — re-learn or re-save " +
        "(pre-vocab saved models load with vocab empty)")
    val v = typedLit(model.vocab)
    // range-gate BEFORE the long→int cast: an id past Int range (corrupt
    // ids column) must decode to NULL like any other out-of-range id,
    // not throw CAST_OVERFLOW under ANSI; when() without otherwise
    // yields a NULL index, and get(v, NULL) is NULL
    val hi = lit(model.vocab.size.toLong - 1L)
    transform(idsCol, i => get(v, when(i.between(lit(0L), hi), i).cast("int")))
  }

  /** `(idCol, tokens)` — token-id rows decoded back to subword strings
    * (inspection / detokenization-debug surface; ids outside the vocab
    * decode to NULL elements). */
  def decodeIds(df: DataFrame, idCol: String, idsCol: String,
                model: BpeModel): DataFrame =
    df.select(col(idCol), decodeIdsCol(col(idsCol), model).as("tokens"))

  /** Detokenization: ids back to TEXT — [[decodeIdsCol]]'s token
    * strings concatenated, with byte-fallback runs REASSEMBLED into the
    * characters they spell (each `<0xNN>` token contributes its raw
    * byte; everything is concatenated at the byte level and decoded as
    * UTF-8), so under a fallback model
    * `decodeTextCol(encodeIdsCol(text))` recovers exactly the
    * concatenation of the text's lowercased whitespace words — on ANY
    * input, seen script or not. Non-fallback models concatenate tokens
    * verbatim (no reserved byte forms to reassemble). An id outside the
    * vocab decodes to a NULL token and nulls the whole output — a
    * corrupt ids row is a loud NULL, not a silently patched string.
    * Pure built-ins (aggregate over UTF-8 byte pieces), one narrow
    * projection.
    *
    * Byte reassembly keys on the reserved ID BLOCK, not the token's
    * spelling: corpus text that LITERALLY spells a byte-token form
    * (the 6 characters `<0x09>` — reachable only for digit-only hex,
    * encoding lowercases everything else) carries its own literal id
    * ([[buildVocab]] excludes the reserved block from dedup), so it
    * decodes back to the 6 characters verbatim while the reserved ids
    * — reachable only through byte-fallback expansion — reassemble to
    * their raw bytes. A spelling-keyed decode (match `<0xNN>` by
    * regex) would collapse both onto the control byte. */
  def decodeTextCol(idsCol: Column, model: BpeModel): Column = {
    require(model.vocab.nonEmpty,
      "decodeTextCol needs a model with a vocabulary — re-learn or " +
        "re-save (pre-vocab saved models load with vocab empty)")
    val v = typedLit(model.vocab)
    val hi = lit(model.vocab.size.toLong - 1L)
    // functions.encode, NOT Bpe.encode — this object shadows the name;
    // an out-of-range id yields a NULL token, whose NULL bytes null the
    // whole concat — a corrupt ids row is a loud NULL (decodeIdsCol's
    // range gate, same cast discipline)
    val utf8 = (i: Column) => org.apache.spark.sql.functions.encode(
      get(v, when(i.between(lit(0L), hi), i).cast("int")), "UTF-8")
    val piece: Column => Column =
      if (!model.byteFallback) utf8
      else {
        val lo = byteBlockStart(model.vocab)
        // raw one-byte pieces indexed by byte value — exact bytes, no
        // hex round-trip
        val raw = typedLit((0 until 256).map(b => Array(b.toByte)))
        i => when(i.between(lit(lo.toLong), lit(lo + 255L)),
          get(raw, (i - lo.toLong).cast("int"))).otherwise(utf8(i))
      }
    decode(aggregate(idsCol, lit(Array.empty[Byte]),
      (acc, i) => concat(acc, piece(i))), "UTF-8")
  }

  /** First vocab position of the reserved byte-token block, verified
    * CONTIGUOUS in byte order — [[buildVocab]] lays it out right after
    * the specials, and decode's id-range gate depends on that shape.
    * `indexOf` takes the FIRST occurrence, so a literal byte-token
    * spelling later in the vocab never shifts the block. */
  private def byteBlockStart(vocab: Seq[String]): Int = {
    val lo = vocab.indexOf(graft.functions.ByteTokens.token(0))
    require(lo >= 0 && (0 until 256).forall(b =>
      lo + b < vocab.size &&
        vocab(lo + b) == graft.functions.ByteTokens.token(b)),
      "byteFallback model must carry the 256 reserved byte tokens as a " +
        "contiguous block (<0x00>..<0xFF> in byte order) — rebuild the " +
        "vocabulary with buildVocab")
    lo
  }

  /** Greedy word-boundary chunking with the window budget measured in
    * MODEL tokens ([[graft.functions.BpeChunk]]) — the RAG/context-
    * window prep step in actual tokenizer tokens, where
    * [[TextStats.chunk]] budgets in whitespace words. Words pack left
    * to right; a word that would overflow the budget starts the next
    * chunk; a single word costing more than the whole budget gets a
    * chunk of itself (words never split across chunks). NULL text ≡
    * empty text — one empty chunk ([[TextStats.chunk]]'s convention).
    * Output: one row per chunk — (`idCol`, `chunk_id` 0-based,
    * `chunk_text` [the model's lowercased-word rendering, single-space
    * joined], `n_tokens` [the chunk's EXACT model-token count]).
    *
    * `sepCost` reserves that many tokens of every chunk's budget for
    * the special tokens a shard writer appends per SEQUENCE (EOS, a
    * document separator — reserve their ids via [[BpeModel.specials]]):
    * content packs against `budget - sepCost`, so `n_tokens + sepCost
    * <= budget` always holds and downstream separator-appending never
    * overflows a context window. `n_tokens` stays the CONTENT count
    * (what the chunk's text encodes to) — the separator cost is the
    * writer's, not the text's.
    *
    * Scale shape: one narrow kernel projection + generate — the word
    * segmentations, budget walk, and chunk assembly all happen inside
    * the row, so there is no shuffle at any corpus size (contrast a
    * per-word explode → running-sum window → re-aggregate formulation,
    * which would shuffle the full corpus TWICE on document id). */
  def chunkByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                         merges: Seq[(String, String)],
                         budget: Long, sepCost: Long = 0L): DataFrame = {
    require(sepCost >= 0L && sepCost < budget,
      s"need 0 <= sepCost < budget (a chunk must have room for content " +
        s"after the reserved separators), got (budget=$budget, sepCost=$sepCost)")
    val chunks = graft.functions.native.bpe_chunk(
      TextStats.tokens(coalesce(col(textCol), lit(""))), merges,
      budget - sepCost)
    df.select(col(idCol), posexplode(chunks))
      .select(col(idCol), col("pos").cast(LongType).as("chunk_id"),
        col("col.chunk_text").as("chunk_text"),
        col("col.n_tokens").as("n_tokens"))
  }
}
