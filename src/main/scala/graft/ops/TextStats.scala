package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality scoring, language-ID, fingerprinting. Everything is
 * pure Catalyst expressions (whole-stage codegen, no UDFs, no shuffle —
 * embarrassingly parallel over documents), so the same pipeline runs
 * unchanged over 100 TB of documents: per-row work only.
 *
 * Cross-engine determinism: hashes are derived from md5 hex (portable to
 * any SQL engine) rather than engine-private hash functions.
 */
object TextStats {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** BPE-ish token count: runs of letters, runs of digits, runs of other
    * non-space symbols — the classic pre-tokenizer shape. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))).cast(LongType)

  /** Portable 60-bit hash: the top 15 hex digits of md5, parsed base-16.
    * Identical in any engine with md5 (DuckDB: `('0x'||substr(md5(s),1,15))::BIGINT`).
    * Production path is the native digest-bytes kernel — no hex-string
    * materialization per shingle; [[hash60Spec]] keeps the built-ins-only
    * formulation as the executable specification it is tested against. */
  def hash60(s: Column): Column = graft.functions.native.hash60(s)

  private[graft] def hash60Spec(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** Tiny deterministic stopword lists per language (language-ID votes). */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "los", "y", "que", "es", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "pas", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t))).cast(LongType)

  /** n-gram-free heuristic language-ID: per-language stopword votes,
    * argmax with fixed precedence (en, de, es, fr, zh) on ties. */
  def langId(text: Column): Column = {
    // one token-array pass for all five vote counts (native kernel);
    // the old per-language size(filter(...)) counts were duplicated
    // across every argmax branch (when-chains defeat subexpression
    // elimination), re-scanning the tokens up to ~25× per document.
    // LangVotesSpec pins the kernel's lists == Stopwords and the votes
    // == the filter counts.
    val c: Map[String, Column] = {
      val votes = graft.functions.native.lang_votes(tokens(text))
      Seq("en", "de", "es", "fr", "zh").map(l => l -> votes.getField(l)).toMap
    }
    val order = Seq("en", "de", "es", "fr", "zh")
    order.foldRight(lit("unk")) { (l, alt) =>
      val ge = order.filter(_ != l).map(o => c(l) >= c(o)).reduce(_ && _)
      when(c(l) > 0 && ge, lit(l)).otherwise(alt)
    }
  }

  /** Per-document quality features + a deterministic composite score. */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nChars = length(text).cast(LongType)
    val nTokens = size(toks).cast(LongType)
    // one zero-allocation pass for all three class counts (native
    // kernel; the common subexpression is eliminated in codegen) —
    // value-identical to the three length(regexp_replace(...)) passes,
    // which each built a stripped copy of the document per class
    val cc = graft.functions.native.char_class_counts(text)
    val nNoSpace = nChars - cc.getField("n_ws")
    val punct = cc.getField("n_punct")
    val digits = cc.getField("n_digit")
    val stops = stopCount(toks, Stopwords("en"))
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len", nNoSpace.cast(DoubleType) / nTokens.cast(DoubleType))
      .withColumn("punct_ratio", punct.cast(DoubleType) / nChars.cast(DoubleType))
      .withColumn("digit_ratio", digits.cast(DoubleType) / nChars.cast(DoubleType))
      .withColumn("stopword_ratio", stops.cast(DoubleType) / nTokens.cast(DoubleType))
      .withColumn("quality_score",
        least(lit(1.0), nTokens.cast(DoubleType) / lit(200.0)) * lit(0.5)
          + col("stopword_ratio") * lit(2.0)
          - col("punct_ratio") * lit(0.5))
  }

  /** Content fingerprints: exact (md5) + length. The near-dup fingerprints
    * (minhash/simhash) live in [[Dedup]]. */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("md5", md5(col(textCol)))
      .withColumn("h60", hash60(col(textCol)))
      .withColumn("n_chars", length(col(textCol)).cast(LongType))

  /** n-gram repetition stats — the classic repetitive-document quality
    * filter: documents whose most frequent word n-gram covers a large
    * fraction of all n-gram positions are boilerplate/spam-shaped.
    * Pure per-row native kernel (no shuffle): `n_grams` = n-gram
    * positions, `max_rep` = max multiplicity of any single n-gram.
    * Integer outputs only, so the oracle is engine-exact; threshold on
    * `max_rep / n_grams` at the call site. */
  def repetition(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // NULL text ≡ empty text (one empty window, max_rep 1) — matching
    // the oracle, where greatest(NULL, 1) already lands on 1; without
    // the coalesce the kernel null-propagates and the gate would split
    val toks = tokens(coalesce(col(textCol), lit("")))
    df.select(col(idCol),
      greatest(size(toks) - (n - 1), lit(1)).cast(LongType).as("n_grams"),
      graft.functions.native.max_shingle_run(toks, n).as("max_rep"))
  }

  /** Per-group distribution profile — the data-quality dashboard
    * primitive: count, min, max, and DISCRETE percentiles (the value at
    * rank `ceil(p*n)`, 1-based) of `valueCol` within each `groupCol`.
    * Rank-based selection instead of interpolated `percentile`: the
    * picked value is an actual element, so the result is engine-exact
    * (interpolation arithmetic is not guaranteed identical across
    * engines), mirroring how the KMV oracle selects h_k.
    *
    * Scale shape: ONE hash shuffle on the group; the rank and the group
    * size come from the same window pass and the final aggregate is
    * map-side-combining conditional maxes. Groups are the parallelism
    * unit — profile by (source, split), not one global group. */
  def profile(df: DataFrame, groupCol: String, valueCol: String,
              percentiles: Seq[Double] = Seq(0.25, 0.5, 0.9)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0.0 && p <= 1.0),
      "percentiles must be in (0, 1]")
    // duplicates would emit two identically-named output columns,
    // making any later select-by-name ambiguous
    require(percentiles.distinct.size == percentiles.size,
      "percentiles must be distinct")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(valueCol)
    val grp = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    // NULL values are excluded up front: Spark windows order NULLS FIRST
    // while most SQL engines default NULLS LAST, so a null entering the
    // rank silently shifts every percentile cross-engine
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(grp))
    val pCols = percentiles.map { p =>
      // the rank multiply is EXACT DECIMAL, not double: double 0.07*100
      // is 7.000000000000001 and ceil lands on the wrong rank, while a
      // SQL oracle's decimal literal multiplies exactly. The label also
      // derives from the exact decimal so p=0.125 is "p12_5", never a
      // rounded collision with p13.
      val bd = BigDecimal(p.toString)
      val label = "p" + (bd * 100).bigDecimal.stripTrailingZeros
        .toPlainString.replace('.', '_')
      max(when(col("_rn") === ceil(lit(bd) * col("_n")), col(valueCol)))
        .as(label)
    }
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        (min(col(valueCol)).as("min") +: max(col(valueCol)).as("max") +: pCols): _*)
  }

  /** Whitespace normalization — the canonicalization step that runs
    * before hashing/dedup so formatting noise doesn't defeat exact
    * matching: runs of spaces/tabs collapse to one space, spaces around
    * newlines are dropped, 3+ consecutive newlines collapse to 2 (one
    * blank line), and the result is trimmed. NULL passes through as
    * NULL. Pure per-row regexp chain (codegen, no shuffle); patterns
    * are Java/RE2-parity-safe so the normalized text is oracle-exact. */
  def normalizeWhitespace(text: Column): Column = {
    val collapsed = regexp_replace(text, "[ \\t]+", " ")
    val edges = regexp_replace(collapsed, " ?\\n ?", "\n")
    trim(regexp_replace(edges, "\\n{3,}", "\n\n"))
  }

  /** PII / pattern scrubbing — the redaction pass of a training-data
    * pipeline: emails, bare URLs, and long digit runs (phone numbers,
    * account ids) are replaced with fixed placeholder tokens, and the
    * match counts are emitted for filtering/auditing. Application order
    * matters and is fixed: emails first (they contain dots and digits),
    * then URLs, then 7+-digit runs.
    *
    * Pure per-row `regexp_replace`/`regexp_extract_all` chain — codegen,
    * no shuffle, embarrassingly parallel. The patterns are plain
    * character-class regexes chosen to parse and match identically under
    * Java regex and RE2-family engines (no lookarounds, no backrefs), so
    * the redacted text itself is oracle-gated, not just the counts. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // \r in the terminator set: a URL ending a CRLF line must not swallow
  // the carriage return into the redaction
  val UrlRe = "https?://[^ \\t\\r\\n]+"
  val LongNumRe = "[0-9]{7,}"

  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, UrlRe, "<URL>")
    val t3 = regexp_replace(t2, LongNumRe, "<NUM>")
    df.select(col(idCol),
      size(regexp_extract_all(t0, lit(EmailRe), lit(0))).cast(LongType).as("n_emails"),
      size(regexp_extract_all(t1, lit(UrlRe), lit(0))).cast(LongType).as("n_urls"),
      size(regexp_extract_all(t2, lit(LongNumRe), lit(0))).cast(LongType).as("n_longnums"),
      t3.as("text_clean"))
  }

  /** Per-(document, token) term statistics + TF-IDF — the classic
    * term-weighting table (keyword extraction, tokenizer diagnostics,
    * relevance features). Output: one row per distinct (doc, token) —
    * `tf` (occurrences in the doc), `df` (documents containing the
    * token), `n_docs`, and `tfidf = tf * (ln((n_docs+1)/(df+1)) + 1)`
    * (smoothed, sklearn-style).
    *
    * Scale shape: explode → ONE (doc, token) hash aggregate with
    * map-side partials (heavy tokens collapse before the exchange);
    * doc-freq re-aggregates the already-distinct (doc, token) pairs —
    * narrow rows, not raw tokens; the tf⋈df join shuffles on the token
    * and the vocab-sized df side broadcasts under AQE. `n_docs` is one
    * scalar count. The integer columns are engine-exact; the ln-based
    * score is libm-dependent, so cross-engine gates compare the integer
    * columns (x_tfidf does). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // n_docs joins in as a broadcast one-row aggregate — an eager
    // df.count() here would scan the input a second time and submit a
    // job at plan-construction time
    val nDocs = broadcast(df.agg(count(lit(1)).as("n_docs")))
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token").crossJoin(nDocs)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("n_docs"),
        (col("tf").cast(DoubleType) *
          (log((col("n_docs") + 1).cast(DoubleType) / (col("df") + 1).cast(DoubleType))
            + lit(1.0))).as("tfidf"))
  }

  /** Overlapping fixed-window CHUNKING — the embedding/RAG prep step:
    * each document becomes consecutive windows of `chunkTokens`
    * whitespace tokens, adjacent windows sharing `overlap` tokens, the
    * final window clamped to the document end (so every token is in at
    * least one chunk and every chunk keeps more than `overlap` tokens).
    * Output: one row per chunk — (`idCol`, `chunk_id` 0-based,
    * `chunk_text`, `n_tokens`). A document shorter than one window
    * yields exactly one chunk of itself.
    *
    * Scale shape: pure per-row generation — no shuffle, no state; the
    * token split is LET-BOUND through a one-element-array `transform`
    * so it evaluates once per DOCUMENT. Referencing `tokens(text)`
    * directly from the window lambdas would re-split the document once
    * per chunk (HOF bodies re-evaluate free expressions per element —
    * the same trap the MinHash path documents; measured 50× on long
    * documents, turning the linear op quadratic). As a lambda VARIABLE
    * the array is computed once and shared by every window.
    * NULL text ≡ empty text (one empty chunk), mirroring
    * [[repetition]]'s oracle-parity convention. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens > 0 and 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(coalesce(col(textCol), lit("")))
    val chunks = element_at(transform(array(toks), tk => transform(
      sequence(lit(1), greatest(size(tk) - overlap, lit(1)), lit(stride)),
      s => struct(
        concat_ws(" ", slice(tk, s, lit(chunkTokens))).as("text"),
        least(size(tk) - s + 1, lit(chunkTokens)).cast(LongType).as("n")))), 1)
    df.select(col(idCol), posexplode(chunks))
      .select(col(idCol), col("pos").cast(LongType).as("chunk_id"),
        col("col.text").as("chunk_text"), col("col.n").as("n_tokens"))
  }

  /** Unigram language-model scoring — the KenLM-style perplexity
    * signal at unigram order: each document's mean log-probability
    * under the corpus's own add-one-smoothed unigram model,
    *
    *   p(t) = (c(t) + 1) / (T + V)      (T = corpus tokens, V = vocab)
    *   lm_score(d) = Σ_t tf(d,t)·ln p(t) / len(d)
    *
    * More negative = rarer vocabulary; boilerplate and common-word spam
    * score high (close to 0), gibberish scores low — the standard cheap
    * quality-filter axis next to [[quality]]'s surface ratios. Output:
    * one row per INPUT document (`idCol`, `n_tokens`, `lm_score`);
    * tokenless documents (null/empty text) keep `n_tokens` 0 and a null
    * score.
    *
    * Scale shape: one (id, token) aggregation with map-side partial
    * combine (token counts collapse before the exchange), one token-
    * keyed join of postings against the vocabulary (skew AQE-splittable
    * — both sides are pre-aggregated, so no hot-row explosion), and the
    * (T, V) totals ride a broadcast one-row aggregate, never a driver
    * action. Per-term values cast to exact DECIMAL before the per-doc
    * sum: decimal addition is associative, so the score is independent
    * of aggregation order (a raw double sum would wobble at the last
    * ulp between partitionings — enough to flip a rounded 6th decimal).
    * The final divide happens in DOUBLE on exact inputs: IEEE division
    * is correctly rounded, so any engine computes the identical bits. */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("token").agg(sum(col("tf")).as("c"))
    val totals = broadcast(vocab.agg(
      coalesce(sum(col("c")), lit(0L)).as("t_total"),
      count(lit(1)).as("v_size")))
    val lnP = log((col("c") + lit(1L)).cast(DoubleType) /
      (col("t_total") + col("v_size")).cast(DoubleType))
    val scored = tf.join(vocab, "token").crossJoin(totals)
      .select(col(idCol), col("tf"),
        (col("tf").cast(DoubleType) * lnP).cast(DecimalType(28, 12)).as("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("len"),
        (sum(col("term")).cast(DoubleType) / sum(col("tf"))).as("lm_score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("len"), lit(0L)).as("n_tokens"),
        col("lm_score"))
  }

  /** Per-document Shannon token entropy — the lexical-diversity quality
    * axis: `H(d) = −Σ_t (tf/n)·ln(tf/n) = ln(n) − (Σ_t tf·ln tf)/n`
    * over the document's own token distribution. Low entropy flags
    * repetitive spam (keyword stuffing, generated boilerplate) that
    * length/punctuation ratios miss; maximal entropy (`ln n`) means
    * every token distinct. Output: one row per input document
    * (`idCol`, `n_tokens`, `entropy`); tokenless documents keep
    * `n_tokens` 0 and a null entropy.
    *
    * Scale shape: ONE (id, token) aggregation with map-side combine
    * then a per-id rollup — no joins, nothing corpus-wide (the model
    * is each document itself). The `tf·ln tf` terms go through the
    * exact-DECIMAL sum ([[lmScore]] discipline) so aggregation order
    * cannot wobble the rounded value; the closing `ln(n) − s/n` runs
    * in correctly-rounded double arithmetic, identical in any engine. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n"),
        sum((col("tf").cast(DoubleType) * log(col("tf").cast(DoubleType)))
          .cast(DecimalType(28, 12))).as("s"))
      .select(col(idCol), col("n"),
        (log(col("n").cast(DoubleType)) -
          col("s").cast(DoubleType) / col("n").cast(DoubleType)).as("entropy"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n"), lit(0L)).as("n_tokens"),
        col("entropy"))
  }

  /** Bigram conditional LM score — the second-order sibling of
    * [[lmScore]]: mean add-one-smoothed log conditional probability of
    * each token given its predecessor, under the corpus's own bigram
    * model:
    *
    *   p(w | v)       = (c(v,w) + 1) / (c(v) + V)
    *   lm2_score(d)   = Σ_(v,w) tf_d(v,w)·ln p(w|v) / Σ tf_d
    *
    * where `c(v,w)` is the corpus bigram count, `c(v)` the unigram
    * count of the context, and `V` the unigram vocabulary size. A
    * bigram LM separates shuffled-word salad from fluent text where
    * the unigram score cannot (same words, same unigram product), at
    * one corpus pass more. Empty tokens are dropped BEFORE pairing, so
    * runs of whitespace never bridge a gap. Output: one row per input
    * document (`idCol`, `n_bigrams`, `lm2_score`); documents with
    * fewer than two tokens keep `n_bigrams` 0 and a null score.
    *
    * Scale shape: the pair stream aggregates per (doc, v, w) with
    * map-side combine; the bigram and unigram models are pre-aggregated
    * before their joins (AQE-splittable, no hot-row explosion), totals
    * ride a broadcast one-row aggregate, and the per-term products go
    * through the exact-DECIMAL sum discipline of [[lmScore]] so
    * aggregation order cannot wobble the rounded score. */
  def lmScoreBigram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    // sequence(1, 0) would generate DESCENDING [1, 0] and index 0 is an
    // error — short docs get an explicit empty index array instead
    val idxs = when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
      .otherwise(array().cast("array<int>"))
    val pairs = df.select(col(idCol), explode(transform(idxs,
        i => struct(element_at(toks, i).as("v"), element_at(toks, i + 1).as("w"))))
        .as("bg"))
      .select(col(idCol), col("bg.v").as("v"), col("bg.w").as("w"))
    val dtf = pairs.groupBy(col(idCol), col("v"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val bgModel = dtf.groupBy("v", "w").agg(sum(col("tf")).as("c_bg"))
    val ugModel = df.select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c_ug"))
    val totals = broadcast(ugModel.agg(count(lit(1)).as("v_size")))
    val lnP = log((col("c_bg") + lit(1L)).cast(DoubleType) /
      (col("c_ug") + col("v_size")).cast(DoubleType))
    val scored = dtf
      .join(bgModel, Seq("v", "w"))
      .join(ugModel.withColumnRenamed("t", "v"), "v")
      .crossJoin(totals)
      .select(col(idCol), col("tf"),
        (col("tf").cast(DoubleType) * lnP).cast(DecimalType(28, 12)).as("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n"),
        (sum(col("term")).cast(DoubleType) / sum(col("tf"))).as("lm2_score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n"), lit(0L)).as("n_bigrams"),
        col("lm2_score"))
  }

  /** Trigram conditional LM score — the third-order member of the
    * [[lmScore]] family: mean add-one-smoothed log conditional
    * probability of each token given its two predecessors, under the
    * corpus's own trigram model:
    *
    *   p(w | u,v)     = (c(u,v,w) + 1) / (c(u,v) + V)
    *   lm3_score(d)   = Σ_(u,v,w) tf_d(u,v,w)·ln p(w|u,v) / Σ tf_d
    *
    * where `c(u,v,w)` is the corpus trigram count, `c(u,v)` the bigram
    * count of the context (ALL bigram windows, including each document's
    * final pair — the standard raw-count conditional), and `V` the
    * unigram vocabulary size. The longer context sharpens the
    * fluency/perplexity axis further than [[lmScoreBigram]]: locally
    * plausible word pairs in a globally scrambled document score low.
    * Empty tokens are dropped BEFORE windowing. Output: one row per
    * input document (`idCol`, `n_trigrams`, `lm3_score`); documents
    * with fewer than three tokens keep `n_trigrams` 0 and a null score.
    *
    * Scale shape: identical to [[lmScoreBigram]] one order up — per-doc
    * window aggregation with map-side combine, pre-aggregated trigram /
    * bigram models before their joins (AQE-splittable), a broadcast
    * one-row vocabulary total, and exact-DECIMAL term sums so
    * aggregation order cannot wobble the rounded score. */
  def lmScoreTrigram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    // sequence(1, 0) would generate DESCENDING — explicit empty instead
    def windows(n: Int) = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    val tri = df.select(col(idCol), explode(transform(windows(3),
        i => struct(element_at(toks, i).as("u"), element_at(toks, i + 1).as("v"),
          element_at(toks, i + 2).as("w")))).as("tg"))
      .select(col(idCol), col("tg.u").as("u"), col("tg.v").as("v"), col("tg.w").as("w"))
    val dtf = tri.groupBy(col(idCol), col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val tgModel = dtf.groupBy("u", "v", "w").agg(sum(col("tf")).as("c_tg"))
    val bgModel = df.select(explode(transform(windows(2),
        i => struct(element_at(toks, i).as("u"), element_at(toks, i + 1).as("v"))))
        .as("bg"))
      .groupBy(col("bg.u").as("u"), col("bg.v").as("v"))
      .agg(count(lit(1)).as("c_bg"))
    val totals = broadcast(df.select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).as("v_size")))
    val lnP = log((col("c_tg") + lit(1L)).cast(DoubleType) /
      (col("c_bg") + col("v_size")).cast(DoubleType))
    val scored = dtf
      .join(tgModel, Seq("u", "v", "w"))
      .join(bgModel, Seq("u", "v"))
      .crossJoin(totals)
      .select(col(idCol), col("tf"),
        (col("tf").cast(DoubleType) * lnP).cast(DecimalType(28, 12)).as("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n"),
        (sum(col("term")).cast(DoubleType) / sum(col("tf"))).as("lm3_score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n"), lit(0L)).as("n_trigrams"),
        col("lm3_score"))
  }

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with
    * count >= `minCount`, ordered (count desc, token asc) — the
    * tokenizer-training / frequency-table step of a data pipeline.
    * Scale shape: explode + ONE hash shuffle on the token with map-side
    * partial aggregation (heavy tokens collapse to one row per partition
    * before the exchange, so token skew never concentrates rows), then a
    * TakeOrdered top-k — only `k` rows reach the driver. */
  def vocab(df: DataFrame, textCol: String, k: Int, minCount: Long = 1L): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token")).limit(k)

  /** Per-domain corpus GOVERNANCE report — the one-pass snapshot a
    * dataset card publishes per source/language/split: document,
    * token, and character mass; EXACT-duplicate document mass
    * (`n_docs − distinct md5(text)` — the dedup debt number); language
    * spread (`n_langs` distinct [[langId]] guesses, plus the dominant
    * guess and its document count, ties to the lexicographically
    * smaller language). NULL text counts as the empty document; a NULL
    * domain is its own stratum (the family rule).
    *
    * Scale shape: every feature (length, token count, digest, language
    * vote) is a per-row codegen'd expression; the only movement is two
    * NARROW shuffles — (domain, digest/lang) partial aggregates for
    * the distinct counts and the (domain, lang) rollup whose per-group
    * top-1 window runs over ≤ |languages| rows. Text never shuffles. */
  def corpusReport(df: DataFrame, domainCol: String,
                   textCol: String): DataFrame = {
    val outCols = Seq("n_docs", "n_tokens", "n_chars", "n_dup_docs",
      "n_langs", "top_lang", "top_lang_docs")
    require(!outCols.contains(domainCol),
      s"corpusReport: domain column '$domainCol' collides with a " +
        "report column — rename it first")
    val t = coalesce(col(textCol), lit(""))
    val perDoc = df.select(col(domainCol).as("_crd"),
      length(t).cast(LongType).as("_nc"),
      size(tokens(t)).cast(LongType).as("_nt"),
      md5(t).as("_dig"),
      langId(t).as("_lg"))
    val main = perDoc.groupBy(col("_crd"))
      .agg(count(lit(1)).as("n_docs"),
        sum("_nt").as("n_tokens"),
        sum("_nc").as("n_chars"),
        (count(lit(1)) - countDistinct(col("_dig"))).as("n_dup_docs"),
        countDistinct(col("_lg")).as("n_langs"))
    val lc = perDoc.groupBy(col("_crd").as("_crl"), col("_lg"))
      .agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_crl").orderBy(col("_c").desc, col("_lg"))
    val top = lc.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("_crl"), col("_lg").as("top_lang"),
        col("_c").as("top_lang_docs"))
    main.join(top, col("_crd") <=> col("_crl"))
      .select((col("_crd").as(domainCol) +: outCols.map(col)): _*)
  }

  /** [[corpusReport]] extended with the NEAR-duplicate debt a dataset
    * card wants next to the exact number: `n_neardup_docs` — per
    * domain, the documents a MinHash-LSH dedup pass would DROP (the
    * non-canonical members of [[Dedup.nearDupGroups]]' clusters, i.e.
    * `keep = false`; exact duplicates collide in LSH too, so they are
    * counted here as well as in `n_dup_docs`). Clustering runs over the
    * WHOLE corpus — a near-dup pair spanning two domains books the debt
    * in the non-kept document's domain, which is where the drop would
    * land.
    *
    * Scale shape: [[corpusReport]]'s two narrow shuffles plus
    * [[Dedup.nearDupGroups]]' collision-bounded LSH + pointer-jump
    * clustering; the debt rollup joins IDS only (one left-semi + one
    * tiny per-domain count) — text never rides the dedup path twice. */
  def corpusReportNearDup(df: DataFrame, domainCol: String, idCol: String,
                          textCol: String, n: Int = 3,
                          numHashes: Int = 32, bands: Int = 8,
                          minEstJaccard: Double = 0.5): DataFrame = {
    require(domainCol != "n_neardup_docs",
      "corpusReportNearDup: domain column collides with the report's " +
        "n_neardup_docs column — rename it first")
    val groups = Dedup.nearDupGroups(df.select(col(idCol), col(textCol)),
      idCol, textCol, n, numHashes, bands, minEstJaccard)
    val nonCanon = groups.filter(!col("keep")).select(col(idCol))
    val nd = df.select(col(domainCol).as("_crn"),
        col(idCol).cast(LongType).as(idCol))
      .join(nonCanon, Seq(idCol), "left_semi")
      .groupBy(col("_crn")).agg(count(lit(1)).as("n_neardup_docs"))
    corpusReport(df, domainCol, textCol)
      .join(nd, col(domainCol) <=> col("_crn"), "left")
      .drop("_crn")
      .withColumn("n_neardup_docs",
        coalesce(col("n_neardup_docs"), lit(0L)))
  }

  /** [[corpusReport]] + CONTAMINATION debt — the third debt column a
    * dataset card wants beside exact-dup and near-dup mass:
    * `n_contaminated_docs` counts the documents of each domain a
    * benchmark decontamination pass would drop (≥ `minShared` distinct
    * word `n`-grams shared with ANY document of `bench` — the
    * [[Contamination.ngramOverlap]] rule verbatim, so the card's
    * number is exactly the sweep's drop count, not an estimate).
    *
    * Scale shape: the report's narrow shuffles plus the
    * broadcast-bench n-gram join (the corpus never shuffles for it);
    * the debt rollup joins IDS only. */
  def corpusReportContamination(df: DataFrame, domainCol: String,
                                idCol: String, textCol: String,
                                bench: DataFrame, benchIdCol: String,
                                benchTextCol: String, n: Int = 3,
                                minShared: Long = 2L): DataFrame = {
    require(domainCol != "n_contaminated_docs",
      "corpusReportContamination: domain column collides with the " +
        "report's n_contaminated_docs column — rename it first")
    val dirty = Contamination.ngramOverlap(
        df.select(col(idCol), col(textCol)), idCol, textCol,
        bench, benchIdCol, benchTextCol, n, minShared)
      .select(col("doc_id")).distinct()
    val cd = df.select(col(domainCol).as("_crc"),
        col(idCol).cast(LongType).as("doc_id"))
      .join(dirty, Seq("doc_id"), "left_semi")
      .groupBy(col("_crc")).agg(count(lit(1)).as("n_contaminated_docs"))
    corpusReport(df, domainCol, textCol)
      .join(cd, col(domainCol) <=> col("_crc"), "left")
      .drop("_crc")
      .withColumn("n_contaminated_docs",
        coalesce(col("n_contaminated_docs"), lit(0L)))
  }

  /** The DATASET CARD relation — [[corpusReport]] joined with
    * [[Sample.temperaturePlan]] on the domain: one row per domain
    * holding what a dataset card publishes (doc/token/char mass,
    * exact-dup debt, language spread) NEXT TO what the training recipe
    * would do with it (raw vs scaled share, the exact quota, effective
    * epochs, expected output, cap flag). `mass` is the PLAN's count —
    * sampler-eligible rows (non-NULL ids) — and can differ from the
    * report's `n_docs` where NULL-id rows exist; both ride the card
    * because both are true. A domain with zero eligible rows carries
    * NULL plan columns (there is no recipe for it — honest, not
    * zero-filled). NULL domains join null-safely (their own stratum
    * on both sides). Cost: the report's narrow shuffles + the plan's
    * driver-bounded count. */
  def datasetCard(df: DataFrame, domainCol: String, idCol: String,
                  textCol: String, alpha: Double,
                  budgetDocs: Long): DataFrame = {
    val plan = Sample.temperaturePlan(df, domainCol, idCol, alpha,
        budgetDocs)
      .withColumnRenamed("domain", "_dcd")
    corpusReport(df, domainCol, textCol)
      .join(plan, col(domainCol) <=> col("_dcd"), "left")
      .drop("_dcd")
  }
}
