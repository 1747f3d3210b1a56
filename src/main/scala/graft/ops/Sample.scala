package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.native

/**
 * Deterministic sampling for training-mix construction. A 100 TB corpus
 * is sampled per stratum (language, source, quality bucket) at different
 * rates; the selection must be reproducible run-to-run and engine-to-
 * engine, so it is keyed on a portable content hash, not on an RNG:
 * a row is kept iff `hash60(stratum ':' id) mod 1e6 < rate * 1e6`.
 *
 * Scale shape: a pure per-row filter — no shuffle, no sort, no driver
 * state; it composes with scan pruning and runs embarrassingly parallel.
 * Changing one stratum's rate only flips membership within that stratum
 * (selections are independent per key), and raising a rate strictly
 * grows the sample — the properties a reproducible training mix needs.
 */
object Sample {

  /** Keep each row of `df` with probability `rates(stratum)` (exactly:
    * the deterministic hash-bucket rule above), rows of unlisted strata
    * with probability `defaultRate`. Rates are in [0, 1]. */
  def stratifiedHash(df: DataFrame, stratumCol: String, idCol: String,
                     rates: Map[String, Double],
                     defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be in [0, 1]")
    // per-stratum integer thresholds as ONE map-literal lookup — a
    // when-chain branch per stratum generates O(|rates|) Java per row,
    // which at a production rate table (thousands of domains) re-opens
    // the 64 KB codegen overflow; a NULL or unlisted stratum falls to
    // the default, exactly the chain's semantics.
    // Math.round, not toLong: 0.3*1e6 is 299999.99999999994 in binary —
    // truncation would shift the threshold off its decimal value
    val thr =
      if (rates.isEmpty) lit(Math.round(defaultRate * 1e6))
      else coalesce(
        element_at(typedLit(rates.map { case (k, v) => k -> Math.round(v * 1e6) }),
          col(stratumCol)),
        lit(Math.round(defaultRate * 1e6)))
    val bucket = hashBucket("sample", stratumCol, idCol)
    df.filter(bucket < thr)
  }

  /** Domain-MIXTURE sampling: draw ~`nOut` rows whose composition
    * steers toward `targetFracs` (domain → share of the output, each in
    * [0, 1], summing to <= 1). Each listed domain `d` with `c_d`
    * available rows is sampled at `rate_d = min(1, frac_d·nOut / c_d)`
    * through [[stratifiedHash]]'s hash-bucket coin, so the draw is
    * deterministic and per-domain independent. An UNDERSUPPLIED domain
    * (quota > availability) contributes everything it has — the
    * realized total then falls short of `nOut` rather than silently
    * re-weighting other domains (the caller chose those shares; don't
    * second-guess them). Unlisted and NULL domains are dropped.
    *
    * Scale shape: one tiny groupBy(domain) count over the listed
    * domains (driver-localized, bounded by `maxDomains` — domain
    * columns are sources/languages, not ids) to fix the rates, then a
    * pure per-row hash filter: the corpus itself never shuffles and
    * the scan prunes to the listed domains. */
  def mixtureSample(df: DataFrame, domainCol: String, idCol: String,
                    targetFracs: Map[String, Double], nOut: Long,
                    maxDomains: Int = 100000): DataFrame = {
    require(nOut > 0, s"nOut must be positive, got $nOut")
    require(targetFracs.nonEmpty &&
      targetFracs.values.forall(f => f >= 0.0 && f <= 1.0) &&
      targetFracs.values.sum <= 1.0 + 1e-9,
      "target fractions must be in [0, 1] and sum to <= 1")
    require(maxDomains > 0 && targetFracs.size <= maxDomains,
      s"at most $maxDomains listed domains, got ${targetFracs.size}")
    // count only rows the coin can actually select: NULL-id rows have
    // no sampling identity (hashBucket nulls their key), so counting
    // them would silently deflate every rate below its quota
    val counts = df
      .filter(col(domainCol).isin(targetFracs.keys.toSeq: _*) &&
        col(idCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect() // bounded: one row per LISTED domain (<= maxDomains)
    val rates = counts.map { r =>
      val d = r.getString(0)
      d -> math.min(1.0, (targetFracs(d) * nOut) / r.getLong(1))
    }.toMap
    stratifiedHash(df.filter(col(domainCol).isin(targetFracs.keys.toSeq: _*)),
      domainCol, idCol, rates, defaultRate = 0.0)
  }

  /** Deterministic train/validation/test split: adds a `split` column
    * assigning each row to the named fraction, by the same hash-bucket
    * rule as [[stratifiedHash]] (so splits are reproducible, disjoint,
    * and stable under corpus growth — a row's split never changes when
    * other rows are added). `fractions` must sum to <= 1; rows past the
    * cumulative total get the `rest` label. Pure per-row projection —
    * no shuffle, no RNG state. */
  def assignSplits(df: DataFrame, stratumCol: String, idCol: String,
                   fractions: Seq[(String, Double)],
                   rest: String = "rest"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0.0) &&
      fractions.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must be >= 0 and sum to <= 1")
    val bucket = hashBucket("split", stratumCol, idCol)
    // cumulative thresholds: [0, f1), [f1, f1+f2), ...
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val split = fractions.map(_._1).zip(cum.map(c => Math.round(c * 1e6)))
      .foldRight(lit(rest): org.apache.spark.sql.Column) {
        case ((name, thr), alt) => when(bucket < thr, lit(name)).otherwise(alt)
      }
    df.withColumn("split", split)
  }

  /** Deterministic sequence PACKING — the sharding step after sampling
    * and splitting: documents are laid out in `idCol` order within each
    * `groupCol` partition (source, language, split...) and assigned to
    * consecutive packs of `budget` tokens. A document starting before a
    * pack boundary belongs to the pack its first token falls in
    * (`pack_id = floor(cumulative_tokens_before / budget)`), so packs
    * are contiguous, reproducible, and stable: appending new documents
    * with larger ids never reassigns existing ones. Output adds
    * `pack_id` and `pack_offset` (the document's first-token offset
    * within its group's token stream — byte-ranges for shard writers).
    *
    * `sepCost` budgets the special tokens a shard writer appends per
    * DOCUMENT (EOS/document separator): every document's footprint in
    * the token stream becomes `tokenCol + sepCost`, so offsets and pack
    * boundaries account for the separators downstream will actually
    * write — without it a 2k-token window under-counts by one token per
    * document, a small but systematic overflow once separators land.
    *
    * Scale shape: ONE hash shuffle on `groupCol` + a running-sum window
    * per group — the same plan at 1000 executors; token counts ride the
    * window, text never does (pass a precomputed count column). Groups
    * are the parallelism unit: pack within (source × split) rather than
    * one global group so no single task owns the whole corpus. */
  def packByTokenBudget(df: DataFrame, groupCol: String, idCol: String,
                        tokenCol: String, budget: Long,
                        sepCost: Long = 0L): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(sepCost >= 0L, s"sepCost must be >= 0, got $sepCost")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(tokenCol) + lit(sepCost)).over(w), lit(0L))
    // a NULL token count would be skipped by the window sum — the doc
    // would get a pack while consuming no budget, silently overflowing
    // its pack's accounting; a NEGATIVE count would shrink every later
    // offset and reassign downstream packs. Fail loudly per offending
    // row instead.
    val checked = when(col(tokenCol).isNotNull && col(tokenCol) >= 0, before)
      .otherwise(raise_error(concat(
        lit(s"packByTokenBudget: token count ('$tokenCol') must be a non-negative"),
        lit(" number, got "), coalesce(col(tokenCol).cast("string"), lit("NULL")),
        lit(" for id "), coalesce(col(idCol).cast("string"), lit("NULL")))))
    df.withColumn("pack_offset", checked)
      // `div` = exact integer division (a double `/` would round past
      // 2^53 token offsets); offsets are non-negative so div == floor
      .withColumn("pack_id", expr(s"pack_offset div ${budget}L"))
  }

  /** Deterministic EPOCH MIXING — the per-domain up/down-sampling step
    * of a pretraining data recipe ("web ×0.8, books ×2.5, code ×1.0"):
    * every row whose domain has weight `w` is emitted `floor(w)` times
    * plus one more iff its hash coin lands under `frac(w)`, with a
    * 0-based `epoch` column numbering the copies. One call covers both
    * directions: `w = 2.5` upsamples (2 or 3 copies), `w = 0.4`
    * downsamples (0 or 1), `w = 1.0` passes through. The draw is the
    * [[stratifiedHash]] integer-bucket coin (threshold fixed on the
    * driver as `round(frac(w)·1e6)` — no cross-engine float
    * arithmetic), so the output is exactly reproducible in any engine
    * and stable under corpus growth: a row's copy count never changes
    * when other rows are added, and `salt` decorrelates the fractional
    * draw from every other sampling decision. Unlisted and NULL
    * domains use `defaultWeight` (0 = drop, the usual recipe
    * behavior); NULL ids have no sampling identity and are dropped
    * (the family-wide rule).
    *
    * Besides `epoch`, the output carries `copy_id` — a
    * `struct(id, epoch)` key that is COLLISION-FREE for any id type at
    * any weight up to the 100-epoch cap, ordered exactly (id asc,
    * epoch asc). Feed THIS to [[packByTokenBudget]]'s `idCol` (struct
    * columns order lexicographically) so copies of a document lay out
    * adjacently but distinctly; a hand-rolled numeric key like
    * `id * 4 + epoch` silently collides the moment a weight exceeds
    * the multiplier and corrupts every downstream pack offset.
    *
    * Scale shape: pure per-row projection + generate (the copy
    * explosion) — no shuffle, no RNG state, no driver data; the output
    * is ~`Σ w_d·|d|` rows by construction. Weights are capped at 100
    * epochs: past that a recipe is almost certainly a unit bug, and
    * the explode factor is the one thing here that could melt a
    * cluster. */
  def repeatByWeight(df: DataFrame, domainCol: String, idCol: String,
                     weights: Map[String, Double],
                     defaultWeight: Double = 0.0,
                     salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "repeatByWeight: empty weight table")
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0.0 && w <= 100.0,
        s"weights must be in [0, 100] epochs, got $w"))
    def quotaOf(w: Double) = {
      val f = math.floor(w).toLong
      val t = Math.round((w - math.floor(w)) * 1e6)
      // a fraction within 5e-7 of 1 rounds to a FULL coin (1e6 =
      // "always one more") — normalize to the next floor so the quota
      // contract's thr < 1e6 holds and the draw stays identical
      if (t == 1000000L) (f + 1L, 0L) else (f, t)
    }
    repeatByQuota(df, domainCol, idCol,
      weights.map { case (k, v) => k -> quotaOf(v) },
      quotaOf(defaultWeight), salt)
  }

  /** [[repeatByWeight]]'s exact-arithmetic core: per-domain quotas as
    * `(floorCopies, thrMicro)` pairs — every row of domain `d` is
    * emitted `floorCopies` times plus one more iff its hash coin (in
    * `[0, 1e6)`) lands under `thrMicro`, i.e. an exact expected weight
    * of `floorCopies + thrMicro/1e6` with NO cross-engine float
    * arithmetic anywhere. [[sampleByTemperature]] derives quotas by
    * exact integer division; call this directly when the recipe's
    * weights come from arithmetic that must replay bit-for-bit in
    * another engine. Semantics (epoch/copy_id columns, NULL handling,
    * the 100-epoch cap) are [[repeatByWeight]]'s. */
  def repeatByQuota(df: DataFrame, domainCol: String, idCol: String,
                    quotas: Map[String, (Long, Long)],
                    defaultQuota: (Long, Long) = (0L, 0L),
                    salt: String = ""): DataFrame = {
    // the op APPENDS `epoch` and `copy_id` — a pre-existing column of
    // either name would be silently replaced (withColumn semantics) and
    // every schema-sensitive consumer downstream would see the swap;
    // fail loudly instead (the family-wide collision rule)
    Seq("epoch", "copy_id").foreach(c =>
      require(!df.columns.contains(c),
        s"repeatByQuota appends a '$c' column; the input already has " +
          s"one — rename it first"))
    (quotas.values.toSeq :+ defaultQuota).foreach { case (f, t) =>
      require(f >= 0L && f <= 100L && t >= 0L && t < 1000000L,
        s"quotas must be (floor in [0, 100], thr in [0, 1e6)), got ($f, $t)")
      // floor 100 + a live coin would emit a 101st copy — past the
      // expected-weight cap repeatByWeight enforces (w <= 100 maps to
      // (100, 0) exactly); keep the two entry points' contracts equal
      require(f < 100L || t == 0L,
        s"quota ($f, $t) exceeds the 100-epoch cap (a floor of 100 " +
          "leaves no room for the fractional coin)")
    }
    val floorW =
      if (quotas.isEmpty) lit(defaultQuota._1)
      else coalesce(
        element_at(typedLit(quotas.map { case (k, (f, _)) => k -> f }),
          col(domainCol)),
        lit(defaultQuota._1))
    val thrW =
      if (quotas.isEmpty) lit(defaultQuota._2)
      else coalesce(
        element_at(typedLit(quotas.map { case (k, (_, t)) => k -> t }),
          col(domainCol)),
        lit(defaultQuota._2))
    val extra = when(
      hashBucket(s"epoch:$salt", domainCol, idCol) < thrW, 1L).otherwise(0L)
    val n = floorW + extra
    df.filter(col(idCol).isNotNull)
      .withColumn("_n_copies", n)
      .filter(col("_n_copies") >= 1L)
      .select(df.columns.map(col).toSeq :+
        explode(sequence(lit(0L), col("_n_copies") - 1L)).as("epoch"): _*)
      .withColumn("copy_id",
        struct(col(idCol).as("id"), col("epoch").as("epoch")))
  }

  /** TEMPERATURE-scaled domain mixing — the standard multilingual /
    * multi-domain balancing rule: domain `d` with `c_d` documents is
    * sampled proportionally to `c_d^alpha` (`alpha = 1` keeps natural
    * proportions, `alpha -> 0` approaches uniform-per-domain), scaled
    * so the expected output is `budgetDocs` documents. Each document of
    * domain `d` is therefore emitted with expected multiplicity
    * `w_d = budgetDocs·c_d^alpha / (Σ_e c_e^alpha · c_d)` — small
    * domains upsample, large domains downsample — through
    * [[repeatByQuota]]'s floor+coin (so the draw is deterministic,
    * per-document independent, and stable under re-runs).
    *
    * Exactness: each `c_d^alpha` is snapped ONCE to integer millionths
    * (`m_d = round(c_d^alpha · 1e6)`); everything after — the sum, the
    * per-domain quota `budgetDocs·m_d / (Σm · c_d)`, its floor and
    * fractional coin threshold — is EXACT integer arithmetic (BigInt
    * here, HUGEINT in a SQL replay), so any engine agrees bit-for-bit
    * given the same snapped `m_d`. At `alpha = 0.5` the snap itself is
    * exactly portable (IEEE `sqrt` is correctly rounded; a general
    * `pow` is not guaranteed to the last ulp, though the 1e-6 snap
    * makes a flip astronomically unlikely).
    *
    * A domain whose quota exceeds the 100-epoch cap refuses loudly
    * (same rationale as [[repeatByWeight]] — a tiny domain under a hot
    * temperature is almost certainly a recipe bug, and the explode
    * factor is the one thing here that could melt a cluster). NULL
    * domains are their own stratum (quota via the default slot); NULL
    * ids are dropped (the family-wide rule — no sampling identity).
    *
    * Scale shape: one tiny groupBy(domain) count (driver-bounded by
    * `maxDomains` — domains are sources/languages, not ids), then
    * [[repeatByQuota]]'s pure per-row projection + generate. The
    * corpus never shuffles. */
  def sampleByTemperature(df: DataFrame, domainCol: String, idCol: String,
                          alpha: Double, budgetDocs: Long,
                          salt: String = "",
                          maxDomains: Int = 65536): DataFrame =
    temperatureMix(df, domainCol, idCol, alpha, budgetDocs, salt,
      maxDomains, count(lit(1)), "docs")

  /** [[sampleByTemperature]] weighted by TOKEN mass — the XLM-R-style
    * multilingual recipe: domain `d` with `c_d = Σ tokenCol` tokens
    * receives expected OUTPUT token mass `budgetTokens·c_d^alpha / Σ_e
    * c_e^alpha`, realized by giving every document of `d` the same
    * expected multiplicity `w_d = budgetTokens·m_d / (Σm · c_d)` through
    * the identical exact HUGEINT quota core (floor + millionths coin).
    * Weighting by documents over-upsamples a domain of few huge
    * documents; weighting by tokens is what balances what the trainer
    * actually consumes. NULL or negative token counts refuse loudly
    * (they would silently deflate the domain's mass); a ZERO-mass
    * domain gets quota (0, 0) — it cannot carry token mass, so its
    * (all-empty) documents drop. Exactness, the 100-epoch cap, NULL
    * domain/ID handling, and the scale shape (one bounded count, no
    * corpus shuffle) are [[sampleByTemperature]]'s. */
  def sampleByTemperatureTokens(df: DataFrame, domainCol: String,
                                idCol: String, tokenCol: String,
                                alpha: Double, budgetTokens: Long,
                                salt: String = "",
                                maxDomains: Int = 65536): DataFrame =
    temperatureMix(df, domainCol, idCol, alpha, budgetTokens, salt,
      maxDomains, checkedTokenMass(tokenCol, "sampleByTemperatureTokens"),
      "tokens")

  /** `Σ tokenCol` with the loud per-row refusal on NULL / negative
    * counts (they would silently deflate the domain's mass). */
  private def checkedTokenMass(tokenCol: String,
                               op: String): org.apache.spark.sql.Column =
    sum(when(col(tokenCol).isNotNull && col(tokenCol) >= 0L,
      col(tokenCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$op: token column '$tokenCol' must be non-null and >= 0, " +
          "got "),
        coalesce(col(tokenCol).cast("string"), lit("NULL"))))))

  /** One domain's exact quota line: `mass` (`c_d`), `snapped`
    * (`m_d = round(c_d^alpha·1e6)`), and the floor + millionths-coin
    * quota — the shared arithmetic behind [[sampleByTemperature]] and
    * [[temperaturePlan]]. */
  private[graft] final case class DomainQuota(domain: Option[String],
                                              mass: Long, snapped: Long,
                                              floor: Long, thr: Long) {
    def overCap: Boolean = !(floor < 100L || (floor == 100L && thr == 0L))
  }

  private def temperatureQuotas(df: DataFrame, domainCol: String,
                                idCol: String, alpha: Double, budget: Long,
                                maxDomains: Int,
                                mass: org.apache.spark.sql.Column)
      : Seq[DomainQuota] = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    // count only coin-eligible rows (non-null id) — mixtureSample's
    // rule; counting ineligible rows would deflate every quota.
    // limit BEFORE the collect: the guard must fire without first
    // materializing a mistakenly high-cardinality domain column (an id
    // passed as the domain) on the driver
    val counts = df.filter(col(idCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("d"))
      .agg(mass.cast("long").as("c"))
      .limit(maxDomains + 1)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
    require(counts.length <= maxDomains,
      s"sampleByTemperature: more than " +
        s"maxDomains=$maxDomains domains — group coarser or raise the bound")
    // the ONE float step, snapped to millionths ([[powSnap]]: exactly
    // portable at alpha = 1 and every dyadic k/2^m via the sqrt chain)
    val m = counts.map { case (d, c) => (d, c, powSnap(c, alpha)) }
    val total = m.map(x => BigInt(x._3)).sum
    m.map { case (d, c, md) =>
      if (c == 0L) DomainQuota(d, c, md, 0L, 0L) // zero mass carries nothing
      else {
        val num = BigInt(budget) * md
        val den = total * c
        DomainQuota(d, c, md, (num / den).toLong,
          ((num % den) * 1000000 / den).toLong)
      }
    }.toSeq
  }

  private def temperatureMix(df: DataFrame, domainCol: String,
                             idCol: String, alpha: Double, budget: Long,
                             salt: String, maxDomains: Int,
                             mass: org.apache.spark.sql.Column,
                             massName: String): DataFrame = {
    val quotas = temperatureQuotas(df, domainCol, idCol, alpha, budget,
      maxDomains, mass)
    if (quotas.isEmpty) return repeatByQuota(df, domainCol, idCol,
      Map("" -> (0L, 0L)), (0L, 0L), salt)
    quotas.foreach { q =>
      require(q.mass == 0L || !q.overCap,
        s"sampleByTemperature: domain ${q.domain.getOrElse("NULL")} " +
          s"(${q.mass} $massName) would be upsampled x${q.floor} (past " +
          s"the 100-epoch cap) at alpha=$alpha, budget=$budget — raise " +
          "alpha, lower the budget, or pre-merge tiny domains")
    }
    repeatByQuota(df, domainCol, idCol,
      quotas.collect { case DomainQuota(Some(d), _, _, f, t) => d -> (f, t) }
        .toMap,
      quotas.collectFirst { case DomainQuota(None, _, _, f, t) => (f, t) }
        .getOrElse((0L, 0L)),
      salt)
  }

  /** The recipe DRY-RUN — the "data mixing card" a pipeline reviews
    * BEFORE spending a cluster pass on [[sampleByTemperature]]: one row
    * per domain with its mass (`c_d`), raw corpus share and
    * temperature-scaled target share (both in exact integer millionths
    * of the respective totals, floor division), the exact quota the
    * sampler would apply (`quota_floor` + `quota_coin_ppm`), the
    * effective epoch factor (`epochs_ppm = floor·1e6 + coin` — how many
    * times an average document of the domain is seen, in millionths),
    * the expected output mass (`expected_out = ⌊c_d·epochs_ppm/1e6⌋`),
    * and `over_cap` (1 when the quota breaches the 100-epoch cap —
    * where the sampler would REFUSE, the plan reports: surfacing the
    * offending domain is exactly what a dry-run is for). Zero-mass
    * domains report a (0, 0) quota — the sampler drops them silently,
    * the card shows them.
    *
    * Every column after the one snapped `c_d^alpha` float step is pure
    * integer arithmetic (BigInt here, HUGEINT in a SQL replay), so any
    * engine re-derives the card bit-for-bit from the domain counts.
    * Rows driver-bounded by `maxDomains`; the corpus is touched by one
    * narrow count only. Columns that would overflow a BIGINT under an
    * absurd over-cap recipe saturate at Long.MaxValue rather than
    * wrapping. */
  def temperaturePlan(df: DataFrame, domainCol: String, idCol: String,
                      alpha: Double, budgetDocs: Long,
                      maxDomains: Int = 65536): DataFrame =
    temperaturePlanOf(df, domainCol, idCol, alpha, budgetDocs, maxDomains,
      count(lit(1)))

  /** [[temperaturePlan]] weighted by TOKEN mass — the dry-run of
    * [[sampleByTemperatureTokens]] (`c_d = Σ tokenCol`, budget in
    * tokens, `expected_out` in tokens). Same refusal rule on NULL /
    * negative token counts as the sampler. */
  def temperaturePlanTokens(df: DataFrame, domainCol: String, idCol: String,
                            tokenCol: String, alpha: Double,
                            budgetTokens: Long,
                            maxDomains: Int = 65536): DataFrame =
    temperaturePlanOf(df, domainCol, idCol, alpha, budgetTokens, maxDomains,
      checkedTokenMass(tokenCol, "temperaturePlanTokens"))

  private def temperaturePlanOf(df: DataFrame, domainCol: String,
                                idCol: String, alpha: Double, budget: Long,
                                maxDomains: Int,
                                mass: org.apache.spark.sql.Column)
      : DataFrame = {
    val quotas = temperatureQuotas(df, domainCol, idCol, alpha, budget,
      maxDomains, mass)
    val totalMass = quotas.map(q => BigInt(q.mass)).sum
    val totalSnap = quotas.map(q => BigInt(q.snapped)).sum
    def sat(x: BigInt): Long =
      if (x > BigInt(Long.MaxValue)) Long.MaxValue else x.toLong
    val rows = quotas.map { q =>
      val raw = if (totalMass == 0) 0L
        else (BigInt(q.mass) * 1000000 / totalMass).toLong
      val tgt = if (totalSnap == 0) 0L
        else (BigInt(q.snapped) * 1000000 / totalSnap).toLong
      val epochsPpm = BigInt(q.floor) * 1000000 + q.thr
      val expected = BigInt(q.mass) * epochsPpm / 1000000
      (q.domain.orNull, q.mass, raw, tgt, q.floor, q.thr, sat(epochsPpm),
        sat(expected), if (q.overCap) 1L else 0L)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("domain", "mass", "raw_share_ppm", "target_share_ppm",
      "quota_floor", "quota_coin_ppm", "epochs_ppm", "expected_out",
      "over_cap")
      .orderBy(col("domain")) // NULLS FIRST — pin it in any SQL replay
  }

  /** `round(c^alpha · 1e6)` with the widest exactly-portable reach:
    * alpha = 1 is the identity (no float step at all); a DYADIC
    * alpha = k/2^m (m <= 20 — 0.5, 0.75, 0.25, 0.875...) evaluates as
    * the fixed binary-expansion chain `Π_{bit i of alpha set}
    * sqrt^i(c)`, multiplied in ascending-i order — IEEE-754 requires
    * `sqrt` and `*` to be correctly rounded, so every engine computes
    * the identical chain bit-for-bit (replay 0.75 in SQL as
    * `sqrt(c) * sqrt(sqrt(c))`, same order). Only a non-dyadic alpha
    * falls to `pow`, whose last-ulp rounding is implementation-defined
    * — the documented portability bound (the 1e-6 snap makes a flip
    * astronomically unlikely). */
  private[graft] def powSnap(c: Long, alpha: Double): Long =
    Math.round(powPortable(c.toDouble, alpha) * 1e6)

  private[graft] def powPortable(x: Double, alpha: Double): Double =
    if (alpha == 1.0) x
    else dyadicBits(alpha) match {
      case Some(bits) =>
        var s = x
        var acc = 1.0 // 1.0 * s is exact, so the first factor is free
        var i = 1
        val hi = bits.max
        while (i <= hi) { // ascending i: the FIXED evaluation order
          s = Math.sqrt(s)
          if (bits.contains(i)) acc = acc * s
          i += 1
        }
        acc
      case None => Math.pow(x, alpha)
    }

  /** The set bit positions of a dyadic `alpha = Σ 2^-i` (i <= 20), or
    * None if alpha needs more than 20 binary digits (then it is not a
    * human-chosen dyadic temperature — 0.3, 1/3, 0.9 all fall here). */
  private[graft] def dyadicBits(alpha: Double): Option[Set[Int]] = {
    val scaled = alpha * (1L << 20).toDouble
    if (scaled != Math.rint(scaled)) None
    else {
      val k = scaled.toLong // alpha = k / 2^20 exactly
      Some((1 to 20).filter(i => ((k >> (20 - i)) & 1L) == 1L).toSet)
    }
  }

  /** Data SELECTION under a per-group token budget — "the best docs
    * from each source until the source's token quota is full", the
    * quality-filtered corpus-assembly step: rows rank (`scoreCol` desc,
    * `idCol` asc) within their group and the kept set is the longest
    * prefix whose running `tokenCol` sum stays within `budget`
    * (cumulative sums are monotone, so the first over-budget row cuts
    * everything after it — a single over-budget document at rank 1
    * selects nothing from its group). Output: the surviving rows with
    * `sel_rank` (1-based quality rank) and `cum_tokens` (running total
    * INCLUDING the row) for audit. NULL or negative token counts and
    * NULL scores fail loudly per offending row ([[packByTokenBudget]]'s
    * rule — a silently skipped row would hand its budget to worse
    * documents).
    *
    * Scale shape, two passes ([[bottomKPerGroup]]'s threshold
    * discipline, mass-weighted): (1) one NARROW aggregation pass
    * computes a per-group conservative score threshold with the
    * bounded [[graft.functions.ScoreMassThreshold]] sketch — only
    * (score, mass) pairs shuffle, ≤ O(sketch cap) per group per map
    * task — such that `score >= threshold` provably retains the whole
    * exact prefix while bounding the survivor mass to roughly the
    * budget; (2) the exact running-sum window then sorts ONLY the
    * survivors (one hash shuffle + per-group sort over an
    * O(budget)-mass row set), so one giant skewed source never sorts
    * its full-width row set. A group whose total mass fits the budget
    * gets a NULL threshold (no cut — everything survives, everything
    * is kept). Output is BIT-IDENTICAL to the single-window
    * formulation: survivors contain every exact-prefix row AND every
    * row that precedes one in rank order, so `sel_rank`/`cum_tokens`
    * are unchanged ([[graft.functions.MassSketch]] documents the
    * conservative-direction proof; OpsSpec pins equality on random
    * and adversarial groups). `df` is evaluated twice — cache
    * upstream if it is an expensive derived pipeline. Groups are the
    * parallelism unit, so size them like pack groups (source ×
    * split), not one global group. */
  def selectByBudget(df: DataFrame, groupCol: String, idCol: String,
                     scoreCol: String, tokenCol: String,
                     budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    // the pre-cut evaluates scores AS DOUBLE (sketch input + threshold
    // compare) while the exact window orders the RAW column — sound
    // only when the raw order IS numeric order. A string score would
    // order lexicographically in the window but numerically (or NULL,
    // silently dropping rows) in the pre-cut; refuse the type up front
    // (the checkedLongId fail-loudly discipline) instead of silently
    // cutting exact-prefix rows.
    val scoreType = df.schema(scoreCol).dataType
    require(scoreType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"selectByBudget: score column '$scoreCol' must be numeric (its " +
        s"order must survive the pre-cut's double cast), got " +
        s"${scoreType.simpleString} — cast it explicitly upstream")
    val checkedTok = when(
      col(tokenCol).isNotNull && col(tokenCol) >= 0 && col(scoreCol).isNotNull,
      col(tokenCol)).otherwise(raise_error(concat(
        lit(s"selectByBudget: needs a non-negative token count ('$tokenCol')"),
        lit(s" and a non-null score ('$scoreCol'), got ("),
        coalesce(col(tokenCol).cast("string"), lit("NULL")), lit(", "),
        coalesce(col(scoreCol).cast("string"), lit("NULL")),
        lit(") for id "), coalesce(col(idCol).cast("string"), lit("NULL")))))
    // pass 1: per-group conservative threshold (bad rows fail loudly
    // HERE — the checked mass expression raises before the sketch ever
    // sees them). The integer→double score cast is monotone, so the
    // sketch's ≤-exact-boundary guarantee carries through it.
    val thr = df.groupBy(col(groupCol).as("_smg"))
      .agg(graft.functions.native.score_mass_threshold(
        col(scoreCol).cast("double"), checkedTok.cast("long"), budget)
        .as("_thr"))
    // NULL-safe join back (a NULL group is its own stratum, the
    // bottomKPerGroup rule). No broadcast HINT: the threshold relation
    // is one row per group — tiny for the designed sources × splits
    // grouping, where AQE converts the join to broadcast at runtime
    // from its ACTUAL size — but a forced broadcast of an unexpectedly
    // high-cardinality group column would OOM the driver where the
    // plain shuffle join merely costs a shuffle of the small side
    val survivors = df.join(thr, col(groupCol) <=> col("_smg"))
      .filter(col("_thr").isNull || col(scoreCol) >= col("_thr"))
      .select(df.columns.map(col).toSeq: _*)
    // pass 2: the exact window, now over O(budget)-mass survivors
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc, col(idCol))
    survivors.withColumn("cum_tokens",
        sum(checkedTok).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
  }

  /** Per-group QUANTILE selection — "keep the best `keepPpm` millionths
    * of each group's mass", the FineWeb-style per-domain quality cut
    * where every domain gets a DIFFERENT absolute budget derived from
    * its own size: rows rank (`scoreCol` desc, `idCol` asc) within
    * their group and the kept set is the longest prefix whose running
    * mass stays within `⌊total_g·keepPpm/1e6⌋` (mass = `tokenCol`, or
    * row count when None — "top q% of documents"). Keeping a FRACTION
    * rather than a constant is what makes one dial correct across
    * domains of wildly different sizes; the budget arithmetic is exact
    * integer millionths, so a SQL replay agrees row-for-row.
    *
    * Output: survivors with `sel_rank` (1-based quality rank),
    * `cum_mass` (running mass including the row) and `keep_budget`
    * (the group's derived absolute budget — the audit column a
    * filtering report wants). NULL scores and NULL/negative token
    * counts fail loudly per row ([[selectByBudget]]'s rule).
    *
    * Scale shape = [[selectByBudget]]'s two passes with one twist: the
    * per-group budget cannot ride a constant into the sketch, so the
    * pre-cut uses [[graft.functions.ScoreMassQuantileThreshold]] —
    * same bounded conservative histogram, budget computed at eval time
    * from the sketch's EXACTLY-preserved total mass, so the pre-cut
    * and the exact window derive the same budget from the same
    * arithmetic and cannot disagree. One narrow aggregation (threshold
    * + total per group), then the exact window sorts only the
    * ~fraction-mass survivors. Groups are unbounded-cardinality safe
    * (nothing collects to the driver). `df` is evaluated twice — cache
    * upstream if derived. */
  def selectByFraction(df: DataFrame, groupCol: String, idCol: String,
                       scoreCol: String, keepPpm: Long,
                       tokenCol: Option[String] = None): DataFrame = {
    require(keepPpm >= 0L && keepPpm <= 1000000L,
      s"keepPpm must be in [0, 1e6] millionths, got $keepPpm")
    val scoreType = df.schema(scoreCol).dataType
    require(scoreType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"selectByFraction: score column '$scoreCol' must be numeric (its " +
        s"order must survive the pre-cut's double cast), got " +
        s"${scoreType.simpleString} — cast it explicitly upstream")
    val checkedMass = tokenCol match {
      case Some(t) => when(
        col(t).isNotNull && col(t) >= 0 && col(scoreCol).isNotNull,
        col(t).cast("long")).otherwise(raise_error(concat(
          lit(s"selectByFraction: needs a non-negative token count ('$t')"),
          lit(s" and a non-null score ('$scoreCol'), got ("),
          coalesce(col(t).cast("string"), lit("NULL")), lit(", "),
          coalesce(col(scoreCol).cast("string"), lit("NULL")),
          lit(") for id "), coalesce(col(idCol).cast("string"), lit("NULL")))))
      case None => when(col(scoreCol).isNotNull, lit(1L))
        .otherwise(raise_error(concat(
          lit(s"selectByFraction: score ('$scoreCol') must be non-null, " +
            "got NULL for id "),
          coalesce(col(idCol).cast("string"), lit("NULL")))))
    }
    // pass 1: per-group exact total + conservative fraction threshold
    // (one narrow aggregation — only (score, mass) sketch entries and
    // a long cross the shuffle, never rows)
    val agg = df.groupBy(col(groupCol).as("_sfg"))
      .agg(sum(checkedMass).as("_tot"),
        graft.functions.native.score_mass_quantile_threshold(
          col(scoreCol).cast("double"), checkedMass, keepPpm).as("_thr"))
      .withColumn("_budget",
        floor(col("_tot").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * lit(keepPpm) / lit(1000000L)).cast("long"))
    val survivors = df.join(agg, col(groupCol) <=> col("_sfg"))
      .filter(col("_thr").isNull || col(scoreCol) >= col("_thr"))
    // pass 2: the exact window over the ~fraction-mass survivors
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc, col(idCol))
    survivors
      .withColumn("cum_mass", sum(checkedMass).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .filter(col("cum_mass") <= col("_budget"))
      .select(df.columns.map(col).toSeq ++ Seq(col("sel_rank"),
        col("cum_mass"), col("_budget").as("keep_budget")): _*)
  }

  /** The per-row bucket in [0, 1e6). `salt` decorrelates independent
    * decisions over the same corpus — without it, a 10% sample would sit
    * entirely inside the first 10% of every split. NULL stratum = the
    * unlisted/default stratum; the key must coalesce it first —
    * concat(NULL, ...) nulls the whole key, the bucket comparison would
    * go NULL, and a filter would silently DROP every null-stratum row.
    * NULL shares buckets with the empty string (oracle: COALESCE).
    *
    * A NULL id, by contrast, is NOT coalesced — it nulls the key, so
    * [[stratifiedHash]] drops the row and [[assignSplits]] labels it
    * `rest`. That is deliberate: ids are the sampling identity, and two
    * distinct null-id rows coalesced to one key would always land in the
    * same bucket (correlated fate with no identity to justify it). A SQL
    * oracle using the raw id behaves identically (NULL comparisons are
    * falsy there too). Require non-null ids upstream if every row must
    * be eligible. */
  private def hashBucket(salt: String, stratumCol: String,
                         idCol: String): org.apache.spark.sql.Column =
    pmod(native.hash60(
      concat(lit(salt), lit(":"), coalesce(col(stratumCol), lit("")), lit(":"),
        col(idCol).cast("string"))), lit(1000000L))

  // the bottom-k ranking key: portable hash of ("bottomk", salt, id) —
  // NULL ids null the key (no identity → not eligible), mirroring
  // hashBucket's NULL-id rule
  private def bottomKey(salt: String, idCol: String): org.apache.spark.sql.Column =
    native.hash60(concat(lit("bottomk:"), lit(salt), lit(":"),
      col(idCol).cast("string")))

  /** Deterministic FIXED-SIZE uniform sample: the `k` rows with the
    * smallest portable hash of (salt, id) — bottom-k by hash, the
    * mergeable fixed-size sampling scheme. Where [[stratifiedHash]]
    * fixes a RATE, this fixes a COUNT (eval seeds, inspection sets,
    * codebook training subsets). Growing the corpus only DISPLACES
    * sampled rows (a new row enters iff its hash beats the current
    * k-th), never reshuffles survivors, and any engine computing the
    * same hash agrees on the exact row set. `salt` decorrelates
    * independent samples; NULL ids are never sampled (no identity).
    *
    * Scale shape: `orderBy(key).limit(k)` plans as TakeOrdered —
    * per-partition k-heaps, only k rows per partition reach the single
    * merge; no full sort, no full shuffle, text rides only for winners. */
  def bottomK(df: DataFrame, idCol: String, k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.withColumn("_bk", bottomKey(salt, idCol))
      .filter(col("_bk").isNotNull)
      .orderBy(col("_bk"), col(idCol))
      .limit(k)
      .drop("_bk")
  }

  /** Quantile ESTIMATION from a deterministic fixed-size sample: exact
    * linear-interpolation (type-7) percentiles of `valueCol` over the
    * [[bottomK]] hash sample. Completes the sketch family ([[Sketch]]
    * covers distinct counts and frequencies) with a quantile estimator
    * whose single corpus pass is the TakeOrdered sample — no global
    * sort ever happens; the k winners (id + value only, never text)
    * reach one task and the percentile runs over k rows. Error is the
    * classic sample-quantile bound (±O(1/√k) in rank), and because the
    * sample is keyed on the portable id hash, two runs — or two
    * engines — estimate from the SAME rows. NULL values inside the
    * sample are ignored by the percentile aggregate (but still consumed
    * sample slots — filter upstream if `valueCol` is sparse).
    * Output: one row per requested probability — (`p`, `value`). */
  def sampleQuantiles(df: DataFrame, idCol: String, valueCol: String,
                      probs: Seq[Double], k: Int,
                      salt: String = ""): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "probabilities must be in [0, 1]")
    val ps = probs.toArray
    // an all-NULL (or empty) sample makes the percentile agg NULL —
    // posexplode(NULL) would emit ZERO rows and break the one-row-per-
    // probability contract; pad to an array of null estimates instead
    val nullQs = array(ps.map(_ => lit(null).cast("double")).toSeq: _*)
    bottomK(df.select(col(idCol), col(valueCol)), idCol, k, salt)
      .agg(percentile(col(valueCol), lit(ps)).as("qs"))
      .select(posexplode(coalesce(col("qs"), nullQs)).as(Seq("i", "value")))
      .select(element_at(lit(ps), col("i") + 1).as("p"), col("value"))
  }

  /** Deterministic GLOBAL SHUFFLE rank — the "shuffle the corpus before
    * sharding" step of a training pipeline: every row gets a dense
    * `shuffle_pos` in `[0, N)` that is a pseudo-random permutation of
    * the corpus, keyed on the portable content hash (no RNG state), so
    * two runs — or two engines — produce the SAME permutation and a
    * shard writer can lay sequences out in `shuffle_pos` order knowing
    * adjacent documents are decorrelated. `salt` selects the
    * permutation (one per training run); NULL ids have no shuffle
    * identity and fail loudly (a silently dropped row would shift every
    * later position).
    *
    * Scale shape — a global rank WITHOUT a global sort: the total order
    * is (bucket, key, id) where `bucket = key mod buckets`; pass 1
    * counts rows per bucket (one tiny hash agg, ≤ `buckets` longs to
    * the driver) and prefix-sums the counts into per-bucket OFFSETS;
    * pass 2 ranks within each bucket (one hash shuffle + per-bucket
    * sort of N/buckets rows) and adds the broadcast offset. No task
    * ever sorts more than ~N/buckets rows. NOTE: bucket =
    * `key mod buckets` is NOT a prefix of the plain (key, id) order,
    * so the permutation depends on `buckets` as well as `salt` — fix
    * BOTH per training run (every (salt, buckets) pair is an equally
    * good permutation; the default keeps tasks sized for any corpus).
    * A SQL oracle replays the exact order as
    * `row_number() OVER (ORDER BY key % B, key, id) - 1`. `df` is
    * evaluated twice (the hash key is deterministic) — cache upstream
    * if it is an expensive derived pipeline; `idCol` should be unique
    * (it is the tie-break — duplicate (key, id) pairs make the
    * position assignment among those exact duplicates arbitrary).
    *
    * Shuffling an EPOCH-MIXED corpus ([[repeatByWeight]] output, where
    * `(id, epoch)` is the row identity): derive a PORTABLE string key
    * — `concat(id, ':', epoch)` — rather than passing the struct
    * `copy_id` (struct→string casts render engine-specifically, so
    * the permutation would not replay in a SQL oracle; the concat
    * form hashes identically everywhere and keeps copies of one
    * document decorrelated, which is the point of shuffling them). */
  def shuffleRank(df: DataFrame, idCol: String, salt: String = "",
                  buckets: Int = 1024): DataFrame =
    shuffleRankN(df, idCol, salt, buckets)._1

  /** [[shuffleRank]] also returning the TOTAL row count its pass-1
    * bucket counts already measured — a downstream
    * [[TokenStream.sliceWindows]] (whose N is this rank's N by the
    * density contract) then skips its own counting pass, which would
    * otherwise re-evaluate the whole rank pipeline. */
  private[graft] def shuffleRankN(df: DataFrame, idCol: String,
                                  salt: String = "",
                                  buckets: Int = 1024): (DataFrame, Long) = {
    // upper bound because the per-bucket offsets ride the plan as a
    // broadcast map literal (~20 B/entry — 64k ≈ 1.3 MB is fine, an
    // unbounded count would bloat every task's plan); 64k buckets
    // already caps the per-task sort at ~N/65536 rows
    require(buckets >= 1 && buckets <= (1 << 16),
      s"buckets must be in [1, 65536], got $buckets")
    val key = when(col(idCol).isNotNull,
      native.hash60(concat(lit("shuffle:"), lit(salt), lit(":"),
        col(idCol).cast("string"))))
      .otherwise(raise_error(lit(
        s"shuffleRank: id column '$idCol' must be non-null — a NULL id " +
          "has no shuffle identity and would shift every later position")))
    val keyed = df.withColumn("_sk", key)
      .withColumn("_sb", pmod(col("_sk"), lit(buckets.toLong)))
    // pass 1: per-bucket counts -> exclusive prefix-sum offsets (driver,
    // bounded by `buckets`)
    val counts = keyed.groupBy("_sb").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // row_number() is 32-bit: a bucket past 2^31 rows would overflow the
    // within-bucket rank silently. Pass 1 holds the exact counts — refuse
    // loudly and tell the caller the fix (more buckets).
    counts.foreach { case (b, c) =>
      require(c <= Int.MaxValue.toLong,
        s"shuffleRank: bucket $b holds $c rows (> 2^31 overflows the " +
          s"within-bucket rank) — raise `buckets` (currently $buckets)")
    }
    val offsets = counts.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, c)) => (b, acc + c)
    }.sliding(2).collect { case Array((_, off), (b, _)) => (b, off) }.toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(
        element_at(typedLit(offsets.map { case (b, o) => b.toString -> o }),
          col("_sb").cast("string")), lit(0L))
    // pass 2: within-bucket rank (each task sorts ~N/buckets rows) +
    // the broadcast offset = the dense global position
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_sb").orderBy(col("_sk"), col(idCol))
    (keyed
      .withColumn("shuffle_pos",
        offCol + row_number().over(w).cast("long") - 1L)
      .drop("_sk", "_sb"), counts.map(_._2).sum)
  }

  /** CURRICULUM-ordered corpus rank — [[shuffleRank]] with a leading
    * STAGE key: the annealing / curriculum-learning layout (order the
    * stream so training stage 0 is consumed first, then stage 1, …
    * — e.g. the main pretraining mix followed by a high-quality
    * annealing tail) while documents WITHIN a stage stay
    * hash-decorrelated exactly like a plain shuffle. Total order:
    * `(stage, bucket, key, id)` with `key = hash60(curriculum:salt:id)`
    * and `bucket = key mod buckets` — a SQL oracle replays it as
    * `row_number() OVER (ORDER BY stage, key % B, key, id) - 1`. The
    * output `shuffle_pos` is the same dense `[0, N)` contract every
    * downstream consumer ([[ShardWriter.writeShards]],
    * [[TokenStream.sliceWindows]]) already requires, so an annealed
    * window stream is this rank fed straight into the window slicer.
    *
    * `stageCol` must be non-null and numeric (try_cast refusal — a
    * NULL stage has no place in the schedule); stages are curriculum
    * PHASES (a handful), not domains: the per-(stage, bucket) offset
    * table rides the plan as a broadcast literal, bounded to 65536
    * entries like [[shuffleRank]]'s (`stages × buckets` must fit —
    * lower `buckets` for a many-stage schedule). Scale shape is
    * [[shuffleRank]]'s verbatim: one tiny count pass, one hash
    * shuffle + per-(stage, bucket) sort of ~N/(stages·buckets) rows,
    * no global sort anywhere. `df` evaluates twice; same (salt,
    * buckets)-dependence caveat. */
  def curriculumRank(df: DataFrame, idCol: String, stageCol: String,
                     salt: String = "", buckets: Int = 1024): DataFrame =
    curriculumRankN(df, idCol, stageCol, salt, buckets)._1

  /** [[curriculumRank]] also returning the total row count — the
    * [[shuffleRankN]] rationale verbatim. */
  private[graft] def curriculumRankN(df: DataFrame, idCol: String,
                                     stageCol: String, salt: String = "",
                                     buckets: Int = 1024): (DataFrame, Long) = {
    require(buckets >= 1 && buckets <= (1 << 16),
      s"buckets must be in [1, 65536], got $buckets")
    val stageLong = expr(s"try_cast(`$stageCol` AS BIGINT)")
    val checkedStage = when(stageLong.isNotNull, stageLong)
      .otherwise(raise_error(concat(
        lit(s"curriculumRank: stage column '$stageCol' must be non-null " +
          "and numeric, got: "),
        coalesce(col(stageCol).cast("string"), lit("NULL")))))
    val key = when(col(idCol).isNotNull,
      native.hash60(concat(lit("curriculum:"), lit(salt), lit(":"),
        col(idCol).cast("string"))))
      .otherwise(raise_error(lit(
        s"curriculumRank: id column '$idCol' must be non-null — a NULL " +
          "id has no shuffle identity and would shift every later position")))
    val keyed = df.withColumn("_sk", key)
      .withColumn("_ss", checkedStage)
      .withColumn("_sb", pmod(col("_sk"), lit(buckets.toLong)))
    // pass 1: per-(stage, bucket) counts -> exclusive prefix-sum
    // offsets in (stage, bucket) order (driver, bounded by the literal
    // cap below)
    val counts = keyed.groupBy("_ss", "_sb")
      .agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    require(counts.length <= (1 << 16),
      s"curriculumRank: ${counts.length} (stage, bucket) cells exceed " +
        "the 65536 broadcast-offset cap — lower `buckets` or coarsen " +
        "the stage column (stages are curriculum phases, not domains)")
    counts.foreach { case ((st, b), c) =>
      require(c <= Int.MaxValue.toLong,
        s"curriculumRank: cell (stage=$st, bucket=$b) holds $c rows " +
          s"(> 2^31 overflows the within-cell rank) — raise `buckets`")
    }
    val offsets = counts.scanLeft(((Long.MinValue, Long.MinValue), 0L)) {
      case ((_, acc), (sb, c)) => (sb, acc + c)
    }.sliding(2).collect { case Array((_, off), (sb, _)) => (sb, off) }.toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(
        element_at(typedLit(offsets.map { case ((st, b), o) =>
          s"$st:$b" -> o }),
          concat(col("_ss").cast("string"), lit(":"),
            col("_sb").cast("string"))), lit(0L))
    // pass 2: within-cell rank + the broadcast offset = the dense
    // global curriculum position
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_ss", "_sb").orderBy(col("_sk"), col(idCol))
    (keyed
      .withColumn("shuffle_pos",
        offCol + row_number().over(w).cast("long") - 1L)
      .drop("_sk", "_ss", "_sb"), counts.map(_._2).sum)
  }

  /** [[bottomK]] within each `groupCol` value — "k docs per source" for
    * stratified eval sets and per-stratum inspection.
    *
    * Scale shape: a grouped TakeOrdered does not exist in Spark, and
    * the direct rank-filtered window would sort every group's FULL row
    * set per partition (text and all — the per-partition sort footprint
    * this codebase bounds everywhere else). Instead: (1) one NARROW
    * pass aggregates each group's k-th-smallest hash key with the
    * bounded [[graft.functions.BottomKthKey]] heap — only (group, key)
    * pairs shuffle, ≤ k longs per group per map task; (2) the
    * per-group THRESHOLD joins back (one row per group, so AQE
    * broadcasts it from its runtime size — the
    * group cardinality of "k docs per source" is sources × splits, as
    * with [[packByTokenBudget]]'s groups, driver-small by design) and
    * `key <= threshold` keeps exactly the winners plus any boundary
    * hash ties; (3) a rank window over that O(k·groups) survivor set
    * settles ties by (key, id) — identical output to the direct
    * window, but full-width rows never sort and never shuffle beyond
    * the ≤ ~k winners per group. `df` is evaluated twice (the kernel
    * hash is deterministic); cache upstream if it is an expensive
    * derived pipeline. */
  def bottomKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keyed = df.withColumn("_bk", bottomKey(salt, idCol))
      .filter(col("_bk").isNotNull)
    val thr = keyed.groupBy(col(groupCol).as("_bkg"))
      .agg(graft.functions.native.bottom_kth_key(col("_bk"), k).as("_thr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("_bk"), col(idCol))
    // NULL-safe join back: groupBy keeps a NULL group as its own row,
    // and the window's PARTITION BY gives it its own partition — an
    // equi-join here would silently DROP every null-group row instead
    // of returning that group's bottom-k (a real stratum in corpora
    // with unattributed sources). No broadcast hint — one row per
    // group, AQE broadcasts from the ACTUAL size (selectByBudget's
    // high-cardinality-group rationale)
    keyed.join(thr, col(groupCol) <=> col("_bkg"))
      .filter(col("_bk") <= col("_thr"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(df.columns.map(col).toSeq: _*)
  }
}
