package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** Plan-SHAPE regression suite. The repo's scale guarantees — partition
  * pruning on every persisted-index probe, codes-only scans on the PQ
  * trees, the fuzzy join's sort-merge pin — live in physical-plan
  * structure, not in result values: a Spark upgrade or a refactor can
  * silently un-prune a probe (full index scan per query) while every
  * value-level oracle gate stays green. These tests pin the plans
  * themselves, consolidated in one place so the contract is auditable
  * (individual operator specs keep their own inline asserts too).
  *
  * Note on the BroadcastNestedLoopJoin asserts: probe plans must never
  * contain one — a BNLJ over an index-sized side is the quadratic
  * disaster shape. (Some non-probe operators legitimately `crossJoin` a
  * ONE-ROW aggregate, e.g. tfidfCosinePairs' corpus count; those are
  * not probe plans and are not asserted here.) */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Every `PartitionFilters: [...]` bracket in the plan — pruning
    * asserts must look INSIDE one (the label prints on every
    * partitioned scan, even when empty). */
  private def partitionFilters(p: String): Seq[String] =
    "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(p).toSeq

  private def docsDf = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")
  private def embsDf = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  private lazy val textIdx: String = {
    val path = TestSpark.tmpDir("planspec-ti") + "/ti"
    TextIndex.buildTextIndex(docsDf, "doc_id", "text", path, nBuckets = 16)
    path
  }
  private lazy val ivfIdx: String = {
    val path = TestSpark.tmpDir("planspec-ivf") + "/ivf"
    val cb = embsDf.orderBy("vec_id").limit(8)
      .collect().toSeq.map(_.getSeq[Float](1).map(_.toDouble).toSeq)
    Similarity.buildIvfIndex(embsDf, "vec_id", "embedding", cb, path)
    path
  }
  private lazy val ivfPqIdx: String = {
    val path = TestSpark.tmpDir("planspec-ivfpq") + "/ipq"
    val coarse = embsDf.orderBy("vec_id").limit(8)
      .collect().toSeq.map(_.getSeq[Float](1).map(_.toDouble).toSeq)
    val cbs = Quantize.pqCodebooks(embsDf, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 0)
    Quantize.buildIvfPqIndex(embsDf, "vec_id", "embedding", coarse, cbs, path)
    path
  }
  private lazy val q: Seq[Float] = embsDf.filter($"vec_id" === 0)
    .select("embedding").collect()(0).getSeq[Float](0)

  test("text probes prune to the query tokens' buckets; no nested-loop join") {
    val probes = Seq(
      "overlap"   -> TextIndex.searchIndex(spark, textIdx, "spark data", 5),
      "bm25"      -> TextIndex.searchIndexBM25(spark, textIdx, "spark data", 5),
      "bm25Batch" -> TextIndex.searchBM25Batch(spark, textIdx,
        Seq("spark data", "fast join"), 5),
      "proximity" -> TextIndex.searchProximity(spark, textIdx, "spark data", 5),
      "phrase"    -> TextIndex.searchPhrase(spark, textIdx, "spark data", 5))
    probes.foreach { case (name, df) =>
      val p = plan(df)
      assert(partitionFilters(p).exists(_.contains("bucket")),
        s"$name probe not bucket-pruned:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name probe has a BNLJ:\n$p")
    }
  }

  test("IVF probes and the batch knn join prune list directories; no nested-loop join") {
    val top = Similarity.ivfTopKIndexed(spark, ivfIdx, q, 5, 2)
    val tp = plan(top)
    assert(partitionFilters(tp).exists(_.contains("list")), tp)
    val join = Similarity.knnJoinIndexed(spark, ivfIdx,
      embsDf.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, nprobe = 2)
    val jp = plan(join)
    assert(partitionFilters(jp).exists(_.contains("list")), jp)
    assert(!tp.contains("BroadcastNestedLoopJoin") &&
      !jp.contains("BroadcastNestedLoopJoin"))
  }

  test("per-group top-k cuts are bounded aggregates — no rank-filtered window in any converted plan") {
    // the round-13 memory model: a WindowExec here would mean a full
    // per-partition sort of the candidate relation is back (the
    // structure that OOMed the >64k re-rank at the 8g heap edge)
    val cuts = Seq(
      "knnJoin" -> Similarity.knnJoin(embsDf.filter($"vec_id" < 3),
        "vec_id", "embedding", embsDf, "vec_id", "embedding", k = 5),
      "knnJoinIndexed" -> Similarity.knnJoinIndexed(spark, ivfIdx,
        embsDf.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, nprobe = 2),
      "ivfPqKnnJoin" -> Quantize.ivfPqKnnJoin(spark, ivfPqIdx,
        embsDf.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, nprobe = 2),
      "bm25Batch" -> TextIndex.searchBM25Batch(spark, textIdx,
        Seq("spark data", "fast join"), 5))
    cuts.foreach { case (name, df) =>
      val p = plan(df)
      assert(!p.contains("Window"),
        s"$name per-query cut regressed to a rank-filtered window:\n$p")
      assert(p.contains("top_k_by_score"),
        s"$name per-query cut is not the bounded aggregate:\n$p")
    }
    // bottomKPerGroup: the window survives by design, but ONLY over the
    // threshold-cut survivors — the narrow bottom_kth_key pass must be
    // in the plan ahead of it
    val pg = plan(Sample.bottomKPerGroup(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select($"doc_id", $"source"), "source", "doc_id", 3))
    assert(pg.contains("bottom_kth_key"),
      s"bottomKPerGroup lost its threshold pass:\n$pg")
    // selectByBudget: same discipline, mass-weighted — the bounded
    // score_mass_threshold pass must precede the exact window, so one
    // giant skewed source never full-sorts its row set
    val sb = plan(Sample.selectByBudget(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select($"doc_id", $"source", $"n_chars",
          length($"text").cast("long").as("n_tok")),
      "source", "doc_id", "n_chars", "n_tok", 2048L))
    assert(sb.contains("score_mass_threshold"),
      s"selectByBudget lost its threshold pre-cut:\n$sb")
    assert(sb.contains("Window"),
      s"selectByBudget's exact pass vanished:\n$sb")
    // ...and since r15 the threshold join carries NO forced broadcast
    // hint: the static plan may fall back to a sort-merge pair (AQE
    // converts from the runtime size), but a ResolvedHint-forced
    // BroadcastExchange of the threshold side must NOT reappear — a
    // high-cardinality group column has to be able to degrade to a
    // shuffle join instead of a driver OOM. The hint-free plan at
    // this scale shows the SMJ/shuffle fallback structure.
    assert(sb.contains("SortMergeJoin") || sb.contains("ShuffledHashJoin") ||
      sb.contains("AdaptiveSparkPlan"),
      s"selectByBudget's threshold join lost its unhinted form:\n$sb")
  }

  test("shuffleRank: two-pass bucketed rank — no global sort, no single-partition window") {
    // the whole point of the operator: a dense global permutation
    // WITHOUT `row_number() OVER (ORDER BY ...)` over everything —
    // which would plan as Exchange rangepartitioning (a global sort)
    // or, worse, Exchange SinglePartition ahead of the window. The
    // window must partition by the bucket column.
    val sr = plan(Sample.shuffleRank(docsDf.select($"doc_id"), "doc_id",
      salt = "plan", buckets = 16))
    assert(!sr.contains("rangepartitioning"),
      s"shuffleRank regressed to a global sort:\n$sr")
    assert(!sr.contains("SinglePartition"),
      s"shuffleRank funneled the corpus through one partition:\n$sr")
    assert(sr.contains("hashpartitioning(_sb"),
      s"shuffleRank's per-bucket window partitioning vanished:\n$sr")
    assert(sr.contains("Window"), s"shuffleRank lost its rank window:\n$sr")
  }

  test("IVFPQ probes: pruned lists AND codes-only scans (no float vectors off the index)") {
    val p1 = plan(Quantize.ivfPqTopKIndexed(spark, ivfPqIdx, q, 5, 2))
    assert(partitionFilters(p1).exists(_.contains("list")), p1)
    assert(!p1.contains("embedding"), s"index probe reads float vectors:\n$p1")
    val pj = plan(Quantize.ivfPqKnnJoin(spark, ivfPqIdx,
      embsDf.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, nprobe = 2))
    assert(partitionFilters(pj).exists(_.contains("list")), pj)
    assert(!pj.contains("BroadcastNestedLoopJoin"), pj)
  }

  test("fuzzy join keeps its sort-merge pin on the neighborhood equi-join") {
    // the pin exists because the planner cannot see the explode factor
    // of the deletion neighborhoods (Generate keeps child stats): a
    // broadcast pick collects the exploded side, a shuffled-hash build
    // cannot spill — SortMergeJoin is the only strategy that survives
    // at volume (FuzzyJoin.scala documents both observed failures)
    val keys = spark.range(200)
      .select($"id".as("kid"), concat(lit("name-"), $"id").as("key"))
    val p = plan(FuzzyJoin.editDistancePairs(keys, "kid", "key",
      keys.select($"kid".as("kid2"), $"key".as("key2")), "kid2", "key2",
      maxDist = 1))
    // the pin applies to the VARIANT-HASH join (the exploded sides);
    // the post-dedup key re-attach joins are id-keyed against the
    // un-exploded inputs and may broadcast freely
    val vhJoins = p.split("\n").filter(l =>
      l.contains("Join") && l.contains("[_vh"))
    assert(vhJoins.exists(_.contains("SortMergeJoin")), p)
    assert(!vhJoins.exists(_.contains("BroadcastHashJoin")),
      s"neighborhood join broadcast:\n$p")
    assert(!vhJoins.exists(_.contains("ShuffledHashJoin")),
      s"neighborhood join hash-built:\n$p")
    // and the exploded relation must never feed a broadcast exchange:
    // every BroadcastExchange in this plan builds on an un-exploded
    // key projection (no Generate below it) — cheap textual proxy:
    // the explode's Generate appears only under the sort-merge side
    assert(!p.contains("BroadcastExchange") ||
      p.contains("SortMergeJoin"), p)
  }

  test("IVFADC re-rank stage 2 pushes the candidate ids into the corpus scan") {
    val refined = Quantize.ivfPqTopKRefined(spark, ivfPqIdx, embsDf,
      "vec_id", "embedding", q, k = 3, r = 10, nprobe = 2)
    val p = plan(refined)
    // the r-candidate filter must reach the parquet scan as a pushed
    // id IN (...) predicate — r rows of float I/O, not a corpus scan
    assert(p.contains("PushedFilters: [In(vec_id"), p)
  }

  test("ADC probe scoring stays inside whole-stage codegen") {
    // the scoring projection must sit UNDER a WholeStageCodegen node —
    // the composed element_at unroll it replaced overflowed janino's
    // 64 KB method limit at realistic (m, ksub) and silently dropped
    // the stage to interpreted evaluation (observed in the r10 judge
    // run); the kernel call must also survive codegen generation
    // (ExprSpec's no-CodegenFallback test covers the expression class;
    // this pins the PLAN placement)
    // WSCG spans of the EXECUTED plan: a plan with exchanges sits under
    // an AdaptiveSparkPlanExec whose pre-execution tree holds no
    // WholeStageCodegen nodes at all (codegen collapse runs per query
    // stage) — so run the query, then walk through the AQE root and
    // into materialized query stages
    import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def wscgSpans(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect()
      def spans(p: SparkPlan): Seq[String] = p.collect {
        case w: WholeStageCodegenExec => Seq(w.toString)
        case a: AdaptiveSparkPlanExec => spans(a.executedPlan)
        case s: QueryStageExec => spans(s.plan)
      }.flatten
      spans(df.queryExecution.executedPlan)
    }
    val probe = Quantize.ivfPqTopKIndexed(spark, ivfPqIdx, q, 5, 2)
    assert(wscgSpans(probe).exists(_.contains("adc_score")),
      s"ADC scoring not inside a WholeStageCodegen span:\n${plan(probe)}")
    // and the whole suite's plans must have compiled without a janino
    // fallback: encode/assign argmaxes are native kernels now, so no
    // generated method can grow with (m, ksub, nlist)
    val join = Quantize.ivfPqKnnJoin(spark, ivfPqIdx,
      embsDf.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, nprobe = 2)
    assert(wscgSpans(join).exists(_.contains("adc_score")),
      s"batch ADC scoring not inside a WholeStageCodegen span:\n${plan(join)}")
    // the query-side projection — probe ranking (top_lists) and the
    // m×ksub ADC table (pq_lut), the two expressions whose composed
    // forms GREW with nlist/ksub and overflowed at production width —
    // must also stay inside a codegen span
    val js = wscgSpans(join)
    assert(js.exists(_.contains("top_lists")),
      s"probe ranking not inside a WholeStageCodegen span:\n${plan(join)}")
    assert(js.exists(_.contains("pq_lut")),
      s"ADC table projection not inside a WholeStageCodegen span:\n${plan(join)}")
    // the BPE apply kernel is the same discipline — a per-row scan-side
    // projection that must neither fall back to interpreted eval nor
    // widen the scan: only `text` (plus the id) may reach the parquet
    // read
    val enc = Bpe.encode(docsDf, "doc_id", "text",
      Seq(("t", "h"), ("th", "e")))
    assert(wscgSpans(enc).exists(_.contains("bpe_encode")),
      s"BPE apply not inside a WholeStageCodegen span:\n${plan(enc)}")
    val encScan = plan(enc)
    assert("ReadSchema: [^\\n]*".r.findFirstIn(encScan)
      .exists(s => s.contains("text") && !s.contains("lang")),
      s"BPE encode scan not pruned to (doc_id, text):\n$encScan")
    // the model-token chunker rides the same shape: the kernel
    // projection feeding the Generate stays codegen'd, scan pruned
    val chk = Bpe.chunkByTokenBudget(docsDf, "doc_id", "text",
      Seq(("t", "h"), ("th", "e")), budget = 16L)
    assert(wscgSpans(chk).exists(_.contains("bpe_chunk")),
      s"BPE chunk kernel not inside a WholeStageCodegen span:\n${plan(chk)}")
    val chkScan = plan(chk)
    assert("ReadSchema: [^\\n]*".r.findFirstIn(chkScan)
      .exists(s => s.contains("text") && !s.contains("lang")),
      s"BPE chunk scan not pruned to (doc_id, text):\n$chkScan")
  }

  test("epochDiff scans are column-pruned to id+token; no nested-loop join") {
    // the diff's contract is "text and vectors never move": both epoch
    // scans must read ONLY the id and token columns even when the tree
    // carries payload (a select-* before the join would silently ship
    // the corpus through the shuffle)
    val root = TestSpark.tmpDir("planspec-ep") + "/ep"
    def pub(ids: Range, budget: Long): Int = ShardWriter.writeShardEpoch(
      Sample.shuffleRank(
        ids.map(i => (i.toLong, 5L, s"payload-$i")).toSeq
          .toDF("doc_id", "n_tok", "text"),
        "doc_id", "p", 8),
      "doc_id", "n_tok", 2, root, "p", 8, budget)
    assert(pub(0 until 50, 1L) == 0 && pub(25 until 75, 2L) == 1)
    val diff = ShardWriter.epochDiff(spark, root, 0, 1)
    val p = plan(diff)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    val schemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    assert(schemas.size >= 2, s"expected two epoch scans:\n$p")
    schemas.foreach(s => assert(
      !s.contains("text") && !s.contains("shuffle_pos"),
      s"epoch scan not pruned to (doc_id, n_tok): $s"))
    // ...and the plan actually computes the right thing
    assert(diff.count() == 50L)
  }

  test("sliceWindows: bucketed offsets + one window_id shuffle — no global sort") {
    // the token stream is NEVER ordered globally: offsets come from the
    // per-block window (hashpartitioning on the block column) plus the
    // broadcast per-block prefix map, and the only full-width movement
    // is the hash shuffle that reassembles windows. A regression to
    // `SUM(...) OVER (ORDER BY pos)` over everything would plan as
    // Exchange rangepartitioning (or SinglePartition) ahead of the
    // window — the shape this test forbids.
    val toks = docsDf.select($"doc_id",
      split(lower($"text"), "\\s+").as("ts"))
    val pos = Sample.shuffleRank(toks, "doc_id", salt = "plan-tw",
      buckets = 8)
    val p = plan(TokenStream.sliceWindows(pos, "shuffle_pos", "ts", 64,
      blocks = 8, dropPartial = false))
    assert(!p.contains("rangepartitioning"),
      s"sliceWindows regressed to a global sort:\n$p")
    assert(!p.contains("SinglePartition"),
      s"sliceWindows funneled the stream through one partition:\n$p")
    assert(p.contains("hashpartitioning(_tsb"),
      s"sliceWindows' per-block offset window partitioning vanished:\n$p")
    assert(p.contains("hashpartitioning(window_id") ||
      p.contains("hashpartitioning(_tsw"),
      s"sliceWindows lost its window_id reassembly shuffle:\n$p")
  }

  test("resumeTokensIntoEpoch: per-block densify, id-only consumed side, no global sort") {
    // the continuation chain must keep every discipline it composes:
    // the consumed-doc side of the anti-join moves ids only (ONE scan
    // reads the token arrays — the new epoch's), the re-densify rank is
    // the per-block window + broadcast offsets (never rangepartitioning
    // or a single-partition window), and sliceWindows' shape rides on
    // top unchanged
    val docRoot = TestSpark.tmpDir("planspec-rte") + "/docs"
    val winRoot = TestSpark.tmpDir("planspec-rte") + "/wins"
    val base = (0L until 24L).map(i =>
        (i, (0 until 5).map(j => s"d$i-$j")))
      .toDF("doc_id", "ts")
      .withColumn("n_tok", size($"ts").cast("long"))
    val pos0 = Sample.shuffleRank(base, "doc_id", "rte", 4)
    assert(ShardWriter.writeShardEpoch(pos0, "doc_id", "n_tok", 2,
      docRoot, "rte", 4, budget = 100L, maxRowsPerFile = 4L) == 0)
    assert(TokenStream.writeContextEpoch(pos0, "shuffle_pos", "ts", 8, 2,
      winRoot, "rte", 4, maxWindowsPerFile = 2L) == 0)
    val pos1 = Sample.shuffleRank(base.filter($"doc_id" % 5 =!= 0L),
      "doc_id", "rte", 4)
    assert(ShardWriter.writeShardEpoch(pos1, "doc_id", "n_tok", 2,
      docRoot, "rte", 4, budget = 99L, maxRowsPerFile = 4L) == 1)
    val out = TokenStream.resumeTokensIntoEpoch(spark, docRoot, winRoot,
      0, 1, 0, step = 1L, batchSize = 2L, "ts", 8, blocks = 4,
      dropPartial = false)
    val p = plan(out)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("rangepartitioning"),
      s"resume chain regressed to a global sort:\n$p")
    assert(!p.contains("SinglePartition"),
      s"resume chain funneled through one partition:\n$p")
    assert(p.contains("hashpartitioning(_dpb"),
      s"densify's per-block rank window vanished:\n$p")
    val tsScans = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
      .count(_.contains("ts"))
    assert(tsScans == 1,
      s"expected exactly ONE token-array scan (the new epoch), got " +
        s"$tsScans:\n$p")
    assert(out.count() > 0L)
  }
}
