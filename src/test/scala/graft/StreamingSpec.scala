package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{HDFStore, StoreMode}
import graft.streaming.EventStream

/** Structured-Streaming surface: store append sink (exactly-once replay
  * guard) + watermarked windowed aggregation, driven by a file stream. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  test("streaming append sink: micro-batches become segments, replays are idempotent") {
    val events = spark.read.parquet(eventsPath)
    val schema = events.schema
    val in = TestSpark.tmpDir("stream-in")
    val ckpt = TestSpark.tmpDir("stream-ckpt")
    val storeDir = TestSpark.tmpDir("stream-store")

    val st = HDFStore.open(spark, storeDir, StoreMode.Overwrite)
    st.put("events", events.limit(0)) // empty table, schema fixed

    // batch 1: first 400 events
    events.limit(400).write.mode("append").parquet(in)
    val stream1 = spark.readStream.schema(schema).parquet(in)
    EventStream.appendSink(stream1, st, "events", ckpt).awaitTermination()
    assert(st.nrows("events") == 400)

    // batch 2: 100 more — only the delta is appended
    events.limit(500).except(events.limit(400)).write.mode("append").parquet(in)
    val stream2 = spark.readStream.schema(schema).parquet(in)
    EventStream.appendSink(stream2, st, "events", ckpt).awaitTermination()
    assert(st.nrows("events") == 500)

    // restart with no new data: no duplicate appends
    val stream3 = spark.readStream.schema(schema).parquet(in)
    EventStream.appendSink(stream3, st, "events", ckpt).awaitTermination()
    assert(st.nrows("events") == 500)
    st.close()
  }

  test("context-window ingest: published windows == batch slice over the union; restart no-op") {
    // 30 docs, (i % 5) + 1 tokens each -> 90 tokens at ctx 8 = 11 full
    // windows + a 2-token tail; 10-doc batches hold 30 tokens each, so
    // every batch boundary lands MID-window and the carried tail (with
    // its global position provenance) is what makes the stream whole
    val docs = (0L until 30L).map(i =>
      (i, (0 until ((i % 5) + 1).toInt).map(j => s"d$i-$j"))).toDF("doc_id", "ts")
    val in = TestSpark.tmpDir("ctxwin-in")
    val ckpt = TestSpark.tmpDir("ctxwin-ckpt")
    val st = HDFStore.open(spark, TestSpark.tmpDir("ctxwin-store"),
      StoreMode.Overwrite)
    st.put("ctx", graft.ops.TokenStream.sliceWindows(
      docs.limit(0).withColumn("_p", lit(0L)), "_p", "ts", 8,
      dropPartial = false))
    def feed(lo: Long, hi: Long): Unit = {
      docs.filter($"doc_id" >= lo && $"doc_id" < hi)
        .write.mode("append").parquet(in); ()
    }
    def run(): Unit = EventStream.contextWindowIngestSink(
      spark.readStream.schema(docs.schema).parquet(in),
      st, "ctx", ckpt, "doc_id", "ts", 8, blocks = 4).awaitTermination()
    feed(0, 10); run()
    feed(10, 20); run()
    feed(20, 30); run()
    def landed() = st.table("ctx").df
      .select("window_id", "tokens", "doc_spans", "n_tok", "n_docs",
        "min_pos", "max_pos")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList,
        r.getSeq[org.apache.spark.sql.Row](2)
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toList,
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toList
    // ids 0..29 ARE the arrival ranks, so the batch equivalent is the
    // one-shot slice with pos = doc_id, full windows only
    val want = graft.ops.TokenStream.sliceWindows(
        docs.withColumn("_p", $"doc_id"), "_p", "ts", 8, blocks = 4,
        dropPartial = true)
      .select("window_id", "tokens", "doc_spans", "n_tok", "n_docs",
        "min_pos", "max_pos")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList,
        r.getSeq[org.apache.spark.sql.Row](2)
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toList,
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toList
    assert(landed() == want, s"\ngot  ${landed()}\nwant $want")
    assert(want.size == 11)
    // the carried tail holds the 2 leftover tokens with real provenance
    val tail = EventStream.loadCtxState(st, "ctx", "ctxWindows:" +
      java.util.UUID.nameUUIDFromBytes(ckpt.getBytes("UTF-8")).toString)
    assert(tail.tail.map(_._2.size).sum == 2 && tail.nextPos == 30L &&
      tail.nextWindow == 11L, tail.toString)
    // restart with no new data: nothing lands twice
    run()
    assert(landed() == want)
    // duplicate ids WITHIN one batch refuse loudly (arrival order would
    // be ambiguous); a re-arrival in a LATER batch is a re-occurrence —
    // the stream has no cross-batch identity
    feed(5, 7); feed(5, 7)
    intercept[Exception] { run() }
    assert(landed() == want)
    st.close()
  }

  test("watermarked windowed counts match the batch computation") {
    val events = spark.read.parquet(eventsPath)
    val schema = events.schema
    val in = TestSpark.tmpDir("streamw-in")
    val ckpt = TestSpark.tmpDir("streamw-ckpt")
    events.write.mode("append").parquet(in)

    val stream = spark.readStream.schema(schema).parquet(in)
    val q = EventStream.windowedCounts(stream, "30 minutes", "1 hour")
      .writeStream.outputMode("complete").format("memory").queryName("win")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("win")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val batch = EventStream.withEventTime(events)
      .groupBy(window(col("event_time"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream-static enrichment join == batch left join; unmatched facts survive") {
    val events = spark.read.parquet(eventsPath)
    val schema = events.schema
    val in = TestSpark.tmpDir("streame-in")
    val ckpt = TestSpark.tmpDir("streame-ckpt")
    events.write.mode("append").parquet(in)

    // dim covers only HALF the user ids: the other half must still
    // flow through (left join) with a null attribute
    val dim = Seq.tabulate(15)(i => (i.toLong * 2, s"seg${i % 3}"))
      .toDF("user_id", "segment")
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = EventStream.enrich(stream, dim, "user_id")
      .select("event_id", "user_id", "segment")
      .writeStream.outputMode("append").format("memory").queryName("enr")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("enr").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    val batch = events.join(dim, Seq("user_id"), "left")
      .select("event_id", "user_id", "segment").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(streamed == batch)
    // every fact survived — enrichment must never drop events
    assert(streamed.size == events.count())
    // both matched and unmatched facts are present
    assert(streamed.exists(_._3.isDefined) && streamed.exists(_._3.isEmpty))
    spark.catalog.dropTempView("enr")
  }

  test("session windows produce per-user sessions") {
    val events = spark.read.parquet(eventsPath)
    val in = TestSpark.tmpDir("streams-in")
    val ckpt = TestSpark.tmpDir("streams-ckpt")
    events.write.mode("append").parquet(in)
    val stream = spark.readStream.schema(events.schema).parquet(in)
    val q = EventStream.sessionWindows(stream, "30 minutes", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("sess")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table("sess").count()
    assert(n > 0)
    // session count per user must match the batch sessionizer
    val batchSessions = graft.ops.Sessionize.sessionStats(events, 1800).count()
    assert(spark.table("sess").count() == batchSessions)
  }

  test("streaming dedup keeps one row per content digest within the watermark") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).select($"doc_id", $"text")
    val stamped = docs.withColumn("event_time",
      timestamp_micros(lit(1700000000000000L) + $"doc_id" * 1000000L))
    val dups = stamped.withColumn("doc_id", $"doc_id" + 1000L) // same text, new id
    val extra = stamped.filter($"doc_id" < 10)
      .withColumn("doc_id", $"doc_id" + 2000L)
      .withColumn("text", concat($"text", lit(" fresh")))
    val in = TestSpark.tmpDir("streamd-in")
    val ckpt = TestSpark.tmpDir("streamd-ckpt")
    stamped.unionByName(dups).unionByName(extra).write.mode("append").parquet(in)

    val stream = spark.readStream.schema(stamped.schema).parquet(in)
    val q = EventStream.dedupStream(stream, "text", "event_time", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("dedup")
    assert(out.count() == 60)                                   // 50 distinct + 10 fresh
    assert(out.select("text").distinct().count() == 60)         // one per digest
    assert(out.columns.toSet == Set("doc_id", "text", "event_time")) // digest dropped
  }

  test("index-deduped append sink drops snapshot near-dups in flight, multi-batch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val ref = docs.filter($"doc_id" < 100)
    // incoming: 50 novel docs + 20 near-dup variants of indexed docs
    val batch = docs.filter($"doc_id" >= 100 && $"doc_id" < 150)
      .unionByName(docs.filter($"doc_id" < 20)
        .select(($"doc_id" + 9000L).as("doc_id"),
          concat($"text", lit(" zzz")).as("text")))
    val idxPath = TestSpark.tmpDir("streamdi-idx") + "/di"
    graft.ops.DedupIndex.buildDedupIndex(ref, "doc_id", "text", idxPath)
    val in = TestSpark.tmpDir("streamdi-in")
    val ckpt = TestSpark.tmpDir("streamdi-ckpt")
    val storeDir = TestSpark.tmpDir("streamdi-store")
    // two files, consumed one per micro-batch: the per-batch probe must
    // dedupe each independently against the index
    batch.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(in)
    batch.filter($"doc_id" % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)
    val st = HDFStore.open(spark, storeDir, StoreMode.Overwrite)
    st.put("kept", batch.limit(0))
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    EventStream.dedupAgainstIndexSink(stream, st, "kept", ckpt,
      idxPath, "doc_id", "text", 0.5).awaitTermination()
    val streamed = st.table("kept").df.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batchKept = graft.ops.DedupIndex.dedupAgainstIndex(spark, idxPath,
        batch, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batchKept,
      s"stream ${streamed.size} vs batch ${batchKept.size}")
    assert(streamed.count(_ >= 9000L) < 20, "some planted near-dups must drop")
    // survivors = exactly the batch ids the DIRECT cross-corpus join
    // leaves unmatched (the fixture itself contains genuine near-dups
    // across the 100 split, so "all novel survive" would be wrong)
    val matched = graft.ops.Dedup.minhashPairsAgainst(batch, ref, "doc_id", "text")
      .filter($"est_jaccard" >= 0.5)
      .select("id_new").collect().map(_.getLong(0)).toSet
    assert(streamed == batch.select("doc_id").collect().map(_.getLong(0)).toSet -- matched)
  }

  test("index-appending ingest sink: batch 2 dedupes against batch 1 survivors; restart idempotent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val ref = docs.filter($"doc_id" < 100)
    val b1 = docs.filter($"doc_id" >= 100 && $"doc_id" < 130)
      .unionByName(docs.filter($"doc_id" < 10)
        .select(($"doc_id" + 9000L).as("doc_id"),
          concat($"text", lit(" zzz")).as("text")))
    val b2 = docs.filter($"doc_id" >= 130 && $"doc_id" < 160)
      .unionByName(docs.filter($"doc_id" >= 100 && $"doc_id" < 105)
        .select(($"doc_id" + 8000L).as("doc_id"),
          concat($"text", lit(" zzz")).as("text")))
    val idxPath = TestSpark.tmpDir("streaming-idx") + "/di"
    graft.ops.DedupIndex.buildDedupIndex(ref, "doc_id", "text", idxPath)
    // EXPECTED via the batch ops on a second, independent index copy
    // (the sink mutates the real one): sequential two-step dedup
    val idx2 = TestSpark.tmpDir("streaming-idx2") + "/di"
    graft.ops.DedupIndex.buildDedupIndex(ref, "doc_id", "text", idx2)
    val s1 = graft.ops.DedupIndex.dedupAgainstIndex(spark, idx2, b1,
      "doc_id", "text", 0.5).localCheckpoint(true)
    graft.ops.DedupIndex.appendDedupIndex(s1, "doc_id", "text", idx2)
    val s2 = graft.ops.DedupIndex.dedupAgainstIndex(spark, idx2, b2,
      "doc_id", "text", 0.5)
    val expected = s1.select("doc_id").collect().map(_.getLong(0)).toSet ++
      s2.select("doc_id").collect().map(_.getLong(0)).toSet
    // sharpness: at least one b2 variant of a b1 SURVIVOR must be
    // dropped — that drop can only come from the index having grown
    val s1ids = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val grownDrops = (100L until 105L).filter(id =>
      s1ids.contains(id) && !expected.contains(id + 8000L))
    assert(grownDrops.nonEmpty,
      "fixture must contain a variant of a batch-1 survivor")
    // controlled batches: one file each, mtime-ordered, 1 file/trigger
    val in = new java.io.File(TestSpark.tmpDir("streaming-ing-in"))
    Seq(b1, b2).zipWithIndex.foreach { case (df, i) =>
      val stage = TestSpark.tmpDir(s"streaming-ing-stage$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(in, f"b$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val ckpt = TestSpark.tmpDir("streaming-ing-ckpt")
    val st = HDFStore.open(spark,
      TestSpark.tmpDir("streaming-ing-store"), StoreMode.Overwrite)
    st.put("kept", b1.limit(0))
    def run(): Unit = EventStream.dedupIndexIngestSink(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(in.toString),
      st, "kept", ckpt, idxPath, "doc_id", "text", 0.5).awaitTermination()
    run()
    val streamed = st.table("kept").df.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"stream ${streamed.size} vs sequential-batch ${expected.size}")
    // the index grew to ref ∪ survivors and verifies FRESH against it
    graft.ops.DedupIndex.requireDedupIndexFresh(spark, idxPath,
      ref.unionByName(b1.unionByName(b2)
        .filter($"doc_id".isin(expected.toSeq: _*))), "doc_id")
    // restart with no new data: no re-append to store OR index
    run()
    assert(st.table("kept").df.count() == expected.size)
    graft.ops.DedupIndex.requireDedupIndexFresh(spark, idxPath,
      ref.unionByName(b1.unionByName(b2)
        .filter($"doc_id".isin(expected.toSeq: _*))), "doc_id")
  }

  test("ingest sink auto-maintenance: overfilled Bloom compacts+resizes in flight; probes unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val ref = docs.filter($"doc_id" < 40)
    val b1 = docs.filter($"doc_id" >= 100 && $"doc_id" < 130)
    val b2 = docs.filter($"doc_id" >= 130 && $"doc_id" < 160)
    // Bloom sized for 50 ids: ref(40) + b1(30) overfills after batch 1,
    // so the maintainEvery=1 hook must compact WITH the automatic
    // resize (2x live ids) mid-stream; batch 2 then appends healthily
    val idxPath = TestSpark.tmpDir("streaming-maint-idx") + "/di"
    graft.ops.DedupIndex.buildDedupIndex(ref, "doc_id", "text", idxPath,
      expectedIds = 50L)
    // maintenance-free twin fed by the same sequential appends — the
    // compacted tree must probe IDENTICALLY to the never-compacted one
    val idx2 = TestSpark.tmpDir("streaming-maint-idx2") + "/di"
    graft.ops.DedupIndex.buildDedupIndex(ref, "doc_id", "text", idx2,
      expectedIds = 50L)
    val expected = Seq(b1, b2).flatMap { b =>
      val s = graft.ops.DedupIndex.dedupAgainstIndex(spark, idx2, b,
        "doc_id", "text", 0.5).localCheckpoint(true)
      graft.ops.DedupIndex.appendDedupIndex(s, "doc_id", "text", idx2)
      s.select("doc_id").collect().map(_.getLong(0))
    }.toSet
    val in = new java.io.File(TestSpark.tmpDir("streaming-maint-in"))
    Seq(b1, b2).zipWithIndex.foreach { case (df, i) =>
      val stage = TestSpark.tmpDir(s"streaming-maint-stage$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(in, f"b$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val ckpt = TestSpark.tmpDir("streaming-maint-ckpt")
    val st = HDFStore.open(spark,
      TestSpark.tmpDir("streaming-maint-store"), StoreMode.Overwrite)
    st.put("kept", b1.limit(0))
    def run(): Unit = EventStream.dedupIndexIngestSink(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(in.toString),
      st, "kept", ckpt, idxPath, "doc_id", "text", 0.5,
      maintainEvery = 1).awaitTermination()
    run()
    // survivors match the sequential-batch twin exactly
    val streamed = st.table("kept").df.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"stream ${streamed.size} vs sequential-batch ${expected.size}")
    def live = ref.unionByName(b1.unionByName(b2)
      .filter($"doc_id".isin(expected.toSeq: _*)))
    graft.ops.DedupIndex.requireDedupIndexFresh(spark, idxPath, live, "doc_id")
    // the hook closed the health loop: the 50-id sidecar would sit at
    // fill 2.0 by now; the mid-stream auto-resize restored headroom
    val h = graft.ops.IndexMaintenance.indexHealth(spark, idxPath).head()
    val fill = h.getAs[java.lang.Double]("bloom_fill")
    assert(fill != null && fill.doubleValue() <= 1.0,
      s"auto-maintenance must resize the overfilled Bloom, fill=$fill")
    assert(!h.getAs[Boolean]("compaction_overdue"))
    // probe parity vs the never-compacted twin on unseen variants
    val probe = docs.filter($"doc_id" >= 100 && $"doc_id" < 110)
      .select(($"doc_id" + 7000L).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" >= 300 && $"doc_id" < 310))
    val kept1 = graft.ops.DedupIndex.dedupAgainstIndex(spark, idxPath,
      probe, "doc_id", "text", 0.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val kept2 = graft.ops.DedupIndex.dedupAgainstIndex(spark, idx2,
      probe, "doc_id", "text", 0.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2, s"compacted tree diverged: $kept1 vs $kept2")
    // exact copies of indexed docs must drop (the probe is sharp)
    assert(!kept1.contains(7000L + 100L))
    // restart with no new data: batches replay into the guard's skip
    // path; the hook re-fires (crash-recovery contract) but the
    // health-gate makes it a no-op — nothing changes
    run()
    assert(st.table("kept").df.count() == expected.size.toLong)
    graft.ops.DedupIndex.requireDedupIndexFresh(spark, idxPath, live, "doc_id")
  }

  test("text-index ingest sink: streamed docs become searchable; restart appends nothing") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val base = docs.filter($"doc_id" < 100)
    val b1 = docs.filter($"doc_id" >= 100 && $"doc_id" < 130)
    // batch 2 plants a doc made of the probe's own query tokens: it can
    // only win the ranking if the sink really indexed batch 2
    val planted = spark.range(1).select(lit(77777L).as("doc_id"),
      lit("zz-probe-alpha zz-probe-beta zz-probe-alpha").as("text"))
    val b2 = docs.filter($"doc_id" >= 130 && $"doc_id" < 160)
      .unionByName(planted)
    val idxPath = TestSpark.tmpDir("streaming-tidx") + "/ti"
    graft.ops.TextIndex.buildTextIndex(base, "doc_id", "text", idxPath,
      nBuckets = 16)
    val in = new java.io.File(TestSpark.tmpDir("streaming-ti-in"))
    Seq(b1, b2).zipWithIndex.foreach { case (df, i) =>
      val stage = TestSpark.tmpDir(s"streaming-ti-stage$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(in, f"b$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val ckpt = TestSpark.tmpDir("streaming-ti-ckpt")
    val st = HDFStore.open(spark,
      TestSpark.tmpDir("streaming-ti-store"), StoreMode.Overwrite)
    st.put("landed", b1.limit(0))
    def run(): Unit = EventStream.textIndexIngestSink(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(in.toString),
      st, "landed", ckpt, idxPath, "doc_id", "text").awaitTermination()
    run()
    // every streamed doc landed in the store exactly once
    val landed = st.table("landed").df.select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val expectedIds = (b1.select("doc_id").collect() ++
      b2.select("doc_id").collect()).map(_.getLong(0)).sorted
    assert(landed.toSeq == expectedIds.toSeq)
    // the index grew to base ∪ b1 ∪ b2 and verifies FRESH against it
    val full = base.unionByName(b1).unionByName(b2)
    graft.ops.TextIndex.requireTextIndexFresh(spark, idxPath, full, "doc_id")
    // the planted batch-2 doc tops the probe for its own tokens
    val hits = graft.ops.TextIndex.searchIndex(spark, idxPath,
      "zz-probe-alpha zz-probe-beta", 3).collect()
    assert(hits.nonEmpty && hits.head.getLong(0) == 77777L &&
      hits.head.getLong(1) == 2L, s"probe ranked ${hits.toSeq}")
    // and the phrase probe sees its adjacency from the appended postings
    val ph = graft.ops.TextIndex.searchPhrase(spark, idxPath,
      "zz-probe-beta zz-probe-alpha", 3).collect()
    assert(ph.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((77777L, 1L)))
    // restart with no new data: nothing re-appends to store or index
    run()
    assert(st.table("landed").df.count() == expectedIds.length)
    graft.ops.TextIndex.requireTextIndexFresh(spark, idxPath, full, "doc_id")
  }

  test("text-index replay decision: token-free batches recovered via the Bloom sidecar") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val idxPath = TestSpark.tmpDir("streaming-tfb") + "/ti"
    graft.ops.TextIndex.buildTextIndex(docs.filter($"doc_id" < 50),
      "doc_id", "text", idxPath, nBuckets = 16)
    // a tokened batch not yet appended: absent postings prove no replay
    val tokened = docs.filter($"doc_id" >= 100 && $"doc_id" < 110)
    assert(!EventStream.textBatchReplayed(spark, idxPath, tokened,
      "doc_id", "text"))
    // a token-free batch with novel ids: not in the Bloom -> no replay
    val tf = spark.range(3).select((col("id") + 900000L).as("doc_id"),
      lit("   ").as("text"))
    assert(!EventStream.textBatchReplayed(spark, idxPath, tf,
      "doc_id", "text"))
    // after its append (zero postings — only the _meta bump and the
    // Bloom merge land), the SAME batch is recognized as a replay even
    // though posting membership is structurally blind to it
    graft.ops.TextIndex.appendTextIndex(tf, "doc_id", "text", idxPath)
    assert(graft.ops.IndexIds.presentIds(spark, idxPath,
      tf.select($"doc_id".as("id")),
      spark.read.parquet(idxPath).select("id")).limit(1).collect().isEmpty)
    assert(EventStream.textBatchReplayed(spark, idxPath, tf,
      "doc_id", "text"))
    // a tokened appended batch replays via precise posting membership
    graft.ops.TextIndex.appendTextIndex(tokened, "doc_id", "text", idxPath)
    assert(EventStream.textBatchReplayed(spark, idxPath, tokened,
      "doc_id", "text"))
    // token-free ids are not enumerable from postings — the compact
    // detects the gap (n_rows > staged ids) and closes it from the
    // _tokenfree sidecar, so replay detection SURVIVES a compact
    graft.ops.IndexMaintenance.compactTextIndex(spark, idxPath)
    assert(graft.ops.IndexIds.allPresentInBloom(spark, idxPath,
      tf.select($"doc_id".as("id"))))
    assert(EventStream.textBatchReplayed(spark, idxPath, tf,
      "doc_id", "text"))
    // the sidecar makes the id set fully enumerable, so a RESIZED
    // rebuild is sound too (pre-sidecar trees refused it — their
    // token-free ids existed only as Bloom bits); replay detection and
    // the sidecar itself survive the resize
    graft.ops.IndexMaintenance.compactTextIndex(spark, idxPath,
      bloomResize = Some((2048L, 0.01)))
    val ib = graft.ops.IndexIds.load(spark, idxPath).get
    assert(ib.expected == 2048L)
    assert(EventStream.textBatchReplayed(spark, idxPath, tf,
      "doc_id", "text"))
    // and precisely: the token-free ids are now MEMBERS, not just bits
    assert(graft.ops.IndexIds.presentIds(spark, idxPath,
        tf.select($"doc_id".as("id")),
        graft.ops.TextIndex.indexedIds(spark, idxPath))
      .count() == 3L)
    // a token-free id is deletable, and the next compact sheds it from
    // both the sidecar and the Bloom so it can be re-appended
    graft.ops.IndexMaintenance.deleteFromTextIndex(spark, idxPath,
      Seq(900000L))
    graft.ops.IndexMaintenance.compactTextIndex(spark, idxPath)
    assert(!EventStream.textBatchReplayed(spark, idxPath,
      tf.filter($"doc_id" === 900000L), "doc_id", "text"))
    graft.ops.TextIndex.appendTextIndex(
      tf.filter($"doc_id" === 900000L), "doc_id", "text", idxPath)
    assert(EventStream.textBatchReplayed(spark, idxPath,
      tf.filter($"doc_id" === 900000L), "doc_id", "text"))
  }

  test("tokenize-on-ingest: streamed docs land with model token ids; restart identical; model mix refused") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val base = docs.filter($"doc_id" < 100)
    val b1 = docs.filter($"doc_id" >= 100 && $"doc_id" < 130)
    val b2 = docs.filter($"doc_id" >= 130 && $"doc_id" < 160)
    // train + persist the tokenizer the sink will stamp
    val model = graft.ops.Bpe.learnBpe(base, "text", nMerges = 40)
    val mPath = TestSpark.tmpDir("streaming-bpe") + "/model"
    graft.ops.Bpe.saveBpeModel(spark, model, mPath)
    val idxPath = TestSpark.tmpDir("streaming-bpe-tidx") + "/ti"
    graft.ops.TextIndex.buildTextIndex(base, "doc_id", "text", idxPath,
      nBuckets = 16)
    val in = new java.io.File(TestSpark.tmpDir("streaming-bpe-in"))
    Seq(b1, b2).zipWithIndex.foreach { case (df, i) =>
      val stage = TestSpark.tmpDir(s"streaming-bpe-stage$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(in, f"b$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val ckpt = TestSpark.tmpDir("streaming-bpe-ckpt")
    val st = HDFStore.open(spark,
      TestSpark.tmpDir("streaming-bpe-store"), StoreMode.Overwrite)
    // the landing table carries the pre-tokenized column from day one
    st.put("landed", b1.limit(0).withColumn("token_ids",
      graft.ops.Bpe.encodeIdsCol($"text", model)))
    def run(): Unit = EventStream.textIndexIngestSink(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(in.toString),
      st, "landed", ckpt, idxPath, "doc_id", "text",
      bpeModelPath = Some(mPath)).awaitTermination()
    run()
    // every streamed doc landed exactly once, WITH ids identical to a
    // batch re-encode under the loaded model (replay-determinism: ids
    // are a pure function of text + model)
    val expect = graft.ops.Bpe.encodeIds(
        b1.unionByName(b2), "doc_id", "text",
        graft.ops.Bpe.loadBpeModel(spark, mPath))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def landedIds() = st.table("landed").df
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = landedIds()
    assert(got.keySet == expect.keySet, s"landed ${got.size} docs")
    got.foreach { case (id, ids) => assert(ids == expect(id), s"doc $id") }
    // the model identity is stamped on the table: content fingerprint
    // (the guard key) plus the save path as provenance
    val fp = graft.ops.Bpe.fingerprint(graft.ops.Bpe.loadBpeModel(spark, mPath))
    assert(st.attr("landed", "bpeModelFp") ==
      Some(graft.store.AttrValue.Str(fp)))
    assert(st.attr("landed", "bpeModel") ==
      Some(graft.store.AttrValue.Str(mPath)))
    // restart with no new data: guard skips, rows and ids unchanged
    run()
    assert(landedIds() == got)
    // a table stamped under the PRE-r14 legacy fingerprint scheme (same
    // model CONTENT, older serialization) is not a model mix: the sink
    // accepts it and upgrades the stamp in place to the current scheme
    val legacyFp = graft.ops.Bpe.fingerprintLegacy(
      graft.ops.Bpe.loadBpeModel(spark, mPath))
    st.setAttr("landed", "bpeModelFp", legacyFp)
    // fresh checkpoint so a batch actually runs (the stamp check is
    // per-batch); replay guards keep the table and index unchanged
    EventStream.textIndexIngestSink(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(in.toString),
      st, "landed", TestSpark.tmpDir("streaming-bpe-ckpt-legacy"), idxPath,
      "doc_id", "text", bpeModelPath = Some(mPath)).awaitTermination()
    assert(st.attr("landed", "bpeModelFp") ==
      Some(graft.store.AttrValue.Str(fp)),
      "legacy-scheme stamp must upgrade in place, not refuse")
    assert(landedIds() == got)
    // the SAME model content saved at a DIFFERENT path is accepted —
    // the stamp keys on content, not the path string (a fresh
    // checkpoint replays both batches; the replay guards keep the
    // table and index unchanged)
    val mPath2 = TestSpark.tmpDir("streaming-bpe-copy") + "/model"
    graft.ops.Bpe.saveBpeModel(spark, graft.ops.Bpe.loadBpeModel(spark, mPath),
      mPath2)
    EventStream.textIndexIngestSink(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(in.toString),
      st, "landed", TestSpark.tmpDir("streaming-bpe-ckpt-copy"), idxPath,
      "doc_id", "text", bpeModelPath = Some(mPath2)).awaitTermination()
    assert(landedIds() == got)
    // a sink under a model with DIFFERENT CONTENT is refused on its
    // first batch — before the index append or the store commit — even
    // when saved over the ORIGINAL path (the retrain-and-overwrite
    // corruption a path-keyed stamp would wave through)
    val other = graft.ops.Bpe.learnBpe(base.limit(20), "text", nMerges = 5)
    graft.ops.Bpe.saveBpeModel(spark, other, mPath) // overwrite in place
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      EventStream.textIndexIngestSink(
        spark.readStream.schema(b1.schema).parquet(in.toString),
        st, "landed", TestSpark.tmpDir("streaming-bpe-ckpt2"), idxPath,
        "doc_id", "text", bpeModelPath = Some(mPath)).awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("one table, one tokenization")),
      messages(e).mkString(" | "))
    assert(landedIds() == got) // the refused batch mutated nothing
  }

  // epoch-µs of `ts` in either fixture representation (Long nanos under
  // nanosAsLong, a timestamp otherwise — the EventStream.withEventTime
  // split)
  private def tsUs(events: org.apache.spark.sql.DataFrame) =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  // shared mirror of userSummaries' contract: the batch GROUP BY with
  // the same decimal-exact sum, as a comparable row set
  private def userSummaryBatch(events: org.apache.spark.sql.DataFrame) =
    events.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"),
        min(tsUs(events)).as("first_us"),
        max(tsUs(events)).as("last_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet

  private def collectSummaries(table: String) = spark.table(table)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getLong(4))).toSet

  test("custom-state user summaries (flatMapGroupsWithState) == batch GROUP BY after timeout") {
    val events = spark.read.parquet(eventsPath)
    val in = TestSpark.tmpDir("streamu-in")
    val ckpt = TestSpark.tmpDir("streamu-ckpt")
    // shared sentinel construction (SparkEntry.sentinelEvent carries the
    // 90d > gap + watermark invariant, once)
    val staged = events.unionByName(SparkEntry.sentinelEvent(events))
    staged.write.mode("append").parquet(in)
    val stream = spark.readStream.schema(staged.schema).parquet(in)
    val q = EventStream.userSummaries(stream, "30 days", "1 hour")
      .filter(col("user_id") >= 0)
      .writeStream.outputMode("append").format("memory").queryName("usum")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = collectSummaries("usum")
    val batch = userSummaryBatch(events)
    assert(streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}; " +
        s"diff=${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("custom-state summaries identical under forced multi-batch processing") {
    // the order-independence claim, EXERCISED across batches: the month
    // of events is staged as 4 event-TIME slices, one file each with
    // strictly increasing mtime, consumed one per micro-batch
    // (maxFilesPerTrigger=1; the file source processes oldest first).
    // In-order slices are the operator's contract — a RANDOM 8-way
    // split here loses most rows instead, because each batch advances
    // the watermark past the next batch's older events and watermarked
    // stateful operators DROP late input (verified; that is standard
    // semantics, documented on userSummaries, not a bug this test
    // should assert against.)
    val events = spark.read.parquet(eventsPath)
    val in = TestSpark.tmpDir("streamm-in")
    val ckpt = TestSpark.tmpDir("streamm-ckpt")
    // slice bounds in epoch-µs so the split works over either ts
    // representation (the filter re-derives the same µs expression)
    val (tsMin, tsMax) = {
      val r = events.agg(min(tsUs(events)), max(tsUs(events))).head()
      (r.getLong(0), r.getLong(1))
    }
    val sliceW = (tsMax - tsMin) / 4 + 1
    (0 until 4).foreach { i =>
      events.filter(tsUs(events) >= tsMin + i * sliceW &&
          tsUs(events) < tsMin + (i + 1) * sliceW)
        .coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(1100) // mtime orders slice i before slice i+1
    }
    SparkEntry.sentinelEvent(events).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = EventStream.userSummaries(stream, "30 days", "1 hour")
      .filter(col("user_id") >= 0)
      .writeStream.outputMode("append").format("memory").queryName("usumm")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = collectSummaries("usumm")
    val batch = userSummaryBatch(events)
    assert(streamed == batch,
      s"multi-batch streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("embed ingest sink: batch-2 copy of a batch-1 survivor drops; restart appends nothing") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter($"vec_id" >= 100)
    val cbk = corpus.select($"vec_id", $"embedding").orderBy("vec_id").limit(8)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val idxPath = TestSpark.tmpDir("embing-idx") + "/ivf"
    graft.ops.Similarity.buildIvfIndex(corpus, "vec_id", "embedding", cbk, idxPath)
    // b1: 10 genuinely new vectors; b2: 10 more + a 2x copy of a b1
    // vector — droppable ONLY because b1's survivors joined the index
    val b1 = emb.filter($"vec_id" < 10).select("vec_id", "embedding")
    val b2 = emb.filter($"vec_id" >= 10 && $"vec_id" < 20)
      .select("vec_id", "embedding")
      .unionByName(emb.filter($"vec_id" === 0)
        .select(lit(7000L).as("vec_id"),
          transform($"embedding", x => x * lit(2.0f)).as("embedding")))
    // expected via the batch ops on an independent index copy
    val idx2 = TestSpark.tmpDir("embing-idx2") + "/ivf"
    graft.ops.Similarity.buildIvfIndex(corpus, "vec_id", "embedding", cbk, idx2)
    val s1 = graft.ops.Similarity.embeddingDedupAgainstIndex(spark, idx2, b1,
      "vec_id", "embedding", 0.99, 4).localCheckpoint(true)
    graft.ops.Similarity.appendIvfIndex(s1, "vec_id", "embedding", idx2)
    val s2 = graft.ops.Similarity.embeddingDedupAgainstIndex(spark, idx2, b2,
      "vec_id", "embedding", 0.99, 4)
    val expected = s1.select("vec_id").collect().map(_.getLong(0)).toSet ++
      s2.select("vec_id").collect().map(_.getLong(0)).toSet
    val s1ids = s1.select("vec_id").collect().map(_.getLong(0)).toSet
    // sharpness: the copy drops only through the grown index
    assert(s1ids.contains(0L) && !expected.contains(7000L),
      "the 2x copy of surviving vec 0 must be dropped by the GROWN index")
    val in = new java.io.File(TestSpark.tmpDir("embing-in"))
    Seq(b1, b2).zipWithIndex.foreach { case (df, i) =>
      val stage = TestSpark.tmpDir(s"embing-stage$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(in, f"b$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val ckpt = TestSpark.tmpDir("embing-ckpt")
    val st = HDFStore.open(spark,
      TestSpark.tmpDir("embing-store"), StoreMode.Overwrite)
    st.put("kept", b1.limit(0))
    def run(): Unit = EventStream.embedDedupIngestSink(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(in.toString),
      st, "kept", ckpt, idxPath, "vec_id", "embedding", 0.99, 4)
      .awaitTermination()
    run()
    val streamed = st.table("kept").df.select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"stream ${streamed.size} vs sequential-batch ${expected.size}")
    val indexRows = spark.read.parquet(idxPath).count()
    // restart with no new data: nothing re-appends to store OR index
    run()
    assert(st.table("kept").df.count() == expected.size)
    assert(spark.read.parquet(idxPath).count() == indexRows)
  }

  test("classifier filter sink: stream == batch filter, planted spam dropped, restart no-op") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planted = docs.select($"doc_id",
      when($"doc_id" % 3 === 0,
        concat($"text", lit(" premium curated exemplar prose sample")))
        .otherwise($"text").as("text"))
    val train = planted.filter($"doc_id" % 2 === 0)
      .withColumn("label", when($"doc_id" % 3 === 0, 1L).otherwise(0L))
    val model = graft.ops.Classifier.trainNaiveBayes(train, "label", "text", 2048)
    val odd = planted.filter($"doc_id" % 2 === 1).select("doc_id", "text")
    val expected = graft.ops.Classifier
      .scoreNaiveBayes(odd, model, "doc_id", "text")
      .filter($"nb_score" > 0.0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pos = odd.filter($"doc_id" % 3 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(pos.subsetOf(expected) && expected.size < odd.count(),
      "the planted curated docs must pass and at least one plain doc must not")
    val in = TestSpark.tmpDir("clsink-in")
    odd.filter($"doc_id" < 250).coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1100)
    odd.filter($"doc_id" >= 250).coalesce(1).write.mode("append").parquet(in)
    val ckpt = TestSpark.tmpDir("clsink-ckpt")
    val st = HDFStore.open(spark,
      TestSpark.tmpDir("clsink-store"), StoreMode.Overwrite)
    st.put("kept", odd.limit(0))
    def run(): Unit = EventStream.classifierFilterSink(
      spark.readStream.schema(odd.schema).option("maxFilesPerTrigger", 1)
        .parquet(in), st, "kept", ckpt, model, "doc_id", "text")
      .awaitTermination()
    run()
    val streamed = st.table("kept").df.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == expected, s"stream ${streamed.size} vs batch ${expected.size}")
    run() // restart with no new data: guard blocks any re-append
    assert(st.table("kept").df.count() == expected.size)
  }

  test("decontaminate sink: bench overlap dropped at ingest, clean docs land, restart no-op, stale index refused") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter($"doc_id" < 10).select("doc_id", "text")
    val idx = TestSpark.tmpDir("deconsink-idx")
    graft.ops.Contamination.buildBenchIndex(bench, "doc_id", "text", idx,
      n = 3, expectedGrams = 1L << 14, fpp = 0.01)
    // the stream: clean docs (>= 10) plus PLANTED copies of bench text
    // under fresh ids — the copies must be caught by content, not id
    val clean = docs.filter($"doc_id" >= 10 && $"doc_id" < 200)
      .select("doc_id", "text")
    val planted = bench.select(($"doc_id" + 9000L).as("doc_id"), $"text")
    val stream = clean.unionByName(planted)
    val expected = {
      val dirty = graft.ops.Contamination.ngramOverlapIndexed(spark, idx,
        stream, "doc_id", "text", minShared = 2L)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(planted.collect().map(_.getLong(0)).toSet.subsetOf(dirty),
        "every planted bench copy must be flagged")
      stream.collect().map(_.getLong(0)).toSet -- dirty
    }
    val in = TestSpark.tmpDir("deconsink-in")
    stream.filter($"doc_id" < 100).coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1100)
    stream.filter($"doc_id" >= 100).coalesce(1).write.mode("append").parquet(in)
    val ckpt = TestSpark.tmpDir("deconsink-ckpt")
    val st = HDFStore.open(spark,
      TestSpark.tmpDir("deconsink-store"), StoreMode.Overwrite)
    st.put("clean", stream.limit(0))
    def run(): Unit = EventStream.decontaminateSink(
      spark.readStream.schema(stream.schema).option("maxFilesPerTrigger", 1)
        .parquet(in), st, "clean", ckpt, idx, "doc_id", "text",
      minShared = 2L, verifyAgainst = Some((bench, "doc_id")))
      .awaitTermination()
    run()
    val landed = st.table("clean").df.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == expected, s"stream landed ${landed.size} vs " +
      s"one-shot ${expected.size}")
    run() // restart with no new data: guard blocks any re-append
    assert(st.table("clean").df.count() == expected.size)
    // a changed benchmark suite refuses at sink construction
    val stale = intercept[IllegalStateException] {
      EventStream.decontaminateSink(
        spark.readStream.schema(stream.schema).parquet(in), st, "clean",
        ckpt, idx, "doc_id", "text",
        verifyAgainst = Some((docs.filter($"doc_id" < 12)
          .select("doc_id", "text"), "doc_id")))
    }
    assert(stale.getMessage.contains("STALE"))
  }

  test("countMin ingest sink: streamed merge == one-shot sketch, restart no-op, guard refusals") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.ops.TextStats.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val in = TestSpark.tmpDir("cmsink-in")
    val ckpt = TestSpark.tmpDir("cmsink-ckpt")
    val path = TestSpark.tmpDir("cmsink-tree") + "/cm"
    toks(docs.filter($"doc_id" % 2 === 0)).coalesce(1)
      .write.mode("append").parquet(in)
    Thread.sleep(1100)
    toks(docs.filter($"doc_id" % 2 =!= 0)).coalesce(1)
      .write.mode("append").parquet(in)
    def stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1).parquet(in)
    EventStream.countMinIngestSink(stream, "token", path, ckpt,
      depth = 4, width = 32).awaitTermination()
    def cells(sk: graft.ops.Sketch.CMSketch) = sk.table.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = graft.ops.Sketch.loadCountMin(spark, path)
    val oneShot = graft.ops.Sketch.countMin(toks(docs), "token",
      depth = 4, width = 32)
    assert(cells(streamed) == cells(oneShot),
      "multi-batch merged tree must be cell-identical to the one-shot sketch")
    // restart with no new data: the guard skips every replayed batch
    EventStream.countMinIngestSink(stream, "token", path, ckpt,
      depth = 4, width = 32).awaitTermination()
    assert(cells(graft.ops.Sketch.loadCountMin(spark, path)) == cells(oneShot),
      "a restart must merge nothing")
    // a DIFFERENT checkpoint against the same tree is refused (would
    // double-count), as is a plain saveCountMin tree (no guard at all)
    val ckpt2 = TestSpark.tmpDir("cmsink-ckpt2")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      EventStream.countMinIngestSink(stream, "token", path, ckpt2,
        depth = 4, width = 32).awaitTermination()
    }
    val plain = TestSpark.tmpDir("cmsink-plain") + "/cm"
    graft.ops.Sketch.saveCountMin(oneShot, plain)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      EventStream.countMinIngestSink(stream, "token", plain,
        TestSpark.tmpDir("cmsink-ckpt3"), depth = 4, width = 32)
        .awaitTermination()
    }
  }
}
