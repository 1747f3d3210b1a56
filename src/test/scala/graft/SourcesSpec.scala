package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusIngest

/** The raw-corpus ingestion boundary: strict normalization, loud
  * refusals, deterministic content identity, round-trip fidelity. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nasty = Seq(
    (1L, "plain text", "web"),
    (2L, "quotes \" and 'single' and ,commas,", "web"),
    (3L, "unicode éß中文 and a tab\there", "books"),
    (4L, "{\"fake\": \"json\", \"inside\": [1,2]}", null.asInstanceOf[String]),
  ).toDF("doc_id", "text", "source")

  test("jsonl round trip: escaping, unicode, NULL-source omission") {
    val path = TestSpark.tmpDir("jsonl-rt")
    CorpusIngest.writeJsonl(nasty, path)
    val back = CorpusIngest.readJsonl(spark, path,
        idField = Some("doc_id"), sourceField = Some("source"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(back == nasty.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
  }

  test("csv round trip through the same normalizer") {
    val path = TestSpark.tmpDir("csv-rt")
    nasty.write.mode("overwrite").option("header", "true").csv(path)
    val back = CorpusIngest.readCsv(spark, path,
        idField = Some("doc_id"), sourceField = Some("source"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(back == nasty.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
  }

  test("content-hash identity: stable, salted, equal to the native kernel") {
    val path = TestSpark.tmpDir("jsonl-ids")
    CorpusIngest.writeJsonl(nasty, path)
    def ids(salt: String) = CorpusIngest.readJsonl(spark, path,
        idSalt = salt).select("doc_id", "text").collect()
      .map(r => (r.getString(1), r.getLong(0))).toMap
    val a = ids("s1")
    assert(a == ids("s1"), "content ids must be stable across reads")
    assert(a != ids("s2"), "the salt must move the ids")
    // the id IS the portable kernel hash of salt:text
    val want = nasty.select(col("text"),
      graft.functions.native.hash60(concat(lit("s1:"), col("text"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == want)
  }

  test("wet: real-layout dump parses (preamble dropped, multi-line bodies), writer round-trips") {
    // a REAL-layout WET file: magic BEFORE each record, a warcinfo
    // preamble carrying no document, bodies with embedded newlines and
    // a preserved trailing newline
    val raw =
      "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n\r\n" +
      "software: test-crawler 1.0\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://a.example/1\r\n" +
      "Content-Length: 17\r\n\r\n" +
      "line one\nline two\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://b.example/2\r\n" +
      "Content-Length: 14\r\n\r\n" +
      "ends with nl\r\n\r\n\r\n"
    val dir = TestSpark.tmpDir("wet-real")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.warc.wet"),
      raw.getBytes("UTF-8"))
    val got = CorpusIngest.readWet(spark, dir).orderBy("uri").collect()
      .map(r => (r.getString(3), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("https://a.example/1", "line one\nline two", "a.example"),
      ("https://b.example/2", "ends with nl\r\n", "b.example")),
      s"parsed: $got")
    // the writer's layout reads back identically (escaping-free format
    // — the round trip is byte fidelity of the body)
    val docs = Seq(
      ("https://c.example/x", "plain"),
      ("https://c.example/y", "multi\nline\r\nwith crlf"),
      ("https://d.example/z", "")).toDF("uri", "text")
    val out = TestSpark.tmpDir("wet-rt")
    CorpusIngest.writeWet(docs, "uri", "text", out)
    val back = CorpusIngest.readWet(spark, out).orderBy("uri").collect()
      .map(r => (r.getString(3), r.getString(1))).toSeq
    assert(back == docs.orderBy("uri").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq)
    // content identity: stable and salted
    val ids = CorpusIngest.readWet(spark, out).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids.size == 3 &&
      ids == CorpusIngest.readWet(spark, out, idSalt = "wet")
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    // a uri-carrying record with no header/body separator refuses
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.warc.wet"),
      ("WARC/1.0\r\nWARC-Target-URI: https://bad.example/\r\n" +
        "no blank line").getBytes("UTF-8"))
    val bad = intercept[Exception] {
      CorpusIngest.readWet(spark, dir).collect() }
    assert(bad.getMessage.contains("without a blank header/body"))
  }

  test("wet verifyLength: clean dumps pass, a delimiter collision refuses loudly") {
    // clean round trip under verification: every Content-Length the
    // writer committed matches the parsed body
    val docs = Seq(
      ("https://c.example/x", "plain ascii"),
      ("https://c.example/y", "unicode éß中文 and\nnewlines\r\n")
    ).toDF("uri", "text")
    val out = TestSpark.tmpDir("wet-vl")
    CorpusIngest.writeWet(docs, "uri", "text", out)
    assert(CorpusIngest.readWet(spark, out, verifyLength = true)
      .count() == 2L)
    // a body containing the record delimiter mis-splits — WITHOUT
    // verification the truncated document would train silently; WITH
    // it the Content-Length mismatch refuses
    val poison = Seq(
      ("https://evil.example/p", "prefix WARC/1.0\r\nsuffix after magic")
    ).toDF("uri", "text")
    val out2 = TestSpark.tmpDir("wet-poison")
    CorpusIngest.writeWet(poison, "uri", "text", out2)
    val silent = CorpusIngest.readWet(spark, out2).collect()
    assert(silent.forall(_.getString(1) != poison.collect()(0).getString(1)),
      "the mis-split is real: no parsed body equals the original")
    val caught = intercept[Exception] {
      CorpusIngest.readWet(spark, out2, verifyLength = true).collect() }
    assert(caught.getMessage.contains("Content-Length mismatch"))
    // header-LOOKING text inside a body (a crawled page ABOUT WARC)
    // must not spoof identity or framing: fields parse from the header
    // zone only, so the record keeps its real URI and passes
    // verification with its body intact
    val meta = Seq(("https://docs.example/warc",
      "the header line WARC-Target-URI: https://spoof.example/ and\n" +
        "Content-Length: 9999 are part of THIS page's text"))
      .toDF("uri", "text")
    val out3 = TestSpark.tmpDir("wet-meta")
    CorpusIngest.writeWet(meta, "uri", "text", out3)
    val kept = CorpusIngest.readWet(spark, out3, verifyLength = true)
      .collect().map(r => (r.getString(3), r.getString(1))).toSeq
    assert(kept == meta.collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq,
      s"header-looking body text leaked into parsing: $kept")
  }

  test("refusals: missing field, NULL text, malformed id") {
    val path = TestSpark.tmpDir("jsonl-bad")
    CorpusIngest.writeJsonl(nasty, path)
    val miss = intercept[IllegalArgumentException] {
      CorpusIngest.readJsonl(spark, path, textField = "body") }
    assert(miss.getMessage.contains("no 'body' field"))
    // NULL text: a line with the field absent reads back NULL -> raise
    CorpusIngest.writeJsonl(
      Seq((9L, Some("ok")), (10L, None)).toDF("doc_id", "text"),
      path)
    val nul = intercept[Exception] {
      CorpusIngest.readJsonl(spark, path, idField = Some("doc_id"))
        .collect() }
    assert(nul.getMessage.contains("NULL on at least one line"))
    // malformed id refuses with the op-named error, not a cast error
    CorpusIngest.writeJsonl(
      Seq(("not-a-number", "t1")).toDF("doc_id", "text"), path)
    val bad = intercept[Exception] {
      CorpusIngest.readJsonl(spark, path, idField = Some("doc_id"))
        .collect() }
    assert(bad.getMessage.contains("must be non-null and numeric"))
  }
}
