package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.{HDFStore, StoreMode}

/** Mirrors the reference suite "HDF Store" (`/root/reference/tests.nim:27-42`):
  * create / open rw / open read-only / custom chunk size / compressed. */
class StoreSpec extends AnyFunSuite {
  import Fixture._
  private lazy val spark = TestSpark.spark

  test("create a store") {
    val dir = TestSpark.tmpDir("store-create")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    assert(st.keys.isEmpty)
    st.close()
  }

  test("open a store read/write") {
    val dir = TestSpark.tmpDir("store-rw")
    HDFStore.open(spark, dir, StoreMode.Overwrite).close()
    val st = HDFStore.open(spark, dir, StoreMode.ReadWrite)
    import spark.implicits._
    st.put("particles", particles)
    assert(st.keys == Seq("particles"))
    st.close()
  }

  test("open a store read-only rejects writes") {
    val dir = TestSpark.tmpDir("store-ro")
    HDFStore.open(spark, dir, StoreMode.Overwrite).close()
    val st = HDFStore.open(spark, dir, StoreMode.Read)
    import spark.implicits._
    intercept[UnsupportedOperationException] { st.put("particles", particles) }
    st.close()
  }

  test("open a missing store read-only fails (hdRead)") {
    intercept[java.io.FileNotFoundException] {
      HDFStore.open(spark, TestSpark.tmpDir("gone") + "/nope", StoreMode.Read)
    }
  }

  test("store with custom chunk size") {
    val dir = TestSpark.tmpDir("store-chunk")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite, chunkSize = Some(10))
    import spark.implicits._
    st.put("particles", particles)
    // 13 rows with maxRecordsPerFile=10 → at least 2 parquet files
    assert(st.typed[Particle]("particles").toSeq == particles)
    st.close()
  }

  test("store with compression (gzip ≙ zlib)") {
    val dir = TestSpark.tmpDir("store-gz")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite, compression = true)
    import spark.implicits._
    st.put("particles", particles)
    assert(st.typed[Particle]("particles").toSeq == particles)
    st.close()
  }

  test("infer mode opens-or-creates (hdInfer)") {
    val dir = TestSpark.tmpDir("store-infer") + "/sub"
    val st = HDFStore.open(spark, dir) // creates
    import spark.implicits._
    st.put("p", particles)
    st.close()
    val st2 = HDFStore.open(spark, dir) // opens
    assert(st2.keys == Seq("p"))
    st2.close()
  }

  test("drop silently no-ops on unknown name (nimtables.nim:106-109)") {
    val dir = TestSpark.tmpDir("store-del")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.put("particles", particles)
    st.drop("particle2") // the reference test's typo — must not throw
    assert(st.keys == Seq("particles"))
    st.drop("particles")
    assert(st.keys.isEmpty)
    st.close()
  }

  test("groups, keys(prefix), contains") {
    val dir = TestSpark.tmpDir("store-grp")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.createGroup("/a/b")
    st.put("a/b/t1", particles)
    st.put("a/t2", particles)
    assert(st.isGroup("a") && st.isGroup("a/b"))
    assert(st.isTable("a/b/t1"))
    assert(st.contains("/a/b/t1") && st.contains("a"))
    assert(st.keys == Seq("a/b/t1", "a/t2"))
    assert(st.keys("a/b", -1) == Seq("a/b/t1"))
    assert(st.keys("a", 1) == Seq("a/t2"))       // depth 1: direct children only
    assert(st.keys("a", 2) == Seq("a/b/t1", "a/t2"))
    assert(st.keys("", 1) == Seq())              // tables all nested deeper
    st.close()
  }

  test("hardlink aliases share data; copy duplicates it") {
    val dir = TestSpark.tmpDir("store-link")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.put("orig", particles)
    st.hardlink("orig", "alias")
    assert(st.typed[Particle]("alias").toSeq == particles)
    // mutation through the alias is visible through the original (shared data)
    st.typed[Particle]("alias").append(Seq(Particle(14, 1, 100.0, 20.0)))
    assert(st.nrows("orig") == 14)
    st.copy("orig", "clone")
    st.typed[Particle]("clone").delete(0)
    assert(st.nrows("clone") == 13 && st.nrows("orig") == 14)
    // dropping one hardlink name keeps the data reachable via the other
    st.drop("orig")
    assert(st.typed[Particle]("alias").toSeq.size == 14)
    st.close()
  }

  test("optimistic concurrency: stale handle's commit is rejected; reload wins") {
    val dir = TestSpark.tmpDir("store-occ")
    import spark.implicits._
    val st1 = HDFStore.open(spark, dir, StoreMode.Overwrite)
    st1.put("t", particles)
    val st2 = HDFStore.open(spark, dir, StoreMode.ReadWrite) // same catalog, second handle
    st1.setAttr("t", "k", 1L)                                 // advances the catalog
    intercept[java.util.ConcurrentModificationException] {
      st2.setAttr("t", "k", 2L)                               // stale: must not clobber
    }
    st1.close(); st2.close()
    val st3 = HDFStore.open(spark, dir, StoreMode.Read)
    assert(st3.getAttr("t", "k") == graft.store.AttrValue.I64(1)) // winner's value survived
    st3.close()
  }

  test("torn manifest version self-heals: readers fall back, writers reclaim") {
    val dir = TestSpark.tmpDir("store-torn")
    import spark.implicits._
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    st.put("t", particles)
    st.close()
    // simulate a writer that crashed mid-commit: a garbage next-version file
    val mdir = new java.io.File(dir, "_manifest")
    val latest = mdir.listFiles().map(_.getName).filter(_.endsWith(".json")).max
    val v = latest.stripPrefix("v").stripSuffix(".json").toLong
    val torn = new java.io.File(mdir, f"v${v + 1}%012d.json")
    java.nio.file.Files.writeString(torn.toPath, "{ not json")
    // reader ignores the torn file
    val ro = HDFStore.open(spark, dir, StoreMode.Read)
    assert(ro.nrows("t") == 13)
    ro.close()
    // writer reclaims the torn slot and commits successfully
    val rw = HDFStore.open(spark, dir, StoreMode.ReadWrite)
    rw.setAttr("t", "healed", 1L)
    assert(rw.getAttr("t", "healed") == graft.store.AttrValue.I64(1))
    rw.close()
  }

  test("time travel: a pinned version sees the pre-mutation snapshot") {
    val dir = TestSpark.tmpDir("store-tt")
    import spark.implicits._
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    st.put("t", particles)
    val v0 = st.version
    val t = st.typed[Particle]("t")
    t.delete(0, 4)
    t.append(Seq(Particle(99, 9, 9.0, 9.0)))
    assert(st.nrows("t") == 9)
    val snap = st.atVersion(v0)
    assert(snap.nrows("t") == 13)                      // pre-mutation row count
    assert(snap.typed[Particle]("t").toSeq == particles) // full old content
    intercept[UnsupportedOperationException] { snap.drop("t") } // snapshots are read-only
    intercept[NoSuchElementException] { st.atVersion(999999) }
    snap.close(); st.close()
  }

  test("codec matrix: gzip/snappy/zstd/lz4 round-trip (blosc family mapping)") {
    val dir = TestSpark.tmpDir("store-codec")
    import spark.implicits._
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    Seq("gzip", "snappy", "zstd", "lz4").foreach { c =>
      st.put(s"t_$c", particles, None, Some(c))
      assert(st.typed[Particle](s"t_$c").toSeq == particles, s"codec $c")
    }
    st.close()
  }

  test("typed attributes round-trip; bool rejected (attributes.nim:289-293)") {
    val dir = TestSpark.tmpDir("store-attr")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.put("t", particles)
    st.setAttr("t", "answer", 42L)
    st.setAttr("t", "pi", 3.14)
    st.setAttr("t", "note", "hello")
    st.setAttr("t", "xs", Seq(1L, 2L, 3L))
    st.setAttr("", "fileLevel", "root attr")
    assert(st.getAttr("t", "answer") == graft.store.AttrValue.I64(42))
    assert(st.getAttr("t", "xs") == graft.store.AttrValue.I64Seq(Seq(1, 2, 3)))
    assert(st.getAttr("", "fileLevel") == graft.store.AttrValue.Str("root attr"))
    assert(st.hasAttr("t", "pi") && !st.hasAttr("t", "nope"))
    intercept[UnsupportedOperationException] { st.setAttr("t", "flag", true) }
    val boolSeqErr = intercept[UnsupportedOperationException] {
      st.setAttr("t", "flags", Seq(true, false))
    }
    assert(boolSeqErr.getMessage.contains("parity with nimhdf5/attributes.nim"))
    st.setAttr("t", "answer", 43L) // overwrite-by-delete semantics
    assert(st.getAttr("t", "answer") == graft.store.AttrValue.I64(43))
    st.deleteAttr("t", "pi")
    assert(!st.hasAttr("t", "pi"))
    // copy_attributes
    st.put("u", particles)
    st.copyAttrs("t", "u")
    assert(st.getAttr("u", "note") == graft.store.AttrValue.Str("hello"))
    // persistence across re-open
    st.close()
    val st2 = HDFStore.open(spark, dir, StoreMode.Read)
    assert(st2.getAttr("t", "answer") == graft.store.AttrValue.I64(43))
    st2.close()
  }

  test("non-finite float attrs rejected (JSON catalog can't round-trip them)") {
    val dir = TestSpark.tmpDir("store-nan")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.put("t", particles)
    intercept[IllegalArgumentException] { st.setAttr("t", "x", Double.NaN) }
    intercept[IllegalArgumentException] { st.setAttr("t", "x", Double.PositiveInfinity) }
    intercept[IllegalArgumentException] { st.setAttr("t", "x", Seq(1.0, Double.NegativeInfinity)) }
    st.setAttr("t", "x", 1.5) // finite still fine
    st.close()
    val ro = HDFStore.open(spark, dir, StoreMode.Read) // catalog still parses
    assert(ro.getAttr("t", "x") == graft.store.AttrValue.F64(1.5))
    ro.close()
  }

  test("within-store copy is metadata-only CoW; mutation diverges") {
    val dir = TestSpark.tmpDir("store-cow")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.put("orig", particles)
    val segsBefore = parquetFilesUnder(new java.io.File(dir, "tables"))
    st.copy("orig", "clone")
    // no new data files were written by the copy
    assert(parquetFilesUnder(new java.io.File(dir, "tables")) == segsBefore)
    assert(st.typed[Particle]("clone").toSeq == particles)
    // mutating the clone leaves the original untouched (CoW divergence)
    st.typed[Particle]("clone").delete(0)
    assert(st.nrows("clone") == 12 && st.nrows("orig") == 13)
    assert(st.typed[Particle]("orig").toSeq == particles)
    // dropping the original keeps shared segments alive for the clone
    st.drop("orig")
    st.vacuum(graceMs = 0L)
    assert(st.typed[Particle]("clone").toSeq == particles.drop(1))
    st.close()
  }

  test("vacuum on a stale handle is rejected; grace period spares young segments") {
    val dir = TestSpark.tmpDir("store-vac")
    import spark.implicits._
    val st1 = HDFStore.open(spark, dir, StoreMode.Overwrite)
    st1.put("t", particles)
    val st2 = HDFStore.open(spark, dir, StoreMode.ReadWrite)
    st2.setAttr("t", "k", 1L) // advances the catalog behind st1
    intercept[java.util.ConcurrentModificationException] { st1.vacuum() }
    // fresh handle: orphan a segment, then a large grace window spares it
    val st3 = HDFStore.open(spark, dir, StoreMode.ReadWrite)
    st3.typed[Particle]("t").delete(0) // rewrites → old segment orphaned
    val before = parquetFilesUnder(new java.io.File(dir, "tables"))
    st3.vacuum(graceMs = 3600 * 1000L)
    assert(parquetFilesUnder(new java.io.File(dir, "tables")) == before) // young: kept
    st3.vacuum() // DEFAULT grace is conservative: just-orphaned segments survive
    assert(parquetFilesUnder(new java.io.File(dir, "tables")) == before)
    st3.vacuum(graceMs = 0L)
    assert(parquetFilesUnder(new java.io.File(dir, "tables")) < before)  // no grace: gone
    assert(st3.typed[Particle]("t").toSeq == particles.drop(1))
    st1.close(); st2.close(); st3.close()
  }

  test("group drop detaches the subtree; table name can't shadow a group") {
    val dir = TestSpark.tmpDir("store-gdrop")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.createGroup("geo/raw")
    st.put("geo/raw/region", particles)
    st.put("geo/t2", particles)
    intercept[IllegalArgumentException] { st.put("geo/raw", particles) } // name is a group
    st.drop("geo")
    assert(!st.contains("geo") && !st.contains("geo/raw"))
    assert(!st.isTable("geo/raw/region") && !st.isTable("geo/t2"))
    st.close()
  }

  test("put() over an aliased base promotes an heir (overwrite ≙ unlink+create)") {
    val dir = TestSpark.tmpDir("store-heir")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.put("base", particles)
    st.hardlink("base", "link")
    val fresh = Seq(Particle(1, 1, 1.0, 1.0))
    st.put("base", fresh) // overwrite the base
    // the link must still see the OLD data (it aliased the object, not the name)
    assert(st.typed[Particle]("link").toSeq == particles)
    assert(st.typed[Particle]("base").toSeq == fresh)
    st.close()
  }

  test("copy() onto an aliased base promotes an heir; group targets rejected") {
    val dir = TestSpark.tmpDir("store-copyheir")
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    import spark.implicits._
    st.put("base", particles)
    st.hardlink("base", "link")
    val other = Seq(Particle(1, 1, 1.0, 1.0))
    st.put("src", other)
    st.copy("src", "base") // overwrite the aliased base, like put() over it
    // the link must still see the OLD data (it aliased the object, not the name)
    assert(st.typed[Particle]("link").toSeq == particles)
    assert(st.typed[Particle]("base").toSeq == other)
    // and a group name can't be shadowed by a copy target, same as put()
    st.createGroup("grp")
    intercept[IllegalArgumentException] { st.copy("src", "grp") }
    st.close()
  }

  private def parquetFilesUnder(root: java.io.File): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    if (!root.exists) 0 else walk(root).count(_.getName.endsWith(".parquet"))
  }
}
