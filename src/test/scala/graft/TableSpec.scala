package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.{HDFStore, StoreMode}

/** Mirrors the reference suite "HDF Table" (`/root/reference/tests.nim:44-112`)
  * plus the positional operators SURVEY §2.2/2.3 adds to the surface. */
class TableSpec extends AnyFunSuite {
  import Fixture._
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def fresh(): HDFStore =
    HDFStore.open(spark, TestSpark.tmpDir("tbl"), StoreMode.Overwrite)

  test("create table + full round-trip (tests.nim:46-68)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    assert(st.typed[Particle]("particles").toSeq == particles)
    st.close()
  }

  test("create compressed / custom chunk variants (tests.nim:48-62)") {
    val st = fresh(); import spark.implicits._
    st.put("pz", particles, None, Some("gzip"))
    st.put("pc", particles, Some(10L), Some("gzip"))
    assert(st.typed[Particle]("pz").toSeq == particles)
    assert(st.typed[Particle]("pc").toSeq == particles)
    st.close()
  }

  test("point reads incl. backwards index (tests.nim:70-77)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    assert(t(0) == particles.head)
    assert(t.last == particles.last)
    assert(t.fromEnd(2) == particles(11))
    intercept[IllegalArgumentException] { t(13L) }
  }

  test("slice read table[3..10] (tests.nim:75-77)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    assert(t(3L, 10L) == particles.slice(3, 11))
    assert(t(3 to 10) == particles.slice(3, 11))
  }

  test("append two rows (tests.nim:79-90)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    val extra = Seq(Particle(14, 1, 100.0, 20.0), Particle(15, 1, 100.0, 20.0))
    t.append(extra)
    assert(t.nrows == 15)
    assert(t.toSeq == particles ++ extra)
    assert(t.last == extra.last)
  }

  test("delete a row (tests.nim:92-99)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    t.deleteFromEnd(1)
    assert(t.nrows == 12)
    assert(t.last == particles(11))
    t.delete(0)
    assert(t.nrows == 11)
    assert(t.toSeq == particles.slice(1, 12))
  }

  test("delete a middle slice renumbers densely") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    t.delete(3, 5)
    val expect = particles.take(3) ++ particles.drop(6)
    assert(t.nrows == 10)
    assert(t.toSeq == expect)
    assert(t(3) == particles(6))
  }

  test("insert rows at position (tests.nim:101-111)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    val ins = Seq(Particle(99, 9, 1.0, 2.0), Particle(98, 9, 1.0, 2.0))
    t.insert(3, ins)
    assert(t.nrows == 15)
    assert(t(3L, 4L) == ins)
    assert(t.toSeq == (particles.take(3) ++ ins ++ particles.drop(3)))
  }

  test("insert at 0 and at nrows are metadata-only boundary inserts") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    val a = Seq(Particle(0, 0, 0, 0))
    t.insert(0, a)
    t.insert(t.nrows, a)
    assert(t.nrows == 15)
    assert(t.toSeq == (a ++ particles ++ a))
  }

  test("positional update point, slice, and from-end (nimtables.nim:177-200)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    val p = Particle(100, 2, 50.0, 10.0)
    t.update(0, p)
    t.updateFromEnd(1, p)
    assert(t(0) == p && t.last == p)
    val repl = Seq(Particle(201, 1, 1, 1), Particle(202, 1, 1, 1), Particle(203, 1, 1, 1))
    t.update(5, repl)
    assert(t(5L, 7L) == repl)
    assert(t.nrows == 13)
    intercept[IllegalArgumentException] { t.update(11, repl) } // crosses the end
  }

  test("update across segment boundary") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    t.append(particles.map(p => p.copy(lati = p.lati + 100))) // second segment
    val repl = (0 until 4).map(i => Particle(300 + i, 3, 3, 3))
    t.update(11, repl) // rows 11,12 in seg0; 13,14 in seg1
    assert(t(11L, 14L) == repl)
    assert(t.nrows == 26)
  }

  test("resize grow zero-fills, shrink trims (datasets.nim:1299-1336)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.table("particles")
    t.resizeTo(15)
    assert(t.nrows == 15)
    val typed = st.typed[Particle]("particles")
    assert(typed.last == Particle(0, 0, 0.0, 0.0))
    t.resizeTo(5)
    assert(typed.toSeq == particles.take(5))
  }

  test("hyperslab strided read (offset/count/stride/block)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.table("particles")
    // offset=1, count=4, stride=3, block=2 → ids 1,2, 4,5, 7,8, 10,11
    val got = t.hyperslab(1, 4, 3, 2).select("_rowid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L))
  }

  test("coordinate-list selection (select_elements)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.table("particles")
    val got = t.selectRows(Seq(0L, 5L, 12L)).select("lati").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 6L, 13L))
  }

  test("projection + cast read (P5/P6)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.table("particles")
    assert(t.select("lati", "pressure").columns.toSeq == Seq("_rowid", "lati", "pressure"))
    val cast = t.readAs("pressure", org.apache.spark.sql.types.IntegerType)
    assert(cast.schema("pressure").dataType == org.apache.spark.sql.types.IntegerType)
    assert(cast.orderBy("_rowid").collect().head.getInt(1) == 100)
  }

  test("schema compatibility check fails fast (nimtables.nim:133-138)") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    intercept[IllegalStateException] { st.typed[WrongParticle]("particles") }
  }

  test("compact merges segments, preserving order") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    t.append(particles)
    t.insert(5, particles.take(2))
    st.table("particles").compact()
    assert(st.segmentCount("particles") == 1)
    assert(t.toSeq == (particles.take(5) ++ particles.take(2) ++ particles.drop(5) ++ particles))
  }

  test("ndarray add grows along axis 0 within maxshape (datasets.nim:1338-1369)") {
    val st = fresh(); import spark.implicits._
    val data = spark.range(12).selectExpr("id div 4 as i0", "id % 4 as i1", "cast(id as double) as value")
    val nd = graft.ndarray.NDArray.create(st, "g", data, Seq(3L, 4L), Seq(5L, 4L))
    assert(nd.shape == Vector(3L, 4L))
    val block = spark.range(12, 16).selectExpr("id div 4 as i0", "id % 4 as i1", "cast(id as double) as value")
    nd.add(block, 1)
    assert(nd.shape == Vector(4L, 4L))
    assert(nd.read().count() == 16)
    // growth past maxshape rejected (≙ H5S maxdims)
    intercept[IllegalArgumentException] {
      nd.add(spark.range(16, 32).selectExpr("id div 4 as i0", "id % 4 as i1", "cast(id as double) as value"), 4)
    }
    st.close()
  }

  test("ndarray full_output hyperslab read zero-fills unselected (datasets.nim:1556-1599)") {
    val st = fresh()
    val data = spark.range(12).selectExpr("id div 4 as i0", "id % 4 as i1", "cast(id as double) as value")
    val nd = graft.ndarray.NDArray.create(st, "g", data, Seq(3L, 4L))
    // select i0=1, i1 in {0, 2}
    val full = nd.hyperslabFull(Seq(1, 0), Seq(1, 2), Seq(1, 2), Seq(1, 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.length == 12) // full shape, row-major
    val expect = (0L until 3L).flatMap(i0 => (0L until 4L).map { i1 =>
      val sel = i0 == 1 && (i1 == 0 || i1 == 2)
      (i0, i1, if (sel) (i0 * 4 + i1).toDouble else 0.0)
    })
    assert(full.toSeq == expect)
    st.close()
  }

  test("ndarray strided hyperslab write (datasets.nim:1451-1528)") {
    val st = fresh()
    val data = spark.range(24).selectExpr("id div 6 as i0", "id % 6 as i1", "cast(id as double) as value")
    val nd = graft.ndarray.NDArray.create(st, "g", data, Seq(4L, 6L))
    // dim0: off 0, cnt 2, stride 2, blk 1 → i0 in {0, 2}
    // dim1: off 1, cnt 2, stride 3, blk 2 → i1 in {1, 2, 4, 5}
    nd.writeHyperslab(Seq(0, 1), Seq(2, 2), Seq(2, 3), Seq(1, 2),
      (0 until 8).map(p => (900 + p).toDouble))
    val got = nd.read().collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val selI1 = Seq(1L, 2L, 4L, 5L)
    val expect = (0L until 4L).flatMap(i0 => (0L until 6L).map { i1 =>
      val v = if ((i0 == 0 || i0 == 2) && selI1.contains(i1)) {
        val s0 = i0 / 2; val s1 = selI1.indexOf(i1).toLong
        900.0 + (s0 * 4 + s1)
      } else (i0 * 6 + i1).toDouble
      (i0, i1, v)
    })
    assert(got.toSeq == expect)
    // wrong element count rejected
    intercept[IllegalArgumentException] {
      nd.writeHyperslab(Seq(0, 1), Seq(2, 2), Seq(2, 3), Seq(1, 2), Seq(1.0))
    }
    st.close()
  }

  test("ndarray per-axis resize: shrink drops, grow zero-fills (datasets.nim:1299-1336)") {
    val st = fresh()
    val data = spark.range(12).selectExpr("id div 4 as i0", "id % 4 as i1", "cast(id as double) as value")
    val nd = graft.ndarray.NDArray.create(st, "g", data, Seq(3L, 4L), Seq(5L, -1L))
    nd.resize(Seq(4L, 2L)) // grow axis 0 (zero fill), shrink axis 1
    val re = graft.ndarray.NDArray.open(st, "g")
    assert(re.shape == Vector(4L, 2L))
    val got = re.read().collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = (0L until 4L).flatMap(i0 => (0L until 2L).map { i1 =>
      (i0, i1, if (i0 < 3) (i0 * 4 + i1).toDouble else 0.0)
    })
    assert(got.toSeq == expect)
    // rowid = new linear index invariant survives the relayout
    assert(re.selectPoints(Seq(Seq(3L, 1L))).collect()(0).getDouble(2) == 0.0)
    // beyond maxshape rejected
    intercept[IllegalArgumentException] { re.resize(Seq(6L, 2L)) }
    st.close()
  }

  test("vacuum reclaims unreferenced copy-on-write segments") {
    val st = fresh(); import spark.implicits._
    st.put("particles", particles)
    val t = st.typed[Particle]("particles")
    t.delete(0); t.delete(0); t.delete(0) // three rewrites → orphaned data
    def parquetFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(st.root, "tables")).count(_.getName.endsWith(".parquet"))
    }
    val before = parquetFiles()
    st.vacuum(graceMs = 0L)
    assert(parquetFiles() < before)          // orphans reclaimed
    assert(t.toSeq == particles.drop(3))     // data intact after vacuum
    // and a fresh reader sees the same state
    val st2 = HDFStore.open(spark, st.root, StoreMode.Read)
    assert(st2.typed[Particle]("particles").toSeq == particles.drop(3))
    st2.close()
    st.close()
  }

  test("mutations are file-granular: untouched files keep their bytes") {
    val st = fresh(); import spark.implicits._
    val big = (0 until 100).map(i => Particle(i.toLong, 1, 100.0, 20.0))
    st.put("big", big, Some(10L), None) // 10-row files
    val t = st.typed[Particle]("big")
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(st.root, "tables"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = files()
    t.delete(42, 44) // inside one 10-row file
    val after = files()
    val survived = before.keySet.intersect(after.keySet)
    // all but ~one original file survive byte-identical (same mtime)
    assert(survived.size >= before.size - 2, s"rewrote too much: ${before.size} -> ${survived.size}")
    assert(survived.forall(k => before(k) == after(k)))
    assert(t.toSeq == big.take(42) ++ big.drop(45))
    // positional reads still exact across the refined runs
    assert(t(41) == big(41) && t(42) == big(45) && t.nrows == 97)
    // delete of whole file spans is pure metadata (no new files needed)
    t.delete(10, 29)
    assert(t.toSeq == (big.take(10) ++ big.slice(30, 42) ++ big.drop(45)))
    st.close()
  }

  test("mutations run footer-free: fileRows from the manifest, no fallback reads") {
    val st = fresh(); import spark.implicits._
    val big = (0 until 100).map(i => Particle(i.toLong, 1, 100.0, 20.0))
    st.put("big", big, Some(10L), None) // 10-row files → fileRows recorded
    val t = st.typed[Particle]("big")
    val before = graft.table.HDFTable.footerReads.get()
    t.delete(5)
    t.update(50, Seq(Particle(999, 9, 9.0, 9.0)))
    t.insert(20, Seq(Particle(888, 8, 8.0, 8.0)))
    assert(graft.table.HDFTable.footerReads.get() == before,
      "mutation path fell back to driver-side parquet footer reads")
    assert(t.nrows == 100 && t(19L) == big(20) && t(20L) == Particle(888, 8, 8.0, 8.0))
    st.close()
  }

  test("compactSmallRuns bin-packs small adjacent runs, leaves big ones alone") {
    val st = fresh(); import spark.implicits._
    val big = (0 until 60).map(i => Particle(i.toLong, 1, 100.0, 20.0))
    st.put("t", big.take(40)) // one big run (40 rows)
    val t = st.typed[Particle]("t")
    (40 until 60).foreach(i => t.append(Seq(big(i)))) // 20 one-row runs
    assert(st.segmentCount("t") == 21)
    st.table("t").compactSmallRuns(10)
    // big run untouched; 20 small runs packed into ceil(20/10)=2 segments
    assert(st.segmentCount("t") == 3, s"got ${st.segmentCount("t")}")
    assert(t.toSeq == big)
    assert(t(39L, 45L) == big.slice(39, 46)) // reads exact across the seam
    st.close()
  }

  test("copy preserves idBase runs after file-granular mutations") {
    val st = fresh(); import spark.implicits._
    val big = (0 until 100).map(i => Particle(i.toLong, 1, 100.0, 20.0))
    st.put("big", big, Some(10L), None)
    st.typed[Particle]("big").delete(42, 44) // creates idBase file runs
    st.copy("big", "c")
    val c = st.typed[Particle]("c")
    val expect = big.take(42) ++ big.drop(45)
    assert(c.toSeq == expect)
    assert(c(47L, 56L) == expect.slice(47, 57)) // slice across idBase runs
    st.close()
  }

  test("append/update of multi-file positional reads keeps _rowid order") {
    val st = fresh(); import spark.implicits._
    val big = (0 until 100).map(i => Particle(i.toLong, 1, 100.0, 20.0))
    st.put("big", big, Some(10L), None) // 10 files — scan order != file order hazard
    val t = st.typed[Particle]("big")
    st.table("big").append(st.table("big").slice(5, 94)) // spans 10 files, keeps _rowid
    assert(t.nrows == 190)
    assert(t(100L, 189L) == big.slice(5, 95)) // appended tail in positional order
    st.close()
  }

  test("many small appends then mutations (stress, multi-segment)") {
    val st = fresh(); import spark.implicits._
    st.put("p", particles.take(1))
    val t = st.typed[Particle]("p")
    (1 until 13).foreach(i => t.append(Seq(particles(i))))
    assert(t.toSeq == particles)
    t.delete(2, 9)
    assert(t.toSeq == (particles.take(2) ++ particles.drop(10)))
  }

  test("multi-path df above the segment threshold matches the union path") {
    val st = fresh(); import spark.implicits._
    st.put("m", particles.take(1))
    val t = st.typed[Particle]("m")
    (1 until 13).foreach(i => t.append(Seq(particles(i))))
    (0 until 30).foreach(i => t.append(Seq(particles(i % 13)))) // 43 runs
    assert(st.segmentCount("m") > 32) // over MultiPathSegments: fast path on
    val tail = (0 until 30).map(i => particles(i % 13))
    assert(t.toSeq == particles ++ tail)
    // a head delete shifts every later run (off != idBase): shifts must
    // ride the broadcast join, and file-granular runs fall back cleanly
    t.delete(0, 0)
    assert(t.toSeq == particles.drop(1) ++ tail)
    assert(st.table("m").df.count() == 42)
    st.close()
  }

  test("ndarray resize through a hardlink mutates the SHARED base") {
    val st = fresh()
    val data = spark.range(12).selectExpr("id div 4 as i0", "id % 4 as i1", "cast(id as double) as value")
    graft.ndarray.NDArray.create(st, "nd", data, Seq(3L, 4L), Seq(5L, -1L))
    st.hardlink("nd", "ndlink")
    graft.ndarray.NDArray.open(st, "ndlink").resize(Seq(4L, 2L))
    // both names see the new extents and data (HDF5 hardlink semantics)
    for (name <- Seq("nd", "ndlink")) {
      val re = graft.ndarray.NDArray.open(st, name)
      assert(re.shape == Vector(4L, 2L), name)
      val got = re.read().collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val expect = (0L until 4L).flatMap(i0 => (0L until 2L).map { i1 =>
        (i0, i1, if (i0 < 3) (i0 * 4 + i1).toDouble else 0.0)
      })
      assert(got.toSeq == expect, name)
    }
    st.close()
  }

  test("hyperslab DF write evaluates its input exactly once") {
    val st = fresh(); import spark.implicits._
    val data = spark.range(10).selectExpr("id as i0", "cast(id as double) as value")
    val nd = graft.ndarray.NDArray.create(st, "v", data, Seq(10L), Seq(10L))
    val acc = spark.sparkContext.longAccumulator("slab-evals")
    val vals = spark.range(4).map { p => acc.add(1); (p, p * 100.0) }.toDF("pos", "value")
    nd.writeHyperslabDF(Seq(0L), Seq(4L), Seq(1L), Seq(1L), vals)
    // count-validation and the update must read ONE evaluation of the input
    assert(acc.value == 4L, s"input evaluated ${acc.value / 4.0} times")
    val got = nd.read().collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(0.0, 100.0, 200.0, 300.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0))
    st.close()
  }
}
