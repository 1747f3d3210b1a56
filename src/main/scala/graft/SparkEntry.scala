package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ndarray.NDArray
import graft.store.{HDFStore, StoreMode}
import graft.table.HDFTable

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the LLM-pipeline extensions), each with a DuckDB
  * oracle where SQL-expressible. See /root/repo/SURVEY.md §7.5. */
object SparkEntry {

  // ------------------------------------------------------------- fixtures

  /** lineitem columns in the canonical order used for the positional total
    * order. `(l_orderkey, l_linenumber)` is NOT unique in the synthetic
    * data, so position is defined by ordering on ALL columns — ties are
    * then bit-identical rows and any tie order yields the same table. */
  private val LI = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")
  private val LI_ORDER = LI.mkString(", ")

  /** Oracle CTE assigning the same `_rowid` DuckDB-side. */
  private def BASE =
    s"WITH base AS (SELECT *, row_number() OVER (ORDER BY $LI_ORDER) - 1 AS _rowid FROM lineitem)"

  /** Full-row output projection: timestamps become strings so Spark/DuckDB
    * hash identically. */
  private def liOut(df: DataFrame): DataFrame =
    df.select(col("_rowid") +: LI.init.map(col) :+
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("l_shipdate"): _*)
      .orderBy("_rowid")
  private val LI_OUT_SQL =
    "_rowid, " + LI.init.mkString(", ") + ", strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate"

  private def renderAttr(a: graft.store.AttrValue): String = a match {
    case graft.store.AttrValue.I64(v)    => v.toString
    case graft.store.AttrValue.F64(v)    => v.toString
    case graft.store.AttrValue.Str(v)    => v
    case graft.store.AttrValue.I64Seq(v) => v.mkString("[", ", ", "]")
    case graft.store.AttrValue.F64Seq(v) => v.mkString("[", ", ", "]")
    case graft.store.AttrValue.StrSeq(v) => v.mkString("[", ", ", "]")
  }

  // One query-store per scale-factor dir, built once per JVM.
  private val stores = new ConcurrentHashMap[String, HDFStore]()

  private def store(spark: SparkSession, sfDir: String): HDFStore =
    stores.computeIfAbsent(sfDir, { _ =>
      val dir = "/tmp/graft-qstore/" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").sort(LI.map(col): _*)
      st.put("lineitem", li)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").sort("vec_id")
      st.put("embeddings", emb)
      // 20×20 row-major grid, value = linear index (N-D fixture)
      val grid = spark.range(400).select(
        (col("id") / 20).cast("long").as("i0"),
        (col("id") % 20).as("i1"),
        col("id").cast("double").as("value"))
      NDArray.create(st, "grid", grid, Seq(20L, 20L), Seq(-1L, 20L))
      // group-namespace fixture (G1-G3): parents auto-created
      st.createGroup("/geo/raw")
      st.put("geo/raw/region",
        spark.read.parquet(s"$sfDir/region.parquet").sort("r_regionkey"))
      st
    })

  private def li(spark: SparkSession, sfDir: String): HDFTable =
    store(spark, sfDir).table("lineitem")

  /** A fresh mutable copy of the base lineitem table (file-level copy) so
    * mutation queries never disturb shared state; idempotent per call. */
  private def mutCopy(spark: SparkSession, sfDir: String, name: String)
                     (mut: HDFTable => Unit): HDFTable = {
    val st = store(spark, sfDir)
    val full = "mut/" + name
    st.synchronized {
      if (st.isTable(full)) st.drop(full)
      st.copy("lineitem", full)
      val t = st.table(full)
      mut(t)
      t
    }
  }

  // ------------------------------------------------------------- contract

  /** Flagship: the SURVEY §7.3 minimum slice — store lineitem, positional
    * slice [3..10] — on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    liOut(li(spark, "/root/testdata/sf0.001").slice(3, 10))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parityQueries ++ extensionQueries

  def oracleSql: Map[String, String] = parityOracles ++ extensionOracles

  // ----------------------------------------------- §2 parity: reads

  private def parityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3+S5: create + bulk write + full scan round-trip
    "s3_create_scan" -> ((s, d) => liOut(li(s, d).df)),

    // S2: catalog scan (list tables); mut/* excluded (transient copies)
    "s2_keys" -> ((s, d) => {
      val st = store(s, d)
      val keys = st.keys.filterNot(_.startsWith("mut/"))
      s.createDataFrame(keys.map(Tuple1(_))).toDF("key").orderBy("key")
    }),

    // S6: drop table (create copy, drop it, observe catalog)
    "s6_drop" -> ((s, d) => {
      val st = store(s, d)
      st.synchronized {
        if (st.isTable("mut/dropme")) st.drop("mut/dropme")
        st.copy("lineitem", "mut/dropme")
        val before = if (st.isTable("mut/dropme")) 1L else 0L
        st.drop("mut/dropme")
        st.drop("mut/dropme") // second drop must silently no-op (nimtables.nim:106-109)
        val after = if (st.isTable("mut/dropme")) 1L else 0L
        s.createDataFrame(Seq((before, after))).toDF("existed_before", "exists_after")
      }
    }),

    // S10: hardlink + copy + contains: mutation via the link is shared
    "s10_copy_hardlink" -> ((s, d) => {
      val st = store(s, d)
      st.synchronized {
        Seq("mut/c", "mut/h").foreach(n => if (st.contains(n)) st.drop(n))
        st.copy("lineitem", "mut/c")
        st.hardlink("mut/c", "mut/h")
        val one = st.table("mut/c").slice(0, 0).drop("_rowid")
        st.table("mut/h").append(one) // append through the hardlink
        s.createDataFrame(Seq(
          ("mut/c", st.nrows("mut/c"), if (st.contains("mut/c")) 1L else 0L),
          ("mut/h", st.nrows("mut/h"), if (st.contains("mut/h")) 1L else 0L)
        )).toDF("name", "nrows", "contained").orderBy("name")
      }
    }),

    // P1: positional point read
    "p1_point" -> ((s, d) => liOut(li(s, d).point(41))),

    // P1 backwards: table[^i]
    "p1_point_back" -> ((s, d) => liOut(li(s, d).fromEnd(5))),

    // P2: positional slice
    "p2_slice" -> ((s, d) => liOut(li(s, d).slice(3, 10))),

    // P2 backwards: table[^10..^3]
    "p2_slice_back" -> ((s, d) => {
      val t = li(s, d); liOut(t.slice(t.nrows - 10, t.nrows - 3))
    }),

    // P3: coordinate-list selection
    "p3_coords" -> ((s, d) =>
      liOut(li(s, d).selectRows(Seq(0L, 7L, 41L, 599L, 4999L, 5998L)))),

    // P4: 1-D hyperslab (offset/count/stride/block) on the record dim
    "p4_hyperslab" -> ((s, d) => liOut(li(s, d).hyperslab(7, 100, 50, 3))),

    // P5: column projection
    "p5_project" -> ((s, d) =>
      li(s, d).select("l_orderkey", "l_extendedprice")
        .filter(col("_rowid") <= 999).orderBy("_rowid")),

    // P6: type-converting read (cast); truncation semantics like C
    "p6_cast" -> ((s, d) =>
      li(s, d).readAs("l_quantity", IntegerType)
        .filter(col("_rowid") <= 999).orderBy("_rowid")),

    // M7: O(1) row count from the catalog
    "m7_nrows" -> ((s, d) => {
      val n = li(s, d).nrows
      s.createDataFrame(Seq(Tuple1(n))).toDF("n")
    }),

    // ----------------------------------------------- §2 parity: mutations

    // M1: append 100 rows (copies of rows 0..99); observe the tail
    "m1_append" -> ((s, d) => {
      val t = mutCopy(s, d, "append") { t =>
        t.append(t.slice(0, 99).drop("_rowid"))
      }
      liOut(t.slice(t.nrows - 150, t.nrows - 1))
    }),

    // M2: positional update rows [10..14] with copies of rows [0..4]
    "m2_update" -> ((s, d) => {
      val t = mutCopy(s, d, "update") { t =>
        t.update(10, t.slice(0, 4).drop("_rowid"))
      }
      t.slice(5, 19).select("_rowid", "l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .orderBy("_rowid")
    }),

    // M3: delete rows [10..19]; dense renumber
    "m3_delete" -> ((s, d) => {
      val t = mutCopy(s, d, "delete") { t => t.delete(10, 19) }
      t.slice(5, 24).select("_rowid", "l_orderkey", "l_partkey", "l_quantity")
        .orderBy("_rowid")
    }),

    // M4: insert copies of rows [0..4] at position 15
    "m4_insert" -> ((s, d) => {
      val t = mutCopy(s, d, "insert") { t =>
        t.insert(15, t.slice(0, 4).drop("_rowid"))
      }
      t.slice(10, 24).select("_rowid", "l_orderkey", "l_partkey", "l_quantity")
        .orderBy("_rowid")
    }),

    // M5: resize — grow by 5 zero-filled records; observe the seam
    "m5_resize" -> ((s, d) => {
      val t = mutCopy(s, d, "resize") { t => t.resizeTo(t.nrows + 5) }
      t.slice(t.nrows - 8, t.nrows - 1)
        .select("_rowid", "l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
        .orderBy("_rowid")
    }),

    // M6: coordinate write on the 2-D grid (value += 1000 at 3 points)
    "m6_coord_write" -> ((s, d) => {
      val st = store(s, d)
      st.synchronized {
        if (st.contains("mut/grid")) st.drop("mut/grid")
        st.copy("grid", "mut/grid")
        val nd = NDArray.open(st, "mut/grid")
        nd.writePoints(Seq(Seq(0L, 0L), Seq(3L, 7L), Seq(19L, 19L)), id => id.toDouble + 1000.0)
        nd.df.filter(col("i0").isin(0, 3, 19))
          .select("i0", "i1", "value").orderBy("i0", "i1")
      }
    }),

    // ----------------------------------------------- §2 parity: N-D + VLEN

    // S7+S8: N-D create + whole read (row-major (i0,i1,value))
    "s8_nd_scan" -> ((s, d) => NDArray.open(store(s, d), "grid").read()),

    // P4 in 2-D: hyperslab offsets(2,1) counts(3,4) strides(6,5) blocks(2,3)
    "p4_hyperslab_2d" -> ((s, d) =>
      NDArray.open(store(s, d), "grid")
        .hyperslab(Seq(2, 1), Seq(3, 4), Seq(6, 5), Seq(2, 3))),

    // P3 in 2-D: coordinate-list read
    "p3_coords_2d" -> ((s, d) =>
      NDArray.open(store(s, d), "grid")
        .selectPoints(Seq(Seq(0L, 0L), Seq(3L, 7L), Seq(19L, 19L)))),

    // P6 on N-D: readAs int
    "p6_nd_cast" -> ((s, d) =>
      NDArray.open(store(s, d), "grid").readAs(LongType)
        .filter(col("i0") === 5).orderBy("i1")),

    // V1+V2: VLEN (ArrayType) round-trip through the store
    "v2_vlen_roundtrip" -> ((s, d) => {
      val t = store(s, d).table("embeddings")
      t.df.select(
        col("vec_id"), col("label"),
        size(col("embedding")).cast(LongType).as("n"),
        element_at(col("embedding"), 1).cast(DoubleType).as("e_first"),
        element_at(col("embedding"), size(col("embedding"))).cast(DoubleType).as("e_last")
      ).orderBy("vec_id")
    }),

    // V3: VLEN write — store a transformed (sliced) array column, read back
    "v3_vlen_write" -> ((s, d) => {
      val st = store(s, d)
      st.synchronized {
        if (st.isTable("mut/embslice")) st.drop("mut/embslice")
        val src = st.table("embeddings").df
          .select(col("vec_id"), slice(col("embedding"), 1, 4).as("emb4"))
          .orderBy("vec_id")
        st.put("mut/embslice", src)
        st.table("mut/embslice").df.select(
          col("vec_id"),
          element_at(col("emb4"), 1).cast(DoubleType).as("e1"),
          element_at(col("emb4"), 2).cast(DoubleType).as("e2"),
          element_at(col("emb4"), 3).cast(DoubleType).as("e3"),
          element_at(col("emb4"), 4).cast(DoubleType).as("e4")
        ).orderBy("vec_id")
      }
    }),

    // V4: VLEN positional slice (hyperslab over the record dim of a
    // VLEN-column table)
    "v4_vlen_slice" -> ((s, d) =>
      store(s, d).table("embeddings").slice(10, 19)
        .select(col("_rowid"), col("vec_id"),
          size(col("embedding")).cast(LongType).as("n"))
        .orderBy("_rowid")),

    // ----------------------------------------------- §2 parity: attrs/groups/codecs

    // A1-A4: typed attribute write/read/exists/delete surfaced as rows
    "a1_attrs" -> ((s, d) => {
      val st = store(s, d)
      st.synchronized {
        st.setAttr("lineitem", "rows", st.nrows("lineitem"))
        st.setAttr("lineitem", "source", "tpch-lineitem")
        st.setAttr("lineitem", "pi", 3.25) // exactly representable
        st.setAttr("lineitem", "dims", Seq(20L, 20L))
        st.setAttr("", "store_format", "graft-parquet-v1")
        st.setAttr("lineitem", "doomed", 1L)
        st.deleteAttr("lineitem", "doomed")
        // read back through the typed attribute API
        val read = Seq("rows", "source", "pi", "dims")
          .map(k => ("lineitem", k, renderAttr(st.getAttr("lineitem", k))))
        val rows = (("", "store_format", renderAttr(st.getAttr("", "store_format"))) +: read) :+
          (("lineitem", "doomed_exists", if (st.hasAttr("lineitem", "doomed")) "1" else "0"))
        s.createDataFrame(rows).toDF("obj", "key", "val").orderBy("obj", "key")
      }
    }),

    // A5: copy_attributes between objects
    "a5_copy_attrs" -> ((s, d) => {
      val st = store(s, d)
      st.synchronized {
        st.setAttr("embeddings", "model", "fake-embedder-v1")
        st.setAttr("grid", "unit", "index")
        st.copyAttrs("embeddings", "grid")
        val rows = st.attrKeys("grid").map(k => ("grid", k, renderAttr(st.getAttr("grid", k))))
        s.createDataFrame(rows).toDF("obj", "key", "val").orderBy("key")
      }
    }),

    // G1-G3: group namespace — create, implicit parents, typed listing
    "g1_groups" -> ((s, d) => {
      val st = store(s, d)
      val tables = st.keys("geo", -1).filter(st.isTable).map(k => (k, "table"))
      val groups = Seq("geo", "geo/raw").filter(st.isGroup).map(g => (g, "group"))
      s.createDataFrame(tables ++ groups).toDF("name", "kind").orderBy("name", "kind")
    }),

    // F1/F3: codec + chunk-size knobs round-trip (zstd, 4k-row files)
    "f1_codec_roundtrip" -> ((s, d) => {
      val st = store(s, d)
      st.synchronized {
        if (!st.isTable("mut/zstd")) {
          val src = st.table("lineitem").df.drop("_rowid")
          st.put("mut/zstd", src, Some(4096L), Some("zstd"))
        }
        st.table("mut/zstd").df.agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_qty"))
      }
    })
  )

  private def parityOracles: Map[String, String] = Map(
    "s3_create_scan" -> s"$BASE SELECT $LI_OUT_SQL FROM base ORDER BY _rowid",

    "s2_keys" -> ("SELECT * FROM (VALUES ('embeddings'), ('geo/raw/region'), ('grid'), ('lineitem')) t(key) " +
      "ORDER BY key"),

    "s6_drop" -> "SELECT 1::BIGINT AS existed_before, 0::BIGINT AS exists_after",

    "s10_copy_hardlink" ->
      ("SELECT 'mut/c' AS name, count(*) + 1 AS nrows, 1::BIGINT AS contained FROM lineitem " +
       "UNION ALL SELECT 'mut/h', count(*) + 1, 1::BIGINT FROM lineitem ORDER BY name"),

    "p1_point" -> s"$BASE SELECT $LI_OUT_SQL FROM base WHERE _rowid = 41",

    "p1_point_back" ->
      s"$BASE SELECT $LI_OUT_SQL FROM base WHERE _rowid = (SELECT count(*) FROM lineitem) - 5",

    "p2_slice" -> s"$BASE SELECT $LI_OUT_SQL FROM base WHERE _rowid BETWEEN 3 AND 10 ORDER BY _rowid",

    "p2_slice_back" ->
      (s"$BASE SELECT $LI_OUT_SQL FROM base WHERE _rowid BETWEEN (SELECT count(*) FROM lineitem) - 10 " +
       "AND (SELECT count(*) FROM lineitem) - 3 ORDER BY _rowid"),

    "p3_coords" ->
      s"$BASE SELECT $LI_OUT_SQL FROM base WHERE _rowid IN (0, 7, 41, 599, 4999, 5998) ORDER BY _rowid",

    "p4_hyperslab" ->
      (s"$BASE SELECT $LI_OUT_SQL FROM base WHERE _rowid >= 7 AND _rowid <= 7 + 99*50 + 2 " +
       "AND (_rowid - 7) % 50 < 3 ORDER BY _rowid"),

    "p5_project" ->
      s"$BASE SELECT _rowid, l_orderkey, l_extendedprice FROM base WHERE _rowid <= 999 ORDER BY _rowid",

    // CAST(double AS INT) rounds in DuckDB but truncates in Spark/C;
    // quantities are positive so floor == truncation.
    "p6_cast" ->
      s"$BASE SELECT _rowid, CAST(floor(l_quantity) AS INTEGER) AS l_quantity FROM base WHERE _rowid <= 999 ORDER BY _rowid",

    "m7_nrows" -> "SELECT count(*) AS n FROM lineitem",

    "m1_append" ->
      (s"$BASE, n AS (SELECT count(*) AS c FROM lineitem), post AS (" +
       s"SELECT ${LI.mkString(", ")}, _rowid FROM base " +
       s"UNION ALL SELECT ${LI.mkString(", ")}, _rowid + (SELECT c FROM n) FROM base WHERE _rowid < 100) " +
       s"SELECT $LI_OUT_SQL FROM post WHERE _rowid >= (SELECT c FROM n) - 50 ORDER BY _rowid"),

    "m2_update" ->
      (s"$BASE SELECT b._rowid, " +
       "CASE WHEN b._rowid BETWEEN 10 AND 14 THEN r.l_orderkey ELSE b.l_orderkey END AS l_orderkey, " +
       "CASE WHEN b._rowid BETWEEN 10 AND 14 THEN r.l_partkey ELSE b.l_partkey END AS l_partkey, " +
       "CASE WHEN b._rowid BETWEEN 10 AND 14 THEN r.l_suppkey ELSE b.l_suppkey END AS l_suppkey, " +
       "CASE WHEN b._rowid BETWEEN 10 AND 14 THEN r.l_quantity ELSE b.l_quantity END AS l_quantity " +
       "FROM base b LEFT JOIN base r ON r._rowid = b._rowid - 10 " +
       "WHERE b._rowid BETWEEN 5 AND 19 ORDER BY b._rowid"),

    "m3_delete" ->
      (s"$BASE, post AS (SELECT *, _rowid - CASE WHEN _rowid > 19 THEN 10 ELSE 0 END AS new_id " +
       "FROM base WHERE _rowid NOT BETWEEN 10 AND 19) " +
       "SELECT new_id AS _rowid, l_orderkey, l_partkey, l_quantity FROM post " +
       "WHERE new_id BETWEEN 5 AND 24 ORDER BY new_id"),

    "m4_insert" ->
      (s"$BASE, shifted AS (SELECT l_orderkey, l_partkey, l_quantity, " +
       "CASE WHEN _rowid >= 15 THEN _rowid + 5 ELSE _rowid END AS new_id FROM base), " +
       "ins AS (SELECT l_orderkey, l_partkey, l_quantity, _rowid + 15 AS new_id FROM base WHERE _rowid < 5), " +
       "post AS (SELECT * FROM shifted UNION ALL SELECT * FROM ins) " +
       "SELECT new_id AS _rowid, l_orderkey, l_partkey, l_quantity FROM post " +
       "WHERE new_id BETWEEN 10 AND 24 ORDER BY new_id"),

    "m5_resize" ->
      (s"$BASE, n AS (SELECT count(*) AS c FROM lineitem), " +
       "tail AS (SELECT _rowid, l_orderkey, l_partkey, l_quantity, l_returnflag FROM base " +
       "WHERE _rowid >= (SELECT c FROM n) - 3), " +
       "zeros AS (SELECT (SELECT c FROM n) + g AS _rowid, 0::BIGINT AS l_orderkey, " +
       "0::BIGINT AS l_partkey, CAST(0 AS DOUBLE) AS l_quantity, '' AS l_returnflag " +
       "FROM generate_series(0, 4) t(g)) " +
       "SELECT * FROM tail UNION ALL SELECT * FROM zeros ORDER BY _rowid"),

    "m6_coord_write" ->
      ("WITH g AS (SELECT i.g AS i0, j.g AS i1, CAST(i.g * 20 + j.g AS DOUBLE) AS value " +
       "FROM generate_series(0, 19) i(g), generate_series(0, 19) j(g)) " +
       "SELECT i0, i1, CASE WHEN (i0, i1) IN ((0, 0), (3, 7), (19, 19)) THEN value + 1000 ELSE value END AS value " +
       "FROM g WHERE i0 IN (0, 3, 19) ORDER BY i0, i1"),

    "s8_nd_scan" ->
      ("SELECT i.g AS i0, j.g AS i1, CAST(i.g * 20 + j.g AS DOUBLE) AS value " +
       "FROM generate_series(0, 19) i(g), generate_series(0, 19) j(g) ORDER BY i0, i1"),

    "p4_hyperslab_2d" ->
      ("SELECT i.g AS i0, j.g AS i1, CAST(i.g * 20 + j.g AS DOUBLE) AS value " +
       "FROM generate_series(0, 19) i(g), generate_series(0, 19) j(g) " +
       "WHERE i.g >= 2 AND i.g <= 2 + 2*6 + 1 AND (i.g - 2) % 6 < 2 " +
       "AND j.g >= 1 AND j.g <= 1 + 3*5 + 2 AND (j.g - 1) % 5 < 3 ORDER BY i0, i1"),

    "p3_coords_2d" ->
      ("SELECT i.g AS i0, j.g AS i1, CAST(i.g * 20 + j.g AS DOUBLE) AS value " +
       "FROM generate_series(0, 19) i(g), generate_series(0, 19) j(g) " +
       "WHERE (i.g, j.g) IN ((0, 0), (3, 7), (19, 19)) ORDER BY i0, i1"),

    "p6_nd_cast" ->
      ("SELECT 5::BIGINT AS i0, j.g AS i1, 5 * 20 + j.g AS value " +
       "FROM generate_series(0, 19) j(g) ORDER BY i1"),

    "v2_vlen_roundtrip" ->
      ("SELECT vec_id, label, len(embedding)::BIGINT AS n, " +
       "CAST(embedding[1] AS DOUBLE) AS e_first, CAST(embedding[len(embedding)] AS DOUBLE) AS e_last " +
       "FROM embeddings ORDER BY vec_id"),

    "v3_vlen_write" ->
      ("SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS e1, CAST(embedding[2] AS DOUBLE) AS e2, " +
       "CAST(embedding[3] AS DOUBLE) AS e3, CAST(embedding[4] AS DOUBLE) AS e4 " +
       "FROM embeddings ORDER BY vec_id"),

    "v4_vlen_slice" ->
      ("WITH base AS (SELECT *, row_number() OVER (ORDER BY vec_id) - 1 AS _rowid FROM embeddings) " +
       "SELECT _rowid, vec_id, len(embedding)::BIGINT AS n FROM base " +
       "WHERE _rowid BETWEEN 10 AND 19 ORDER BY _rowid"),

    "a1_attrs" ->
      ("SELECT '' AS obj, 'store_format' AS key, 'graft-parquet-v1' AS val " +
       "UNION ALL SELECT 'lineitem', 'rows', CAST((SELECT count(*) FROM lineitem) AS VARCHAR) " +
       "UNION ALL SELECT 'lineitem', 'source', 'tpch-lineitem' " +
       "UNION ALL SELECT 'lineitem', 'pi', '3.25' " +
       "UNION ALL SELECT 'lineitem', 'dims', '[20, 20]' " +
       "UNION ALL SELECT 'lineitem', 'doomed_exists', '0' ORDER BY obj, key"),

    "a5_copy_attrs" ->
      ("SELECT * FROM (VALUES ('grid', 'model', 'fake-embedder-v1'), " +
       "('grid', 'unit', 'index')) t(obj, key, val) ORDER BY key"),

    "g1_groups" ->
      ("SELECT * FROM (VALUES ('geo', 'group'), ('geo/raw', 'group'), " +
       "('geo/raw/region', 'table')) t(name, kind) ORDER BY name, kind"),

    "f1_codec_roundtrip" ->
      ("SELECT count(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty " +
       "FROM lineitem")
  )

  // ----------------------------------------------- extensions (batch 2)

  private def extensionQueries: Map[String, (SparkSession, String) => DataFrame] = Map()
  private def extensionOracles: Map[String, String] = Map()
}
