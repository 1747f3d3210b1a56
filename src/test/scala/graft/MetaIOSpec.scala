package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.store.MetaIO

/** Bidirectional compatibility of the driver-direct metadata I/O with
  * Spark's own parquet reader/writer — the contract that lets MetaIO
  * replace `spark.read.parquet(...).head()` / `coalesce(1).write` on
  * the one-row sidecar paths without changing any on-disk format. */
class MetaIOSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"metaio-$tag").toString + "/d"

  test("MetaIO-written row reads back via spark.read.parquet (all types)") {
    val dir = tmpDir("m2s")
    val dec = new java.math.BigDecimal("-123456789012345678901234567890")
    MetaIO.writeRow(conf, dir, Seq(
      "l" -> 42L, "i" -> 7, "d" -> 3.25, "b" -> true,
      "s" -> "héllo", "bin" -> Array[Byte](1, 2, -3),
      "dec" -> dec))
    val r = spark.read.parquet(dir)
      .select("l", "i", "d", "b", "s", "bin", "dec").head()
    assert(r.getLong(0) == 42L)
    assert(r.getInt(1) == 7)
    assert(r.getDouble(2) == 3.25)
    assert(r.getBoolean(3))
    assert(r.getString(4) == "héllo")
    assert(r.getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, -3))
    assert(r.getDecimal(6).compareTo(dec) == 0)
  }

  test("Spark-written row reads back via MetaIO.readRow (all types)") {
    val dir = tmpDir("s2m")
    val dec = new java.math.BigDecimal("99999999999999999999999999999999999999") // 38 nines
    spark.range(1).select(
        lit(42L).as("l"), lit(7).as("i"), lit(3.25).as("d"), lit(true).as("b"),
        lit("héllo").as("s"), lit(Array[Byte](1, 2, -3)).as("bin"),
        lit(dec).cast(DecimalType(38, 0)).as("dec"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val m = MetaIO.readRow(conf, dir).get
    assert(m("l") == 42L)
    assert(m("i") == 7)
    assert(m("d") == 3.25)
    assert(m("b") == true)
    assert(m("s") == "héllo")
    assert(m("bin").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, -3))
    assert(m("dec").asInstanceOf[java.math.BigDecimal].compareTo(dec) == 0)
  }

  test("MetaIO round trip (write → readRow), overwrite replaces the row") {
    val dir = tmpDir("rt")
    MetaIO.writeRow(conf, dir, Seq("v" -> 1L, "w" -> "a"))
    MetaIO.writeRow(conf, dir, Seq("v" -> 2L, "w" -> "b"))
    val m = MetaIO.readRow(conf, dir).get
    assert(m("v") == 2L && m("w") == "b")
    // exactly one data file after overwrite
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(files.length == 1)
  }

  test("swap safety: a crash-window backup loses to the fresh row and is cleaned") {
    // simulate the crash window between the swap's two renames: the old
    // row sits under the backup name beside a fresh part-00000-meta —
    // the reader must pick the FRESH row (backup name sorts after), and
    // the next write must clean the leftover
    val dir = tmpDir("swap")
    MetaIO.writeRow(conf, dir, Seq("v" -> 1L))
    val d = new java.io.File(dir)
    val fin = new java.io.File(d, "part-00000-meta.parquet")
    val bak = new java.io.File(d, "part-00001-meta-old-deadbeef.parquet")
    java.nio.file.Files.copy(fin.toPath, bak.toPath)
    MetaIO.writeRow(conf, dir, Seq("v" -> 2L)) // fin now holds 2, bak holds 1
    // plant the window again: bak beside the new fin
    java.nio.file.Files.copy(fin.toPath, new java.io.File(d,
      "part-00001-meta-old-cafebabe.parquet").toPath)
    val older = new java.io.File(d, "part-00001-meta-old-cafebabe.parquet")
    assert(older.exists())
    assert(MetaIO.readRow(conf, dir).get("v") == 2L) // fresh row wins
    MetaIO.writeRow(conf, dir, Seq("v" -> 3L))
    val files = d.listFiles().filter(f =>
      f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(files.map(_.getName).toSeq == Seq("part-00000-meta.parquet"),
      files.map(_.getName).toSeq)
    assert(MetaIO.readRow(conf, dir).get("v") == 3L)
  }

  test("readRow: missing dir / empty dir → None") {
    assert(MetaIO.readRow(conf, "/tmp/metaio-definitely-missing-xyz").isEmpty)
    val dir = tmpDir("empty")
    new java.io.File(dir).mkdirs()
    assert(MetaIO.readRow(conf, dir).isEmpty)
  }

  test("DuckDB reads a MetaIO-written file (oracle-side compatibility)") {
    // the oracle compares store-table parquet, not sidecars, but keep
    // the stronger property: MetaIO files are plain parquet everywhere
    val dir = tmpDir("duck")
    MetaIO.writeRow(conf, dir, Seq("n" -> 5L, "name" -> "x"))
    // plain parquet magic check (PAR1 header) as a stand-in for an
    // external reader — DuckDB itself is not on this classpath
    val f = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")).head
    val in = new java.io.FileInputStream(f)
    val magic = new Array[Byte](4); in.read(magic); in.close()
    assert(new String(magic, "US-ASCII") == "PAR1")
  }
}
