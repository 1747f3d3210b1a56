package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{HDFStore, StoreMode}

/** The `format("hdfstore")` DataFrame connector (BASELINE north star). */
class ConnectorSpec extends AnyFunSuite {
  import Fixture._
  private lazy val spark = TestSpark.spark

  test("read/write through format(\"hdfstore\") with positional pushdown") {
    val dir = TestSpark.tmpDir("conn")
    import spark.implicits._

    // write via the connector
    particles.toDF().write.format("hdfstore")
      .option("table", "particles").save(dir)

    // read via the connector — no graft imports needed at the call site
    val df = spark.read.format("hdfstore").option("table", "particles").load(dir)
    assert(df.count() == 13)
    assert(df.columns.contains("_rowid"))

    // positional filter: rows 3..10 — resolved via segment pruning
    val sliced = df.filter(col("_rowid") >= 3 && col("_rowid") <= 10)
    assert(sliced.count() == 8)
    assert(sliced.agg(min("lati"), max("lati")).collect()(0).toSeq == Seq(4L, 11L))

    // column pruning path
    assert(df.select("lati").orderBy("lati").collect().map(_.getLong(0)).toSeq ==
      (1L to 13L))

    // append mode adds rows, ErrorIfExists refuses
    particles.take(2).toDF().write.format("hdfstore").mode("append")
      .option("table", "particles").save(dir)
    assert(spark.read.format("hdfstore").option("table", "particles").load(dir).count() == 15)
    intercept[IllegalStateException] {
      particles.toDF().write.format("hdfstore").mode("errorifexists")
        .option("table", "particles").save(dir)
    }

    // empty-result bound: filter past the end
    assert(df.filter(col("_rowid") > 1000000).count() == 0)
  }

  test("SQL over registered store views") {
    val dir = TestSpark.tmpDir("views")
    import spark.implicits._
    val st = HDFStore.open(spark, dir, StoreMode.Overwrite)
    st.put("geo/p", particles)
    st.registerViews()
    val n = spark.sql("SELECT count(*) FROM hdf_geo_p WHERE _rowid BETWEEN 3 AND 10")
      .collect()(0).getLong(0)
    assert(n == 8)
    st.close()
  }
}
