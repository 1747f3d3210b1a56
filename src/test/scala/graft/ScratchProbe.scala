package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for optimization work — times the phases
  * of the expensive stream-ingest gates outside the streaming harness.
  * `sbt "Test/runMain graft.ScratchProbe [sfDir]"`. Not part of any
  * gate or test suite. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.warm(spark, sfDir)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    // mirror x_stream_text_ingest's phases
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // force fixture build (warm path) once
    val q = SparkEntry.queries("x_stream_text_ingest")
    q(spark, sfDir).count() // everything warm
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      t("full x_stream_text_ingest")(q(spark, sfDir).count())
    }
    // now decompose manually
    val base = {
      // same path the gate's fixture uses
      val m = classOf[SparkEntry.type]
      // can't reach private; rebuild an equivalent base index here
      val p = "/tmp/graft-scratch-ti-base"
      val f = new java.io.File(p)
      if (!f.exists())
        graft.ops.TextIndex.buildTextIndex(
          docs.filter(col("doc_id") < 200).select("doc_id", "text"),
          "doc_id", "text", p, nBuckets = 64)
      p
    }
    val nfiles = {
      def cnt(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(cnt).sum).getOrElse(0) else 1
      cnt(new java.io.File(base))
    }
    println(s"base index files: $nfiles")
    (1 to 2).foreach { pass =>
      val dst = s"/tmp/graft-scratch-ti-clone-$pass"
      t(s"cloneTree ($nfiles files)") {
        val conf = spark.sparkContext.hadoopConfiguration
        val sp = new org.apache.hadoop.fs.Path(base)
        val dp = new org.apache.hadoop.fs.Path(dst)
        org.apache.hadoop.fs.FileUtil.copy(
          sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp, false, conf)
      }
      val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 250)
        .select("doc_id", "text")
      t("appendTextIndex b1")(
        graft.ops.TextIndex.appendTextIndex(b1, "doc_id", "text", dst))
      val b2 = docs.filter(col("doc_id") >= 250 && col("doc_id") < 300)
        .select("doc_id", "text")
      t("appendTextIndex b2")(
        graft.ops.TextIndex.appendTextIndex(b2, "doc_id", "text", dst))
      val corpus = docs.filter(col("doc_id") < 300).select("doc_id", "text")
      t("searchIndex+verify")(
        graft.ops.TextIndex.searchIndex(spark, dst,
          "the data quick join hash never-in-corpus", 10,
          verifyAgainst = (corpus, "doc_id")).collect())
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dst))
    }
    // statement-level decomposition of appendTextIndex's phases
    locally {
      val dst = "/tmp/graft-scratch-ti-clone-x"
      val conf = spark.sparkContext.hadoopConfiguration
      val sp = new org.apache.hadoop.fs.Path(base)
      val dp = new org.apache.hadoop.fs.Path(dst)
      org.apache.hadoop.fs.FileUtil.copy(
        sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp, false, conf)
      val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 250)
        .select("doc_id", "text")
      import org.apache.spark.sql.types.LongType
      val deltaIds = b1.select(col("doc_id").cast(LongType).as("id"))
      t("loadMeta") {
        spark.read.parquet(s"$dst/_meta").head()
      }
      t("guard agg count/distinct") {
        deltaIds.agg(count(col("id")), count_distinct(col("id"))).head()
      }
      val ib = t("bloom load")(graft.ops.IndexIds.load(spark, dst).get)
      t("bloom probe suspects") {
        val bc = spark.sparkContext.broadcast(ib.bloom)
        deltaIds.filter(graft.functions.native.bloom_might_contain(col("id"), bc))
          .distinct().limit(1).collect()
      }
      t("mergeAppend") {
        graft.ops.IndexIds.mergeAppend(spark, dst, deltaIds, 50L)
      }
      val postings = b1
        .select(col("doc_id").cast(LongType).as("id"), col("text"))
        .select(col("id"), posexplode(graft.ops.TextStats.tokens(col("text"))))
        .withColumnRenamed("col", "token")
        .groupBy("id", "token").agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("positions"))
        .withColumn("doc_len", sum(col("tf")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("id")))
        .withColumn("bucket", pmod(graft.ops.TextStats.hash60(col("token")), lit(64L)))
      t("postings write (partitionBy bucket)") {
        postings.repartition(col("bucket"))
          .sortWithinPartitions("bucket", "token", "id")
          .write.partitionBy("bucket").mode("append").parquet(dst)
      }
      t("_meta write") {
        spark.range(1).select(lit(64).as("n_buckets"), lit(1L).as("n_rows"),
            lit(BigDecimal(1)).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("id_hash_sum"),
            lit(100L).as("total_tokens"))
          .coalesce(1).write.mode("overwrite").parquet(s"$dst/_meta")
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dst))
    }
    spark.stop()
  }
}
