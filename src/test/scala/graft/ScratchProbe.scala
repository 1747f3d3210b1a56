package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch decomposition probe for optimization work — not part of any
  * gate or test suite. `sbt "Test/runMain graft.ScratchProbe [sfDir]"`. */
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
      println(f"PHASE $tag%-38s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // --- appendTextIndex remaining decomposition
    locally {
      val base = {
        val p = "/tmp/graft-scratch-ti-base2"
        if (!new java.io.File(p).exists())
          graft.ops.TextIndex.buildTextIndex(
            docs.filter(col("doc_id") < 200).select("doc_id", "text"),
            "doc_id", "text", p, nBuckets = 64)
        p
      }
      (1 to 2).foreach { pass =>
        val dst = s"/tmp/graft-scratch-ti2-$pass"
        val conf = spark.sparkContext.hadoopConfiguration
        org.apache.hadoop.fs.FileUtil.copy(
          new org.apache.hadoop.fs.Path(base).getFileSystem(conf),
          new org.apache.hadoop.fs.Path(base),
          new org.apache.hadoop.fs.Path(dst).getFileSystem(conf),
          new org.apache.hadoop.fs.Path(dst), false, conf)
        val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 250)
          .select("doc_id", "text")
        t(s"appendTextIndex (pass $pass)")(
          graft.ops.TextIndex.appendTextIndex(b1, "doc_id", "text", dst))
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(dst))
      }
    }
    // --- kmeans-trained decomposition
    locally {
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      import graft.ops.Similarity
      (1 to 2).foreach { pass =>
        println(s"--- kmeans pass $pass")
        val seed = t("seed collect")(
          embs.select(col("vec_id").cast(LongType), col("embedding"))
            .orderBy(col("vec_id")).limit(8)
            .collect().toSeq.map(_.getSeq[Float](1).map(_.toDouble)))
        t("lloyd 1 iter")(
          Similarity.kmeansCodebook(embs, "embedding", seed, 1))
        t("lloyd 2 iters")(
          Similarity.kmeansCodebook(embs, "embedding", seed, 2))
        t("semanticDedup full")(
          graft.ops.Dedup.semanticDedup(embs, "vec_id", "embedding",
            k = 8, iters = 1, minCosine = 0.4).count())
        // hypothesis tests: what makes one Lloyd aggregate cost ~0.7s?
        val dyy = seed.map(c =>
          graft.functions.CodebookKernels.fixedDotDriver(c, c))
        val assigned = embs.select(
          graft.functions.native.nearest_centroid(col("embedding"), seed, dyy)
            .as("list"),
          col("embedding").as("v"))
        t("assign-only noop")(
          assigned.write.format("noop").mode("overwrite").save())
        val perDimDec = (0 until 64).map(i =>
          sum(round(element_at(col("v"), i + 1).cast(DoubleType) * lit(1e15))
            .cast(DecimalType(38, 0))).as(s"sf_$i"))
        t("agg 64 decimal sums")(
          assigned.groupBy("list").agg(count(lit(1)).as("cnt"), perDimDec: _*)
            .collect())
        val perDimDbl = (0 until 64).map(i =>
          sum(element_at(col("v"), i + 1).cast(DoubleType)).as(s"sf_$i"))
        t("agg 64 double sums")(
          assigned.groupBy("list").agg(count(lit(1)).as("cnt"), perDimDbl: _*)
            .collect())
        val perDimLong = (0 until 64).map(i =>
          sum(round(element_at(col("v"), i + 1).cast(DoubleType) * lit(1e15))
            .cast(LongType)).as(s"sf_$i"))
        t("agg 64 long sums")(
          assigned.groupBy("list").agg(count(lit(1)).as("cnt"), perDimLong: _*)
            .collect())
        t("agg exploded decimal")(
          assigned.select(col("list"), posexplode(col("v")))
            .select(col("list"), col("pos"),
              round(col("col").cast(DoubleType) * lit(1e15))
                .cast(DecimalType(38, 0)).as("sf"))
            .groupBy("list", "pos")
            .agg(count(lit(1)).as("cnt"), sum(col("sf")).as("s"))
            .collect())
        t("agg exploded decimal 2nd")(
          assigned.select(col("list"), posexplode(col("v")))
            .select(col("list"), col("pos"),
              round(col("col").cast(DoubleType) * lit(1e15))
                .cast(DecimalType(38, 0)).as("sf"))
            .groupBy("list", "pos")
            .agg(count(lit(1)).as("cnt"), sum(col("sf")).as("s"))
            .collect())
        t("trivial agg reference")(
          spark.range(0, 128000, 1, 1).groupBy(col("id") % 8)
            .agg(count(lit(1))).collect())
        t("assign agg only (count)")(
          assigned.groupBy("list").agg(count(lit(1))).collect())
      }
    }
    spark.stop()
  }
}
