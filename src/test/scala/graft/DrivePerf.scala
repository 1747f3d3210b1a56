package graft

import org.apache.spark.sql.SparkSession

/** Scratch perf probe: time individual SparkEntry queries under the
  * bench's session config — run with
  * `sbt "Test/runMain graft.DrivePerf <sfDir> <query> [query...]"`. */
object DrivePerf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("x_dsir_weights", "x_dsir_resample")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.warm(spark, sfDir)
    (1 to 3).foreach { pass =>
      names.foreach { n =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"pass$pass $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$cnt")
      }
    }
    if (sys.env.contains("DRIVE_DSIR_BISECT")) {
      import org.apache.spark.sql.functions._
      val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      def w = graft.ops.Importance.importanceWeights(raw,
        raw.filter(col("doc_id") < 100), "doc_id", "text", nBuckets = 8192)
      def t(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"bisect $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      }
      t("A weights.count")(w.count())
      t("B weights.filter(notnull).count")(w.filter(col("log_weight").isNotNull).count())
      t("C resample(w, 50).count")(
        graft.ops.Importance.resampleByWeight(w, "doc_id", "log_weight", 50).count())
      val ckpt = w.localCheckpoint(true)
      t("D resample(checkpointed w, 50)")(
        graft.ops.Importance.resampleByWeight(ckpt, "doc_id", "log_weight", 50).count())
      t("E w.orderBy(lw desc).limit(50)")(
        w.orderBy(col("log_weight").desc).limit(50).count())
    }
    if (sys.env.contains("DRIVE_EXPLAIN"))
      names.foreach { n =>
        println(s"===== plan: $n")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
