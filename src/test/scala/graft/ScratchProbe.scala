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
    import graft.ops.{Dedup, TextStats}
    val q = SparkEntry.queries("x_pipeline_clean")
    q(spark, sfDir).count() // warm
    (1 to 2).foreach { p => t(s"full x_pipeline_clean $p")(q(spark, sfDir).count()) }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val canon = docs.select(col("doc_id"), col("source"),
        TextStats.normalizeWhitespace(col("text")).as("text"))
      t("canon.count")(canon.count())
      val deduped = Dedup.exact(canon, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
        .join(canon, "doc_id")
      t("deduped.count")(deduped.count())
      val scored = TextStats.quality(deduped, "text")
        .withColumn("lang_guess", TextStats.langId(col("text")))
      val clean = scored
        .filter(col("n_tokens") >= 10 && col("stopword_ratio") >= 0.05)
        .select("doc_id", "source", "lang_guess", "n_tokens", "quality_score")
        .orderBy("doc_id")
      t("clean.count (quality+langId)")(clean.count())
      t("clean.noop-write") {
        clean.write.format("noop").mode("overwrite").save()
      }
      t("quality-only noop") {
        TextStats.quality(deduped, "text")
          .write.format("noop").mode("overwrite").save()
      }
      t("langId-only noop") {
        deduped.withColumn("lang_guess", TextStats.langId(col("text")))
          .write.format("noop").mode("overwrite").save()
      }
      t("tokens-only noop") {
        deduped.select(size(TextStats.tokens(col("text"))).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      t("deduped-only noop") {
        deduped.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
