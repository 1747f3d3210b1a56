package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench profiler: times ONE `SparkEntry.queries` entry
  * for N iterations under the exact Bench conditions (same master,
  * shuffle partitions, cache clear between passes, one untimed warmup)
  * and prints every sample plus the median — the tool for deciding
  * whether a per-round bench mover is a real regression or harness
  * noise without paying for the full 163-query suite.
  *
  * Usage: `Test/runMain graft.ProfileOne <query> [iters] [sfDir]`
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x_pipeline_clean")
    val iters = if (args.length > 1) args(1).toInt else 9
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.warm(spark, sfDir)
    val q = SparkEntry.queries(name)
    def once(): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // untimed warmup, mirroring Bench
    val samples = (1 to iters).map { i =>
      val dt = once(); println(f"sample $i%2d: $dt%6.3f s"); dt
    }.sorted
    val med =
      if (iters % 2 == 1) samples(iters / 2)
      else (samples(iters / 2 - 1) + samples(iters / 2)) / 2
    println(f"PROFILE $name median=$med%.3f s min=${samples.head}%.3f " +
      f"max=${samples.last}%.3f iters=$iters sf=$sfDir")
    spark.stop()
  }
}
