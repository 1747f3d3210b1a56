package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Each query is timed `SPARK_GRAFT_BENCH_RUNS` times (default 3, full
  * suite passes) and the reported per-query number is the MEDIAN across
  * passes — a single-run gate proved noise-dominated (a no-change round
  * moved the total 2×). The Spark SQL cache is cleared between passes so
  * a `.cache()` inside one query can neither warm nor thrash a later
  * pass; OS page cache stays warm, which is the steady-state being
  * measured. `warm()` runs once, outside all timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.warm(spark, sfDir) // one-time store build outside the timings
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val runTotals = (1 to runs).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      names.map { name =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        samples(name) = samples(name) :+ dt
        dt
      }.sum
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val med = names.map(n => n -> median(samples(n)))
    val qs = med.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Structured-streaming gates (`x_stream_*`) carry ~10 s of fixed
    // checkpoint/micro-batch overhead that is the same at any scale
    // factor; keep them out of the headline batch number so
    // round-over-round comparisons track the engine, not the harness.
    def isStream(n: String) = n.startsWith("x_stream_")
    val total = med.collect { case (n, v) if !isStream(n) => v }.sum
    val totalStream = med.collect { case (n, v) if isStream(n) => v }.sum
    // Locale.ROOT: a comma-decimal default locale would emit "12,345"
    // and break the JSON parseability this line exists to guarantee
    def f3(x: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(x))
    val rt = runTotals.map(f3).mkString("[", ",", "]")
    // The full record (per-query medians) goes to bench.json only; the
    // final stdout line must stay SHORT. The round driver tail-captures
    // the last 2000 chars of stdout, so a per-query map (~2.8 KB at 84
    // queries) clips its own head no matter where the line sits. The
    // summary below is ~170 chars and cannot grow with the query count.
    val record =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","total_stream":${f3(totalStream)},"queries":$qs,"runs":$runs,"run_totals":$rt,"sf":"$sfDir"}"""
    val summary =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","total_stream":${f3(totalStream)},"runs":$runs,"run_totals":$rt,"sf":"$sfDir"}"""
    // Persist the record BEFORE any shutdown output, stop Spark (its
    // shutdown logs land above us), THEN print the summary as the very
    // last stdout line. The file write is best-effort — it must never
    // eat the stdout line.
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (record + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] bench.json write failed: ${e.getMessage}") }
    spark.stop()
    System.out.flush()
    println(summary)
    System.out.flush()
  }
}
