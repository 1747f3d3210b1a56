package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query bench breakdown: for each (or each named) `SparkEntry.queries`
  * entry, one warmup pass then one timed pass recording wall seconds, Spark
  * JOB count, task count, and shuffle read/write bytes — the numbers that
  * separate "fixed per-job overhead" from "real shuffle/compute work" when
  * deciding what to optimize. Run with
  * `sbt "Test/runMain graft.BreakdownDrive [sfDir] [query...]"`.
  * Output: one `BRK name secs jobs tasks shufR shufW` line per query (tsv). */
object BreakdownDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val shufR = new java.util.concurrent.atomic.AtomicLong(0)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })
    SparkEntry.warm(spark, sfDir)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // settle async listener events so counters attribute to the right query
    def drain(): Unit = {
      // listenerBus is private[spark]; settle by quiescence instead
      var last = (jobs.get, tasks.get, shufR.get, shufW.get)
      var quiet = 0
      val deadline = System.nanoTime() + 2000000000L
      while (quiet < 2 && System.nanoTime() < deadline) {
        Thread.sleep(20)
        val now = (jobs.get, tasks.get, shufR.get, shufW.get)
        if (now == last) quiet += 1 else { quiet = 0; last = now }
      }
    }
    println("BRK\tname\tsecs\tjobs\ttasks\tshufR\tshufW")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      spark.sharedState.cacheManager.clearCache()
      try {
        q(spark, sfDir).count() // warmup
        spark.sharedState.cacheManager.clearCache()
        drain()
        val (j0, t0, r0, w0) = (jobs.get, tasks.get, shufR.get, shufW.get)
        val n0 = System.nanoTime()
        q(spark, sfDir).count()
        val dt = (System.nanoTime() - n0) / 1e9
        drain()
        println(f"BRK\t$name\t$dt%.3f\t${jobs.get - j0}\t${tasks.get - t0}\t${shufR.get - r0}\t${shufW.get - w0}")
      } catch {
        case e: Throwable =>
          println(s"BRK\t$name\tERR\t${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(100)}")
      }
    }
    spark.stop()
  }
}
