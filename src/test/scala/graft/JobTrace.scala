package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB attribution probe for optimization work — runs one (or more)
  * named `SparkEntry.queries` entries and prints, for EVERY Spark job it
  * fires, the job's wall ms, task count and driver callsite — the data
  * that turns "this gate runs 40 jobs" into "these call sites fire the
  * jobs". Not part of any gate or suite.
  * `sbt "Test/runMain graft.JobTrace [sfDir] <query...>"`. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class J(id: Int, t0: Long, site: String, tasks: Int)
    val live = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(J, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val p = Option(e.properties)
        val long = p.flatMap(x => Option(x.getProperty("callSite.long")))
          .getOrElse("")
        // deepest few graft frames in the long callsite = the library
        // call chain that fired the job
        val frames = long.split('\n').filter(_.contains("graft."))
          .take(3).map(_.trim.replaceAll("^at ", "")
            .replaceAll("graft\\.(ops|streaming|table|store)\\.", ""))
        val desc = p.flatMap(x =>
          Option(x.getProperty("spark.job.description")))
        val site = desc.getOrElse(
          if (frames.nonEmpty) frames.mkString(" <- ")
          else p.flatMap(x => Option(x.getProperty("callSite.short")))
            .getOrElse("?"))
        val tasks = e.stageInfos.map(_.numTasks).sum
        live.put(e.jobId, J(e.jobId, System.nanoTime(), site, tasks)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(live.remove(e.jobId)).foreach { j =>
          done.add((j, System.nanoTime())); ()
        }
      }
    })
    SparkEntry.warm(spark, sfDir)
    args.drop(1).foreach { name =>
      // warm pass settles JIT/codegen; the traced pass is then honest
      SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(500); done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"=== $name wall ${wall}%.3f s, ${done.size} jobs")
      done.iterator().forEachRemaining { case (j, t1) =>
        println(f"JOB ${j.id}%4d ${(t1 - j.t0) / 1e6}%8.1f ms ${j.tasks}%4d tasks  ${j.site}")
      }
    }
    spark.stop()
  }
}
