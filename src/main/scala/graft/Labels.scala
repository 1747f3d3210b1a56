package graft

import org.apache.spark.sql.SparkSession

/** Job-description labels for multi-job operators (guide §1.5): a
  * streaming ingest batch fires a dozen jobs from one foreachBatch
  * lambda, and the Spark UI (and any listener-based profiler) can only
  * attribute them to the lambda's call site — a label per phase makes
  * the breakdown readable. Thread-local, save/restore, zero cost when
  * nobody looks. */
private[graft] object Labels {
  def labeled[T](spark: SparkSession, desc: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try f finally sc.setJobDescription(prev)
  }
}
