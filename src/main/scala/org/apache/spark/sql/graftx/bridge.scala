package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * supported way for an external library to surface native Catalyst
  * expressions as `Column`s on Spark 4 (the old `new Column(expr)`
  * constructor is gone). Lives under `org.apache.spark.sql` purely for
  * access; no Spark internals are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly free the materialized blocks behind a `localCheckpoint`ed
    * Dataset (its plan is a `LogicalRDD` over a persisted RDD). Without
    * this, superseded checkpoints in an iterative loop wait for the
    * ContextCleaner to notice the RDD is unreachable — which may be never
    * while the driver is loop-busy and not GC-ing. No-op for plans that
    * are not checkpoint-backed. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
