package graft.operators

import org.apache.spark.sql.SparkSession

/** Job-description labeling (guide §1.5): wrap a fold phase so every
  * job it launches carries a readable description in the Spark UI and
  * in [[graft.tools.JobProfile]]'s per-phase aggregation. The property
  * is thread-local on the SparkContext and restored on exit, so nested
  * phases compose and nothing leaks into later queries.
  */
private[graft] object Prof {
  def labeled[T](s: SparkSession, desc: String)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

}
