package graft

import org.apache.spark.sql.SparkSession

object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Count root SQL executions (= actions) during `body`. AQE re-posts
    * nested executions with a rootExecutionId pointing at the parent;
    * only roots are counted. Shared by the action-count contract specs
    * (OpsSpec, ConnectedComponentsSpec, EvaluationSpec-style). */
  def countRootActions(body: => Unit): Int = {
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
              if s.rootExecutionId.forall(_ == s.executionId) =>
            execs.incrementAndGet(); ()
          case _ => ()
        }
    }
    org.apache.spark.graftlistener.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.graftlistener.drainListenerBus(spark.sparkContext)
      execs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
