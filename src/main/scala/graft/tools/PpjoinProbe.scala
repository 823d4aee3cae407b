package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement probe for the PPJoin prefix filter (round-5 verdict
  * item 7): ngramJaccardPairs with prefixFilter on/off at the high
  * thresholds where prefix pruning is supposed to bite (0.7 / 0.8),
  * plus the pipeline's own 0.3, on the sf documents corpus. */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ppjoin-probe")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 2, 8))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (rep <- 1 to 2; t <- Seq(0.3, 0.7, 0.8); pf <- Seq(false, true)) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = t, prefixFilter = pf)
      val n = out.count()
      out.unpersist()
      println(f"[ppjoin] rep=$rep t=$t%.1f prefixFilter=$pf%-5s pairs=$n%-6d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
