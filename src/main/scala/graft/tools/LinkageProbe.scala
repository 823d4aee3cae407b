package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Linkage, LinkageParams, MinhashBlocking}
import graft.gen.Corpus

/** Phase-level timing probe for the linkage candidate pipeline
  * (measurement only — guide §1). */
object LinkageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-linkage-probe")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 2, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val params = LinkageParams(blocking = MinhashBlocking(), threshold = 0.75, k = Some(5))
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val pages = Corpus.labeledPages(spark, Corpus.Params(entities = 500L, seed = 11L,
        minVariants = 2, maxVariants = 2))
      phase("corpus gen count") { pages.count() }
      val enc = phase("encode count") {
        val e = Linkage.encode(pages, params, col("dsetId"))
        e.write.format("noop").mode("overwrite").save()
        e
      }
      val blocked = phase("blockAndSalt (census collect)") {
        Linkage.blockAndSalt(enc, params)
      }
      phase("blocked noop") {
        blocked.write.format("noop").mode("overwrite").save()
      }
      val scored = phase("scorePairs noop") {
        val s = Linkage.scorePairs(blocked, params)
        s.write.format("noop").mode("overwrite").save()
        s
      }
      phase("finalize count") {
        println("[probe]   pairs = " + graft.cand.Candidates.finalize(scored, params.k).count())
      }
      phase("full candidatePairs count") {
        println("[probe]   pairs = " + Linkage.candidatePairs(pages, params, col("dsetId")).count())
      }
    }
    spark.stop()
  }
}
