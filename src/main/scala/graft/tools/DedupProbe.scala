package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.block.{Blocking, MinhashParams}
import graft.encode.ClkEncoder
import graft.gen.Corpus
import graft.solve.ConnectedComponents

/** Phase-level timing probe for the dedup_scale pipeline (guide §1:
  * decide WHERE the time goes before touching anything). Mirrors
  * Dedup.minhashLsh stage by stage (current structure) with an eager
  * materialization between phases so each phase's cost is isolated.
  * Measurement tool only; not part of any query path.
  *
  * GRAFT_PROBE_PLANS=<dir> additionally dumps formatted plans of the
  * interior stages (pair generation, verify join).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-probe")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 2, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val planDir = sys.env.get("GRAFT_PROBE_PLANS")
    def dumpPlan(name: String, df: DataFrame): Unit = planDir.foreach { pd =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(pd, s"$name.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_corpus").toString
    Corpus.labeledPages(spark, Corpus.Params(entities = 25000L,
        seed = 307L, minVariants = 2, maxVariants = 2, perturbation = 0.03))
      .select(graft.Linkage.recIdCol(col("url")).as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(tmp)

    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

      val docs = spark.read.parquet(tmp)

      val withRep = phase("withRep agg+join+cache") {
        val base = docs.select(col("doc_id").cast("long").as("id"),
            coalesce(col("text"), lit("")).as("text"))
          .withColumn("th", xxhash64(col("text")))
          .withColumn("tl", length(col("text")))
        val reps0 = base.groupBy(col("th"), col("tl")).agg(min("id").as("rep"))
        val w = base.join(reps0, Seq("th", "tl"))
          .select(col("id"), col("text"), col("rep")).cache()
        w.count(); w
      }

      val params = MinhashParams()
      val sigs = phase("sigs map+cache") {
        val s = withRep.where($"id" === $"rep").select($"id", $"text")
          .as[(Long, String)]
          .map { case (id, text) =>
            val grams = ClkEncoder.wordNgramHashes(text, 3, 0xded0bL).distinct
            (id, Blocking.minhashBandKeys(grams, params), grams)
          }
          .toDF("id", "bands", "grams").cache()
        s.count(); s
      }

      val banded = sigs.select(explode($"bands").as("bucket"), $"id")
      phase("VARIANT agg+listpairs+distinct") {
        val lists = banded.groupBy($"bucket").agg(collect_list($"id").as("ids"))
          .where(size($"ids") >= 2)
        val p = lists.select(explode(expr(
          "flatten(transform(sequence(0, size(ids)-2), i -> " +
            "transform(sequence(i+1, size(ids)-1), j -> " +
            "struct(least(ids[i], ids[j]) as id0, greatest(ids[i], ids[j]) as id1))))"))
          .as("p"))
          .select(col("p.id0"), col("p.id1"))
          .where(col("id0") =!= col("id1"))
          .distinct()
        println(s"[probe]   variant pairs = ${p.count()}")
      }
      val pairs = phase("bucketPairs+distinct+cache") {
        val p = graft.ops.Dedup.bucketPairs(banded, 4L * 1000 * 1000, Some(64))
          .distinct().cache()
        dumpPlan("dedup_pairs", p)
        println(s"[probe]   distinct pairs = ${p.count()}")
        p
      }

      val verified = phase("verify array_intersect") {
        val gramsById = sigs.select($"id", $"grams")
        val v = pairs
          .join(gramsById.select($"id".as("id0"), $"grams".as("g0")), "id0")
          .join(gramsById.select($"id".as("id1"), $"grams".as("g1")), "id1")
          .withColumn("inter", size(array_intersect($"g0", $"g1")).cast("long"))
          .withColumn("n0", size($"g0").cast("long"))
          .withColumn("n1", size($"g1").cast("long"))
          .withColumn("jaccard",
            when($"n0" + $"n1" - $"inter" === 0, lit(1.0))
              .otherwise($"inter" / ($"n0" + $"n1" - $"inter")))
          .where($"jaccard" >= 0.3)
          .select($"id0", $"id1")
          .cache()
        dumpPlan("dedup_verify", v)
        println(s"[probe]   verified pairs = ${v.count()}")
        v
      }

      val comps = phase("CC") {
        ConnectedComponents.run(verified.select($"id0".as("src"), $"id1".as("dst")))
      }

      phase("expandReps+materialize") {
        val out = withRep.select(col("id"), col("rep"))
          .join(comps.withColumnRenamed("node", "rep"), Seq("rep"), "left")
          .withColumn("clusterId", coalesce(col("component"), col("rep")))
          .withColumn("keeper", min(col("id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("clusterId"))))
          .select("id", "clusterId", "keeper")
          .cache()
        out.count()
        out.unpersist()
      }
      verified.unpersist(); pairs.unpersist(); sigs.unpersist(); withRep.unpersist()
    }
    spark.stop()
  }
}
