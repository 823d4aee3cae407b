package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Stage-boundary snapshot checkpoints with a lineage manifest.
  *
  * The north rule asks for resumability from table-format snapshot
  * checkpoints with per-partition lineage and metrics. No Iceberg
  * runtime jar exists in this sandbox (verified: /opt/spark/jars has
  * Parquet/Avro only — SURVEY §7.1), so snapshots are Parquet dirs plus
  * a JSON manifest recording: snapshot id (content-derived), row count,
  * per-partition row counts (lineage), and schema. `resumeOrCompute`
  * gives each pipeline stage restart-into-the-middle semantics — the
  * Spark-batch analogue of the reference's dump/merge shard files
  * (`/root/reference/anonlink/serialization.py:182-338`).
  */
object Snapshots {

  private def manifestPath(dir: String) = Paths.get(dir, "_MANIFEST.json")

  def exists(dir: String): Boolean =
    Files.exists(manifestPath(dir)) && Files.exists(Paths.get(dir, "_SUCCESS"))

  /** Write `df` as a snapshot under `dir` and return a re-read of it
    * (so downstream stages read from stable storage, truncating
    * lineage like `Dataset.checkpoint`). */
  def write(df: DataFrame, dir: String): DataFrame = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // per-partition lineage: rows per output file partition
    val partCounts = back.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val rowCount = partCounts.map(_._2).sum
    val snapshotId = java.lang.Long.toHexString(
      graft.core.Hashing.str(dir + ":" + rowCount + ":" + df.schema.treeString, 0x5aa9L))
    val parts = partCounts.map { case (p, c) => s"""{"partition":$p,"rows":$c}""" }
      .mkString("[", ",", "]")
    val schemaJson = df.schema.fields.map(f =>
      s""""${f.name}":"${f.dataType.simpleString}"""").mkString("{", ",", "}")
    val manifest =
      s"""{"snapshot_id":"$snapshotId","row_count":$rowCount,"partitions":$parts,"schema":$schemaJson}"""
    Files.writeString(manifestPath(dir), manifest)
    back
  }

  /** Resume from an existing snapshot, or compute + snapshot it.
    * This is the checkpoint-resume entry point: a re-run of the
    * pipeline with the same checkpointDir skips completed stages. */
  def resumeOrCompute(spark: SparkSession, dir: Option[String], stage: String)(
      compute: => DataFrame): DataFrame =
    dir match {
      case None => compute
      case Some(d) =>
        val stageDir = s"$d/$stage"
        if (exists(stageDir)) spark.read.parquet(stageDir)
        else write(compute, stageDir)
    }
}
