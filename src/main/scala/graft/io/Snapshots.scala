package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

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
  *
  * All filesystem access (manifest included) goes through the Hadoop
  * `FileSystem` resolved from the directory's scheme, so hdfs:// and
  * s3a:// checkpoint dirs work the same as local paths — a
  * driver-local `java.nio.Files` write would silently break them.
  */
object Snapshots {

  private def fsFor(dir: String, spark: SparkSession): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Stage directory name: the stage name plus a content key hash, so a
    * re-run with different parameters gets a different snapshot dir and
    * cannot silently resume from a stale one. */
  def stageDir(base: String, stage: String, contentKey: String): String =
    if (contentKey.isEmpty) s"$base/$stage"
    else s"$base/$stage-" +
      java.lang.Long.toHexString(graft.core.Hashing.str(contentKey, 0x57a6eL))

  def exists(dir: String, spark: SparkSession = SparkSession.active): Boolean = {
    val (fs, p) = fsFor(dir, spark)
    fs.exists(new Path(p, "_MANIFEST.json")) && fs.exists(new Path(p, "_SUCCESS"))
  }

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
    val (fs, p) = fsFor(dir, spark)
    val out = fs.create(new Path(p, "_MANIFEST.json"), true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    back
  }

  /** Round-boundary lineage truncation for ITERATIVE solvers (CC,
    * distributed greedy). `localCheckpoint(eager)` truncates lineage
    * into executor memory — fine at local[N], but on a real cluster one
    * lost executor kills the whole iteration chain, exactly what a
    * 100-TB run cannot afford. With a directory, each round snapshots
    * to stable storage (any Hadoop FS) and recomputation replays from
    * Parquet, not from a dead executor's block store.
    *
    * Round files are kept for the life of the run (the returned
    * DataFrame of the final round READS its snapshot); callers delete
    * the whole dir once results are materialized downstream. A unique
    * per-run subdir prevents two concurrent solvers from colliding. */
  final class RoundCheckpointer(dir: Option[String]) {
    private val runDir = dir.map(d => s"$d/rounds-${java.util.UUID.randomUUID().toString.take(8)}")
    private var n = 0
    def apply(df: DataFrame): DataFrame = runDir match {
      case None => df.localCheckpoint(true)
      case Some(d) =>
        n += 1
        val p = s"$d/r$n"
        df.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
    }

    /** Solver epilogue: snapshot the RESULT as the final round, then
      * delete every earlier round dir — the returned DataFrame's
      * lineage bottoms out in the one kept snapshot, so a long-lived
      * checkpoint dir holds exactly one snapshot per solver run
      * instead of growing by O(rounds). No-op passthrough without a
      * dir (the localCheckpoint path has nothing on disk to prune). */
    def finish(df: DataFrame): DataFrame = runDir match {
      case None => df
      case Some(d) =>
        val out = apply(df)
        val last = n
        val fs = new Path(d).getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
        (1 until last).foreach { i =>
          scala.util.Try(fs.delete(new Path(s"$d/r$i"), true))
        }
        out
    }
  }

  /** Resume from an existing snapshot, or compute + snapshot it.
    * This is the checkpoint-resume entry point: a re-run of the
    * pipeline with the same checkpointDir AND the same `contentKey`
    * (hash of the stage's parameters) skips completed stages; changed
    * parameters land in a fresh stage dir instead of silently reusing
    * stale results. */
  def resumeOrCompute(spark: SparkSession, dir: Option[String], stage: String,
      contentKey: String = "")(compute: => DataFrame): DataFrame =
    dir match {
      case None => compute
      case Some(d) =>
        val sd = stageDir(d, stage, contentKey)
        if (exists(sd, spark)) spark.read.parquet(sd)
        else write(compute, sd)
    }
}
