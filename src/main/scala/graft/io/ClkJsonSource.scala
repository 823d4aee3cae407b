package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{EncodedRecord, Linkage}
import graft.block.{BitBandParams, Blocking}
import graft.core.BitVector

/** Reader/writer for the clkhash/anonlink '''base64 CLK JSON'''
  * exchange format — `{"clks": ["<base64>", ...]}` — the shape the
  * reference ecosystem produces and its examples load as in-memory
  * sequences (`/root/reference/docs/examples/similarity-plots/
  * clks-1.json`, loaded by the similarity-plots notebook; the library
  * itself consumes the decoded sequences, `typechecking.py:9-11`).
  * Record identity in that world is the LIST POSITION — the reader
  * preserves it as `recId`, so results are index-compatible with the
  * reference run on the same file.
  *
  * Two layouts:
  *  - [[readJson]]/[[writeJson]]: the faithful single-object format.
  *    One JSON document is inherently one parse unit (Spark's
  *    `multiLine` JSON reads it in a single task) — correct for the
  *    interop sizes the format is used for (CLK handoff files), not a
  *    100-TB layout; the writer guards with an explicit record cap.
  *  - [[readJsonl]]/[[writeJsonl]]: the same bytes as JSON Lines with
  *    an explicit `recId` per row — splittable, order-independent,
  *    the at-scale layout (line position is NOT stable across Spark
  *    partitions, hence the explicit id).
  *
  * Both readers return `(recId long, clk binary, pop int)` — the
  * engine's encode-stage shape minus blocking keys; [[toEncoded]]
  * attaches bit-sampling LSH keys (B1 — the only blocking derivable
  * from CLKs alone; minhash banding needs the gram sets, which a CLK
  * file no longer has) so a CLK file drops straight into
  * `Linkage.candidatePairs`-level scoring.
  */
object ClkJsonSource {

  /** Decode base64 → bytes + popcount. Pure Column ops: `unbase64`
    * and the codegen `popcount_bin` expression — no UDF, fully
    * whole-stage-codegen once the rows exist. */
  private def decoded(b64: DataFrame): DataFrame =
    b64.select(col("recId").cast("long").as("recId"),
      unbase64(col("b64")).as("clk"))
      .withColumn("pop", graft.functions.BitFunctions.popcount_bin(col("clk")))

  /** Read the faithful `{"clks": [...]}` single-object format.
    * recId = array position (reference parity). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    decoded(spark.read.option("multiLine", true).json(path)
      .select(posexplode(col("clks")).as(Seq("recId", "b64"))))

  /** Read JSON Lines rows `{"recId": n, "clk": "<base64>"}`. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    decoded(spark.read.json(path).select(col("recId"), col("clk").as("b64")))

  /** Write `(recId, clk binary)` rows as JSON Lines (at-scale layout,
    * one file per partition). Encodes with the plain JDK encoder in a
    * typed map: Spark's `base64()` emits 76-char MIME chunking with
    * `\r\n` (observed on this Spark 4 build), which survives Spark's
    * lenient `unbase64` but breaks strict decoders downstream. */
  def writeJsonl(clks: DataFrame, path: String): Unit = {
    val spark = clks.sparkSession
    import spark.implicits._
    clks.select(col("recId").cast("long"), col("clk"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) => (id, java.util.Base64.getEncoder.encodeToString(b)) }
      .toDF("recId", "clk")
      .write.mode("overwrite").json(path)
  }

  /** Write the faithful single-object format, ordered by recId so the
    * array position round-trips as the identity. Driver-side by
    * nature (one JSON document); `maxRecords` guards against feeding
    * it a corpus — use [[writeJsonl]] beyond handoff sizes. */
  def writeJson(clks: DataFrame, path: String, maxRecords: Long = 1000000L): Unit = {
    val n = clks.count()
    require(n <= maxRecords,
      s"writeJson is the single-document interop format ($n rows > cap $maxRecords); " +
        "use writeJsonl for large CLK sets")
    // encode on the driver with the plain (non-MIME) JDK encoder —
    // Spark's base64() can emit 76-char MIME chunking (config-
    // dependent), and a raw newline inside a JSON string literal
    // corrupts the document
    val b64s = clks.select(col("recId").cast("long"), col("clk"))
      .collect().sortBy(_.getLong(0))
      .map(r => java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1)))
    val body = b64s.mkString("{\"clks\": [\"", "\", \"", "\"]}")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(clks.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Attach bit-sampling LSH band keys (B1) and lift to the pipeline's
    * [[EncodedRecord]] shape. `url` is synthesized (`clk:<recId>`) —
    * identity is already fixed by recId, and nothing downstream of
    * encode derives from url. Empty CLKs get no keys (they can never
    * match at threshold > 0 but would otherwise all collide into one
    * hot block — same rule as `Linkage.encode`). */
  def toEncoded(clks: DataFrame, dsetId: Int,
      p: BitBandParams = BitBandParams()): Dataset[EncodedRecord] = {
    val spark = clks.sparkSession
    import spark.implicits._
    clks.select(col("recId").cast("long"), col("clk"), col("pop").cast("int"))
      .as[(Long, Array[Byte], Int)]
      .map { case (recId, clk, pop) =>
        val words = BitVector.fromBytes(clk)
        val keys = if (pop == 0) Array.empty[Long] else Blocking.bitBandKeys(words, p)
        EncodedRecord(dsetId, recId, s"clk:$recId", clk, pop, keys)
      }
  }

  /** Convenience: score two CLK files against each other with the
    * standard pipeline tail (explode → salt → Dice kernel → dedup →
    * top-k) — the Spark form of the reference's canonical
    * "load two CLK JSONs, find candidate pairs" flow. */
  def candidatePairs(spark: SparkSession, path0: String, path1: String,
      params: graft.LinkageParams): DataFrame = {
    val enc = toEncoded(readJson(spark, path0), 0,
      bitParamsOf(params)).union(toEncoded(readJson(spark, path1), 1, bitParamsOf(params)))
    val blocked = Linkage.blockAndSalt(enc, params)
    graft.cand.Candidates.finalize(Linkage.scorePairs(blocked, params), params.k)
  }

  private def bitParamsOf(params: graft.LinkageParams): BitBandParams =
    params.blocking match {
      case graft.BitBandBlocking(p) => p
      case _ => BitBandParams()
    }
}
