package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{BitBandBlocking, EncodedRecord, Linkage}
import graft.block.Blocking
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
    * whole-stage-codegen once the rows exist.
    *
    * Malformed rows (Spark's PERMISSIVE JSON parsing nulls the fields
    * of a truncated/partially-written line) are handled per surface,
    * matching how each is consumed:
    *  - BATCH readers ([[readJson]]/[[readJsonl]]) FAIL LOUDLY
    *    (`strict = true`): the reference ecosystem's loaders raise on
    *    a corrupt handoff file, and a one-shot job silently losing
    *    records of a truncated interop file is data loss with no
    *    signal.
    *  - the STREAMING reader ([[readJsonlStream]]) DROPS and
    *    continues (`strict = false`): one corrupt line must not kill
    *    a long-running query and stop all subsequent files from
    *    matching; producers needing strictness there validate files
    *    before dropping them into the watched dir. */
  private def decoded(b64: DataFrame, strict: Boolean): DataFrame = {
    val malformed = col("recId").isNull || col("b64").isNull
    // the strict check is a FILTER predicate (raise_error branch in the
    // condition), NOT a guarded projected column: a projected guard
    // would sit in a prunable Project, and a consumer that never reads
    // that column (count(), select("clk")) would silently skip the
    // check — Catalyst's ColumnPruning removes unused deterministic
    // columns, and RaiseError is deterministic. A Filter's condition
    // is evaluated for every row regardless of which columns the
    // consumer keeps.
    val base =
      if (strict)
        b64.where(when(malformed, raise_error(lit(
          "malformed CLK JSON record (null recId/clk): truncated or corrupt " +
            "interop file — batch readers are strict; pre-validate the file, " +
            "or use the streaming reader for drop-and-continue semantics")))
          .otherwise(lit(true)))
      else b64.where(!malformed)
    base.select(col("recId").cast("long").as("recId"),
      unbase64(col("b64")).as("clk"))
      .withColumn("pop", graft.functions.BitFunctions.popcount_bin(col("clk")))
  }

  /** Read the faithful `{"clks": [...]}` single-object format.
    * recId = array position (reference parity). Strict: corrupt
    * records raise (see [[decoded]]). */
  def readJson(spark: SparkSession, path: String): DataFrame = {
    val parsed = spark.read.option("multiLine", true).json(path)
    // the strict per-record guard in decoded() only sees POST-explode
    // rows — a corrupt/truncated file PERMISSIVE-parses to one row with
    // clks = null, and posexplode emits ZERO rows for a null array, so
    // that file's records would vanish silently in a multi-file read.
    // The guard lives INSIDE the generator input (not a separate
    // Filter): InferFiltersFromGenerate adds `isnotnull(clks)` below
    // the Generate, and conjunct reordering can evaluate that inferred
    // null-drop before a standalone guard filter ever runs — embedded
    // in the exploded expression it cannot be separated from the array
    // access. (A path where EVERY file is corrupt has no `clks` column
    // at all and fails loudly at analysis.)
    val guardedClks = when(col("clks").isNull, raise_error(lit(
      "malformed CLK JSON file (no clks array): truncated or corrupt " +
        "interop file — batch readers are strict")).cast("array<string>"))
      .otherwise(col("clks"))
    decoded(parsed.select(posexplode(guardedClks).as(Seq("recId", "b64"))),
      strict = true)
  }

  /** Read JSON Lines rows `{"recId": n, "clk": "<base64>"}`. Strict:
    * corrupt lines raise (see [[decoded]]). */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    decoded(spark.read.json(path).select(col("recId"), col("clk").as("b64")),
      strict = true)

  /** STREAMING JSONL reader: the same schema + decode as [[readJsonl]]
    * over a Structured Streaming file source — CLK handoff files
    * dropped into `dir` are decoded on arrival (feed
    * [[graft.streaming.StreamOps.matchClkStreamAgainstReference]] to
    * match them incrementally). Streams need the schema declared up
    * front; it is fixed by the format. */
  def readJsonlStream(spark: SparkSession, dir: String): DataFrame =
    decoded(spark.readStream
      .schema("recId LONG, clk STRING")
      .json(dir)
      .select(col("recId"), col("clk").as("b64")), strict = false)

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

  /** Write the faithful single-object format. The array POSITION is
    * the record identity in this format, so the input must carry
    * dense recIds 0..n-1 (anything else — e.g. the engine's 64-bit
    * url-hash recIds — would be silently renumbered on read-back;
    * renumber explicitly or use [[writeJsonl]], which keeps explicit
    * ids). Driver-side by nature (one JSON document); `maxRecords`
    * guards against feeding it a corpus. */
  def writeJson(clks: DataFrame, path: String, maxRecords: Long = 1000000L): Unit = {
    require(maxRecords > 0 && maxRecords < Int.MaxValue,
      s"maxRecords must be in (0, Int.MaxValue), got $maxRecords")
    // single job: over-cap detection via limit(cap+1), not a separate
    // count() that would execute the upstream plan twice
    val rows = clks.select(col("recId").cast("long"), col("clk"))
      .limit(maxRecords.toInt + 1).collect()
    require(rows.length <= maxRecords,
      s"writeJson is the single-document interop format (> $maxRecords rows); " +
        "use writeJsonl for large CLK sets")
    val sorted = rows.sortBy(_.getLong(0))
    sorted.iterator.zipWithIndex.foreach { case (r, i) =>
      require(r.getLong(0) == i,
        s"writeJson requires dense recIds 0..n-1 (position IS the identity in " +
          s"this format); found recId ${r.getLong(0)} at position $i — " +
          "renumber first or use writeJsonl (explicit ids)")
    }
    // encode on the driver with the plain (non-MIME) JDK encoder —
    // Spark's base64() emits 76-char MIME chunking with \r\n, and a
    // raw newline inside a JSON string literal corrupts the document
    val b64s = sorted.map(r =>
      java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1)))
    val body =
      if (b64s.isEmpty) "{\"clks\": []}" // mkString would emit [""] — a phantom record
      else b64s.mkString("{\"clks\": [\"", "\", \"", "\"]}")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(clks.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Attach blocking keys and lift to the pipeline's [[EncodedRecord]]
    * shape. `url` is synthesized (`clk:<recId>`) — identity is already
    * fixed by recId, and nothing downstream of encode derives from
    * url.
    *
    * Supported strategies: [[graft.BitBandBlocking]] (B1 — sampling
    * the filter's own bits, the natural blocking for CLK-only input;
    * empty CLKs get no keys, same rule as `Linkage.encode`) and
    * [[graft.NoBlocking]] (the reference's compare-everything default
    * — right for small handoff files). [[graft.MinhashBlocking]] is
    * REJECTED loudly: minhash banding needs the gram sets, which a
    * CLK file no longer carries — silently substituting bit-banding
    * would drop pairs the caller asked to keep. */
  def toEncoded(clks: DataFrame, dsetId: Int,
      blocking: graft.BlockingStrategy = BitBandBlocking()): Dataset[EncodedRecord] = {
    val spark = clks.sparkSession
    import spark.implicits._
    val keyFn: (Array[Long], Int) => Array[Long] = blocking match {
      case BitBandBlocking(p) =>
        // undersized CLKs (clkhash supports sub-1024-bit filters) fail
        // with Blocking.bitBandKeys' own actionable mismatch error —
        // the guard lives at the shared lowest layer, covering the
        // native encode path too
        (words, pop) =>
          if (pop == 0) Array.empty[Long] else Blocking.bitBandKeys(words, p)
      case graft.NoBlocking => (_, _) => Array(0L)
      case graft.MinhashBlocking(_) => throw new IllegalArgumentException(
        "minhash banding needs the gram sets, which a CLK file no longer carries — " +
          "use BitBandBlocking (bit-sampling LSH over the filter) or NoBlocking")
    }
    clks.select(col("recId").cast("long"), col("clk"), col("pop").cast("int"))
      .as[(Long, Array[Byte], Int)]
      .map { case (recId, clk, pop) =>
        EncodedRecord(dsetId, recId, s"clk:$recId", clk, pop,
          keyFn(BitVector.fromBytes(clk), pop))
      }
  }

  /** Convenience: score two CLK files against each other with the
    * standard pipeline tail ([[Linkage.candidatePairsFromEncoded]]:
    * explode → salt → Dice kernel → per-block top-k restoration →
    * dedup → global `_enforce_k`) — the Spark form of the reference's
    * canonical "load two CLK JSONs, find candidate pairs" flow.
    * Honors `params.blocking` (BitBand or NoBlocking; see
    * [[toEncoded]]). */
  def candidatePairs(spark: SparkSession, path0: String, path1: String,
      params: graft.LinkageParams): DataFrame =
    candidatePairs(spark, Seq(path0, path1), params)

  /** Multiparty form: N CLK files, dataset index = list position.
    * The blocking and scoring layers already handle N datasets (every
    * ordered dataset pair i0 < i1 is scored, the reference's
    * `itertools.combinations` semantics — `candidate_generation.py:
    * 28-40`), so N files flow through the exact same pipeline tail as
    * two; output `dset0`/`dset1` columns carry the file indices. */
  def candidatePairs(spark: SparkSession, paths: Seq[String],
      params: graft.LinkageParams): DataFrame = {
    require(paths.length >= 2,
      s"candidatePairs needs at least two CLK files, got ${paths.length}")
    val enc = paths.zipWithIndex
      .map { case (p, i) => toEncoded(readJson(spark, p), i, params.blocking) }
      .reduce(_ union _)
    Linkage.candidatePairsFromEncoded(enc, params)
  }
}
