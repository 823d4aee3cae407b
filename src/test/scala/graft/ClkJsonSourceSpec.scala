package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.BitVector
import graft.gen.RandomClks
import graft.io.ClkJsonSource

/** The clkhash/anonlink base64 CLK JSON interop surface: faithful
  * single-object format (recId = array position, like the reference's
  * list indexing), the splittable JSONL layout, and the end-to-end
  * "two CLK files → candidate pairs" flow. */
class ClkJsonSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clkBytes(seed: Long, n: Int): Seq[Array[Byte]] =
    (0 until n).map(i => BitVector.toBytes(RandomClks.clkFor(i.toLong, 16, seed)))

  test("readJson: hand-built {\"clks\": [...]} decodes bytes, popcounts, positional recIds") {
    val clks = clkBytes(0xabcL, 7)
    val b64 = clks.map(java.util.Base64.getEncoder.encodeToString)
    val path = java.nio.file.Files.createTempDirectory("clkjson").resolve("clks.json")
    java.nio.file.Files.writeString(path,
      b64.mkString("{\"clks\": [\"", "\", \"", "\"]}"))
    val got = ClkJsonSource.readJson(spark, path.toString)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getInt(2)))
      .sortBy(_._1)
    assert(got.length == 7)
    got.foreach { case (recId, bytes, pop) =>
      assert(bytes.sameElements(clks(recId.toInt)), s"bytes mismatch at $recId")
      assert(pop == BitVector.popcount(BitVector.fromBytes(bytes)))
    }
  }

  test("writeJson -> readJson and writeJsonl -> readJsonl round-trip bit-exactly") {
    val clks = clkBytes(0x77L, 23)
    val df = clks.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("recId", "clk")
    val dir = java.nio.file.Files.createTempDirectory("clkjson_rt").toString
    ClkJsonSource.writeJson(df, s"$dir/single.json")
    val single = ClkJsonSource.readJson(spark, s"$dir/single.json")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).sortBy(_._1)
    assert(single.length == 23)
    single.foreach { case (id, b) => assert(b.sameElements(clks(id.toInt))) }
    ClkJsonSource.writeJsonl(df, s"$dir/lines")
    // strict-decoder safety: no MIME chunking artifacts in the files
    // (Spark's base64() would embed escaped \r\n every 76 chars)
    new java.io.File(s"$dir/lines").listFiles()
      .filter(_.getName.startsWith("part-")).foreach { f =>
        val c = java.nio.file.Files.readString(f.toPath)
        assert(!c.contains("\\r"), s"chunked base64 leaked into ${f.getName}")
      }
    val lines = ClkJsonSource.readJsonl(spark, s"$dir/lines")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).sortBy(_._1)
    assert(lines.length == 23)
    lines.foreach { case (id, b) => assert(b.sameElements(clks(id.toInt))) }
    // the single-object writer refuses corpus-scale inputs
    intercept[IllegalArgumentException] {
      ClkJsonSource.writeJson(df, s"$dir/too_big.json", maxRecords = 10)
    }
    ()
  }

  test("writeJson guards: empty set emits [], non-dense recIds are rejected") {
    val dir = java.nio.file.Files.createTempDirectory("clkjson_guard").toString
    // empty → a valid empty array, not a phantom "" record
    ClkJsonSource.writeJson(Seq.empty[(Long, Array[Byte])].toDF("recId", "clk"),
      s"$dir/empty.json")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/empty.json")) == "{\"clks\": []}")
    assert(ClkJsonSource.readJson(spark, s"$dir/empty.json").count() == 0)
    // position IS identity in this format: hash-style recIds must fail
    // loudly instead of being silently renumbered on read-back
    val hashed = Seq((42L, Array[Byte](1, 2)), (7L, Array[Byte](3, 4)))
      .toDF("recId", "clk")
    intercept[IllegalArgumentException] {
      ClkJsonSource.writeJson(hashed, s"$dir/bad.json")
    }
    ()
  }

  test("toEncoded: short CLKs fail loudly under default bit-banding; NoBlocking and " +
    "custom bits work; MinhashBlocking is rejected") {
    val short = Seq((0L, Array.fill[Byte](16)(1), 16)) // 128-bit CLK
      .toDF("recId", "clk", "pop")
    // default BitBandParams samples up to bit 1023 → must be an
    // actionable error, not an executor ArrayIndexOutOfBounds
    val e = intercept[org.apache.spark.SparkException] {
      ClkJsonSource.toEncoded(short, 0).collect()
    }
    assert(e.getMessage.contains("BitBandParams") ||
      Option(e.getCause).exists(_.getMessage.contains("BitBandParams")))
    // right-sized params and NoBlocking both succeed
    val sized = ClkJsonSource.toEncoded(short, 0,
      BitBandBlocking(graft.block.BitBandParams(bits = 128))).collect()
    assert(sized.length == 1 && sized.head.bandKeys.nonEmpty)
    val none = ClkJsonSource.toEncoded(short, 0, NoBlocking).collect()
    assert(none.head.bandKeys.sameElements(Array(0L)))
    // minhash banding cannot be derived from a CLK file — reject, don't
    // silently substitute bit-banding
    intercept[IllegalArgumentException] {
      ClkJsonSource.toEncoded(short, 0, MinhashBlocking())
    }
    ()
  }

  test("two CLK JSON files through the pipeline: identical CLKs match at high threshold") {
    // dataset 0 and dataset 1 share CLKs 0..9 exactly; 10..19 differ
    val shared = clkBytes(0x5eedL, 10)
    val only0 = clkBytes(0xaaaL, 20).drop(10)
    val only1 = clkBytes(0xbbbL, 20).drop(10)
    val dir = java.nio.file.Files.createTempDirectory("clkjson_e2e").toString
    ClkJsonSource.writeJson(
      (shared ++ only0).zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("recId", "clk"),
      s"$dir/a.json")
    ClkJsonSource.writeJson(
      (shared ++ only1).zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("recId", "clk"),
      s"$dir/b.json")
    val params = LinkageParams(blocking = BitBandBlocking(), threshold = 0.99, k = Some(3))
    val pairs = ClkJsonSource.candidatePairs(spark, s"$dir/a.json", s"$dir/b.json", params)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getDouble(0)))
    // every shared CLK matches itself (Dice 1.0) at its own index
    (0 until 10).foreach { i =>
      assert(pairs.exists { case (r0, r1, sim) => r0 == i && r1 == i && sim == 1.0 },
        s"self-match for shared CLK $i missing")
    }
    // random non-identical CLKs never reach 0.99
    pairs.foreach { case (r0, r1, sim) =>
      assert(r0 == r1 && r0 < 10 && sim == 1.0, s"unexpected pair ($r0,$r1,$sim)")
    }
  }

  test("batch readers are STRICT: a corrupt JSONL line raises instead of silently dropping") {
    val clks = clkBytes(0x9badL, 3)
    val dir = java.nio.file.Files.createTempDirectory("clkjson_strict")
    val lines = clks.zipWithIndex.map { case (b, i) =>
      s"""{"recId": $i, "clk": "${java.util.Base64.getEncoder.encodeToString(b)}"}"""
    } :+ """{"recId": 3, "clk": """ // truncated mid-write: PERMISSIVE nulls the fields
    java.nio.file.Files.writeString(dir.resolve("part.jsonl"), lines.mkString("\n"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception] {
      ClkJsonSource.readJsonl(spark, dir.resolve("part.jsonl").toString).collect()
    }
    assert(messages(e).exists(_.contains("truncated or corrupt")),
      s"expected the strict reader's error, got: $e")
    // the guard must survive COLUMN PRUNING: count() keeps no columns,
    // so a guard hidden in a projected column would be optimized away
    // and the corrupt row would silently vanish from the count
    val e2 = intercept[Exception] {
      ClkJsonSource.readJsonl(spark, dir.resolve("part.jsonl").toString).count()
    }
    assert(messages(e2).exists(_.contains("truncated or corrupt")),
      s"strict guard was pruned away under count(): $e2")
    // the streaming reader keeps drop-and-continue semantics on the
    // same bytes (pinned separately in StreamingSpec's corrupt-line
    // resilience test)
  }

  test("multiparty: 3 CLK files produce all dataset-pair combinations, " +
      "identical to the batch pipeline on the same CLKs") {
    // three files sharing CLKs 0..4 pairwise (identical bytes), plus
    // per-file unique tails
    val shared = clkBytes(0x3abcL, 5)
    def tail(seed: Long) = clkBytes(seed, 12).drop(5)
    val dir = java.nio.file.Files.createTempDirectory("clkjson_multi").toString
    val fileClks = Seq(0x111L, 0x222L, 0x333L).map(s => shared ++ tail(s))
    val paths = fileClks.zipWithIndex.map { case (cs, i) =>
      val p = s"$dir/f$i.json"
      ClkJsonSource.writeJson(
        cs.zipWithIndex.map { case (b, j) => (j.toLong, b) }.toDF("recId", "clk"), p)
      p
    }
    val params = LinkageParams(blocking = BitBandBlocking(), threshold = 0.99, k = Some(3))
    val got = ClkJsonSource.candidatePairs(spark, paths, params)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getDouble(0)))
    // all combinations(3, 2) dataset pairs appear (each shared CLK
    // self-matches across every file pair)
    val dsetPairs = got.map(t => (t._1, t._2)).toSet
    assert(dsetPairs == Set((0, 1), (0, 2), (1, 2)),
      s"expected all 3 dataset-pair combinations, got $dsetPairs")
    for (d0 <- 0 to 1; d1 <- (d0 + 1) to 2; i <- 0 until 5)
      assert(got.exists(t => t._1 == d0 && t._2 == d1 && t._3 == i && t._4 == i && t._5 == 1.0),
        s"self-match for shared CLK $i missing on dataset pair ($d0,$d1)")
    // equivalence: the in-memory batch pipeline over the SAME encoded
    // records (union of the three files' CLKs with dataset indices)
    // must yield the exact same candidate stream
    val enc = fileClks.zipWithIndex.map { case (cs, i) =>
      ClkJsonSource.toEncoded(
        ClkJsonSource.readJson(spark, paths(i)), i, params.blocking)
    }.reduce(_ union _)
    val batch = Linkage.candidatePairsFromEncoded(enc, params)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getDouble(0)))
    assert(got.sorted.toSeq == batch.sorted.toSeq,
      "multiparty file flow diverged from the batch pipeline")
  }

  test("readJson: a corrupt file among good ones raises (file-level guard) — " +
      "posexplode of a PERMISSIVE-nulled clks array would silently emit zero rows") {
    val dir = java.nio.file.Files.createTempDirectory("clkjson_multifile")
    val good = clkBytes(0x600dL, 2).map(b =>
      "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\"")
    java.nio.file.Files.writeString(dir.resolve("good.json"),
      s"""{"clks": [${good.mkString(", ")}]}""")
    java.nio.file.Files.writeString(dir.resolve("bad.json"), """{"clks": [""")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      ClkJsonSource.readJson(spark, dir.toString).count()
    }
    assert(msgs(e).exists(_.contains("truncated or corrupt")),
      s"corrupt whole file must raise, not vanish: $e")
    // the good file alone still reads
    assert(ClkJsonSource.readJson(spark, dir.resolve("good.json").toString).count() == 2)
  }
}
