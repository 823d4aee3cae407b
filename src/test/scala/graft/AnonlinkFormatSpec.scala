package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.AnonlinkFormat
import graft.io.AnonlinkFormat.{Entry, WireSizes}

/** Byte-level parity with anonlink's candidate-pair wire format.
  *
  * The golden hex strings below were produced by RUNNING the reference
  * serializer (`/root/reference/anonlink/serialization.py`
  * `dump_candidate_pairs` / `merge_streams`) on the listed inputs —
  * behavioral transcription, the same method as
  * `/root/reference/tests/test_serialization.py:15-99`.
  */
class AnonlinkFormatSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dumped(entries: Seq[Entry], sizes: WireSizes): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    AnonlinkFormat.dump(entries.iterator, sizes, out)
    out.toByteArray
  }

  // reference: dump_candidate_pairs with array types ('d', 'L'(4), 'Q')
  private val golden64 = Seq(
    Entry(1.0, 0, 1, 3, 4),
    Entry(0.875, 0, 1, 1, 2),
    Entry(0.75, 1, 2, 0, -1L)) // rec1 = 2^64 - 1 (unsigned bit pattern)
  private val golden64Hex =
    "01080408000000000000f03f0000000001000000030000000000000004000000" +
      "00000000000000000000ec3f00000000010000000100000000000000" +
      "0200000000000000000000000000e83f010000000200000000000000" +
      "00000000ffffffffffffffff"

  test("dump: byte-identical to the reference (f64 sim, u32 dset, u64 rec)") {
    assert(hex(dumped(golden64, WireSizes(8, 4, 8))) === golden64Hex)
  }

  test("dump: byte-identical to the reference (f32 sim, u8 dset, u16 rec)") {
    val entries = Seq(Entry(0.5, 0, 1, 2, 3), Entry(0.25, 1, 0, 65535, 7))
    assert(hex(dumped(entries, WireSizes(4, 1, 2))) ===
      "010401020000003f0001020003000000803e0100ffff0700")
  }

  test("dump: empty pair set is just the header") {
    assert(hex(dumped(Seq.empty, WireSizes(8, 1, 1))) === "01080101")
  }

  test("load: round-trips dump across widths, incl. the full u64 range") {
    for (sizes <- Seq(WireSizes(8, 4, 8), WireSizes(4, 2, 4), WireSizes(8, 1, 1))) {
      val max = (w: Int) => if (w == 8) -1L else (1L << (8 * w)) - 1
      val entries = Seq(
        Entry(0.9375, 0, 1, 0, max(sizes.rec)),
        Entry(0.5, max(sizes.dset), 0, 42 % (max(sizes.rec) + 1).max(43), 7 % (max(sizes.rec) + 1).max(8)))
      val (loadedSizes, it) = AnonlinkFormat.load(
        new ByteArrayInputStream(dumped(entries, sizes)))
      assert(loadedSizes === sizes)
      assert(it.toSeq === entries)
    }
  }

  test("load: rejects bad version and truncated entries") {
    assertThrows[IllegalArgumentException] {
      AnonlinkFormat.load(new ByteArrayInputStream(Array[Byte](2, 8, 4, 8)))
    }
    val whole = dumped(golden64, WireSizes(8, 4, 8))
    val (_, it) = AnonlinkFormat.load(new ByteArrayInputStream(whole.dropRight(3)))
    assertThrows[java.io.EOFException] { it.toSeq }
  }

  test("load: decodes half-precision similarities (reader-only width)") {
    // header (1, 2, 1, 1) + one entry: sim = binary16 0.5 (0x3800)
    val bytes = Array[Byte](1, 2, 1, 1, 0x00, 0x38, 0, 1, 2, 3)
    val (_, it) = AnonlinkFormat.load(new ByteArrayInputStream(bytes))
    assert(it.toSeq === Seq(Entry(0.5, 0, 1, 2, 3)))
  }

  test("merge: byte-identical to reference merge_streams with width promotion") {
    // reference: merge of [f32/1/1: (0.875,0,1,1,2)] and
    // [f64/2/2: (0.875,0,1,0,9), (0.25,0,1,5,6)] — output promoted to
    // f64/2/2; the 0.875 tie breaks on rec0 (0 before 1)
    val a = dumped(Seq(Entry(0.875, 0, 1, 1, 2)), WireSizes(4, 1, 1))
    val b = dumped(Seq(Entry(0.875, 0, 1, 0, 9), Entry(0.25, 0, 1, 5, 6)),
      WireSizes(8, 2, 2))
    val out = new ByteArrayOutputStream()
    AnonlinkFormat.merge(
      Seq(new ByteArrayInputStream(a), new ByteArrayInputStream(b)), out)
    assert(hex(out.toByteArray) ===
      "01080202000000000000ec3f0000010000000900000000000000ec3f0000010001000200" +
        "000000000000d03f0000010005000600")
  }

  test("merge: width-2 sims stay width 2, byte-identical to the reference") {
    // reference merge_streams of two hand-crafted binary16-sim files
    // (header 01 02 01 01) keeps sim width 2 — golden produced by
    // running the reference on these exact bytes
    val fa = unhex("01020101003a00010102")
    val fb = unhex("01020101003a00010009003400010506")
    val out = new ByteArrayOutputStream()
    AnonlinkFormat.merge(
      Seq(new ByteArrayInputStream(fa), new ByteArrayInputStream(fb)), out)
    assert(hex(out.toByteArray) ===
      "01020101003a00010009003a00010102003400010506")
  }

  test("merge: unsigned ordering across the u64 boundary") {
    // 2^63 (Long.MinValue bit pattern) must sort AFTER 2^63 - 1
    val a = dumped(Seq(Entry(0.5, 0, 1, 0, Long.MinValue)), WireSizes(8, 1, 8))
    val b = dumped(Seq(Entry(0.5, 0, 1, 0, Long.MaxValue)), WireSizes(8, 1, 8))
    val out = new ByteArrayOutputStream()
    AnonlinkFormat.merge(
      Seq(new ByteArrayInputStream(a), new ByteArrayInputStream(b)), out)
    val (_, it) = AnonlinkFormat.load(new ByteArrayInputStream(out.toByteArray))
    assert(it.map(_.rec1).toSeq === Seq(Long.MaxValue, Long.MinValue))
  }
}

/** Spark glue round-trip: distributed shard dump → k-way merge →
  * executor-side load == the original pair set in global order. */
class AnonlinkFormatSparkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("dumpShards + mergePaths + loadPairs round-trips candidate pairs") {
    import spark.implicits._
    val pairs = Seq(
      (0.95, 0, 1, 11L, 22L), (0.95, 0, 1, 2L, 9L), (0.5, 0, 1, 1L, 2L),
      (0.875, 0, 1, 7L, 3L), (0.25, 0, 1, 100L, 200L))
      .toDF(graft.cand.Candidates.columns: _*)
      .repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("wire").toString
    AnonlinkFormat.dumpShards(pairs, s"$dir/shards")
    val shards = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.endsWith(".anonlink")).map(_.toString).toSeq
    assert(shards.nonEmpty && shards.size <= 3)
    AnonlinkFormat.mergePaths(spark, shards, s"$dir/merged.anonlink")

    // merged wire file holds ALL pairs in the reference's global order
    val (_, it) = AnonlinkFormat.load(new java.io.FileInputStream(s"$dir/merged.anonlink"))
    val loaded = it.toSeq
    assert(loaded.map(e => (e.sim, e.rec0, e.rec1)) ===
      Seq((0.95, 2L, 9L), (0.95, 11L, 22L), (0.875, 7L, 3L), (0.5, 1L, 2L), (0.25, 100L, 200L)))

    // and the DataFrame loader reproduces the original rows
    val back = AnonlinkFormat.loadPairs(spark, s"$dir/merged.anonlink")
    assert(back.collect().map(r => (r.getDouble(0), r.getLong(3), r.getLong(4))).toSet ===
      pairs.collect().map(r => (r.getDouble(0), r.getLong(3), r.getLong(4))).toSet)

    // single-file driver dump equals the shard+merge bytes (same order,
    // same widths) — Z1 and Z3 agree
    AnonlinkFormat.dumpPairs(pairs, s"$dir/single.anonlink")
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/merged.anonlink"))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/single.anonlink"))
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("dumpPairs sorts record ids UNSIGNED (64-bit hashes with the high bit set)") {
    import spark.implicits._
    // -1L is u64-max: unsigned order puts it LAST even though Spark's
    // signed asc would put it first
    val pairs = Seq((0.5, 0, 1, 7L, -1L), (0.5, 0, 1, 7L, 5L))
      .toDF(graft.cand.Candidates.columns: _*)
    val dir = java.nio.file.Files.createTempDirectory("wireu").toString
    AnonlinkFormat.dumpPairs(pairs, s"$dir/u.anonlink")
    val (_, it) = AnonlinkFormat.load(new java.io.FileInputStream(s"$dir/u.anonlink"))
    assert(it.map(_.rec1).toSeq === Seq(5L, -1L))
  }

  test("dumpShards of an empty pair set emits a header-only shard that round-trips") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Int, Int, Long, Long)]
      .toDF(graft.cand.Candidates.columns: _*)
    val dir = java.nio.file.Files.createTempDirectory("wiree").toString
    AnonlinkFormat.dumpShards(empty, s"$dir/shards")
    val shards = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.endsWith(".anonlink")).map(_.toString).toSeq
    assert(shards.size === 1)
    AnonlinkFormat.mergePaths(spark, shards, s"$dir/merged.anonlink")
    assert(AnonlinkFormat.loadPairs(spark, s"$dir/merged.anonlink").count() === 0L)
  }

  test("loadPairs fails loudly when dataset ids exceed the engine's Int schema") {
    val dir = java.nio.file.Files.createTempDirectory("wired").toString
    val out = new java.io.FileOutputStream(s"$dir/wide.anonlink")
    AnonlinkFormat.dump(Iterator(AnonlinkFormat.Entry(0.5, 1L << 33, 1, 0, 1)),
      AnonlinkFormat.WireSizes(8, 8, 8), out)
    out.close()
    val err = intercept[org.apache.spark.SparkException] {
      AnonlinkFormat.loadPairs(spark, s"$dir/wide.anonlink").collect()
    }
    assert(err.getMessage.contains("exceeds Int range")
      || err.getCause != null && err.getCause.getMessage.contains("exceeds Int range"))
  }
}
