package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cand.Candidates

/** Golden k-enforcement + dedup tests transcribed from
  * `/root/reference/tests/test_candidate_generation.py:93-144` (two
  * datasets) and `:10-89` (three datasets).
  */
class CandidatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val twoParty = Seq(
    // (sim, dset0, dset1, rec0, rec1) — merged order of test:93-144
    (0.9432949307428928, 0, 1, 1L, 1L),
    (0.8568189930049877, 0, 1, 2L, 0L),
    (0.8419286042520673, 0, 1, 0L, 0L),
    (0.6343698774541688, 0, 1, 3L, 3L),
    (0.6, 0, 1, 0L, 2L))

  private def df(rows: Seq[(Double, Int, Int, Long, Long)]) =
    rows.toDF("sim", "dset0", "dset1", "rec0", "rec1")

  private def collectSorted(d: org.apache.spark.sql.DataFrame) =
    Candidates.sorted(d).collect().map(r =>
      (r.getDouble(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSeq

  test("two datasets, k=1 (golden :121-135)") {
    val got = collectSorted(Candidates.enforceK(df(twoParty), 1))
    assert(got == Seq(
      (0.9432949307428928, 0, 1, 1L, 1L),
      (0.8568189930049877, 0, 1, 2L, 0L),
      (0.6343698774541688, 0, 1, 3L, 3L)))
  }

  test("two datasets, k=2 and k=None keep everything (golden :137-144)") {
    assert(collectSorted(Candidates.enforceK(df(twoParty), 2)) == twoParty)
    assert(collectSorted(Candidates.finalize(df(twoParty), None)) == twoParty)
  }

  test("two datasets, k=0 is empty") {
    assert(collectSorted(Candidates.enforceK(df(twoParty), 0)).isEmpty)
  }

  private val threeParty = Seq(
    // merged 13-pair list (golden :74-89); the k=None/k=2 expected output
    (0.9962946784347061, 0, 2, 1L, 2L),
    (0.9432949307428928, 0, 1, 1L, 1L),
    (0.900267827898046, 0, 2, 0L, 1L),
    (0.88468228054972, 0, 2, 3L, 2L),
    (0.88468228054972, 1, 2, 3L, 2L),
    (0.8568189930049877, 0, 1, 2L, 0L),
    (0.8419286042520673, 0, 1, 0L, 0L),
    (0.699430643486643, 1, 2, 3L, 3L),
    (0.6956392099710476, 0, 2, 2L, 3L),
    (0.6343698774541688, 0, 1, 3L, 3L),
    (0.6121560533778709, 1, 2, 2L, 2L),
    (0.6076471833512952, 1, 2, 0L, 3L),
    (0.6, 0, 1, 0L, 2L))

  test("three datasets, k=1 (golden :61-72)") {
    val got = collectSorted(Candidates.enforceK(df(threeParty), 1))
    assert(got == Seq(
      (0.9962946784347061, 0, 2, 1L, 2L),
      (0.9432949307428928, 0, 1, 1L, 1L),
      (0.900267827898046, 0, 2, 0L, 1L),
      (0.88468228054972, 1, 2, 3L, 2L),
      (0.8568189930049877, 0, 1, 2L, 0L),
      (0.6956392099710476, 0, 2, 2L, 3L),
      (0.6343698774541688, 0, 1, 3L, 3L)))
  }

  test("three datasets, k=2 keeps all 13 (golden :74-89)") {
    assert(collectSorted(Candidates.enforceK(df(threeParty), 2)) == threeParty)
  }

  test("dedup collapses multi-block duplicates (ref :69-70)") {
    val withDups = df(twoParty ++ twoParty ++ twoParty.take(2))
    assert(collectSorted(Candidates.dedup(withDups)) == twoParty)
  }
}
