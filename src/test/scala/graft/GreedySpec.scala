package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.solve.{Candidate, Greedy, Rec}

/** Golden + property tests transcribed from
  * `/root/reference/tests/test_solving.py`.
  */
class GreedySpec extends AnyFunSuite {

  private def c(sim: Double, a: (Int, Long), b: (Int, Long)): Candidate =
    Candidate(sim, a._1, b._1, a._2, b._2)

  private def groupsAsSets(gs: Seq[Seq[Rec]]): Set[Set[(Int, Long)]] =
    gs.map(_.map(r => (r.dset, r.rec)).toSet).toSet

  private def check(result: Seq[Seq[Rec]], truth: Set[Set[(Int, Long)]]): Unit = {
    val rs = groupsAsSets(result)
    assert(result.size == rs.size, "duplicate groups in result")
    assert(rs == truth)
  }

  test("greedy two-party (test_solving.py:40-60)") {
    check(Greedy.greedySolve(Seq(c(.8, (0, 0), (1, 0)))), Set(Set((0, 0L), (1, 0L))))

    check(Greedy.greedySolve(Seq(
      c(.8, (0, 0), (1, 0)),
      c(.7, (0, 1), (1, 0)))), Set(Set((0, 0L), (1, 0L))))

    check(Greedy.greedySolve(Nil), Set.empty)

    check(Greedy.greedySolve(Seq(
      c(.8, (0, 0), (1, 0)),
      c(.7, (0, 0), (1, 1)),
      c(.7, (0, 1), (1, 0)),
      c(.6, (0, 1), (1, 1)))),
      Set(Set((0, 0L), (1, 0L)), Set((0, 1L), (1, 1L))))
  }

  test("greedy three-party (test_solving.py:64-101)") {
    check(Greedy.greedySolve(Seq(
      c(.9, (1, 0), (2, 0)),
      c(.8, (0, 0), (1, 1)),
      c(.8, (0, 0), (2, 1)),
      c(.8, (1, 1), (2, 1)),
      c(.7, (0, 0), (1, 0)),
      c(.7, (0, 0), (2, 0)))),
      Set(Set((0, 0L), (1, 1L), (2, 1L)), Set((1, 0L), (2, 0L))))

    check(Greedy.greedySolve(Seq(
      c(.8, (0, 0), (1, 0)),
      c(.8, (0, 1), (2, 1)),
      c(.8, (1, 1), (2, 1)),
      c(.7, (0, 0), (2, 0)),
      c(.7, (0, 1), (1, 1)))),
      Set(Set((0, 0L), (1, 0L)), Set((0, 1L), (1, 1L), (2, 1L))))

    check(Greedy.greedySolve(Seq(
      c(1.0, (0, 0), (1, 0)),
      c(1.0, (0, 0), (2, 0)),
      c(1.0, (2, 0), (2, 1)))),
      Set(Set((0, 0L), (1, 0L)), Set((2, 0L), (2, 1L))))

    check(Greedy.greedySolve(Seq(
      c(1.0, (0, 0), (1, 0)),
      c(1.0, (2, 0), (3, 0)),
      c(1.0, (2, 0), (4, 0)),
      c(1.0, (3, 0), (4, 0)),
      c(1.0, (0, 0), (2, 0)),
      c(1.0, (0, 0), (3, 0)),
      c(1.0, (0, 0), (4, 0)),
      c(1.0, (1, 0), (2, 0)),
      c(1.0, (1, 0), (3, 0)),
      c(1.0, (1, 0), (4, 0)))),
      Set(Set((0, 0L), (1, 0L), (2, 0L), (3, 0L), (4, 0L))))
  }

  test("greedy four-party (test_solving.py:105-113)") {
    check(Greedy.greedySolve(Seq(
      c(.9, (0, 0), (1, 0)),
      c(.9, (2, 0), (3, 0)),
      c(.7, (0, 0), (2, 0)),
      c(.7, (1, 0), (3, 0)),
      c(.7, (0, 0), (3, 0)),
      c(.7, (1, 0), (2, 0)))),
      Set(Set((0, 0L), (1, 0L), (2, 0L), (3, 0L))))
  }

  test("merge_threshold out of range raises (test_solving.py:127-132)") {
    val cands = Seq(c(.8, (0, 0), (1, 0)))
    intercept[IllegalArgumentException] {
      Greedy.probabilisticGreedySolve(cands, mergeThreshold = -0.1)
    }
    intercept[IllegalArgumentException] {
      Greedy.probabilisticGreedySolve(cands, mergeThreshold = 1.01)
    }
  }

  test("probabilistic thresholds .75/.76 boundary (test_solving.py:422-459)") {
    val cands = Seq(
      c(.9, (0, 0), (0, 1)),
      c(.8, (1, 0), (1, 1)),
      c(.7, (0, 0), (1, 0)),
      c(.6, (0, 0), (1, 1)),
      c(.5, (0, 1), (1, 0)))

    for (mt <- Seq(0.0, 0.75, 0.76, 1.0)) {
      check(Greedy.probabilisticGreedySolve(cands, mt, deduplicated = true),
        Set(Set((0, 0L), (1, 0L))))
    }
    for (mt <- Seq(0.0, 0.75)) {
      check(Greedy.probabilisticGreedySolve(cands, mt, deduplicated = false),
        Set(Set((0, 0L), (1, 0L), (0, 1L), (1, 1L))))
    }
    for (mt <- Seq(0.76, 1.0)) {
      check(Greedy.probabilisticGreedySolve(cands, mt, deduplicated = false),
        Set(Set((0, 0L), (0, 1L)), Set((1, 0L), (1, 1L))))
    }
  }

  test("property: each record in at most one group; maximal merging (test_solving.py:226-243)") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 200) {
      // random candidate dict over a small id space
      val nPairs = rnd.nextInt(20)
      val pairs = scala.collection.mutable.Map.empty[((Int, Long), (Int, Long)), Double]
      for (_ <- 0 until nPairs) {
        val a = (rnd.nextInt(3), rnd.nextInt(5).toLong)
        val b = (rnd.nextInt(3), rnd.nextInt(5).toLong)
        if (a != b) {
          val Seq(x, y) = Seq(a, b).sorted
          pairs((x, y)) = rnd.nextDouble()
        }
      }
      val cands = pairs.map { case ((a, b), s) => c(s, a, b) }.toSeq
      val solution = Greedy.greedySolve(cands)

      // each record in at most one group
      val flat = solution.flatten
      assert(flat.distinct.size == flat.size)

      // all groups that can be fully merged have been merged
      val allRecords = cands.flatMap(x => Seq((x.dset0, x.rec0), (x.dset1, x.rec1))).distinct
      val matchedRecs = flat.map(r => (r.dset, r.rec)).toSet
      val allGroups: Seq[Seq[(Int, Long)]] =
        solution.map(_.map(r => (r.dset, r.rec))) ++
          allRecords.filterNot(matchedRecs.contains).map(Seq(_))
      val pairSet = pairs.keySet
      for {
        i <- allGroups.indices
        j <- (i + 1) until allGroups.size
      } {
        val mergeable = allGroups(i).forall(r1 => allGroups(j).forall { r2 =>
          val Seq(x, y) = Seq(r1, r2).sorted
          pairSet.contains((x, y))
        })
        assert(!mergeable, s"groups ${allGroups(i)} and ${allGroups(j)} should have merged")
      }
    }
  }

  test("pairsFromGroups and pairwiseF1") {
    val gs = Seq(Seq(Rec(0, 5), Rec(1, 7)), Seq(Rec(1, 2), Rec(0, 3)))
    assert(Greedy.pairsFromGroups(gs).toSet == Set((5L, 7L), (3L, 2L)))
    intercept[IllegalArgumentException] {
      Greedy.pairsFromGroups(Seq(Seq(Rec(0, 1), Rec(0, 2))))
    }
    val p1 = Greedy.groupPairs(Seq(Seq(Rec(0, 1), Rec(1, 1), Rec(1, 2))))
    assert(p1.size == 3)
    assert(Greedy.pairwiseF1(p1, p1) == 1.0)
    assert(Greedy.pairwiseF1(Set.empty, Set.empty) == 1.0)
    assert(Greedy.pairwiseF1(p1, Set.empty) == 0.0)
  }
}
