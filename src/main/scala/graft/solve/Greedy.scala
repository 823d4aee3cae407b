package graft.solve

import scala.collection.mutable

/** A record identity: (dataset index, record index). */
final case class Rec(dset: Int, rec: Long)

/** A scored candidate pair. Ordering matches the reference's global
  * sort key `(-sim, dset0, dset1, rec0, rec1)`
  * (`/root/reference/anonlink/candidate_generation.py:65-66`).
  */
final case class Candidate(sim: Double, dset0: Int, dset1: Int, rec0: Long, rec1: Long)

object Candidate {
  implicit val globalOrdering: Ordering[Candidate] = Ordering.by { c =>
    (-c.sim, c.dset0, c.dset1, c.rec0, c.rec1)
  }
}

/** Exact Scala reimplementation of the reference greedy solver
  * (`/root/reference/anonlink/solving/_multiparty_solving_python.py:8-218`).
  *
  * Sequential, order-dependent, driver-side. Used (a) as the oracle the
  * distributed connected-components clusters are scored against
  * (pairwise F1 ≥ 0.99 per BASELINE.json) and (b) directly for
  * small-to-medium candidate lists — the candidate list after
  * threshold + top-k is orders of magnitude smaller than the input,
  * same trade-off the reference makes (its solver is single-threaded).
  *
  * Semantics (mirroring :24-66 of the reference): stream pairs in
  * decreasing-similarity order; maintain disjoint groups and a sparse
  * inter-group matchable-pair counter; merge two groups when
  * `seen_edges + 1 >= merge_threshold * |g0| * |g1|` and (when
  * `deduplicated`) no two members share a dataset. Rejected merges are
  * revisited as later edges arrive. `greedySolve` =
  * `merge_threshold = 1.0, deduplicated = false` (:193-218).
  */
object Greedy {

  def greedySolve(candidates: Seq[Candidate]): Seq[Seq[Rec]] =
    probabilisticGreedySolve(candidates, mergeThreshold = 1.0, deduplicated = false)

  def probabilisticGreedySolve(
      candidates: Seq[Candidate],
      mergeThreshold: Double = 0.5,
      deduplicated: Boolean = true): Seq[Seq[Rec]] = {
    require(mergeThreshold >= 0 && mergeThreshold <= 1,
      s"merge_threshold must be between 0 and 1 (got $mergeThreshold)")

    val sorted = candidates.sorted(Candidate.globalOrdering)

    // group identity = the mutable buffer instance (reference uses
    // Python id(); we use reference equality via an id-assigning map).
    final class Group(val id: Long) {
      val members = mutable.ArrayBuffer.empty[Rec]
    }
    var nextGid = 0L
    def newGroup(): Group = { nextGid += 1; new Group(nextGid) }

    val matches = mutable.HashMap.empty[Rec, Group]
    // matchable_pairs: sparse symmetric matrix groupId -> (groupId -> count)
    val matchable = mutable.HashMap.empty[Long, mutable.HashMap[Long, Long]]
    def mp(g: Long): mutable.HashMap[Long, Long] =
      matchable.getOrElseUpdate(g, mutable.HashMap.empty)

    for (c <- sorted) {
      val i0 = Rec(c.dset0, c.rec0)
      val i1 = Rec(c.dset1, c.rec1)
      if (i0 != i1) {
        (matches.get(i0), matches.get(i1)) match {
          case (Some(g0), Some(g1)) =>
            if (g0.id != g1.id) {
              val overlap = mp(g0.id).getOrElse(g1.id, 0L) + 1
              val totalPairs = g0.members.length.toLong * g1.members.length
              val duplicatesOk = !deduplicated ||
                g0.members.forall(m0 => g1.members.forall(m1 => m0.dset != m1.dset))
              if (overlap >= mergeThreshold * totalPairs && duplicatesOk) {
                // always extend the bigger group (:126-129)
                val (big, small) =
                  if (g0.members.length < g1.members.length) (g1, g0) else (g0, g1)
                big.members ++= small.members
                small.members.foreach(m => matches(m) = big)
                // update matchable-pair matrix (:136-145)
                mp(big.id).remove(small.id)
                mp(small.id).remove(big.id)
                for ((jId, jCount) <- mp(small.id)) {
                  mp(big.id).updateWith(jId)(v => Some(v.getOrElse(0L) + jCount))
                  mp(jId).updateWith(big.id)(v => Some(v.getOrElse(0L) + jCount))
                  mp(jId).remove(small.id)
                }
                matchable.remove(small.id)
                if (mp(big.id).isEmpty) matchable.remove(big.id)
              } else {
                mp(g0.id).updateWith(g1.id)(v => Some(v.getOrElse(0L) + 1))
                mp(g1.id).updateWith(g0.id)(v => Some(v.getOrElse(0L) + 1))
              }
            }
          case (some0, some1) if some0.isDefined != some1.isDefined =>
            // exactly one is grouped; by symmetry call it (grouped g, lone x)
            val (g, x) = if (some0.isDefined) (some0.get, i1) else (some1.get, i0)
            val totalPairs = g.members.length.toLong
            val duplicatesOk = !deduplicated || g.members.forall(_.dset != x.dset)
            if (1 >= mergeThreshold * totalPairs && duplicatesOk) {
              g.members += x
              matches(x) = g
            } else {
              val gx = newGroup()
              gx.members += x
              matches(x) = gx
              mp(gx.id)(g.id) = 1
              mp(g.id)(gx.id) = 1
            }
          case (None, None) =>
            val duplicatesOk = !deduplicated || i0.dset != i1.dset
            if (duplicatesOk) {
              val g = newGroup()
              g.members += i0
              g.members += i1
              matches(i0) = g
              matches(i1) = g
            }
          case _ => throw new IllegalStateException("non-exhaustive cases")
        }
      }
    }

    // nontrivial groups, deduplicated by identity (:186-190)
    val seen = mutable.HashSet.empty[Long]
    val out = mutable.ArrayBuffer.empty[Seq[Rec]]
    for (g <- matches.valuesIterator) {
      if (g.members.length > 1 && seen.add(g.id)) out += g.members.toSeq
    }
    out.toSeq
  }

  /** 2-party groups → (rec0, rec1) mapping; error on non-bipartite
    * groups (`/root/reference/anonlink/solving/__init__.py:25-47`). */
  def pairsFromGroups(groups: Seq[Seq[Rec]]): Seq[(Long, Long)] =
    groups.map { g =>
      require(g.length == 2, s"expected groups of size 2, got ${g.length}")
      val ds = g.map(_.dset).sorted
      require(ds == Seq(0, 1), s"non-bipartite group: $g")
      val r0 = g.find(_.dset == 0).get.rec
      val r1 = g.find(_.dset == 1).get.rec
      (r0, r1)
    }

  /** All unordered within-group pairs, as a set — used by the pairwise
    * F1 evaluator comparing distributed clusters to this oracle. */
  def groupPairs(groups: Seq[Seq[Rec]]): Set[(Rec, Rec)] =
    groups.iterator.flatMap { g =>
      for {
        i <- g.indices.iterator
        j <- (i + 1) until g.length
      } yield {
        val (a, b) = (g(i), g(j))
        if (Ordering.by[Rec, (Int, Long)](r => (r.dset, r.rec)).lt(a, b)) (a, b) else (b, a)
      }
    }.toSet

  /** Pairwise F1 between two clusterings (sets of within-cluster pairs). */
  def pairwiseF1(predicted: Set[(Rec, Rec)], truth: Set[(Rec, Rec)]): Double = {
    if (predicted.isEmpty && truth.isEmpty) return 1.0
    val tp = predicted.count(truth.contains).toDouble
    if (tp == 0) return 0.0
    val precision = tp / predicted.size
    val recall = tp / truth.size
    2 * precision * recall / (precision + recall)
  }
}
