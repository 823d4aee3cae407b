package graft.io

/** C5 `split_to_chunks`
  * (`/root/reference/anonlink/concurrency.py:39-86`): tile the |A|×|B|
  * comparison rectangle into ~chunk_size_aim cells via √-decomposition.
  *
  * In the Spark engine this job is done by key-space salting
  * ([[graft.Linkage.blockAndSalt]]) + AQE; this faithful port exists
  * (a) as the planning utility for exporting work manifests to
  * external schedulers and (b) to pin the reference's guarantees with
  * transcribed tests (`tests/test_concurrency.py:20-61`): full
  * coverage, no overlap, cell size within (aim/4, aim*4).
  */
object Chunking {

  /** One side of a chunk: dataset index + [a, b) record range. */
  case class DatasetChunk(datasetIndex: Int, range: (Long, Long))
  type Chunk = Seq[DatasetChunk]

  /** Split size → `chunks` contiguous 1-D ranges (reference `_chunks_1d`). */
  def chunks1d(size: Long, chunks: Int): Seq[(Long, Long)] = {
    val step = size.toDouble / chunks
    (0 until chunks).map { i =>
      val a = math.round(i * step)
      val b = math.round((i + 1) * step)
      (a, b)
    }
  }

  def splitToChunks(chunkSizeAim: Double, datasetSizes: Seq[Long]): Seq[Chunk] = {
    for {
      (Seq((i0, size0), (i1, size1))) <- datasetSizes.zipWithIndex
        .map { case (s, i) => (i, s) }.combinations(2).toSeq
      if size0 > 0 && size1 > 0
      chunks0 = math.max(1, math.round(size0 / math.sqrt(chunkSizeAim)).toInt)
      chunkSize0 = size0.toDouble / chunks0
      chunks1 = math.max(1, math.round(size1 * chunkSize0 / chunkSizeAim).toInt)
      c0 <- chunks1d(size0, chunks0)
      c1 <- chunks1d(size1, chunks1)
    } yield Seq(DatasetChunk(i0, c0), DatasetChunk(i1, c1))
  }
}
