package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise in
  * `mapPartitions` (the Scala analogue of a vectorized/pandas UDF:
  * each partition iterator is consumed in fixed-size batches so a
  * decoder can amortize codec/model setup per batch).
  *
  * Decoding is PLUGGABLE ([[MediaDecoder]]):
  *  - [[ByteHistogramDecoder]] (default) — deterministic features from
  *    a byte histogram. Total (any bytes), cheap, and exactly
  *    reproducible in SQL, so it anchors the DuckDB oracle
  *    (`multimodal_features`). It does NOT look at pixels.
  *  - [[ImageDecoder]] — a REAL pixel decoder via `javax.imageio`
  *    (PNG/BMP/GIF/JPEG ship with the JDK, pure JVM, headless-safe):
  *    luminance histogram, channel means, dimensions, contrast and
  *    gradient energy from the decoded raster. Rows that are not
  *    decodable images (wrong mime, corrupt bytes) deterministically
  *    FALL BACK to the byte-histogram features — at corpus scale one
  *    truncated file must degrade one row, not kill the stage.
  *
  *  - [[AudioDecoder]] — a REAL audio decoder for PCM WAV (RIFF
  *    parsed by hand — no codecs needed): RMS/peak amplitude,
  *    zero-crossing rate, duration, envelope, roughness, silence
  *    fraction from the actual samples; same deterministic
  *    byte-histogram fallback for non-WAV bytes.
  *  - [[AutoDecoder]] — mime-dispatching combination of the above,
  *    the production default for mixed-media corpora.
  *
  * Compressed audio/video codecs don't exist in this container, so
  * [[sampleFrames]] remains a disclosed byte-range stub standing in
  * for video frame extraction; the image and PCM-audio paths are real
  * end to end.
  */
object Multimodal {

  val FeatureDim = 16
  val BatchSize = 64

  case class MediaRow(id: Long, media: Array[Byte], mime: String)
  case class FeatureRow(id: Long, mime: String, n_bytes: Long, features: Array[Float])

  /** Wrap a binary column + metadata into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mimeCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("media"),
      col(mimeCol).as("mime")).as[MediaRow]
  }

  /** Batch decode step — implementations must be deterministic and
    * total (never throw on malformed rows; fall back or zero-fill). */
  trait MediaDecoder extends Serializable {
    def decode(batch: Array[MediaRow]): Array[FeatureRow]
  }

  /** Deterministic pseudo-features from a byte histogram: bucket counts
    * of `byte mod FeatureDim`, normalized by length. Total over any
    * bytes and SQL-reproducible — the oracle anchor and the fallback
    * for undecodable rows. */
  object ByteHistogramDecoder extends MediaDecoder {
    def decodeOne(r: MediaRow): FeatureRow = {
      val feats = new Array[Float](FeatureDim)
      if (r.media != null && r.media.nonEmpty) {
        // counts accumulate in Long: past 2^24 increments, float += 1.0f
        // becomes a no-op and silently skews the histogram of a >=16 MB
        // blob; Long.toFloat rounds exactly like the oracle's
        // CAST(count AS FLOAT), so values are unchanged below 2^24 and
        // correct (instead of saturated) above it
        val counts = new Array[Long](FeatureDim)
        var i = 0
        while (i < r.media.length) {
          counts((r.media(i) & 0xff) % FeatureDim) += 1L
          i += 1
        }
        val inv = 1.0f / r.media.length
        var d = 0
        while (d < FeatureDim) { feats(d) = counts(d).toFloat * inv; d += 1 }
      }
      FeatureRow(r.id, r.mime, if (r.media == null) 0L else r.media.length.toLong, feats)
    }
    override def decode(batch: Array[MediaRow]): Array[FeatureRow] =
      batch.map(decodeOne)
  }

  /** Real image feature extraction on the decoded pixel raster
    * (`javax.imageio` — JDK-bundled PNG/BMP/GIF/JPEG readers, no
    * native codecs). 16 features:
    *  - 0..7   luminance histogram (8 bins, fraction of pixels)
    *  - 8..10  mean R, G, B in [0, 1]
    *  - 11,12  width, height scaled by 1/4096 (clamped at 1)
    *  - 13     aspect = w / (w + h)
    *  - 14     contrast: luminance standard deviation / 255
    *  - 15     horizontal gradient energy: mean |lum(x+1,y) − lum(x,y)| / 255
    * Non-image mimes and undecodable bytes fall back to
    * [[ByteHistogramDecoder]] features for that row (deterministic —
    * the fallback depends only on the row's bytes). */
  object ImageDecoder extends MediaDecoder {
    // ImageIO's disk-backed stream cache costs a temp file per decode;
    // executor-side we always decode from an in-memory byte array
    private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try {
        // ImageIO.read(ImageInputStream) CLOSES the stream itself (its
        // documented exception to the no-close convention) — closing it
        // again here would throw IOException("closed") on every row
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        Option(javax.imageio.ImageIO.read(in))
      } catch { case _: Throwable => None }

    def decodeOne(r: MediaRow): FeatureRow = {
      val img =
        if (r.media == null || r.media.isEmpty ||
          r.mime == null || !r.mime.startsWith("image/")) None
        else readImage(r.media)
      img match {
        case None => ByteHistogramDecoder.decodeOne(r)
        case Some(im) =>
          val w = im.getWidth; val h = im.getHeight
          val feats = new Array[Float](FeatureDim)
          var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
          var sumL = 0.0; var sumL2 = 0.0; var grad = 0.0
          var gradN = 0L
          var y = 0
          var prevL = 0.0
          // bulk scanline reads: per-pixel getRGB(x, y) pays a
          // ColorModel conversion PER CALL (~16.7M calls on a 4096²
          // image); one getRGB per row does the same conversion
          // vectorized, ~an order of magnitude cheaper in the per-row
          // decode path
          val rowBuf = new Array[Int](w)
          // luminance-histogram counts in Long (not the Float feature
          // slots): past 2^24 increments float += 1.0f is a no-op, so a
          // large flat image would silently skew its histogram fractions
          val lumCounts = new Array[Long](8)
          while (y < h) {
            im.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = rowBuf(x)
              val cr = (rgb >> 16) & 0xff; val cg = (rgb >> 8) & 0xff; val cb = rgb & 0xff
              // ITU-R BT.601 luma weights
              val lum = 0.299 * cr + 0.587 * cg + 0.114 * cb
              sumR += cr; sumG += cg; sumB += cb
              sumL += lum; sumL2 += lum * lum
              lumCounts(math.min(7, (lum / 32.0).toInt)) += 1L
              if (x > 0) { grad += math.abs(lum - prevL); gradN += 1 }
              prevL = lum
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          var b = 0
          while (b < 8) { feats(b) = lumCounts(b).toFloat / n; b += 1 }
          feats(8) = (sumR / n / 255.0).toFloat
          feats(9) = (sumG / n / 255.0).toFloat
          feats(10) = (sumB / n / 255.0).toFloat
          feats(11) = math.min(1.0, w / 4096.0).toFloat
          feats(12) = math.min(1.0, h / 4096.0).toFloat
          feats(13) = (w.toDouble / (w + h)).toFloat
          val meanL = sumL / n
          feats(14) = (math.sqrt(math.max(0.0, sumL2 / n - meanL * meanL)) / 255.0).toFloat
          feats(15) = (if (gradN == 0) 0.0 else grad / gradN / 255.0).toFloat
          FeatureRow(r.id, r.mime, r.media.length.toLong, feats)
      }
    }
    override def decode(batch: Array[MediaRow]): Array[FeatureRow] =
      batch.map(decodeOne)
  }

  /** Real audio feature extraction from PCM WAV bytes, parsed with a
    * dependency-free RIFF reader (chunk walk → `fmt ` → `data`;
    * little-endian PCM 16-bit or 8-bit, any channel count — the
    * format every JVM can read without codecs). 16 features:
    *  - 0      RMS amplitude (full-scale normalized)
    *  - 1      peak amplitude
    *  - 2      zero-crossing rate (fraction of sample steps)
    *  - 3      duration, scaled by 1/600 s (clamped at 1)
    *  - 4      sample rate / 48000 (clamped at 1)
    *  - 5      channels / 8
    *  - 6..13  8-segment RMS envelope across the clip
    *  - 14     roughness: mean |x[i] − x[i−1]| (full-scale)
    *  - 15     silence fraction (|x| < 1% full scale)
    * Non-audio mimes and unparseable bytes fall back to
    * [[ByteHistogramDecoder]] features for that row, like
    * [[ImageDecoder]]. Multi-channel audio is analyzed interleaved
    * (per-sample stream), which preserves determinism and energy
    * measures. */
  object AudioDecoder extends MediaDecoder {
    /** Parse PCM WAV → (samples in [-1, 1], sampleRate, channels). */
    private[ops] def parseWav(b: Array[Byte]): Option[(Array[Float], Int, Int)] = {
      try {
        if (b.length < 44) return None
        def u16(o: Int) = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8))
        def u32(o: Int) = ((b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
          ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24))
        def tag(o: Int) = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
        var off = 12
        var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, bits) + rate below
        var rate = 0
        var data: Option[(Int, Int)] = None // (offset, len)
        while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
          val id = tag(off)
          // bound-check in LONG: a crafted length near Int.MaxValue
          // would wrap an Int sum negative, pass the guard, and attempt
          // a multi-GB allocation below — one corrupt file must degrade
          // one row, never the executor heap
          val lenL = u32(off + 4)
          if (lenL < 0 || off + 8L + lenL > b.length) return None
          val len = lenL.toInt
          if (id == "fmt " && len >= 16) {
            fmt = Some((u16(off + 8), u16(off + 10), u16(off + 22)))
            rate = u32(off + 12).toInt
          } else if (id == "data") data = Some((off + 8, len))
          off += 8 + len + (len & 1) // chunks are word-aligned
        }
        (fmt, data) match {
          case (Some((1, ch, bits)), Some((dOff, dLen)))
              if (bits == 16 || bits == 8) && ch >= 1 && rate > 0 =>
            val bytesPer = bits / 8
            val n = dLen / bytesPer
            val out = new Array[Float](n)
            var i = 0
            while (i < n) {
              out(i) =
                if (bits == 16) (((b(dOff + 2 * i + 1) << 8) |
                  (b(dOff + 2 * i) & 0xff)).toShort / 32768.0f)
                else (((b(dOff + i) & 0xff) - 128) / 128.0f) // 8-bit WAV is unsigned
              i += 1
            }
            Some((out, rate, ch))
          case _ => None
        }
      } catch { case _: Throwable => None }
    }

    def decodeOne(r: MediaRow): FeatureRow = {
      val parsed =
        if (r.media == null || r.media.isEmpty ||
          r.mime == null || !r.mime.startsWith("audio/")) None
        else parseWav(r.media)
      parsed match {
        case None => ByteHistogramDecoder.decodeOne(r)
        case Some((x, rate, ch)) if x.nonEmpty =>
          val feats = new Array[Float](FeatureDim)
          var sum2 = 0.0; var peak = 0.0; var zc = 0L; var rough = 0.0
          var silent = 0L
          var i = 0
          while (i < x.length) {
            val v = x(i)
            sum2 += v.toDouble * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (math.abs(v) < 0.01) silent += 1
            if (i > 0) {
              if ((x(i - 1) < 0 && v >= 0) || (x(i - 1) >= 0 && v < 0)) zc += 1
              rough += math.abs(v - x(i - 1))
            }
            i += 1
          }
          val n = x.length
          feats(0) = math.sqrt(sum2 / n).toFloat
          feats(1) = peak.toFloat
          feats(2) = (if (n > 1) zc.toDouble / (n - 1) else 0.0).toFloat
          feats(3) = math.min(1.0, n.toDouble / ch / rate / 600.0).toFloat
          feats(4) = math.min(1.0, rate / 48000.0).toFloat
          feats(5) = math.min(1.0f, ch / 8.0f)
          var s = 0
          while (s < 8) {
            val lo = (n.toLong * s / 8).toInt
            val hi = math.max(lo + 1, (n.toLong * (s + 1) / 8).toInt)
            var e = 0.0
            var j = lo
            while (j < hi) { e += x(j).toDouble * x(j); j += 1 }
            feats(6 + s) = math.sqrt(e / (hi - lo)).toFloat
            s += 1
          }
          feats(14) = (if (n > 1) rough / (n - 1) else 0.0).toFloat
          feats(15) = silent.toFloat / n
          FeatureRow(r.id, r.mime, r.media.length.toLong, feats)
        case Some(_) => ByteHistogramDecoder.decodeOne(r) // empty data chunk
      }
    }
    override def decode(batch: Array[MediaRow]): Array[FeatureRow] =
      batch.map(decodeOne)
  }

  /** Mime-dispatching decoder: image mimes → [[ImageDecoder]],
    * audio mimes → [[AudioDecoder]], everything else (and any decode
    * failure, via each decoder's own fallback) → byte-histogram
    * features. The production default for mixed-media corpora. */
  object AutoDecoder extends MediaDecoder {
    override def decode(batch: Array[MediaRow]): Array[FeatureRow] =
      batch.map { r =>
        if (r.mime != null && r.mime.startsWith("image/")) ImageDecoder.decodeOne(r)
        else if (r.mime != null && r.mime.startsWith("audio/")) AudioDecoder.decodeOne(r)
        else ByteHistogramDecoder.decodeOne(r)
      }
  }

  /** Batched feature extraction over partitions — schema in/out and
    * batch shape are decoder-independent; pick the decoder per call
    * (byte-histogram oracle anchor by default, [[ImageDecoder]] for
    * real pixels). */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = ByteHistogramDecoder): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(g => decoder.decode(g.toArray))
    }
  }

  /** STUB frame sampling: deterministic byte-range slices standing in
    * for video frame extraction — emits (id, frame_no, frame bytes). */
  def sampleFrames(media: Dataset[MediaRow], frames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val len = if (r.media == null) 0 else r.media.length
      if (len == 0) Iterator.empty
      else (0 until frames).iterator.map { f =>
        val start = (len.toLong * f / frames).toInt
        val end = (len.toLong * (f + 1) / frames).toInt
        (r.id, f, java.util.Arrays.copyOfRange(r.media, start, math.max(start + 1, end)))
      }
    }.toDF("id", "frame_no", "frame")
  }
}
