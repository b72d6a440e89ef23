package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the decode/feature-extract plumbing.
  *
  * Decoding: WAV (RIFF/PCM16) and BMP (24-bit uncompressed) decode FOR
  * REAL via pure-JVM byte parsing, and JPEG/PNG/GIF decode FOR REAL via
  * `javax.imageio` (bundled with the JDK) — all feed genuine signal/pixel
  * features. MP4 containers demux FOR REAL (ISO-BMFF box walk to the
  * sample tables, true per-sample byte extraction via stco/stsc), and
  * MJPEG-in-MP4 frames decode FOR REAL (each sample is a complete JPEG —
  * `videoFrameFeatures`). Only inter-coded video codecs (avc1/hevc/mp4v)
  * and exotic audio codecs stay STUBBED with a deterministic byte-fold
  * (no such decoder in the bare JVM); the `mapPartitions` batch shape
  * those would slot into is identical. Everything Spark-side is real
  * either way: schema, batch iteration, partitioning, and the metadata
  * column flow.
  */
object Multimodal {

  /** RIFF/WAVE PCM decode: (sampleRate, channels, int16 samples). None for
    * anything that is not an uncompressed 16-bit PCM WAV.
    */
  private[graft] def decodeWav(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def u2(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u4(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var rate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (i + 8 <= b.length) {
      val id = tag(i); val len = u4(i + 4)
      if (len < 0) return None // corrupt length: stop, don't loop forever
      id match {
        case "fmt " =>
          if (u2(i + 8) != 1) return None // PCM only
          channels = u2(i + 10); rate = u4(i + 12); bits = u2(i + 22)
          if (bits != 16) return None
        case "data" =>
          val n = math.min(len, b.length - i - 8) / 2
          samples = new Array[Short](n)
          var k = 0
          while (k < n) { samples(k) = u2(i + 8 + 2 * k).toShort; k += 1 }
        case _ => ()
      }
      i += 8 + len + (len & 1) // chunks are 2-byte aligned
    }
    if (rate > 0 && channels > 0 && samples != null) Some((rate, channels, samples)) else None
  }

  /** BMP decode (24-bit uncompressed, bottom-up): (width, height, packed
    * 0xRRGGBB pixels in row-major top-down order). None otherwise.
    */
  private[ops] def decodeBmp(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u2(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u4(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = u4(10); val w = u4(18); val h = u4(22)
    if (u2(28) != 24 || u4(30) != 0 || w <= 0 || h <= 0) return None
    val rowBytes = (w * 3 + 3) & ~3
    if (dataOff + rowBytes.toLong * h > b.length) return None
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val src = dataOff + (h - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < w) {
        val i = src + 3 * x
        px(y * w + x) = ((b(i + 2) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Compressed-still decode (JPEG/PNG/GIF) via `javax.imageio` — plain
    * JDK, no native codec libraries. Returns the same (width, height,
    * packed 0xRRGGBB row-major) shape as [[decodeBmp]] so both feed
    * [[bmpFeatures]]. None when no registered reader recognises the bytes
    * (MP4 and other video containers stay on the documented stub path).
    */
  private[ops] def decodeImage(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) None
      else {
        // getRGB converts any source color model to packed sRGB — one
        // deterministic representation regardless of subsampling/encoder
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < px.length) { px(i) &= 0xffffff; i += 1 }
        Some((w, h, px))
      }
    }
  }

  /** Audio features from decoded PCM: [rate/48k, channels, duration_sec,
    * rms] ++ per-window RMS over dim-4 equal time slices. One fixed-order
    * pass — deterministic across partitionings.
    */
  private[ops] def wavFeatures(rate: Int, channels: Int, s: Array[Short], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    f(0) = rate / 48000.0f
    f(1) = channels.toFloat
    f(2) = if (rate * channels == 0) 0f else s.length.toFloat / (rate * channels)
    var sq = 0.0
    var i = 0
    while (i < s.length) { val v = s(i) / 32768.0; sq += v * v; i += 1 }
    f(3) = if (s.length == 0) 0f else math.sqrt(sq / s.length).toFloat
    val bands = dim - 4
    if (bands > 0 && s.length > 0) {
      var w = 0
      while (w < bands) {
        val from = (s.length.toLong * w / bands).toInt
        val until = (s.length.toLong * (w + 1) / bands).toInt
        var bsq = 0.0; var k = from
        while (k < until) { val v = s(k) / 32768.0; bsq += v * v; k += 1 }
        f(4 + w) = if (until == from) 0f else math.sqrt(bsq / (until - from)).toFloat
        w += 1
      }
    }
    f
  }

  /** Image features from decoded pixels: [w/4096, h/4096, meanR, meanG,
    * meanB] ++ a dim-5-bin luma histogram (mass-normalized).
    */
  private[ops] def bmpFeatures(w: Int, h: Int, px: Array[Int], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    f(0) = w / 4096.0f; f(1) = h / 4096.0f
    var r = 0L; var g = 0L; var bl = 0L
    val bins = dim - 5
    val hist = new Array[Long](math.max(bins, 1))
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
      r += pr; g += pg; bl += pb
      if (bins > 0) {
        val luma = (299 * pr + 587 * pg + 114 * pb) / 1000
        hist(math.min(bins - 1, luma * bins / 256)) += 1
      }
      i += 1
    }
    val n = math.max(px.length, 1)
    f(2) = r.toFloat / n / 255f; f(3) = g.toFloat / n / 255f; f(4) = bl.toFloat / n / 255f
    var k = 0
    while (k < bins) { f(5 + k) = hist(k).toFloat / n; k += 1 }
    f
  }

  /** Wrap a payload column as a typed asset: binary payload + metadata
    * struct (byte length + md5 fingerprint + declared kind).
    */
  def toAsset(df: DataFrame, idCol: Column, kindCol: Column, payloadCol: Column): DataFrame =
    df.select(
      idCol.as("asset_id"),
      kindCol.as("kind"),
      payloadCol.cast("binary").as("payload"),
      struct(
        octet_length(payloadCol.cast("binary")).as("n_bytes"),
        md5(payloadCol.cast("binary")).as("digest")).as("meta"))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract over asset batches.
    *
    * WAV, BMP, and JPEG/PNG/GIF payloads decode for real (see
    * [[decodeWav]]/[[decodeBmp]]/[[decodeImage]]) into signal/pixel
    * features; remaining kinds — video containers the bare JVM can't
    * demux — fall back to a documented deterministic byte-fold so the
    * data path still runs end-to-end. The `mapPartitions`
    * shape — iterator in, iterator out, one JVM-side batch per partition —
    * is exactly the contract a Pandas-UDF (`mapInPandas`) or JNI decoder
    * slots into, and partitioning is preserved (no shuffle).
    */
  def decodeFeatures(assets: DataFrame, dim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val kind = row.getString(1)
        val payload = row.getAs[Array[Byte]](2)
        // corrupt bytes must fall back to the stub, never fail the task —
        // the same skip-on-corrupt contract as the log decoder
        val decoded: Option[Array[Float]] =
          (try decodeWav(payload).map { case (r, c, s) => wavFeatures(r, c, s, dim) }
           catch { case _: Exception => None })
            .orElse(decodePixels(payload).map { case (w, h, px) => bmpFeatures(w, h, px, dim) })
        val feats = decoded.getOrElse {
          // STUB fallback for compressed codecs: byte-histogram fold
          val f = new Array[Float](dim)
          var i = 0
          while (i < payload.length) {
            f(i % dim) += (payload(i) & 0xff) / 255.0f
            i += 1
          }
          f
        }
        Row(id, kind, payload.length, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  val AudioWindowSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("win", IntegerType),
    StructField("n", IntegerType),
    StructField("energy", LongType),
    StructField("peak", IntegerType),
    StructField("zero_crossings", LongType)))

  /** Per-window audio frame table over decoded PCM — the shape an
    * ASR/diarization/VAD pipeline consumes (silence gating, speech/music
    * discrimination, loudness normalization feed): one row per
    * `windowSamples` slice of channel 0 with sample count, ENERGY
    * `Σ s²` (exact in a long — int16 squares, no floats anywhere), peak
    * `max |s|`, and the zero-crossing count (adjacent sign flips within
    * the window; the classic pitched-vs-noise discriminator). All-integer
    * outputs: bit-identical on any JVM, any partitioning. Non-WAV or
    * corrupt payloads contribute no rows (the skip-on-corrupt contract).
    * `mapPartitions`, partitioning preserved — decode work scales with
    * the asset bytes each partition holds, never shuffles.
    */
  def audioWindows(assets: DataFrame, windowSamples: Int = 4000): DataFrame = {
    require(windowSamples > 0, "windowSamples must be positive")
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val dec = try decodeWav(payload) catch { case _: Exception => None }
        dec.iterator.flatMap { case (_, channels, s) =>
          val ch = math.max(1, channels)
          val nMono = s.length / ch
          val nWin = (nMono + windowSamples - 1) / windowSamples
          (0 until nWin).iterator.map { w =>
            val from = w * windowSamples
            val until = math.min(nMono, from + windowSamples)
            var energy = 0L; var zc = 0L; var peak = 0
            var i = from
            while (i < until) {
              val v = s(i * ch).toInt
              energy += v.toLong * v
              val a = if (v < 0) -v else v
              if (a > peak) peak = a
              if (i > from && (s((i - 1) * ch) >= 0) != (v >= 0)) zc += 1
              i += 1
            }
            Row(id, w, until - from, energy, peak, zc)
          }
        }
      }
    }
    spark.createDataFrame(rdd, AudioWindowSchema)
  }

  /** Energy-threshold voice-activity segments over [[audioWindows]] —
    * the ASR-pipeline pre-filter that decides which stretches of an
    * audio asset are worth transcribing/embedding at all: a window is
    * ACTIVE when its per-sample mean energy clears `thrPerSample`
    * (integer test `energy ≥ thr · n`, no division), and consecutive
    * active windows fuse into one segment via the standard
    * gaps-and-islands fold (lag + running sum of segment starts). Emits
    * (asset_id, seg, win_start, win_end, n_windows, energy) — the
    * sample-time bounds are `win · windowSamples` by the window-table
    * contract.
    *
    * Scale shape: decode cost is [[audioWindows]]'s (partition-local,
    * never shuffles); the island fold is two windows partitioned by
    * asset — assets are the parallelism unit, per-asset window counts
    * are duration-bounded. Threshold semantics are deterministic
    * integer arithmetic end-to-end.
    */
  def vadSegments(assets: DataFrame, windowSamples: Int = 4000,
                  thrPerSample: Long = 1000000L): DataFrame =
    vadFromWindows(audioWindows(assets, windowSamples), thrPerSample)

  /** [[vadSegments]]'s fold over an ALREADY-computed window table (the
    * [[AudioWindowSchema]] shape) — the bucket-log convention applied to
    * audio: a pipeline that persists its window tables (or maintains
    * them at ingest) re-derives VAD segments under a new threshold
    * without touching, or re-decoding, a single payload byte.
    */
  def vadFromWindows(wins: DataFrame,
                     thrPerSample: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("asset_id")).orderBy(col("win"))
    wins
      .filter(col("energy") >= lit(thrPerSample) * col("n"))
      .withColumn("prev", lag(col("win"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("win") - col("prev") > 1, 1L).otherwise(0L))
      .withColumn("seg", sum(col("is_new")).over(w))
      .groupBy(col("asset_id"), col("seg"))
      .agg(min(col("win")).as("win_start"), max(col("win")).as("win_end"),
        count(lit(1)).as("n_windows"), sum(col("energy")).as("energy"))
      .orderBy(col("asset_id"), col("seg"))
  }

  val SharpnessSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n", LongType),
    StructField("lap_sum", LongType),
    StructField("lap_dev_sq_sum", LongType),
    StructField("lap_var", LongType)))

  /** Image sharpness by variance of the Laplacian — the standard
    * blur/quality gate an image-corpus curation pass runs before
    * training (a defocused or upscaled-then-saved image scores near 0,
    * crisp detail scores high): per interior pixel the 4-neighbor
    * Laplacian `4·l − l_left − l_right − l_up − l_down` over the dHash
    * luma (integer 299r+587g+114b, milli-scale), variance by the local
    * TWO-PASS `Σ(lap − mean)² div n` — centered before squaring, with
    * the squared-deviation sum carried as hi·10¹⁸ + lo across TWO longs
    * (each term ≤ (2·1020000)² ≈ 4.2·10¹², so `lo` never wraps between
    * carries): `lap_var` is exact at ANY pixel count and contrast,
    * where a single-long one-pass `n·Σx² − (Σx)²` overflows around 2 MP
    * and even the centered single-long sum overflows near 2.2 MP on
    * adversarial max-contrast images. The raw `lap_dev_sq_sum` column
    * saturates at Long.MaxValue in that (beyond ~2×10⁶ max-contrast
    * interior pixels) regime — the variance, not the raw sum, is the
    * signal. All-integer and partition-local like every decode op here:
    * skip-on-corrupt, `mapPartitions`, no shuffle; images below 3×3
    * have no interior and contribute no rows.
    */
  def imageSharpness(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        decodePixels(row.getAs[Array[Byte]](1)).iterator
          .filter { case (w, h, _) => w >= 3 && h >= 3 }
          .map { case (w, h, px) =>
            def luma(i: Int): Long = {
              val p = px(i)
              (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff)
                + 114L * (p & 0xff))
            }
            def lap(i: Int): Long =
              4L * luma(i) - luma(i - 1) - luma(i + 1) -
                luma(i - w) - luma(i + w)
            var n = 0L; var s = 0L
            var y = 1
            while (y < h - 1) {
              var x = 1
              while (x < w - 1) { s += lap(y * w + x); n += 1; x += 1 }
              y += 1
            }
            val mean = s / n
            val Carry = 1000000000000000000L // 10^18
            var devHi = 0L
            var devLo = 0L
            y = 1
            while (y < h - 1) {
              var x = 1
              while (x < w - 1) {
                val d = lap(y * w + x) - mean
                devLo += d * d
                if (devLo >= Carry) { devHi += 1L; devLo -= Carry }
                x += 1
              }
              y += 1
            }
            val (devSq, lapVar) =
              if (devHi == 0L) (devLo, devLo / n)
              else {
                val tot = BigInt(devHi) * Carry + devLo
                (if (tot > Long.MaxValue) Long.MaxValue else tot.toLong,
                  (tot / n).toLong)
              }
            Row(id, w, h, n, s, devSq, lapVar)
          }
      }
    }
    spark.createDataFrame(rdd, SharpnessSchema)
  }

  /** 64-bit difference hash (dHash) over decoded pixels: area-average the
    * luma into a 9×8 grid, one bit per horizontally-adjacent comparison.
    * The standard perceptual fingerprint for image near-dup detection —
    * stable under re-encoding, resizing, and mild noise (all of which
    * defeat the byte-level md5 in `toAsset`). Integer arithmetic only
    * (luma in permille, area sums in longs): bit-identical on any JVM.
    */
  private[ops] def dhash64(w: Int, h: Int, px: Array[Int]): Long = {
    val gw = 9; val gh = 8
    val acc = new Array[Long](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val gy = (y.toLong * gh / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * gw / w).toInt
        val p = px(y * w + x)
        val luma = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        acc(gy * gw + gx) += luma
        cnt(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    def cell(gy: Int, gx: Int): Long = {
      val i = gy * gw + gx
      if (cnt(i) == 0) 0L else acc(i) / cnt(i)
    }
    var bits = 0L
    var i = 0
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        if (cell(gy, gx) > cell(gy, gx + 1)) bits |= (1L << i)
        i += 1
        gx += 1
      }
      gy += 1
    }
    bits
  }

  val PhashSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("phash", LongType, nullable = true)))

  /** Perceptual hash per asset: decode (BMP native, JPEG/PNG/GIF via
    * ImageIO), [[dhash64]] the pixels. Non-images / corrupt payloads
    * yield NULL (skip-on-corrupt, same contract as [[decodeFeatures]]).
    * Partition-local map — no shuffle; the codec slot is the same
    * mapPartitions seam as every decoder here.
    */
  def perceptualHash(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val kind = row.getString(1)
        val payload = row.getAs[Array[Byte]](2)
        val hash: Option[Long] =
          decodePixels(payload).map { case (w, h, px) => dhash64(w, h, px) }
        Row(id, kind, hash.map(Long.box).orNull)
      }
    }
    spark.createDataFrame(rdd, PhashSchema)
  }

  /** Image near-dup pairs at hamming ≤ `maxHamming` over [[perceptualHash]]
    * — the multimodal twin of the text simhash pair join (Dedup
    * .simhashPairs), same pigeonhole: 4 blocks of 16 bits meet in an
    * EQUALITY join (any pair within hamming 3 shares an intact block),
    * exact `bit_count(xor)` post-filter, `id1 < id2` halves pair space.
    * Candidates are O(shared-block pairs), never corpus-quadratic; NULL
    * hashes (undecodable assets) drop before pairing.
    */
  def phashPairs(assets: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 blocks of 16 bits guarantee recall only for hamming <= 3, got $maxHamming")
    val hashes = perceptualHash(assets).filter(col("phash").isNotNull)
    val blocks = hashes.select(col("asset_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("blkval", expr("shiftright(phash, cast(blk * 16 as int)) & 65535L"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.blkval") === col("b.blkval") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id1"), col("b.asset_id").as("id2"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  val AudioSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("rate", IntegerType),
    StructField("wav", BinaryType)))

  /** Re-encode PCM16 samples as a minimal RIFF/WAVE container —
    * readable back by [[decodeWav]] and by any standard audio tool.
    */
  private[ops] def encodeWav(rate: Int, channels: Int,
                             s: Array[Short]): Array[Byte] = {
    val n = s.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n)
    s.foreach(out.putShort)
    out.array()
  }

  /** REAL audio resample for PCM WAVs — the audio twin of
    * [[resizeImages]]: each output sample is the exact long-sum integer
    * mean of its source window on channel 0 (area-average box filter —
    * correct decimation for telephony/ASR target rates; bit-identical on
    * any JVM), re-encoded as a standard mono RIFF/PCM16 container that
    * [[decodeWav]] and any audio tool read back. Undecodable or empty
    * payloads contribute no rows; `mapPartitions`, no shuffle.
    */
  def resampleAudio(assets: DataFrame, targetRate: Int = 16000): DataFrame = {
    require(targetRate > 0)
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "kind", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val payload = row.getAs[Array[Byte]](2)
        val dec = try decodeWav(payload) catch { case _: Exception => None }
        dec.iterator.flatMap { case (rate, channels, s) =>
          val ch = math.max(1, channels)
          val nMono = s.length / ch
          if (nMono == 0 || rate <= 0) Iterator.empty
          else {
            val nOut = math.max(1, (nMono.toLong * targetRate / rate).toInt)
            val out = new Array[Short](nOut)
            var k = 0
            while (k < nOut) {
              val from = (nMono.toLong * k / nOut).toInt
              val until = math.max(from + 1, (nMono.toLong * (k + 1) / nOut).toInt)
              var sum = 0L
              var i = from
              while (i < until) { sum += s(i * ch); i += 1 }
              out(k) = (sum / (until - from)).toShort
              k += 1
            }
            Iterator.single(Row(row.getLong(0), row.getString(1),
              targetRate, encodeWav(targetRate, 1, out)))
          }
        }
      }
    }
    spark.createDataFrame(rdd, AudioSchema)
  }

  /** Decode a still payload to (w, h, packed-RGB pixels) — the ONE
    * decode-with-skip-on-corrupt seam every pixel consumer shares
    * ([[decodeFeatures]], [[perceptualHash]], [[resizeImages]]): BMP
    * natively, then JPEG/PNG/GIF via ImageIO; corrupt or undecodable
    * bytes → None, never a task failure.
    */
  private[ops] def decodePixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decodeBmp(payload).orElse(decodeImage(payload))
    catch { case _: Exception => None }

  val ResizeSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("rgb", BinaryType)))

  /** REAL image resize for decodable stills (BMP native, JPEG/PNG/GIF
    * via ImageIO): integer area-average box filter — each target pixel
    * is the exact long-sum mean of its source cell per channel, so the
    * output is bit-identical on any JVM (same discipline as [[dhash64]]'s
    * luma grid, per channel). Output is raw row-major RGB (3
    * bytes/pixel) plus dims — the uniform tensor shape a training
    * pipeline batches, whatever the source codec. Undecodable/corrupt
    * payloads contribute no rows (skip-on-corrupt); `mapPartitions`,
    * partitioning preserved, no shuffle.
    */
  def resizeImages(assets: DataFrame, targetW: Int = 32,
                   targetH: Int = 32): DataFrame = {
    require(targetW > 0 && targetH > 0 &&
      targetW.toLong * targetH * 3 <= Int.MaxValue,
      s"target $targetW x $targetH does not fit a byte array")
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "kind", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val payload = row.getAs[Array[Byte]](2)
        decodePixels(payload).iterator.map { case (w, h, px) =>
          val out = new Array[Byte](targetW * targetH * 3)
          var ty = 0
          while (ty < targetH) {
            val y0 = (h.toLong * ty / targetH).toInt
            val y1 = math.max(y0 + 1, (h.toLong * (ty + 1) / targetH).toInt)
            var tx = 0
            while (tx < targetW) {
              val x0 = (w.toLong * tx / targetW).toInt
              val x1 = math.max(x0 + 1, (w.toLong * (tx + 1) / targetW).toInt)
              var r = 0L; var g = 0L; var b = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val p = px(y * w + x)
                  r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
                  x += 1
                }
                y += 1
              }
              val n = (y1 - y0).toLong * (x1 - x0)
              val o = (ty * targetW + tx) * 3
              out(o) = (r / n).toByte
              out(o + 1) = (g / n).toByte
              out(o + 2) = (b / n).toByte
              tx += 1
            }
            ty += 1
          }
          Row(row.getLong(0), row.getString(1), targetW, targetH, out)
        }
      }
    }
    spark.createDataFrame(rdd, ResizeSchema)
  }

  def resizeStub(assets: DataFrame, targetBytes: Int = 1024): DataFrame = {
    val spark = assets.sparkSession
    val schema = assets.select("asset_id", "kind", "payload").schema
    val rdd = assets.select("asset_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](2)
        val out = new Array[Byte](targetBytes)
        if (payload.nonEmpty) {
          var i = 0
          while (i < targetBytes) {
            out(i) = payload((i.toLong * payload.length / targetBytes).toInt)
            i += 1
          }
        }
        Row(row.getLong(0), row.getString(1), out)
      }
    }
    val resized = spark.createDataFrame(rdd, schema)
    resized.select(col("asset_id"), col("kind"), col("payload"),
      struct(
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest")).as("meta"))
  }

  val FrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Frame sampling over video payloads: one row per kept frame.
    *
    * STUB: "frames" are fixed-size byte windows of the payload; a real
    * deployment swaps the window cutter for a container demuxer. The
    * Spark-side contract is real: partition-local flatMap row
    * amplification (1 video → ⌈frames/everyN⌉ rows, no shuffle, bounded
    * fan-out), the exact shape a `mapInPandas` frame extractor has.
    */
  def frameSample(assets: DataFrame, frameBytes: Int = 256, everyN: Int = 2): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val nFrames = math.max(1, (payload.length + frameBytes - 1) / frameBytes)
        (0 until nFrames by everyN).iterator.map { f =>
          val from = math.min(f * frameBytes, payload.length)
          val until = math.min(payload.length, from + frameBytes)
          Row(id, f, java.util.Arrays.copyOfRange(payload, from, until))
        }
      }
    }
    spark.createDataFrame(rdd, FrameSchema)
  }

  /** REAL per-frame sample extraction from MP4 containers — the upgrade
    * of [[frameSample]]'s byte windows to the container's OWN frame
    * addressing: each kept row carries the exact encoded sample bytes
    * located by the stco/stsc chunk-offset tables and stsz sizes (pure
    * container demux; pixel DECODE of the extracted samples is real for
    * MJPEG traks — [[videoFrameFeatures]] — and out of scope only for
    * inter-coded codecs, which have no bare-JVM decoder).
    * Assets without offset tables, or with samples pointing outside the
    * payload, contribute no rows (skip-on-corrupt). Row amplification is
    * `⌈frames/everyN⌉` per video, partition-local, no shuffle.
    */
  def videoSamples(assets: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN > 0)
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val idx = try parseMp4(payload) catch { case _: Exception => None }
        idx.iterator.flatMap { m =>
          // all-or-nothing: a truncated mdat (any sample out of range)
          // skips the WHOLE asset — a partial frame table with no
          // corruption signal is worse than none (the documented
          // skip-on-corrupt contract)
          val intact = m.offsets != null &&
            m.sizes.indices.forall { k =>
              val off = m.offsets(k); val sz = m.sizes(k)
              off >= 0 && sz >= 0 && off + sz <= payload.length
            }
          if (!intact) Iterator.empty
          else (0 until m.sizes.length by everyN).iterator.map { k =>
            val off = m.offsets(k).toInt
            Row(id, k,
              java.util.Arrays.copyOfRange(payload, off, off + m.sizes(k)))
          }
        }
      }
    }
    spark.createDataFrame(rdd, FrameSchema)
  }

  /** MJPEG fourccs (QuickTime/AVI conventions): every sample is a
    * complete intra-coded JPEG image, so extracted sample bytes decode
    * with the plain-JDK ImageIO seam — no codec libraries.
    */
  private[ops] val MjpegCodecs =
    Set("jpeg", "mjpa", "mjpb", "MJPG", "mjpg", "dmb1", "AVDJ")

  val FrameFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** REAL pixel decode of MJPEG-in-MP4 frames — [[videoSamples]]'s
    * epilogue for the one container codec the bare JVM can decode: when
    * the trak's stsd fourcc declares Motion-JPEG ([[MjpegCodecs]]), each
    * sampled frame's bytes are a self-contained JPEG, so they feed the
    * SAME `javax.imageio` seam still images use ([[decodeImage]]) and
    * fold to the standard grid features ([[bmpFeatures]]). Emits one
    * (asset_id, frame_idx, width, height, features) row per decodable
    * sampled frame; inter-coded traks (avc1/hevc/mp4v — no JVM decoder)
    * and corrupt samples contribute no rows, which is the one documented
    * codec gap left. Partition-local flatMap, fan-out ⌈frames/everyN⌉,
    * no shuffle — decode cost is paid where the bytes already sit.
    */
  def videoFrameFeatures(assets: DataFrame, everyN: Int = 2,
                         dim: Int = 8): DataFrame = {
    require(everyN > 0)
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val idx = try parseMp4(payload) catch { case _: Exception => None }
        idx.iterator.flatMap { m =>
          // same all-or-nothing intactness as videoSamples, plus the
          // codec gate: only declared-MJPEG traks reach the decoder
          val intact = m.offsets != null && MjpegCodecs(m.codec) &&
            m.sizes.indices.forall { k =>
              val off = m.offsets(k); val sz = m.sizes(k)
              off >= 0 && sz >= 0 && off + sz <= payload.length
            }
          if (!intact) Iterator.empty
          else (0 until m.sizes.length by everyN).iterator.flatMap { k =>
            val off = m.offsets(k).toInt
            val bytes = java.util.Arrays.copyOfRange(payload, off, off + m.sizes(k))
            (try decodeImage(bytes) catch { case _: Exception => None }).map {
              case (w, h, px) => Row(id, k, w, h, bmpFeatures(w, h, px, dim).toSeq)
            }
          }
        }
      }
    }
    spark.createDataFrame(rdd, FrameFeatureSchema)
  }

  /** EXTERNAL-decoder seam for INTER-coded video (avc1/hevc/mp4v…) — the
    * codec class a bare JVM cannot decode ([[videoFrameFeatures]] covers
    * intra-coded MJPEG natively; this closes the documented gap without
    * shipping a codec). The decoder is an external executable — ffmpeg
    * behind a ~5-line shim in deployment — resolved from the explicit
    * `decoderCmd`, else the session conf `spark.graft.video.decoder`
    * (whitespace-split), else the `GRAFT_VIDEO_DECODER` env var; when
    * none is configured the op returns an EMPTY frame table (the seam is
    * off — a cluster without the decoder must not half-decode), so specs
    * drive the plumbing with a stub executable and a real deployment
    * drops ffmpeg in with zero code change.
    *
    * Decoder protocol (what the ffmpeg shim must speak): the full
    * container arrives on stdin; stdout carries zero or more frames,
    * each a 16-byte big-endian header `(frame_idx:i32, width:i32,
    * height:i32, len:i32 = width·height)` followed by `len` bytes of
    * row-major 8-bit grayscale; EOF ends the stream. Non-zero exit,
    * malformed framing, oversized frames, or a wedged process (60 s
    * cap) skip the WHOLE asset — the same all-or-nothing
    * skip-on-corrupt contract as every decoder here.
    *
    * Only parseable MP4 payloads whose trak fourcc is NOT an MJPEG
    * variant are piped out (MJPEG stays on the in-JVM path, so the two
    * ops compose disjointly by construction); `everyN` striding is
    * applied on the returned frame indices regardless of what the shim
    * emits. Grayscale folds into the SAME grid features as every image
    * path (`g → (g,g,g)`; luma of a gray pixel is exactly `g`, so
    * histogram bins match the still-image convention bit-for-bit).
    * Scale shape: partition-local `mapPartitions`, one short-lived
    * process per asset where the bytes already sit, no shuffle — decode
    * cost rides the scan exactly like the JVM decoders.
    *
    * The per-asset decode deadline defaults to 60 s and is tunable via
    * `spark.graft.video.deadline.ms` (a deployment decoding long clips
    * raises it; the watchdog contract is unchanged). Because a timed-out
    * or faulted asset is SKIPPED — indistinguishable from "genuinely
    * frameless" in the output table — callers can pass `skippedAssets`
    * (a registered `LongAccumulator`) to count inter-coded assets the
    * decoder dropped, separating timeout/fault skips from empty streams.
    */
  def videoFrameFeaturesExternal(assets: DataFrame, everyN: Int = 2,
                                 dim: Int = 8,
                                 decoderCmd: Option[Seq[String]] = None,
                                 skippedAssets: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    require(everyN > 0)
    val spark = assets.sparkSession
    val cmd: Seq[String] = decoderCmd
      .orElse(spark.conf.getOption("spark.graft.video.decoder")
        .map(_.trim.split("\\s+").toSeq).filter(_.nonEmpty))
      .orElse(sys.env.get("GRAFT_VIDEO_DECODER")
        .map(_.trim.split("\\s+").toSeq).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    if (cmd.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], FrameFeatureSchema)
    val deadlineMs: Long = spark.conf
      .getOption("spark.graft.video.deadline.ms")
      .map(_.trim.toLong).filter(_ > 0).getOrElse(60000L)
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val interCoded = (try parseMp4(payload) catch { case _: Exception => None })
          .exists(m => !MjpegCodecs(m.codec))
        if (!interCoded) Iterator.empty
        else runDecoder(cmd, payload, _ % everyN == 0, deadlineMs) { (k, w, h, gray) =>
          val px = new Array[Int](w * h)
          var i = 0
          while (i < px.length) {
            val g = gray(i) & 0xff; px(i) = (g << 16) | (g << 8) | g; i += 1
          }
          Row(id, k, w, h, bmpFeatures(w, h, px, dim).toSeq)
        } match {
          case Some(rows) => rows.iterator
          case None => skippedAssets.foreach(_.add(1L)); Iterator.empty
        }
      }
    }
    spark.createDataFrame(rdd, FrameFeatureSchema)
  }

  /** Run one external-decoder process over one asset, STREAMING each
    * frame `(idx, w, h, gray)` of the [[videoFrameFeaturesExternal]]
    * protocol through `fold` as it is read — only folded results (small
    * feature rows) are retained, never the decoded frames themselves (a
    * ten-minute clip decodes to gigabytes of grayscale; buffering it per
    * asset would OOM the executor), and frames failing `keep` are
    * drained without folding. None on ANY fault — spawn failure,
    * non-zero exit, short read, nonsense dimensions (> 64 MP), a frame
    * count past 100000 (a fault, not a truncation: a silently partial
    * frame table breaks the all-or-nothing contract), or the
    * `deadlineMs` deadline, which a watchdog enforces by killing the
    * process so even a decoder wedged mid-write (blocking this reader)
    * unblocks into the fault path.
    */
  private[ops] def runDecoder[A](cmd: Seq[String], payload: Array[Byte],
                                 keep: Int => Boolean,
                                 deadlineMs: Long = 60000L)
                                (fold: (Int, Int, Int, Array[Byte]) => A)
      : Option[Seq[A]] = {
    import scala.jdk.CollectionConverters._
    var proc: Process = null
    val watchdog = new java.util.Timer(true)
    try {
      proc = new ProcessBuilder(cmd.asJava)
        .redirectErrorStream(false)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start()
      val p = proc
      // the deadline must cover the BLOCKING protocol reads below, not
      // just process exit: killing the process closes its stdout, which
      // unblocks a stuck read into the fault path
      watchdog.schedule(new java.util.TimerTask {
        def run(): Unit = p.destroyForcibly()
      }, deadlineMs)
      // feed stdin from its own thread: a decoder that emits before
      // draining its input must not deadlock against this writer
      val writer = new Thread(() =>
        try { proc.getOutputStream.write(payload); proc.getOutputStream.close() }
        catch { case _: Exception => () })
      writer.setDaemon(true)
      writer.start()
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(proc.getInputStream))
      val out = Seq.newBuilder[A]
      var n = 0
      var eof = false
      while (!eof) {
        val first = in.read()
        if (first < 0) eof = true
        else {
          if (n >= 100000)
            throw new java.io.IOException("runaway frame count")
          val idx = (first << 24) | (in.readUnsignedByte() << 16) |
            (in.readUnsignedByte() << 8) | in.readUnsignedByte()
          val w = in.readInt(); val h = in.readInt(); val len = in.readInt()
          // compare in LONG arithmetic: a malformed header with
          // overflowing dimensions (w=h=65536 → w*h wraps to 0) must
          // fault the asset, not pass as a zero-length "frame"
          if (w <= 0 || h <= 0 || len.toLong != w.toLong * h.toLong ||
              len > (1 << 26))
            throw new java.io.IOException(s"bad frame header ${(idx, w, h, len)}")
          if (keep(idx)) {
            val gray = new Array[Byte](len)
            in.readFully(gray)
            out += fold(idx, w, h, gray)
          } else in.skipNBytes(len.toLong)
          n += 1
        }
      }
      if (!proc.waitFor(deadlineMs, java.util.concurrent.TimeUnit.MILLISECONDS))
        throw new java.io.IOException("decoder timed out")
      if (proc.exitValue() != 0) None else Some(out.result())
    } catch {
      case _: Exception => None
    } finally {
      watchdog.cancel()
      if (proc != null) proc.destroyForcibly()
    }
  }

  /** Byte-level stats per kind — the metadata aggregation a lakehouse
    * media table needs for layout planning (all expression-level, no UDF).
    */
  def byteStats(assets: DataFrame): DataFrame =
    assets.groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        min(col("meta.n_bytes")).as("min_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))

  /** Parsed MP4 sample table: media timescale, per-sample byte sizes,
    * per-sample decode timestamps in ticks (cumulative stts deltas).
    */
  private[ops] case class Mp4Index(timescale: Int, sizes: Array[Int],
                                   tsTicks: Array[Long], durationTicks: Long,
                                   offsets: Array[Long] = null,
                                   codec: String = "")

  /** REAL MP4 container parsing — an ISO BMFF box walk to the sample
    * tables (`moov/trak/mdia/{mdhd,minf/stbl/{stts,stsz}}`), pure JVM,
    * no codec: frame count, timing, and byte sizes come from the actual
    * container index, which is what a lakehouse video table needs for
    * layout/stats/frame-addressing BEFORE any decoder runs (decode
    * itself stays stubbed — codecs aren't in this container). Big-endian
    * box sizes, first sample-table-bearing trak wins, malformed input → None
    * (skip-on-error semantics, like every other decoder here).
    */
  private[ops] def parseMp4(b: Array[Byte]): Option[Mp4Index] = {
    def u4(i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var timescale = 0
    var sizes: Array[Int] = null
    var deltas: Array[(Long, Long)] = null // (count, delta)
    var stsc: Array[(Long, Long)] = null   // (first_chunk, samples_per_chunk)
    var stco: Array[Long] = null           // chunk file offsets
    // sample-table boxes latch together with the TRAK they were found in,
    // so a later trak's stsc/stco can never pair with an earlier trak's
    // sizes (mixed addressing would locate arbitrary wrong bytes)
    var trak = 0
    var sizesTrak, stscTrak, stcoTrak, codecTrak = -1
    var codec: String = null
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size = u4(i)
        if (size < 8 || i + size > to) return // malformed/64-bit: bail
        val t = tag(i + 4)
        val body = i + 8
        if (containers(t)) {
          if (t == "trak") trak += 1
          walk(body, i + size.toInt)
        }
        else t match {
          case "mdhd" if size >= 24 && b(body) == 0 => // version 0 only
            if (timescale == 0) timescale = u4(body + 12).toInt
          case "stts" if size >= 16 =>
            val n = u4(body + 4).toInt
            if (deltas == null && n >= 0 && size >= 16 + 8L * n)
              deltas = Array.tabulate(n)(k =>
                (u4(body + 8 + 8 * k), u4(body + 12 + 8 * k)))
          case "stsz" if size >= 20 =>
            val fixed = u4(body + 4)
            val n = u4(body + 8).toInt
            if (sizes == null && n >= 0) {
              sizes =
                if (fixed != 0) Array.fill(n)(fixed.toInt)
                else if (size >= 20 + 4L * n)
                  Array.tabulate(n)(k => u4(body + 12 + 4 * k).toInt)
                else null
              if (sizes != null) sizesTrak = trak
            }
          case "stsc" if size >= 16 =>
            val n = u4(body + 4).toInt
            if (stsc == null && n >= 0 && size >= 16 + 12L * n) {
              stsc = Array.tabulate(n)(k => // (first_chunk, samples_per_chunk)
                (u4(body + 8 + 12 * k), u4(body + 12 + 12 * k)))
              stscTrak = trak
            }
          case "stco" if size >= 16 =>
            val n = u4(body + 4).toInt
            if (stco == null && n >= 0 && size >= 16 + 4L * n) {
              stco = Array.tabulate(n)(k => u4(body + 8 + 4 * k))
              stcoTrak = trak
            }
          case "stsd" if size >= 24 =>
            // sample description: the first entry's format fourcc names
            // the trak's codec (entry = 4-byte size + 4-byte format)
            if (codec == null && u4(body + 4) >= 1) {
              codec = tag(body + 12)
              codecTrak = trak
            }
          case _ => ()
        }
        i += size.toInt
      }
    }
    try {
      if (b.length < 12 || tag(4) != "ftyp") None
      else {
        walk(0, b.length)
        if (timescale <= 0 || sizes == null || deltas == null) None
        else {
          val ts = Array.ofDim[Long](sizes.length)
          var t = 0L; var k = 0; var e = 0; var inRun = 0L
          while (k < sizes.length && e < deltas.length) {
            ts(k) = t
            t += deltas(e)._2
            inRun += 1
            if (inRun >= deltas(e)._1) { inRun = 0; e += 1 }
            k += 1
          }
          if (k < sizes.length) None // stts doesn't cover every sample
          else {
            // per-sample FILE offsets from stco × stsc (when present):
            // expand the samples-per-chunk runs across chunks, samples
            // contiguous within each chunk — the container's own frame
            // addressing, no codec involved
            val offsets: Array[Long] =
              if (stco == null || stsc == null || stsc.isEmpty ||
                  sizesTrak != stscTrak || sizesTrak != stcoTrak) null
              else {
                val out = new Array[Long](sizes.length)
                var s = 0; var ci = 0; var run = 0
                while (s < sizes.length && ci < stco.length) {
                  // advance the stsc run cursor (runs sorted by
                  // first_chunk): O(chunks + runs) total, not per-chunk
                  while (run + 1 < stsc.length && stsc(run + 1)._1 <= ci + 1)
                    run += 1
                  val spc = if (stsc(run)._1 <= ci + 1) stsc(run)._2 else 0L
                  var off = stco(ci)
                  var j = 0L
                  while (j < spc && s < sizes.length) {
                    out(s) = off; off += sizes(s); s += 1; j += 1
                  }
                  ci += 1
                }
                if (s < sizes.length) null else out
              }
            Some(Mp4Index(timescale, sizes, ts, t, offsets,
              if (codec != null && codecTrak == sizesTrak) codec else ""))
          }
        }
      }
    } catch { case _: Exception => None }
  }

  val VideoIndexSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("timescale", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ticks", LongType),
    StructField("total_frame_bytes", LongType),
    StructField("frame_idx", IntegerType),
    StructField("t_ticks", LongType),
    StructField("frame_bytes", IntegerType)))

  /** Per-video frame index from the REAL container sample tables: one
    * row per every-Nth frame carrying its decode timestamp and byte
    * size, plus whole-video stats on every row. Partition-local flatMap
    * (no shuffle, fan-out ⌈frames/everyN⌉) — the frame-addressing step
    * that lets a later decoder seek straight to wanted samples instead
    * of demuxing 100 TB of video to find them. Non-MP4 or malformed
    * payloads are skipped (the standing skip-on-error contract).
    */
  def videoIndex(assets: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN > 0)
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        parseMp4(row.getAs[Array[Byte]](1)) match {
          case None => Iterator.empty
          case Some(ix) =>
            val dur = ix.durationTicks
            val total = ix.sizes.foldLeft(0L)(_ + _)
            (0 until ix.sizes.length by everyN).iterator.map { f =>
              Row(id, ix.timescale, ix.sizes.length, dur, total,
                f, ix.tsTicks(f), ix.sizes(f))
            }
        }
      }
    }
    spark.createDataFrame(rdd, VideoIndexSchema)
  }
}
