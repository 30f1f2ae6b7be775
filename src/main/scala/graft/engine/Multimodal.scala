package graft.engine

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star scope; BASELINE.json): image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * REAL decode + feature extraction as partition-local batch transforms.
  *
  * Codecs are the JDK's own — `javax.imageio` (PNG/JPEG/BMP/GIF) for
  * images and `javax.sound.sampled` (WAV/PCM) for audio; no external
  * libraries. "Video" uses a documented concatenated-PNG container
  * (`video/x-concat-png`) so the frame-sampling path — parse container,
  * sample first/middle/last frame, decode each, average — is real even
  * though no MP4 demuxer ships with the JDK. Everything runs inside
  * `mapPartitions` (the Scala analogue of a Pandas UDF over
  * `mapInPandas`: one iterator in, one iterator out, per partition), so
  * payload bytes never leave the executor and never hit a row-at-a-time
  * UDF path.
  *
  * Determinism: synthesis uses a splitmix-style integer hash and
  * `StrictMath` (bit-exact across JVMs); PNG is lossless and WAV is raw
  * PCM, so decoded features are exact functions of the synthesized
  * payload.
  */
object Multimodal {

  // BufferedImage/ImageIO need no display, but make headless explicit so
  // executors never try to touch a windowing system; and keep ImageIO's
  // temp-file cache off — executor-local decode should stay in memory.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  /** Typed row: payload + metadata, the schema a media lake table
    * carries per modality.
    */
  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      content: Array[Byte],
      mime: String,
      n_bytes: Long)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      features: Array[Float])

  // ── deterministic synthesis (test/catalog fixture: real bytes) ───────

  /** splitmix64-style avalanche — stable pixel/sample source. */
  private def mix(seed: Long, a: Long, b: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (a * 0x100000001b3L + b + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic RGB image → real PNG bytes (lossless: decode recovers
    * the exact pixels).
    */
  def synthImagePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (mix(seed, x, y) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic mono 16-bit PCM sine (StrictMath — bit-exact) → real
    * WAV bytes via `javax.sound.sampled`.
    */
  def synthAudioWav(seed: Long, nSamples: Int = 800,
      sampleRate: Float = 8000f): Array[Byte] = {
    val freq = 200.0 + java.lang.Math.floorMod(seed, 32L) * 25.0
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (StrictMath.sin(2.0 * StrictMath.PI * freq * i / sampleRate)
        * 16384.0).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Concatenated-PNG "video": 4-byte big-endian frame count, then per
    * frame a 4-byte big-endian length + PNG bytes. A real (if minimal)
    * container — the frame-sampling decode parses it like a demuxer.
    */
  def synthVideoConcatPng(seed: Long, nFrames: Int, w: Int,
      h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val png = synthImagePng(mix(seed, f, -1), w, h)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Media table synthesized per id: modality cycles image/audio/video,
    * dimensions vary with the id. Replaces the driver testdata's missing
    * real media with REAL encoded bytes, so the decode path below is
    * exercised end-to-end.
    */
  def synthesizeMedia(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    // widened (opt r18, guide §2.5): PNG/WAV encode — and the decode
    // chain every consumer stacks on top — runs inside mapPartitions
    // BELOW the first exchange; on a one-row-group source that whole
    // pipeline was one task. Synthesis is a pure per-id function, so
    // the round-robin is invisible to every downstream value.
    graft.engine.Extensions.widen(docs.select(col(idCol).cast("long")))
      .as[Long].mapPartitions { ids =>
      ids.map { id =>
        java.lang.Math.floorMod(id, 3L) match {
          case 0L =>
            val b = synthImagePng(id, 12 + (id % 5).toInt, 8 + (id % 3).toInt)
            MediaRow(id, "image", b, "image/png", b.length.toLong)
          case 1L =>
            val b = synthAudioWav(id, nSamples = 400 + (id % 7).toInt * 100)
            MediaRow(id, "audio", b, "audio/wav", b.length.toLong)
          case _ =>
            val b = synthVideoConcatPng(id, 2 + (id % 4).toInt, 8, 6)
            MediaRow(id, "video", b, "video/x-concat-png", b.length.toLong)
        }
      }
    }
  }

  // ── real decode (JDK codecs) ─────────────────────────────────────────

  /** Image decode via `javax.imageio` (PNG/JPEG/BMP/GIF).
    * features = [width, height, bands, meanR, meanG, meanB] with channel
    * means in 0..255.
    */
  def decodeImage(bytes: Array[Byte]): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    imageFeatures(img)
  }

  private def imageFeatures(img: BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    Array(w.toFloat, h.toFloat, img.getRaster.getNumBands.toFloat,
      sr / n, sg / n, sb / n)
  }

  /** Nearest-neighbor thumbnail: decode-side resize, flattened row-major
    * RGB means per cell (the "resize" step of the feature pipeline).
    */
  def thumbnail(bytes: Array[Byte], tw: Int, th: Int): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val out = new Array[Float](tw * th)
    val w = img.getWidth; val h = img.getHeight
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        val rgb = img.getRGB(tx * w / tw, ty * h / th)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0f
        out(ty * tw + tx) = lum
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Audio decode via `javax.sound.sampled` (WAV, 16-bit PCM).
    * features = [sampleRate, channels, nFrames, durationSec, rms, peak]
    * with rms/peak normalized to full scale (32768).
    */
  def decodeAudio(bytes: Array[Byte]): Array[Float] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
      val frames = ais.getFrameLength
      val data = ais.readAllBytes()
      val n = data.length / 2
      var sumSq = 0.0
      var peak = 0
      var i = 0
      while (i < n) {
        val s =
          if (fmt.isBigEndian) (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
          else (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
        sumSq += s.toDouble * s
        if (math.abs(s) > peak) peak = math.abs(s)
        i += 1
      }
      val rms = if (n == 0) 0.0 else StrictMath.sqrt(sumSq / n)
      Array(fmt.getSampleRate, fmt.getChannels.toFloat, frames.toFloat,
        frames / fmt.getSampleRate, (rms / 32768.0).toFloat, peak / 32768.0f)
    } finally ais.close()
  }

  /** Video decode: parse the concat-PNG container, SAMPLE up to
    * `sampleFrames` frames (first/evenly-spaced/last — the standard
    * frame-sampling shape), decode each with ImageIO, average.
    * features = [nFrames, width, height, meanR, meanG, meanB] over the
    * sampled frames.
    */
  def decodeVideo(bytes: Array[Byte], sampleFrames: Int = 3): Array[Float] = {
    val frames = parseConcatPng(bytes)
    val nFrames = frames.length
    val k = math.min(sampleFrames, nFrames)
    val picks =
      if (k == 1) Array(0)
      else Array.tabulate(k)(i => (i.toLong * (nFrames - 1) / (k - 1)).toInt)
    var w = 0f; var h = 0f; var r = 0f; var g = 0f; var b = 0f
    picks.foreach { p =>
      val feat = decodeImage(frames(p))
      w = feat(0); h = feat(1)
      r += feat(3); g += feat(4); b += feat(5)
    }
    Array(nFrames.toFloat, w, h, r / k, g / k, b / k)
  }

  /** Demux of the concat-PNG container: 4-byte BE frame count, then
    * per frame a 4-byte BE length + PNG bytes (see
    * [[synthVideoConcatPng]]). Shared by [[decodeVideo]] and
    * [[videoFrameEmbedding]]. */
  private def parseConcatPng(bytes: Array[Byte]): Array[Array[Byte]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val nFrames = in.readInt()
    require(nFrames > 0, "empty video container")
    Array.fill(nFrames) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    }
  }

  /** Modality dispatch — the single per-row decode entry point. */
  def decode(modality: String, content: Array[Byte]): Array[Float] =
    modality match {
      case "image" => decodeImage(content)
      case "audio" => decodeAudio(content)
      case "video" => decodeVideo(content)
      case other =>
        throw new IllegalArgumentException(s"unknown modality: $other")
    }

  /** Partition-local feature extraction: the Scala analogue of a Pandas
    * UDF over mapInPandas — batches stay inside the executor, one
    * iterator pass, no row-at-a-time UDF overhead, no driver collect.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.modality, r.n_bytes,
          decode(r.modality, r.content))
      }
    }
  }

  final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

  /** Decode-side visual embedding: the nearest-neighbor luminance
    * [[thumbnail]] flattened row-major into a `tw·th`-float vector —
    * the composition point between the multimodal family and the
    * similarity-search family: its output is a plain
    * (id, array&lt;float&gt;) frame that [[Extensions.annIvf]] /
    * [[IvfIndex]] consume unchanged (the catalog's `image_similarity`
    * entry). Deterministic (lossless PNG + integer resize), and the
    * decode stays partition-local — payload bytes never leave the
    * executor, only the small embedding rides the exchange, which at
    * 100 TB of media is the whole game: the ANN index is built over
    * tw·th floats per image, not the image bytes.
    */
  def imageEmbeddings(media: Dataset[MediaRow], tw: Int = 8,
      th: Int = 8): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").mapPartitions { rows =>
      rows.map(r => MediaEmbedding(r.media_id, thumbnail(r.content, tw, th)))
    }
  }

  /** Normalized mono samples of a 16-bit PCM WAV payload (the decode
    * half of [[decodeAudio]], factored for feature extractors that
    * need the waveform itself). */
  private def pcmSamples(bytes: Array[Byte]): (Array[Double], Float) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
      // mono only: a stereo stream read as one interleaved sequence
      // would double the effective sample rate under the Goertzel
      // time index — silently wrong band energies (review finding);
      // fold or reject upstream
      require(fmt.getChannels == 1,
        s"expected mono PCM, got ${fmt.getChannels} channels")
      val data = ais.readAllBytes()
      val n = data.length / 2
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        val s =
          if (fmt.isBigEndian) (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
          else (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
        x(i) = s / 32768.0
        i += 1
      }
      (x, fmt.getSampleRate)
    } finally ais.close()
  }

  /** Bounded spectral embedding of a WAV payload: `nBands` Goertzel
    * DFT magnitudes at FIXED physical frequencies (200..200+100·nBands
    * Hz — length-invariant band energies, the audio analogue of the
    * [[thumbnail]] histogram) concatenated with `nSeg` per-segment RMS
    * values (the temporal envelope). O(n·nBands) per row, StrictMath
    * only (bit-exact across JVMs), no FFT library.
    */
  def audioBandEnergy(bytes: Array[Byte], nBands: Int = 8,
      nSeg: Int = 8): Array[Float] = {
    require(nBands >= 1 && nSeg >= 1, "need nBands >= 1 and nSeg >= 1")
    val (x, rate) = pcmSamples(bytes)
    val n = x.length
    val out = new Array[Float](nBands + nSeg)
    var b = 0
    while (b < nBands) {
      // Goertzel at f_b: |Σ x_k e^{-2πi f_b k / rate}| · 2/n
      val w = 2.0 * StrictMath.PI * (200.0 + 100.0 * b) / rate
      var re = 0.0; var im = 0.0; var k = 0
      while (k < n) {
        re += x(k) * StrictMath.cos(w * k)
        im -= x(k) * StrictMath.sin(w * k)
        k += 1
      }
      out(b) =
        if (n == 0) 0f
        else (2.0 * StrictMath.sqrt(re * re + im * im) / n).toFloat
      b += 1
    }
    var s = 0
    while (s < nSeg) {
      val lo = (s.toLong * n / nSeg).toInt
      val hi = ((s + 1).toLong * n / nSeg).toInt
      var sumSq = 0.0; var k = lo
      while (k < hi) { sumSq += x(k) * x(k); k += 1 }
      out(nBands + s) =
        if (hi == lo) 0f else StrictMath.sqrt(sumSq / (hi - lo)).toFloat
      s += 1
    }
    out
  }

  /** Decode-side audio embedding — the audio leg of the multimodal →
    * similarity-search composition point ([[imageEmbeddings]]'s
    * contract): (media_id, array&lt;float&gt;) rows that
    * [[Extensions.annIvf]] / [[IvfIndex]] consume unchanged (the
    * catalog's `audio_similarity` entry). Decode and feature
    * extraction stay partition-local — only the nBands+nSeg floats
    * ride the exchange, never the waveform bytes.
    */
  def audioEmbeddings(media: Dataset[MediaRow], nBands: Int = 8,
      nSeg: Int = 8): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "audio").mapPartitions { rows =>
      rows.map(r =>
        MediaEmbedding(r.media_id, audioBandEnergy(r.content, nBands, nSeg)))
    }
  }

  /** Frame-sampled visual embedding of a concat-PNG video payload —
    * the video leg of the multimodal → similarity-search composition
    * point (VERDICT r13 #4), closing the triad: demux, sample up to
    * `sampleFrames` DISTINCT frames (first/evenly-spaced/last,
    * [[decodeVideo]]'s rule), take each sampled frame's tw×th
    * luminance [[thumbnail]] (the image precedent), and pool
    * temporally — per-cell MEAN (the static composition a mean frame
    * would show) concatenated with per-cell MAX (transient bright
    * frames a mean would wash out) → 2·tw·th floats. Deterministic
    * (lossless PNG, integer resize, fixed sampling rule); duplicate
    * sample indices (short clips where the spacing rule lands twice
    * on one frame) are deduped so the mean never double-weights a
    * frame. O(sampleFrames · frame-decode) per row regardless of clip
    * length — the bounded-work property that survives hour-long clips.
    */
  def videoFrameEmbedding(bytes: Array[Byte], tw: Int = 8, th: Int = 8,
      sampleFrames: Int = 3): Array[Float] = {
    require(sampleFrames >= 1, "need sampleFrames >= 1")
    val frames = parseConcatPng(bytes)
    val n = frames.length
    val k = math.min(sampleFrames, n)
    val picks = (
      if (k == 1) Array(0)
      else Array.tabulate(k)(i => (i.toLong * (n - 1) / (k - 1)).toInt)
    ).distinct
    val d = tw * th
    val out = new Array[Float](2 * d)
    val meanAcc = new Array[Double](d)
    picks.foreach { p =>
      val t = thumbnail(frames(p), tw, th)
      var i = 0
      while (i < d) {
        meanAcc(i) += t(i)
        if (t(i) > out(d + i)) out(d + i) = t(i)
        i += 1
      }
    }
    var i = 0
    while (i < d) {
      out(i) = (meanAcc(i) / picks.length).toFloat
      i += 1
    }
    out
  }

  /** Decode-side video embedding — (media_id, array&lt;float&gt;) rows
    * that [[Extensions.annIvf]] / [[IvfIndex]] consume unchanged (the
    * catalog's `video_similarity` entry), mirroring
    * [[imageEmbeddings]] / [[audioEmbeddings]]: demux, frame
    * sampling, and pooling stay partition-local — only the 2·tw·th
    * floats ride the exchange, never the video bytes, which at 100 TB
    * of media is the whole game.
    */
  def videoEmbeddings(media: Dataset[MediaRow], tw: Int = 8,
      th: Int = 8, sampleFrames: Int = 3): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").mapPartitions { rows =>
      rows.map(r => MediaEmbedding(r.media_id,
        videoFrameEmbedding(r.content, tw, th, sampleFrames)))
    }
  }

  /** Size-aware repartitioning: media payloads are orders of magnitude
    * wider than relational rows, so partition count follows total bytes
    * (~targetBytes per partition), not row count. At 100 TB this is the
    * difference between bounded executor memory and OOM.
    */
  def repartitionBySize(media: DataFrame, totalBytes: Long,
      targetBytes: Long = 128L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts, col("media_id"))
  }
}
