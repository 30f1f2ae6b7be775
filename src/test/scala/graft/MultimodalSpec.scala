package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Multimodal, Tables}

/** Multimodal: REAL JDK decode (javax.imageio / javax.sound.sampled)
  * over synthesized real media bytes — exact-value pins on known
  * payloads, end-to-end determinism, partition shaping.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  lazy val media = Multimodal.synthesizeMedia(
    Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id")

  test("media table carries real binary payloads + typed metadata") {
    val df = media.toDF()
    val schema = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("content") == "binary")
    assert(schema("n_bytes") == "bigint")
    assert(df.count() == 500)
    val modalities = df.select("modality").distinct().as[String].collect().toSet
    assert(modalities == Set("image", "audio", "video"))
    // real containers: PNG magic / RIFF..WAVE header / frame-count prefix
    val byMod = df.select("modality", "content")
      .as[(String, Array[Byte])].collect().groupBy(_._1)
    val png = byMod("image").head._2
    assert(png.slice(1, 4).map(_.toChar).mkString == "PNG")
    val wav = byMod("audio").head._2
    assert(wav.slice(0, 4).map(_.toChar).mkString == "RIFF")
    assert(wav.slice(8, 12).map(_.toChar).mkString == "WAVE")
  }

  test("image decode recovers exact dimensions and channel means") {
    // 2x1 image: pure red + pure blue → meanR = meanB = 127.5, meanG = 0
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x0000ff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val f = Multimodal.decodeImage(bos.toByteArray)
    assert(f.toSeq == Seq(2f, 1f, 3f, 127.5f, 0f, 127.5f))
  }

  test("png round-trip: synthesized image decodes to its own pixel means") {
    val bytes = Multimodal.synthImagePng(seed = 7L, w = 4, h = 3)
    val f = Multimodal.decodeImage(bytes)
    assert(f(0) == 4f && f(1) == 3f && f(2) == 3f)
    // lossless codec: re-encoding the decoded image yields identical features
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    assert(Multimodal.decodeImage(bos.toByteArray).toSeq == f.toSeq)
  }

  test("audio decode: square wave has exact rms and peak") {
    // hand-build 16-bit mono little-endian PCM square wave at ±16384
    val n = 100
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val f = Multimodal.decodeAudio(bos.toByteArray)
    // [sampleRate, channels, frames, durationSec, rms, peak]
    assert(f(0) == 8000f && f(1) == 1f && f(2) == 100f)
    assert(f(3) == 100f / 8000f)
    assert(f(4) == 0.5f && f(5) == 0.5f) // |±16384|/32768 exactly
  }

  test("synthesized wav decodes with matching frame count and sane rms") {
    val bytes = Multimodal.synthAudioWav(seed = 1L, nSamples = 400)
    val f = Multimodal.decodeAudio(bytes)
    assert(f(2) == 400f)
    // a full-ish-scale sine has rms near amplitude/sqrt(2) = 0.3536
    assert(f(4) > 0.3f && f(4) < 0.4f)
    assert(f(5) <= 0.5f && f(5) > 0.45f)
  }

  test("video decode: frame sampling averages first/mid/last frames") {
    // 3 solid frames: red, green, blue → sampled all 3, means = 85 each
    def solid(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      (0 until 2).foreach(x => (0 until 2).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val frames = Seq(solid(0xff0000), solid(0x00ff00), solid(0x0000ff))
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(3)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    val feat = Multimodal.decodeVideo(bos.toByteArray, sampleFrames = 3)
    assert(feat(0) == 3f && feat(1) == 2f && feat(2) == 2f)
    assert(feat(3) == 85f && feat(4) == 85f && feat(5) == 85f)
  }

  test("feature extraction is deterministic end-to-end") {
    val a = Multimodal.extractFeatures(media).orderBy("media_id")
      .select("features").as[Array[Float]].collect()
    val b = Multimodal.extractFeatures(media).orderBy("media_id")
      .select("features").as[Array[Float]].collect()
    assert(a.length == 500)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall(f => f.length == 6 && f.forall(x => !x.isNaN)))
  }

  test("thumbnail resize is exact on a solid image") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(x => (0 until 8).foreach(y => img.setRGB(x, y, 0x303030)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val t = Multimodal.thumbnail(bos.toByteArray, 2, 2)
    assert(t.length == 4 && t.forall(_ == 0x30.toFloat))
  }

  test("size-aware repartitioning follows bytes not rows") {
    val out = Multimodal.repartitionBySize(media.toDF(),
      totalBytes = 10L << 20, targetBytes = 1L << 20)
    assert(out.rdd.getNumPartitions == 10)
  }

  test("imageEmbeddings: image rows only, tw*th luminance floats in " +
      "0..255, equal to the direct thumbnail decode, deterministic " +
      "across partitionings") {
    val emb = Multimodal.imageEmbeddings(media, tw = 8, th = 8)
      .collect().sortBy(_.media_id)
    val imageIds = media.collect().filter(_.modality == "image")
      .map(_.media_id).sorted.toSeq
    assert(emb.map(_.media_id).toSeq == imageIds && emb.nonEmpty)
    assert(emb.forall(_.embedding.length == 64))
    assert(emb.forall(_.embedding.forall(v => v >= 0f && v <= 255f)))
    // equals the driver-side decode of the same payload
    val byId = media.collect().map(r => r.media_id -> r.content).toMap
    emb.take(3).foreach { e =>
      assert(e.embedding.toSeq ==
        Multimodal.thumbnail(byId(e.media_id), 8, 8).toSeq)
    }
    val again = Multimodal.imageEmbeddings(
        media.repartition(7), tw = 8, th = 8)
      .collect().sortBy(_.media_id)
    assert(again.map(_.embedding.toSeq).toSeq ==
      emb.map(_.embedding.toSeq).toSeq)
  }

  test("image_similarity: the decoded-thumbnail IVF search with " +
      "exhaustive probes equals brute-force cosine top-k over the same " +
      "embeddings, and ranks with the bounded heap, not a window sort") {
    val out = SparkEntry.queries("image_similarity")(spark,
      "/root/testdata/sf0.001")
    out.collect()
    // bounded-heap rank (TopKPairs objects), never a per-query window
    // sort over the scored candidates
    val plan = (out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("topkpairs"), s"no bounded-heap rank in:\n$plan")
    // exhaustive probes = exact: equals brute-force cosineTopK over the
    // identical decoded embeddings
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Multimodal.imageEmbeddings(
      Multimodal.synthesizeMedia(docs, "doc_id")).toDF()
    val brute = graft.engine.Extensions.cosineTopK(emb, "embedding",
      "media_id", queryIds = Seq(0L, 3L, 6L), k = 10)
    def s(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(s(out) == s(brute) && s(out).nonEmpty)
  }

  test("audioEmbeddings: audio rows only, nBands+nSeg floats, " +
      "deterministic across partitionings, and the band energies " +
      "discriminate by frequency (same-pitch pair beats cross-pitch)") {
    val emb = Multimodal.audioEmbeddings(media)
      .collect().sortBy(_.media_id)
    val audioIds = media.collect().filter(_.modality == "audio")
      .map(_.media_id).sorted.toSeq
    assert(emb.map(_.media_id).toSeq == audioIds && emb.nonEmpty)
    assert(emb.forall(_.embedding.length == 16))
    val again = Multimodal.audioEmbeddings(media.repartition(7))
      .collect().sortBy(_.media_id)
    assert(again.map(_.embedding.toSeq).toSeq ==
      emb.map(_.embedding.toSeq).toSeq)
    // synthAudioWav pitches by id mod 32: ids 1 and 97 share a
    // frequency (different lengths), id 16 does not — the spectral
    // half must rank the same-pitch pair above the cross-pitch pair
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val byId = emb.map(e => e.media_id -> e.embedding).toMap
    assert(cos(byId(1L), byId(97L)) > cos(byId(1L), byId(16L)),
      s"same-pitch ${cos(byId(1L), byId(97L))} vs " +
        s"cross-pitch ${cos(byId(1L), byId(16L))}")
  }

  test("audio_similarity: the band-energy IVF search with exhaustive " +
      "probes equals brute-force cosine top-k over the same " +
      "embeddings, ranks with the bounded heap, and the top " +
      "neighbor shares the query's pitch") {
    val out = SparkEntry.queries("audio_similarity")(spark,
      "/root/testdata/sf0.001")
    out.collect()
    val plan = (out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("topkpairs"), s"no bounded-heap rank in:\n$plan")
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Multimodal.audioEmbeddings(
      Multimodal.synthesizeMedia(docs, "doc_id")).toDF()
    val brute = graft.engine.Extensions.cosineTopK(emb, "embedding",
      "media_id", queryIds = Seq(1L, 4L, 7L), k = 10)
    def s(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(s(out) == s(brute) && s(out).nonEmpty)
    // nearest neighbor of each query is an audio at the SAME pitch
    // (synth pitch = 200 + (id mod 32)·25)
    out.filter(org.apache.spark.sql.functions.col("rank") === 1)
      .select("query_id", "neighbor_id").collect().foreach { r =>
        assert(r.getLong(0) % 32 == r.getLong(1) % 32,
          s"top neighbor of ${r.getLong(0)} was ${r.getLong(1)}")
      }
  }

  test("videoFrameEmbedding: mean++max pooling over the sampled " +
      "frames is exact on solid-color frames, and short clips dedupe " +
      "duplicate sample indices") {
    def solid(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      (0 until 2).foreach(x => (0 until 2).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 3 solid luminance levels 0x10/0x40/0x70 → per-cell mean = 0x40,
    // per-cell max = 0x70, at every thumbnail cell
    val frames = Seq(solid(0x101010), solid(0x404040), solid(0x707070))
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(3)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    val e = Multimodal.videoFrameEmbedding(bos.toByteArray, tw = 2, th = 2,
      sampleFrames = 3)
    assert(e.length == 8)
    assert(e.slice(0, 4).forall(_ == 0x40.toFloat), e.toSeq.toString)
    assert(e.slice(4, 8).forall(_ == 0x70.toFloat), e.toSeq.toString)
    // 2-frame clip, 3 sample slots: the spacing rule lands on frame 0
    // twice — the dedupe means frame 0 is NOT double-weighted
    val bos2 = new ByteArrayOutputStream()
    val out2 = new java.io.DataOutputStream(bos2)
    out2.writeInt(2)
    Seq(solid(0x101010), solid(0x303030)).foreach { f =>
      out2.writeInt(f.length); out2.write(f)
    }
    val e2 = Multimodal.videoFrameEmbedding(bos2.toByteArray, tw = 2,
      th = 2, sampleFrames = 3)
    assert(e2.slice(0, 4).forall(_ == 0x20.toFloat), e2.toSeq.toString)
    assert(e2.slice(4, 8).forall(_ == 0x30.toFloat), e2.toSeq.toString)
  }

  test("videoEmbeddings: video rows only, 2*tw*th floats in 0..255, " +
      "equal to the driver-side embedding of the same payload, " +
      "deterministic across partitionings") {
    val emb = Multimodal.videoEmbeddings(media)
      .collect().sortBy(_.media_id)
    val videoIds = media.collect().filter(_.modality == "video")
      .map(_.media_id).sorted.toSeq
    assert(emb.map(_.media_id).toSeq == videoIds && emb.nonEmpty)
    assert(emb.forall(_.embedding.length == 128))
    assert(emb.forall(_.embedding.forall(v => v >= 0f && v <= 255f)))
    val byId = media.collect().map(r => r.media_id -> r.content).toMap
    emb.take(3).foreach { e =>
      assert(e.embedding.toSeq ==
        Multimodal.videoFrameEmbedding(byId(e.media_id), 8, 8, 3).toSeq)
    }
    val again = Multimodal.videoEmbeddings(media.repartition(7))
      .collect().sortBy(_.media_id)
    assert(again.map(_.embedding.toSeq).toSeq ==
      emb.map(_.embedding.toSeq).toSeq)
  }

  test("video_similarity: the frame-sampled pooled-thumbnail IVF " +
      "search with exhaustive probes equals brute-force cosine top-k " +
      "over the same embeddings, and ranks with the bounded heap, " +
      "not a window sort") {
    val out = SparkEntry.queries("video_similarity")(spark,
      "/root/testdata/sf0.001")
    out.collect()
    val plan = (out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("topkpairs"), s"no bounded-heap rank in:\n$plan")
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Multimodal.videoEmbeddings(
      Multimodal.synthesizeMedia(docs, "doc_id")).toDF()
    val brute = graft.engine.Extensions.cosineTopK(emb, "embedding",
      "media_id", queryIds = Seq(2L, 5L, 8L), k = 10)
    def s(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(s(out) == s(brute) && s(out).nonEmpty)
  }
}
