package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Extensions, SemanticStore}

/** SemanticStore: incremental semantic dedup against a persisted
  * pair/vector store — the equivalence law (incremental ≡ batch on
  * the union), replay safety, and the store lifecycle.
  */
class SemanticStoreSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Known cosine geometry (4-dim): a—b and b—c are pairs at cos 0.9,
  // a—c is NOT a pair (cos 0.62) — a transitive chain that CROSSES the
  // snapshot boundary (the case a survivor-only store gets wrong);
  // d—e a cross-snapshot pair; f a singleton; z a zero-norm row.
  private val s = math.sqrt(1 - 0.81).toFloat // 0.43589
  private val c2 = (2 * 0.9 * 0.9 - 1).toFloat // cos(2θ) = 0.62
  private val s2v = (2 * 0.9 * s).toFloat // sin(2θ)
  private def fixture = {
    val emb = Map(
      1L -> Array(1f, 0f, 0f, 0f), // a   (snapshot 1)
      2L -> Array(0.9f, s, 0f, 0f), // b  (snapshot 1)
      3L -> Array(0f, 0f, 1f, 0f), // d   (snapshot 1)
      4L -> Array(0f, 0f, 0f, 0f), // z   (snapshot 1, zero-norm)
      5L -> Array(c2, s2v, 0f, 0f), // c  (snapshot 2): near b, not a
      6L -> Array(0f, 0f, 0.95f, 0.312f), // e (snapshot 2): near d
      7L -> Array(0f, 1f, 0f, 0f)) // f   (snapshot 2): singleton
    // (cos(f,b)=0.436, cos(f,c)=0.785 — both below the 0.8 threshold)
    val quality = Map(1L -> 10L, 2L -> 20L, 3L -> 5L, 4L -> 1L,
      5L -> 30L, 6L -> 50L, 7L -> 2L)
    val docs = quality.toSeq.toDF("doc_id", "q")
    val embDf = emb.toSeq.toDF("doc_id", "embedding")
    (docs, embDf)
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "component", "q", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet

  test("two-snapshot ingest equals the batch semanticDedup on the " +
      "union, including a transitive chain that crosses the snapshot " +
      "boundary; a third snapshot that bridges two components still " +
      "matches the batch run") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-spec").toString
    val s1d = docs.filter(col("doc_id") <= 4)
    val s1e = emb.filter(col("doc_id") <= 4)
    val s2d = docs.filter(col("doc_id") > 4)
    val s2e = emb.filter(col("doc_id") > 4)
    val out1 = collect(SemanticStore.ingest(s"$dir/store", s1d, s1e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1"))
    val batch1 = collect(Extensions.semanticDedup(s1d, s1e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(out1 == batch1)
    val out2 = collect(SemanticStore.ingest(s"$dir/store", s2d, s2e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2"))
    val batch2 = collect(Extensions.semanticDedup(docs, emb,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(out2 == batch2, s"incremental $out2 vs batch $batch2")
    // the boundary-crossing chain really merged: 1, 2, 5 share a
    // component and the best-quality member (5, q=30) is the keeper
    val comp1 = out2.find(_._1 == 1L).get._2
    assert(out2.find(_._1 == 2L).get._2 == comp1)
    assert(out2.find(_._1 == 5L).get._2 == comp1)
    assert(out2.filter(_._2 == comp1).filter(_._4 == 1).map(_._1) ==
      Set(5L))
    // zero-norm row is a kept singleton
    val z = out2.find(_._1 == 4L).get
    assert(z._2 == 4L && z._4 == 1)
    // a third snapshot bridging components 1-2-5 and 3-6 (a vector
    // between b and e directions can't exist in this geometry — use
    // one near d instead, extending that component)
    val s3d = Seq((8L, 100L)).toDF("doc_id", "q")
    val s3e = Seq((8L, Array(0f, 0f, 0.98f, -0.198f)))
      .toDF("doc_id", "embedding")
    val out3 = collect(SemanticStore.ingest(s"$dir/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    val batch3 = collect(Extensions.semanticDedup(
      docs.union(s3d), emb.union(s3e),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(out3 == batch3, s"incremental $out3 vs batch $batch3")
    assert(out3.find(_._1 == 8L).get._2 ==
      out3.find(_._1 == 3L).get._2)
  }

  test("replaying a committed epoch name is a no-op: output, committed " +
      "epochs, and the accumulated pair store are unchanged") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-replay").toString
    val s1d = docs.filter(col("doc_id") <= 4)
    val s1e = emb.filter(col("doc_id") <= 4)
    val s2d = docs.filter(col("doc_id") > 4)
    val s2e = emb.filter(col("doc_id") > 4)
    SemanticStore.ingest(s"$dir/store", s1d, s1e, "doc_id", "q",
      "embedding", minCosine = 0.8, nCells = 4, epochName = "s1")
    val out2 = collect(SemanticStore.ingest(s"$dir/store", s2d, s2e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2"))
    val epochs = SemanticStore.committedEpochs(spark, s"$dir/store")
    assert(epochs == Seq("s1", "s2"))
    val pairsBefore = spark.read
      .parquet(s"$dir/store/pairs/s1", s"$dir/store/pairs/s2")
      .as[(Long, Long, Double)].collect().toSet
    // redeliver snapshot 2 (same epoch name, checkpoint-replay shape)
    val replay = collect(SemanticStore.ingest(s"$dir/store", s2d, s2e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2"))
    assert(replay == out2)
    assert(SemanticStore.committedEpochs(spark, s"$dir/store") == epochs)
    val pairsAfter = spark.read
      .parquet(s"$dir/store/pairs/s1", s"$dir/store/pairs/s2")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairsAfter == pairsBefore)
    // snapshot() without ingesting reproduces the same state
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == out2)
  }

  test("a torn commit window stays invisible: an IVF epoch claimed " +
      "without the store marker is NOT scanned as stored, so later " +
      "snapshots keep the committed-union equivalence and write no " +
      "phantom edges; the torn snapshot's retry then completes") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-torn").toString
    val s1d = docs.filter(col("doc_id") <= 4)
    val s1e = emb.filter(col("doc_id") <= 4)
    SemanticStore.ingest(s"$dir/store", s1d, s1e, "doc_id", "q",
      "embedding", minCosine = 0.8, nCells = 4, epochName = "s1")
    // simulate a crash between appendEpoch's _claim and the store
    // marker: s2's VECTORS land as a claimed IVF epoch, but the
    // snapshot never committed (no pairs/meta/_epochs entry)
    val s2e = emb.filter(col("doc_id") === 5L) // c — near b (cos 0.9)
    graft.engine.IvfIndex.appendEpoch(spark, s"$dir/store/ivf",
      s2e, "embedding", "doc_id", "s2")
    assert(SemanticStore.committedEpochs(spark, s"$dir/store") ==
      Seq("s1"))
    // a different later snapshot must see ONLY committed vectors: its
    // state equals the batch run on s1 ∪ s3, and its pair file carries
    // no edge touching the uncommitted id 5
    val s3d = docs.filter(col("doc_id") === 7L)
    val s3e = emb.filter(col("doc_id") === 7L)
    val out3 = collect(SemanticStore.ingest(s"$dir/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    val batch13 = collect(Extensions.semanticDedup(
      docs.filter(col("doc_id") <= 4 || col("doc_id") === 7L),
      emb.filter(col("doc_id") <= 4 || col("doc_id") === 7L),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(out3 == batch13, s"got $out3 expected $batch13")
    val s3pairs = spark.read.parquet(s"$dir/store/pairs/s3")
      .as[(Long, Long, Double)].collect()
    assert(!s3pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // the torn snapshot retries under its original name: appendEpoch
    // refuses the already-claimed epoch, the marker lands, and the
    // final state equals the batch run on all three snapshots —
    // including the batch-internal-pair-once invariant
    val s2d = docs.filter(col("doc_id") === 5L)
    val out2 = collect(SemanticStore.ingest(s"$dir/store", s2d, s2e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2"))
    val batchAll = collect(Extensions.semanticDedup(
      docs.filter(col("doc_id") =!= 6L), emb.filter(col("doc_id") =!= 6L),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(out2 == batchAll, s"got $out2 expected $batchAll")
    val allPairs = spark.read.parquet(s"$dir/store/pairs/s1",
        s"$dir/store/pairs/s2", s"$dir/store/pairs/s3")
      .as[(Long, Long, Double)].collect().toSeq
    assert(allPairs.distinct.size == allPairs.size,
      s"duplicate pair rows: $allPairs")
  }

  test("an empty FIRST snapshot is a committing-nothing no-op (the " +
      "streaming empty-batch-0 case) and the next non-empty snapshot " +
      "becomes the base") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-empty").toString
    val none = docs.filter(col("doc_id") < 0)
    val out0 = SemanticStore.ingest(s"$dir/store", none,
      emb.filter(col("doc_id") < 0), "doc_id", "q", "embedding",
      minCosine = 0.8, nCells = 4, epochName = "b0")
    assert(out0.count() == 0L)
    assert(out0.columns.toSeq ==
      Seq("doc_id", "component", "q", "keep"))
    assert(SemanticStore.committedEpochs(spark, s"$dir/store").isEmpty)
    val out1 = collect(SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "b1"))
    assert(out1 == collect(Extensions.semanticDedup(
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
    assert(SemanticStore.committedEpochs(spark, s"$dir/store") ==
      Seq("b1"))
  }

  test("an empty LATER snapshot commits (empty pairs/meta/radii, NO " +
      "IVF epoch) and the store stays ingestable — the zero-row " +
      "dynamic-partitioned cells dir would otherwise wedge every " +
      "subsequent stored-side read on schema inference") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-emptylater").toString
    val none = docs.filter(col("doc_id") < 0)
    val noneE = emb.filter(col("doc_id") < 0)
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1")
    // the empty snapshot commits and returns the unchanged state
    val outE = collect(SemanticStore.ingest(s"$dir/store", none, noneE,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2"))
    assert(SemanticStore.committedEpochs(spark, s"$dir/store") ==
      Seq("s1", "s2"))
    assert(outE == collect(Extensions.semanticDedup(
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
    // no IVF epoch landed for the empty snapshot
    assert(!new java.io.File(s"$dir/store/ivf/epochs/s2").exists())
    // the replay of the empty name is still a no-op
    assert(collect(SemanticStore.ingest(s"$dir/store", none, noneE,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2")) == outE)
    // and a later NON-empty ingest (which reads the stored side) works
    val out3 = collect(SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    assert(out3 == collect(Extensions.semanticDedup(docs, emb,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
  }

  test("compact folds committed snapshots into one epoch: snapshot() " +
      "equal before/after, ingest-after-compaction equals the " +
      "uncompacted store, folded-name replay is a no-op, and the raw " +
      "IvfIndex.compactEpochs refuses the inner index") {
    val (docs, emb) = fixture
    val dirC = java.nio.file.Files
      .createTempDirectory("graft-semstore-compact").toString
    val dirU = java.nio.file.Files
      .createTempDirectory("graft-semstore-uncompact").toString
    for (dir <- Seq(dirC, dirU)) {
      SemanticStore.ingest(s"$dir/store",
        docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
        epochName = "s1")
      SemanticStore.ingest(s"$dir/store",
        docs.filter(col("doc_id").isin(5L, 6L)),
        emb.filter(col("doc_id").isin(5L, 6L)),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
        epochName = "s2")
    }
    val before = collect(SemanticStore.snapshot(spark, s"$dirC/store",
      "doc_id", "q"))
    // the sentinel blocks the store-UNAWARE fold
    val err = intercept[IllegalArgumentException] {
      graft.engine.IvfIndex.compactEpochs(spark, s"$dirC/store/ivf")
    }
    assert(err.getMessage.contains("SemanticStore"))
    assert(SemanticStore.compact(spark, s"$dirC/store"))
    val committed = SemanticStore.committedEpochs(spark, s"$dirC/store")
    assert(committed == Seq("compact-1"))
    assert(collect(SemanticStore.snapshot(spark, s"$dirC/store",
      "doc_id", "q")) == before)
    // the folded per-epoch dirs and the inner IVF epoch dirs are gone
    for (e <- Seq("s1", "s2"); d <- Seq("pairs", "meta", "radii"))
      assert(!new java.io.File(s"$dirC/store/$d/$e").exists(), s"$d/$e")
    assert(!new java.io.File(s"$dirC/store/ivf/epochs/s2").exists())
    // replaying a FOLDED name is a no-op
    assert(collect(SemanticStore.ingest(s"$dirC/store",
      docs.filter(col("doc_id").isin(5L, 6L)),
      emb.filter(col("doc_id").isin(5L, 6L)),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2")) == before)
    // ingest after compaction ≡ the same ingest on the uncompacted twin
    val s3d = docs.filter(col("doc_id") === 7L)
    val s3e = emb.filter(col("doc_id") === 7L)
    val outC = collect(SemanticStore.ingest(s"$dirC/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    val outU = collect(SemanticStore.ingest(s"$dirU/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    assert(outC == outU)
    assert(outC == collect(Extensions.semanticDedup(docs, emb,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
    // a second compaction carries the folded set forward
    assert(SemanticStore.compact(spark, s"$dirC/store"))
    assert(SemanticStore.committedEpochs(spark, s"$dirC/store") ==
      Seq("compact-2"))
    assert(collect(SemanticStore.snapshot(spark, s"$dirC/store",
      "doc_id", "q")) == outC)
    // nothing left to fold
    assert(!SemanticStore.compact(spark, s"$dirC/store"))
  }

  test("a crash inside the compaction window (staged dirs, no marker) " +
      "leaves the store unchanged and a re-run heals") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-compact-torn").toString
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1")
    val out2 = collect(SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2"))
    // simulate the crash: the IVF fold committed (its own generation
    // flip) and the consolidated dirs staged, but the store marker
    // never landed
    graft.engine.IvfIndex.compactEpochsNamed(spark, s"$dir/store/ivf",
      Set("s1", "s2"))
    spark.read.parquet(s"$dir/store/pairs/s1", s"$dir/store/pairs/s2")
      .write.mode("overwrite").parquet(s"$dir/store/pairs/compact-1")
    // the store still reads the per-epoch state: unchanged
    assert(SemanticStore.committedEpochs(spark, s"$dir/store") ==
      Seq("s1", "s2"))
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == out2)
    // the re-run completes the fold and the state is still equal
    assert(SemanticStore.compact(spark, s"$dir/store"))
    assert(SemanticStore.committedEpochs(spark, s"$dir/store") ==
      Seq("compact-1"))
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == out2)
  }

  test("accumulated pairs are exactly the batch pair set on the union " +
      "(each unordered pair once, id_a < id_b, rounded scores equal)") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-pairs").toString
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1")
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2")
    val got = spark.read
      .parquet(s"$dir/store/pairs/s1", s"$dir/store/pairs/s2")
      .as[(Long, Long, Double)].collect().toSet
    val expect = Extensions.cosineNearDups(
        emb.join(docs.select("doc_id"), "doc_id"), "embedding",
        "doc_id", minCosine = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expect, s"got $got expected $expect")
  }

  test("REFIT compaction (the default): the quantizer retrains from " +
      "the accumulated corpus and flips with the IVF generation, radii " +
      "re-key to the new cells and carry the version stamp, and every " +
      "compact law still holds — snapshot equality, ingest-after " +
      "equality vs the non-refit twin AND the batch run") {
    val (docs, emb) = fixture
    val dirR = java.nio.file.Files
      .createTempDirectory("graft-semstore-refit").toString
    val dirN = java.nio.file.Files
      .createTempDirectory("graft-semstore-norefit").toString
    for (dir <- Seq(dirR, dirN)) {
      SemanticStore.ingest(s"$dir/store",
        docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
        epochName = "s1")
      SemanticStore.ingest(s"$dir/store",
        docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
        epochName = "s2")
    }
    val before = collect(SemanticStore.snapshot(spark, s"$dirR/store",
      "doc_id", "q"))
    val oldQv = graft.engine.IvfIndex.quantizerDigest(
      graft.engine.IvfIndex.readQuantizer(spark, s"$dirR/store/ivf"))
    assert(SemanticStore.compact(spark, s"$dirR/store")) // refit default
    assert(SemanticStore.compact(spark, s"$dirN/store", refit = false))
    // snapshot() is refit-invariant (pairs/meta are data, not derived
    // from cells)
    assert(collect(SemanticStore.snapshot(spark, s"$dirR/store",
      "doc_id", "q")) == before)
    val newQv = graft.engine.IvfIndex.quantizerDigest(
      graft.engine.IvfIndex.readQuantizer(spark, s"$dirR/store/ivf"))
    assert(newQv != oldQv,
      "the refit should retrain the quantizer on the accumulated corpus")
    // the compacted radii are stamped with the NEW quantizer's version
    val stamp = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dirR/store/radii/compact-1/_qv")),
      "UTF-8")
    assert(stamp == newQv)
    // ingest after the refit equals both the non-refit twin and the
    // batch run — the blocking-independence law under a CHANGED
    // quantizer (batch assigns under the new rule, stored cells were
    // rewritten under it, radii re-keyed to it)
    val s3d = Seq((8L, 100L)).toDF("doc_id", "q")
    val s3e = Seq((8L, Array(0f, 0f, 0.98f, -0.198f)))
      .toDF("doc_id", "embedding")
    val outR = collect(SemanticStore.ingest(s"$dirR/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    val outN = collect(SemanticStore.ingest(s"$dirN/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    assert(outR == outN)
    assert(outR == collect(Extensions.semanticDedup(
      docs.union(s3d), emb.union(s3e),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
  }

  test("torn REFIT window (IVF generation flipped, store marker never " +
      "written): the stale radii stamps mismatch the live quantizer, " +
      "the next ingest HEALS by recomputing radii from the stored " +
      "cells, and the state stays batch-equivalent; re-running " +
      "compact restores the stamped fast path") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-refit-torn").toString
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1")
    val out2 = collect(SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2"))
    // simulate the crash: ONLY compact's step 1 ran — the inner IVF
    // refit-folded and flipped its generation (new quantizer + re-keyed
    // cells live), but pairs/meta/radii were never consolidated and the
    // store marker never landed
    graft.engine.IvfIndex.compactEpochsNamed(spark, s"$dir/store/ivf",
      Set("s1", "s2"), refit = true)
    assert(SemanticStore.committedEpochs(spark, s"$dir/store") ==
      Seq("s1", "s2"))
    // the per-epoch radii now carry stamps from the OLD quantizer —
    // the next ingest must take the heal path and still be exact
    val s3d = docs.filter(col("doc_id") === 7L)
    val s3e = emb.filter(col("doc_id") === 7L)
    val out3 = collect(SemanticStore.ingest(s"$dir/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    assert(out3 == collect(Extensions.semanticDedup(docs, emb,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
    // snapshot() never looked at radii: unchanged through the window
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == out3)
    // the re-run completes the fold; the consolidated radii are
    // recomputed from the (already-refit) base and stamped with the
    // LIVE version — the fast path is back
    assert(SemanticStore.compact(spark, s"$dir/store"))
    val qv = graft.engine.IvfIndex.quantizerDigest(
      graft.engine.IvfIndex.readQuantizer(spark, s"$dir/store/ivf"))
    val cName = SemanticStore.committedEpochs(spark, s"$dir/store").head
    val stamp = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/store/radii/$cName/_qv")), "UTF-8")
    assert(stamp == qv)
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == out3)
  }

  test("take-down delete: the ids and every pair touching them leave " +
      "the state (a deleted bridge doc splits its component), a later " +
      "ingest equals a store that NEVER held the ids, compact " +
      "physically removes the rows (file-level), and the applied " +
      "delete state is retired") {
    val (docs, emb) = fixture
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-semstore-del-a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft-semstore-del-b").toString
    // A ingests everything then deletes id 2; B never sees id 2
    for ((dir, pred) <- Seq(
        (dirA, col("doc_id") >= 0L),
        (dirB, col("doc_id") =!= 2L))) {
      SemanticStore.ingest(s"$dir/store",
        docs.filter(col("doc_id") <= 4 && pred),
        emb.filter(col("doc_id") <= 4 && pred),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
        epochName = "s1")
      SemanticStore.ingest(s"$dir/store",
        docs.filter(col("doc_id") > 4 && pred),
        emb.filter(col("doc_id") > 4 && pred),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
        epochName = "s2")
    }
    // a torn delete (staged ids, no marker) is invisible
    import spark.implicits._
    Seq(2L).toDF("__del_id")
      .write.mode("overwrite").parquet(s"$dirA/store/deletes/d1")
    val full = collect(Extensions.semanticDedup(docs, emb,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(collect(SemanticStore.snapshot(spark, s"$dirA/store",
      "doc_id", "q")) == full)
    // the retry commits; id 2 was the BRIDGE of component {1,2,5}:
    // deleting it must split 1 and 5 into separate components
    SemanticStore.delete(s"$dirA/store", Seq(2L).toDF("doc_id"),
      "doc_id", "d1")
    val afterDel = collect(SemanticStore.snapshot(spark, s"$dirA/store",
      "doc_id", "q"))
    val batchNo2 = collect(Extensions.semanticDedup(
      docs.filter(col("doc_id") =!= 2L), emb.filter(col("doc_id") =!= 2L),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(afterDel == batchNo2, s"got $afterDel expected $batchNo2")
    assert(!afterDel.exists(_._1 == 2L))
    assert(afterDel.find(_._1 == 1L).get._2 !=
      afterDel.find(_._1 == 5L).get._2,
      "deleting the bridge doc must split the component")
    // a committed-name replay is a no-op
    SemanticStore.delete(s"$dirA/store", Seq(999L).toDF("doc_id"),
      "doc_id", "d1")
    assert(collect(SemanticStore.snapshot(spark, s"$dirA/store",
      "doc_id", "q")) == afterDel)
    // ingest-after-delete ≡ the same ingest on the never-held twin
    val s3d = Seq((8L, 100L)).toDF("doc_id", "q")
    val s3e = Seq((8L, Array(0f, 0f, 0.98f, -0.198f)))
      .toDF("doc_id", "embedding")
    val outA = collect(SemanticStore.ingest(s"$dirA/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    val outB = collect(SemanticStore.ingest(s"$dirB/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    assert(outA == outB, s"after-delete $outA vs never-held $outB")
    // compact: PHYSICAL removal, file-level asserts on every surface
    assert(SemanticStore.compact(spark, s"$dirA/store"))
    val cName = SemanticStore.committedEpochs(spark, s"$dirA/store").head
    val ivfBase = graft.engine.IvfIndex.baseRoot(s"$dirA/store/ivf")
    assert(spark.read.parquet(s"$ivfBase/cells")
      .filter(col("doc_id") === 2L).count() == 0L,
      "deleted vector survived the compacted IVF generation")
    assert(spark.read.parquet(s"$dirA/store/meta/$cName")
      .filter(col("doc_id") === 2L).count() == 0L)
    assert(spark.read.parquet(s"$dirA/store/pairs/$cName")
      .filter(col("id_a") === 2L || col("id_b") === 2L).count() == 0L)
    // applied delete state retired (store epochs + inner tombstones)
    assert(!new java.io.File(s"$dirA/store/_deletes/d1").exists())
    assert(!new java.io.File(s"$dirA/store/deletes/d1").exists())
    assert(!new java.io.File(s"$dirA/store/ivf/_tombstones").exists() ||
      new java.io.File(s"$dirA/store/ivf/_tombstones").list().isEmpty)
    // and the state is unchanged through the physical fold
    assert(collect(SemanticStore.snapshot(spark, s"$dirA/store",
      "doc_id", "q")) == outA)
    // a FURTHER ingest against the compacted post-delete store still
    // equals the never-held twin's (radii were recomputed from the
    // surviving corpus by the refit)
    val s4d = Seq((9L, 1L)).toDF("doc_id", "q")
    val s4e = Seq((9L, Array(0.95f, 0.312f, 0f, 0f)))
      .toDF("doc_id", "embedding")
    val outA4 = collect(SemanticStore.ingest(s"$dirA/store", s4d, s4e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s4"))
    val outB4 = collect(SemanticStore.ingest(s"$dirB/store", s4d, s4e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s4"))
    assert(outA4 == outB4)
  }

  test("a compact that crashed AFTER mirroring its tombstone but " +
      "before committing must not strand a delete committed in " +
      "between: the retry overwrites the same-generation mirror with " +
      "the GROWN deleted set, so nothing resurrects") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-del-torn").toString
    import spark.implicits._
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1")
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2")
    SemanticStore.delete(s"$dir/store", Seq(2L).toDF("doc_id"),
      "doc_id", "d1")
    // simulate the crash: the compact-1 tombstone mirror landed (only
    // id 2) but the fold/marker never ran
    graft.engine.IvfIndex.delete(spark, s"$dir/store/ivf",
      Seq(2L).toDF("__del_id"), "__del_id", "store-compact-1")
    // a SECOND delete commits between the crash and the retry
    SemanticStore.delete(s"$dir/store", Seq(6L).toDF("doc_id"),
      "doc_id", "d2")
    assert(SemanticStore.compact(spark, s"$dir/store"))
    // both ids are PHYSICALLY gone — the stale single-id mirror was
    // overwritten, not no-op'd
    val ivfBase = graft.engine.IvfIndex.baseRoot(s"$dir/store/ivf")
    assert(spark.read.parquet(s"$ivfBase/cells")
      .filter(col("doc_id").isin(2L, 6L)).count() == 0L,
      "a delete committed inside the torn-compact window resurrected")
    val cName = SemanticStore.committedEpochs(spark, s"$dir/store").head
    assert(spark.read.parquet(s"$dir/store/meta/$cName")
      .filter(col("doc_id").isin(2L, 6L)).count() == 0L)
    // and the state equals the batch run without both ids
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == collect(Extensions.semanticDedup(
      docs.filter(!col("doc_id").isin(2L, 6L)),
      emb.filter(!col("doc_id").isin(2L, 6L)),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
  }

  test("auto-compaction (ingest compactEvery): the live epoch count " +
      "stays bounded by the knob alone and every returned state " +
      "equals the manual twin's — the store polices its own growth " +
      "(VERDICT r16 #4)") {
    val (docs, emb) = fixture
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-semstore-auto").toString
    val dirM = java.nio.file.Files
      .createTempDirectory("graft-semstore-manual").toString
    // five disjoint snapshots; compactEvery = 2 keeps the live count
    // at most 2 (each fold collapses to one compact epoch)
    val batches = Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L), Seq(6L),
      Seq(7L))
    for ((b, i) <- batches.zipWithIndex) {
      val d = docs.filter(col("doc_id").isin(b: _*))
      val e = emb.filter(col("doc_id").isin(b: _*))
      val auto = collect(SemanticStore.ingest(s"$dirA/store", d, e,
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 2,
        epochName = f"s$i", compactEvery = 2))
      val manual = collect(SemanticStore.ingest(s"$dirM/store", d, e,
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 2,
        epochName = f"s$i"))
      assert(auto == manual,
        s"step $i: auto state $auto != manual state $manual")
      val live = SemanticStore.committedEpochs(spark, s"$dirA/store")
      assert(live.size <= 2,
        s"step $i: live epochs ${live.mkString(",")} exceed the knob")
    }
    // the never-compacted twin has all 5 epochs; the auto store ended
    // folded — and the states agree (the compact equality law, riding
    // the auto path)
    assert(SemanticStore.committedEpochs(spark, s"$dirM/store").size == 5)
    assert(collect(SemanticStore.snapshot(spark, s"$dirA/store",
      "doc_id", "q")) ==
      collect(SemanticStore.snapshot(spark, s"$dirM/store",
        "doc_id", "q")))
    // replaying a FOLDED name through the auto path is still a no-op
    assert(collect(SemanticStore.ingest(s"$dirA/store",
      docs.filter(col("doc_id").isin(1L, 2L)),
      emb.filter(col("doc_id").isin(1L, 2L)),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 2,
      epochName = "s0", compactEvery = 2)) ==
      collect(SemanticStore.snapshot(spark, s"$dirM/store",
        "doc_id", "q")))
  }

  test("retainFolded bounds the store's folded-name manifest (r18 " +
      "review finding F4, third manifest): own fold names always " +
      "survive the budget, a lingering crash-window marker is healed " +
      "before any drop, retained names still refuse replay, and " +
      "state equals the keep-all twin throughout") {
    val (docs, emb) = fixture
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-semstore-retain").toString
    val dirM = java.nio.file.Files
      .createTempDirectory("graft-semstore-retain-m").toString
    def ing(dir: String, ids: Seq[Long], name: String) =
      collect(SemanticStore.ingest(s"$dir/store",
        docs.filter(col("doc_id").isin(ids: _*)),
        emb.filter(col("doc_id").isin(ids: _*)),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 2,
        epochName = name))
    def snap(dir: String) =
      collect(SemanticStore.snapshot(spark, s"$dir/store",
        "doc_id", "q"))
    def manifest(): Seq[String] =
      new java.io.File(s"$dirA/store/_epochs").listFiles()
        .filterNot(_.getName.startsWith(".")) // local-FS .crc sidecars
        .filter(_.length() > 0).sortBy(_.getName)
        .flatMap(f => new String(java.nio.file.Files
          .readAllBytes(f.toPath), "UTF-8")
          .split("\n").filter(_.nonEmpty)).toSeq
    Seq(("s0", Seq(1L, 2L)), ("s1", Seq(3L, 4L)), ("s2", Seq(5L)))
      .foreach { case (n, ids) => ing(dirA, ids, n); ing(dirM, ids, n) }
    assert(SemanticStore.compact(spark, s"$dirA/store", retainFolded = 2))
    assert(SemanticStore.compact(spark, s"$dirM/store"))
    // own names survive even PAST the budget — a replay straddling
    // this very fold is the live hazard the manifest exists for
    assert(manifest() == Seq("s0", "s1", "s2"))
    // crash-window shape: a torn earlier sweep left a folded epoch's
    // MARKER on disk. The drop is safe only because compact() heals
    // it BEFORE the manifest is written (entry sweepFolded — with the
    // marker gone, markerEntries can never resurrect the epoch as
    // committed; the manifest-side lingers() guard is defense in
    // depth should that delete silently fail)
    new java.io.File(s"$dirA/store/_epochs/s0").createNewFile()
    Seq(("s3", Seq(6L)), ("s4", Seq(7L))).foreach { case (n, ids) =>
      ing(dirA, ids, n); ing(dirM, ids, n)
    }
    assert(SemanticStore.compact(spark, s"$dirA/store", retainFolded = 2))
    assert(SemanticStore.compact(spark, s"$dirM/store"))
    assert(!new java.io.File(s"$dirA/store/_epochs/s0").exists(),
      "the entry sweep must retire the lingering marker before the " +
        "manifest can drop the name")
    assert(manifest() == Seq("compact-1", "s3", "s4"),
      "own names fill the budget; healed beyond-horizon names drop")
    assert(snap(dirA) == snap(dirM))
    // a RETAINED folded name still refuses replay
    assert(ing(dirA, Seq(6L), "s3") == snap(dirM))
    // a delete-driven third fold (single committed epoch): own leaves
    // one budget slot, the newest carried name fills it, older ones
    // drop
    SemanticStore.delete(s"$dirA/store", Seq(7L).toDF("doc_id"),
      "doc_id", "d1")
    SemanticStore.delete(s"$dirM/store", Seq(7L).toDF("doc_id"),
      "doc_id", "d1")
    assert(SemanticStore.compact(spark, s"$dirA/store", retainFolded = 2))
    assert(SemanticStore.compact(spark, s"$dirM/store"))
    assert(manifest() == Seq("s4", "compact-2"))
    assert(snap(dirA) == snap(dirM))
  }

  test("refit compaction on a GROWN store raises the cell budget " +
      "above the birth count (VERDICT r16 #1) and every law still " +
      "holds: snapshot equality across the compact, ingest-after " +
      "equality vs the batch run — the pair set is budget-independent") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-grow").toString
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 2,
      epochName = "s1")
    val before = collect(SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 2,
      epochName = "s2"))
    val born = graft.engine.IvfIndex
      .readQuantizer(spark, s"$dir/store/ivf").size
    // born at 2 (4-row first snapshot, kEff caps at the doctrine ask);
    // 7 stored rows at rowsPerCell = 1 → budget 7 > born
    assert(SemanticStore.compact(spark, s"$dir/store", refit = true,
      rowsPerCell = 1))
    val grown = graft.engine.IvfIndex
      .readQuantizer(spark, s"$dir/store/ivf").size
    assert(grown > born, s"budget must grow past birth ($born → $grown)")
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == before)
    // radii re-keyed and stamped under the grown quantizer
    val qv = graft.engine.IvfIndex.quantizerDigest(
      graft.engine.IvfIndex.readQuantizer(spark, s"$dir/store/ivf"))
    val cName = SemanticStore.committedEpochs(spark, s"$dir/store").head
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/store/radii/$cName/_qv")),
      "UTF-8") == qv)
    // an ingest against the grown-budget store still equals the batch
    // run — blocking-independence under a GROWN quantizer
    val s3d = Seq((8L, 100L)).toDF("doc_id", "q")
    val s3e = Seq((8L, Array(0f, 0f, 0.98f, -0.198f)))
      .toDF("doc_id", "embedding")
    assert(collect(SemanticStore.ingest(s"$dir/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 2,
      epochName = "s3")) ==
      collect(Extensions.semanticDedup(docs.union(s3d), emb.union(s3e),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
  }

  test("non-refit compact after a torn REFIT window must not forge a " +
      "live stamp over stale radii: the consolidated radii are " +
      "RECOMPUTED from the rewritten base (they match the live-cell " +
      "recompute, not the old epochs' max-fold) and carry the live " +
      "quantizer version") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-norefit-heal").toString
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1")
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2")
    val before = collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q"))
    // the torn refit: the inner IVF flipped to a NEW quantizer with
    // re-keyed cells, but the store's own fold never committed — the
    // committed radii keep their OLD-quantizer stamps
    graft.engine.IvfIndex.compactEpochsNamed(spark, s"$dir/store/ivf",
      Set("s1", "s2"), refit = true)
    // the NON-refit retry (the ADVICE r16 window): pre-fix it folded
    // the stale radii and stamped them with the live digest
    assert(SemanticStore.compact(spark, s"$dir/store", refit = false))
    val ivfPath = s"$dir/store/ivf"
    val cents = graft.engine.IvfIndex.readQuantizer(spark, ivfPath)
    val qv = graft.engine.IvfIndex.quantizerDigest(cents)
    val cName = SemanticStore.committedEpochs(spark, s"$dir/store").head
    val stamp = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/store/radii/$cName/_qv")), "UTF-8")
    assert(stamp == qv)
    // the staged radii must equal the recompute from the rewritten
    // base under the LIVE cells — the heal path, not the stale fold
    val centDf = spark.createDataFrame(
      cents.map { case (i, c) => (i, c.toSeq) }).toDF("__cell", "__cent")
    val expected = spark.read
      .parquet(s"${graft.engine.IvfIndex.baseRoot(ivfPath)}/cells")
      .withColumn("__n", sqrt(Extensions.dot(col("embedding"),
        col("embedding"))))
      .filter(col("__n") > 0)
      .join(broadcast(centDf), "__cell")
      .select(col("__cell"),
        acos(least(greatest(
          Extensions.cosine(col("embedding"), col("__cent")),
          lit(-1.0)), lit(1.0))).as("__r"))
      .groupBy("__cell").agg(max("__r").as("__r"))
      .as[(Int, Double)].collect().toMap
    val staged = spark.read.parquet(s"$dir/store/radii/$cName")
      .as[(Int, Double)].collect().toMap
    assert(staged == expected,
      s"staged radii $staged are not the live-cell recompute $expected")
    // state unchanged, and the fast path serves the next ingest exactly
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == before)
    val s3d = Seq((8L, 100L)).toDF("doc_id", "q")
    val s3e = Seq((8L, Array(0f, 0f, 0.98f, -0.198f)))
      .toDF("doc_id", "embedding")
    assert(collect(SemanticStore.ingest(s"$dir/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3")) ==
      collect(Extensions.semanticDedup(docs.union(s3d), emb.union(s3e),
        "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)))
  }

  test("a committed delete marker whose ids dir is missing (the " +
      "pre-r17 data-first retire crash window) no longer wedges the " +
      "store: reads skip the orphan instead of throwing, and the next " +
      "compact retires it") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-orphan-marker").toString
    import spark.implicits._
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") <= 4), emb.filter(col("doc_id") <= 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s1")
    SemanticStore.ingest(s"$dir/store",
      docs.filter(col("doc_id") > 4), emb.filter(col("doc_id") > 4),
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s2")
    val full = collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q"))
    // the orphan: a marker with no ids dir — exactly what a crash
    // between the old order's two deletes left behind (the ids were
    // already physically applied by the compact that was retiring it,
    // so skipping is also semantically right)
    val mroot = new java.io.File(s"$dir/store/_deletes")
    mroot.mkdirs()
    assert(new java.io.File(mroot, "d-orphan").createNewFile())
    assert(collect(SemanticStore.snapshot(spark, s"$dir/store",
      "doc_id", "q")) == full) // pre-fix: threw on the missing parquet
    // ingest still works through the orphan too
    val s3d = Seq((8L, 100L)).toDF("doc_id", "q")
    val s3e = Seq((8L, Array(0f, 0f, 0.98f, -0.198f)))
      .toDF("doc_id", "embedding")
    collect(SemanticStore.ingest(s"$dir/store", s3d, s3e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4,
      epochName = "s3"))
    // ... and the INVERSE orphan (ids dir with no marker — what the
    // r17 marker-FIRST retire order leaves when it crashes between
    // its two deletes) is reclaimed by the compact's sweep instead of
    // leaking forever (ADVICE r17: the retire loops iterate marker
    // names only, so once the marker was gone the dir was never
    // listed again). Invisible to reads throughout — deletes resolve
    // via markers.
    val iroot = new java.io.File(s"$dir/store/deletes/d-headless")
    iroot.mkdirs()
    assert(new java.io.File(iroot, "junk").createNewFile())
    // compact retires the orphan marker and sweeps the headless dir
    assert(SemanticStore.compact(spark, s"$dir/store"))
    assert(!new java.io.File(mroot, "d-orphan").exists())
    assert(!iroot.exists(),
      "a markerless ids dir must be swept by the next compact")
    // same on the inner IvfIndex tombstone surface
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft-ivf-orphan-marker").toString
    graft.engine.IvfIndex.build(emb, "embedding", "doc_id", nCells = 4)
      .save(ivfDir)
    val troot = new java.io.File(s"$ivfDir/_tombstones")
    troot.mkdirs()
    assert(new java.io.File(troot, "t-orphan").createNewFile())
    val idx = graft.engine.IvfIndex.load(spark, ivfDir, "doc_id",
      "embedding")
    assert(idx.queryByIds(Seq(1L), k = 3, nprobe = 4).count() > 0)
  }

  test("tree-mode store (nCells >= threshold): the two-snapshot " +
      "equivalence law holds under the two-level quantizer — the " +
      "batch twin runs flat blocking, so equality proves the pair " +
      "set is blocking-independent") {
    val (docs, emb) = fixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstore-tree").toString
    val s1d = docs.filter(col("doc_id") <= 4)
    val s1e = emb.filter(col("doc_id") <= 4)
    val s2d = docs.filter(col("doc_id") > 4)
    val s2e = emb.filter(col("doc_id") > 4)
    // 64 cells crosses Extensions.treeCellThreshold: the store's inner
    // IvfIndex builds in tree mode (quantizer_tree sidecar) and every
    // later ingest must resolve the SAME tree rule for its batch-side
    // assignment — a flat-assigned batch against a tree-assigned
    // stored layout would break the radii soundness this law rides on
    SemanticStore.ingest(s"$dir/store", s1d, s1e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 64,
      epochName = "s1")
    assert(new java.io.File(s"$dir/store/ivf", "quantizer_tree").exists,
      "nCells=64 store must build its inner index in tree mode")
    val out = collect(SemanticStore.ingest(s"$dir/store", s2d, s2e,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 64,
      epochName = "s2"))
    val batch = collect(Extensions.semanticDedup(docs, emb,
      "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4))
    assert(out == batch, s"tree-mode incremental $out vs batch $batch")
  }

  test("ingestOnly commits the identical epoch as ingest (r18 " +
      "optimization law): a store grown via ingestOnly snapshots equal " +
      "to one grown via ingest, replays as a no-op, and its returned " +
      "state is simply skipped") {
    val (docs, emb) = fixture
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-semstore-ingestonly-a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft-semstore-ingestonly-b").toString
    val s1d = docs.filter(col("doc_id") <= 4)
    val s1e = emb.filter(col("doc_id") <= 4)
    val s2d = docs.filter(col("doc_id") > 4)
    val s2e = emb.filter(col("doc_id") > 4)
    // store A: the state-returning path; store B: ingestOnly twice
    val outA = collect(locally {
      SemanticStore.ingest(s"$dirA/store", s1d, s1e, "doc_id", "q",
        "embedding", minCosine = 0.8, nCells = 4, epochName = "s1")
      SemanticStore.ingest(s"$dirA/store", s2d, s2e, "doc_id", "q",
        "embedding", minCosine = 0.8, nCells = 4, epochName = "s2")
    })
    SemanticStore.ingestOnly(s"$dirB/store", s1d, s1e, "doc_id", "q",
      "embedding", minCosine = 0.8, nCells = 4, epochName = "s1")
    SemanticStore.ingestOnly(s"$dirB/store", s2d, s2e, "doc_id", "q",
      "embedding", minCosine = 0.8, nCells = 4, epochName = "s2")
    val outB = collect(SemanticStore.snapshot(spark, s"$dirB/store",
      "doc_id", "q"))
    assert(outB == outA,
      s"ingestOnly-grown store state $outB != ingest-grown $outA")
    // committed-epoch replay stays a no-op through ingestOnly too
    SemanticStore.ingestOnly(s"$dirB/store", s2d, s2e, "doc_id", "q",
      "embedding", minCosine = 0.8, nCells = 4, epochName = "s2")
    assert(collect(SemanticStore.snapshot(spark, s"$dirB/store",
      "doc_id", "q")) == outA, "replayed ingestOnly must change nothing")
  }
}
