package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Extensions}

/** Laws for the retrieval-eval family: distributed ROC AUC
  * (histogram prefix-sum form vs brute-force pair enumeration, tie
  * handling, bucket-count invariance), calibration bins (integer bin
  * edges, clamping, exact means), and reciprocal-rank fusion
  * (branch-rank fidelity, union semantics, self-exclusion,
  * cross-branch tie-break).
  */
class RetrievalEvalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ── rocAuc ───────────────────────────────────────────────────────────

  /** Brute-force AUC over all (pos, neg) pairs: concordant + half the
    * ties, in exact rational arithmetic until one final division. */
  private def bruteAuc(rows: Seq[(Long, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val conc = (for { p <- pos; n <- neg if p > n } yield 1L).sum
    val tied = (for { p <- pos; n <- neg if p == n } yield 1L).sum
    BigDecimal(2 * conc + tied)
      ./(BigDecimal(2L * pos.size * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  // tie-heavy seeded fixture: 40 rows over only 7 distinct scores, so
  // the tie-correction term is exercised hard
  private val aucFixture: Seq[(Long, Boolean)] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(40)((rnd.nextInt(7).toLong - 3L, rnd.nextBoolean()))
  }

  test("rocAuc equals brute-force pair counting on a tie-heavy fixture, " +
      "for any bucket count and any partitioning") {
    val expected = bruteAuc(aucFixture)
    for (nb <- Seq(1, 3, 512); parts <- Seq(1, 7)) {
      val df = aucFixture.toDF("s", "y").repartition(parts)
      val row = Analytics.rocAuc(df, "s", "y", nBuckets = nb).head()
      assert(row.getAs[Double]("auc") == expected,
        s"nBuckets=$nb parts=$parts")
      assert(row.getAs[Long]("n_pos") == aucFixture.count(_._2))
      assert(row.getAs[Long]("n_neg") == aucFixture.count(!_._2))
      // gini is the same exact numerator: 2·AUC − 1 within the 6-dp grid
      assert(math.abs(row.getAs[Double]("gini") -
        (2 * expected - 1)) < 2e-6)
    }
  }

  test("rocAuc endpoints: perfect separation 1.0, reversed 0.0, " +
      "all-tied 0.5, one-class null") {
    val perfect = Seq((10L, true), (11L, true), (1L, false), (2L, false))
    assert(Analytics.rocAuc(perfect.toDF("s", "y"), "s", "y").head()
      .getAs[Double]("auc") == 1.0)
    val reversed = perfect.map { case (s, y) => (s, !y) }
    assert(Analytics.rocAuc(reversed.toDF("s", "y"), "s", "y").head()
      .getAs[Double]("auc") == 0.0)
    val tied = Seq((5L, true), (5L, false), (5L, true), (5L, false))
    assert(Analytics.rocAuc(tied.toDF("s", "y"), "s", "y").head()
      .getAs[Double]("auc") == 0.5)
    val oneClass = Seq((1L, true), (2L, true))
    val r = Analytics.rocAuc(oneClass.toDF("s", "y"), "s", "y").head()
    assert(r.isNullAt(r.fieldIndex("auc")) && r.isNullAt(r.fieldIndex("gini")))
  }

  // ── calibrationBins ──────────────────────────────────────────────────

  test("calibrationBins: integer bin edges, top-edge clamp, exact " +
      "mean/rate") {
    val rows = Seq(
      (0L, false),        // bin 0 (left edge)
      (99999L, true),     // bin 0 (just under the edge)
      (100000L, false),   // bin 1 (exact edge goes UP)
      (500000L, true),    // bin 5
      (999999L, true),    // bin 9
      (1000000L, true))   // bin 9 (top edge clamped in)
    val out = Analytics.calibrationBins(rows.toDF("sm", "y"), "sm", "y")
      .orderBy("bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0, 1, 5, 9))
    val byBin = out.map(r => r._1 -> r).toMap
    assert(byBin(0)._2 == 2 && byBin(0)._3 == 1)
    assert(byBin(0)._4 == 0.05)      // (0 + 99999) / (2·1e6) rounded
    assert(byBin(0)._5 == 0.5)
    assert(byBin(1)._4 == 0.1 && byBin(1)._5 == 0.0)
    assert(byBin(5)._4 == 0.5 && byBin(5)._5 == 1.0)
    assert(byBin(9)._2 == 2 && byBin(9)._4 == 1.0 && byBin(9)._5 == 1.0)
    // support conserves the corpus
    assert(out.map(_._2).sum == rows.size)
  }

  // ── retrievalEval (NDCG@k) ───────────────────────────────────────────

  test("retrievalEval: hand-computed hits/precision/recall/NDCG, " +
      "no-relevant nulls, recall under truncation") {
    // q1: ranked (a,b,c), relevant {a, c, d, e} -> hits at ranks 1,3;
    // q2: ranked (x, y), relevant {} -> zero row with nulls
    val ranked = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3),
      (2L, "x", 1), (2L, "y", 2)
    ).toDF("q", "id", "rank")
    val relevant = Seq((1L, "a"), (1L, "c"), (1L, "d"), (1L, "e"))
      .toDF("q", "id")
    val k = 3
    val out = Analytics.retrievalEval(ranked, relevant, "q", "id", k)
      .orderBy("q").collect()
    val d = (1 to k).map(r =>
      math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))
    val r1 = out(0)
    assert(r1.getAs[Long]("n_relevant") == 4 && r1.getAs[Long]("hits") == 2)
    assert(r1.getAs[Double]("precision_k") ==
      BigDecimal(2.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r1.getAs[Double]("recall_k") == 0.5)
    // DCG = D(1) + D(3); IDCG = D(1)+D(2)+D(3) (m = min(3, 4) = 3)
    val expectedNdcg = BigDecimal((d(0) + d(2)).toDouble / d.sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("ndcg") == expectedNdcg)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_relevant") == 0 && r2.getAs[Long]("hits") == 0)
    assert(r2.getAs[Double]("precision_k") == 0.0)
    assert(r2.isNullAt(r2.fieldIndex("recall_k")))
    assert(r2.isNullAt(r2.fieldIndex("ndcg")))
  }

  test("retrievalEval: perfect top-k ranking scores ndcg 1.0 even when " +
      "relevant exceeds k") {
    val ranked = Seq((1L, "a", 1), (1L, "b", 2)).toDF("q", "id", "rank")
    val relevant = Seq((1L, "a"), (1L, "b"), (1L, "c"))
      .toDF("q", "id")
    val row = Analytics.retrievalEval(ranked, relevant, "q", "id", k = 2)
      .head()
    assert(row.getAs[Double]("ndcg") == 1.0)   // m = min(2, 3) = 2
    assert(row.getAs[Double]("recall_k") ==
      BigDecimal(2.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ── rrfFusion ────────────────────────────────────────────────────────

  // corpus engineered so the branches DISAGREE: docs 1-2 share the
  // query's tokens (lexical hits), docs 3-4 share its embedding
  // direction (dense hits), doc 5 is close in both, doc 6 in neither
  private val fusionDocs = Seq(
    (0L, "alpha beta gamma"),
    (1L, "alpha beta delta"),
    (2L, "alpha epsilon zeta"),
    (3L, "eta theta iota"),
    (4L, "kappa lambda mu"),
    (5L, "beta gamma nu"),
    (6L, "xi omicron pi"))
  private val fusionEmb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),   // lexical hit, dense miss
    (2L, Array(0.0f, 0.9f, 0.1f)),
    (3L, Array(0.99f, 0.1f, 0.0f)),  // dense hit, lexical miss
    (4L, Array(0.98f, 0.0f, 0.1f)),
    (5L, Array(0.9f, 0.0f, 0.0f)),   // both
    (6L, Array(0.0f, 0.0f, 1.0f)))   // neither

  private def fusionResult(kBranch: Int = 4, k: Int = 7) = {
    val docs = fusionDocs.toDF("doc_id", "text")
    val emb = fusionEmb.toDF("vec_id", "embedding")
    Extensions.rrfFusion(docs, "text", "doc_id", emb, "embedding",
      "vec_id", queryIds = Seq(0L), kBranch = kBranch, k = k)
      .orderBy("rank")
      .select("doc_id", "lex_rank", "vec_rank", "rrf_score", "rank")
      .collect()
  }

  test("rrfFusion: branch ranks match the standalone branch rankings, " +
      "self is excluded, union carries nulls, score is 1/(60+r) sums") {
    val out = fusionResult()
    // the query doc never appears as its own candidate
    assert(!out.exists(_.getAs[Long]("doc_id") == 0L))
    // standalone branch rankings (self-excluded), recomputed here
    val lexExpected: Map[Long, Int] =
      Extensions.bm25TopK(fusionDocs.toDF("doc_id", "text"),
          "text", "doc_id",
          Seq((0L, "alpha beta gamma")).toDF("query_id", "qt"),
          "qt", "query_id", k = 8)
        .filter(col("doc_id") =!= 0L)
        .orderBy(desc("bm25"), asc("doc_id"))
        .select("doc_id").as[Long].collect().take(4)
        .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val denseExpected = Extensions.cosineTopK(
        fusionEmb.toDF("vec_id", "embedding"), "embedding", "vec_id",
        Seq(0L), k = 4)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    for (r <- out) {
      val id = r.getAs[Long]("doc_id")
      val lex = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
      val vec = Option(r.getAs[Integer]("vec_rank")).map(_.toInt)
      assert(lex == lexExpected.get(id), s"lex_rank of $id")
      assert(vec == denseExpected.get(id), s"vec_rank of $id")
      val expectedScore = BigDecimal(
        lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf_score") == expectedScore, s"score of $id")
    }
    // a lexical-only hit (doc 1 or 2: orthogonal embedding) and a
    // dense-only hit (doc 3 or 4: no shared token) must both be present
    assert(out.exists(r => r.getAs[Integer]("vec_rank") == null))
    assert(out.exists(r => r.getAs[Integer]("lex_rank") == null))
    // final ordering: non-increasing score, ties to the smaller id
    val pairs = out.toSeq.map(r =>
      (r.getAs[Double]("rrf_score"), r.getAs[Long]("doc_id")))
    assert(pairs.sliding(2).forall {
      case Seq((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2)
      case _ => true
    })
  }

  test("expectedCalibrationError: perfectly calibrated bins score 0, " +
      "degenerate miscalibration scores 1, equals the hand fold, " +
      "partition-invariant") {
    // perfectly calibrated: in each bin the mean micro score EQUALS the
    // positive rate (bin 2: two rows at 250000, one positive of... make
    // exact: scores 500000/500000 with exactly one of two positive)
    val calib = Seq((500000L, true), (500000L, false),
      (250000L, true), (250000L, false), (250000L, false), (250000L, false))
      .toDF("score_micro", "is_pos")
    val e0 = Analytics.expectedCalibrationError(calib, "score_micro",
      "is_pos", bins = 10).collect().head
    assert(e0.getAs[Long]("n") == 6 && e0.getAs[Double]("ece") == 0.0)
    // degenerate: predicts 1.0 for all-negative -> ECE 1
    val bad = Seq((1000000L, false), (1000000L, false))
      .toDF("score_micro", "is_pos")
    assert(Analytics.expectedCalibrationError(bad, "score_micro", "is_pos")
      .collect().head.getAs[Double]("ece") == 1.0)
    // random fixture equals the driver-side exact fold
    val rnd = new scala.util.Random(5L)
    val rows = (0 until 400).map(_ =>
      (rnd.nextInt(1000001).toLong, rnd.nextBoolean()))
    val df = rows.toDF("score_micro", "is_pos")
    val got = Analytics.expectedCalibrationError(df, "score_micro",
      "is_pos", bins = 10).collect().head.getAs[Double]("ece")
    val byBin = rows.groupBy(r => math.min(r._1 * 10 / 1000000, 9))
    val num = byBin.values.map { g =>
      math.abs(g.count(_._2).toLong * 1000000L - g.map(_._1).sum)
    }.sum
    val want = BigDecimal(num.toDouble / (rows.size * 1000000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want)
    val re = Analytics.expectedCalibrationError(df.repartition(7),
      "score_micro", "is_pos", bins = 10).collect().head
      .getAs[Double]("ece")
    assert(re == got)
  }

  test("prAuc: perfect separation 1.0, all-tied equals the positive " +
      "prevalence, no-positives null, equals the hand fold under any " +
      "bucketing/partitioning") {
    def ap(rows: Seq[(Long, Boolean)], nBuckets: Int = 512,
        parts: Int = 1): Option[Double] = {
      val df0 = rows.toDF("score_int", "is_pos")
      val df = if (parts > 1) df0.repartition(parts) else df0
      Option(Analytics.prAuc(df, "score_int", "is_pos", nBuckets)
        .collect().head.getAs[java.lang.Double]("ap")).map(_.toDouble)
    }
    // perfect: all positives strictly above all negatives
    val perfect = Seq((90L, true), (80L, true), (20L, false), (10L, false))
    assert(ap(perfect).contains(1.0))
    // all tied at one score: precision = prevalence at the single step
    val tied = Seq((5L, true), (5L, false), (5L, false), (5L, false))
    assert(ap(tied).contains(0.25))
    // no positives -> null
    assert(ap(Seq((5L, false), (7L, false))).isEmpty)
    // hand fold on a random grid: walk distinct scores desc with the
    // same floor-divided micro-unit terms
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 500).map(_ =>
      ((rnd.nextInt(50) + 1).toLong, rnd.nextInt(3) == 0))
    val hist = rows.groupBy(_._1).view
      .mapValues(g => (g.count(_._2).toLong, g.size.toLong)).toMap
    var cp = 0L; var ct = 0L; var apMicro = 0L
    hist.keys.toSeq.sorted.reverse.foreach { s =>
      val (p, t) = hist(s); cp += p; ct += t
      apMicro += p * cp * 1000000L / ct
    }
    val P = rows.count(_._2).toLong
    val want = BigDecimal(apMicro.toDouble / (P * 1000000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ap(rows).contains(want))
    // bucket boundaries and input partitioning don't touch the result
    assert(ap(rows, nBuckets = 1).contains(want))
    assert(ap(rows, nBuckets = 7, parts = 13).contains(want))
  }

  test("mmrRerank: pick 1 is the relevance argmax, a near-duplicate " +
      "of the first pick is deferred in favor of a diverse candidate, " +
      "ranks are 1..k, scores follow 7*rel-3*maxSim, " +
      "partition-invariant") {
    // query 0 = x̂. 10 and 11 are near-parallel twins at rel ≈ 0.95;
    // 12 sits at rel ≈ 0.92 on the OPPOSITE side of the query
    // (cos(10,12) ≈ 0.75, the triangle-inequality minimum), so at
    // λ=0.7 the twin's ≈1.0 duplication penalty loses to 12's small
    // one: 7·0.9199−3·0.7517 ≈ 4.18M beats 7·0.9491−3·0.99999 ≈ 3.65M
    val emb = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      10L -> Array(0.95f, 0.312f, 0f, 0f),
      11L -> Array(0.949f, 0.315f, 0f, 0f),
      12L -> Array(0.92f, -0.392f, 0f, 0f),
      13L -> Array(-1f, 0f, 0f, 0f)).toDF("vec_id", "embedding")
    val out = Extensions.mmrRerank(emb, "embedding", "vec_id",
      queryIds = Seq(0L), kBranch = 4, k = 3)
      .orderBy("sel_rank").collect()
    assert(out.map(_.getAs[Int]("sel_rank")).toSeq == Seq(1, 2, 3))
    // pick 1 = pure relevance argmax (10 vs 11: 10 wins by cosine tie
    // rules or value); pick 2 must be the DIVERSE 12, not the
    // near-duplicate 11, because 11's maxSim penalty to 10 is huge
    val first = out(0).getAs[Long]("neighbor_id")
    assert(Set(10L, 11L).contains(first))
    assert(out(1).getAs[Long]("neighbor_id") == 12L,
      s"expected the diverse candidate second, got ${out.toSeq}")
    // score law: mmr = 7*rel - 3*maxSim exactly, maxSim 0 on pick 1
    out.foreach { r =>
      assert(r.getAs[Long]("mmr_micro") ==
        7L * r.getAs[Long]("rel_micro") -
          3L * r.getAs[Long]("max_sim_micro"))
    }
    assert(out(0).getAs[Long]("max_sim_micro") == 0L)
    // partition invariance
    val re = Extensions.mmrRerank(emb.repartition(5), "embedding",
      "vec_id", queryIds = Seq(0L), kBranch = 4, k = 3)
      .orderBy("sel_rank").collect().map(_.toString).toSeq
    assert(re == out.map(_.toString).toSeq)
  }

  test("mrrEval: first relevant rank and 1/rank, 0.0 when nothing " +
      "relevant makes the cut, truncation at k") {
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),   // q1: rel at rank 2
      (2L, 20L, 1), (2L, 21L, 2),                  // q2: no rel in top-k
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3))    // q3: rel at 1 AND 3
      .toDF("query_id", "neighbor_id", "rank")
    val relevant = Seq((1L, 11L), (2L, 99L), (3L, 30L), (3L, 32L),
      (1L, 13L)).toDF("query_id", "neighbor_id")
    val out = Analytics.mrrEval(ranked, relevant, "query_id",
        "neighbor_id", k = 3)
      .orderBy("query_id").collect()
    assert(out.map(r => (r.getLong(0),
      Option(r.getAs[Integer]("first_rel_rank")).map(_.toInt),
      r.getDouble(2))).toSeq ==
      Seq((1L, Some(2), 0.5), (2L, None, 0.0), (3L, Some(1), 1.0)))
    // truncation: at k=1 only q3's rank-1 hit survives
    val k1 = Analytics.mrrEval(ranked, relevant, "query_id",
        "neighbor_id", k = 1)
      .orderBy("query_id").collect()
    assert(k1.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 0.0), (2L, 0.0), (3L, 1.0)))
  }

  test("rrfFusion is invariant under input partitioning") {
    val base = fusionResult().map(_.toString).toSeq
    val docs7 = fusionDocs.toDF("doc_id", "text").repartition(7)
    val emb3 = fusionEmb.toDF("vec_id", "embedding").repartition(3)
    val re = Extensions.rrfFusion(docs7, "text", "doc_id", emb3,
        "embedding", "vec_id", queryIds = Seq(0L), kBranch = 4, k = 7)
      .orderBy("rank")
      .select("doc_id", "lex_rank", "vec_rank", "rrf_score", "rank")
      .collect().map(_.toString).toSeq
    assert(re == base)
  }

  test("calibrationBins/ECE clamp out-of-contract negative scores into " +
      "bin 0 — where Spark's truncating div and DuckDB's flooring // " +
      "would otherwise diverge") {
    val rows = Seq((-50000L, true), (-1L, false), (0L, true),
      (999999L, false), (1000000L, true))
    val out = Analytics.calibrationBins(rows.toDF("sm", "y"), "sm", "y",
      bins = 10).orderBy("bin").collect()
    assert(out.map(_.getAs[Int]("bin")).toSeq == Seq(0, 9),
      s"bins: ${out.map(_.getAs[Int]("bin")).toSeq}")
    assert(out(0).getAs[Long]("n") == 3L, "all negatives land in bin 0")
    val e = Analytics.expectedCalibrationError(rows.toDF("sm", "y"),
      "sm", "y", bins = 10).collect()(0)
    assert(e.getAs[Long]("n") == 5L && !e.isNullAt(e.fieldIndex("ece")))
  }
}
