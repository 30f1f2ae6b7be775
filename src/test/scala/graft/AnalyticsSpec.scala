package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Analytics

/** Semantic laws for the Analytics family: funnel ordering/deadline,
  * retention offsets, MERGE semantics, weighted-sample determinism and
  * bias, quantization reconstruction bounds, PageRank mass
  * conservation and ranking.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("funnel counts only strictly-ordered step sequences") {
    val ev = Seq(
      // u1: a -> b in order
      (1L, "a", 100L), (1L, "b", 200L),
      // u2: b BEFORE a — must not count for step 2
      (2L, "b", 100L), (2L, "a", 200L),
      // u3: a only
      (3L, "a", 100L),
      // u4: a and b at the SAME time — strict > excludes b
      (4L, "a", 100L), (4L, "b", 100L)
    ).toDF("user_id", "event_type", "t")
    val out = Analytics.funnel(ev, "user_id", "event_type", "t", Seq("a", "b"))
      .orderBy("step")
      .select("users_reached").as[Long].collect()
    assert(out.toSeq == Seq(4L, 1L))
  }

  test("funnel deadline excludes steps completed too late") {
    val ev = Seq(
      (1L, "a", 100L), (1L, "b", 150L),  // within 100s
      (2L, "a", 100L), (2L, "b", 300L)   // 200s later — too late
    ).toDF("user_id", "event_type", "t")
    val out = Analytics.funnel(ev, "user_id", "event_type", "t",
        Seq("a", "b"), deadlineSeconds = Some(100L))
      .orderBy("step").select("users_reached").as[Long].collect()
    assert(out.toSeq == Seq(2L, 1L))
    // a later in-deadline retry still counts: first a at 100, b at 300
    // misses, but a SECOND a at 250 does not reset (min rule: step 1
    // anchors at the user's FIRST step-1 event)
    val retry = Seq((3L, "a", 100L), (3L, "a", 250L), (3L, "b", 300L))
      .toDF("user_id", "event_type", "t")
    val r = Analytics.funnel(retry, "user_id", "event_type", "t",
        Seq("a", "b"), deadlineSeconds = Some(100L))
      .orderBy("step").select("users_reached").as[Long].collect()
    assert(r.toSeq == Seq(1L, 0L))
  }

  test("cohort retention buckets users by first event and offsets") {
    val day = 86400L
    val ev = Seq(
      (1L, 0 * day + 10), (1L, 2 * day + 10),          // cohort 0: active d0, d2
      (2L, 0 * day + 20),                              // cohort 0: d0 only
      (3L, 1 * day + 30), (3L, 1 * day + 40), (3L, 2 * day)  // cohort 1: d0(dup), d1
    ).toDF("user_id", "t")
    val out = Analytics.cohortRetention(ev, "user_id", "t", day)
      .orderBy("cohort_bucket", "bucket_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 2L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("mergeUpsert: update wins, insert appears, delete removes, " +
      "unmentioned columns keep target values") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "price")
    val updates = Seq(
      (2L, 25.0, false),  // update price only — name must stay "b"
      (3L, 0.0, true),    // delete
      (9L, 90.0, false)   // insert (name null — not in update schema)
    ).toDF("k", "price", "del")
    val out = Analytics.mergeUpsert(target, updates, Seq("k"), Some("del"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 9L))
    val byK = out.map(r => r.getLong(0) ->
      (Option(r.getString(1)), r.getDouble(2))).toMap
    assert(byK(1L) == (Some("a"), 10.0))   // untouched
    assert(byK(2L) == (Some("b"), 25.0))   // price updated, name kept
    assert(byK(9L) == (None, 90.0))        // inserted; name has no source
  }

  test("mergeUpsert: multiple update rows matching one target key raise; " +
      "duplicate-keyed pure inserts do not") {
    val target = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price")
    val dupMatched = Seq((2L, 21.0), (2L, 22.0)).toDF("k", "price")
    val ex = intercept[Exception] {
      Analytics.mergeUpsert(target, dupMatched, Seq("k")).collect()
    }
    assert(ex.getMessage.contains("multiple update rows"))
    // duplicate keys that match NO target row are plain inserts (SQL
    // MERGE does not error on those) — both rows land
    val dupInserts = Seq((9L, 90.0), (9L, 91.0)).toDF("k", "price")
    val out = Analytics.mergeUpsert(target, dupInserts, Seq("k"))
      .orderBy("k", "price").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10.0), (2L, 20.0), (9L, 90.0), (9L, 91.0)))
  }

  test("mergeUpsert: NULL keys never match — null-keyed updates insert, " +
      "null-keyed target rows pass through") {
    val target = Seq((Some(1L), 10.0), (None, 99.0))
      .toDF("k", "price")
    val updates = Seq((Option.empty[Long], 55.0)).toDF("k", "price")
    val out = Analytics.mergeUpsert(target, updates, Seq("k"))
      .orderBy(col("k").asc_nulls_first, col("price"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getDouble(1))).toSeq
    // target's null-key row keeps 99.0; the null-key update INSERTS 55.0
    assert(out == Seq((None, 55.0), (None, 99.0), (Some(1L), 10.0)))
  }

  test("weightedSample is deterministic across partitionings and " +
      "near-certainly includes a dominating weight") {
    val df = spark.range(1000L).select(col("id"),
      when(col("id") === 7L, lit(1e9)).otherwise(lit(1.0)).as("w"))
    val a = Analytics.weightedSample(df, "id", "w", 50)
      .select("id").as[Long].collect().toSet
    val b = Analytics.weightedSample(df.repartition(13), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size == 50)
    assert(a.contains(7L)) // P[exclusion] ≈ (score ~1e-9 ranking below 50/1000) ≈ 0
    // zero/negative weights never sampled
    val z = Analytics.weightedSample(
      Seq((1L, 0.0), (2L, -1.0), (3L, 5.0)).toDF("id", "w"), "id", "w", 3)
      .select("id").as[Long].collect().toSeq
    assert(z == Seq(3L))
  }

  test("quantizeEmbeddings: error bounded by scale/2, zero vector safe, " +
      "checksum reflects the code vector") {
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(127.0f, -127.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val rows = Analytics.quantizeEmbeddings(emb, "embedding", "vec_id")
      .orderBy("vec_id").collect()
    val r1 = rows(0)
    val scale1 = r1.getDouble(2)
    assert(math.abs(scale1 - 1.0 / 127.0) < 1e-15)
    // every in-range value reconstructs within half a quantization step
    assert(r1.getDouble(4) <= scale1 / 2 + 1e-12)
    // codes: 1.0→127, -0.5→-63 or -64, 0.25→31 or 32, 0→0; checksum in range
    val cks1 = r1.getLong(3)
    assert(cks1 >= 127L - 64 + 31 && cks1 <= 127L - 63 + 32)
    val r2 = rows(1)
    assert(r2.getDouble(2) == 0.0 && r2.getLong(3) == 0L &&
      r2.getDouble(4) == 0.0)
    val r3 = rows(2)
    assert(r3.getLong(3) == 127L - 127 + 1 + 0)
  }

  test("pageRank: mass conserved on a dangling-free graph; star center " +
      "outranks leaves; deterministic") {
    // undirected star: center 0 <-> leaves 1..5
    val pairs = (1L to 5L).map(l => (0L, l))
    val edges = (pairs.map { case (c, l) => (c, l) } ++
      pairs.map { case (c, l) => (l, c) }).toDF("src", "dst")
    val pr = Analytics.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(0L) > pr(1L) * 3)
    (1L to 5L).foreach(l => assert(math.abs(pr(l) - pr(1L)) < 1e-12))
    val again = Analytics.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr == again)
  }

  test("pageRank deep runs keep a bounded plan: lineage truncates every " +
      "few iterations, mass stays conserved at 12 iterations") {
    val pairs = (1L to 5L).map(l => (0L, l))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val pr = Analytics.pageRank(edges, "src", "dst", iters = 12)
    val ranks = pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    assert(ranks(0L) > ranks(1L))
    // the plan must start from the LAST checkpoint, so its size is a
    // function of iterations-since-checkpoint, not total iterations —
    // 12 and 16 both sit 4 rounds after one (checkpoints at 4,8 / at
    // 4,8,12) and must plan identically; un-truncated, every extra
    // iteration permanently deepens the plan
    def planLines(iters: Int): Int =
      Analytics.pageRank(edges, "src", "dst", iters = iters)
        .queryExecution.executedPlan.toString.linesIterator.size
    val l12 = planLines(12)
    val l16 = planLines(16)
    assert(math.abs(l16 - l12) <= 2,
      s"plan grew with total iterations: $l12 lines @12 vs $l16 @16")
  }

  test("groupTopK: largest-ord rows per group, rank order, id tiebreak, " +
      "null ord skipped, k larger than group tolerated") {
    val df = Seq(
      (1L, 10L, Some(5.0)), (1L, 11L, Some(9.0)), (1L, 12L, Some(9.0)),
      (1L, 13L, Some(1.0)), (1L, 14L, None),
      (2L, 20L, Some(3.0))
    ).toDF("g", "id", "v")
    val out = Analytics.groupTopK(df, Seq("g"), "v", "id", k = 2)
      .orderBy("g", "rk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      // ties on v=9.0 break toward the smaller id; null v never ranks
      (1L, 1, 11L, 9.0), (1L, 2, 12L, 9.0),
      (2L, 1, 20L, 3.0)))
  }

  test("groupTopK rejects non-integral id columns instead of silently " +
      "nulling them to empty results") {
    val df = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException] {
      Analytics.groupTopK(df, Seq("g"), "v", "id", k = 1)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("groupTopK matches the row_number window form on skewed random " +
      "data regardless of partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i =>
      (rnd.nextInt(5).toLong, i, rnd.nextInt(40).toDouble))
    val df = rows.toDF("g", "id", "v").repartition(13)
    val topk = Analytics.groupTopK(df, Seq("g"), "v", "id", k = 7)
      .orderBy("g", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(7).map(r => (g, r._2))
    }
    assert(topk == expected)
  }

  test("scd2: change compression keeps only genuine transitions; " +
      "intervals chain; exactly one open current version per key") {
    val log = Seq(
      // key 1: A at 100, A again at 200 (collapsed), B at 300, B at 400
      (1L, 100L, 10L, "A"), (1L, 200L, 11L, "A"),
      (1L, 300L, 12L, "B"), (1L, 400L, 13L, "B"),
      // key 2: single version
      (2L, 150L, 20L, "X"),
      // key 3: same-ts tie broken by id — A(id 30) then B(id 31)
      (3L, 500L, 30L, "A"), (3L, 500L, 31L, "B")
    ).toDF("k", "ts", "id", "attr")
    val out = Analytics.scd2(log, Seq("k"), "ts", "id", Seq("attr"))
      .orderBy(col("k"), col("valid_from"), col("attr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 100L, "A", Some(300L), false),
      (1L, 300L, "B", None, true),
      (2L, 150L, "X", None, true),
      (3L, 500L, "A", Some(500L), false),
      (3L, 500L, "B", None, true)))
    // uncompressed keeps every changelog row
    val raw = Analytics.scd2(log, Seq("k"), "ts", "id", Seq("attr"),
      compressUnchanged = false)
    assert(raw.count() == 7)
    assert(raw.filter(col("is_current")).count() == 3)
  }

  test("tukeyOutliers: fences are group-relative — a value normal in " +
      "one group flags in another; tight k widens the net") {
    val df = (
      // group A around 100 (±5), one wild value
      (1 to 20).map(i => ("A", 100.0 + (i % 11) - 5)) ++ Seq(("A", 500.0)) ++
      // group B around 500 — 500 is NORMAL here
      (1 to 20).map(i => ("B", 500.0 + (i % 11) - 5))
    ).toDF("g", "v")
    val out = Analytics.tukeyOutliers(df, "g", "v")
      .select("g", "v", "is_outlier").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.contains(("A", 500.0, true)))
    assert(out.filter(_._1 == "B").forall(!_._3))
    assert(out.count(_._3) == 1)
  }

  test("conversionLag: inclusive same-instant conversion, pre-signup " +
      "purchases ignored, non-converters and never-signed-up excluded") {
    val ev = Seq(
      (1L, "signup", 100L), (1L, "purchase", 100L + 86400L),   // bucket 1
      (2L, "purchase", 50L), (2L, "signup", 200L),             // pre-signup
      (2L, "purchase", 200L),                                  // same instant
      (3L, "signup", 300L),                                    // never buys
      (4L, "purchase", 400L)                                   // never signs
    ).toDF("user_id", "event_type", "t")
    val out = Analytics.conversionLag(ev, "user_id", "event_type", "t",
        "signup", "purchase", bucketSeconds = 86400L)
      .orderBy("lag_bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L), (1L, 1L)))
  }

  test("chiSquare: independent columns give ~zero contributions; " +
      "expected counts reproduce marginal products; perfectly " +
      "dependent columns give large chi2") {
    // independent: every (a,b) combination equally often
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 5 } yield (a, b)).toDF("a", "b")
    val iOut = Analytics.chiSquare(ind, "a", "b").collect()
    assert(iOut.length == 4)
    iOut.foreach { r =>
      assert(r.getDouble(3) == 5.0)       // expected = 10*10/20
      assert(r.getDouble(4) == 0.0)       // observed == expected
    }
    // dependent: a determines b
    val dep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val chi2 = Analytics.chiSquare(dep, "a", "b")
      .agg(sum("chi2_contrib")).head().getDouble(0)
    assert(chi2 == 20.0) // n * 1 for a perfect 2x2 association
  }

  test("marketConcentration: monopoly gives hhi=1, equal split gives " +
      "1/n, top_share tracks the leader") {
    val df = Seq(
      // market 1: monopoly
      (1L, 10L, 50.0), (1L, 10L, 25.0),
      // market 2: two equal players
      (2L, 20L, 30.0), (2L, 21L, 30.0),
      // market 3: 75/25 split
      (3L, 30L, 75.0), (3L, 31L, 25.0)
    ).toDF("m", "p", "v")
    val out = Analytics.marketConcentration(df, "m", "p", "v")
      .orderBy("m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out(0) == ((1L, 1L, 1.0, 1.0)))
    assert(out(1) == ((2L, 2L, 0.5, 0.5)))
    assert(out(2) == ((3L, 2L, 0.625, 0.75))) // 0.75² + 0.25²
  }

  test("giniByGroup: equal split gives 0, near-monopoly approaches " +
      "(n-1)/n, and the statistic is invariant to tie order") {
    val df = Seq(
      // group 1: four equal players → G = 0
      (1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 10.0), (1L, 4L, 10.0),
      // group 2: one player holds ~everything of four → G → 3/4
      (2L, 1L, 0.01), (2L, 2L, 0.01), (2L, 3L, 0.01), (2L, 4L, 9999.0),
      // group 3: two equal + ties across ids — order of tied ids must
      // not matter: G of (5,5,10) = Σ|xi−xj|/(2n²μ) = 0.166667
      (3L, 9L, 5.0), (3L, 1L, 5.0), (3L, 4L, 10.0)
    ).toDF("g", "p", "v")
    val out = Analytics.giniByGroup(df, "g", "p", "v")
      .orderBy("g").as[(Long, Long, Double)].collect().toSeq
    assert(out(0) == ((1L, 4L, 0.0)))
    assert(out(1)._2 == 4L && math.abs(out(1)._3 - 0.75) < 1e-4)
    assert(out(2) == ((3L, 3L, 0.166667)))
    // mean-absolute-difference cross-check on a seeded random group
    val rnd = new scala.util.Random(5)
    val xs = (1 to 40).map(i => (7L, i.toLong,
      math.rint(rnd.nextDouble() * 10000) / 100))
    val got = Analytics.giniByGroup(xs.toDF("g", "p", "v"), "g", "p", "v")
      .as[(Long, Long, Double)].head()._3
    val cents = xs.map(x => math.rint(x._3 * 100).toLong)
    val n = cents.size
    val mad = (for (a <- cents; b <- cents) yield math.abs(a - b)).sum
    val exp = mad.toDouble / (2.0 * n * n * (cents.sum.toDouble / n))
    assert(math.abs(got - exp) < 1e-6)
  }

  test("entropyByGroup: uniform mix gives ln k, single type gives 0, " +
      "and the re-agg identity matches -sum p ln p") {
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),       // uniform over 2
      (2L, "a"), (2L, "a"), (2L, "a"),                  // degenerate
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "d"),       // uniform over 4
      (4L, "a"), (4L, "a"), (4L, "a"), (4L, "b")        // 3:1 split
    ).toDF("g", "t")
    val out = Analytics.entropyByGroup(df, "g", "t")
      .orderBy("g").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out(0) == ((1L, 2L, 4L, 0.693147)))          // ln 2
    assert(out(1) == ((2L, 1L, 3L, 0.0)))
    assert(out(2) == ((3L, 4L, 4L, 1.386294)))          // ln 4
    val p = Seq(0.75, 0.25)
    val expected = math.rint(-p.map(x => x * math.log(x)).sum * 1e6) / 1e6
    assert(out(3) == ((4L, 2L, 4L, expected)))
  }

  test("trendSlope: exact line recovers its slope, constant series " +
      "gives 0, intercept does not matter") {
    val rows = (0 until 10).flatMap { d =>
      Seq((1L, (19000L + d) * 86400L, 100.0 + 5.0 * d),  // slope 5/day
        (2L, (19000L + d) * 86400L, 42.0))               // flat
    }
    val out = Analytics.trendSlope(rows.toDF("g", "dt", "v"), "g", "dt", "v")
      .orderBy("g").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10L, 5.0), (2L, 10L, 0.0)))
  }

  test("interArrivalStats: metronomic gaps give cv 0, known gaps give " +
      "the exact sample-variance cv, single-event keys drop") {
    val df = Seq(
      (1L, 0L, 10L), (1L, 1000000L, 11L), (1L, 2000000L, 12L),
      (1L, 3000000L, 13L),                    // gaps 1s,1s,1s
      (2L, 0L, 20L), (2L, 1000000L, 21L), (2L, 4000000L, 22L), // 1s,3s
      (3L, 0L, 30L)                           // single event
    ).toDF("k", "tu", "id").withColumn("ts", timestamp_micros(col("tu")))
    val out = Analytics.interArrivalStats(df, "k", "ts", "id")
      .orderBy("k").as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.size == 2)
    assert(out(0) == ((1L, 3L, 1.0, 0.0)))
    // gaps {1e6, 3e6}: mean 2e6, sample sd sqrt(2)e6 -> cv 0.707107
    assert(out(1) == ((2L, 2L, 2.0, 0.707107)))
  }

  test("timeWeightedAvg: values weight by their holding duration, the " +
      "final reading carries none, single-event keys drop") {
    val df = Seq(
      (1L, 0L, 10.0, 1L), (1L, 3000000L, 20.0, 2L),
      (1L, 4000000L, 99.0, 3L),               // 10 held 3s, 20 held 1s
      (2L, 0L, 7.0, 4L)                       // single event
    ).toDF("k", "tu", "v", "id")
      .withColumn("ts", timestamp_micros(col("tu")))
    val out = Analytics.timeWeightedAvg(df, "k", "ts", "v", "id")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 12.5)))            // (10*3 + 20*1) / 4
  }

  test("cusumShift: a mid-series level shift peaks at the last " +
      "pre-shift day; a flat series ties to the earliest day at 0") {
    // group a: 1 event/day on days 0-4, then 3/day on days 5-9
    val a = (0 to 4).map(d => ("a", d.toLong)) ++
      (5 to 9).flatMap(d => Seq.fill(3)(("a", d.toLong)))
    // group b: 2/day on both days — cusum identically 0, tie -> day 0
    val b = Seq.fill(2)(("b", 0L)) ++ Seq.fill(2)(("b", 1L))
    val df = (a ++ b).toDF("g", "day")
      .withColumn("ts", timestamp_micros(col("day") * 86400000000L))
    val out = Analytics.cusumShift(df, "g", "ts")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    // nd=10, tot=20; S_d*n bottoms at -50 on day 4 -> -50/(10*20)
    assert(out == Seq(("a", 4L, -0.25), ("b", 0L, 0.0)))
  }

  test("eventPaths: counts trigrams per key in time order, breaks " +
      "count ties by path text and same-instant ties by id") {
    val df = Seq(
      (1L, "a", 0L, 1L), (1L, "b", 1L, 2L), (1L, "c", 2L, 3L),
      (1L, "d", 3L, 4L),                      // a>b>c, b>c>d
      (2L, "a", 0L, 5L), (2L, "b", 1L, 6L), (2L, "c", 2L, 7L), // a>b>c
      (3L, "x", 0L, 8L), (3L, "y", 1L, 9L), (3L, "z", 2L, 10L), // x>y>z
      // same-instant: order is defined by id -> c, a, b
      (4L, "b", 0L, 13L), (4L, "c", 0L, 11L), (4L, "a", 0L, 12L)
    ).toDF("k", "t", "tu", "id")
      .withColumn("ts", timestamp_micros(col("tu")))
    val out = Analytics.eventPaths(df, "k", "t", "ts", "id", k = 4)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a>b>c", 2L), ("b>c>d", 1L), ("c>a>b", 1L),
      ("x>y>z", 1L)))
  }

  test("rfmScores: score 5 = most recent / most frequent / highest " +
      "value; recency inverts; scores bounded 1..5") {
    // 10 users, user i: last event at day i, i events of value 10*i
    val ev = (1 to 10).flatMap(i => (1 to i).map(j =>
      (i.toLong, i * 86400L + j, 10.0 * i))).toDF("u", "t", "v")
    val out = Analytics.rfmScores(ev, "u", "t", "v")
      .orderBy("u").collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getInt(5), r.getInt(6)))
    val byU = out.map(x => x._1 -> x).toMap
    // user 10: most recent (r_days 0), most frequent, highest monetary
    assert(byU(10L) == ((10L, 5, 5, 5)))
    // user 1: least recent, least frequent, lowest monetary
    assert(byU(1L) == ((1L, 1, 1, 1)))
    assert(out.forall(x => Seq(x._2, x._3, x._4)
      .forall(s => s >= 1 && s <= 5)))
  }

  test("basketAffinity: co-occurring pair outranks independent pair " +
      "by lift; within-basket duplicates collapse; minSupport prunes") {
    // items 1,2 always together (4 baskets); item 3 in every basket
    // (independent); item 4 appears once (below minSupport with anything)
    val rows = (1L to 4L).flatMap(b =>
      Seq((b, 1L), (b, 1L), (b, 2L), (b, 3L))) :+ ((1L, 4L))
    val df = rows.toDF("basket", "item")
    val out = Analytics.basketAffinity(df, "basket", "item",
        minSupport = 2L, topK = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // pair (1,2): always together → lift = 4 / (4*4/4) = 1.0? n=4
    // baskets, na=nb=np=4 → lift = 4*4/(4*4) = 1.0; conf = 1.0
    assert(out((1L, 2L))._1 == 4L && out((1L, 2L))._3 == 1.0 &&
      out((1L, 2L))._4 == 1.0)
    // all pairs among {1,2,3} have identical counts here; item 4 pairs
    // are pruned by minSupport
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    assert(out.size == 3)
  }

  test("basketAffinity maxItemsPerBasket drops whale-basket pairs but " +
      "keeps whales in the corpus totals") {
    // two tight 2-item baskets + one 5-item whale
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)) ++
      (1L to 5L).map(i => (3L, i))
    val df = rows.toDF("basket", "item")
    val capped = Analytics.basketAffinity(df, "basket", "item",
        minSupport = 1L, topK = 100, maxItemsPerBasket = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // only the (1,2) pair survives — whale-only pairs (3,4) etc. gone
    assert(capped.keySet == Set((1L, 2L)))
    // totals still corpus-wide: 3 baskets, item 1 in 3 baskets
    // np=2, support=2/3, conf=2/3, lift=2*3/(3*3)
    val (np, s, c, l) = capped((1L, 2L))
    assert(np == 2L && s == 0.666667 && c == 0.666667 && l == 0.666667)
    // cap off: whale pairs present
    val full = Analytics.basketAffinity(df, "basket", "item",
        minSupport = 1L, topK = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.contains((3L, 4L)) && full.contains((4L, 5L)))
  }

  test("abTest: zero z for identical variants, sign tracks the mean " +
      "difference, control excluded from output") {
    val df = (Seq.fill(50)(("control", 10.0)) ++
      Seq.fill(50)(("same", 10.0)) ++
      (1 to 50).map(i => ("up", 12.0 + (i % 3)))) // mean ≈ 13, higher
      .zipWithIndex.map { case ((g, v), i) => (g, v + (i % 5) * 0.01) }
      .toDF("g", "v")
    val out = Analytics.abTest(df, "g", "v", control = "control")
      .orderBy("variant").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("same", "up"))
    val same = out(0); val up = out(1)
    assert(math.abs(same.getDouble(4)) < 1.0) // no real difference
    assert(up.getDouble(4) > 10.0, s"expected strong z, got $up")
  }

  test("rollingZScore: spike flagged against prior window, first rows " +
      "unscored (minPrior), zero-variance prior gives null score, the " +
      "spike can't mask itself") {
    val rows = ((1 to 10).map(i => (1L, i.toLong, i.toLong, 5.0)) :+
      (1L, 11L, 11L, 50.0)) ++ // spike after a flat run
      Seq((2L, 1L, 21L, 1.0), (2L, 2L, 22L, 2.0), (2L, 3L, 23L, 3.0))
    val df = rows.toDF("k", "t", "id", "v")
    val out = Analytics.rollingZScore(df, "k", "t", "id", "v",
        lookback = 5, threshold = 2.0)
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
    // key 1: flat prior run → zero variance → null score until the
    // spike arrives; the spike itself IS scored? prior window is flat
    // (variance 0) → null, NOT outlier — document: flat-prior spikes
    // need a variance floor upstream
    val k1 = out.filter(_._1 == 1L)
    assert(k1.take(2).forall(r => r._3.isEmpty && !r._4)) // minPrior
    assert(k1.forall(r => r._3.isEmpty)) // flat priors: all null
    // key 2: increasing values → real variance from row 3:
    // z = (3 − 1.5) / 0.707107 ≈ 2.121 > 2 → flagged
    val k2 = out.filter(_._1 == 2L)
    assert(k2(2)._3.exists(z => math.abs(z - 2.121320) < 1e-6))
    assert(k2(2)._4)
  }

  test("lastTouchAttribution: latest in-window touch wins, same-ts " +
      "touch counts, out-of-window and touchless convert to direct") {
    val ev = Seq(
      // u1: ad at 100, email at 200, purchase at 250 → email
      (1L, "ad", 100L, 1L), (1L, "email", 200L, 2L),
      (1L, "purchase", 250L, 3L),
      // u2: ad at 10, purchase at 500 (window 100) → too old → direct
      (2L, "ad", 10L, 4L), (2L, "purchase", 500L, 5L),
      // u3: touch at the SAME instant as the purchase → counts
      (3L, "ad", 700L, 6L), (3L, "purchase", 700L, 7L),
      // u4: purchase with no touches at all → direct
      (4L, "purchase", 900L, 8L)
    ).toDF("user_id", "event_type", "t", "event_id")
    val out = Analytics.lastTouchAttribution(ev, "user_id", "event_type",
        "t", "event_id", "purchase", windowSeconds = 100L)
      .orderBy("channel")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("email" -> 1L, "ad" -> 1L, "direct" -> 2L))
  }

  test("calendarDim: inclusive bounds, weekend flags, ISO weeks, " +
      "leap-day present") {
    val cal = Analytics.calendarDim(TestSpark.spark,
      "2024-02-28", "2024-03-03").collect()
    assert(cal.length == 5) // inclusive both ends, leap day included
    val byDate = cal.map(r => r.getDate(0).toString ->
      (r.getInt(6), r.getBoolean(7))).toMap
    assert(byDate.contains("2024-02-29"))
    // 2024-03-02 was a Saturday (dow 7), 03-03 a Sunday (dow 1)
    assert(byDate("2024-03-02") == ((7, true)))
    assert(byDate("2024-03-03") == ((1, true)))
    assert(byDate("2024-02-28") == ((4, false))) // Wednesday
  }

  test("skewReport: heaviest keys first, share sums under 1, " +
      "ratio_to_avg reflects the hot key") {
    // key 1: 8 rows; keys 2..5: 1 row each → avg 2.4, hot ratio 8/2.4
    val df = (Seq.fill(8)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("k")
    val out = Analytics.skewReport(df, "k", topK = 3)
      .orderBy(desc("n_rows"), col("k")).collect()
    assert(out.length == 3)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 8L)
    assert(out.head.getDouble(2) == math.rint(8.0 / 12 * 1e6) / 1e6)
    assert(out.head.getDouble(3) == math.rint(8.0 * 5 / 12 * 1e6) / 1e6)
  }

  test("resampleFill: grid spans first..last per key, forward-fills " +
      "gaps, aligned observation wins its grid point, same-ts dups " +
      "collapse deterministically") {
    val obs = Seq(
      // key 1: obs at 0 and 250; grid step 100 → points 0,100,200
      (1L, 0L, 10.0), (1L, 250L, 99.0),
      // key 2: duplicate ts 50 → max wins; single grid point 50
      (2L, 50L, 1.0), (2L, 50L, 7.0)
    ).toDF("k", "t", "v")
    val out = Analytics.resampleFill(obs, "k", "t", "v", stepSeconds = 100L)
      .orderBy("k", "grid_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      // obs at 250 is between grid points: 200 still sees value at 0
      (1L, 0L, 10.0), (1L, 100L, 10.0), (1L, 200L, 10.0),
      (2L, 50L, 7.0)))
  }

  test("triangleCount: K4 gives 3 per node, a pendant edge adds nothing, " +
      "a path has no triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L) /* pendant */).toDF("a", "b")
    val out = Analytics.triangleCount(k4, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Analytics.triangleCount(path, "a", "b").count() == 0)
  }

  test("triangleCount normalizes duplicates, reversed edges and self " +
      "loops, and matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (0 until 140)
      .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val noisy = edges ++ edges.map(e => (e._2, e._1)) ++ Seq((5L, 5L))
    val got = Analytics.triangleCount(noisy.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var exp = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      comb <- nodes.combinations(3)
      Seq(x, y, z) = comb
      if und((x, y)) && und((x, z)) && und((y, z))
    } exp = exp.updated(x, exp(x) + 1).updated(y, exp(y) + 1)
      .updated(z, exp(z) + 1)
    assert(got == exp.filter(_._2 > 0L))
  }

  test("markovTransitions: adjacency counts and row-conditional " +
      "probabilities; same-ts ties break by id; per-from p sums to 1") {
    val ev = Seq(
      // u1: a -> b -> a  (two transitions)
      (1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "a", 30L, 102L),
      // u2: a -> a (self transition)
      (2L, "a", 10L, 200L), (2L, "a", 20L, 201L),
      // u3: same ts — id order decides: b (id 300) -> a (id 301)
      (3L, "a", 50L, 301L), (3L, "b", 50L, 300L),
      // u4: single event — no transition
      (4L, "b", 10L, 400L),
      // u5: null type is dropped, a -> b remains adjacent
      (5L, "a", 10L, 500L), (5L, null, 20L, 501L), (5L, "b", 30L, 502L)
    ).toDF("user_id", "event_type", "t", "event_id")
    val out = Analytics.markovTransitions(ev, "user_id", "event_type",
        "t", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // from a: a->b (u1, u5), a->a (u2) → p(b|a)=2/3, p(a|a)=1/3
    // from b: b->a (u1, u3) → p(a|b)=1
    assert(out == Seq(
      ("a", "a", 1L, 0.333333), ("a", "b", 2L, 0.666667),
      ("b", "a", 2L, 1.0)))
    val sums = Analytics.markovTransitions(ev, "user_id", "event_type",
        "t", "event_id")
      .groupBy("from_type").agg(sum("p").as("sp"))
      .as[(String, Double)].collect()
    sums.foreach { case (_, sp) => assert(math.abs(sp - 1.0) < 1e-5) }
  }

  test("kCore: a triangle with a tail keeps only the triangle at k=2, " +
      "K4 survives k=3, a path has an empty 2-core, and peeling " +
      "cascades (removing a leaf can unravel a chain)") {
    // triangle 1-2-3 with tail 3-4-5
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val core2 = Analytics.kCore(g, "a", "b", k = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // the tail unravels in cascade: 5 falls first, then 4
    assert(core2 == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    assert(Analytics.kCore(k4, "a", "b", k = 3).count() == 4)
    assert(Analytics.kCore(k4, "a", "b", k = 4).count() == 0)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Analytics.kCore(path, "a", "b", k = 2).count() == 0)
  }

  test("kCore matches a brute-force peel on a seeded random graph and " +
      "normalizes duplicates, reversals and self loops") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 120)
      .map(_ => (rnd.nextInt(28).toLong, rnd.nextInt(28).toLong))
    val noisy = edges ++ edges.map(_.swap) ++ Seq((3L, 3L))
    for (k <- Seq(2, 3, 4)) {
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      var nbrs = und.toSeq.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var alive = nbrs.keySet
      var changed = true
      while (changed) {
        val drop = alive.filter(n => (nbrs(n) & alive).size < k)
        changed = drop.nonEmpty
        alive = alive -- drop
      }
      val exp = alive.toSeq.sorted
        .map(n => (n, (nbrs(n) & alive).size.toLong))
      val got = Analytics.kCore(noisy.toDF("a", "b"), "a", "b", k)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      assert(got == exp, s"k=$k")
    }
  }

  test("labelPropagation: disjoint cliques each converge to their min id, " +
      "bridged cliques keep distinct communities, and a simulated " +
      "reference agrees on a seeded random graph") {
    // two disjoint triangles: every node adopts its clique's min id
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val lab = Analytics.labelPropagation(g, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(lab(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(lab(_) == 10L))
    // one bridge edge is outvoted: the cliques stay separate
    val bridged = g.unionByName(Seq((3L, 10L)).toDF("a", "b"))
    val lab2 = Analytics.labelPropagation(bridged, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(lab2.filterKeys(_ <= 3L).values.toSet.size == 1)
    assert(lab2.filterKeys(_ >= 10L).values.toSet.size == 1)
    assert(lab2(1L) != lab2(11L))
    // reference simulation: same vote rule (count desc, min label,
    // self-vote), synchronous rounds
    val rnd = new scala.util.Random(7)
    val edges = (0 until 80)
      .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val und = edges
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nbrs = und.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var ref = nbrs.keySet.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      ref = ref.map { case (n, _) =>
        val votes = (nbrs(n).map(ref) :+ ref(n))
          .groupBy(identity).view.mapValues(_.size).toSeq
        val best = votes.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }
    }
    val got = Analytics.labelPropagation(edges.toDF("a", "b"), "a", "b",
      rounds = 4).as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("mutualInfo: independent columns give exactly zero pmi; " +
      "identical columns give I(A;B) = H(A)") {
    // independent: every (a,b) combination equally often → every cell's
    // ratio is exactly 1 and ln(1) = 0 with no rounding involved
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 5 } yield (a, b)).toDF("a", "b")
    val iOut = Analytics.mutualInfo(ind, "a", "b").collect()
    assert(iOut.length == 4)
    iOut.foreach { r =>
      assert(r.getLong(2) == 5L)
      assert(r.getDouble(3) == 0.0)
      assert(r.getDouble(4) == 0.0)
    }
    // a determines b with a 50/50 split: each observed cell has
    // pmi = ln 2 and contributes 0.5·ln 2, so ΣI = ln 2 = H(A)
    val dep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val mi = Analytics.mutualInfo(dep, "a", "b")
      .agg(sum("mi_contrib")).head().getDouble(0)
    assert(math.abs(mi - math.log(2)) < 2e-6) // two cells rounded at 6dp
  }

  test("edgeJaccard: K4 edges score 1/2, path edges 0; duplicates, " +
      "reversals and self loops normalize away") {
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L), (2L, 2L) /* self loop */)
      .toDF("a", "b")
    val out = Analytics.edgeJaccard(k4, "a", "b")
      .orderBy("a", "b")
      .select("a", "b", "common_cnt", "deg_a", "deg_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length == 6)
    // every K4 edge: 2 common neighbors, both degrees 3 → 2/(3+3−2)
    out.foreach { case (_, _, c, da, db, j) =>
      assert(c == 2L && da == 3L && db == 3L && j == 0.5)
    }
    val path = Analytics.edgeJaccard(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b")
      .orderBy("a", "b")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(path.toSeq == Seq((1L, 2L, 0L, 1L, 2L, 0.0),
      (2L, 3L, 0L, 2L, 1L, 0.0)))
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted " +
      "deduped arrays (long and int, with and without a null element) " +
      "— the r19 edgeJaccard kernel law") {
    val rnd = new scala.util.Random(20260819L)
    val rows = (0 until 400).map { i =>
      def arr(): Seq[Option[Long]] = {
        val base = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
          .distinct.sorted.map(Option(_))
        if (rnd.nextInt(5) == 0) None +: base else base
      }
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("i", "xa", "xb")
    val got = df.select(col("i"),
      graft.functions.SortedIntersectCount.sortedIntersectCount(
        col("xa"), col("xb")).as("fast"),
      size(array_intersect(col("xa"), col("xb"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2), s"row $r"))
    // int-typed twin
    val dfi = rows.map { case (i, a, b) =>
      (i, a.map(_.map(_.toInt)), b.map(_.map(_.toInt))) }
      .toDF("i", "xa", "xb")
    val goti = dfi.select(col("i"),
      graft.functions.SortedIntersectCount.sortedIntersectCount(
        col("xa"), col("xb")).as("fast"),
      size(array_intersect(col("xa"), col("xb"))).as("ref"))
      .collect()
    goti.foreach(r => assert(r.getInt(1) == r.getInt(2), s"row $r"))
  }

  test("edgeJaccard on STRING ids (the generic-kernel fallback) matches " +
      "the long-id result relabeled") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L))
    val longOut = Analytics.edgeJaccard(edges.toDF("a", "b"), "a", "b")
      .orderBy("a", "b")
      .select("a", "b", "common_cnt", "deg_a", "deg_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val strOut = Analytics.edgeJaccard(
        edges.map { case (a, b) => (s"n$a", s"n$b") }.toDF("a", "b"),
        "a", "b")
      .orderBy("a", "b")
      .select("a", "b", "common_cnt", "deg_a", "deg_b", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(strOut == longOut.map { case (a, b, c, da, db, j) =>
      (s"n$a", s"n$b", c, da, db, j) })
  }

  test("edgeJaccard matches brute force on a seeded random graph, and " +
      "the hub cap equals the uncapped result on the hub-free subgraph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 160)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .toSet
    val nbrs = und.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = und.toSeq.sorted.map { case (a, b) =>
      val c = (nbrs(a) & nbrs(b)).size.toLong
      val (da, db) = (nbrs(a).size.toLong, nbrs(b).size.toLong)
      (a, b, c, da, db,
        math.rint(c.toDouble / (da + db - c) * 1e6) / 1e6)
    }
    val got = Analytics.edgeJaccard(edges.toDF("a", "b"), "a", "b")
      .orderBy("a", "b")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == exp)
    // cap law: capping at degree d ≡ deleting every hub (deg > d) and
    // its incident edges, then running uncapped
    val cap = 8
    val hubs = nbrs.filter(_._2.size > cap).keySet
    val sub = edges.filter(e => !hubs(e._1) && !hubs(e._2))
    val capped = Analytics.edgeJaccard(edges.toDF("a", "b"), "a", "b",
        maxDegree = cap)
      .orderBy("a", "b")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val uncappedSub = Analytics.edgeJaccard(sub.toDF("a", "b"), "a", "b")
      .orderBy("a", "b")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(capped == uncappedSub)
    assert(hubs.nonEmpty, "fixture must actually exercise the cap")
  }

  test("skew caps change the WORK BOUND under a power-law fixture, " +
      "not just the answer: capped pair builds stay under the cap's " +
      "combinatorial budget while uncapped builds blow past it") {
    // power-law baskets: one 200-item whale + 30 small baskets (3-7)
    val rnd = new scala.util.Random(41)
    val whale = (0 until 200).map(i => (0L, i.toLong))
    val smallSizes = (1 to 30).map(_ => 3 + rnd.nextInt(5))
    val small = smallSizes.zipWithIndex.flatMap { case (sz, b) =>
      (0 until sz).map(_ => ((b + 1).toLong, rnd.nextInt(40).toLong))
    }
    val df = (whale ++ small).toDF("basket", "item")
    // at minSupport=1/topK=∞, sum(pair_baskets) IS the number of pair
    // rows the build emitted into the rollup — the work observable
    def pairWork(cap: Int): Long =
      Analytics.basketAffinity(df, "basket", "item", minSupport = 1L,
          topK = Int.MaxValue, maxItemsPerBasket = cap)
        .agg(sum("pair_baskets")).as[Long].head()
    val cap = 10
    val uncapped = pairWork(0)
    val cappedW = pairWork(cap)
    // distinct (basket, item) sizes decide the pair counts
    val smallPairBudget = small.distinct.groupBy(_._1)
      .map { case (_, is) => val n = is.map(_._2).distinct.size.toLong
        n * (n - 1) / 2 }.sum
    assert(uncapped >= 200L * 199 / 2,
      s"whale pairs must dominate the uncapped build: $uncapped")
    assert(cappedW <= smallPairBudget && cappedW > 0,
      s"capped build must fit the sub-cap baskets' budget: $cappedW")
    // power-law graph: a degree-120 star + a sparse tail
    val star = (1 to 120).map(i => (0L, i.toLong))
    val tail = (0 until 150)
      .map(_ => (1 + rnd.nextInt(120).toLong, 1 + rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val g = (star ++ tail).toDF("a", "b")
    val dcap = 8
    val un = Analytics.edgeJaccard(g, "a", "b")
      .select("deg_a", "deg_b").as[(Long, Long)].collect()
    val cp = Analytics.edgeJaccard(g, "a", "b", maxDegree = dcap)
      .select("deg_a", "deg_b").as[(Long, Long)].collect()
    // per-edge intersect work is O(deg_a + deg_b): the cap must bound
    // EVERY surviving adjacency array, where uncapped carries the hub
    assert(un.exists(r => r._1 >= 120 || r._2 >= 120),
      "uncapped build must carry the star hub's full adjacency")
    assert(cp.nonEmpty && cp.forall(r => r._1 <= dcap && r._2 <= dcap),
      "capped adjacency arrays must never exceed the cap")
  }

  test("madOutliers: heavy-tailed fixture — the spike is flagged at " +
      "43x the MAD while the bulk stays under 1.2") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("g", _))
      .toDF("g", "v")
    val out = Analytics.madOutliers(df, "g", "v")
      .orderBy("v")
      .select("v", "group_median", "group_mad", "robust_z", "is_outlier")
      .as[(Double, Double, Double, Double, Boolean)].collect().toSeq
    // med = 3.5; devs sorted [.5,.5,1.5,1.5,2.5,96.5] -> mad = 1.5
    assert(out.forall(r => r._2 == 3.5 && r._3 == 1.5))
    assert(out.count(_._5) == 1 && out.last._5)
    assert(math.abs(out.last._4 - 0.6745 * 96.5 / 1.5) < 1e-12)
    assert(out.init.forall(_._4 < 1.2))
  }

  test("ksDrift: identical samples give 0, disjoint give 1, and a " +
      "seeded random split matches the brute-force statistic") {
    def ks(s1: Seq[Long], s2: Seq[Long]): Double = {
      val vs = (s1 ++ s2).distinct.sorted
      val dmax = vs.map(v => math.abs(
        s1.count(_ <= v).toLong * s2.size - s2.count(_ <= v).toLong *
          s1.size)).max
      math.rint(dmax.toDouble / (s1.size.toLong * s2.size) * 1e6) / 1e6
    }
    def run(s1: Seq[Long], s2: Seq[Long]): (Long, Long, Double) = {
      val df = (s1.map((_, 1)) ++ s2.map((_, 0))).toDF("v", "f")
        .withColumn("g", lit("g"))
      Analytics.ksDrift(df, "g", "v", "f")
        .select("n1", "n2", "ks_stat")
        .as[(Long, Long, Double)].head()
    }
    assert(run(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == ((3L, 3L, 0.0)))
    assert(run(Seq(1L, 2L), Seq(10L, 20L)) == ((2L, 2L, 1.0)))
    val rnd = new scala.util.Random(19)
    val a = Seq.fill(400)(rnd.nextInt(50).toLong)
    val b = Seq.fill(300)(rnd.nextInt(50).toLong + 5)
    assert(run(a, b) == ((400L, 300L, ks(a, b))))
  }

  test("lorenzPoints: cum_share is monotone with last bucket 1, equal " +
      "values give the diagonal, and buckets=n reproduces giniByGroup") {
    // group 1: four equal orders -> the diagonal (0.25, 0.5, 0.75, 1.0)
    val eq = (1 to 4).map(i => (1L, i.toLong, 10.0))
    // group 2: seeded skewed values, checked for shape laws + Gini tie-in
    val rnd = new scala.util.Random(23)
    val sk = (1 to 40).map(i => (2L, i.toLong,
      math.rint(math.pow(rnd.nextDouble(), 3) * 10000) / 100 + 0.01))
    val df = (eq ++ sk).toDF("g", "p", "v")
    val out = Analytics.lorenzPoints(df, "g", "p", "v", buckets = 4)
      .orderBy("g", "bucket").as[(Long, Int, Double)].collect().toSeq
    assert(out.filter(_._1 == 1L).map(x => (x._2, x._3))
      == Seq((1, 0.25), (2, 0.5), (3, 0.75), (4, 1.0)))
    val shares = out.filter(_._1 == 2L).map(_._3)
    assert(shares.size == 4 && shares.last == 1.0)
    assert(shares.zip(shares.tail).forall { case (a2, b2) => a2 <= b2 },
      "cum_share must be nondecreasing")
    assert(shares.head > 0.0 && shares.head < 0.25,
      "a skewed group's bottom bucket must fall below the diagonal")
    // with buckets = n (one member per bucket) the discrete Lorenz
    // points determine the Gini exactly: G = 1 - (2*sum(L_k) - 1)/n
    val n = sk.size
    val ls = Analytics.lorenzPoints(sk.toDF("g", "p", "v"), "g", "p", "v",
        buckets = n)
      .orderBy("bucket").as[(Long, Int, Double)].collect().map(_._3)
    val gFromLorenz = 1.0 - (2.0 * ls.sum - 1.0) / n
    val gini = Analytics.giniByGroup(sk.toDF("g", "p", "v"), "g", "p", "v")
      .as[(Long, Long, Double)].head()._3
    assert(math.abs(gFromLorenz - gini) < 1e-4)
  }

  test("cramersV: perfect association gives V=1 with chi2=n, an " +
      "independent table gives 0, and a seeded fixture matches the " +
      "brute force with dof (r-1)(c-1)") {
    def run(rows: Seq[(String, String)]): (Double, Double, Long, Int) = {
      Analytics.cramersV(rows.toDF("a", "b"), "a", "b")
        .as[(Double, Double, Long, Int)].head()
    }
    // perfect 2x2 association: b == a
    val perfect = Seq.fill(6)(("x", "x")) ++ Seq.fill(4)(("y", "y"))
    assert(run(perfect) == ((10.0, 1.0, 10L, 1)))
    // exact independence: count(a,b) = na*nb/n for every cell
    val indep = for {
      (av, ka) <- Seq(("x", 1), ("y", 3))
      (bv, kb) <- Seq(("p", 2), ("q", 1), ("r", 1))
      _ <- 1 to ka * kb
    } yield (av, bv)
    assert(run(indep) == ((0.0, 0.0, 16L, 2)))
    // seeded random 3x4 table vs brute force (same op order per term)
    val rnd = new scala.util.Random(31)
    val as = Seq("a", "b", "c")
    val bs = Seq("p", "q", "r", "s")
    val rows = Seq.fill(500)(
      (as(rnd.nextInt(3)), bs(rnd.nextInt(4))))
    val (chi2, v, nRows, dof) = run(rows)
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val na = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nb = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nn = rows.size.toLong
    // full-grid brute force — zero cells contribute (0-e)^2/e = e
    val chiExp = (for (av <- as; bv <- bs) yield {
      val o = cells.getOrElse((av, bv), 0L)
      val e = na(av).toDouble * nb(bv) / nn
      (o.toDouble - e) * (o.toDouble - e) / e
    }).sum
    assert(nRows == nn && dof == 6)
    assert(math.abs(chi2 - chiExp) < 1e-6)
    assert(v >= 0.0 && v <= 1.0)
    assert(math.abs(v - math.sqrt(chiExp / (nn * 2))) < 1e-6)
  }

  test("approx twins: madOutliersApprox and runsTestApprox agree " +
      "bit-for-bit with the exact forms on odd groups under the " +
      "accuracy bound; a low-accuracy sketch still lands within its " +
      "rank-error bound and still flags the planted whale") {
    // identity law — odd group sizes, n << accuracy: the GK sketch is
    // lossless and odd-count exact medians interpolate nothing
    val fx = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 7.0).map(("g", _)) ++
      Seq(10.0, 20.0, 30.0).map(("h", _))).toDF("g", "v")
    val exact = Analytics.madOutliers(fx, "g", "v").orderBy("g", "v")
      .as[(String, Double, Double, Double, Double, Boolean)].collect().toSeq
    val approx = Analytics.madOutliersApprox(fx, "g", "v").orderBy("g", "v")
      .as[(String, Double, Double, Double, Double, Boolean)].collect().toSeq
    assert(approx == exact)
    val days = Seq(1.0, 1.0, 2.0, 3.0, 3.0).zipWithIndex
      .map { case (v, d) => ("g", d.toLong, v) }.toDF("g", "day", "v")
      .withColumn("ts", timestamp_micros(col("day") * 86400000000L))
    assert(Analytics.runsTestApprox(days, "g", "ts", "v")
        .as[(String, Long, Long, Long, Double)].head()
      == Analytics.runsTest(days, "g", "ts", "v")
        .as[(String, Long, Long, Long, Double)].head())
    // tolerance law — 10001 distinct values + one whale, accuracy 100:
    // the approx median must be a real group value within n/accuracy
    // ranks of the true median, and the whale must still flag
    val big = ((0 to 10000).map(i => ("g", i.toDouble)) :+ ("g", 1e6))
      .toDF("g", "v")
    val out = Analytics.madOutliersApprox(big, "g", "v", accuracy = 100)
      .select("v", "group_median", "is_outlier")
      .as[(Double, Double, Boolean)].collect()
    val med = out.head._2
    val n = 10002.0
    assert(med == math.rint(med) && med >= 0 && med <= 10000,
      "approx median must be an actual group value")
    assert(math.abs(med - 5000.0) <= n / 100 + 1,
      s"rank error beyond the GK bound: $med")
    assert(out.filter(_._1 == 1e6).forall(_._3), "whale must flag")
    assert(out.count(_._3) < 100, "the bulk must not flag")
  }

  test("runsTest: alternation inflates runs (z>0), clustering deflates " +
      "(z<0), and exact-median days are excluded") {
    def z(n1: Long, n2: Long, runs: Long): Double = {
      val num = runs.toDouble -
        (2.0 * n1 * n2 / (n1 + n2) + 1)
      val den = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
        ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1)))
      math.rint(num / den * 1e6) / 1e6
    }
    def run(vals: Seq[Double]): (Long, Long, Long, Double) = {
      val df = vals.zipWithIndex
        .map { case (v, d) => ("g", d.toLong, v) }.toDF("g", "day", "v")
        .withColumn("ts", timestamp_micros(col("day") * 86400000000L))
      Analytics.runsTest(df, "g", "ts", "v")
        .select("n1", "n2", "runs", "z")
        .as[(Long, Long, Long, Double)].head()
    }
    // perfectly alternating 10 days: median 2 (interpolated), 10 runs
    val alt = run(Seq.tabulate(10)(d => if (d % 2 == 0) 1.0 else 3.0))
    assert(alt == ((5L, 5L, 10L, z(5, 5, 10))) && alt._4 > 0)
    // fully clustered 8 days: 2 runs
    val clu = run(Seq.fill(4)(1.0) ++ Seq.fill(4)(3.0))
    assert(clu == ((4L, 4L, 2L, z(4, 4, 2))) && clu._4 < 0)
    // 5 days 1,1,2,3,3: the exact-median day (2) is excluded -> the
    // remaining sequence 1,1,3,3 has n1=n2=2 and 2 runs
    val med = run(Seq(1.0, 1.0, 2.0, 3.0, 3.0))
    assert(med == ((2L, 2L, 2L, z(2, 2, 2))))
  }

  test("bfsDistances matches brute-force BFS on a seeded digraph; " +
      "maxDepth truncates; unreachable nodes are absent") {
    val rnd = new scala.util.Random(13)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2) ++ Seq((100L, 101L)) // island
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = Seq(0L, 7L)
    def bf(maxDepth: Int): Map[Long, Int] = {
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (d <- 1 to maxDepth) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(dist.keySet)
        dist ++= next.map(_ -> d)
        frontier = next
      }
      dist
    }
    for (depth <- Seq(0, 1, 2, 5)) {
      val got = Analytics.bfsDistances(edges.toDF("s", "t"), "s", "t",
          seeds.toDF("n"), "n", maxDepth = depth)
        .orderBy("id").as[(Long, Int)].collect().toSeq
      assert(got == bf(depth).toSeq.sortBy(_._1), s"depth=$depth")
      assert(!got.exists(_._1 >= 100L), "island must stay unreachable")
    }
  }

  test("dowProfile: weekday from integer epoch-day arithmetic " +
      "(2024-01-07 is a Sunday -> 0), shares sum to one per group") {
    val df = Seq(
      ("g1", "2024-01-07", 10.00), // Sunday   -> dow 0
      ("g1", "2024-01-08", 20.00), // Monday   -> dow 1
      ("g1", "2024-01-14", 30.00), // Sunday   -> dow 0
      ("g2", "2024-01-13", 5.00)   // Saturday -> dow 6
    ).toDF("g", "ds", "v").withColumn("day", to_date(col("ds")))
    val out = Analytics.dowProfile(df, "g", "day", "v")
      .orderBy("g", "dow")
      .select("g", "dow", "revenue_cents", "share")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(out == Seq(("g1", 0, 4000L, 0.666667), ("g1", 1, 2000L,
      0.333333), ("g2", 6, 500L, 1.0)))
  }

  test("degreeDistribution: K4 plus a pendant edge, with duplicate, " +
      "reversed and self-loop noise normalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (3L, 3L)).toDF("a", "b")
    val out = Analytics.degreeDistribution(edges, "a", "b")
      .orderBy("degree").as[(Long, Long)].collect().toSeq
    // degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 1
    assert(out == Seq((1L, 1L), (3L, 3L), (4L, 1L)))
  }

  test("skyline2D matches the brute-force strict-dominance frontier on " +
      "seeded points with ties, independent of input partitioning") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 500)
      .map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
    val exp = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) => qx > x && qy > y }
    }.map(_._1).sorted
    for (parts <- Seq(1, 7, 32)) {
      val got = Analytics.skyline2D(
          pts.toDF("id", "x", "y").repartition(parts), "id", "x", "y")
        .orderBy("id").select("id").as[Long].collect().toSeq
      assert(got == exp, s"parts=$parts")
    }
  }

  test("skyline2D anti-correlated worst case: no row dominates any " +
      "other, the full input survives (the documented phase-2 bound)") {
    // x and y inversely ranked — the skyline IS the whole input, so
    // the local pass prunes nothing and phase 2 sees all n rows in
    // one window partition. This fixture pins the documented bound:
    // output-sized work, exact result, no row lost or invented.
    val n = 2000
    val pts = (0 until n).map(i => (i.toLong, i.toLong, (n - 1 - i).toLong))
    val got = Analytics.skyline2D(
        pts.toDF("id", "x", "y").repartition(16), "id", "x", "y")
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == (0 until n).map(_.toLong))
    // and equal-x ties on the frontier are all kept (strict dominance)
    val tied = Seq((1L, 5L, 9L), (2L, 5L, 9L), (3L, 1L, 1L))
    val gotTied = Analytics.skyline2D(tied.toDF("id", "x", "y"),
        "id", "x", "y")
      .select("id").as[Long].collect().toSeq.sorted
    assert(gotTied == Seq(1L, 2L))
  }

  test("skyline2DBucketed is result-identical to skyline2D on random, " +
      "anti-correlated, and tied fixtures, across partitionings and " +
      "bucket counts") {
    val rnd = new scala.util.Random(11)
    val random = (0 until 500)
      .map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
    val anti = (0 until 500)
      .map(i => (i.toLong, i.toLong, (499 - i).toLong))
    val tied = Seq((1L, 5L, 9L), (2L, 5L, 9L), (3L, 1L, 1L),
      (4L, 5L, 1L), (5L, 1L, 9L))
    for (pts <- Seq(random, anti, tied); parts <- Seq(1, 7);
         nb <- Seq(1, 8, 64)) {
      val df = pts.toDF("id", "x", "y").repartition(parts)
      val exp = Analytics.skyline2D(df, "id", "x", "y")
        .select("id").as[Long].collect().toSet
      val got = Analytics.skyline2DBucketed(df, "id", "x", "y", nb)
        .select("id").as[Long].collect().toSet
      assert(got == exp, s"n=${pts.size} parts=$parts nb=$nb")
    }
    // NULL x must not be mis-bucketed into the top range: both forms
    // treat null x as "never dominates, dominated by any larger y"
    val withNulls = Seq((1L, Some(5L), 100L), (2L, None, 200L),
      (3L, Some(9L), 40L), (4L, None, 50L), (5L, Some(2L), 150L))
    for (nb <- Seq(1, 8, 64)) {
      val df = withNulls.toDF("id", "x", "y").repartition(3)
      val exp = Analytics.skyline2D(df, "id", "x", "y")
        .select("id").as[Long].collect().toSet
      val got = Analytics.skyline2DBucketed(df, "id", "x", "y", nb)
        .select("id").as[Long].collect().toSet
      assert(got == exp, s"null-x fixture nb=$nb: $got != $exp")
    }
    // NaN x must not be mis-bucketed into bucket 0: Spark sorts NaN
    // as the LARGEST double (a NaN-x row is never dominated and its y
    // prunes every finite-x row), but floor(NaN).cast(int) is 0 —
    // without the explicit top-bucket route the cross-bucket __pmax
    // filter wrongly kills NaN rows (ADVICE r10). Mixed fixture: NaN,
    // null, and finite x, with a NaN row whose y prunes most of the
    // frontier and a NaN row that itself survives only via strict
    // dominance ties.
    val nan = Double.NaN
    val withNaN = Seq((1L, 5.0, 100L), (2L, nan, 200L), (3L, 9.0, 40L),
      (4L, nan, 50L), (5L, 2.0, 150L), (6L, 7.0, 300L),
      (7L, Double.MaxValue, 10L))
      .toDF("id", "x", "y")
      .union(Seq((8L, Option.empty[Double], 250L)).toDF("id", "x", "y"))
    for (nb <- Seq(1, 8, 64); parts <- Seq(1, 3)) {
      val df = withNaN.repartition(parts)
      val exp = Analytics.skyline2D(df, "id", "x", "y")
        .select("id").as[Long].collect().toSet
      val got = Analytics.skyline2DBucketed(df, "id", "x", "y", nb)
        .select("id").as[Long].collect().toSet
      assert(got == exp, s"NaN-x fixture nb=$nb parts=$parts: $got != $exp")
    }
  }

  test("skyline2DBucketed never runs a single-partition window, even " +
      "on the anti-correlated worst case where all rows survive") {
    val n = 2000
    val pts = (0 until n).map(i => (i.toLong, i.toLong, (n - 1 - i).toLong))
    val df = Analytics.skyline2DBucketed(
      pts.toDF("id", "x", "y").repartition(16), "id", "x", "y")
    assert(df.count() == n.toLong)
    val planNode = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val globalWin = planNode.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.child.outputPartitioning ==
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition => w
    }
    assert(globalWin.isEmpty, s"single-partition window in:\n$planNode")
  }

  test("benfordDigits: digits from exact cents, non-positive excluded, " +
      "shares sum to one, expected column is Benford's law") {
    val df = Seq(1.23, 12.0, 19.99, 0.45, 9.0, -5.0, 0.0).toDF("v")
    val out = Analytics.benfordDigits(df, "v").orderBy("digit")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1, 3L), (4, 1L), (9, 1L)))
    assert(out.map(_._3) == Seq(0.6, 0.2, 0.2))
    assert(out.map(_._4) == Seq(0.30103, 0.09691, 0.045757))
  }

  test("autocorrLag: a linear ramp is +1, an alternating series is -1, " +
      "groups with too few days are dropped") {
    val rows =
      (0 until 30).map(i => ("ramp", i, 100.0 + i)) ++
      (0 until 30).map(i => ("alt", i, if (i % 2 == 0) 10.0 else 20.0)) ++
      Seq(("tiny", 0, 5.0), ("tiny", 1, 6.0)) // 1 pair -> dropped
    val df = rows.toDF("g", "i", "v")
      .withColumn("day", expr("date_add(date '2024-01-01', i)"))
    val out = Analytics.autocorrLag(df, "g", "day", "v")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("alt", "ramp"))
    assert(out.map(_._2) == Seq(29L, 29L))
    assert(out.find(_._1 == "ramp").get._3 == 1.0)
    assert(out.find(_._1 == "alt").get._3 == -1.0)
    // lag-2 of the alternating series compares same-phase values -> +1
    val l2 = Analytics.autocorrLag(df.filter(col("g") === "alt"),
        "g", "day", "v", lagDays = 2)
      .as[(String, Long, Double)].head()
    assert(l2._2 == 28L && l2._3 == 1.0)
  }

  test("ewmaSmooth: first day seeds, same-day rows sum before " +
      "smoothing, groups are independent, alpha=1 is the identity") {
    val df = Seq(
      ("g1", "2024-01-01", 1.00), ("g1", "2024-01-02", 2.00),
      ("g1", "2024-01-03", 3.00), ("g1", "2024-01-03", 1.00),
      ("g2", "2024-01-05", 7.00))
      .toDF("g", "d", "v").withColumn("d", col("d").cast("date"))
    val out = Analytics.ewmaSmooth(df, "g", "d", "v", alpha = 0.3)
      .orderBy("g", "day")
      .as[(String, Long, Double)].collect()
    assert(out.length == 4)
    // g1 daily: 1.00, 2.00, 4.00 → ewma 1.0, .3·2+.7·1=1.3, .3·4+.7·1.3=2.11
    assert(math.abs(out(0)._3 - 1.0) < 1e-9)
    assert(math.abs(out(1)._3 - 1.3) < 1e-9)
    assert(math.abs(out(2)._3 - 2.11) < 1e-9)
    // g2 is seeded by its own first day, never by g1's tail
    assert(out(3)._1 == "g2" && math.abs(out(3)._3 - 7.0) < 1e-9)
    // days are consecutive epoch days for g1
    assert(out(1)._2 == out(0)._2 + 1 && out(2)._2 == out(1)._2 + 1)
    // alpha = 1: ewma ≡ the daily series, bit-exact
    val id = Analytics.ewmaSmooth(df, "g", "d", "v", alpha = 1.0)
      .orderBy("g", "day").as[(String, Long, Double)].collect()
    assert(id.map(_._3).toSeq == Seq(1.0, 2.0, 4.0, 7.0))
    // 150-day series spans three 64-day fold blocks: the blocked fold
    // must be BIT-identical to the naive sequential recurrence across
    // every block boundary (re-association moves array boundaries,
    // never the arithmetic order)
    val days = (0 until 150).map(i =>
      ("g", java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i.toLong)), (i % 7 + 1) * 1.0))
    val long = days.toDF("g", "d", "v")
    val got = Analytics.ewmaSmooth(long, "g", "d", "v", alpha = 0.3)
      .orderBy("day").as[(String, Long, Double)].collect().map(_._3)
    val a = 0.3; val b = 1.0 - a
    val cents = days.map(_._3 * 100).map(v => math.rint(v))
    val exp = cents.tail.scanLeft(cents.head)((p, v) => a * v + b * p)
      .map(_ / 100)
    assert(got.length == 150)
    assert(got.toSeq == exp.toSeq, "blocked fold diverged from the " +
      "sequential recurrence")
  }

  // ── k_core oracle unroll margin ──────────────────────────────────────

  test("k_core's fixed oracle unroll (16 rounds) covers the gate " +
      "fixture's actual peel depth (10 at sf0.01) with margin") {
    // the unrolled DuckDB twin is only correct when its depth COVERS
    // the data-dependent fixpoint (extra rounds are idempotent; too
    // few silently accept a superset of the true core) — so pin the
    // sf0.01 co-purchase peel depth far below the unroll
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = scala.collection.mutable.Map[(Long, Long), Int]()
    for {
      items <- li.groupBy(_._1).valuesIterator
        .map(_.map(_._2).distinct.sorted)
      i <- items.indices; j <- (i + 1) until items.length
    } {
      val k = (items(i), items(j))
      pairCount(k) = pairCount.getOrElse(k, 0) + 1
    }
    // iterator first: collect-on-Map would rebuild a MAP from the
    // (Long, Long) edge tuples, silently deduplicating by source node
    val edges = pairCount.iterator
      .collect { case (k, c) if c >= 2 => k }.toSeq
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = scala.collection.mutable.Map[Long, Int]()
      for ((a, b) <- edges if alive(a) && alive(b)) {
        deg(a) = deg.getOrElse(a, 0) + 1
        deg(b) = deg.getOrElse(b, 0) + 1
      }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= 3)
      changed = next != alive
      if (changed) rounds += 1
      alive = next
    }
    assert(rounds <= 12,
      s"peel depth $rounds at sf0.01 — the oracle's 16-round unroll " +
        "is losing its safety margin; raise it")
    assert(alive.nonEmpty, s"fixture degenerated: empty 3-core " +
      s"(edges=${edges.length} rounds=$rounds)")
  }

  // ── ksTest ───────────────────────────────────────────────────────────

  private def ksBrute(a: Seq[Long], b: Seq[Long]): (BigInt, Long) = {
    // direct ECDF sup over the pooled distinct grid, exact integers
    val grid = (a ++ b).distinct.sorted
    val pairs = grid.map { x =>
      val dn = (BigInt(a.count(_ <= x)) * b.length -
        BigInt(b.count(_ <= x)) * a.length).abs
      (dn, x)
    }
    val mx = pairs.map(_._1).max
    (mx, pairs.filter(_._1 == mx).map(_._2).min)
  }

  test("ksTest matches the brute-force ECDF sup on tie-heavy data") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(300)(rnd.nextInt(40).toLong)
    val b = Seq.fill(200)((rnd.nextInt(40) + rnd.nextInt(10)).toLong)
    val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
    val row = Analytics.ksTest(df, "v", col("isa"), nBuckets = 7)
      .collect()(0)
    val (dn, at) = ksBrute(a, b)
    assert(row.getAs[Long]("n_a") == 300L && row.getAs[Long]("n_b") == 200L)
    val expD = BigDecimal(dn).toDouble / (300.0 * 200.0)
    assert(math.abs(row.getAs[Double]("ks_d") - expD) < 5e-7,
      s"ks_d ${row.getAs[Double]("ks_d")} vs $expD")
    assert(row.getAs[Long]("at_value") == at)
  }

  test("ksTest is invariant to bucket count and partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(100).toLong, rnd.nextBoolean()))
    val base = Analytics.ksTest(rows.toDF("v", "isa"), "v", col("isa"),
      nBuckets = 1).collect()(0)
    for (nb <- Seq(3, 64); np <- Seq(1, 13)) {
      val got = Analytics.ksTest(rows.toDF("v", "isa").repartition(np),
        "v", col("isa"), nBuckets = nb).collect()(0)
      assert(got == base, s"nBuckets=$nb np=$np diverged")
    }
  }

  test("ksTest endpoints: identical samples give 0, disjoint give 1") {
    val same = (1L to 50L).flatMap(v => Seq((v, true), (v, false)))
    val r0 = Analytics.ksTest(same.toDF("v", "isa"), "v", col("isa"))
      .collect()(0)
    assert(r0.getAs[Double]("ks_d") == 0.0)
    val disj = (1L to 50L).map((_, true)) ++ (100L to 149L).map((_, false))
    val r1 = Analytics.ksTest(disj.toDF("v", "isa"), "v", col("isa"))
      .collect()(0)
    assert(r1.getAs[Double]("ks_d") == 1.0)
    assert(r1.getAs[Long]("at_value") == 50L)
    // one empty class → null statistic, not a crash
    val r2 = Analytics.ksTest(Seq((1L, true), (2L, true)).toDF("v", "isa"),
      "v", col("isa")).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("ks_d")))
  }

  // ── w1Drift ──────────────────────────────────────────────────────────

  test("w1Drift matches the brute-force earth-mover integral and a " +
      "pure translation costs exactly its shift") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(250)(rnd.nextInt(500).toLong)
    val b = Seq.fill(150)((rnd.nextInt(500) + rnd.nextInt(100)).toLong)
    val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
    val got = Analytics.w1Drift(df, "v", col("isa"), nBuckets = 9)
      .collect()(0).getAs[Double]("w1")
    // brute force: sum over the sorted grid of |F_A - F_B| * gap
    val grid = (a ++ b).distinct.sorted
    val exp = grid.sliding(2).map { case Seq(p, s) =>
      val fa = a.count(_ <= p).toDouble / a.size
      val fb = b.count(_ <= p).toDouble / b.size
      math.abs(fa - fb) * (s - p)
    }.sum
    assert(math.abs(got - exp) < 1e-5, s"$got vs $exp")
    // W1 between X and X + δ is exactly δ
    val shifted = (a.map((_, true)) ++ a.map(v => (v + 37L, false)))
      .toDF("v", "isa")
    val w = Analytics.w1Drift(shifted, "v", col("isa")).collect()(0)
    assert(w.getAs[Double]("w1") == 37.0, s"translation: $w")
  }

  test("w1Drift is invariant to bucket count and partitioning, zero on " +
      "identical samples, null on an empty class") {
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(400)((rnd.nextInt(80).toLong, rnd.nextBoolean()))
    val base = Analytics.w1Drift(rows.toDF("v", "isa"), "v", col("isa"),
      nBuckets = 1).collect()(0)
    for (nb <- Seq(5, 64); np <- Seq(1, 11)) {
      val got = Analytics.w1Drift(rows.toDF("v", "isa").repartition(np),
        "v", col("isa"), nBuckets = nb).collect()(0)
      assert(got == base, s"nBuckets=$nb np=$np diverged")
    }
    val same = (1L to 40L).flatMap(v => Seq((v, true), (v, false)))
    assert(Analytics.w1Drift(same.toDF("v", "isa"), "v", col("isa"))
      .collect()(0).getAs[Double]("w1") == 0.0)
    val onesided = Seq((1L, false), (2L, false)).toDF("v", "isa")
    val r = Analytics.w1Drift(onesided, "v", col("isa")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("w1")))
  }

  // ── psiDrift ─────────────────────────────────────────────────────────

  test("psiDrift: identical distributions give zero, grid is complete") {
    val rows = (1 to 200).flatMap { i =>
      Seq((i * 37.0 % 400, true), (i * 37.0 % 400, false))
    }
    val out = Analytics.psiDrift(rows.toDF("v", "isb"), "v", col("isb"),
      binWidthCents = 5000L, nBins = 8).orderBy("bin").collect()
    assert(out.length == 8, "PSI is defined on the full bin grid")
    assert(out.map(_.getAs[Int]("bin")).toSeq == (0 until 8))
    out.foreach { r =>
      assert(r.getAs[Double]("psi_term") == 0.0)
      assert(r.getAs[Double]("psi_total") == 0.0)
    }
  }

  test("psiDrift detects a shifted distribution and clamps outliers") {
    val base = (1 to 300).map(i => ((i % 50) * 10.0, true))
    val cur = (1 to 300).map(i => ((i % 50) * 10.0 + 300.0, false))
    val out = Analytics.psiDrift((base ++ cur).toDF("v", "isb"), "v",
      col("isb"), binWidthCents = 10000L, nBins = 6).collect()
    val total = out.head.getAs[Double]("psi_total")
    assert(total > 0.5, s"shift must register, got $total")
    assert(out.map(_.getAs[Double]("psi_total")).distinct.length == 1)
    // values beyond the grid clamp into the top bin, negatives into 0
    val clamp = Analytics.psiDrift(
      Seq((-5.0, true), (1e9, false)).toDF("v", "isb"), "v", col("isb"),
      binWidthCents = 100L, nBins = 3).orderBy("bin").collect()
    assert(clamp(0).getAs[Long]("n_base") == 1L)
    assert(clamp(2).getAs[Long]("n_cur") == 1L)
  }

  test("psiDrift total equals the sum of its per-bin terms") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(400)((rnd.nextInt(1000) / 10.0, rnd.nextBoolean()))
    val out = Analytics.psiDrift(rows.toDF("v", "isb"), "v", col("isb"),
      binWidthCents = 1000L, nBins = 10).collect()
    val sum = out.map(_.getAs[Double]("psi_term")).sum
    val total = out.head.getAs[Double]("psi_total")
    assert(math.abs(sum - total) < 1e-9)
  }

  // ── driftSeries ──────────────────────────────────────────────────────

  test("driftSeries: a bucket matching the reference histogram scores " +
      "exactly zero PSI, a concentrated bucket scores high, and " +
      "reference-only buckets never enter the series") {
    // bins 0..3 at binWidth 100 cents: value v lands in bin v
    def rows(bucket: String, isRef: Boolean, hist: Seq[Int]) =
      hist.zipWithIndex.flatMap { case (n, bin) =>
        Seq.fill(n)((bucket, isRef, bin.toDouble)) }
    val df = (rows("ref_window", isRef = true, Seq(10, 20, 30, 40)) ++
        rows("b_same", isRef = false, Seq(10, 20, 30, 40)) ++
        rows("b_shift", isRef = false, Seq(100, 0, 0, 0)))
      .toDF("b", "r", "v")
    val out = Analytics.driftSeries(df, "v", col("r"), col("b"),
      binWidthCents = 100L, nBins = 4)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("b_same", "b_shift"),
      s"reference-only bucket leaked into: ${out.toSeq}")
    val same = out.find(_._1 == "b_same").get
    val shift = out.find(_._1 == "b_shift").get
    // identical histogram + identical totals ⇒ p == q in every bin ⇒
    // every micro-nat term is exactly 0
    assert(same == ("b_same", 100L, 100L, 0.0), s"got $same")
    assert(shift._2 == 100L && shift._3 == 100L)
    assert(shift._4 > 0.5, s"concentrated bucket scored ${shift._4}")
  }

  // ── spearmanByGroup ──────────────────────────────────────────────────

  test("spearman: monotone association is ±1, ties match brute force") {
    val up = (1 to 20).map(i => ("g1", i.toLong, (i * i).toLong))
    val down = (1 to 20).map(i => ("g2", i.toLong, (100 - i).toLong))
    val out = Analytics.spearmanByGroup(
        (up ++ down).toDF("g", "x", "y"), "g", "x", "y")
      .orderBy("g").collect()
    assert(out(0).getAs[Double]("spearman") == 1.0)
    assert(out(1).getAs[Double]("spearman") == -1.0)
  }

  test("spearman: average-rank ties match the direct definition") {
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(60)(rnd.nextInt(8).toLong)   // heavy ties
    val ys = Seq.fill(60)(rnd.nextInt(8).toLong)
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val got = Analytics.spearmanByGroup(df, "g", "x", "y")
      .collect()(0).getAs[Double]("spearman")
    // brute force: average ranks, then Pearson
    def avgRanks(v: Seq[Long]): Seq[Double] = {
      val sorted = v.sorted.zipWithIndex
      val byVal = sorted.groupBy(_._1)
        .map { case (k, g) => k -> (g.map(_._2 + 1).sum.toDouble / g.size) }
      v.map(byVal)
    }
    val rx = avgRanks(xs); val ry = avgRanks(ys)
    val n = rx.length
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    val exp = cov / math.sqrt(vx) / math.sqrt(vy)
    assert(math.abs(got - exp) < 1e-6, s"$got vs $exp")
  }

  test("spearman: degenerate groups yield null, not garbage") {
    val df = Seq(("a", 1L, 2L), ("b", 3L, 1L), ("b", 3L, 9L))
      .toDF("g", "x", "y")   // a: n=1; b: x all tied (zero rank variance)
    val out = Analytics.spearmanByGroup(df, "g", "x", "y")
      .orderBy("g").collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("spearman"))))
  }
}
