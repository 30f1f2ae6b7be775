package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Extensions, Features}

/** ScalaCheck properties for the algebraic operators (SURVEY.md §5 item
  * 3). Generators are driven directly with fixed seeds (the
  * scalatest↔scalacheck bridge isn't in this offline cache) — 5 cases
  * per property, each case a Spark job, reproducible run to run.
  */
class PropertiesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** forAll stand-in: sample `gen` with seeds 1..5, run the check. */
  def forAll[T](gen: Gen[T])(check: T => Unit): Unit =
    (1 to 5).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)) match {
        case Some(v) => check(v)
        case None    => ()
      }
    }

  def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  val smallDoubles: Gen[List[(Double, Double)]] =
    Gen.listOfN(6, Gen.zip(Gen.chooseNum(-100.0, 100.0),
      Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-10.0, 10.0))))

  test("ratio guard: zero denominator always yields 0, else n/d") {
    forAll(smallDoubles) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("n", "d")
        val out = Features.ratioFeatures(df, Seq("n"), Seq("d"))
          .select("n", "d", "n_to_d_ratio").as[(Double, Double, Double)]
          .collect()
        out.foreach { case (n, d, r) =>
          if (d == 0.0) assert(r == 0.0) else assert(r == n / d)
        }
      }
    }
  }

  test("interaction features commute: a_x_b equals b*a") {
    forAll(smallDoubles) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("a", "b")
        val out = Features.interactionFeatures(df, Seq("a", "b"))
          .select("a", "b", "a_x_b").as[(Double, Double, Double)].collect()
        out.foreach { case (a, b, ab) => assert(ab == b * a) }
      }
    }
  }

  test("rolling window of size 0 is the identity") {
    forAll(Gen.listOfN(6, Gen.chooseNum(-50.0, 50.0))) { vs =>
      whenever(vs.nonEmpty) {
        val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
          .toDF("user_id", "event_id", "value")
        val out = Features.rollingFeatures(df, Seq("user_id"), "event_id",
          Seq("value"), Seq(0))
          .select("value", "value_rolling_mean_0", "value_rolling_sum_0")
          .as[(Double, Double, Double)].collect()
        out.foreach { case (v, m, s) => assert(m == v && s == v) }
      }
    }
  }

  test("mean impute leaves no nulls and preserves non-null values") {
    val genRows = Gen.listOfN(6,
      Gen.option(Gen.chooseNum(-50.0, 50.0))).suchThat(_.exists(_.isDefined))
    forAll(genRows) { vs =>
      val df = vs.toDF("v")
      val out = Features.meanImpute(df, Seq("v"))
      assert(out.filter(col("v_imputed").isNull).count() == 0)
      assert(out.filter(col("v").isNotNull &&
        col("v") =!= col("v_imputed")).count() == 0)
    }
  }

  test("exact dedup is idempotent") {
    forAll(Gen.listOfN(8, Gen.oneOf("a", "b", "c"))) { texts =>
      whenever(texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val once = Extensions.dedupExact(df, Seq("text"), "doc_id")
        val twice = Extensions.dedupExact(once, Seq("text"), "doc_id")
        assert(once.count() == twice.count())
        assert(once.count() == texts.distinct.size)
      }
    }
  }

  val joinRows: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] =
    Gen.zip(
      Gen.listOfN(8, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 50L))),
      Gen.listOfN(6, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 50L))
        .map { case (k, t) => (k, t, k * 100.0 + t) }))

  test("as-of join equals the naive per-row maximum-prior lookup") {
    forAll(joinRows) { case (ls, rs) =>
      whenever(ls.nonEmpty) {
        // unique right time keys per key (the operator's documented
        // requirement): dedupe (k, t)
        val rd = rs.groupBy(r => (r._1, r._2)).map(_._2.head).toList
        val left = ls.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("lid", "k", "lt")
        val right = rd.toDF("rk", "rt", "price")
        val got = graft.operators.AsOfJoin
          .asOf(left, right, "k", "rk", "lt", "rt", Seq("price"))
          .select("lid", "price").as[(Long, Option[Double])]
          .collect().toMap
        ls.zipWithIndex.foreach { case ((k, t), i) =>
          val expected = rd.filter(r => r._1 == k && r._2 <= t)
            .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
          assert(got(i.toLong) == expected,
            s"lid=$i k=$k t=$t: got ${got(i.toLong)}, want $expected")
        }
      }
    }
  }

  test("banded range join equals the naive cross filter on random data") {
    forAll(joinRows) { case (ls, rs) =>
      whenever(ls.nonEmpty && rs.nonEmpty) {
        val left = ls.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("lid", "k", "lt")
        val right = rs.zipWithIndex
          .map { case ((k, t, _), i) => (i.toLong, k, t) }
          .toDF("rid", "rk", "rt")
        val banded = graft.operators.RangeJoin
          .bandedWithin(left, right, "k", "rk", "lt", "rt", 7L)
          .select("lid", "rid").as[(Long, Long)].collect().toSet
        val naive = (for {
          ((lk, lt), li) <- ls.zipWithIndex
          ((rk, rt, _), ri) <- rs.zipWithIndex
          if lk == rk && math.abs(lt - rt) <= 7
        } yield (li.toLong, ri.toLong)).toSet
        assert(banded == naive)
      }
    }
  }

  /** Mirror of the engine's selection hash: md5 over the UTF-8 bytes of
    * the key's decimal string, lowercase hex.
    */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stratified sample equals the naive per-stratum md5-order pick") {
    val genRows = Gen.listOfN(30, Gen.zip(Gen.oneOf("x", "y", "z"),
      Gen.chooseNum(0L, 10000L)))
    forAll(genRows) { rows =>
      // unique keys (the hash of the key drives selection)
      val rs = rows.groupBy(_._2).map(_._2.head).toList
      whenever(rs.nonEmpty) {
        val df = rs.toDF("stratum", "key")
        val got = Extensions.stratifiedSample(df, "stratum", "key", 0.3)
          .select("key").as[Long].collect().toSet
        val naive = rs.groupBy(_._1).flatMap { case (_, g) =>
          val k = math.ceil(g.size * 0.3).toInt
          g.sortBy(r => (md5hex(r._2.toString), r._2)).take(k).map(_._2)
        }.toSet
        assert(got == naive)
      }
    }
  }

  test("dedup exact survivor is exactly the min key per dupe value") {
    forAll(Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d"))) { texts =>
      whenever(texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = Extensions.dedupExact(df, Seq("text"), "doc_id")
          .select("doc_id").as[Long].collect().toSet
        val naive = texts.zipWithIndex.groupBy(_._1)
          .map { case (_, g) => g.map(_._2).min.toLong }.toSet
        assert(got == naive)
      }
    }
  }

  test("dedupBest survivor is exactly the per-group (max quality, min key)") {
    val groups: Gen[List[(Long, Int, Int)]] =
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 100L),
        Gen.chooseNum(0, 3), Gen.chooseNum(0, 5)))
    forAll(groups) { rows =>
      whenever(rows.map(_._1).distinct.size == rows.size) {
        val df = rows.toDF("id", "grp", "q")
        val out = Extensions.dedupBest(df, Seq("grp"), "id", "q")
          .select("id").as[Long].collect().toSet
        val expect = rows.groupBy(_._2).values.map { g =>
          g.minBy(r => (-r._3, r._1))._1
        }.toSet
        assert(out == expect)
      }
    }
  }

  test("shuffleDeterministic equals the naive global (md5, key) rank") {
    val keys: Gen[List[Long]] =
      Gen.listOfN(20, Gen.chooseNum(0L, 1000000L))
    forAll(keys) { ks =>
      whenever(ks.distinct.size == ks.size && ks.nonEmpty) {
        val df = ks.toDF("id")
        val out = Extensions.shuffleDeterministic(df, "id")
          .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
        def hex(k: Long) = {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(k.toString.getBytes("UTF-8"))
          d.map("%02x".format(_)).mkString
        }
        val expect = ks.sortBy(k => (hex(k), k)).zipWithIndex
          .map { case (k, i) => k -> i.toLong }.toMap
        assert(out == expect)
      }
    }
  }

  test("simhash is permutation-invariant over tokens") {
    forAll(Gen.listOfN(10, Gen.oneOf("spark", "scan", "join", "sort",
      "hash", "merge"))) { toks =>
      whenever(toks.nonEmpty) {
        val df = Seq((1L, toks.mkString(" ")),
          (2L, scala.util.Random.shuffle(toks).mkString(" ")))
          .toDF("doc_id", "text")
        val sigs = Extensions.simhashSignatures(df, "text", "doc_id")
          .select("simhash").as[Long].collect()
        assert(sigs(0) == sigs(1))
      }
    }
  }

  val tokenDocs: Gen[List[String]] = Gen.listOfN(4,
    Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  test("dedupSegments is idempotent: deduping a deduped text is the " +
      "identity") {
    forAll(tokenDocs) { texts =>
      whenever(texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val once = Extensions.dedupSegments(df, "text", "doc_id", " ")
          .select(col("doc_id"), col("dedup_text").as("text"))
        val twice = Extensions.dedupSegments(once, "text", "doc_id", " ")
          .select("doc_id", "dedup_text")
        val o = once.orderBy("doc_id").collect().map(_.getString(1)).toSeq
        val t2 = twice.orderBy("doc_id").collect().map(_.getString(1)).toSeq
        assert(o == t2)
      }
    }
  }

  val groupedVals: Gen[List[(Long, Long, Double)]] = Gen.listOfN(30,
    Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 1000L),
      Gen.chooseNum(-50.0, 50.0)))

  test("groupTopK returns a subset of input rows with contiguous ranks " +
      "1..min(k, group size), regardless of partitioning") {
    forAll(groupedVals) { rows =>
      whenever(rows.nonEmpty) {
        // unique ids required by the contract
        val uniq = rows.zipWithIndex.map { case ((g, _, v), i) =>
          (g, i.toLong, v) }
        val df = uniq.toDF("g", "id", "v").repartition(7)
        val out = graft.engine.Analytics
          .groupTopK(df, Seq("g"), "v", "id", k = 3)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        val inputIds = uniq.map(x => (x._1, x._2)).toSet
        assert(out.forall(x => inputIds.contains((x._1, x._3))))
        out.groupBy(_._1).foreach { case (g, rs) =>
          val expected = math.min(3, uniq.count(_._1 == g))
          assert(rs.map(_._2).sorted.toSeq == (1 to expected))
        }
      }
    }
  }

  test("basketAffinity invariants: support in (0,1], confidence in " +
      "(0,1], pair count never exceeds either item's count, ordered " +
      "pairs only") {
    forAll(groupedVals) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.map { case (g, t, _) => (g % 5, t % 7) }
          .toDF("basket", "item")
        val out = graft.engine.Analytics
          .basketAffinity(df, "basket", "item", minSupport = 1L,
            topK = 100)
          .collect()
        val itemCounts = rows.map { case (g, t, _) => (g % 5, t % 7) }
          .distinct.groupBy(_._2).view.mapValues(_.size).toMap
        out.foreach { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          val np = r.getLong(2)
          assert(a < b, s"unordered pair ($a, $b)")
          assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0) // support
          assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0) // confidence
          assert(np <= itemCounts(a) && np <= itemCounts(b))
        }
      }
    }
  }

  test("basketAffinity cap law: cap ≥ largest basket is identity; any " +
      "cap equals the oracle that drops whale baskets from pairs only") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def oracle(uniq: Seq[(Long, Long)], cap: Int)
        : Map[(Long, Long), (Long, Double, Double, Double)] = {
      val nB = uniq.map(_._1).distinct.size.toDouble
      val ic = uniq.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val pairRows = uniq.groupBy(_._1).values
        .map(_.map(_._2))
        .filter(items => cap <= 0 || items.size <= cap)
        .flatMap(items => for { a <- items; b <- items if a < b }
          yield (a, b))
      pairRows.groupBy(identity).map { case (p, occ) =>
        val np = occ.size.toLong
        p -> (np, round6(np / nB), round6(np / ic(p._1)),
          round6(np * nB / (ic(p._1) * ic(p._2))))
      }
    }
    def run(df: org.apache.spark.sql.DataFrame, cap: Int) =
      graft.engine.Analytics
        .basketAffinity(df, "basket", "item", minSupport = 1L,
          topK = 10000, maxItemsPerBasket = cap)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toMap
    forAll(groupedVals) { rows =>
      whenever(rows.nonEmpty) {
        val uniq = rows.map { case (g, t, _) => (g % 5, t % 7) }.distinct
        val df = uniq.toDF("basket", "item")
        val maxSize = uniq.groupBy(_._1).map(_._2.size).max
        assert(run(df, math.max(2, maxSize)) == run(df, 0))
        assert(run(df, 2) == oracle(uniq, 2))
        assert(run(df, 0) == oracle(uniq, 0))
      }
    }
  }

  test("tukeyOutliers never flags values inside the fences and flags " +
      "every value outside them, per group") {
    forAll(groupedVals) { rows =>
      whenever(rows.size >= 8) {
        val df = rows.map { case (g, _, v) => (g % 2, v) }.toDF("g", "v")
        val out = graft.engine.Analytics.tukeyOutliers(df, "g", "v")
          .select("g", "v", "fence_lo", "fence_hi", "is_outlier")
          .collect()
        out.foreach { r =>
          val (v, lo, hi, flag) =
            (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))
          assert(flag == (v < lo || v > hi))
        }
      }
    }
  }

  test("resampleFill grid law: per key, exactly (span div step)+1 rows, " +
      "first grid value is the first observation, filled values are " +
      "always some observed value at-or-before the grid instant") {
    forAll(groupedVals) { rows =>
      whenever(rows.nonEmpty) {
        val obs = rows.zipWithIndex.map { case ((g, t, v), i) =>
          (g % 2, (t % 500) + i, v) } // unique-ish ts per key
        val df = obs.toDF("k", "t", "v")
        val out = graft.engine.Analytics
          .resampleFill(df, "k", "t", "v", stepSeconds = 50L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        val byKey = obs.groupBy(_._1)
        byKey.foreach { case (k, os) =>
          val lo = os.map(_._2).min; val hi = os.map(_._2).max
          val expected = (hi - lo) / 50 + 1
          val got = out.filter(_._1 == k)
          assert(got.length == expected,
            s"key $k: ${got.length} grid rows, expected $expected")
          // first grid point carries the earliest observation's value
          // (max over duplicates at that instant, per the dedup rule)
          val firstVal = os.filter(_._2 == lo).map(_._3).max
          assert(got.minBy(_._2)._3 == firstVal)
          // every filled value was actually observed at or before
          got.foreach { case (_, gt, gv) =>
            assert(os.exists(o => o._2 <= gt && o._3 == gv),
              s"key $k grid $gt value $gv not in history")
          }
        }
      }
    }
  }

  test("winsorize output is always within [P(lo), P(hi)] and preserves " +
      "row count") {
    forAll(groupedVals) { rows =>
      whenever(rows.size >= 3) {
        val df = rows.map(_._3).toDF("v")
        val out = Features.winsorize(df, "v", 0.2, 0.8)
          .select("v_wins").as[Double].collect()
        assert(out.length == rows.size)
        val sorted = rows.map(_._3).sorted
        assert(out.forall(w => w >= sorted.head && w <= sorted.last))
        // clipped range is no wider than the raw range and respects order
        assert(out.max <= sorted.last && out.min >= sorted.head)
      }
    }
  }

  val budgetDocs: Gen[(List[(Long, String, Long)], Long)] =
    Gen.zip(
      Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 500L),
        Gen.oneOf("a", "b", "c"), Gen.chooseNum(1L, 40L))),
      Gen.chooseNum(30L, 150L))

  test("tokenBudgetBatch laws: admitted rows per source are exactly " +
      "the greedy doc_id-ordered prefix; running sums are the exact " +
      "cumulative; prior total is always under budget") {
    forAll(budgetDocs) { case (raw, budget) =>
      // distinct ids (duplicates would make 'prefix' ambiguous)
      val rows = raw.groupBy(_._1).map(_._2.head).toList
      whenever(rows.nonEmpty) {
        val got = Extensions.tokenBudgetBatch(
            rows.toDF("doc_id", "source", "n_tokens"),
            "source", "doc_id", col("n_tokens"), budget)
          .as[(Long, String, Long, Long)].collect()
          .groupBy(_._2).map { case (src, rs) =>
            src -> rs.sortBy(_._1).map(r => (r._1, r._3, r._4)).toSeq }
        val exp = rows.groupBy(_._2).map { case (src, rs) =>
          var total = 0L
          val admitted = rs.sortBy(_._1).flatMap { case (id, _, nt) =>
            if (total < budget) { total += nt; Some((id, nt, total)) }
            else None
          }
          src -> admitted.toSeq
        }.filter(_._2.nonEmpty)
        assert(got == exp, s"budget=$budget")
        got.values.flatten.foreach { case (_, nt, run) =>
          assert(run - nt < budget, "a row was admitted over budget")
        }
      }
    }
  }

  // ── drift-family laws (ksTest / w1Drift, round-12 close) ─────────────

  private val twoSamples: Gen[(List[Long], List[Long], Int)] = Gen.zip(
    Gen.nonEmptyListOf(Gen.chooseNum(-40L, 40L)),
    Gen.nonEmptyListOf(Gen.chooseNum(-40L, 60L)),
    Gen.chooseNum(1, 37))

  test("ksTest law: matches the brute-force ECDF sup (exact integers, " +
      "smallest-attaining tie-break) under generated tie-heavy " +
      "samples and arbitrary bucket counts") {
    forAll(twoSamples) { case (a, b, nb) =>
      val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
      val row = graft.engine.Analytics.ksTest(df, "v", col("isa"),
        nBuckets = nb).collect()(0)
      val grid = (a ++ b).distinct.sorted
      val dn = grid.map(x => (BigInt(a.count(_ <= x)) * b.length -
        BigInt(b.count(_ <= x)) * a.length).abs)
      val mx = dn.max
      val expD = BigDecimal(mx).toDouble / (a.length.toDouble * b.length)
      assert(math.abs(row.getAs[Double]("ks_d") - expD) < 5e-7)
      assert(row.getAs[Long]("at_value") ==
        grid(dn.indexOf(mx)), s"a=$a b=$b nb=$nb")
    }
  }

  test("w1Drift laws: brute-force earth-mover equality, symmetry in " +
      "the two samples, and exact translation cost, under generated " +
      "samples and arbitrary bucket counts") {
    forAll(twoSamples) { case (a, b, nb) =>
      val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
      val got = graft.engine.Analytics.w1Drift(df, "v", col("isa"),
        nBuckets = nb).collect()(0).getAs[Double]("w1")
      val grid = (a ++ b).distinct.sorted
      val exp =
        if (grid.length < 2) 0.0
        else grid.sliding(2).map { case Seq(p, s) =>
          math.abs(a.count(_ <= p).toDouble / a.length -
            b.count(_ <= p).toDouble / b.length) * (s - p)
        }.sum
      assert(math.abs(got - exp) < 1e-5, s"a=$a b=$b nb=$nb")
      // symmetry: swapping the class labels cannot change W1
      val swapped = graft.engine.Analytics.w1Drift(
        (a.map((_, false)) ++ b.map((_, true))).toDF("v", "isa"),
        "v", col("isa"), nBuckets = nb).collect()(0).getAs[Double]("w1")
      assert(swapped == got)
      // W1(X, X + δ) = δ exactly, for any generated sample
      val delta = 7L + (a.length % 5)
      val trans = graft.engine.Analytics.w1Drift(
        (a.map((_, true)) ++ a.map(v => (v + delta, false)))
          .toDF("v", "isa"),
        "v", col("isa"), nBuckets = nb).collect()(0).getAs[Double]("w1")
      assert(trans == delta.toDouble, s"translation $delta -> $trans")
    }
  }

  // ── graph convergence-quality laws (VERDICT r12 #8) ─────────────────

  /** Random multigraph edge lists over ≤10 nodes — self-loops,
    * duplicates and reversals included on purpose (the operators must
    * normalize them away exactly like the brute force does). */
  val randomEdges: Gen[List[(Long, Long)]] =
    Gen.listOfN(18, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L)))

  private def normalize(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet

  /** Reference synchronous LPA: every node starts from its own id and
    * each round adopts the (count desc, label asc)-best label among
    * its neighbors plus itself — Analytics.labelPropagation's exact
    * contract, in-memory. */
  private def bruteLpa(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val und = normalize(edges)
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(n => n -> und.collect {
      case (a, b) if a == n => b
      case (a, b) if b == n => a
    }).toMap
    var labels = nodes.map(n => n -> n).toMap
    (1 to rounds).foreach { _ =>
      labels = nodes.map { n =>
        val votes = (adj(n).toSeq.map(labels) :+ labels(n))
          .groupBy(identity).view.mapValues(_.size).toSeq
        n -> votes.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    labels
  }

  /** Reference k-core: peel nodes with degree < k to the fixpoint. */
  private def bruteKCore(edges: Seq[(Long, Long)],
      k: Int): Map[Long, Int] = {
    var und = normalize(edges)
    var changed = true
    while (changed) {
      val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = und.filter(e => keep(e._1) && keep(e._2))
      changed = next != und
      und = next
    }
    und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size).toMap
  }

  test("kCore equals the brute-force iterative peel (survivor set AND " +
      "core degrees) on random multigraphs, for k = 2 and 3") {
    forAll(randomEdges) { edges =>
      whenNonEmpty(edges) { df =>
        Seq(2, 3).foreach { k =>
          val got = graft.engine.Analytics.kCore(df, "a", "b", k)
            .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
          val exp = bruteKCore(edges, k)
          assert(got == exp, s"k=$k edges=$edges")
        }
      }
    }
  }

  test("labelPropagation equals the brute-force synchronous LPA at " +
      "every round count on random multigraphs") {
    forAll(randomEdges) { edges =>
      whenNonEmpty(edges) { df =>
        Seq(1, 3).foreach { rounds =>
          val got = graft.engine.Analytics
            .labelPropagation(df, "a", "b", rounds = rounds)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val exp = bruteLpa(edges, rounds)
          assert(got == exp, s"rounds=$rounds edges=$edges")
        }
      }
    }
  }

  test("labelPropagation community quality: on two bridged cliques the " +
      "labels STABILIZE (a fixpoint, not an oscillation) at exactly " +
      "one label per clique, and the bridge never merges them") {
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 5L to 9L; j <- (i + 1) to 9L) yield (i, j)
    val edges = (cliqueA ++ cliqueB :+ (4L, 9L)).toList
    val df = edges.toDF("a", "b")
    def run(rounds: Int): Map[Long, Long] = graft.engine.Analytics
      .labelPropagation(df, "a", "b", rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at4 = run(4)
    assert(at4 == run(5), "labels must reach a fixpoint, not oscillate")
    assert((0L to 4L).map(at4).toSet.size == 1, s"clique A split: $at4")
    assert((5L to 9L).map(at4).toSet.size == 1, s"clique B split: $at4")
    assert(at4(0L) != at4(5L), s"one bridge edge merged the cliques: $at4")
  }

  private def whenNonEmpty(edges: List[(Long, Long)])(
      check: org.apache.spark.sql.DataFrame => Unit): Unit = {
    if (normalize(edges).nonEmpty) check(edges.toDF("a", "b"))
  }
}
