package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The opt-r19 BPE codegen expressions must equal the HOF reference
  * forms BIT FOR BIT — [[graft.functions.BpeApply]] vs the
  * `aggregate` fold chain ([[graft.engine.Extensions.bpeApplyRule]],
  * kept as the executable reference), and
  * [[graft.functions.BpeEncodeWords]] vs
  * `flatten(transform(words, bpeEncodeWord))` — on random words and
  * random rule tables, fusion chains included (rules whose fused
  * output feeds a later rule's left/right side).
  */
class BpeApplySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // alphabet engineered so rules collide and chain: "ab" fused by rule
  // 1 can be the left side of rule ("ab","a") etc.
  private val alphabet = Seq("a", "b", "c")
  private def randWord(rnd: scala.util.Random): String =
    Seq.fill(1 + rnd.nextInt(12))(
      alphabet(rnd.nextInt(alphabet.length))).mkString

  private def randRules(rnd: scala.util.Random): Seq[(String, String)] = {
    val syms = scala.collection.mutable.ArrayBuffer("a", "b", "c")
    (1 to 1 + rnd.nextInt(5)).map { _ =>
      val a = syms(rnd.nextInt(syms.length))
      val b = syms(rnd.nextInt(syms.length))
      syms += (a + b)
      (a, b)
    }
  }

  test("BpeApply equals the aggregate-fold reference on random words " +
      "and rule chains") {
    val rnd = new scala.util.Random(42L)
    (1 to 8).foreach { _ =>
      val rules = randRules(rnd)
      val words = Seq.fill(80)(randWord(rnd)).toDF("w")
        .select(filter(split(col("w"), ""), x => length(x) > 0)
          .as("__syms"))
      val ref = rules.foldLeft(col("__syms")) { case (c, (a, b)) =>
        graft.engine.Extensions.bpeApplyRule(c, a, b)
      }
      val got = words.select(
        graft.functions.BpeApply.bpeApply(col("__syms"), rules).as("g"),
        ref.as("r")).collect()
      got.foreach { row =>
        assert(row.getSeq[String](0) == row.getSeq[String](1))
      }
    }
  }

  test("BpeEncodeWords equals flatten(transform(words, bpeEncodeWord)) " +
      "and length(concat_ws) equals the summed word lengths") {
    val rnd = new scala.util.Random(7L)
    (1 to 6).foreach { _ =>
      val rules = randRules(rnd)
      val docs = Seq.fill(40)(
        Seq.fill(1 + rnd.nextInt(6))(randWord(rnd))).toDF("__ws")
      val ref = flatten(transform(col("__ws"),
        w => graft.engine.Extensions.bpeEncodeWord(w, rules)))
      val refChars = aggregate(
        transform(col("__ws"), w => length(w)), lit(0L),
        (acc, x) => acc + x.cast("long"))
      val got = docs.select(
        graft.functions.BpeEncodeWords.bpeEncodeWords(col("__ws"), rules)
          .as("g"),
        ref.as("r"),
        length(concat_ws("", col("__ws"))).cast("long").as("gc"),
        refChars.as("rc")).collect()
      got.foreach { row =>
        assert(row.getSeq[String](0) == row.getSeq[String](1))
        assert(row.getLong(2) == row.getLong(3))
      }
    }
  }

  test("BpeEncodeWords null-word parity: a null element nulls the " +
      "whole result, exactly like flatten over a null transform output") {
    val docs = Seq((1L, Seq[String]("ab", null, "c")),
      (2L, Seq[String]("ab", "c"))).toDF("id", "__ws")
    val rules = Seq(("a", "b"))
    // row 1: both null; row 2: both non-null
    val byId = docs.select(col("id"),
      graft.functions.BpeEncodeWords.bpeEncodeWords(col("__ws"), rules)
        .as("g"),
      flatten(transform(col("__ws"),
        w => graft.engine.Extensions.bpeEncodeWord(w, rules))).as("r"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2)))
      .toMap
    assert(byId(1L) == ((true, true)))
    assert(byId(2L) == ((false, false)))
  }

  test("local BPE trainer equals the distributed loop — random corpora " +
      "plus a constructed count tie (the r19 short-circuit law; ties " +
      "break toward the UTF-8-smallest pair on both paths)") {
    val rnd = new scala.util.Random(11L)
    def corpus(): Seq[String] = Seq.fill(30)(
      Seq.fill(1 + rnd.nextInt(8))(randWord(rnd)).mkString(" "))
    def train(docs: org.apache.spark.sql.DataFrame,
        forceDistributed: Boolean): Seq[(Int, String, String, Long)] = {
      if (forceDistributed)
        spark.conf.set("spark.graft.bpe.localVocabThreshold", "0")
      try graft.engine.Extensions.bpeMerges(docs, "text", 6)
        .orderBy("merge_rank")
        .as[(Int, String, String, Long)].collect().toSeq
      finally if (forceDistributed)
        spark.conf.unset("spark.graft.bpe.localVocabThreshold")
    }
    (1 to 3).foreach { _ =>
      val docs = corpus().zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      assert(train(docs, forceDistributed = false)
        == train(docs, forceDistributed = true))
    }
    // the constructed tie in isolation: (x,y) and (p,q) tie at count 2
    // → rule 1 must be the UTF-8-smallest left side ("p","q") on BOTH
    // paths
    val tie = Seq((1L, "xy xy pq pq")).toDF("doc_id", "text")
    val lt = train(tie, forceDistributed = false)
    assert(lt == train(tie, forceDistributed = true))
    assert(lt.head._2 == "p" && lt.head._3 == "q")
  }

  test("BpeApply handles unicode (surrogate-pair) symbols like the " +
      "split reference") {
    val words = Seq("a𝄞b", "𝄞𝄞")
      .toDF("w")
      .select(filter(split(col("w"), ""), x => length(x) > 0)
        .as("__syms"))
    val rules = Seq(("𝄞", "𝄞"))
    val ref = rules.foldLeft(col("__syms")) { case (c, (a, b)) =>
      graft.engine.Extensions.bpeApplyRule(c, a, b)
    }
    val rows = words.select(
      graft.functions.BpeApply.bpeApply(col("__syms"), rules).as("g"),
      ref.as("r"),
      graft.functions.BpeEncodeWords.bpeEncodeWords(
        array(concat_ws("", col("__syms"))), rules).as("e")).collect()
    rows.foreach { row =>
      assert(row.getSeq[String](0) == row.getSeq[String](1))
      assert(row.getSeq[String](2) == row.getSeq[String](1))
    }
  }
}
