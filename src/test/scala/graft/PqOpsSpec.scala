package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PqOps

/** Adversarial law for the native PQ kernels (r11): [[PqOps.pqEncode]]
  * and [[PqOps.pqAdc]] must be BIT-identical to the interpreted HOF
  * forms they replaced — argmin via `array_position(d, array_min(d))`
  * over `transform(typedLit(cb), c => aggregate(zip_with(...)))`, and
  * ADC via the `element_at`-indexed fold — on seeded random data with
  * ties and negatives, across partitionings and codegen modes.
  */
class PqOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import TestSpark.spark.implicits._

  private def hofSqDist(v: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(v, c, (a, b) =>
      (a.cast("double") - b) * (a.cast("double") - b)), lit(0.0), _ + _)

  test("pqEncode/pqAdc are bit-identical to the HOF argmin/ADC forms " +
      "on seeded vectors with duplicate codewords, across partitionings " +
      "and with codegen disabled") {
    val rnd = new scala.util.Random(17)
    val (m, k, sub) = (4, 8, 4)
    val dim = m * sub
    // duplicate codeword 0 as codeword 3 in every subspace: the argmin
    // TIE must resolve to the LOWEST code in both forms
    val codebook: Seq[Seq[Seq[Float]]] = (0 until m).map { _ =>
      val base = (0 until k - 1).map(_ =>
        Seq.fill(sub)(rnd.nextFloat() * 4 - 2))
      (base.take(3) :+ base.head) ++ base.drop(3)
    }
    val rows = (0L until 300L).map { i =>
      // a third of the rows ARE codebook points (exact ties), the rest
      // random with negatives
      val v =
        if (i % 3 == 0)
          (0 until m).flatMap(j => codebook(j)((i % k).toInt)).toArray
        else Array.fill(dim)(rnd.nextFloat() * 4 - 2)
      (i, v)
    }
    val sub1 = sub
    def hofCodes = array((0 until m).map { j =>
      val d = transform(typedLit(codebook(j)),
        c => hofSqDist(slice(col("embedding"), j * sub1 + 1, sub1), c))
      (array_position(d, array_min(d)) - 1).cast("int")
    }: _*)
    def hofAdc = (0 until m).map { j =>
      hofSqDist(slice(col("embedding"), j * sub1 + 1, sub1),
        element_at(typedLit(codebook(j)), col("codes")(j) + 1))
    }.reduce(_ + _)
    for (parts <- Seq(1, 7); codegen <- Seq(true, false)) {
      if (!codegen)
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val df = rows.toDF("vec_id", "embedding").repartition(parts)
        val both = df.select(col("vec_id"),
            PqOps.pqEncode(col("embedding"), codebook).as("codes"),
            hofCodes.as("hof_codes"), col("embedding"))
          .withColumn("adc",
            PqOps.pqAdc(col("embedding"), col("codes"), codebook))
          .withColumn("hof_adc", hofAdc)
          .collect()
        both.foreach { r =>
          assert(r.getSeq[Int](1) == r.getSeq[Int](2),
            s"codes diverge for id ${r.getLong(0)} " +
              s"(parts=$parts codegen=$codegen)")
          assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(5)),
            s"ADC diverges for id ${r.getLong(0)}: " +
              s"${r.getDouble(4)} vs ${r.getDouble(5)} " +
              s"(parts=$parts codegen=$codegen)")
        }
      } finally if (!codegen)
        spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("pqEncode/pqAdc null semantics: wrong-length vectors and " +
      "out-of-range codes yield NULL, never a wrong value") {
    val codebook: Seq[Seq[Seq[Float]]] =
      Seq(Seq(Seq(0f, 0f), Seq(1f, 1f)), Seq(Seq(0f, 0f), Seq(1f, 1f)))
    val df = Seq(
      (1L, Array(0.5f, 0.5f, 0.5f, 0.5f)), // dim 4 = m*sub: ok
      (2L, Array(0.5f, 0.5f))              // wrong length
    ).toDF("vec_id", "embedding")
    val enc = df.select(col("vec_id"),
        PqOps.pqEncode(col("embedding"), codebook).as("codes"))
      .orderBy("vec_id").collect()
    assert(enc(0).getSeq[Int](1) != null)
    assert(enc(1).isNullAt(1), "wrong-length vector must encode to NULL")
    val adc = df.filter(col("vec_id") === 1L)
      .select(PqOps.pqAdc(col("embedding"),
        typedLit(Seq(0, 7)), codebook)) // code 7 out of range (k=2)
      .collect()
    assert(adc(0).isNullAt(0), "out-of-range code must score NULL")
  }
}
