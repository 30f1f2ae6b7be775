package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** k-permutation MinHash signature of a token array, as a native
  * Catalyst expression: `minhash_sig(tokens)` → `array<long>` of `k`
  * signature values.
  *
  * Per row: each token gets one 64-bit base hash (two Murmur3 passes,
  * seeds 0x9747b28c / 0x5bd1e995 — same primitive as [[SimHash64]]);
  * hash i of the signature is `min over tokens of mix64(base ^ c_i)`
  * where `c_i = splitmix64(seed + i)` — the standard "one hash, k
  * cheap permutations" construction (Broder'97 resemblance sketches).
  * Duplicate tokens collapse for free (same base hash → same mins), so
  * the signature is a pure set sketch: P[sig_a(i) == sig_b(i)] ≈
  * Jaccard(A, B).
  *
  * An Expression rather than explode+groupBy because the relational
  * form shuffles every (doc, token) pair to compute k `min` aggregates
  * — a full-corpus token shuffle. This form is a single projection
  * inside whole-stage codegen: at 100 TB the signature costs one scan,
  * and only the k-long signatures (not the tokens) ever reach an
  * exchange. Replaces the MLlib CountVectorizer→MinHashLSH path, whose
  * `fit` materializes the corpus vocabulary on the driver — a
  * scale-killer the sketch never needed.
  *
  * North-star extension (dedup family) — reference has zero custom
  * functions (reference: src/feature_engineering.py:7).
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  require(k > 0 && k <= 1024, s"minhash_sig: k must be in 1..1024, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<string>, got ${other.simpleString(10)}")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashSig.eval(v.asInstanceOf[ArrayData], k, seed)

  // companion referenced as MinHashSig$.MODULE$ — see SimHash64's note:
  // the bare class reference fails janino and silently degrades to
  // interpreted per-row eval
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig$$.MODULE$$.eval($c, $k, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Shared by interpreted eval and generated code. */
  def eval(arr: ArrayData, k: Int, seed: Long): GenericArrayData = {
    val cs = new Array[Long](k)
    var i = 0
    while (i < k) { cs(i) = mix64(seed + i); i += 1 }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val base = (hash(s, 0x9747b28c).toLong << 32) |
          (hash(s, 0x5bd1e995).toLong & 0xffffffffL)
        i = 0
        while (i < k) {
          val v = mix64(base ^ cs(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  private def hash(s: UTF8String, seed: Int): Int =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes(), seed)

  /** Register `minhash_sig(tokens, k, seed)` in the session registry.
    * Idempotent; see also [[graft.GraftExtensions]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => fromExprs(exprs), "scala_udf")

  /** SQL-route constructor: validates `k` / `seed` are foldable
    * integral literals (the signature layout is plan-time fixed).
    */
  def fromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : MinHashSig = {
    require(exprs.length == 3,
      s"minhash_sig expects 3 arguments (tokens, k, seed), got ${exprs.length}")
    def lit(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Long = {
      require(e.foldable, s"minhash_sig: $what must be a literal")
      e.eval(null) match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"minhash_sig: $what must be integral, got $other")
      }
    }
    MinHashSig(exprs.head, lit(exprs(1), "k").toInt, lit(exprs(2), "seed"))
  }

  /** Column-API entry point. */
  def minhashSig(tokens: Column, k: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), k, seed))
  }
}
