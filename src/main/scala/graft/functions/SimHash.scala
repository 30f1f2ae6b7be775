package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array, as a native Catalyst expression.
  *
  * Per-row: each token is hashed twice with Murmur3 (two seeds → 64
  * bits); each bit position accumulates +1/-1 across tokens; the output
  * bit is the sign. Near-duplicate documents then differ in few bits
  * (compare with `bit_count(a ^ b)` / hamming distance).
  *
  * Implemented as an Expression rather than explode+groupBy because the
  * relational form multiplies the corpus 64× (tokens × bit positions)
  * before re-aggregating — a shuffle of ~64 × corpus size. This form is
  * a single projection: no shuffle, no UDF serialization overhead, and
  * `doGenCode` keeps it inside whole-stage codegen.
  *
  * North-star extension (dedup family) — not present in the reference
  * (which has zero custom functions, reference: src/feature_engineering.py:7).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.simpleString(10)}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    SimHash64.eval(arr)
  }

  // NB: the companion must be referenced as SimHash64$.MODULE$ — scalac
  // emits no static `eval` forwarder on the class because Expression
  // already declares eval(InternalRow); the bare class reference fails
  // janino compilation, which silently fell back to interpreted eval
  // per record (a WARN in the logs, not an error)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def eval(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = hash(s, 0x9747b28c)
        val h2 = hash(s, 0x5bd1e995)
        var b = 0
        while (b < 32) {
          if (((h1 >>> b) & 1) == 1) counts(b) += 1 else counts(b) -= 1
          if (((h2 >>> b) & 1) == 1) counts(b + 32) += 1 else counts(b + 32) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private def hash(s: UTF8String, seed: Int): Int =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes(), seed)

  /** Register `simhash64` in the session's function registry — the SQL
    * route (see also [[graft.GraftExtensions]]). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")

  /** Column-API entry point: `simhash64(spark, split(lower(text), " "))`.
    * Wraps the expression directly (no session-registry side effect);
    * the `spark` parameter is kept for signature stability.
    */
  def simhash64(spark: SparkSession, tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }
}
