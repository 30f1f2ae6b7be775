package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BottomK, DotF32, MinHashSig, MmrSelect, SimHash64, TopKPairs}

/** SparkSessionExtensions entry point — the production route to the
  * library's custom Catalyst functions. Users add
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`) and `simhash64`,
  * `dot_f32`, and `bottom_k` are available in SQL and via
  * `call_function` on every session of that context — no per-session
  * `register()` calls. The companion `register(spark)` helpers on each
  * function object remain for ad-hoc sessions; this class is the
  * deploy-time wiring (ladder rung (c): SparkSessionExtensions as the
  * packaging for custom expressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private type Exprs = Seq[org.apache.spark.sql.catalyst.expressions.Expression]

  private def arity(name: String, exprs: Exprs, n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Exprs) => {
        arity("simhash64", exprs, 1)
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      (exprs: Exprs) => {
        arity("dot_f32", exprs, 2)
        DotF32(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      // arity + foldable-literal k/seed validation lives in fromExprs
      (exprs: Exprs) => MinHashSig.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[BottomK].getName, "bottom_k"),
      // arity + foldable-integral-k validation lives in BottomK.fromExprs
      (exprs: Exprs) => BottomK.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("top_k_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "top_k_pairs"),
      // arity + foldable-integral-k validation lives in fromExprs
      (exprs: Exprs) => TopKPairs.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("mmr_select"),
      new ExpressionInfo(classOf[MmrSelect].getName, "mmr_select"),
      // arity + foldable-integral-k validation lives in fromExprs
      (exprs: Exprs) => MmrSelect.fromExprs(exprs)))
  }
}
