package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of common elements of two SORTED-ASCENDING, DEDUPLICATED
  * integral arrays — the codegen'd replacement for
  * `size(array_intersect(a, b))` on adjacency arrays (opt r19, guide
  * §4). `array_intersect` builds a hash set of boxed elements per row;
  * on [[graft.engine.Analytics.edgeJaccard]]'s edge stream that kernel
  * was ~80% of the join stage's CPU. A two-pointer merge walk over the
  * primitive values is O(|a| + |b|) with zero allocation.
  *
  * Exact-equality contract with `size(array_intersect(a, b))` (pinned
  * in AnalyticsSpec), valid on the caller's structural domain:
  * both inputs are `sort_array(collect_set(...))` outputs — ascending,
  * distinct, null-free. Off-domain tolerance: a null ELEMENT sorts
  * first (`sort_array` asc) and matches a null element on the other
  * side exactly once, which is `array_intersect`'s null behavior on
  * deduplicated inputs. Inputs that are unsorted or carry duplicates
  * are OUTSIDE the contract (the call site guarantees them by
  * construction, not by runtime checks — checking would re-pay the
  * cost the expression removes).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && left.dataType == right.dataType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count requires two arrays of the same " +
          s"integral type, got ${left.dataType.simpleString(10)} and " +
          s"${right.dataType.simpleString(10)}")

  @transient private lazy val isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    // nulls sort first (sort_array asc): a single leading null on each
    // side matches once — array_intersect's behavior on deduped inputs
    while (i < na && a.isNullAt(i) && j < nb && b.isNullAt(j)) {
      c += 1; i += 1; j += 1
      while (i < na && a.isNullAt(i)) i += 1
      while (j < nb && b.isNullAt(j)) j += 1
    }
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    if (isLong) {
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val x = a.getInt(i)
        val y = b.getInt(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sic", this,
      classOf[SortedIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.count($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
