package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native two-level (hierarchical) coarse-quantizer kernels — the
  * scale path for IVF-family cell work when the cell count grows with
  * the corpus (the doctrine: nCells ∝ n keeps cells executor-sized).
  *
  * The flat rule ([[PqEncode]] at m=1, via `nearestCellExpr`) scans
  * every centroid per row: n·nCells·dim FMAs. With nCells ∝ n that
  * whole term is ∝ n² — the f10→f100 tail BASELINE.md §×100 measured
  * on `knn_join` (1.27, diagnosed as exactly this fit/assign/probe
  * term, VERDICT r14 #4). Here the nCells leaf centroids are grouped
  * under ~√nCells super-centroids and a row scans the supers, then
  * only the winning group's leaves: n·2√nCells·dim — the standard
  * tree-structured / multi-index coarse quantizer (public knowledge:
  * FAISS's IMI and hierarchical-kmeans coarse quantizers).
  *
  * SEMANTICS: the two-level rule IS the quantizer's cell definition —
  * a row's cell is (nearest super by squared L2, ties low) → (nearest
  * leaf within that group, ties low). It is not an approximation of
  * the flat rule against the same leaves; it is a different (equally
  * valid) coarse quantizer whose assignment is exact with respect to
  * itself, deterministic, and a pure literal projection — so
  * capture-replay oracles that replay the two-level rule reproduce
  * assignments bit-for-bit, the same contract as `nearestCellExpr`.
  *
  * Layout bound into the expressions (never re-serialized per row,
  * the [[PqOps]] `addReferenceObj` pattern):
  *   - `sup`:    g·dim floats, super-centroids in group order;
  *   - `leaves`: L·dim floats, leaf centroids concatenated in group
  *               order — a leaf's GLOBAL cell id is its index here;
  *   - `gs`:     g+1 ints, group g's leaves live at [gs(g), gs(g+1)).
  *
  * [[TreeProbes]] is the pruned-search companion: rank the supers,
  * keep the best `superProbe` groups, rank ONLY their leaves, return
  * the `nprobe` best leaf ids (ascending (distance, id) — ties low).
  * Probe sets in a pruned IVF search are a recall heuristic under any
  * quantizer; the recall law is spec-pinned at the caller.
  */
object TreeCells {

  /** Column API: global leaf cell id (int) for a full vector. */
  def nearestLeaf(vec: Column, sup: Array[Float], leaves: Array[Float],
      gs: Array[Int], dim: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(gs.length >= 2 && gs.head == 0 &&
      gs.last * dim == leaves.length && (gs.length - 1) * dim == sup.length,
      "inconsistent tree-quantizer layout")
    ColumnBridge.column(NearestLeafCell(
      ColumnBridge.expression(vec), sup, leaves, gs, dim))
  }

  /** Column API: the `nprobe` best leaf ids among the `superProbe`
    * nearest groups (array<int>, ascending (distance, id)). */
  def probes(vec: Column, sup: Array[Float], leaves: Array[Float],
      gs: Array[Int], dim: Int, nprobe: Int, superProbe: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(nprobe >= 1 && superProbe >= 1, "nprobe/superProbe must be >= 1")
    ColumnBridge.column(TreeProbeCells(
      ColumnBridge.expression(vec), sup, leaves, gs, dim, nprobe,
      superProbe))
  }

  /** Copy the row vector to a dense double buffer once — the 2√k
    * centroid scans then run pure primitive arithmetic instead of
    * repeated ArrayData accessor calls. Returns null on a length
    * mismatch or any null element (the [[PqOps]] null-poisoning
    * contract). */
  private def toBuf(v: ArrayData, vFloat: Boolean,
      dim: Int): Array[Double] = {
    if (v.numElements() != dim) return null
    val buf = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      buf(i) = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    buf
  }

  private def d2(buf: Array[Double], cents: Array[Float], off: Int,
      dim: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < dim) {
      val t = buf(i) - cents(off + i)
      s += t * t
      i += 1
    }
    s
  }

  /** Shared assignment kernel (interpreted eval AND generated code —
    * the DotF32 `MODULE$` pattern). */
  def assign(v: ArrayData, vFloat: Boolean, sup: Array[Float],
      leaves: Array[Float], gs: Array[Int],
      dim: Int): java.lang.Integer = {
    val buf = toBuf(v, vFloat, dim)
    if (buf == null) return null
    val g = bestSuper(buf, sup, gs.length - 1, dim)
    var best = gs(g)
    var bestD = d2(buf, leaves, gs(g) * dim, dim)
    var l = gs(g) + 1
    while (l < gs(g + 1)) {
      val d = d2(buf, leaves, l * dim, dim)
      if (d < bestD) { bestD = d; best = l } // strict < == ties low
      l += 1
    }
    best
  }

  private def bestSuper(buf: Array[Double], sup: Array[Float], g: Int,
      dim: Int): Int = {
    var best = 0
    var bestD = d2(buf, sup, 0, dim)
    var i = 1
    while (i < g) {
      val d = d2(buf, sup, i * dim, dim)
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Shared probe kernel: top-`superProbe` groups by super distance,
    * then top-`nprobe` leaves among those groups' leaves — both
    * selections by ascending (distance, id), insertion into bounded
    * arrays (superProbe and nprobe are small probe parameters, never
    * corpus-sized). */
  def probeLeaves(v: ArrayData, vFloat: Boolean, sup: Array[Float],
      leaves: Array[Float], gs: Array[Int], dim: Int, nprobe: Int,
      superProbe: Int): ArrayData = {
    val buf = toBuf(v, vFloat, dim)
    if (buf == null) return null
    val g = gs.length - 1
    val sp = math.min(superProbe, g)
    // bounded insertion select of the sp nearest supers
    val gd = new Array[Double](sp)
    val gi = new Array[Int](sp)
    var filled = 0
    var i = 0
    while (i < g) {
      val d = d2(buf, sup, i * dim, dim)
      // insert (d, i) if it beats the current worst (ties low on id:
      // a later i never displaces an equal-distance earlier one)
      if (filled < sp || d < gd(filled - 1)) {
        var p = math.min(filled, sp - 1)
        while (p > 0 && gd(p - 1) > d) {
          gd(p) = gd(p - 1); gi(p) = gi(p - 1); p -= 1
        }
        gd(p) = d; gi(p) = i
        if (filled < sp) filled += 1
      }
      i += 1
    }
    // bounded insertion select of the nprobe nearest leaves within
    // the selected groups
    var cand = 0
    var gg = 0
    while (gg < filled) { cand += gs(gi(gg) + 1) - gs(gi(gg)); gg += 1 }
    val np = math.min(nprobe, cand)
    val ld = new Array[Double](np)
    val li = new Array[Int](np)
    var lf = 0
    gg = 0
    while (gg < filled) {
      var l = gs(gi(gg))
      while (l < gs(gi(gg) + 1)) {
        val d = d2(buf, leaves, l * dim, dim)
        if (lf < np || d < ld(lf - 1) ||
            (d == ld(lf - 1) && l < li(lf - 1))) {
          var p = math.min(lf, np - 1)
          while (p > 0 && (ld(p - 1) > d ||
              (ld(p - 1) == d && li(p - 1) > l))) {
            ld(p) = ld(p - 1); li(p) = li(p - 1); p -= 1
          }
          ld(p) = d; li(p) = l
          if (lf < np) lf += 1
        }
        l += 1
      }
      gg += 1
    }
    // groups arrive in ascending super order, not ascending leaf id —
    // ties could land either way without the explicit id comparison
    // above, so the output is exactly ascending (distance, id)
    val out = new Array[Any](lf)
    i = 0
    while (i < lf) { out(i) = li(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** See [[TreeCells]]. Arrays are constructor-bound plan references
  * (the [[PqEncode]] equality caveat applies: reference equality at
  * worst misses a CSE, never wrong results). */
case class NearestLeafCell(child: Expression, sup: Array[Float],
    leaves: Array[Float], gs: Array[Int], dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (PqOps.elementOk(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tree_cell requires an array<float>/array<double> vector, got " +
          child.dataType.simpleString(10))

  override def nullSafeEval(v: Any): Any = {
    val r = TreeCells.assign(v.asInstanceOf[ArrayData],
      PqOps.isFloat(child.dataType), sup, leaves, gs, dim)
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supRef = ctx.addReferenceObj("treeSup", sup, "float[]")
    val leafRef = ctx.addReferenceObj("treeLeaves", leaves, "float[]")
    val gsRef = ctx.addReferenceObj("treeGs", gs, "int[]")
    val vf = PqOps.isFloat(child.dataType)
    nullSafeCodeGen(ctx, ev, v => s"""
      |java.lang.Integer ${ev.value}Boxed =
      |  graft.functions.TreeCells$$.MODULE$$.assign(
      |    $v, $vf, $supRef, $leafRef, $gsRef, $dim);
      |if (${ev.value}Boxed == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}Boxed.intValue();
      |}""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestLeafCell = copy(child = newChild)
}

/** See [[TreeCells]]. */
case class TreeProbeCells(child: Expression, sup: Array[Float],
    leaves: Array[Float], gs: Array[Int], dim: Int, nprobe: Int,
    superProbe: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (PqOps.elementOk(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tree_probes requires an array<float>/array<double> vector, got " +
          child.dataType.simpleString(10))

  override def nullSafeEval(v: Any): Any =
    TreeCells.probeLeaves(v.asInstanceOf[ArrayData],
      PqOps.isFloat(child.dataType), sup, leaves, gs, dim, nprobe,
      superProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supRef = ctx.addReferenceObj("treeSup", sup, "float[]")
    val leafRef = ctx.addReferenceObj("treeLeaves", leaves, "float[]")
    val gsRef = ctx.addReferenceObj("treeGs", gs, "int[]")
    val vf = PqOps.isFloat(child.dataType)
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = graft.functions.TreeCells$$.MODULE$$.probeLeaves(
      |  $v, $vf, $supRef, $leafRef, $gsRef, $dim, $nprobe, $superProbe);
      |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TreeProbeCells = copy(child = newChild)
}
