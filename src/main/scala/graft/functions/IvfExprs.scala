package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass IVF coarse-quantizer expressions.
  *
  * The naive formulation of "nearest centroid" as a Catalyst `when`-fold
  * over nCells struct expressions is O(nCells) in PLAN size and recomputes
  * the query norm once per centroid — at real IVF sizes (1024-4096 cells)
  * that is both a plan blowup and a per-row cost blowup. These expressions
  * take the centroid matrix as a constructor literal (the SlidingBoxes
  * pattern), stage the row norm once, and scan all cells in one tight
  * primitive loop per row.
  *
  * Numeric contract (pinned by the q39 oracle): per-centroid score is
  * `dot(v,c) / (sqrt(dot(v,v)) * cnorm)` with sequential-fold dots (the
  * VecDot order) and `cnorm = sqrt(sum c_i^2)` folded sequentially at plan
  * build; double comparisons use Spark SQL ordering (NaN largest,
  * NaN == NaN, -0.0 == 0.0).
  */
private[functions] trait IvfScores { self: UnaryExpression =>
  def centroids: Seq[Seq[Double]]

  @transient protected lazy val cArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  // Same fold order as the previous driver-side literal:
  // math.sqrt(c.map(x => x * x).sum) — a sequential left fold.
  @transient protected lazy val cNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum)).toArray

  protected def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkVecType(name: String): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$name needs array<float|double>, got $t")
  }

  /** Cosine of the row vector to every centroid; null on dim mismatch. */
  protected def scores(input: Any): Array[Double] = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isF = elemIsFloat
    def at(i: Int): Double = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
    var sv = 0.0
    var j = 0
    while (j < n) { val x = at(j); sv += x * x; j += 1 }
    val normV = math.sqrt(sv)
    val out = new Array[Double](cArr.length)
    var i = 0
    while (i < cArr.length) {
      val c = cArr(i)
      if (c.length != n) return null
      var s = 0.0
      var k = 0
      while (k < n) { s += at(k) * c(k); k += 1 }
      out(i) = s / (normV * cNorms(i))
      i += 1
    }
    out
  }

  /** Spark SQL double ordering: NaN largest, NaN == NaN, -0.0 == 0.0. */
  protected def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)
}

/** `ivf_assign(v)`: index of the max-cosine centroid; the EARLIEST index
  * wins ties — the same left-fold-keeps-accumulator semantics as the
  * `when(a.s >= b.s, a).otherwise(b)` reduce it replaces. */
case class IvfAssign(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with IvfScores with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVecType(prettyName)
  override def nullSafeEval(input: Any): Any = {
    val s = scores(input)
    if (s == null || s.length == 0) return null
    var best = 0
    var i = 1
    while (i < s.length) {
      if (cmp(s(best), s(i)) < 0) best = i
      i += 1
    }
    best
  }
  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

/** `ivf_probes(v, nProbe)`: the `nProbe` highest-cosine centroid indices,
  * ordered by (score desc, index desc) — the same order as
  * `slice(reverse(array_sort(array(struct(s, i)...))), 1, nProbe)` it
  * replaces (reverse of an ascending (s, i) sort breaks ties HIGH). */
case class IvfProbes(child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with IvfScores with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probes"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVecType(prettyName)
  override def nullSafeEval(input: Any): Any = {
    val s = scores(input)
    if (s == null) return null
    val idx = Array.range(0, s.length)
    val sorted = idx.sortWith { (a, b) =>
      val c = cmp(s(a), s(b))
      if (c != 0) c > 0 else a > b
    }
    new GenericArrayData(sorted.take(math.min(nProbe, sorted.length)))
  }
  override protected def withNewChildInternal(newChild: Expression): IvfProbes =
    copy(child = newChild)
}
