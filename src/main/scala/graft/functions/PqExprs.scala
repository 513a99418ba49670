package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass product-quantization expressions (Jegou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search", IEEE TPAMI).
  *
  * PQ splits a dim-D vector into M contiguous subvectors and quantizes
  * each against its own small codebook; a vector compresses to M small
  * codes, and query-to-candidate distance becomes M table lookups
  * (asymmetric distance computation) instead of a D-length fold. These
  * expressions are the two halves of that contract: [[PqEncode]] builds
  * the code table (the index build), [[PqDistTable]] builds a query's
  * M x ks lookup table (the search-time prelude). Like [[IvfAssign]],
  * the codebook rides as a constructor literal and each row is scanned
  * in one tight primitive loop — a `when`-fold formulation would blow up
  * plan size at real codebook sizes (M=8-16, ks=256).
  *
  * Numeric contract (pinned by the q93 oracle): per-subspace distance is
  * the squared L2 `sum_k (v_k - c_k)^2`, folded sequentially from 0.0 in
  * dimension order — replayable by an ordered `list_reduce` in any SQL
  * engine. Argmin ties keep the EARLIEST centroid index.
  */
private[functions] trait PqDists { self: UnaryExpression =>
  /** codebooks(m)(j) = centroid j of subspace m, each of length D/M. */
  def codebooks: Seq[Seq[Seq[Double]]]

  @transient protected lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient protected lazy val subDim: Int = cb(0)(0).length
  @transient protected lazy val totalDim: Int = cb.length * subDim

  protected def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkVecType(name: String): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$name needs array<float|double>, got $t")
  }

  /** dists(m)(j): squared L2 of the row's m-th subvector to centroid j,
    * sequential fold; null on dimension mismatch. */
  protected def dists(input: Any): Array[Array[Double]] = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != totalDim) return null
    val isF = elemIsFloat
    def at(i: Int): Double = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
    val out = new Array[Array[Double]](cb.length)
    var m = 0
    while (m < cb.length) {
      val row = new Array[Double](cb(m).length)
      var j = 0
      while (j < cb(m).length) {
        val c = cb(m)(j)
        var s = 0.0
        var k = 0
        while (k < subDim) {
          val d = at(m * subDim + k) - c(k)
          s += d * d
          k += 1
        }
        row(j) = s
        j += 1
      }
      out(m) = row
      m += 1
    }
    out
  }

  /** Spark SQL double ordering: NaN largest, NaN == NaN, -0.0 == 0.0. */
  protected def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)
}

/** `pq_encode(v)`: the M nearest-centroid indices, one per subspace —
  * the compressed PQ code of the vector (earliest index on ties). */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqDists with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVecType(prettyName)
  override def nullSafeEval(input: Any): Any = {
    val d = dists(input)
    if (d == null) return null
    val out = new Array[Int](d.length)
    var m = 0
    while (m < d.length) {
      var best = 0
      var j = 1
      while (j < d(m).length) {
        if (cmp(d(m)(j), d(m)(best)) < 0) best = j
        j += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_dist_table(v)`: the full M x ks squared-L2 table of the row's
  * subvectors to every centroid — computed once per QUERY, then each
  * candidate costs M lookups. */
case class PqDistTable(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqDists with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_table"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVecType(prettyName)
  override def nullSafeEval(input: Any): Any = {
    val d = dists(input)
    if (d == null) return null
    new GenericArrayData(d.map(row => new GenericArrayData(row): AnyRef))
  }
  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}
