package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HyperLogLog distinct-count sketch as a real Catalyst
  * `TypedImperativeAggregate`: per-partition register buffers, byte-max
  * partial merge — the shape that makes a 100 TB distinct-count one scan
  * with a 2^p-byte shuffle per group instead of a distinct-shuffle of
  * every value.
  *
  * Everything is pinned so the estimate is REPRODUCIBLE — identical
  * under any partitioning, task order, or engine:
  *  - hash = md5 of the UTF-8 string, top 60 bits (TextKernels.md5Long,
  *    the corpus's standard hash);
  *  - register = top p hash bits, rho = position of the first set bit in
  *    the remaining 60-p (zero tail -> 60-p+1);
  *  - byte-max register merge is commutative/associative/idempotent, so
  *    partial aggregation order cannot change the buffer;
  *  - the estimator folds registers in ASCENDING index order with exact
  *    power-of-two terms (1.0 / (1L << rho)), so even the floating sum
  *    is order-pinned and a SQL oracle can replay it bit-for-bit.
  * Estimator: alpha_m m^2 / sum(2^-rho_j) with the standard linear-
  * counting small-range correction (E <= 2.5m and empty registers);
  * the large-range correction (E > 2^32/30) is out of scope for 60-bit
  * hashes at corpus scales.
  */
case class HllDistinct(
    child: Expression,
    p: Int = 10,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(p >= 4 && p <= 16, s"hll precision must be in [4, 16], got $p")

  private val m = 1 << p
  private val tailBits = 60 - p // md5Long yields 60-bit hashes
  private val tailMask = (1L << tailBits) - 1

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_distinct needs string, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val h = TextKernels.md5Long(v.asInstanceOf[UTF8String].toString)
      val reg = (h >>> tailBits).toInt
      val tail = h & tailMask
      val rho =
        if (tail == 0L) tailBits + 1
        else tailBits - (64 - java.lang.Long.numberOfLeadingZeros(tail)) + 1
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf(i).toInt
      s += 1.0 / (1L << r) // exact power of two per term
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / m)
    val est = alpha * m * m / s
    if (est <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else est
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): HllDistinct =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllDistinct =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}
