package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-buffer partial-aggregation mechanics shared by the register
  * sketches (HLL family): byte-max merge — commutative, associative,
  * idempotent — and identity serde. One definition so a guard or fix
  * lands everywhere at once. */
sealed trait ByteMaxBufferAgg { self: TypedImperativeAggregate[Array[Byte]] =>
  protected final def byteMax(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = byteMax(a, b)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
}

/** Long-matrix partial-aggregation mechanics shared by the counter
  * sketches (CMS family): exact elementwise-sum merge and packed
  * fixed-width serde. */
sealed trait LongSumBufferAgg { self: TypedImperativeAggregate[Array[Long]] =>
  protected final def addInto(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = addInto(a, b)
  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

object Hll {
  /** Update one value into a 2^p-register buffer (shared by the
    * one-shot and mergeable aggregates). */
  def update(buf: Array[Byte], value: String, p: Int): Unit =
    update(buf, value.getBytes(java.nio.charset.StandardCharsets.UTF_8), p)

  /** Raw-UTF-8-bytes variant — the aggregate-side entry point (skips the
    * UTF8String decode+re-encode round trip). */
  def update(buf: Array[Byte], value: Array[Byte], p: Int): Unit = {
    val tailBits = 60 - p
    val tailMask = (1L << tailBits) - 1
    val h = TextKernels.md5Long(value)
    val reg = (h >>> tailBits).toInt
    val tail = h & tailMask
    val rho =
      if (tail == 0L) tailBits + 1
      else tailBits - (64 - java.lang.Long.numberOfLeadingZeros(tail)) + 1
    if (rho > buf(reg)) buf(reg) = rho.toByte
  }

  /** The order-pinned estimator (ascending registers, exact power-of-two
    * terms) with the linear-counting small-range branch — replayable
    * bit-for-bit by the SQL oracle. */
  def estimate(buf: Array[Byte]): Double = {
    val m = buf.length
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
}

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
  extends TypedImperativeAggregate[Array[Byte]] with ByteMaxBufferAgg
  with UnaryLike[Expression] {
  require(p >= 4 && p <= 16, s"hll precision must be in [4, 16], got $p")

  private val m = 1 << p

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
    if (v != null) Hll.update(buf, v.asInstanceOf[UTF8String].getBytes, p)
    buf
  }

  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def withNewMutableAggBufferOffset(off: Int): HllDistinct =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllDistinct =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

/** Mergeable-sketch variant of [[HllDistinct]]: emits the raw 2^p-byte
  * register buffer instead of the estimate. The DataSketches-style
  * pre-aggregation pattern for 100 TB rollups: sketch once per fine
  * grain (partition / day / source), persist the bytes, then combine
  * any coarser grain with [[HllMergeAgg]] + [[HllEstimate]] WITHOUT
  * rescanning the raw data. Register byte-max is associative,
  * commutative and idempotent, so a merge of merges equals the sketch
  * of the union — bit-for-bit. */
case class HllSketchAgg(
    child: Expression,
    p: Int = 10,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ByteMaxBufferAgg
  with UnaryLike[Expression] {
  require(p >= 4 && p <= 16, s"hll precision must be in [4, 16], got $p")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_sketch needs string, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.update(buf, v.asInstanceOf[UTF8String].getBytes, p)
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def withNewMutableAggBufferOffset(off: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** Combines [[HllSketchAgg]] buffers by register byte-max. Inputs whose
  * length is not 2^p are skipped (the malformed-input convention — one
  * corrupt persisted sketch must not kill a rollup). */
case class HllMergeAgg(
    child: Expression,
    p: Int = 10,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ByteMaxBufferAgg
  with UnaryLike[Expression] {
  require(p >= 4 && p <= 16, s"hll precision must be in [4, 16], got $p")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_merge needs binary, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val in = v.asInstanceOf[Array[Byte]]
      if (in.length == buf.length) byteMax(buf, in)
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def withNewMutableAggBufferOffset(off: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** Bottom-k (KMV) aggregate over (hash, id) pairs: keeps the k smallest
  * pairs ordered by (hash, id). The scale-correct shape for per-group
  * consistent sampling: a `row_number` window with few groups would drag
  * every group's full corpus slice onto one partition, while this
  * aggregate partial-combines — the shuffle carries at most k pairs per
  * group per partition regardless of corpus size. Deterministic: the
  * result is a pure function of the input SET (no order dependence), so
  * it matches the window formulation row-for-row.
  *
  * Input: a struct<h: long, id: long> child. Output: array of
  * struct<h, id> ascending by (h, id), length <= k. */
case class BottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]]
  with UnaryLike[Expression] {
  require(k >= 1 && k <= 4096, s"bottom-k size out of range: $k")

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bottom_k needs struct<long, long>, got $t")
  }

  override def createAggregationBuffer(): Buf = new Buf()

  // The buffer stays sorted ascending and capped at k; insertion keeps
  // it exact (k is small — this is a per-group sample, not a heap race).
  private def insert(buf: Buf, pair: (Long, Long)): Unit = {
    val pos = buf.indexWhere(p => p._1 > pair._1 || (p._1 == pair._1 && p._2 >= pair._2))
    if (pos == -1) { if (buf.length < k) buf += pair }
    else if (buf(pos) != pair) {
      buf.insert(pos, pair)
      if (buf.length > k) buf.remove(k)
    }
  }

  override def update(buf: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[InternalRow]
      insert(buf, (s.getLong(0), s.getLong(1)))
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.map { case (h, id) =>
      InternalRow(h, id): Any
    }.toArray)

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (h, id) => bb.putLong(h); bb.putLong(id) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    (0 until n).foreach(_ => buf += ((bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): BottomKAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BottomKAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): BottomKAgg =
    copy(child = newChild)
}

/** Equi-width histogram aggregate over a double column: `nBins` exact
  * Long counters covering [lo, hi) (out-of-range values clamp into the
  * edge bins), elementwise-sum merge via [[LongSumBufferAgg]] — fully
  * mergeable and deterministic, the distributed/streaming quantile shape
  * when an exact `percentile` would shuffle every value: the shuffle
  * carries nBins*8 bytes per group, quantiles read off the cumulative
  * counts with [[HistQuantile]], and error is bounded by the bin width.
  * Unlike randomized t-digest/KLL compaction, the sketch is a pure
  * function of the input multiset, so a SQL oracle replays it exactly. */
case class HistAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with LongSumBufferAgg
  with UnaryLike[Expression] {
  require(nBins >= 2 && nBins <= (1 << 20), s"hist bins out of range: $nBins")
  require(lo < hi, s"hist needs lo < hi, got [$lo, $hi)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hist_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hist_agg needs double, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBins)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN) {
        var bin = math.floor((x - lo) / (hi - lo) * nBins).toInt
        if (bin < 0) bin = 0
        if (bin >= nBins) bin = nBins - 1
        buf(bin) += 1L
      }
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def withNewMutableAggBufferOffset(off: Int): HistAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HistAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): HistAgg =
    copy(child = newChild)
}

/** Quantile estimate from a [[HistAgg]] bin-count array: continuous rank
  * t = q*N lands in the first bin whose cumulative count reaches it, and
  * the value interpolates linearly within that bin:
  * lo + (bin + (t - cumBefore)/cnt) * binWidth. Pure deterministic
  * arithmetic — the oracle replays it term for term. Empty sketch or
  * wrong length -> null. */
case class HistQuantile(child: Expression, q: Double, lo: Double, hi: Double, nBins: Int)
    extends UnaryExpression with CodegenFallback {
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
  require(nBins >= 2 && lo < hi, s"bad hist params: [$lo, $hi) x $nBins")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hist_quantile"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hist_quantile needs array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != nBins) return null
    var n = 0L
    var i = 0
    // null elements are malformed input -> null, same as wrong length
    while (i < nBins) {
      if (arr.isNullAt(i)) return null
      n += arr.getLong(i); i += 1
    }
    if (n == 0L) return null
    val t = q * n.toDouble
    val w = (hi - lo) / nBins
    var cum = 0L
    i = 0
    while (i < nBins) {
      val cnt = arr.getLong(i)
      if (cnt > 0 && (cum + cnt).toDouble >= t) {
        val frac = (t - cum.toDouble) / cnt.toDouble
        return lo + (i + frac) * w
      }
      cum += cnt
      i += 1
    }
    hi // t == N beyond the last counted bin (q = 1 with rounding)
  }
  override protected def withNewChildInternal(newChild: Expression): HistQuantile =
    copy(child = newChild)
}

/** Generic partial-combining per-group top-k aggregate: keeps the k
  * LARGEST input structs under the struct type's natural (field-wise)
  * ordering — put the primary sort key first and negate any field whose
  * tiebreak should run ascending. Multiset semantics (duplicates
  * retained), so the result is a pure function of the input multiset and
  * identical under any partitioning.
  *
  * This is the scale-correct replacement for `row_number().over(Window
  * .partitionBy(g).orderBy(...)) <= k` when groups are few or skewed: the
  * window drags every group's full slice onto one partition and sorts it,
  * while this aggregate partial-combines — at most k rows per group per
  * partition cross the shuffle, and nothing is ever globally sorted.
  * Output: array<struct>, descending. */
case class TopKByAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {
  require(k >= 1 && k <= 4096, s"top-k size out of range: $k")

  private type Buf = scala.collection.mutable.ArrayBuffer[InternalRow]

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType
      if s.fields.nonEmpty && s.fields.forall(f => RowOrdering.isOrderable(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"top_k_by needs an orderable struct, got $t")
  }

  @transient private lazy val ordering: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(structType.fields.map(_.dataType).toSeq)
  @transient private lazy val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(structType)

  override def createAggregationBuffer(): Buf = new Buf()

  // buffer kept sorted DESCENDING, capped at k; `own` materializes the
  // row into the buffer (a defensive unsafe copy on the update path; the
  // merge path's rows are already owned copies and pass through as-is)
  private def insert(buf: Buf, row: InternalRow, own: InternalRow => InternalRow): Unit = {
    if (buf.length == k && ordering.compare(row, buf.last) <= 0) return
    var pos = 0
    while (pos < buf.length && ordering.compare(buf(pos), row) >= 0) pos += 1
    buf.insert(pos, own(row))
    if (buf.length > k) buf.remove(k)
  }

  override def update(buf: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow], r => toUnsafe(r).copy())
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach(insert(a, _, identity))
    a
  }

  override def eval(buf: Buf): Any = new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    // every buffer entry is an owned UnsafeRow (insert copies on update,
    // deserialize materializes) — its bytes serialize directly
    val rows = buf.map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeRow].getBytes)
    val bb = java.nio.ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf += row
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKByAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKByAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): TopKByAgg =
    copy(child = newChild)
}

/** Reads the estimate out of a sketch buffer (scalar). Wrong-length
  * input -> null. */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hll_estimate"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_estimate needs binary, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    // power-of-two length in the supported precision range
    if (buf.length < 16 || buf.length > 65536 ||
        (buf.length & (buf.length - 1)) != 0) null
    else Hll.estimate(buf)
  }
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** Shared deterministic double-hashing scheme for the bit/counter sketches
  * (Kirsch-Mitzenmacher): from one 60-bit md5 hash `h`, probe `i` lands at
  * `(h mod m + i * (1 + (h div m) mod (m-1))) mod m`. Every term stays
  * well inside a non-negative Long (h < 2^60, m <= 2^30, i < 64), so a SQL
  * oracle replays the positions with plain integer arithmetic. */
object SketchHash {
  def positions(h: Long, m: Int, k: Int): Array[Int] = {
    val h1 = (h % m).toInt
    val h2 = (1L + (h / m) % (m - 1)).toInt
    val out = new Array[Int](k)
    var i = 0
    while (i < k) { out(i) = ((h1 + i.toLong * h2) % m).toInt; i += 1 }
    out
  }
}

/** Deterministic Bloom filter build aggregate: `numBits` bits (rounded up
  * to whole bytes), `numHashes` double-hashed probes per value, byte-OR
  * partial merge. The 100 TB use is semi-join pruning: aggregate the SMALL
  * side's join keys to one `m/8`-byte row, broadcast it, and drop most of
  * the big probe scan with [[BloomContains]] before the exact join — the
  * classic runtime-filter shape, but as a first-class reusable column.
  * Bit positions are md5-derived, so membership (including the false
  * positives) is identical under any partitioning and replayable by the
  * DuckDB oracle. */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(numBits >= 8 && numBits <= (1 << 30), s"bloom bits out of range: $numBits")
  require(numHashes >= 1 && numHashes <= 64, s"bloom hashes out of range: $numHashes")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_agg needs string, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte]((numBits + 7) / 8)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val ps = SketchHash.positions(
        TextKernels.md5Long(v.asInstanceOf[UTF8String].getBytes), numBits, numHashes)
      var i = 0
      while (i < ps.length) {
        buf(ps(i) >>> 3) = (buf(ps(i) >>> 3) | (1 << (ps(i) & 7))).toByte
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): BloomAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Membership probe against a [[BloomAgg]] filter: true iff all `numHashes`
  * double-hashed bits are set. Null-safe (null filter or value -> null);
  * a filter of the wrong byte length -> null rather than a crash, matching
  * the malformed-input convention of the array kernels. */
case class BloomContains(left: Expression, right: Expression, numBits: Int, numHashes: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  // a wrong-length filter yields null even when both children are
  // non-nullable — without this override the default child-derived
  // nullability would let codegen unbox that null into an NPE
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"bloom_contains needs (binary, string), got ($l, $r)")
  }
  override def nullSafeEval(filter: Any, value: Any): Any = {
    val buf = filter.asInstanceOf[Array[Byte]]
    if (buf.length != (numBits + 7) / 8) null
    else {
      val ps = SketchHash.positions(
        TextKernels.md5Long(value.asInstanceOf[UTF8String].getBytes), numBits, numHashes)
      var i = 0
      while (i < ps.length) {
        if ((buf(ps(i) >>> 3) & (1 << (ps(i) & 7))) == 0) return false
        i += 1
      }
      true
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}

/** Deterministic count-min sketch build aggregate: a `depth x width` Long
  * counter matrix (flattened row-major), one double-hashed column per row
  * per value, elementwise-sum partial merge. At 100 TB this turns "how
  * often does each of these probe keys appear in the corpus" into ONE scan
  * producing a `depth*width*8`-byte row — no token-level shuffle at all —
  * at the cost of a one-sided (over-count only) error bounded by
  * ~2N/width per row. Counters are exact integers and positions are
  * md5-derived, so the sketch (and every estimate read from it) is
  * bit-identical under any partitioning and replayable in SQL. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with LongSumBufferAgg
  with UnaryLike[Expression] {
  require(depth >= 1 && depth <= 16, s"cms depth out of range: $depth")
  require(width >= 2 && width <= (1 << 24), s"cms width out of range: $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_agg needs string, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val ps = SketchHash.positions(
        TextKernels.md5Long(v.asInstanceOf[UTF8String].getBytes), width, depth)
      var j = 0
      while (j < depth) { buf(j * width + ps(j)) += 1L; j += 1 }
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def withNewMutableAggBufferOffset(off: Int): CmsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CmsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}

/** Combines [[CmsAgg]] counter matrices by elementwise sum — counters are
  * exact integers, and sum is associative/commutative, so a merge of
  * merges equals the sketch of the concatenated inputs exactly. The same
  * persist-then-roll-up pattern as [[HllMergeAgg]]: sketch each fine
  * grain once, combine any coarser grain without rescanning. Inputs of
  * the wrong length are skipped (malformed-input convention). */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with LongSumBufferAgg
  with UnaryLike[Expression] {
  require(depth >= 1 && depth <= 16, s"cms depth out of range: $depth")
  require(width >= 2 && width <= (1 << 24), s"cms width out of range: $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_merge needs array<long>, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val in = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (in.numElements() == buf.length) {
        // pre-scan for null elements (malformed -> skip whole input, never
        // a partial add that would corrupt the buffer)
        var ok = true
        var i = 0
        while (ok && i < buf.length) { ok = !in.isNullAt(i); i += 1 }
        if (ok) {
          i = 0
          while (i < buf.length) { buf(i) += in.getLong(i); i += 1 }
        }
      }
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def withNewMutableAggBufferOffset(off: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** Point-frequency estimate from a [[CmsAgg]] sketch: min over the `depth`
  * row counters addressed by the value's double-hashed positions. Null-safe;
  * a sketch of the wrong length -> null. */
case class CmsQuery(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // same nullability contract as BloomContains: wrong-length sketch -> null
  override def nullable: Boolean = true
  override def prettyName: String = "cms_query"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"cms_query needs (array<long>, string), got ($l, $r)")
  }
  override def nullSafeEval(sketch: Any, value: Any): Any = {
    val arr = sketch.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != depth * width) null
    else {
      val ps = SketchHash.positions(
        TextKernels.md5Long(value.asInstanceOf[UTF8String].getBytes), width, depth)
      var best = Long.MaxValue
      var j = 0
      while (j < depth) {
        val idx = j * width + ps(j)
        if (arr.isNullAt(idx)) return null // malformed element -> null
        val c = arr.getLong(idx)
        if (c < best) best = c
        j += 1
      }
      best
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsQuery =
    copy(left = l, right = r)
}

/** Quantized elementwise vector-sum aggregate over fixed-`dim`
  * float/double arrays: each component is 1e-6-integer-quantized
  * (`floor(x * 1e6)` — floor, NOT round: a float like 2^-7 lands on an
  * exact 7812.5 where half-even and half-away engines disagree, while
  * floor of the IEEE-identical product is unambiguous) and summed as an
  * exact Long, so the aggregate is a pure function of the input
  * multiset — partition-order-independent and replayable
  * term-for-term by a SQL oracle. This is the
  * 100 TB-correct way to compute per-group embedding centroids: the
  * shuffle carries ONE dim-length Long row per group per partition,
  * where a posexplode + groupBy(group, dim) would shuffle n*dim rows.
  * Inputs of the wrong length, with null elements, or containing any
  * non-finite component (NaN/Infinity would saturate the Long) are
  * skipped whole (malformed-input convention — never a partial add). */
case class VecSumQAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with LongSumBufferAgg
  with UnaryLike[Expression] {
  require(dim >= 1 && dim <= (1 << 16), s"vec_sum_q dim out of range: $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_q"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_sum_q needs array<float|double>, got $t")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() == dim) {
        var ok = true
        var i = 0
        while (ok && i < dim) {
          ok = !arr.isNullAt(i) && java.lang.Double.isFinite(
            if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
          i += 1
        }
        if (ok) {
          i = 0
          while (i < dim) {
            val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            buf(i) += math.floor(x * 1000000.0).toLong
            i += 1
          }
        }
      }
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def withNewMutableAggBufferOffset(off: Int): VecSumQAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VecSumQAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): VecSumQAgg =
    copy(child = newChild)
}

/** Percentile (CDF value) of a point under a [[HistAgg]] bin-count
  * array — the inverse of [[HistQuantile]]: cdf(x) = (count below x's
  * bin + linear within-bin fraction of its own bin) / N. The
  * sketch-based normalization primitive: build per-group histograms
  * once (mergeable, bounded state), then score every row map-only
  * against the broadcast/literal bins — no per-group sort or window
  * over raw values, which is the non-scalable alternative. Pure
  * deterministic arithmetic, replayable term-for-term in SQL. Empty or
  * malformed sketches -> null. */
case class HistCdf(left: Expression, right: Expression,
                   lo: Double, hi: Double, nBins: Int)
    extends BinaryExpression with CodegenFallback {
  require(nBins >= 2 && lo < hi, s"bad hist params: [$lo, $hi) x $nBins")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hist_cdf"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"hist_cdf needs (array<long>, double), got ($l, $r)")
  }

  override def nullSafeEval(bins: Any, value: Any): Any = {
    val arr = bins.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != nBins) return null
    val x = value.asInstanceOf[Double]
    if (x.isNaN) return null
    var n = 0L
    var i = 0
    while (i < nBins) {
      if (arr.isNullAt(i)) return null
      n += arr.getLong(i); i += 1
    }
    if (n == 0L) return null
    val w = (hi - lo) / nBins
    var bin = math.floor((x - lo) / (hi - lo) * nBins).toInt
    if (bin < 0) bin = 0
    if (bin >= nBins) bin = nBins - 1
    var cum = 0L
    i = 0
    while (i < bin) { cum += arr.getLong(i); i += 1 }
    var frac = (x - lo) / w - bin
    if (frac < 0.0) frac = 0.0
    if (frac > 1.0) frac = 1.0
    (cum.toDouble + frac * arr.getLong(bin)) / n
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HistCdf =
    copy(left = l, right = r)
}

// ===========================================================================
// RQ — the deterministic mergeable RANK-QUANTILE sketch
// ===========================================================================

/** Shared mechanics of the RQ sketch — the turnkey continuous-column
  * quantile route the exact median/CDF family's bounded-histogram
  * guards point at (no pre-chosen [lo, hi) bin bounds, unlike
  * `hist_agg`).
  *
  * Design: VALUE-SAMPLING by hash level (the distinct-sampling idea of
  * Gibbons, VLDB'01, applied to rank estimation) instead of KLL's
  * coin-flip compaction — chosen because it is the construction that
  * makes the sketch a PURE FUNCTION OF THE INPUT MULTISET:
  *
  *   - a value v is in the sample at level j iff
  *     md5Long(str(v)) & (2^j − 1) == 0 (low bits of the corpus's
  *     standard 60-bit hash — deterministic, engine-replayable);
  *   - the sketch holds the EXACT occurrence count of every sampled
  *     value; inserts of a sampled value always pass (level-j pass
  *     implies level-j' pass for all j' <= j), so counts are never
  *     partial;
  *   - whenever the entry set exceeds `budget`, the level rises by one
  *     and entries failing the new mask drop (expected halving).
  *
  * MERGE == ONE-SHOT, bit-for-bit, under ANY merge tree: at every
  * point the entry set at level j over input multiset D is exactly
  * D_j = {v in D : hash passes 2^j} with full counts, and the final
  * level is J* = min{ j : |distinct(D_j)| <= budget } — the level can
  * never overshoot (it only rises while the CURRENT entry set, a
  * subset of the final D_j, already exceeds the budget, which implies
  * j < J*) and never undershoot (the run ends with all values present
  * and the budget enforced). So the final state is a function of
  * (distinct values + counts, budget) alone — partitioning, arrival
  * order and merge grouping cannot move it, which is what lets a SQL
  * oracle replay the sketch and a gate prove mergeability itself (the
  * q61 discipline).
  *
  * Estimation: every sampled value survives with probability 2^-J*,
  * so rank(t) ≈ 2^J* · Σ_{sampled v <= t} count(v) (Horvitz-Thompson,
  * unbiased); for QUANTILES the 2^J* factor cancels — the p-quantile
  * estimate is simply the count-weighted p-quantile OF THE SAMPLE,
  * a pure integer-comparison pick (no floating point at all). The
  * sketch targets exactly the regime the exact family rejects:
  * high-cardinality (continuous) columns, where per-value counts are
  * tiny and the sample behaves like a uniform value sample. For hot
  * discrete columns use the exact median/CDF family — the two routes
  * are complementary and the guards name both.
  *
  * Canonical serialization (level, n, pairs sorted by value) makes
  * equal sketches byte-equal — gates can compare the binary itself.
  */
object RqSketch {
  /** Growable sketch state: sampling level + exact counts by value. */
  final class Buf(var level: Int,
                  val entries: scala.collection.mutable.HashMap[Long, Long])

  def emptyBuf(): Buf = new Buf(0, scala.collection.mutable.HashMap.empty)

  def hash(v: Long): Long = TextKernels.md5Long(java.lang.Long.toString(v))

  private def passes(v: Long, level: Int): Boolean =
    (hash(v) & ((1L << level) - 1L)) == 0L

  /** Raise the level until the entry set fits the budget. */
  private def compact(buf: Buf, budget: Int): Unit =
    while (buf.entries.size > budget) {
      buf.level += 1
      require(buf.level <= 60,
        "rq sketch exhausted its 60-bit hash — budget too small")
      buf.entries.filterInPlace((v, _) => passes(v, buf.level))
    }

  def insert(buf: Buf, v: Long, c: Long, budget: Int): Unit =
    if (passes(v, buf.level)) {
      buf.entries.update(v, buf.entries.getOrElse(v, 0L) + c)
      compact(buf, budget)
    }

  def merge(a: Buf, b: Buf, budget: Int): Buf = {
    if (b.level > a.level) {
      a.level = b.level
      a.entries.filterInPlace((v, _) => passes(v, a.level))
    }
    b.entries.foreach { case (v, c) =>
      if (passes(v, a.level))
        a.entries.update(v, a.entries.getOrElse(v, 0L) + c)
    }
    compact(a, budget)
    a
  }

  /** Canonical bytes: level, n, then (value, count) pairs ascending by
    * value — equal sketches are byte-equal. */
  def serialize(buf: Buf): Array[Byte] = {
    val sorted = buf.entries.toArray.sortBy(_._1)
    val bb = java.nio.ByteBuffer.allocate(8 + sorted.length * 16)
    bb.putInt(buf.level)
    bb.putInt(sorted.length)
    sorted.foreach { case (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val level = bb.getInt
    val n = bb.getInt
    val m = scala.collection.mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    new Buf(level, m)
  }
}

/** Builds an RQ sketch over a long column (see [[RqSketch]]). Output:
  * the canonical sketch bytes — persist per fine grain, roll up with
  * [[RqMergeAgg]], read quantiles with [[RqQuantile]]. */
case class RqSketchAgg(
    child: Expression,
    budget: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RqSketch.Buf] with UnaryLike[Expression] {
  require(budget >= 16 && budget <= (1 << 20),
    s"rq budget out of range [16, 2^20]: $budget")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "rq_sketch"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rq_sketch needs long, got $t")
  }

  override def createAggregationBuffer(): RqSketch.Buf = RqSketch.emptyBuf()

  override def update(buf: RqSketch.Buf, row: InternalRow): RqSketch.Buf = {
    val v = child.eval(row)
    if (v != null) RqSketch.insert(buf, v.asInstanceOf[Long], 1L, budget)
    buf
  }

  override def merge(a: RqSketch.Buf, b: RqSketch.Buf): RqSketch.Buf =
    RqSketch.merge(a, b, budget)

  override def eval(buf: RqSketch.Buf): Any = RqSketch.serialize(buf)
  override def serialize(buf: RqSketch.Buf): Array[Byte] = RqSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): RqSketch.Buf =
    RqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): RqSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): RqSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): RqSketchAgg =
    copy(child = newChild)
}

/** Combines persisted [[RqSketchAgg]] bytes — merge of merges equals
  * the one-shot sketch of the union, byte-for-byte (see [[RqSketch]]).
  * NULL inputs skip (a grain with no sketch contributes nothing). */
case class RqMergeAgg(
    child: Expression,
    budget: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RqSketch.Buf] with UnaryLike[Expression] {
  require(budget >= 16 && budget <= (1 << 20),
    s"rq budget out of range [16, 2^20]: $budget")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "rq_merge"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rq_merge needs binary, got $t")
  }

  override def createAggregationBuffer(): RqSketch.Buf = RqSketch.emptyBuf()

  override def update(buf: RqSketch.Buf, row: InternalRow): RqSketch.Buf = {
    val v = child.eval(row)
    if (v != null)
      RqSketch.merge(buf, RqSketch.deserialize(v.asInstanceOf[Array[Byte]]),
        budget)
    buf
  }

  override def merge(a: RqSketch.Buf, b: RqSketch.Buf): RqSketch.Buf =
    RqSketch.merge(a, b, budget)

  override def eval(buf: RqSketch.Buf): Any = RqSketch.serialize(buf)
  override def serialize(buf: RqSketch.Buf): Array[Byte] = RqSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): RqSketch.Buf =
    RqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): RqMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): RqMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): RqMergeAgg =
    copy(child = newChild)
}

/** Type-1 (lower) quantile estimate at rational p = pNum/pDen from RQ
  * sketch bytes: the smallest sampled value whose cumulative sample
  * count k satisfies k·pDen >= pNum·total — the Horvitz-Thompson 2^J
  * scale cancels, so the pick is PURE INTEGER comparisons over the
  * canonical (already value-sorted) entries; the result is an actual
  * data value. Empty sketch -> null. */
case class RqQuantile(child: Expression, pNum: Long, pDen: Long)
    extends UnaryExpression with CodegenFallback {
  require(pDen >= 1 && pNum >= 1 && pNum <= pDen,
    s"rq_quantile needs 1 <= pNum <= pDen, got $pNum/$pDen")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rq_quantile"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rq_quantile needs binary, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    bb.getInt // level — unused: the scale cancels in the rank test
    val n = bb.getInt
    if (n == 0) return null
    val vs = new Array[Long](n)
    val cs = new Array[Long](n)
    var i = 0
    var total = 0L
    while (i < n) { vs(i) = bb.getLong; cs(i) = bb.getLong; total += cs(i); i += 1 }
    var cum = 0L
    i = 0
    while (i < n) {
      cum += cs(i)
      if (cum * pDen >= pNum * total) return vs(i)
      i += 1
    }
    vs(n - 1)
  }
  override protected def withNewChildInternal(newChild: Expression): RqQuantile =
    copy(child = newChild)
}

/** Estimated row count behind RQ sketch bytes: Σ counts · 2^level
  * (Horvitz-Thompson — each sampled value's exact count stands for
  * ~2^level values' counts). Also exposes the sample diagnostics the
  * caller sizes budgets with. Output struct: (level, n_sample, n_est). */
case class RqInfo(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("level", IntegerType, nullable = false),
    StructField("n_sample", LongType, nullable = false),
    StructField("n_est", LongType, nullable = false)))
  override def prettyName: String = "rq_info"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rq_info needs binary, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    val level = bb.getInt
    val n = bb.getInt
    var total = 0L
    var i = 0
    while (i < n) { bb.getLong; total += bb.getLong; i += 1 }
    InternalRow(level, n.toLong, total << level)
  }
  override protected def withNewChildInternal(newChild: Expression): RqInfo =
    copy(child = newChild)
}

/** WEIGHTED [[RqSketchAgg]]: each (value, weight) row adds `weight` to
  * the value's exact count — token-weighted length quantiles,
  * quantity-weighted price quantiles, duration-weighted session
  * medians at sketch scale (the continuous-column sibling of the exact
  * `exactGroupWeightedMedianX2`). Rows with NULL or non-positive
  * weight are SKIPPED (the sketch state must stay a pure function of
  * the positive-weighted multiset — a zero-weight entry would change
  * the canonical bytes without changing any rank). Same level
  * machinery, same merge == one-shot invariant; `rq_quantile` then
  * picks weighted quantiles and `rq_info`'s n_est estimates TOTAL
  * WEIGHT. Input: struct<v: long, w: long>. */
case class RqSketchWAgg(
    child: Expression,
    budget: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RqSketch.Buf] with UnaryLike[Expression] {
  require(budget >= 16 && budget <= (1 << 20),
    s"rq budget out of range [16, 2^20]: $budget")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "rq_sketch_w"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
      if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rq_sketch_w needs struct<long, long>, got $t")
  }

  override def createAggregationBuffer(): RqSketch.Buf = RqSketch.emptyBuf()

  override def update(buf: RqSketch.Buf, row: InternalRow): RqSketch.Buf = {
    val s = child.eval(row)
    if (s != null) {
      val r = s.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val w = r.getLong(1)
        if (w > 0L) RqSketch.insert(buf, r.getLong(0), w, budget)
      }
    }
    buf
  }

  override def merge(a: RqSketch.Buf, b: RqSketch.Buf): RqSketch.Buf =
    RqSketch.merge(a, b, budget)

  override def eval(buf: RqSketch.Buf): Any = RqSketch.serialize(buf)
  override def serialize(buf: RqSketch.Buf): Array[Byte] = RqSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): RqSketch.Buf =
    RqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): RqSketchWAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): RqSketchWAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): RqSketchWAgg =
    copy(child = newChild)
}

/** Estimated CDF (percentile) of a point under RQ sketch bytes:
  * cum(sampled v <= x) / total — the Horvitz-Thompson scale cancels,
  * so the estimate is exact integer sums with ONE final double
  * division (engine-exact). The sketch-based per-group
  * percentile-normalization primitive for continuous columns (the
  * rq twin of `hist_cdf` — no bin bounds — and of the exact
  * `exactGroupCdf` for discrete ones). Empty sketch -> null. */
case class RqCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rq_cdf"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rq_cdf needs (binary, long), got $t")
    }
  override def nullSafeEval(sketch: Any, x: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(sketch.asInstanceOf[Array[Byte]])
    bb.getInt // level cancels
    val n = bb.getInt
    if (n == 0) return null
    val t = x.asInstanceOf[Long]
    var cum = 0L
    var total = 0L
    var i = 0
    while (i < n) {
      val v = bb.getLong
      val c = bb.getLong
      if (v <= t) cum += c
      total += c
      i += 1
    }
    cum.toDouble / total.toDouble
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RqCdf =
    copy(left = l, right = r)
}

/** `rq_ks(sketch_a, sketch_b)` — the two-sample Kolmogorov–Smirnov
  * drift statistic ESTIMATED from two RQ sketches: the sketch-scale
  * twin of the exact `Stats.ksStatistic`, for the continuous columns
  * whose bounded-histogram contract the exact operator rejects.
  *
  * D = max over thresholds t of |cdfA(t) − cdfB(t)|, with each side's
  * CDF taken over its own retained sample (cum/total of exact sampled
  * counts — each side's Horvitz–Thompson 2^level scale cancels inside
  * its own ratio, the `rq_cdf` argument). The max is attained at a
  * sampled value of one of the two sketches, so one merged ascending
  * walk over both samples finds it; the comparison stays EXACT by
  * cross-multiplication (|cumA·totB − cumB·totA| in int64, safe to
  * ~3·10⁹ sampled counts per side — the `ksStatistic` discipline) and
  * the single division at the end is the only floating-point op.
  * Deterministic given the two sketches, and the sketches are pure
  * functions of their input multisets — so a SQL oracle can replay
  * construction AND statistic bit-for-bit.
  *
  * Output struct: (n_a, n_b, d_num, d) with n_a/n_b the retained
  * sample totals, d = d_num / (n_a·n_b). Null if either sketch is
  * empty. */
case class RqKs(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_a", LongType, nullable = false),
    StructField("n_b", LongType, nullable = false),
    StructField("d_num", LongType, nullable = false),
    StructField("d", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "rq_ks"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rq_ks needs (binary, binary), got $t")
    }
  private def pairs(bytes: Array[Byte]): (Array[Long], Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt // level cancels inside the side's own CDF
    val n = bb.getInt
    val vs = new Array[Long](n)
    val cs = new Array[Long](n)
    var i = 0
    while (i < n) { vs(i) = bb.getLong; cs(i) = bb.getLong; i += 1 }
    (vs, cs) // canonical serialization: already ascending by value
  }
  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val (va, ca) = pairs(aAny.asInstanceOf[Array[Byte]])
    val (vb, cb) = pairs(bAny.asInstanceOf[Array[Byte]])
    if (va.length == 0 || vb.length == 0) return null
    var totA = 0L; var totB = 0L
    ca.foreach(totA += _); cb.foreach(totB += _)
    var i = 0; var j = 0
    var cumA = 0L; var cumB = 0L
    var dNum = 0L
    // merged ascending walk: advance BOTH cursors past the current
    // threshold value before comparing (CDFs are right-continuous at t)
    while (i < va.length || j < vb.length) {
      val t = if (j >= vb.length || (i < va.length && va(i) <= vb(j)))
        va(i) else vb(j)
      while (i < va.length && va(i) == t) { cumA += ca(i); i += 1 }
      while (j < vb.length && vb(j) == t) { cumB += cb(j); j += 1 }
      val gap = math.abs(cumA * totB - cumB * totA)
      if (gap > dNum) dNum = gap
    }
    InternalRow(totA, totB, dNum,
      dNum.toDouble / (totA * totB).toDouble)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RqKs =
    copy(left = l, right = r)
}

/** `kmv_set_ops(a, b, k)` — theta-sketch-style SET OPERATION estimates
  * from two `bottom_k` samples built with the same k over the 60-bit
  * md5 hash space: union cardinality, Jaccard, and intersection
  * cardinality WITHOUT ever joining the underlying sets (the
  * Dataverse/DataSketches theta-union idea on KMV samples; Beyer et
  * al. SIGMOD'07).
  *
  *   τ   = min(τ_A, τ_B), where τ_X = the k-th smallest hash when the
  *         sample is FULL, else 2⁶⁰ (a partial sample saw everything)
  *   S   = {distinct h from either sample : h < τ}   (both samples are
  *         complete below τ, so S is an exact uniform hash sample of
  *         the union)
  *   d_union     = |S| · 2⁶⁰ / τ        (exact |S| when τ = 2⁶⁰)
  *   jaccard     = |S ∩ A ∩ B| / |S|
  *   d_intersect = |S ∩ A ∩ B| · 2⁶⁰ / τ
  *
  * All counts are exact integers; the two scale divisions and one
  * ratio are the only floats — engine-replayable against a SQL
  * bottom-k (ORDER BY h LIMIT k, the q57 discipline). Sketches of
  * different k compose (τ handles it), but the gate keeps one k.
  * Null inputs yield null; both-empty yields n_s = 0 with NaN jaccard.
  * Output struct: (tau, n_s, n_common, d_union, jaccard, d_intersect). */
case class KmvSetOps(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  require(k >= 1 && k <= 4096, s"kmv_set_ops k out of range: $k")
  private val SPACE = 1152921504606846976L // 2^60, the md5Long range
  override def dataType: DataType = StructType(Seq(
    StructField("tau", LongType, nullable = false),
    StructField("n_s", LongType, nullable = false),
    StructField("n_common", LongType, nullable = false),
    StructField("d_union", DoubleType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false),
    StructField("d_intersect", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_set_ops"
  private def okType(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(a, b)), _) =>
      a.dataType == LongType && b.dataType == LongType
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_set_ops needs two array<struct<long, long>> bottom_k samples, " +
        s"got ${left.dataType}, ${right.dataType}")
  /** Distinct hashes ascending (bottom_k emits (h, id) sorted, unique
    * by pair — collapse to unique by h). */
  private def hashes(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val h = a.getStruct(i, 2).getLong(0)
      if (m == 0 || out(m - 1) != h) { out(m) = h; m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }
  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val ha = hashes(aAny.asInstanceOf[ArrayData])
    val hb = hashes(bAny.asInstanceOf[ArrayData])
    val tauA = if (ha.length == k) ha.last else SPACE
    val tauB = if (hb.length == k) hb.last else SPACE
    val tau = math.min(tauA, tauB)
    // merged walk below tau: count distinct union hashes and commons
    var i = 0; var j = 0
    var nS = 0L; var common = 0L
    while ((i < ha.length && ha(i) < tau) || (j < hb.length && hb(j) < tau)) {
      val aOk = i < ha.length && ha(i) < tau
      val bOk = j < hb.length && hb(j) < tau
      if (aOk && bOk && ha(i) == hb(j)) {
        nS += 1; common += 1; i += 1; j += 1
      } else if (bOk && (!aOk || hb(j) < ha(i))) { nS += 1; j += 1 }
      else { nS += 1; i += 1 }
    }
    val dUnion = if (tau == SPACE) nS.toDouble
      else nS.toDouble * SPACE.toDouble / tau.toDouble
    val jac = if (nS == 0L) Double.NaN else common.toDouble / nS.toDouble
    val dInt = if (tau == SPACE) common.toDouble
      else common.toDouble * SPACE.toDouble / tau.toDouble
    InternalRow(tau, nS, common, dUnion, jac, dInt)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvSetOps = copy(left = l, right = r)
}
