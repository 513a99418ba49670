package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the frame-axis analytics Spark lacks.
  *
  * These are the three "hard parts" from SURVEY.md §7: Savitzky–Golay
  * smoothing (`dpl/processor/nodes/bboxes.py:159-162`), linear resampling
  * with half-sample phase offsets (`dpl/wav2vec/utils.py:5-21`), and
  * edge-replicated moving windows (`dpl/processor/utils.py:68-98`). Each
  * operates on a whole per-clip series (an `array<double>` column), so one
  * invocation amortizes over N frames; the per-element math is tight
  * primitive loops (CodegenFallback at the array level, but the hot loops
  * are JIT-compiled Scala — no per-element virtual calls).
  */

/** Null-element guard for the long-array kernels: the public
  * graft.functions API accepts `array<long>` regardless of its
  * declared `containsNull` (internal producers — collect_list,
  * transform over struct fields — often carry `containsNull = true`
  * even when no null can occur), so kernels that read raw elements
  * (`toLongArray`/`getLong`, both undefined over null slots: garbage
  * from unsafe buffers or an NPE from generic rows) probe for an
  * actual null element first and return SQL NULL instead — the same
  * contract as every built-in null-strict function. */
private[functions] object ArrayNulls {
  def anyNull(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }
}

/** `savgol_filter(x, window, polyorder)` over an array<double> column,
  * matching scipy's default mode="interp" boundary handling.
  * Series shorter than `window` yield null (scipy raises; we route to the
  * permissive error channel instead).
  */
case class SavitzkyGolay(child: Expression, window: Int, polyorder: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "savgol_filter"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"savgol_filter needs array<double>, got $t")
  }
  @transient private lazy val c = SavGol.coeffs(window, polyorder)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData].toDoubleArray()
    if (xs.length < window) null
    else {
      c // force coefficient computation
      new GenericArrayData(SavGol(xs, window, polyorder))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): SavitzkyGolay =
    copy(child = newChild)
}

/** Linear-interpolation resample of a series from `len(y)` samples at
  * `sourceFps` to `num` samples, with the reference's half-sample phase
  * offsets and linear extrapolation (`dpl/wav2vec/utils.py:5-21`):
  * x = linspace(1/(2*fps), L, len(y)), x_hat = linspace(1/(2*fps_hat), L, num).
  * Identity when `len(y) == num`.
  */
case class LinearResample(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  def y: Expression = first; def num: Expression = second; def sourceFps: Expression = third
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "linear_resample"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType | LongType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"linear_resample needs (array<double>, int, double), got $t")
    }
  override def nullable: Boolean = true
  override def nullSafeEval(yv: Any, numv: Any, fpsv: Any): Any = {
    val xs = yv.asInstanceOf[ArrayData].toDoubleArray()
    val num = numv match { case i: Int => i; case l: Long => l.toInt }
    val fps = fpsv.asInstanceOf[Double]
    new GenericArrayData(LinearResample.resample(xs, num, fps))
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LinearResample = copy(f, s, t)
}

/** LinearResample for a VECTOR series (array<array<double>>, e.g. the
  * wav2vec (T,256) feature matrix): the same segment/phase arithmetic,
  * lerped element-wise per component (reference resamples the matrix along
  * axis 0, `dpl/wav2vec/utils.py:5-21` with `axis=0` interp1d). */
case class LinearResampleVec(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "linear_resample_vec"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), IntegerType | LongType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"linear_resample_vec needs (array<array<double>>, int, double), got $t")
    }
  override def nullable: Boolean = true
  override def nullSafeEval(yv: Any, numv: Any, fpsv: Any): Any = {
    val arr = yv.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // null or ragged inner rows null the ROW instead of throwing mid-task
    // (same malformed-clip convention as EdgeMovingAvgVec)
    var i0 = 0
    while (i0 < n) { if (arr.isNullAt(i0)) return null; i0 += 1 }
    val rows = Array.tabulate(n)(i => arr.getArray(i).toDoubleArray())
    i0 = 1
    while (i0 < n) { if (rows(i0).length != rows(0).length) return null; i0 += 1 }
    val num = numv match { case i: Int => i; case l: Long => l.toInt }
    val fps = fpsv.asInstanceOf[Double]
    if (n == num) return new GenericArrayData(rows.map(new GenericArrayData(_): Any))
    if (n < 2) return null
    val lengthSec = n / fps
    val targetFps = num / lengthSec
    val x = LinearResample.linspace(1.0 / (fps * 2), lengthSec, n)
    val xHat = LinearResample.linspace(1.0 / (targetFps * 2), lengthSec, num)
    val dim = rows(0).length
    val out = new Array[Any](num)
    var seg = 0
    var j = 0
    while (j < num) {
      val tpos = xHat(j)
      while (seg < n - 2 && x(seg + 1) < tpos) seg += 1
      val f = (tpos - x(seg)) / (x(seg + 1) - x(seg))
      val v = new Array[Double](dim)
      var c = 0
      while (c < dim) {
        v(c) = rows(seg)(c) + f * (rows(seg + 1)(c) - rows(seg)(c))
        c += 1
      }
      out(j) = new GenericArrayData(v)
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LinearResampleVec = copy(f, s, t)
}

object LinearResample {
  def resample(y: Array[Double], num: Int, sourceFps: Double): Array[Double] = {
    val n = y.length
    if (n == num) return y.clone()
    val lengthSec = n / sourceFps
    val targetFps = num / lengthSec
    val dx = 1.0 / (sourceFps * 2)
    val dxHat = 1.0 / (targetFps * 2)
    // np.linspace(a, b, k): a + i*(b-a)/(k-1); k==1 -> [a]
    val x = linspace(dx, lengthSec, n)
    val xHat = linspace(dxHat, lengthSec, num)
    val out = new Array[Double](num)
    var j = 0
    var seg = 0 // index such that x(seg) <= t < x(seg+1), clamped for extrapolation
    while (j < num) {
      val t = xHat(j)
      if (n == 1) { out(j) = y(0) }
      else {
        while (seg < n - 2 && x(seg + 1) < t) seg += 1
        // scipy interp1d with extrapolation: use end segments beyond range
        val x0 = x(seg); val x1 = x(seg + 1)
        val f = (t - x0) / (x1 - x0)
        out(j) = y(seg) + f * (y(seg + 1) - y(seg))
      }
      j += 1
    }
    out
  }
  def linspace(a: Double, b: Double, k: Int): Array[Double] = {
    if (k == 1) Array(a)
    else {
      val step = (b - a) / (k - 1)
      Array.tabulate(k)(i => if (i == k - 1) b else a + i * step)
    }
  }
}

/** Edge-replicated sliding-window mean (`as_windowed(x, w, mode="edge")
  * .mean(axis=1)`, `dpl/processor/utils.py:68-98` + `h5.py:235-237`):
  * out[i] = mean of x[clamp(j, 0, n-1)] for j in [i-(w-w/2), i+w/2-1].
  */
case class EdgeMovingAvg(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "edge_moving_avg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"edge_moving_avg needs array<double>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(EdgeMovingAvg.apply(xs, window))
  }
  override protected def withNewChildInternal(newChild: Expression): EdgeMovingAvg =
    copy(child = newChild)
}

/** Per-dimension edge-replicated sliding-window mean over a (T, dim)
  * matrix column — `average_features` applied to the wav2vec matrix
  * (`dpl/processor/nodes/h5.py:235-237`): column d of the output is
  * EdgeMovingAvg of column d of the input, with the same clamped window
  * and per-dimension accumulation order as the scalar expression. */
case class EdgeMovingAvgVec(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "edge_moving_avg_vec"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"edge_moving_avg_vec needs array<array<double>>, got $t")
  }
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // null or ragged inner rows null the ROW instead of throwing mid-task
    // (one malformed clip must not kill the job) — the same convention as
    // IvfScores' dim-mismatch -> null
    var i0 = 0
    while (i0 < n) { if (arr.isNullAt(i0)) return null; i0 += 1 }
    val rows = Array.tabulate(n)(i => arr.getArray(i).toDoubleArray())
    val dim = rows(0).length
    i0 = 1
    while (i0 < n) { if (rows(i0).length != dim) return null; i0 += 1 }
    val lo = window - window / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = new Array[Double](dim)
      var j = i - lo
      val end = i + window / 2 - 1
      while (j <= end) {
        val k = if (j < 0) 0 else if (j >= n) n - 1 else j
        var d = 0
        while (d < dim) { v(d) += rows(k)(d); d += 1 }
        j += 1
      }
      var d = 0
      while (d < dim) { v(d) /= window; d += 1 }
      out(i) = new GenericArrayData(v)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): EdgeMovingAvgVec =
    copy(child = newChild)
}

object EdgeMovingAvg {
  def apply(xs: Array[Double], w: Int): Array[Double] = {
    val n = xs.length
    if (n == 0) return Array.empty
    val lo = w - w / 2 // left pad size
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      var j = i - lo
      val end = i + w / 2 - 1
      while (j <= end) {
        val k = if (j < 0) 0 else if (j >= n) n - 1 else j
        s += xs(k)
        j += 1
      }
      out(i) = s / w
      i += 1
    }
    out
  }
}

/** Per-bucket mean of |x| over fixed-size hops — the reference's audio
  * volume (`dpl/wav2vec/inference.py:94-106`): bucket k = mean of
  * abs(x[k*hop .. min((k+1)*hop, n)-1]); the last partial bucket counts.
  */
case class BucketMeanAbs(child: Expression, hop: Int)
    extends UnaryExpression with CodegenFallback {
  require(hop > 0)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bucket_mean_abs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bucket_mean_abs needs array<double>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData].toDoubleArray()
    val n = xs.length
    val nb = (n + hop - 1) / hop
    val out = new Array[Double](nb)
    var k = 0
    while (k < nb) {
      val start = k * hop
      val end = math.min(start + hop, n)
      var s = 0.0
      var j = start
      while (j < end) { s += math.abs(xs(j)); j += 1 }
      out(k) = s / (end - start)
      k += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): BucketMeanAbs =
    copy(child = newChild)
}

/** EmocaLikeBboxesNode.make_equal_size (`dpl/processor/nodes/bboxes.py:172-195`)
  * as one pass: given a clip's square boxes `array<struct<x1,y1,x2,y2: long>>`,
  * rewrite all to the q-quantile size (np.quantile linear interpolation,
  * truncated to long, bumped to even), clipping negative top-left corners.
  * A HOF composition re-sorted the size array once per output element after
  * CollapseProject inlining; here the quantile is computed once.
  */
case class EqualSizeBoxes(child: Expression, quantile: Double)
    extends UnaryExpression with CodegenFallback {
  require(quantile >= 0 && quantile <= 1)
  private val boxType = StructType(Seq(
    StructField("x1", LongType), StructField("y1", LongType),
    StructField("x2", LongType), StructField("y2", LongType)))
  override def dataType: DataType = ArrayType(boxType, containsNull = false)
  override def prettyName: String = "equal_size_boxes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
      if fields.length == 4 && fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"equal_size_boxes needs array<struct<x1,y1,x2,y2: long>>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val boxes = Array.tabulate(n) { i =>
      val r = arr.getStruct(i, 4)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val sizes = boxes.map(b => b._3 - b._1).sorted
    // np.quantile linear interpolation, truncated (.astype(int64))
    val pos = (n - 1).toDouble * quantile
    val lo = sizes(math.floor(pos).toInt).toDouble
    val hi = sizes(math.min(math.floor(pos).toInt + 1, n - 1)).toDouble
    val qv = (lo + (pos - math.floor(pos)) * (hi - lo)).toLong
    val sz = qv + (qv % 2 + 2) % 2 // bump to even (sizes non-negative)
    val out: Array[Any] = boxes.map { case (x1, y1, x2, _) =>
      val off = math.floor((x2 - x1 - sz) / 2.0).toLong
      val nx1 = math.max(x1 + off, 0L)
      val ny1 = math.max(y1 + off, 0L)
      InternalRow(nx1, ny1, nx1 + sz, ny1 + sz): Any
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): EqualSizeBoxes =
    copy(child = newChild)
}

/** EmocaLikeBboxesNode.get_bboxes (`dpl/processor/nodes/bboxes.py:123-145`)
  * in one pass: per frame i, a square box from min/max of the landmarks in
  * frames [i - w/2, i + (w - w/2)) (clamped), with the FixedBboxes square
  * math (`bboxes.py:67-81`: size=(w+h)/2*1.1, int-truncating casts).
  * Input `array<array<struct<x,y: double>>>`; output
  * `array<struct<x1,y1,x2,y2: long>>`. A Column composition re-evaluated
  * the window scan ~24x per frame (once per struct-field reference).
  */
case class SlidingBoxes(child: Expression, scale: Double, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(window > 0)
  private val boxType = StructType(Seq(
    StructField("x1", LongType), StructField("y1", LongType),
    StructField("x2", LongType), StructField("y2", LongType)))
  override def dataType: DataType = ArrayType(boxType, containsNull = false)
  // malformed rows (null frames/points) yield null regardless of child
  // nullability — see the guard in nullSafeEval
  override def nullable: Boolean = true
  override def prettyName: String = "sliding_boxes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(StructType(f), _), _)
      if f.length == 2 && f.forall(_.dataType == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sliding_boxes needs array<array<struct<x,y: double>>>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // null frames or null points null the ROW instead of throwing
    // mid-task (same malformed-clip convention as EdgeMovingAvgVec)
    val fxMin = new Array[Double](n); val fxMax = new Array[Double](n)
    val fyMin = new Array[Double](n); val fyMax = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val frame = arr.getArray(i)
      val m = frame.numElements()
      var xmn = Double.PositiveInfinity; var xmx = Double.NegativeInfinity
      var ymn = Double.PositiveInfinity; var ymx = Double.NegativeInfinity
      var k = 0
      while (k < m) {
        if (frame.isNullAt(k)) return null
        val p = frame.getStruct(k, 2)
        val x = p.getDouble(0); val y = p.getDouble(1)
        if (x < xmn) xmn = x; if (x > xmx) xmx = x
        if (y < ymn) ymn = y; if (y > ymx) ymx = y
        k += 1
      }
      fxMin(i) = xmn; fxMax(i) = xmx; fyMin(i) = ymn; fyMax(i) = ymx
      i += 1
    }
    val offL = window / 2
    val offR = window - offL
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val s = math.max(i - offL, 0)
      val e = math.min(i + offR, n) // exclusive
      var l = Double.PositiveInfinity; var r = Double.NegativeInfinity
      var t = Double.PositiveInfinity; var b = Double.NegativeInfinity
      var j = s
      while (j < e) {
        if (fxMin(j) < l) l = fxMin(j); if (fxMax(j) > r) r = fxMax(j)
        if (fyMin(j) < t) t = fyMin(j); if (fyMax(j) > b) b = fyMax(j)
        j += 1
      }
      val size = (r - l + b - t) / 2 * 1.1
      val radius = ((scale * size) / 2.0).toLong
      val xc = ((r + l) / 2.0).toLong
      val yc = ((b + t) / 2.0).toLong
      out(i) = InternalRow(xc - radius, yc - radius, xc + radius, yc + radius)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): SlidingBoxes =
    copy(child = newChild)
}

/** EmocaLikeBboxesNode.smooth_bboxes (`dpl/processor/nodes/bboxes.py:147-170`)
  * in one pass: savgol(25,3) on box centers (rint -> long), savgol(15,3)
  * on radii (ceil -> long), boxes rebuilt as center +- radius. Input/output
  * `array<struct<x1,y1,x2,y2: long>>` of square boxes. Null when the clip
  * has fewer frames than the savgol window (scipy raises; we route to the
  * permissive error channel).
  */
case class SmoothBoxes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val boxType = StructType(Seq(
    StructField("x1", LongType), StructField("y1", LongType),
    StructField("x2", LongType), StructField("y2", LongType)))
  override def dataType: DataType = ArrayType(boxType, containsNull = false)
  override def prettyName: String = "smooth_boxes"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
      if fields.length == 4 && fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"smooth_boxes needs array<struct<x1,y1,x2,y2: long>>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 25) return null // centers window (25) is the binding constraint
    val xcs = new Array[Double](n); val ycs = new Array[Double](n)
    val radii = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 4)
      val rad = (r.getLong(2) - r.getLong(0)).toDouble / 2
      radii(i) = rad
      xcs(i) = r.getLong(0) + rad
      ycs(i) = r.getLong(1) + rad
      i += 1
    }
    val sx = SavGol(xcs, 25, 3)
    val sy = SavGol(ycs, 25, 3)
    val sr = SavGol(radii, 15, 3)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val xc = math.rint(sx(i)).toLong
      val yc = math.rint(sy(i)).toLong
      val rad = math.ceil(sr(i)).toLong
      out(i) = InternalRow(xc - rad, yc - rad, xc + rad, yc + rad)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): SmoothBoxes =
    copy(child = newChild)
}

/** Polynomial rolling hash over a string's UTF-16 code units:
  * h = (h * base + code) mod modulus — a deterministic document
  * fingerprint cheap enough for the 100 TB text path. Both `base` and
  * `modulus` small enough that the accumulator stays within Long.
  */
case class RollingHash(child: Expression, base: Long, modulus: Long)
    extends UnaryExpression {
  require(modulus > 0 && base > 0 && modulus < (Long.MaxValue / (base + 1)),
    "base*modulus must fit in Long")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * base + s.charAt(i).toLong) % modulus
      i += 1
    }
    h
  }
  // Real codegen: the per-document fingerprint stays inside whole-stage
  // codegen instead of falling back to interpreted evaluation per row.
  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |final java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * ${base}L + (long) $s.charAt($i)) % ${modulus}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** `array_chunks(arr, k)`: split an array<long> into consecutive slices of
  * length k (last chunk may be shorter). One pass, and — unlike
  * `transform(sequence(...), b -> slice(sig, ...))` — the child is
  * evaluated exactly once, so CollapseProject cannot re-inline an
  * expensive child (e.g. a minhash signature) once per chunk.
  */
case class ArrayChunksLong(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0, "chunk size must be positive")
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "array_chunks"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"array_chunks needs array<long>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any]((n + k - 1) / k)
    var c = 0
    var i = 0
    while (i < n) {
      val len = math.min(k, n - i)
      val chunk = new Array[Long](len)
      var j = 0
      while (j < len) { chunk(j) = arr.getLong(i + j); j += 1 }
      out(c) = new GenericArrayData(chunk)
      c += 1; i += len
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): ArrayChunksLong =
    copy(child = newChild)
}

/** Z-order (Morton) interleaving of N long key columns into one sortable
  * long: bit `i` of column `c` lands at output bit `i * N + c`. Sorting
  * or range-partitioning by the z-key before a columnar write co-locates
  * rows that are close in EVERY key dimension, so per-file min/max
  * statistics prune scans on any of the interleaved columns — the
  * multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE
  * ZORDER) as a plain deterministic expression. Inputs are taken modulo
  * 2^bitsPer by masking; null in -> null out. */
case class ZOrderKey(children: Seq[Expression], bitsPer: Int)
    extends Expression with CodegenFallback {
  require(children.nonEmpty, "zorder_key needs at least one column")
  require(bitsPer >= 1 && bitsPer * children.size <= 63,
    s"zorder_key bits out of range: $bitsPer x ${children.size} columns")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key needs long columns, got ${children.map(_.dataType).mkString(", ")}")

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var out = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < bitsPer) {
        out |= ((x >>> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey = copy(children = newChildren)
}

/** Hilbert-curve key of two long columns, `bits` bits each — the
  * stronger locality cousin of [[ZOrderKey]]: consecutive key values are
  * ALWAYS adjacent cells (Manhattan distance 1), where Morton order
  * takes long diagonal jumps at quadrant boundaries, so range scans over
  * a Hilbert-sorted layout touch tighter bounding boxes and per-file
  * min/max statistics prune better on both dimensions (the
  * Delta/Iceberg OPTIMIZE ZORDER literature's recommended refinement).
  *
  * Standard quadrant-fold construction: per level s (high bit first),
  * the quadrant index (3·rx)⊕ry contributes s² cells, then the
  * coordinate frame is reflected/swapped so the child quadrant's curve
  * orientation lines up. Reflection uses n−1−v (full side) so
  * coordinates stay non-negative; bits above the current level are
  * never read again, so this equals the per-quadrant fold. Inputs are
  * masked to `bits`; null in -> null out. Bijective onto [0, 4^bits) —
  * HilbertSpec proves bijection + unit-step adjacency exhaustively. */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 31, s"hilbert_key bits out of range: $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key needs long columns, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(xv: Any, yv: Any): Any = {
    val n = 1L << bits
    var x = xv.asInstanceOf[Long] & (n - 1L)
    var y = yv.asInstanceOf[Long] & (n - 1L)
    var d = 0L
    var s = n >> 1
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1L - x; y = n - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertKey = copy(left = l, right = r)
}
/** Discrete symmetric Hausdorff distance between two integer
  * trajectories under the L1 metric on (position, value) points:
  *
  *   h(A→B) = max_i min_j ( posWeight·|i−j| + |a_i − b_j| )
  *   HD     = max( h(A→B), h(B→A) )
  *
  * — the classic "how far apart can these two traces get" similarity
  * for per-entity time series (REPOSE/trajectory-search family), exact
  * in long arithmetic so cross-engine parity is free. O(n·m) per pair
  * with an early-exit inner scan (the running min can stop once the
  * positional term alone exceeds it, because |i−j| grows monotonically
  * away from j = i); pair generation is the caller's job — block or
  * bound the candidate set, never all-pairs at scale. Null in -> null
  * out; an empty side -> null (no defined distance). */
case class HausdorffL1(left: Expression, right: Expression, posWeight: Long)
    extends BinaryExpression with CodegenFallback {
  require(posWeight >= 0, s"posWeight must be >= 0, got $posWeight")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hausdorff_l1"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hausdorff_l1 needs two array<long>, got $l, $r")
    }

  private def directed(a: Array[Long], b: Array[Long]): Long = {
    var worst = 0L
    var i = 0
    while (i < a.length) {
      // scan outward from j = i: once posWeight*|i-j| alone reaches the
      // running min, no farther j can improve it
      var best = Long.MaxValue
      var d = 0
      var continueScan = true
      while (continueScan) {
        val posTerm = posWeight * d
        if (posTerm >= best) continueScan = false
        else {
          var seen = false
          val jl = i - d
          val jr = i + d
          if (jl >= 0 && jl < b.length) {
            seen = true
            val c = posTerm + math.abs(a(i) - b(jl))
            if (c < best) best = c
          }
          if (d > 0 && jr >= 0 && jr < b.length) {
            seen = true
            val c = posTerm + math.abs(a(i) - b(jr))
            if (c < best) best = c
          }
          if (!seen && (jl < 0 && jr >= b.length)) continueScan = false
          d += 1
        }
      }
      if (best > worst) worst = best
      i += 1
    }
    worst
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val ld = l.asInstanceOf[ArrayData]
    val rd = r.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ld) || ArrayNulls.anyNull(rd)) return null
    val la = ld.toLongArray()
    val ra = rd.toLongArray()
    if (la.isEmpty || ra.isEmpty) null
    else math.max(directed(la, ra), directed(ra, la))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HausdorffL1 =
    copy(left = l, right = r)
}

/** Integer EWMA over one entity's ordered long series with rational
  * smoothing factor alpha = 1/2^shift:
  *
  *   s_0 = x_0;   s_i = s_{i-1} + floor((x_i − s_{i-1}) / 2^shift)
  *
  * — the trailing baseline an anomaly/drift monitor keeps per key,
  * EXACT and engine-replayable because the floor of a power-of-two
  * division is plain integer arithmetic (an IEEE 0.97·s + 0.03·x
  * recurrence drifts in the last ulp across engines and is
  * order-hostile). Floor (arithmetic shift), NOT truncation, so
  * negative deviations round the same way positive ones do — the
  * DuckDB replay spells it `(d − ((d % m + m) % m)) // m`, which this
  * `>>` equals for all signs. One O(n) pass per entity; returns the
  * full smoothed series (same length), null input stays null. */
case class EwmaShiftLongs(child: Expression, shift: Int)
    extends UnaryExpression with CodegenFallback {
  require(shift >= 0 && shift <= 62, s"ewma_shift needs shift in [0, 62], got $shift")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ewma_shift"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ewma_shift needs array<long>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(arr)) return null
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    var s = 0L
    while (i < n) {
      val x = arr.getLong(i)
      s = if (i == 0) x else s + ((x - s) >> shift)
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): EwmaShiftLongs =
    copy(child = newChild)
}

/** `inversion_count(xs)` — number of strict inversions in a long
  * sequence: pairs i < j with xs(i) > xs(j). This is the Kendall-tau
  * disorder numerator (how far an observed ordering is from sorted —
  * quality scores drifting against crawl time, rank churn between two
  * index builds). Counted by an iterative bottom-up MERGE SORT over one
  * scratch buffer — O(n log n), exact long (n ≤ 2^32 keeps the count
  * below n²/2 < 2^63), zero allocation beyond the two buffers. The
  * caller orders the array by its sort key FIRST (sort_array over a
  * (key, value) struct); ties in the key must be pre-ordered ascending
  * by value so equal-key pairs can never count as inversions.
  * Null/empty arrays yield null. */
case class InversionCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "inversion_count"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"inversion_count needs array<long>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ad)) return null
    val arr = ad.toLongArray()
    val n = arr.length
    if (n == 0) null
    else {
      var src = arr
      var dst = new Array[Long](n)
      var inv = 0L
      var width = 1
      while (width < n) {
        var lo = 0
        while (lo < n) {
          val mid = math.min(lo + width, n)
          val hi = math.min(lo + 2 * width, n)
          var i = lo; var j = mid; var k = lo
          while (i < mid && j < hi) {
            // stable: on ties take from the left run — not an inversion
            if (src(i) <= src(j)) { dst(k) = src(i); i += 1 }
            else { dst(k) = src(j); inv += (mid - i); j += 1 }
            k += 1
          }
          while (i < mid) { dst(k) = src(i); i += 1; k += 1 }
          while (j < hi) { dst(k) = src(j); j += 1; k += 1 }
          lo = hi
        }
        val t = src; src = dst; dst = t
        width *= 2
      }
      inv
    }
  }
  override protected def withNewChildInternal(newChild: Expression): InversionCount =
    copy(child = newChild)
}

/** `lis_pairs(xs)` — length of the longest chain of index pairs that is
  * STRICTLY increasing in both coordinates. Each element packs one
  * (a, b) pair as a·2³² + b with both indices in [0, 2³¹) (caller
  * contract — frame/keyframe indexes), and the array arrives sorted
  * ascending (= lexicographic by (a, b), sort_array upstream).
  *
  * This is the order-consistency vote of the video near-dup family: an
  * unordered keyframe-match count merges two clips that merely share k
  * packaging frames (intro card + outro + slate — common broadcast
  * wrapping), while a real near-dup's matches occur in the SAME
  * temporal order in both clips. The longest such chain is the honest
  * vote. O(n²) DP over one long array — matched-pair lists are bounded
  * by the two clips' keyframe counts (~one per shot), so n is tiny by
  * construction. Null/empty input and null elements yield null. */
case class LisPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lis_pairs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lis_pairs needs array<long>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ad)) return null
    val xs = ad.toLongArray()
    val n = xs.length
    if (n == 0) return null
    val as = new Array[Long](n)
    val bs = new Array[Long](n)
    var i = 0
    while (i < n) {
      as(i) = xs(i) >>> 32
      bs(i) = xs(i) & 0xffffffffL
      i += 1
    }
    val len = new Array[Long](n)
    var best = 0L
    i = 0
    while (i < n) {
      var li = 1L
      var j = 0
      while (j < i) {
        // ascending input: a(j) <= a(i) always; strict-both needed
        if (as(j) < as(i) && bs(j) < bs(i) && len(j) + 1L > li)
          li = len(j) + 1L
        j += 1
      }
      len(i) = li
      if (li > best) best = li
      i += 1
    }
    best
  }
  override protected def withNewChildInternal(newChild: Expression): LisPairs =
    copy(child = newChild)
}

/** `theil_sen_slope(xs, ys)` — the median of all pairwise slopes
  * (ys(j) − ys(i)) / (xs(j) − xs(i)) over index pairs i < j with
  * xs(j) > xs(i), where both arrays arrive SORTED ascending by (x, y)
  * (sort_array over the zipped structs upstream — so j > i already
  * implies xs(j) ≥ xs(i) and only the strict check remains).
  *
  * The Theil–Sen robust trend kernel: each slope is ONE IEEE division
  * of exact long differences, the multiset is sorted, and the median
  * is the middle element (odd m) or the mean of the two central
  * elements (even m) — a fixed float shape a literal O(n²) pair join
  * can replay bit-for-bit in any engine. O(n²) time AND memory, so the
  * caller bounds n (the Stats.theilSen CHECKED contract). Returns null
  * for empty/null input, null elements, mismatched lengths, or zero
  * x-variance (no slope exists). */
case class TheilSenSlope(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "theil_sen_slope"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theil_sen_slope needs two array<long>, got $l, $r")
    }
  override def nullSafeEval(xsAny: Any, ysAny: Any): Any = {
    val xd = xsAny.asInstanceOf[ArrayData]
    val yd = ysAny.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(xd) || ArrayNulls.anyNull(yd)) return null
    val xs = xd.toLongArray()
    val ys = yd.toLongArray()
    val n = xs.length
    if (n == 0 || ys.length != n) return null
    // m = C(n,2) minus x-tied pairs; counted as a Long (C(n,2)
    // overflows Int past n ~ 65k) and CHECKED against the array
    // limit before allocation — a caller raising the theilSen row
    // bound past the kernel's real capacity fails loudly here
    // instead of tripping a NegativeArraySizeException
    var m = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (xs(j) > xs(i)) m += 1L
        j += 1
      }
      i += 1
    }
    if (m == 0L) return null
    require(m <= Int.MaxValue,
      s"theil_sen_slope: $m slope pairs exceed the kernel's array " +
        "capacity (Int.MaxValue) — lower maxRowsPerKey below ~65000")
    val slopes = new Array[Double](m.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (xs(j) > xs(i)) {
          slopes(k) = (ys(j) - ys(i)).toDouble / (xs(j) - xs(i)).toDouble
          k += 1
        }
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(slopes)
    val mi = m.toInt
    if (mi % 2 == 1) slopes(mi / 2)
    else (slopes(mi / 2 - 1) + slopes(mi / 2)) / 2.0
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TheilSenSlope =
    copy(left = newLeft, right = newRight)
}

/** `cusum_longs(xs, ref, h)` — one-sided upper CUSUM over an ordered
  * long series, EXACT integer arithmetic end to end:
  *
  *   S_t = max(0, S'_{t-1} + x_t − ref),   S'_{t-1} = 0 if the
  *   previous step ALARMED (S_{t-1} ≥ h — restart the accumulator so
  *   repeated shifts each fire once), else S_{t-1}
  *
  * The sequential changepoint detector (Page 1954): drift above the
  * reference accumulates until the evidence crosses h, a point anomaly
  * barely moves S, and the integer recurrence is order-stable and
  * engine-replayable by a recursive CTE (the `ewma_shift` discipline —
  * no IEEE state survives across steps). Returns the full S series;
  * alarms are the positions with S_t ≥ h. Null/empty input or null
  * elements yield null. */
case class CusumLongs(child: Expression, ref: Long, h: Long)
    extends UnaryExpression with CodegenFallback {
  require(h > 0, s"cusum_longs needs h > 0, got $h")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cusum_longs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cusum_longs needs array<long>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ad)) return null
    val xs = ad.toLongArray()
    val n = xs.length
    if (n == 0) return null
    val out = new Array[Long](n)
    var s = 0L
    var i = 0
    while (i < n) {
      s = math.max(0L, s + xs(i) - ref)
      out(i) = s
      if (s >= h) s = 0L
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): CusumLongs =
    copy(child = newChild)
}

/** `prefix_prod(xs)` — running product of a double sequence:
  * out(i) = xs(0)·xs(1)·…·xs(i), folded STRICTLY left-to-right so the
  * IEEE result is a pure function of the element order (a tree-shaped
  * or reassociated product moves low bits; the sequential fold is
  * what a SQL `list_reduce` over the same list replays bit-exactly).
  * This is the Kaplan–Meier survival accumulator — the caller hands
  * in the ordered per-step factors (n−d)/n and reads back the curve.
  * O(n), zero allocation beyond the output. Null input, null
  * elements, or any non-finite element (NaN/Inf would poison every
  * later prefix) yield null. */
case class PrefixProd(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "prefix_prod"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"prefix_prod needs array<double>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ad)) return null
    val n = ad.numElements()
    val out = new Array[Double](n)
    var p = 1.0
    var i = 0
    while (i < n) {
      val x = ad.getDouble(i)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
        return null
      p = p * x
      out(i) = p
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PrefixProd =
    copy(child = newChild)
}

/** `unigram_viterbi(len, encs, ps)` — the max-probability (Viterbi)
  * segmentation of a word of `len` characters under a unigram piece
  * model: candidate pieces arrive as two PARALLEL arrays (`encs(k)` =
  * start·100 + length with 1-based start — the lis_pairs packing
  * discipline, word length ≤ 99 by the trainer's CHECKED cap — and
  * `ps(k)` = the piece's smoothed probability), and the result is the
  * chosen pieces' encodings in left-to-right order.
  *
  * Exactness contract: the DP is a fixed IEEE shape — best(0) = 1.0,
  * best(e) = max over candidates (s, l) with s+l−1 = e of
  * best(s−1)·p — every product is ONE correctly-rounded double
  * multiplication accumulated in strictly increasing end-position
  * order, so an engine replaying the same recurrence (DuckDB's
  * recursive CTE in the q233 oracle) reproduces every best(e)
  * BIT-FOR-BIT, no logs and no exp anywhere. Ties (bit-equal
  * products) break to the SMALLEST start (longest final piece) — an
  * order-independent argmax, so candidate array order never matters.
  * Probabilities must be strictly positive (the trainer's +1
  * smoothing guarantees it); an uncoverable position throws loudly
  * (the trainer always retains every single character, so a gap means
  * the caller broke that contract — failing beats silently dropping
  * the word from the counts). Null/empty input yields null. */
case class UnigramViterbi(first: Expression, second: Expression,
                          third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_viterbi"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType | LongType, ArrayType(LongType, _),
          ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi needs (int, array<long>, array<double>), " +
          s"got $a, $b, $c")
    }
  override def nullSafeEval(lenAny: Any, encAny: Any, pAny: Any): Any = {
    val n = lenAny match {
      case i: Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
      case i: Int => i
      case l: Long => l.toInt
    }
    val encAd = encAny.asInstanceOf[ArrayData]
    val pAd = pAny.asInstanceOf[ArrayData]
    if (n <= 0 || ArrayNulls.anyNull(encAd) || ArrayNulls.anyNull(pAd))
      return null
    val m = encAd.numElements()
    if (m == 0 || pAd.numElements() != m) return null
    val encs = encAd.toLongArray()
    val ps = pAd.toDoubleArray()
    val best = new Array[Double](n + 1)
    val choice = new Array[Long](n + 1)
    java.util.Arrays.fill(best, -1.0)
    best(0) = 1.0
    var e = 1
    while (e <= n) {
      var bv = -1.0
      var bs = Int.MaxValue
      var benc = -1L
      var k = 0
      while (k < m) {
        val s = (encs(k) / 100L).toInt
        val l = (encs(k) % 100L).toInt
        if (s >= 1 && l >= 1 && s + l - 1 == e && best(s - 1) >= 0.0) {
          val v = best(s - 1) * ps(k)
          if (v > bv || (v == bv && s < bs)) {
            bv = v; bs = s; benc = encs(k)
          }
        }
        k += 1
      }
      if (benc < 0L)
        throw new IllegalStateException(
          s"unigram_viterbi: no candidate piece covers position $e — " +
            "the vocabulary must retain every single character " +
            "(trainer contract)")
      best(e) = bv
      choice(e) = benc
      e += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = n
    while (pos > 0) {
      val enc = choice(pos)
      out.prepend(enc)
      pos = (enc / 100L).toInt - 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): UnigramViterbi =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Pool-adjacent-violators (PAVA) over a SORTED per-score histogram —
  * the isotonic-regression kernel behind calibration
  * (Zadrozny–Elkan 2002; the monotone companion to the reliability
  * table): input is array<struct<score long, w long, y long>> sorted
  * ascending by score (w = rows at the score, y = positives), output
  * is the unique non-decreasing-rate pooling as
  * array<struct<score_min, score_max, w, y>>.
  *
  * Adjacent pools violate when rate(prev) > rate(cur), compared as the
  * exact integer cross product y_prev·w_cur > y_cur·w_prev (no
  * division ever happens — with per-key rows ≤ 2·10⁹ the products stay
  * inside int64, the caller's CHECKED contract). The squared-error
  * isotonic fit is UNIQUE, so any correct merge order yields these
  * exact blocks — the DuckDB oracle replays it with a leftmost-merge
  * recursive CTE and must agree bit-for-bit. O(n) stack pass. Null
  * for empty/null input or a non-positive weight. */
case class PavaPools(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val outField = StructType(Seq(
    StructField("score_min", LongType, nullable = false),
    StructField("score_max", LongType, nullable = false),
    StructField("w", LongType, nullable = false),
    StructField("y", LongType, nullable = false)))
  override def dataType: DataType =
    ArrayType(outField, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pava_pools"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
      if fs.length == 3 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pava_pools needs array<struct<long,long,long>>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (n == 0) return null
    val smin = new Array[Long](n)
    val smax = new Array[Long](n)
    val ws = new Array[Long](n)
    val ys = new Array[Long](n)
    var top = -1
    var i = 0
    while (i < n) {
      val r = ad.getStruct(i, 3)
      if (r == null) return null
      val cs = r.getLong(0)
      var cw = r.getLong(1)
      var cy = r.getLong(2)
      if (cw <= 0L) return null
      var csMin = cs
      while (top >= 0 && ys(top) * cw > cy * ws(top)) {
        cy += ys(top); cw += ws(top); csMin = smin(top); top -= 1
      }
      top += 1
      smin(top) = csMin; smax(top) = cs; ws(top) = cw; ys(top) = cy
      i += 1
    }
    val out = new Array[Any](top + 1)
    var j = 0
    while (j <= top) {
      out(j) = InternalRow(smin(j), smax(j), ws(j), ys(j))
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PavaPools =
    copy(child = newChild)
}

/** Integer Holt double-exponential smoothing (level + trend) over an
  * ordered long series, with power-of-two gains α = 2^-aShift,
  * β = 2^-gShift — the trend-aware sibling of [[EwmaShiftLongs]]
  * (Holt 1957): per step the one-step-ahead forecast is
  * pred = l + b, then
  *
  *   l' = pred + ⌊(x − pred) / 2^aShift⌋
  *   b' = b + ⌊(l' − l − b) / 2^gShift⌋
  *
  * — EXACT floor arithmetic end to end (Math.floorDiv; the SQL replay
  * is the q162 positive-mod trick), state (x₀, 0) at the first
  * element, so the full (pred, level, trend) series is a pure integer
  * function of the input and any engine replays it bit-for-bit.
  * Output: array<struct<pred, level, trend>> aligned with the input.
  * Null for null/empty input or null elements. The floor updates are
  * contractions of the forecast residual, so |level| and |trend| stay
  * within a small multiple of max|x| — the caller bounds the value
  * scale (the Stats.holtSmooth CHECKED contract). */
case class HoltShiftLongs(child: Expression, aShift: Int, gShift: Int)
    extends UnaryExpression with CodegenFallback {
  require(aShift >= 0 && aShift <= 62 && gShift >= 0 && gShift <= 62,
    s"holt_shift: shifts must be in [0, 62], got ($aShift, $gShift)")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pred", LongType, nullable = false),
    StructField("level", LongType, nullable = false),
    StructField("trend", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "holt_shift"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"holt_shift needs array<long>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ad)) return null
    val xs = ad.toLongArray()
    val n = xs.length
    if (n == 0) return null
    val out = new Array[Any](n)
    var l = xs(0)
    var b = 0L
    out(0) = InternalRow(xs(0), l, b)
    var i = 1
    while (i < n) {
      val pred = l + b
      val lNew = pred + Math.floorDiv(xs(i) - pred, 1L << aShift)
      val bNew = b + Math.floorDiv(lNew - l - b, 1L << gShift)
      out(i) = InternalRow(pred, lNew, bNew)
      l = lNew; b = bNew
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): HoltShiftLongs =
    copy(child = newChild)
}

/** Running left-to-right sum of a double sequence — the Nelson–Aalen
  * cumulative-hazard accumulator (the additive sibling of
  * [[PrefixProd]]): out(i) = ((0 + x₀) + x₁) + … + xᵢ in exactly that
  * IEEE order, so any engine replaying the same sequential fold (e.g.
  * DuckDB `list_reduce` over each prefix) reproduces every partial sum
  * bit-for-bit. Null for null input, null elements, or non-finite
  * elements. */
case class PrefixSum(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "prefix_sum"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"prefix_sum needs array<double>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ad)) return null
    val n = ad.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = ad.getDouble(i)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
        return null
      s = s + x
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PrefixSum =
    copy(child = newChild)
}

/** Truncated RANK-BIASED OVERLAP (Webber 2010, p = 0.9) between two
  * rankings given as item-id arrays in rank order —
  * RBO@D = (1−p) · Σ_{d=1..D} p^{d−1} · X_d / d with
  * X_d = |A[1..d] ∩ B[1..d]| and D = min(|A|, |B|): the top-weighted
  * "did my ranking change?" number search serving needs (plain set
  * overlap ignores rank; Kendall needs conjoint lists).
  *
  * Engine-exactness: p = 9/10 makes every weight RATIONAL — each term
  * is (9^{d−1}·X_d) / (10^{d−1}·d), two EXACT int64 products and one
  * IEEE division, summed left-to-right and scaled by the 0.1 literal;
  * any engine replaying that fold (DuckDB list_transform +
  * list_reduce over exact integer powers) agrees bit-for-bit. D is
  * capped at 19 (10¹⁹ would pass int64 — truncate rankings to ≤ 19
  * upstream; top-10 is the common serving cut). X_d runs the O(D)
  * incremental two-set walk. Null for null inputs/elements; items
  * must be distinct within each ranking (rankings are). */
case class RboOverlap(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rbo_overlap"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rbo_overlap needs two array<long>, got $t")
    }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val rb = r.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(la) || ArrayNulls.anyNull(rb)) return null
    val as = la.toLongArray()
    val bs = rb.toLongArray()
    val dMax = math.min(as.length, bs.length)
    if (dMax == 0) return null
    if (dMax > 19)
      throw new IllegalArgumentException(
        "rbo_overlap: rankings deeper than 19 exceed the exact 10^d " +
          "int64 weight contract — truncate to the serving cut first")
    val seenA = new java.util.HashSet[Long]()
    val seenB = new java.util.HashSet[Long]()
    var common = 0L
    var p9 = 1L
    var p10 = 1L
    var sum = 0.0
    var d = 0
    while (d < dMax) {
      val ad = as(d); val bd = bs(d)
      if (ad == bd) common += 1L
      else {
        if (seenB.contains(ad)) common += 1L
        if (seenA.contains(bd)) common += 1L
      }
      seenA.add(ad); seenB.add(bd)
      sum += (p9 * common).toDouble / (p10 * (d + 1L)).toDouble
      p9 *= 9L; p10 *= 10L
      d += 1
    }
    sum * 0.1
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RboOverlap =
    copy(left = newLeft, right = newRight)
}

/** LEAD–LAG CROSS-CORRELATION between two aligned long series — for
  * every index lag k ∈ [−maxLag, maxLag], the Pearson correlation of
  * the overlapped pairs (x_i, y_{i+k}): "does metric X lead metric Y,
  * and by how many steps?" (signups → purchases, ingest → index lag).
  * Inputs arrive t-sorted and index-aligned (dense series — grid-fill
  * gaps upstream).
  *
  * Exactness: all six sufficient statistics per lag accumulate in
  * BigInt (2·maxLag+1 lags per key, O(n·L) total — cheap and
  * overflow-free at ANY magnitude), and each correlation is the fixed
  * IEEE shape num / (√d1 · √d2) over exact integers — the same three
  * casts and two sqrts an engine replaying HUGEINT sums produces.
  * Zero variance on either side → NaN for that lag. Output:
  * array<struct<lag, n, r>> in lag order; null for null/empty inputs,
  * null elements, or length mismatch. */
case class LeadLagCorr(left: Expression, right: Expression, maxLag: Int)
    extends BinaryExpression with CodegenFallback {
  require(maxLag >= 1 && maxLag <= 64,
    s"lead_lag_corr: maxLag must be in [1, 64], got $maxLag")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lag", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("r", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lead_lag_corr"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"lead_lag_corr needs two array<long>, got $t")
    }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(la) || ArrayNulls.anyNull(ra)) return null
    val xs = la.toLongArray()
    val ys = ra.toLongArray()
    val n = xs.length
    if (n == 0 || ys.length != n) return null
    val out = new Array[Any](2 * maxLag + 1)
    var idx = 0
    var lag = -maxLag
    while (lag <= maxLag) {
      val lo = math.max(0, -lag)
      val hi = math.min(n, n - lag)
      var sx = BigInt(0); var sy = BigInt(0); var sxy = BigInt(0)
      var sxx = BigInt(0); var syy = BigInt(0)
      var m = 0L
      var i = lo
      while (i < hi) {
        val x = BigInt(xs(i)); val y = BigInt(ys(i + lag))
        sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
        m += 1L
        i += 1
      }
      val rv =
        if (m < 2L) Double.NaN
        else {
          val num = BigInt(m) * sxy - sx * sy
          val d1 = BigInt(m) * sxx - sx * sx
          val d2 = BigInt(m) * syy - sy * sy
          if (d1.signum == 0 || d2.signum == 0) Double.NaN
          else num.toDouble /
            (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))
        }
      out(idx) = InternalRow(lag.toLong, m, rv)
      idx += 1
      lag += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LeadLagCorr =
    copy(left = newLeft, right = newRight)
}

/** Greedy MAXIMAL MARGINAL RELEVANCE selection (Carbonell–Goldstein
  * 1998) over one query's candidate list: pick `m` of the candidates
  * maximizing λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — the
  * diversity-aware re-rank that keeps a near-duplicate-heavy top-k
  * from filling an eval set with one document. Input: an
  * `array<struct<rel: long, vec: array<double>>>` (rel in micro
  * units, rank order); output `array<struct<pick: int, mmr: long>>` —
  * 0-based input indices in pick order with their micro²-unit scores.
  *
  * Exactness: pair cosines use the SAME sequential fold shape as the
  * q22/q23 oracles (acc from 0, ascending index; dot / (√n_a·√n_b)),
  * rounded HALF_UP to micro once per pair; scores are then pure int64
  * (λ ≤ 10⁶, rel/sim ≤ 10⁶ → |score| ≤ 10¹²). Ties pick the lowest
  * index (the oracle's first-position-of-max). Pair sims memoize in a
  * k×k table — the loop is O(m·k) probes over O(k²) cosines, all
  * inside one expression eval per query row; the zero-norm corner
  * defines sim = 0 instead of NaN. */
case class MmrSelect(child: Expression, lambdaMicro: Long, m: Int)
    extends UnaryExpression with CodegenFallback {
  require(m >= 1 && m <= 4096, s"MmrSelect: m out of range: $m")
  require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
    s"MmrSelect: lambdaMicro must be in [0, 1e6]: $lambdaMicro")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pick", IntegerType, nullable = false),
    StructField("mmr", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mmr_select"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
      if a.dataType == LongType &&
        b.dataType.isInstanceOf[ArrayType] &&
        b.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mmr_select needs array<struct<long, array<double>>>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // the memo table is n², and scores assume micro-unit magnitudes:
    // guard both so a mis-wired caller fails loudly instead of
    // overflowing an Int index or silently reordering picks
    require(n <= 4096,
      s"mmr_select: $n candidates exceed the bounded-pack contract " +
        "(<= 4096) — pre-select with a top-k first")
    val rels = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      rels(i) = row.getLong(0)
      require(math.abs(rels(i)) <= 1000000000L,
        s"mmr_select: |rel| = ${math.abs(rels(i))} exceeds the " +
          "micro-unit contract (<= 1e9) — quantize relevance to micro " +
          "units first")
      vecs(i) = row.getArray(1).toDoubleArray()
      i += 1
    }
    val norms = vecs.map { v =>
      var acc = 0.0; var j = 0
      while (j < v.length) { acc += v(j) * v(j); j += 1 }
      math.sqrt(acc)
    }
    val simTab = Array.fill(n * n)(Long.MinValue)
    def sim(a: Int, b: Int): Long = {
      val key = a * n + b
      if (simTab(key) != Long.MinValue) simTab(key)
      else {
        val s = if (norms(a) == 0.0 || norms(b) == 0.0) 0L
        else {
          var acc = 0.0; var j = 0
          val (va, vb) = (vecs(a), vecs(b))
          while (j < va.length) { acc += va(j) * vb(j); j += 1 }
          BigDecimal(acc / (norms(a) * norms(b)) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
        simTab(key) = s; simTab(b * n + a) = s; s
      }
    }
    val taken = new Array[Boolean](n)
    val selected = new Array[Int](math.min(m, n))
    val out = new Array[Any](math.min(m, n))
    var t = 0
    while (t < selected.length) {
      var bestIdx = -1
      var bestScore = Long.MinValue
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          var maxSim = 0L
          var s = 0
          var first = true
          while (s < t) {
            val v = sim(c, selected(s))
            if (first || v > maxSim) { maxSim = v; first = false }
            s += 1
          }
          val score = lambdaMicro * rels(c) -
            (1000000L - lambdaMicro) * maxSim
          if (score > bestScore) { bestScore = score; bestIdx = c }
        }
        c += 1
      }
      taken(bestIdx) = true
      selected(t) = bestIdx
      out(t) = InternalRow(bestIdx, bestScore)
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(
      newChild: Expression): MmrSelect = copy(child = newChild)
}
