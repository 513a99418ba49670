package graft.functions

/** Savitzky–Golay filter coefficients, replicating
  * `scipy.signal.savgol_filter(x, window, polyorder)` with the default
  * `mode="interp"` boundary handling (reference usage:
  * `dpl/processor/nodes/bboxes.py:159-162`, `dpl/processor/nodes/emoca.py:91-94`).
  *
  * The whole filter is linear, so it is fully described by:
  *  - `center`: the FIR kernel applied at interior positions
  *    (`y[i] = dot(center, x[i-h .. i+h])`, `h = window/2`),
  *  - `head`: an `h x window` matrix applied to the first `window` samples to
  *    produce the first `h` outputs (scipy fits a degree-`polyorder`
  *    polynomial to the first `window` samples and evaluates it at
  *    positions `0..h-1`),
  *  - `tail`: same for the last `h` outputs over the last `window` samples.
  *
  * Coefficients depend only on (window, polyorder) and are computed once at
  * plan time; execution is pure dot products.
  */
object SavGol {

  final case class Coeffs(window: Int, polyorder: Int,
                          center: Array[Double],
                          head: Array[Array[Double]],
                          tail: Array[Array[Double]])

  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Coeffs]()

  def coeffs(window: Int, polyorder: Int): Coeffs =
    cache.computeIfAbsent((window, polyorder), { _ =>
      require(window > polyorder, s"window ($window) must exceed polyorder ($polyorder)")
      require(window % 2 == 1, s"window ($window) must be odd")
      val h = window / 2
      // Interior kernel: evaluate the LSQ polynomial fit at the window center.
      // center(j) = row 0 of (V^T V)^{-1} V^T with V_{j,k} = (j - h)^k.
      val xsC = Array.tabulate(window)(j => (j - h).toDouble)
      val center = fitRow(xsC, polyorder, 0.0)
      // Boundary: fit over positions 0..window-1, evaluate at 0..h-1 (head)
      // and window-h..window-1 (tail).
      val xsB = Array.tabulate(window)(_.toDouble)
      val head = Array.tabulate(h)(i => fitRow(xsB, polyorder, i.toDouble))
      val tail = Array.tabulate(h)(i => fitRow(xsB, polyorder, (window - h + i).toDouble))
      Coeffs(window, polyorder, center, head, tail)
    })

  /** Row of the LSQ-projection-and-evaluate matrix: returns `r` such that
    * `P_fit(at) = dot(r, y)` where `P_fit` is the degree-`p` polynomial
    * least-squares fit of `(xs, y)`.
    */
  private def fitRow(xs: Array[Double], p: Int, at: Double): Array[Double] = {
    val m = p + 1
    val n = xs.length
    // Normal equations: G = V^T V (m x m), where V_{j,k} = xs(j)^k.
    val v = Array.tabulate(n, m)((j, k) => math.pow(xs(j), k))
    val g = Array.tabulate(m, m)((a, b) => (0 until n).map(j => v(j)(a) * v(j)(b)).sum)
    // Solve G * W = V^T  (W is m x n); coefficient row = [at^0..at^p] * W.
    val w = Array.tabulate(m, n)((a, j) => v(j)(a))
    solveInPlace(g, w)
    val atPow = Array.tabulate(m)(k => math.pow(at, k))
    Array.tabulate(n)(j => (0 until m).map(k => atPow(k) * w(k)(j)).sum)
  }

  /** Gaussian elimination with partial pivoting; solves A X = B in place (X into B). */
  private def solveInPlace(a: Array[Array[Double]], b: Array[Array[Double]]): Unit = {
    val m = a.length
    val n = b(0).length
    for (col <- 0 until m) {
      var piv = col
      for (r <- col + 1 until m) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t
                        val u = b(piv); b(piv) = b(col); b(col) = u }
      val d = a(col)(col)
      for (c <- col until m) a(col)(c) /= d
      for (c <- 0 until n) b(col)(c) /= d
      for (r <- 0 until m if r != col) {
        val f = a(r)(col)
        if (f != 0.0) {
          for (c <- col until m) a(r)(c) -= f * a(col)(c)
          for (c <- 0 until n) b(r)(c) -= f * b(col)(c)
        }
      }
    }
  }

  /** Apply the filter to a series (used by the Catalyst expression and tests).
    * Requires `xs.length >= window` (same constraint scipy enforces for
    * mode="interp").
    */
  def apply(xs: Array[Double], window: Int, polyorder: Int): Array[Double] = {
    val c = coeffs(window, polyorder)
    val n = xs.length
    require(n >= window, s"series length $n < window $window (mode=interp)")
    val h = window / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < h) { out(i) = dot(c.head(i), xs, 0); i += 1 }
    while (i < n - h) { out(i) = dot(c.center, xs, i - h); i += 1 }
    while (i < n) { out(i) = dot(c.tail(i - (n - h)), xs, n - window); i += 1 }
    out
  }

  private def dot(k: Array[Double], xs: Array[Double], off: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < k.length) { s += k(j) * xs(off + j); j += 1 }
    s
  }
}
