package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM tests of the numeric kernels backing the custom Catalyst
  * expressions. Golden values generated with an independent numpy
  * implementation (least-squares savgol with scipy's mode="interp"
  * boundary semantics; interp1d-with-extrapolation resampling matching
  * the reference `dpl/wav2vec/utils.py:5-21`).
  */
class NumericSpec extends AnyFunSuite {

  private def assertClose(a: Array[Double], b: Array[Double], tol: Double = 1e-8): Unit = {
    assert(a.length == b.length, s"length ${a.length} != ${b.length}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) <= tol * math.max(1.0, math.abs(y)), s"at $i: $x vs $y")
    }
  }

  // --- Savitzky-Golay ---------------------------------------------------

  test("savgol(5,2) center kernel equals the classical [-3,12,17,12,-3]/35") {
    val c = SavGol.coeffs(5, 2).center
    assertClose(c, Array(-3.0, 12, 17, 12, -3).map(_ / 35))
  }

  test("savgol(7,2) center kernel equals [-2,3,6,7,6,3,-2]/21") {
    assertClose(SavGol.coeffs(7, 2).center, Array(-2.0, 3, 6, 7, 6, 3, -2).map(_ / 21))
  }

  test("savgol reproduces polynomials of degree <= polyorder exactly (incl. boundaries)") {
    val xs = Array.tabulate(40)(i => 2.0 - 0.3 * i + 0.07 * i * i - 0.001 * i * i * i)
    assertClose(SavGol(xs, 25, 3), xs, 1e-9)
    assertClose(SavGol(xs, 15, 3), xs, 1e-9)
    val quad = Array.tabulate(20)(i => 1.0 + 0.5 * i - 0.25 * i * i)
    assertClose(SavGol(quad, 5, 2), quad, 1e-9)
  }

  test("savgol matches numpy-derived golden values (5,2) and (7,3)") {
    val in30 = Array(7.63, 77.99, 43.84, 72.35, 97.8, 53.85, 50.11, 7.21, 26.84,
      49.99, 67.92, 80.37, 38.09, 6.59, 28.81, 90.96, 21.34, 45.21, 93.12, 2.49,
      60.05, 95.01, 23.03, 54.85, 90.91, 13.32, 52.34, 75.04, 66.9, 46.78)
    val g52 = Array(21.102000000000245, 44.39200000000003, 63.80200000000008,
      72.40314285714294, 82.7185714285715, 70.04828571428577, 34.590571428571494,
      20.984285714285768, 22.531142857142914, 49.26314285714292, 72.11914285714292,
      70.53342857142863, 40.024571428571484, 11.4525714285715, 42.345142857142896,
      56.934857142857176, 46.6008571428572, 53.19257142857149, 54.607714285714344,
      41.706000000000074, 52.640000000000065, 69.71742857142861, 49.62714285714294,
      56.421142857142925, 61.06857142857148, 44.4505714285715, 42.19057142857151,
      72.1788571428572, 69.67542857142824, 45.86914285714212)
    val g73 = Array(15.945476190473158, 50.254285714283974, 70.20928571428456,
      77.92047619047628, 73.96428571428581, 64.8442857142858, 40.30333333333342,
      23.44047619047628, 29.368095238095325, 47.8490476190477, 67.84714285714293,
      59.861428571428654, 37.93714285714295, 37.28571428571437, 34.00476190476198,
      39.55238095238103, 62.57285714285722, 52.66000000000008, 38.58428571428581,
      60.398571428571515, 54.937142857142945, 46.07190476190487, 70.55380952380962,
      55.6095238095239, 44.352380952381054, 55.35952380952391, 55.55761904761914,
      63.2135714285684, 64.04214285713928, 50.4133333333255)
    assertClose(SavGol(in30, 5, 2), g52, 1e-7)
    assertClose(SavGol(in30, 7, 3), g73, 1e-7)
  }

  // --- Linear resample --------------------------------------------------

  test("resample is identity when lengths match") {
    val y = Array(1.0, 2.0, 3.0)
    assertClose(LinearResample.resample(y, 3, 50.0), y, 0)
  }

  test("resample matches interp1d-with-extrapolation golden values") {
    val y = Array(1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0)
    val expected = Array(0.49650349650349646, 2.346853146853147, 3.8685314685314687,
      2.634965034965035, 3.7958041958041955, 7.496503496503497, 6.401398601398601,
      5.299300699300699, 6.532867132867134, 5.467132867132864, 3.0)
    assertClose(LinearResample.resample(y, 11, 50.0), expected, 1e-12)
    assertClose(LinearResample.resample(Array(3.0, 9.0), 5, 50.0),
      Array(1.7999999999999998, 3.6, 5.4, 7.200000000000001, 9.0), 1e-12)
  }

  test("resample preserves linear series (interior exactness)") {
    val y = Array.tabulate(20)(i => 3.0 + 0.5 * i)
    val out = LinearResample.resample(y, 20, 50.0)
    assertClose(out, y, 0) // identity path
    // downsample of a linear function stays on the line y(t) = 3 + 0.5*(t/dx - 1) … spot check monotone
    val down = LinearResample.resample(y, 10, 50.0)
    assert(down.sliding(2).forall(p => p(1) > p(0)))
  }

  // --- Edge moving average ---------------------------------------------

  test("edge moving average matches brute force with edge replication") {
    val xs = Array(5.0, 1.0, 4.0, 9.0, 2.0, 7.0, 3.0)
    for (w <- Seq(2, 3, 4, 5, 16)) {
      val n = xs.length
      val lo = w - w / 2
      val expected = Array.tabulate(n) { i =>
        (i - lo to i + w / 2 - 1).map(j => xs(math.max(0, math.min(n - 1, j)))).sum / w
      }
      assertClose(EdgeMovingAvg(xs, w), expected, 1e-12)
    }
  }

  test("edge moving average of constant series is constant") {
    val xs = Array.fill(10)(4.2)
    assertClose(EdgeMovingAvg(xs, 16), xs, 1e-12)
  }
  test("hausdorff_l1 equals the O(nm) brute force on random trajectories") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def brute(a: Seq[Long], b: Seq[Long], w: Long): Long = {
      def dir(x: Seq[Long], y: Seq[Long]) = x.indices.map { i =>
        y.indices.map(j => w * math.abs(i - j) + math.abs(x(i) - y(j))).min
      }.max
      math.max(dir(a, b), dir(b, a))
    }
    def kernel(a: Seq[Long], b: Seq[Long], w: Long): Any =
      HausdorffL1(Literal.create(null), Literal.create(null), w)
        .nullSafeEval(new GenericArrayData(a.toArray),
          new GenericArrayData(b.toArray))
    val rnd = new scala.util.Random(59)
    for (w <- Seq(0L, 1L, 3L); _ <- 1 to 40) {
      val a = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(100).toLong)
      val b = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(100).toLong)
      assert(kernel(a, b, w) == brute(a, b, w), s"w=$w a=$a b=$b")
    }
  }

  test("prefix_prod equals the sequential scanLeft fold bit-for-bit " +
    "and nulls out on non-finite elements") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    def kernel(xs: Seq[Double]): Any =
      PrefixProd(Literal.create(null))
        .nullSafeEval(new GenericArrayData(xs.toArray))
    val rnd = new scala.util.Random(67)
    (1 to 30).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(20))(rnd.nextDouble() * 2)
      val expect = xs.scanLeft(1.0)(_ * _).tail
      val got = kernel(xs).asInstanceOf[ArrayData].toDoubleArray()
      assert(got.toSeq == expect, s"xs=$xs")
    }
    assert(kernel(Seq(1.0, Double.NaN)) == null)
    assert(kernel(Seq(Double.PositiveInfinity)) == null)
    assert(kernel(Seq.empty).asInstanceOf[ArrayData].numElements() == 0)
  }
}
