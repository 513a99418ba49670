package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flame
import graft.operators.Flame.FlameModel

/** FLAME LBS forward-pass properties on a small synthetic model. */
class FlameSpec extends AnyFunSuite {

  // 4 vertices, 2 joints (root at origin-ish, child offset on x),
  // 1 shape dir, 1 exp dir, no pose correctives.
  private val template = Array[Double](
    0, 0, 0,   1, 0, 0,   1, 1, 0,   0, 0, 2)
  private val model = FlameModel(
    template = template,
    shapedirs = Array(Array.tabulate(12)(i => if (i % 3 == 2) 0.5 else 0.0)), // +z per coeff
    expdirs = Array(Array.tabulate(12)(i => if (i % 3 == 0) 0.25 else 0.0)),  // +x per coeff
    posedirs = Array.empty,
    jRegressor = Array(
      Array(1.0, 0, 0, 0),   // joint0 = vertex0
      Array(0, 1.0, 0, 0)),  // joint1 = vertex1
    parents = Array(-1, 0),
    lbsWeights = Array(
      Array(1.0, 0), Array(0, 1.0), Array(0.5, 0.5), Array(1.0, 0)),
    lmkFaces = Array(Array(0, 1, 2)),
    lmkBary = Array(Array(0.2, 0.3, 0.5)))

  private val zeroPose = Array.fill(6)(0.0)

  test("zero pose and zero codes reproduce the template") {
    val (v, _) = Flame.forward(model, Array(0.0), Array(0.0), zeroPose)
    assert(v.zip(template).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("blend shapes add linearly") {
    val (v, _) = Flame.forward(model, Array(2.0), Array(4.0), zeroPose)
    val expected = template.zipWithIndex.map { case (t, i) =>
      t + (if (i % 3 == 2) 1.0 else 0.0) + (if (i % 3 == 0) 1.0 else 0.0)
    }
    assert(v.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("global rotation is rigid: pairwise distances preserved") {
    val pose = Array(0, 0, math.Pi / 2, 0, 0, 0) // 90 deg about z at root
    val (v, _) = Flame.forward(model, Array(0.0), Array(0.0), pose)
    def dist(arr: Array[Double], a: Int, b: Int) = math.sqrt(
      (0 until 3).map(c => math.pow(arr(a * 3 + c) - arr(b * 3 + c), 2)).sum)
    for (a <- 0 until 4; b <- a + 1 until 4) {
      // verts 0 and 3 are fully root-weighted; 1 fully child; 2 mixed —
      // compare only pairs with identical weights (rigid within a bone)
      if ((a, b) == (0, 3))
        assert(math.abs(dist(v, a, b) - dist(template, a, b)) < 1e-12)
    }
    // vertex0 (at the root joint) stays fixed under rotation about itself
    assert(math.abs(v(0)) < 1e-12 && math.abs(v(1)) < 1e-12 && math.abs(v(2)) < 1e-12)
    // vertex3 = (0,0,2) rotated 90 deg about z at origin -> stays (0,0,2)
    assert(math.abs(v(9)) < 1e-12 && math.abs(v(10)) < 1e-12 && math.abs(v(11) - 2) < 1e-12)
  }

  test("rodrigues of 90 degrees about z maps x-axis to y-axis") {
    val r = Flame.rodrigues(0, 0, math.Pi / 2)
    // r . (1,0,0) = (r0, r3, r6)
    assert(math.abs(r(0)) < 1e-12 && math.abs(r(3) - 1) < 1e-12 && math.abs(r(6)) < 1e-12)
  }

  test("landmarks are barycentric combinations of face vertices") {
    val (v, lmk) = Flame.forward(model, Array(1.0), Array(0.0), zeroPose)
    for (c <- 0 until 3) {
      val expect = 0.2 * v(0 * 3 + c) + 0.3 * v(1 * 3 + c) + 0.5 * v(2 * 3 + c)
      assert(math.abs(lmk(c) - expect) < 1e-12)
    }
  }
}
