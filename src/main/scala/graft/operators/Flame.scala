package graft.operators

/** FLAME-style linear blend skinning — the reference's `FlameNode`
  * (`dpl/processor/nodes/flame.py:47-108`; model math
  * `dpl/flame/flame.py:43-312`, `dpl/flame/lbs.py:148-251`) as pure,
  * deterministic Scala. This is the one "inference" operator that is exact
  * linear algebra with no model runtime: codes -> (vertices, landmarks).
  *
  * The pass implements the public SMPL/FLAME LBS recipe:
  *  1. v_shaped = template + shapedirs.beta + expdirs.psi   (blend shapes)
  *  2. joints   = J_regressor . v_shaped
  *  3. per-joint rotations via Rodrigues of axis-angle pose
  *  4. pose-corrective offsets from (R - I) flattened        (posedirs)
  *  5. rigid kinematic chain -> per-joint world transforms
  *  6. v_posed  = sum_j w_ij * T_j applied to v_shaped       (skinning)
  *  7. landmarks via barycentric embedding on mesh faces
  *
  * Dimensions are generic (the real FLAME is nVerts=5023, nJoints=5,
  * nShape=100, nExp=50); tests exercise a small synthetic model.
  */
object Flame {

  /** Model assets (would be loaded from the published FLAME pickle; any
    * consistent basis works for the math). All arrays are row-major. */
  final case class FlameModel(
      template: Array[Double],        // nVerts*3
      shapedirs: Array[Array[Double]], // nShapeCoeffs x (nVerts*3)
      expdirs: Array[Array[Double]],   // nExpCoeffs x (nVerts*3)
      posedirs: Array[Array[Double]],  // 9*(nJoints-1) x (nVerts*3)
      jRegressor: Array[Array[Double]], // nJoints x nVerts
      parents: Array[Int],             // kinematic tree, parents(0) == -1
      lbsWeights: Array[Array[Double]], // nVerts x nJoints
      lmkFaces: Array[Array[Int]],     // nLmk x 3 vertex ids
      lmkBary: Array[Array[Double]]) { // nLmk x 3 barycentric coords
    def nVerts: Int = template.length / 3
    def nJoints: Int = parents.length
  }

  /** Rodrigues: axis-angle (3) -> rotation matrix (9, row-major).
    * Mirrors `lbs.py` batch_rodrigues. */
  def rodrigues(rx: Double, ry: Double, rz: Double): Array[Double] = {
    val theta = math.sqrt(rx * rx + ry * ry + rz * rz)
    if (theta < 1e-12) Array(1, 0, 0, 0, 1, 0, 0, 0, 1)
    else {
      val (x, y, z) = (rx / theta, ry / theta, rz / theta)
      val c = math.cos(theta); val s = math.sin(theta); val t = 1 - c
      Array(
        t * x * x + c,     t * x * y - s * z, t * x * z + s * y,
        t * x * y + s * z, t * y * y + c,     t * y * z - s * x,
        t * x * z - s * y, t * y * z + s * x, t * z * z + c)
    }
  }

  /** Full forward pass: (shape, exp, pose[axis-angle per joint]) ->
    * (verts: nVerts*3, landmarks: nLmk*3). */
  def forward(m: FlameModel, shape: Array[Double], exp: Array[Double],
              pose: Array[Double]): (Array[Double], Array[Double]) = {
    val n3 = m.template.length
    val nV = m.nVerts
    val nJ = m.nJoints
    // 1. blend shapes
    val vShaped = m.template.clone()
    blendInto(vShaped, m.shapedirs, shape)
    blendInto(vShaped, m.expdirs, exp)
    // 2. joints
    val joints = Array.ofDim[Double](nJ, 3)
    var j = 0
    while (j < nJ) {
      var c = 0
      while (c < 3) {
        var s = 0.0
        var v = 0
        while (v < nV) { s += m.jRegressor(j)(v) * vShaped(v * 3 + c); v += 1 }
        joints(j)(c) = s
        c += 1
      }
      j += 1
    }
    // 3. rotations
    val rots = Array.tabulate(nJ)(i =>
      rodrigues(pose(i * 3), pose(i * 3 + 1), pose(i * 3 + 2)))
    // 4. pose-corrective blendshapes from non-root (R - I)
    if (m.posedirs.nonEmpty) {
      val feat = new Array[Double](9 * (nJ - 1))
      var k = 0
      while (k < nJ - 1) {
        val r = rots(k + 1)
        var e = 0
        while (e < 9) {
          feat(k * 9 + e) = r(e) - (if (e % 4 == 0) 1.0 else 0.0)
          e += 1
        }
        k += 1
      }
      blendInto(vShaped, m.posedirs, feat)
    }
    // 5. rigid chain: world transform per joint (4x4 row-major, top 3 rows)
    val world = Array.ofDim[Double](nJ, 12)
    j = 0
    while (j < nJ) {
      val local = mkTransform(rots(j),
        if (m.parents(j) < 0) joints(j)
        else Array(joints(j)(0) - joints(m.parents(j))(0),
                   joints(j)(1) - joints(m.parents(j))(1),
                   joints(j)(2) - joints(m.parents(j))(2)))
      world(j) = if (m.parents(j) < 0) local else compose(world(m.parents(j)), local)
      j += 1
    }
    // relative-to-rest transforms: T_j - translate(R_j . joint_j)
    val skinT = Array.ofDim[Double](nJ, 12)
    j = 0
    while (j < nJ) {
      val w = world(j)
      val jt = joints(j)
      skinT(j) = w.clone()
      skinT(j)(3)  = w(3)  - (w(0) * jt(0) + w(1) * jt(1) + w(2) * jt(2))
      skinT(j)(7)  = w(7)  - (w(4) * jt(0) + w(5) * jt(1) + w(6) * jt(2))
      skinT(j)(11) = w(11) - (w(8) * jt(0) + w(9) * jt(1) + w(10) * jt(2))
      j += 1
    }
    // 6. skinning
    val out = new Array[Double](n3)
    var v = 0
    while (v < nV) {
      val (x, y, z) = (vShaped(v * 3), vShaped(v * 3 + 1), vShaped(v * 3 + 2))
      var ox = 0.0; var oy = 0.0; var oz = 0.0
      j = 0
      while (j < nJ) {
        val w = m.lbsWeights(v)(j)
        if (w != 0.0) {
          val t = skinT(j)
          ox += w * (t(0) * x + t(1) * y + t(2) * z + t(3))
          oy += w * (t(4) * x + t(5) * y + t(6) * z + t(7))
          oz += w * (t(8) * x + t(9) * y + t(10) * z + t(11))
        }
        j += 1
      }
      out(v * 3) = ox; out(v * 3 + 1) = oy; out(v * 3 + 2) = oz
      v += 1
    }
    // 7. barycentric landmarks
    val lmk = new Array[Double](m.lmkFaces.length * 3)
    var l = 0
    while (l < m.lmkFaces.length) {
      var c = 0
      while (c < 3) {
        var s = 0.0
        var k = 0
        while (k < 3) {
          s += m.lmkBary(l)(k) * out(m.lmkFaces(l)(k) * 3 + c)
          k += 1
        }
        lmk(l * 3 + c) = s
        c += 1
      }
      l += 1
    }
    (out, lmk)
  }

  private def blendInto(target: Array[Double], dirs: Array[Array[Double]],
                        coeffs: Array[Double]): Unit = {
    var k = 0
    while (k < coeffs.length && k < dirs.length) {
      val c = coeffs(k)
      if (c != 0.0) {
        val d = dirs(k)
        var i = 0
        while (i < target.length) { target(i) += c * d(i); i += 1 }
      }
      k += 1
    }
  }

  /** 3x4 transform [R | t] as a 12-array (row-major). */
  private def mkTransform(r: Array[Double], t: Array[Double]): Array[Double] =
    Array(r(0), r(1), r(2), t(0), r(3), r(4), r(5), t(1), r(6), r(7), r(8), t(2))

  /** Compose two [R|t] transforms: a then applied to b's output (a ∘ b). */
  private def compose(a: Array[Double], b: Array[Double]): Array[Double] = {
    val o = new Array[Double](12)
    var r = 0
    while (r < 3) {
      var c = 0
      while (c < 4) {
        var s = 0.0
        var k = 0
        while (k < 3) { s += a(r * 4 + k) * b(k * 4 + c); k += 1 }
        if (c == 3) s += a(r * 4 + 3)
        o(r * 4 + c) = s
        c += 1
      }
      r += 1
    }
    o
  }
}
