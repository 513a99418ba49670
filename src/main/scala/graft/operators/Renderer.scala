package graft.operators

/** Software rasterizer — the reference's `RenderingNode`
  * (`dpl/processor/nodes/rendering.py:53-143`; PyTorch3D rasterization +
  * orthographic `batch_orth_proj`) as a minimal, deterministic CPU
  * renderer producing the same artifact kinds: face-normal image, uv
  * image, and foreground mask, z-buffered.
  *
  * Projection follows the orthographic convention: screen x = s*(x+tx),
  * y = s*(y+ty), mapped from NDC [-1,1] to pixel space with y flipped;
  * larger z is closer to the camera.
  */
object Renderer {

  final case class RenderOut(size: Int, mask: Array[Byte],
                             normal: Array[Byte], // 3 bytes/px, xyz -> rgb
                             uv: Array[Byte])     // 2 bytes/px (u, v)

  /** @param verts  flat nV*3
    * @param faces  triangles as vertex index triples
    * @param uvs    optional flat nV*2 vertex uv in [0,1] (zeros if empty)
    * @param cam    (scale, tx, ty) orthographic params
    */
  def render(verts: Array[Double], faces: Array[Array[Int]],
             uvs: Array[Double], cam: (Double, Double, Double),
             size: Int): RenderOut = {
    val (s, tx, ty) = cam
    val n = verts.length / 3
    val px = new Array[Double](n); val py = new Array[Double](n)
    val pz = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = s * (verts(i * 3) + tx)
      val y = s * (verts(i * 3 + 1) + ty)
      px(i) = (x + 1) / 2 * size
      py(i) = (1 - (y + 1) / 2) * size
      pz(i) = verts(i * 3 + 2)
      i += 1
    }
    val depth = Array.fill(size * size)(Double.NegativeInfinity)
    val mask = new Array[Byte](size * size)
    val normal = new Array[Byte](size * size * 3)
    val uvImg = new Array[Byte](size * size * 2)
    faces.foreach { f =>
      val (a, b, c) = (f(0), f(1), f(2))
      // face normal from world-space vertices
      val ux = verts(b * 3) - verts(a * 3); val uy = verts(b * 3 + 1) - verts(a * 3 + 1)
      val uz = verts(b * 3 + 2) - verts(a * 3 + 2)
      val vx = verts(c * 3) - verts(a * 3); val vy = verts(c * 3 + 1) - verts(a * 3 + 1)
      val vz = verts(c * 3 + 2) - verts(a * 3 + 2)
      var nx = uy * vz - uz * vy; var ny = uz * vx - ux * vz; var nz = ux * vy - uy * vx
      val len = math.sqrt(nx * nx + ny * ny + nz * nz)
      if (len > 1e-12) { nx /= len; ny /= len; nz /= len }
      val minX = math.max(0, math.floor(math.min(px(a), math.min(px(b), px(c)))).toInt)
      val maxX = math.min(size - 1, math.ceil(math.max(px(a), math.max(px(b), px(c)))).toInt)
      val minY = math.max(0, math.floor(math.min(py(a), math.min(py(b), py(c)))).toInt)
      val maxY = math.min(size - 1, math.ceil(math.max(py(a), math.max(py(b), py(c)))).toInt)
      val d = (py(b) - py(c)) * (px(a) - px(c)) + (px(c) - px(b)) * (py(a) - py(c))
      if (math.abs(d) > 1e-12) {
        var yPix = minY
        while (yPix <= maxY) {
          var xPix = minX
          while (xPix <= maxX) {
            val cx = xPix + 0.5; val cy = yPix + 0.5
            val w0 = ((py(b) - py(c)) * (cx - px(c)) + (px(c) - px(b)) * (cy - py(c))) / d
            val w1 = ((py(c) - py(a)) * (cx - px(c)) + (px(a) - px(c)) * (cy - py(c))) / d
            val w2 = 1 - w0 - w1
            if (w0 >= 0 && w1 >= 0 && w2 >= 0) {
              val z = w0 * pz(a) + w1 * pz(b) + w2 * pz(c)
              val idx = yPix * size + xPix
              if (z > depth(idx)) {
                depth(idx) = z
                mask(idx) = -1 // 0xff
                normal(idx * 3) = (((nx + 1) / 2) * 255).toByte
                normal(idx * 3 + 1) = (((ny + 1) / 2) * 255).toByte
                normal(idx * 3 + 2) = (((nz + 1) / 2) * 255).toByte
                if (uvs.nonEmpty) {
                  val u = w0 * uvs(a * 2) + w1 * uvs(b * 2) + w2 * uvs(c * 2)
                  val v = w0 * uvs(a * 2 + 1) + w1 * uvs(b * 2 + 1) + w2 * uvs(c * 2 + 1)
                  uvImg(idx * 2) = (u * 255).toByte
                  uvImg(idx * 2 + 1) = (v * 255).toByte
                }
              }
            }
            xPix += 1
          }
          yPix += 1
        }
      }
    }
    RenderOut(size, mask, normal, uvImg)
  }
}
