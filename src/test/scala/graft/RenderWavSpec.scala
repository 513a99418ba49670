package graft

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Renderer
import graft.sources.Wav

/** WAV codec + software rasterizer tests. */
class RenderWavSpec extends AnyFunSuite {

  private def wavBytes(samples: Array[Double], rate: Int, channels: Int = 1): Array[Byte] = {
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val raw = new Array[Byte](samples.length * 2 * channels)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, math.round(s * 32768))).toInt
      (0 until channels).foreach { c =>
        val off = (i * channels + c) * 2
        raw(off) = (v & 0xff).toByte
        raw(off + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("wav decode roundtrips 16-bit PCM within quantization error") {
    val src = Array.tabulate(1000)(i => 0.5 * math.sin(i * 0.02))
    val d = Wav.decode(wavBytes(src, 16000))
    assert(d.sampleRate == 16000 && d.samples.length == 1000)
    src.zip(d.samples).foreach { case (a, b) => assert(math.abs(a - b) < 1.0 / 32768) }
  }

  test("wav decode averages stereo to mono and decodeTo resamples") {
    val src = Array.tabulate(800)(i => math.sin(i * 0.05) * 0.3)
    val d = Wav.decode(wavBytes(src, 8000, channels = 2))
    assert(d.sampleRate == 8000 && d.samples.length == 800)
    val up = Wav.decodeTo(wavBytes(src, 8000), targetRate = 16000)
    assert(up.length == 1600)
  }

  test("rasterizer fills a centered triangle with correct mask and normal") {
    // triangle in the z=0.5 plane facing +z, covering the image center
    val verts = Array[Double](-0.8, -0.8, 0.5,  0.8, -0.8, 0.5,  0.0, 0.8, 0.5)
    val faces = Array(Array(0, 1, 2))
    val uvs = Array[Double](0, 0, 1, 0, 0.5, 1)
    val out = Renderer.render(verts, faces, uvs, (1.0, 0.0, 0.0), 64)
    val center = (32 * 64 + 32)
    assert(out.mask(center) != 0)           // center covered
    assert(out.mask(0) == 0)                // corner background
    // face normal is +z -> rgb ~ (127, 127, 255)
    assert((out.normal(center * 3 + 2) & 0xff) > 250)
    val covered = out.mask.count(_ != 0)
    assert(covered > 64 * 64 / 4 && covered < 64 * 64 * 3 / 4) // ~half the frame
  }

  test("rasterizer z-buffers: nearer triangle wins") {
    val verts = Array[Double](
      -0.9, -0.9, 0.2,  0.9, -0.9, 0.2,  0.0, 0.9, 0.2, // far
      -0.5, -0.5, 0.8,  0.5, -0.5, 0.8,  0.0, 0.5, 0.8) // near, on top
    val faces = Array(Array(0, 1, 2), Array(3, 4, 5))
    val out = Renderer.render(verts, faces, Array.empty, (1.0, 0.0, 0.0), 64)
    // both triangles face +z; center should be the NEAR one's surface.
    // near triangle's uv is empty; check via coverage: center covered and
    // total coverage > near-triangle-only coverage
    assert(out.mask(32 * 64 + 32) != 0)
    val nearOnly = Renderer.render(verts.slice(9, 18), Array(Array(0, 1, 2)),
      Array.empty, (1.0, 0.0, 0.0), 64).mask.count(_ != 0)
    assert(out.mask.count(_ != 0) > nearOnly)
  }
}
