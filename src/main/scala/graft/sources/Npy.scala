package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal NumPy `.npy` v1.0 codec (format spec is public and trivial:
  * magic + ASCII header dict + raw buffer). The reference stores every
  * numeric artifact as `.npy` (`np.save`/`np.load` throughout
  * `dpl/processor/nodes/`); this codec lets the Spark engine consume and
  * emit those artifacts as array columns.
  *
  * Supported dtypes: little-endian f4, f8, i4, i8 (all the reference
  * uses); C order only.
  */
object Npy {

  final case class NpyArray(shape: Array[Int], data: Array[Double]) {
    def rows: Int = if (shape.length == 0) 1 else shape(0)
  }

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  def read(bytes: Array[Byte]): NpyArray = {
    require(bytes.length > 10 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not an NPY file")
    val major = bytes(6)
    val headerLen =
      if (major == 1) ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
      else ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val headerStart = if (major == 1) 10 else 12
    val header = new String(bytes, headerStart, headerLen, StandardCharsets.ISO_8859_1)
    val descr = extract(header, "'descr':\\s*'([^']+)'")
    val fortran = extract(header, "'fortran_order':\\s*(True|False)") == "True"
    require(!fortran, "fortran_order not supported")
    val shapeStr = extract(header, "'shape':\\s*\\(([^)]*)\\)")
    val shape = shapeStr.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
    val n = if (shape.isEmpty) 1 else shape.product
    val buf = ByteBuffer.wrap(bytes, headerStart + headerLen,
      bytes.length - headerStart - headerLen).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    descr match {
      case "<f8" | "|f8" => var i = 0; while (i < n) { out(i) = buf.getDouble(); i += 1 }
      case "<f4" => var i = 0; while (i < n) { out(i) = buf.getFloat().toDouble; i += 1 }
      case "<i8" => var i = 0; while (i < n) { out(i) = buf.getLong().toDouble; i += 1 }
      case "<i4" => var i = 0; while (i < n) { out(i) = buf.getInt().toDouble; i += 1 }
      case d => throw new IllegalArgumentException(s"unsupported dtype $d")
    }
    NpyArray(shape, out)
  }

  /** Write a float64 C-order array in NPY v1.0 (numpy-compatible). */
  def writeF8(shape: Array[Int], data: Array[Double]): Array[Byte] = {
    require(shape.product == data.length, "shape/data mismatch")
    val shapeStr = shape.length match {
      case 0 => "()"
      case 1 => s"(${shape(0)},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': $shapeStr, }"
    // pad so total header (magic 6 + ver 2 + len 2 + dict + '\n') % 64 == 0
    val base = 10 + dict.length + 1
    val pad = (64 - (base % 64)) % 64
    val header = dict + (" " * pad) + "\n"
    val buf = ByteBuffer.allocate(10 + header.length + data.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).put(1.toByte).put(0.toByte)
      .put((header.length & 0xff).toByte).put(((header.length >> 8) & 0xff).toByte)
      .put(header.getBytes(StandardCharsets.ISO_8859_1))
    data.foreach(buf.putDouble)
    buf.array()
  }

  private def extract(header: String, pattern: String): String = {
    val m = java.util.regex.Pattern.compile(pattern).matcher(header)
    require(m.find(), s"NPY header missing $pattern in: $header")
    m.group(1)
  }
}
