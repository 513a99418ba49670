package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Perceptual-hash kernels for content-based image near-dup detection.
  *
  * The reference pipeline's unit of data is the decoded video frame
  * (`dpl/processor/datatype.py:64-69` — per-clip image directories), and
  * a 100 TB multimodal corpus build needs content dedup over those frames
  * just as it needs MinHash over text. dHash (difference hash; Krawetz,
  * "Kind of Like That", hackerfactor 2013 — public domain algorithm) is
  * the standard cheap perceptual fingerprint: downscale to a tiny
  * grayscale grid, then fingerprint the SIGN of adjacent-pixel gradients,
  * which survives recompression, scaling and small noise while exact
  * byte hashes do not.
  *
  * [[DHashBands]] is the whole kernel as ONE single-pass expression
  * (block-mean downsample to 8x9 + 64 gradient bits), emitted directly
  * as eight byte-band values so the caller can feed the same
  * banded-Hamming LSH join used for SimHash ([[graft.operators.Dedup]]):
  * a pair within Hamming distance d differs in at most d bands, so with
  * 8 bands any pair at d <= 7 shares at least one clean band —
  * candidate generation is an equi-join on (band, band_val), never
  * all-pairs. A transform/aggregate composition over the matrix column
  * would be re-inlined per reference by CollapseProject (the q67/q76
  * trap); here the matrix is evaluated exactly once per row.
  */
object ImageKernels {
  /** Grid constants: dHash's canonical 8 rows x 9 cols -> 8 bits/row. */
  val GridRows = 8
  val GridCols = 9

  /** Block-mean downsample an H x W integer-valued gray matrix to
    * GridRows x GridCols, then fold each row's 8 adjacent-mean
    * comparisons into one byte (bit j of row r set iff
    * mean(r,j) > mean(r,j+1), MSB first).
    *
    * Exactness contract: pixels must be integer-valued (as decoded
    * images are) and block sums < 2^53, so the per-block double sums
    * are exact in ANY accumulation order and the means (one correctly
    * rounded division each) are bit-identical across engines — the
    * DuckDB oracle replays this with a plain GROUP BY sum.
    */
  /** Full kernel on plain arrays (downsample + band fold) — the JVM twin
    * of [[DHashBands]].nullSafeEval for property tests and non-Spark use;
    * assumes a rectangular H x W matrix, H >= GridRows, W >= GridCols. */
  def dhashOf(matrix: Array[Array[Double]]): Array[Long] = {
    val h = matrix.length
    val w = matrix(0).length
    val sums = Array.ofDim[Double](GridRows, GridCols)
    val cnts = Array.ofDim[Int](GridRows, GridCols)
    var i = 0
    while (i < h) {
      val r = i * GridRows / h
      var j = 0
      while (j < w) {
        val c = j * GridCols / w
        sums(r)(c) += matrix(i)(j)
        cnts(r)(c) += 1
        j += 1
      }
      i += 1
    }
    dhashBands(Array.tabulate(GridRows, GridCols)((r, c) => sums(r)(c) / cnts(r)(c)))
  }

  def dhashBands(means: Array[Array[Double]]): Array[Long] = {
    val bands = new Array[Long](GridRows)
    var r = 0
    while (r < GridRows) {
      var acc = 0L
      var j = 0
      while (j < GridCols - 1) {
        acc = (acc << 1) | (if (means(r)(j) > means(r)(j + 1)) 1L else 0L)
        j += 1
      }
      bands(r) = acc
      r += 1
    }
    bands
  }
}

/** `dhash_bands(matrix)`: eight byte-band values (array<long>) of the
  * 64-bit dHash of an H x W gray matrix (array<array<double>>, H >= 8,
  * W >= 9, rectangular). NULL on a malformed matrix (null rows/cells,
  * ragged or too-small shape) — malformed media must degrade to "no
  * fingerprint", not poison the LSH join (round-4 lesson: expressions
  * that can return null MUST declare nullable). */
case class DHashBands(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import ImageKernels._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "dhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dhash_bands needs array<array<double>>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val rows = input.asInstanceOf[ArrayData]
    val h = rows.numElements()
    if (h < GridRows) return null
    val sums = Array.ofDim[Double](GridRows, GridCols)
    val cnts = Array.ofDim[Int](GridRows, GridCols)
    var w = -1
    var i = 0
    while (i < h) {
      if (rows.isNullAt(i)) return null
      val row = rows.getArray(i)
      if (w < 0) { w = row.numElements(); if (w < GridCols) return null }
      else if (row.numElements() != w) return null
      val r = i * GridRows / h
      var j = 0
      while (j < w) {
        if (row.isNullAt(j)) return null
        val c = j * GridCols / w
        sums(r)(c) += row.getDouble(j)
        cnts(r)(c) += 1
        j += 1
      }
      i += 1
    }
    val means = Array.tabulate(GridRows, GridCols)((r, c) => sums(r)(c) / cnts(r)(c))
    new GenericArrayData(ImageKernels.dhashBands(means))
  }

  override protected def withNewChildInternal(newChild: Expression): DHashBands =
    copy(child = newChild)
}
