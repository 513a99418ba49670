package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Exhaustive correctness of the Hilbert layout key: the defining
  * properties (bijection onto [0, 4^bits) and unit-step adjacency of
  * consecutive keys) pin the construction without a golden table — any
  * wrong fold breaks one of them somewhere on the grid. */
class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  private def grid(bits: Int): Map[Long, (Long, Long)] = {
    val n = 1L << bits
    val pts = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    pts.toDF("x", "y")
      .select(col("x"), col("y"), hilbert_key(bits, col("x"), col("y")).as("d"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .toMap
  }

  test("hilbert_key is a bijection with unit-step adjacency (bits 1..4)") {
    for (bits <- 1 to 4) {
      val cells = grid(bits)
      val total = 1L << (2 * bits)
      assert(cells.keySet == (0L until total).toSet, s"bits=$bits bijection")
      (0L until total - 1).foreach { d =>
        val (x1, y1) = cells(d)
        val (x2, y2) = cells(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits: d=$d (${cells(d)}) -> (${cells(d + 1)})")
      }
    }
  }

  test("hilbert_key masks inputs to bits and propagates nulls") {
    val masked = Seq((3L, 5L), (3L + 16L, 5L + 32L)) // equal mod 2^4
      .toDF("x", "y")
      .select(hilbert_key(4, col("x"), col("y"))).as[Long].collect()
    assert(masked(0) == masked(1))
    val n = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(hilbert_key(4, col("x"), col("y"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("hilbert locality beats morton at quadrant boundaries") {
    // the classic morton defect: z-order jumps from (7,3) to (0,4) on an
    // 8x8 grid (manhattan distance 8); hilbert never exceeds 1
    val bits = 3
    val cells = grid(bits)
    val maxStep = (0L until (1L << (2 * bits)) - 1).map { d =>
      val (x1, y1) = cells(d)
      val (x2, y2) = cells(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxStep == 1L)
    val mortonCells = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"), zorder_key(3, col("x"), col("y")).as("d"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    val mortonMax = (0L until 63L).map { d =>
      val (x1, y1) = mortonCells(d)
      val (x2, y2) = mortonCells(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(mortonMax > 1L)
  }
}
