package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Coverage for the [[HllDistinct]] sketch aggregate: accuracy envelope
  * against exact distinct counts, bit-identical results under any
  * partitioning (the reproducibility contract the oracle relies on),
  * null handling, and the linear-counting small-range branch.
  */
class HllSpec extends SparkTestBase {
  import spark.implicits._

  private def estimate(values: Seq[String], p: Int, parts: Int = 2): Double =
    values.toDF("v").repartition(parts)
      .agg(hll_distinct(col("v"), p).as("est"))
      .head().getDouble(0)

  test("estimate stays inside the ~1.04/sqrt(m) HLL error envelope") {
    // duplicated values: 5000 distinct, each appearing 1-3 times
    val vals = (0 until 5000).flatMap(i => Seq.fill(1 + i % 3)(s"value-$i"))
    for (p <- Seq(8, 10, 12)) {
      val m = 1 << p
      val est = estimate(vals, p)
      val stdErr = 1.04 / math.sqrt(m.toDouble)
      // 4 sigma: deterministic (no flake — the hash is fixed), generous
      // enough that a correct estimator always lands inside
      assert(math.abs(est - 5000.0) / 5000.0 <= 4 * stdErr,
        s"p=$p est=$est exact=5000 envelope=${4 * stdErr}")
    }
  }

  test("estimate is bit-identical under repartition(1/7/32)") {
    val vals = (0 until 3000).map(i => s"doc-${i % 1700}")
    val ref = estimate(vals, 10, parts = 1)
    for (parts <- Seq(7, 32)) {
      val est = estimate(vals, 10, parts)
      assert(java.lang.Double.doubleToLongBits(est) ==
        java.lang.Double.doubleToLongBits(ref),
        s"parts=$parts est=$est ref=$ref not bit-identical")
    }
  }

  test("grouped estimates ignore nulls and empty groups never appear") {
    val df = Seq(
      ("a", "x1"), ("a", "x2"), ("a", "x1"), ("b", "y1")
    ).toDF("g", "v")
      .union(Seq(("a", null.asInstanceOf[String])).toDF("g", "v"))
    val out = df.groupBy("g").agg(hll_distinct(col("v"), 10).as("est"))
      .orderBy("g").collect()
    assert(out.length == 2)
    // small-range linear counting is near-exact at these cardinalities
    assert(math.abs(out(0).getDouble(1) - 2.0) < 0.01) // a: {x1, x2}, null dropped
    assert(math.abs(out(1).getDouble(1) - 1.0) < 0.01) // b: {y1}
  }

  test("linear-counting branch is near-exact for small cardinalities") {
    for (n <- Seq(10, 100, 1000)) {
      val est = estimate((0 until n).map(i => s"tok-$i"), 12)
      assert(math.abs(est - n) / n < 0.05, s"n=$n est=$est")
    }
  }

  test("merged per-group sketches equal the one-shot sketch of the union") {
    val df = (0 until 4000).map(i => (s"src-${i % 5}", s"tok-${i % 1300}"))
      .toDF("source", "v")
    val twoLevel = df.groupBy("source").agg(hll_sketch(col("v"), 10).as("sk"))
      .agg(hll_merge(col("sk"), 10).as("sk"))
      .select(hll_estimate(col("sk"))).head().getDouble(0)
    val oneShot = df.agg(hll_distinct(col("v"), 10)).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(twoLevel) ==
      java.lang.Double.doubleToLongBits(oneShot),
      s"two-level $twoLevel != one-shot $oneShot")
  }

  test("merge of merges equals merge of the flat set (associativity)") {
    val df = (0 until 900).map(i => (i % 6, s"g${i % 2}", s"val-$i")).toDF("fine", "coarse", "v")
    val fine = df.groupBy("fine", "coarse").agg(hll_sketch(col("v"), 8).as("sk"))
    val viaCoarse = fine.groupBy("coarse").agg(hll_merge(col("sk"), 8).as("sk"))
      .agg(hll_merge(col("sk"), 8).as("sk"))
      .select(hll_estimate(col("sk"))).head().getDouble(0)
    val flat = fine.agg(hll_merge(col("sk"), 8).as("sk"))
      .select(hll_estimate(col("sk"))).head().getDouble(0)
    assert(viaCoarse == flat)
  }

  test("hll_estimate nulls out on a malformed buffer; merge skips it") {
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("sk")
    assert(bad.select(hll_estimate(col("sk"))).head().isNullAt(0))
    // a corrupt sketch row must not poison a rollup: merging {bad, good}
    // yields the good sketch's estimate
    val good = Seq("a", "b", "c").toDF("v").agg(hll_sketch(col("v"), 8).as("sk"))
    val mixed = bad.union(good).agg(hll_merge(col("sk"), 8).as("sk"))
      .select(hll_estimate(col("sk"))).head().getDouble(0)
    val alone = good.select(hll_estimate(col("sk"))).head().getDouble(0)
    assert(mixed == alone)
  }

  test("precision bounds are enforced") {
    intercept[IllegalArgumentException] {
      HllDistinct(org.apache.spark.sql.catalyst.expressions.Literal("x"), p = 3)
    }
    intercept[IllegalArgumentException] {
      HllDistinct(org.apache.spark.sql.catalyst.expressions.Literal("x"), p = 17)
    }
  }
}
