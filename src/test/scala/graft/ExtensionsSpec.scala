package graft

import graft.functions.{SavGol, TextKernels}

/** SQL-function registration (registry path; the
  * `spark.sql.extensions=graft.plans.GraftExtensions` config path wires the
  * same builders at session construction). */
class ExtensionsSpec extends SparkTestBase {

  test("pure SQL can call the registered expression library") {
    graft.plans.GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  savgol_filter(array(1.0d, 2.0d, 3.0d, 4.0d, 5.0d, 6.0d, 7.0d), 5, 2) AS sg,
        |  tokenize('Hello  WORLD again') AS toks,
        |  md5_long('hello') AS h,
        |  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS jac,
        |  simhash32(tokenize('a b a')) AS sh
        |""".stripMargin).head
    // savgol of a linear ramp is the ramp
    val sg = row.getSeq[Double](0)
    SavGol(Array(1, 2, 3, 4, 5, 6, 7.0), 5, 2).zip(sg).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
    assert(row.getSeq[String](1) == Seq("hello", "world", "again"))
    assert(row.getLong(2) == TextKernels.md5Long("hello"))
    assert(row.getDouble(3) == 11.0)
    assert(math.abs(row.getDouble(4) - 0.5) < 1e-12)
    assert(row.getLong(5) >= 0)
  }

  test("chunk_spans and hist_cdf are SQL-callable") {
    graft.plans.GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  chunk_spans(tokenize('a b c d e'), 3, 1) AS ch,
        |  hist_cdf(array(1L, 1L, 1L, 1L), 0.5d, 0.0d, 1.0d, 4) AS cdf
        |""".stripMargin).head
    val spans = row.getSeq[org.apache.spark.sql.Row](0)
    assert(spans.map(r => (r.getLong(0), r.getLong(1))) == Seq((0L, 3L), (2L, 5L)))
    assert(row.getDouble(1) == 0.5) // uniform bins: cdf(midpoint) = 0.5
  }
}
