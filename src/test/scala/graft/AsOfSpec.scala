package graft

import graft.operators.AsOf

/** As-of join semantics on hand-built frames. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private val left = Seq(
    (1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
    (2L, 7L, "d")).toDF("k", "ts", "tag")
  private val right = Seq(
    (1L, 6L, 100.0), (1L, 10L, 200.0), (1L, 15L, 300.0),
    (3L, 1L, 999.0)).toDF("k", "ts", "v")

  test("inner as-of join picks the latest right row at-or-before each left ts") {
    val out = AsOf.asofJoin(left, right, "k", "ts")
      .orderBy("k", "ts").collect()
    // left (1,5) has no prior right -> dropped; (1,10) matches ts=10 (equal
    // ts matches); (1,20) matches ts=15; k=2 has no right rows -> dropped
    assert(out.length == 2)
    assert(out(0).getString(2) == "b" && out(0).getDouble(3) == 200.0)
    assert(out(1).getString(2) == "c" && out(1).getDouble(3) == 300.0)
  }

  test("outer as-of join keeps unmatched left rows with null") {
    val out = AsOf.asofJoin(left, right, "k", "ts", inner = false)
      .orderBy("k", "ts").collect()
    assert(out.length == 4)
    assert(out(0).isNullAt(3)) // (1,5): no prior right
    assert(out(3).isNullAt(3)) // (2,7): key absent on right
  }

  test("custom-plan as-of join matches the hand-built expectations") {
    val out = AsOf.asofJoinMerge(left, right, "k", "ts")
      .orderBy("k", "ts").collect()
    assert(out.length == 2)
    assert(out(0).getString(2) == "b" && out(0).getDouble(3) == 200.0)
    assert(out(1).getString(2) == "c" && out(1).getDouble(3) == 300.0)
  }

  test("forward as-of join picks the earliest right row at-or-after each left ts") {
    val out = AsOf.asofJoinForward(left, right, "k", "ts")
      .orderBy("k", "ts").collect()
    // (1,5)->ts6 100.0; (1,10)->ts10 200.0 (equal ts matches);
    // (1,20): no later right row -> dropped; (2,7): key absent -> dropped
    assert(out.length == 2)
    assert(out(0).getString(2) == "a" && out(0).getDouble(3) == 100.0)
    assert(out(1).getString(2) == "b" && out(1).getDouble(3) == 200.0)
  }

  test("custom-plan as-of join equals the union+window formulation on random data") {
    val rnd = new scala.util.Random(7)
    // ties, duplicate left timestamps, keys missing on either side
    val l = Seq.fill(400)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      .toDF("k", "ts", "lid")
    val r = Seq.fill(150)((rnd.nextInt(10).toLong, rnd.nextInt(50).toLong))
      .distinct // as-of requires unique (key, ts) on the right
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toDouble) }
      .toDF("k", "ts", "v")
    for (inner <- Seq(true, false)) {
      val a = AsOf.asofJoin(l, r, "k", "ts", inner)
        .orderBy("k", "ts", "lid").collect().toSeq
      val b = AsOf.asofJoinMerge(l, r, "k", "ts", inner)
        .orderBy("k", "ts", "lid").collect().toSeq
      assert(a == b, s"inner=$inner")
    }
  }

  test("custom-plan as-of join plans as AsofJoinExec with one exchange per side") {
    val df = AsOf.asofJoinMerge(left, right, "k", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }
}
