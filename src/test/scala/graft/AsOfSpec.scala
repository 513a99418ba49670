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

  test("gridResample snaps observations onto the step grid with LOCF") {
    import spark.implicits._
    val obs = Seq(
      (1L, 3L, 10.0), (1L, 17L, 20.0), // key 1: grid 10 <- ts3, 20 <- ts17
      (2L, 25L, 30.0))                 // key 2: first obs after last grid pt
      .toDF("k", "ts", "v")
    val out = AsOf.gridResample(obs, "k", "ts", stepNs = 10L)
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // bounds [3, 25] -> grid {10, 20}; key 2 has no obs at-or-before
    // either point (inner drops), key 1 carries 10.0 then 20.0 forward
    assert(out == Seq((1L, 10L, 10.0), (1L, 20L, 20.0)))
  }

  test("gridResample degrades to empty on empty or sub-step streams") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "ts", "v")
    assert(AsOf.gridResample(empty, "k", "ts", 10L).count() == 0)
    // span [12, 17] contains no multiple of 10 -> no grid points
    val narrow = Seq((1L, 12L, 1.0), (1L, 17L, 2.0)).toDF("k", "ts", "v")
    val out = AsOf.gridResample(narrow, "k", "ts", 10L)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "ts", "v"))
  }

  test("gridResampleLinear interpolates between brackets, LOCF tail, exact floor") {
    import spark.implicits._
    val obs = Seq(
      (1L, 0L, 0L), (1L, 30L, 9L),   // grid 10 -> floor(9*10/30)=3, 20 -> 6
      (1L, 35L, -10L),               // grid 30 is an exact obs -> 9
      (2L, 5L, 100L))                // single obs: grid 10..40 all LOCF 100
      .toDF("k", "ts", "v")
    val out = AsOf.gridResampleLinear(obs, "k", "ts", "v", stepNs = 10L)
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bounds [0, 35] -> grid {0, 10, 20, 30}
    assert(out == Seq((1L, 0L, 0L), (1L, 10L, 3L), (1L, 20L, 6L),
      (1L, 30L, 9L),
      (2L, 10L, 100L), (2L, 20L, 100L), (2L, 30L, 100L)))
    // negative-numerator floor: v0=0 at ts 0, v1=-7 at ts 30 ->
    // grid 10: floor(-70/30) = -3 (NOT the -2 a truncating div gives)
    val neg = Seq((1L, 0L, 0L), (1L, 30L, -7L)).toDF("k", "ts", "v")
    val negOut = AsOf.gridResampleLinear(neg, "k", "ts", "v", stepNs = 10L)
      .orderBy("ts").collect().map(_.getLong(2)).toSeq
    assert(negOut == Seq(0L, -3L, -5L, -7L))
    // empty input degrades to an empty frame with the right schema
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "v")
    assert(AsOf.gridResampleLinear(empty, "k", "ts", "v", 10L).count() == 0)
    // the v·(t1−t0) int64 envelope is CHECKED per bracket: a value
    // times a gap past 4e18 must fail loudly, not wrap the product
    val huge = Seq((1L, 0L, 1000000000000000000L),
      (1L, 4000000000000000000L, 0L)).toDF("k", "ts", "v")
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
        msgs(t.getCause)
    assert(msgs(intercept[Throwable] {
      AsOf.gridResampleLinear(huge, "k", "ts", "v",
        stepNs = 1000000000000000000L).collect()
    }).contains("gridResampleLinear"))
  }

  test("asofJoinTolerance drops or nulls too-stale matches") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 50L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "tag")
    val r = Seq((1L, 8L, 7.0), (2L, 1L, 9.0)).toDF("k", "ts", "v")
    // tolerance 10: (1,10) matches ts=8 age 2; (1,50)'s only match is 42
    // stale; (2,5) matches ts=1 age 4
    val inner = AsOf.asofJoinTolerance(l, r, "k", "ts", tolerance = 10L)
      .orderBy("k", "ts")
      .collect().map(x => (x.getAs[Long]("k"), x.getAs[Long]("ts"),
        x.getAs[Double]("v"), x.getAs[Long]("match_ts"))).toSeq
    assert(inner == Seq((1L, 10L, 7.0, 8L), (2L, 5L, 9.0, 1L)))
    val outer = AsOf.asofJoinTolerance(l, r, "k", "ts", tolerance = 10L,
        inner = false)
      .orderBy("k", "ts").collect()
    assert(outer.length == 3)
    val staleRow = outer.find(_.getAs[Long]("ts") == 50L).get
    assert(staleRow.isNullAt(staleRow.fieldIndex("v")) &&
      staleRow.isNullAt(staleRow.fieldIndex("match_ts")))
  }

  test("gridResample matches a brute-force LOCF oracle on random streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((rnd.nextInt(6).toLong, rnd.nextInt(97).toLong))
      .distinct.map { case (k, ts) => (k, ts, rnd.nextInt(1000).toDouble) }
    val obs = rows.toDF("k", "ts", "v")
    val step = 7L
    val got = AsOf.gridResample(obs, "k", "ts", step)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tmin = rows.map(_._2).min
    val tmax = rows.map(_._2).max
    val first = ((tmin + step - 1) / step) * step
    val grid = (first to tmax by step)
    val byKey = rows.groupBy(_._1)
    val want = (for {
      (k, krows) <- byKey.toSeq
      g <- grid
      latest = krows.filter(_._2 <= g).sortBy(_._2).lastOption
      if latest.isDefined
    } yield (k, g, latest.get._3)).toSet
    assert(got == want)
  }

  test("lastTouchAttribution matches the brute rule and accounts for " +
    "every conversion") {
    import spark.implicits._
    val rnd = new scala.util.Random(224)
    val conv = Seq.fill(80)((rnd.nextInt(6).toLong,
      rnd.nextInt(1000).toLong * 10L, 1L + rnd.nextInt(100).toLong))
    val touch = Seq.fill(120)((rnd.nextInt(6).toLong,
      rnd.nextInt(1000).toLong * 10L,
      if (rnd.nextBoolean()) "ads" else "organic"))
    val tol = 300L
    val got = AsOf.lastTouchAttribution(conv.toDF("k", "ts", "v"),
        touch.toDF("k", "ts", "ch"), "k", "ts", "v", "ch", tol)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // brute: per (key, ts) the max channel; per conversion the latest
    // eligible touch within tolerance, else unattributed
    val uniq = touch.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).max).toMap
    val credited = conv.map { case (k, ts, v) =>
      val best = uniq.keys.filter(p => p._1 == k && p._2 <= ts &&
        ts - p._2 <= tol).toSeq.sortBy(_._2).lastOption
      (best.map(uniq).getOrElse("(unattributed)"), v)
    }
    val want = credited.groupBy(_._1).view.mapValues(g =>
      (g.size.toLong, g.map(_._2).sum)).toMap
    assert(got == want)
    // the audit property: nothing is silently dropped
    assert(got.values.map(_._1).sum == conv.size.toLong)
  }
}
