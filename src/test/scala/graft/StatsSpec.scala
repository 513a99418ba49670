package graft

import graft.operators.Stats

/** Exactness pins for the sufficient-statistics operators: rankAuc must
  * equal the O(n²) pairwise Mann–Whitney definition (ties = half a win)
  * on random data, and groupOls must reproduce the closed-form least
  * squares fit. */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("rankAuc equals the brute-force pairwise definition with ties") {
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      val rows = Seq.fill(120)((rnd.nextInt(12).toLong, rnd.nextBoolean()))
      val df = rows.toDF("score", "label")
      val out = Stats.rankAuc(df, "score", "label").collect().head
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      // pairwise: each (pos, neg) pair contributes 2 if pos > neg, 1 on
      // a tie — the doubled U statistic rankAuc computes via the histogram
      val u2 = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(out.getLong(0) == pos.length && out.getLong(1) == neg.length)
      assert(out.getLong(2) == u2, s"trial=$trial")
      assert(out.getDouble(3) ==
        u2.toDouble / (2L * pos.length * neg.length).toDouble)
    }
  }

  test("rankAuc is 1.0 for perfect separation and 0.5 for all-tied") {
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("score", "label")
    assert(Stats.rankAuc(perfect, "score", "label")
      .collect().head.getDouble(3) == 1.0)
    val tied = Seq((5L, true), (5L, true), (5L, false)).toDF("score", "label")
    assert(Stats.rankAuc(tied, "score", "label")
      .collect().head.getDouble(3) == 0.5)
  }

  test("bounded-histogram guards fire on high-cardinality input") {
    // a continuous-ish column: every row a distinct value — exactly the
    // degenerate case where the histogram equals the row count and the
    // single-partition / per-key cumulative window becomes a global sort.
    // The contract must be CHECKED (fail loudly), not just documented.
    val wide = spark.range(5000).select(
      org.apache.spark.sql.functions.lit(1L).as("k"),
      $"id".as("v"),
      ($"id" % 2 === 0).as("label"))
    val aucErr = intercept[IllegalArgumentException] {
      Stats.rankAuc(wide, "v", "label", maxDistinctScores = 1000L)
    }
    assert(aucErr.getMessage.contains("bounded-histogram"))
    val medErr = intercept[IllegalArgumentException] {
      Stats.exactGroupMedianX2(wide, "k", "v", maxDistinctPerKey = 1000L)
    }
    assert(medErr.getMessage.contains("bounded-histogram"))
    val madErr = intercept[IllegalArgumentException] {
      Stats.exactGroupMadX4(wide, "k", "v", maxDistinctPerKey = 1000L)
    }
    assert(madErr.getMessage.contains("bounded-histogram"))
    val modeErr = intercept[IllegalArgumentException] {
      Stats.groupMode(wide, "k", "v", maxDistinctPerKey = 1000L)
    }
    assert(modeErr.getMessage.contains("bounded-histogram"))
    // and the guard does NOT fire when the histogram is genuinely
    // bounded — same shape, quantized values
    val narrow = wide.withColumn("v",
      org.apache.spark.sql.functions.pmod($"v", org.apache.spark.sql.functions.lit(50L)))
    assert(Stats.exactGroupMedianX2(narrow, "k", "v",
      maxDistinctPerKey = 1000L).count() == 1L)
  }

  test("weighted median matches expansion-based median and reduces to q151 at w=1") {
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(200)((rnd.nextInt(4).toLong,
      rnd.nextInt(30).toLong, 1L + rnd.nextInt(5)))
    val df = rows.toDF("k", "v", "w")
    val got = Stats.exactGroupWeightedMedianX2(df, "k", "v", "w")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // reference: expand each row w times, take the unweighted doubled
    // median of the expanded multiset
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val expanded = rs.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }
        .sorted
      val n = expanded.length
      val lo = expanded((n + 1) / 2 - 1)
      val hi = expanded((n + 2) / 2 - 1)
      assert(got(k) == ((n.toLong, lo + hi)), s"key $k")
    }
    // w = 1 must equal the unweighted exact median
    val ones = df.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val uw = Stats.exactGroupMedianX2(ones, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val wm = Stats.exactGroupWeightedMedianX2(ones, "k", "v", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(wm == uw)
    // negative weights are rejected, not silently mis-ranked
    val neg = Seq((1L, 5L, -1L), (1L, 6L, 2L)).toDF("k", "v", "w")
    val e = intercept[IllegalArgumentException] {
      Stats.exactGroupWeightedMedianX2(neg, "k", "v", "w")
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("exactGroupGini matches the brute-force pairwise definition") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(150)((rnd.nextInt(3).toLong, rnd.nextInt(40).toLong))
    val got = Stats.exactGroupGini(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val xs = rs.map(_._2)
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val n = xs.length.toLong
      val sx = xs.sum
      if (sx > 0)
        assert(got(k) == ((n, sx, mad, mad.toDouble / (2L * n * sx))),
          s"key $k")
    }
    // mixed-sign input is rejected, not silently mis-measured
    val neg = Seq((1L, -5L), (1L, 6L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.exactGroupGini(neg, "k", "v")
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("trailingActives is lazy-safe on empty input (no NPE)") {
    val empty = spark.range(0).select($"id".as("u"), $"id".as("d"))
    assert(Stats.trailingActives(empty, "u", "d", 7).count() == 0L)
  }

  test("pageRankIntWeighted rejects non-positive weights on both paths") {
    import graft.operators.Graph
    val bad = Seq((1L, 2L, 0L), (2L, 3L, 4L)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankIntWeighted(bad, iterations = 2)
    }
    assert(e.getMessage.contains("weight > 0"))
    // the same rejection fires when the graph would take the
    // distributed path (driverEdgeLimit forced to 0)
    val e2 = intercept[IllegalArgumentException] {
      Graph.pageRankIntWeighted(bad, iterations = 2, driverEdgeLimit = 0L)
    }
    assert(e2.getMessage.contains("weight > 0"))
  }

  test("groupOls recovers an exact linear relation") {
    // y = 3x + 7 for key 1; key 2 has zero x-variance -> dropped
    val df = Seq((1L, 0L, 7L), (1L, 1L, 10L), (1L, 2L, 13L), (1L, 5L, 22L),
      (2L, 4L, 9L), (2L, 4L, 11L)).toDF("k", "x", "y")
    val out = Stats.groupOls(df, "k", "x", "y").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 7.0)
  }

  test("groupOls matches the closed-form fit on random integer data") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(200)((rnd.nextInt(5).toLong,
      rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "x", "y")
    val got = Stats.groupOls(df, "k", "x", "y").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val den = n * sxx - sx * sx
      if (den == 0L) assert(!got.contains(k))
      else {
        val slope = (n * sxy - sx * sy).toDouble / den.toDouble
        val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
        val (gn, gs, gi) = got(k)
        assert(gn == n && gs == slope && gi == intercept, s"k=$k")
      }
    }
  }

  test("markovTransitions counts steps within groups only") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), // a->b, b->a
      (2L, 1L, "b"), (2L, 2L, "b"),                // b->b
      (3L, 1L, "c")                                // singleton: no step
    ).toDF("g", "o", "s")
    val out = Stats.markovTransitions(df, Seq("g"),
      Seq(org.apache.spark.sql.functions.col("o")), "s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set(
      ("a", "b", 1L, 1.0),
      ("b", "a", 1L, 0.5), ("b", "b", 1L, 0.5)))
  }

  test("markovTransitions matches a brute-force count on random traces") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 400).map(i =>
      (rnd.nextInt(10).toLong, i.toLong, s"s${rnd.nextInt(4)}"))
    val df = rows.toDF("g", "o", "s")
    val got = Stats.markovTransitions(df, Seq("g"),
      Seq(org.apache.spark.sql.functions.col("o")), "s")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val steps = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(_._2).map(_._3).sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }
    val cnt = steps.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totals = steps.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got.keySet == cnt.keySet)
    cnt.foreach { case (k, c) =>
      assert(got(k) == ((c, c.toDouble / totals(k._1).toDouble)), s"$k")
    }
  }

  test("groupMoments reproduces closed-form moments") {
    // key 1: {1, 2, 3, 6}: mean 3, var (n*s2-s1^2)/n^2 = (4*50-144)/16 = 3.5
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 6L),
      (2L, 5L), (2L, 5L)) // zero variance -> NaN skew
      .toDF("k", "x")
    val out = Stats.groupMoments(df, "k", "x")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 4L && r1.getDouble(2) == 3.0 &&
      r1.getDouble(3) == 3.5 && r1.getDouble(4) == math.sqrt(3.5))
    // s3 = 1+8+27+216 = 252; num = 16*252 - 3*4*12*50 + 2*1728 = 288
    val skewNum = (4L*4*252 - 3L*4*12*50 + 2L*12*12*12).toDouble
    assert(r1.getDouble(5) ==
      skewNum / (4.0*4*4*r1.getDouble(4)*r1.getDouble(4)*r1.getDouble(4)))
    val r2 = out(2L)
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(5).isNaN)
  }

  test("timeWeightedAvg weights each value by how long it held") {
    // key 1: 10 cents for 3 ticks, then 40 for 1 tick -> (30+40)/4 = 17.5
    val df = Seq((1L, 0L, 1L, 10L), (1L, 3L, 2L, 40L), (1L, 4L, 3L, 7L),
      (2L, 5L, 4L, 99L)) // single observation: zero span, dropped
      .toDF("k", "ts", "id", "v")
    val out = Stats.timeWeightedAvg(df, "k", "ts", "id", "v").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 4L &&
      out.head.getDouble(2) == 17.5)
  }

  test("timeWeightedAvg matches brute force on random series") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map(i => (rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong, i.toLong, rnd.nextInt(500).toLong))
    val got = Stats.timeWeightedAvg(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val s = g.sortBy(r => (r._2, r._3))
      val span = s.last._2 - s.head._2
      if (span == 0L) assert(!got.contains(k))
      else {
        val wv = s.zip(s.tail).map { case (a, b) => a._4 * (b._2 - a._2) }.sum
        assert(got(k) == ((span, wv.toDouble / span.toDouble)), s"k=$k")
      }
    }
  }

  test("retentionCohorts counts distinct returning users per offset") {
    val df = Seq(
      (1L, 10L), (1L, 10L), (1L, 12L), // cohort 10: day 0 and offset 2
      (2L, 10L), (2L, 11L),            // cohort 10: day 0 and offset 1
      (3L, 11L))                       // cohort 11: day 0 only
      .toDF("u", "day")
    val out = Stats.retentionCohorts(df, "u", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((10L, 0L, 2L), (10L, 1L, 1L), (10L, 2L, 1L),
      (11L, 0L, 1L)))
  }

  test("trailingActives equals a brute-force window count") {
    val rnd = new scala.util.Random(37)
    val rows = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(30).toLong))
    val got = Stats.trailingActives(rows.toDF("u", "day"), "u", "day", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxDay = rows.map(_._2).max
    val want = (0L to maxDay).flatMap { d =>
      val active = rows.filter(r => r._2 <= d && r._2 >= d - 6)
        .map(_._1).distinct.size
      if (active > 0) Some(d -> active.toLong) else None
    }.toMap
    // operator emits only days at/after some activity start; brute force
    // over [0, maxDay] matches exactly on the emitted keys
    assert(got == want.filter(_._2 > 0))
  }

  test("token_bucket replays the integer rate-limit policy") {
    import graft.functions.token_bucket
    import org.apache.spark.sql.functions.{col, explode, array}
    // cap 2 tokens (2000 milli), refill 1 token/sec, cost 1 token
    // events at t=0, 0.1s, 0.2s, 1.3s, 1.35s (micros)
    val df = Seq((1L, Seq(0L, 100000L, 200000L, 1300000L, 1350000L)))
      .toDF("id", "us")
    val out = df.select(col("id"),
        explode(array(token_bucket(col("us"), 2000L, 1000L, 1000L))).as("r"))
      .select(col("r.granted"), col("r.denied"), col("r.tokens_milli"))
      .collect().head
    // t0: full 2000 -> grant (1000); t1: +100 -> 1100 grant (100);
    // t2: +100 -> 200 deny; t3: +1100 -> 1300 grant (300); t4: +50 ->
    // 350 deny
    assert(out.getLong(0) == 3L && out.getLong(1) == 2L &&
      out.getLong(2) == 350L)
  }
  test("exactGroupMedianX2 matches a sort-based median on random data") {
    val rnd = new scala.util.Random(47)
    val rows = Seq.fill(500)((rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
    val got = Stats.exactGroupMedianX2(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val s = g.map(_._2).sorted
      val n = s.length
      val x2 = s((n - 1) / 2) + s(n / 2) // lo middle + hi middle
      assert(got(k) == ((n.toLong, x2)), s"k=$k")
    }
  }

  test("groupMode picks the most frequent value, smallest on ties") {
    val df = Seq((1L, 5L), (1L, 5L), (1L, 9L),
      (2L, 7L), (2L, 3L)) // tie -> smallest value wins
      .toDF("k", "v")
    val out = Stats.groupMode(df, "k", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(1L -> ((5L, 2L)), 2L -> ((3L, 1L))))
  }
  test("exactGroupMadX4 matches a sort-based MAD on random data") {
    val rnd = new scala.util.Random(61)
    val rows = Seq.fill(400)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
    val got = Stats.exactGroupMadX4(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val s = g.map(_._2).sorted
      val n = s.length
      val m2 = s((n - 1) / 2) + s(n / 2)
      val dev = g.map(r => math.abs(2 * r._2 - m2)).sorted
      val mad4 = dev((n - 1) / 2) + dev(n / 2)
      assert(got(k) == ((n.toLong, m2, mad4)), s"k=$k")
    }
  }

  test("exactGroupQuantile matches the sort-based order statistic " +
    "for every rational p on random data") {
    val rnd = new scala.util.Random(83)
    val rows = Seq.fill(300)((rnd.nextInt(4).toLong, rnd.nextInt(30).toLong))
    val df = rows.toDF("k", "v")
    for ((num, den) <- Seq((1L, 2L), (1L, 4L), (9L, 10L), (99L, 100L), (1L, 1L))) {
      val got = Stats.exactGroupQuantile(df, "k", "v", num, den)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      rows.groupBy(_._1).foreach { case (k, g) =>
        val s = g.map(_._2).sorted
        val n = s.length
        val rank = ((num * n + den - 1) / den).toInt // ceil, 1-based
        assert(got(k) == ((n.toLong, s(rank - 1))), s"k=$k p=$num/$den")
      }
    }
  }

  test("exactGroupQuantile at p=1/2 picks the lower middle (median lo)") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L)).toDF("k", "v")
    val q = Stats.exactGroupQuantile(df, "k", "v", 1L, 2L).collect().head
    assert(q.getLong(2) == 20L) // rank ceil(4/2)=2 -> lower middle
  }

  test("longestStreak finds the longest run, ties to earliest, " +
    "and matches brute force on random activity") {
    val rnd = new scala.util.Random(97)
    val rows = Seq.fill(600)(
      (rnd.nextInt(8).toLong, (100 + rnd.nextInt(40)).toLong))
    val got = Stats.longestStreak(rows.toDF("k", "d"), "k", "d")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val days = g.map(_._2).distinct.sorted
      // brute-force: walk the sorted distinct days accumulating runs
      var runs = List.empty[(Long, Long)] // (start, len)
      days.foreach { d =>
        runs = runs match {
          case (s, l) :: rest if d == s + l => (s, l + 1) :: rest
          case _ => (d, 1L) :: runs
        }
      }
      val (bs, bl) = runs.reverse.maxBy { case (s, l) => (l, -s) }
      assert(got(k) == ((days.length.toLong, bl, bs)), s"k=$k")
    }
  }

  test("growthAccounting classifies new/retained/resurrected/churned " +
    "exactly on a hand-built timeline") {
    // user 1: days 10,11,13 -> new@10, retained@11, churn@12,
    //         resurrected@13, churn@14
    // user 2: days 11,12    -> new@11, retained@12, churn@13
    val df = Seq((1L, 10L), (1L, 11L), (1L, 13L), (2L, 11L), (2L, 12L))
      .toDF("k", "d")
    val got = Stats.growthAccounting(df, "k", "d").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      10L -> ((1L, 0L, 0L, 0L)),
      11L -> ((1L, 1L, 0L, 0L)),
      12L -> ((0L, 1L, 0L, 1L)),
      13L -> ((0L, 0L, 1L, 1L)),
      14L -> ((0L, 0L, 0L, 1L))))
  }

  test("groupInversions matches the brute-force pair count on random " +
    "series, with ord ties never inverting") {
    val rnd = new scala.util.Random(131)
    val rows = Seq.fill(400)((rnd.nextInt(5).toLong,
      rnd.nextInt(20).toLong, rnd.nextInt(15).toLong))
    val got = Stats.groupInversions(rows.toDF("k", "o", "v"), "k",
        Seq("o"), "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      // brute force over the SORTED-BY-(o, v) sequence: pairs a<b in
      // that order with v_a > v_b (tied o sorts v ascending -> never
      // an inversion, matching the operator's struct sort)
      val s = g.map(t => (t._2, t._3)).sorted
      val inv = (for {
        i <- s.indices; j <- (i + 1) until s.length
        if s(i)._2 > s(j)._2
      } yield 1).size.toLong
      val n = s.length.toLong
      val (gn, gi, gd) = got(k)
      assert((gn, gi) == ((n, inv)), s"k=$k")
      if (n < 2) assert(gd.isNaN, s"k=$k")
      else assert(gd == inv.toDouble / (n * (n - 1) / 2).toDouble, s"k=$k")
    }
  }

  test("groupInversions: sorted is 0, reversed is C(n,2), " +
    "single row is NaN disorder, and the per-key bound fires") {
    val sorted = (1L to 10L).map(i => (1L, i, i)).toDF("k", "o", "v")
    assert(Stats.groupInversions(sorted, "k", Seq("o"), "v")
      .collect().head.getLong(2) == 0L)
    val rev = (1L to 10L).map(i => (1L, i, 11L - i)).toDF("k", "o", "v")
    assert(Stats.groupInversions(rev, "k", Seq("o"), "v")
      .collect().head.getLong(2) == 45L)
    val one = Seq((1L, 1L, 5L)).toDF("k", "o", "v")
    val r = Stats.groupInversions(one, "k", Seq("o"), "v").collect().head
    assert(r.getLong(2) == 0L && r.getDouble(3).isNaN)
    val err = intercept[IllegalArgumentException] {
      Stats.groupInversions(sorted, "k", Seq("o"), "v", maxRowsPerKey = 5L)
    }
    assert(err.getMessage.contains("per-key kernel contract"))
  }

  test("groupAutocorr matches the brute-force Pearson over lagged " +
    "pairs, and known shapes have the right sign") {
    val rnd = new scala.util.Random(151)
    for (k <- Seq(1, 2)) {
      val rows = Seq.fill(300)((rnd.nextInt(4).toLong,
        rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong))
        // unique ord per key to make brute order total
        .zipWithIndex.map { case ((key, _, v), i) => (key, i.toLong, v) }
      val got = Stats.groupAutocorr(rows.toDF("k", "o", "v"), "k",
          Seq("o"), "v", k)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      rows.groupBy(_._1).foreach { case (key, g) =>
        val s = g.sortBy(_._2).map(_._3)
        val pairs = s.dropRight(k).zip(s.drop(k))
        val m = pairs.length.toLong
        val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
        val saa = pairs.map(p => p._1 * p._1).sum
        val sbb = pairs.map(p => p._2 * p._2).sum
        val sab = pairs.map(p => p._1 * p._2).sum
        val (gm, gab, gr) = got(key)
        assert((gm, gab) == ((m, sab)), s"key=$key k=$k")
        val va = m * saa - sa * sa; val vb = m * sbb - sb * sb
        if (va == 0L || vb == 0L) assert(gr.isNaN, s"key=$key k=$k")
        else assert(gr == (m * sab - sa * sb).toDouble /
          (math.sqrt(va.toDouble) * math.sqrt(vb.toDouble)),
          s"key=$key k=$k")
      }
    }
    // strictly increasing series: perfect lag-1 persistence, r = 1
    val inc = (1L to 20L).map(i => (1L, i, i)).toDF("k", "o", "v")
    assert(math.abs(Stats.groupAutocorr(inc, "k", Seq("o"), "v", 1)
      .collect().head.getDouble(3) - 1.0) < 1e-12)
    // alternating series: lag-1 anti-persistence, r = -1
    val alt = (1L to 20L).map(i => (1L, i, (i % 2) * 10L))
      .toDF("k", "o", "v")
    assert(math.abs(Stats.groupAutocorr(alt, "k", Seq("o"), "v", 1)
      .collect().head.getDouble(3) + 1.0) < 1e-12)
    // constant series: zero variance -> NaN
    val const = (1L to 5L).map(i => (1L, i, 7L)).toDF("k", "o", "v")
    assert(Stats.groupAutocorr(const, "k", Seq("o"), "v", 1)
      .collect().head.getDouble(3).isNaN)
  }

  test("stateRuns collapses consecutive states into numbered runs " +
    "matching brute-force RLE") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"),
      (1L, 4L, "a"), (2L, 1L, "x")).toDF("k", "o", "st")
    val got = Stats.stateRuns(df, "k", Seq("o"), "st")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(got == Map(
      (1L, 1L) -> (("a", 2L)), (1L, 2L) -> (("b", 1L)),
      (1L, 3L) -> (("a", 1L)), (2L, 1L) -> (("x", 1L))))
    // random property vs brute-force RLE
    val rnd = new scala.util.Random(191)
    val rows = Seq.tabulate(500)(i =>
      (rnd.nextInt(6).toLong, i.toLong, s"s${rnd.nextInt(3)}"))
    val out = Stats.stateRuns(rows.toDF("k", "o", "st"), "k", Seq("o"), "st")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val seq = g.sortBy(_._2).map(_._3)
      val rle = seq.foldLeft(List.empty[(String, Long)]) {
        case ((s, n) :: rest, x) if s == x => (s, n + 1) :: rest
        case (acc, x) => (x, 1L) :: acc
      }.reverse
      rle.zipWithIndex.foreach { case ((st, len), i) =>
        assert(out((k, i + 1L)) == ((st, len)), s"k=$k run=${i + 1}")
      }
      assert(!out.contains((k, rle.size + 1L)))
    }
  }

  test("benfordProfile extracts exact leading digits incl. int64 edges " +
    "and ships identical expected-share literals") {
    val df = Seq((1L, 1L), (1L, 9L), (1L, 10L), (1L, 99L), (1L, 100L),
      (1L, 923L), (1L, Long.MaxValue), (1L, 0L), (1L, -5L))
      .toDF("k", "v")
    val out = Stats.benfordProfile(df, "k", "v")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(5)))).toMap
    // 0 and -5 excluded; digits: 1(1,10,100), 9(9,99,923,MaxValue)
    assert(out == Map(
      1L -> ((3L, 7L, Stats.BenfordShare(0))),
      9L -> ((4L, 7L, Stats.BenfordShare(8)))))
    assert(math.abs(Stats.BenfordShare.sum - 1.0) < 1e-12)
  }

  test("calibrationTable bins exactly and reports exact rates") {
    // scores 0..99, label fires iff score >= 50; 10 bins of width 10
    val df = (0L until 100L).map(i => (i, i >= 50L)).toDF("s", "l")
    val out = Stats.calibrationTable(df, "s", "l", nBins = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out.size == 10)
    (0L until 10L).foreach { b =>
      val (n, np, ms, fp) = out(b)
      assert(n == 10L && ms == (b * 100L + 45L).toDouble / 10.0)
      assert(np == (if (b >= 5) 10L else 0L))
      assert(fp == (if (b >= 5) 1.0 else 0.0))
    }
    // degenerate single-score input: one bin 0, rate exact
    val one = Seq((7L, true), (7L, false)).toDF("s", "l")
    val o1 = Stats.calibrationTable(one, "s", "l", nBins = 4)
      .collect()
    assert(o1.length == 1 && o1.head.getLong(0) == 0L &&
      o1.head.getDouble(5) == 0.5)
  }

  test("ksStatistic matches the brute-force max CDF gap and known " +
    "shapes: identical samples 0, disjoint samples 1") {
    val rnd = new scala.util.Random(199)
    val rows = Seq.fill(600)((rnd.nextInt(4).toLong,
      rnd.nextBoolean(), rnd.nextInt(25).toLong))
    val got = Stats.ksStatistic(rows.toDF("k", "side", "v"), "k",
        "side", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val a = g.filter(_._2).map(_._3)
      val b = g.filterNot(_._2).map(_._3)
      if (a.nonEmpty && b.nonEmpty) {
        val grid = (a ++ b).distinct.sorted
        val dNum = grid.map(v =>
          math.abs(a.count(_ <= v).toLong * b.size -
            b.count(_ <= v).toLong * a.size)).max
        assert(got(k) == ((a.size.toLong, b.size.toLong, dNum,
          dNum.toDouble / (a.size.toLong * b.size).toDouble)), s"k=$k")
      } else assert(!got.contains(k), s"k=$k one-sided must drop")
    }
    // identical samples -> D = 0; disjoint supports -> D = 1
    val same = (1L to 20L).flatMap(i =>
      Seq((1L, true, i % 5), (1L, false, i % 5))).toDF("k", "side", "v")
    assert(Stats.ksStatistic(same, "k", "side", "v")
      .collect().head.getDouble(4) == 0.0)
    val disj = ((1L to 10L).map(i => (1L, true, i)) ++
      (1L to 10L).map(i => (1L, false, i + 100L))).toDF("k", "side", "v")
    assert(Stats.ksStatistic(disj, "k", "side", "v")
      .collect().head.getDouble(4) == 1.0)
  }

  test("cramersV matches brute force and hits the 0/1/NaN shapes") {
    val rnd = new scala.util.Random(211)
    val rows = Seq.fill(500)((s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}"))
    val out = Stats.cramersV(rows.toDF("a", "b"), "a", "b").collect().head
    // brute force over the FULL category grid (zero cells included)
    // with the same nano-quantized per-cell terms
    val obs = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ra = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cb = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toLong
    val chi2Nano = (for (a <- ra.keys; b <- cb.keys) yield {
      val o = obs.getOrElse((a, b), 0L)
      val t = (n * o - ra(a) * cb(b)).toDouble
      math.floor(t * t / (n.toDouble * ra(a).toDouble * cb(b).toDouble)
        * 1e9).toLong
    }).sum
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) ==
      ((n, ra.size.toLong * cb.size, chi2Nano)))
    assert(out.getDouble(3) ==
      math.sqrt(chi2Nano.toDouble / 1e9 / (n * (3 - 1)).toDouble))
    // perfect association -> V = 1 (up to the nano quantization)
    val perfect = Seq.tabulate(100)(i => (s"x${i % 3}", s"y${i % 3}"))
      .toDF("a", "b")
    assert(math.abs(Stats.cramersV(perfect, "a", "b")
      .collect().head.getDouble(3) - 1.0) < 1e-4)
    // one-category side -> NaN
    val one = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Stats.cramersV(one, "a", "b").collect().head.getDouble(3).isNaN)
  }

  test("burstDays flags exactly the days beating num/den x the " +
    "trailing EWMA, first day never bursts") {
    // key 1 daily counts: 8, 8, 8, 20 -> EWMA(>>1): 8, 8, 8 ;
    // day 13 count 20 > 3/2 * 8 -> burst; day 11/12 8 !> 12 -> no
    val rows =
      (1 to 8).map(_ => (1L, 10L)) ++ (1 to 8).map(_ => (1L, 11L)) ++
      (1 to 8).map(_ => (1L, 12L)) ++ (1 to 20).map(_ => (1L, 13L))
    val out = Stats.burstDays(rows.toDF("k", "d"), "k", "d",
        shift = 1, num = 3L, den = 2L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getBoolean(4)))).toMap
    assert(out(10L) == ((8L, -1L, false))) // no baseline yet
    assert(out(11L) == ((8L, 8L, false)))
    assert(out(12L) == ((8L, 8L, false)))
    assert(out(13L) == ((20L, 8L, true)))
    // random property: replay the kernel + threshold scalar-side
    val rnd = new scala.util.Random(223)
    val ev = Seq.fill(800)((rnd.nextInt(3).toLong,
      (50 + rnd.nextInt(30)).toLong))
    val got = Stats.burstDays(ev.toDF("k", "d"), "k", "d", 2, 2L, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(4)))).toMap
    ev.groupBy(_._1).foreach { case (k, g) =>
      val counts = g.groupBy(_._2).map { case (d, v) => d -> v.size.toLong }
        .toSeq.sortBy(_._1)
      var s = 0L
      counts.zipWithIndex.foreach { case ((d, c), i) =>
        val burst = i > 0 && c * 1L > 2L * s
        s = if (i == 0) c else s + ((c - s) >> 2)
        assert(got((k, d)) == ((c, burst)), s"k=$k d=$d")
      }
    }
  }

  test("rankAucByKey equals per-key rankAuc and drops one-class keys") {
    val rnd = new scala.util.Random(227)
    val rows = Seq.fill(400)((rnd.nextInt(4).toLong,
      rnd.nextInt(30).toLong, rnd.nextBoolean())) ++
      Seq.fill(10)((9L, rnd.nextInt(30).toLong, true)) // one-class key
    val df = rows.toDF("k", "score", "label")
    val byKey = Stats.rankAucByKey(df, "k", "score", "label")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(!byKey.contains(9L), "one-class key must drop")
    rows.groupBy(_._1).filterNot(_._1 == 9L).foreach { case (k, g) =>
      val single = Stats.rankAuc(
        g.map(t => (t._2, t._3)).toDF("score", "label"), "score", "label")
        .collect().head
      assert(byKey(k) == ((single.getLong(0), single.getLong(1),
        single.getLong(2), single.getDouble(3))), s"k=$k")
    }
  }

  test("vocabDrift surfaces the planted heavy movers in exact order") {
    val a = Seq((1L, "alpha alpha alpha common common"),
      (2L, "gone gone gone gone")).toDF("doc_id", "text")
    val b = Seq((3L, "alpha common common fresh fresh fresh fresh fresh"))
      .toDF("doc_id", "text")
    import graft.operators.TextAnalysis
    val out = TextAnalysis.vocabDrift(a, b, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("fresh", 0L, 5L, 5L, 5L),   // biggest mover
      ("gone", 4L, 0L, -4L, 4L),
      ("alpha", 3L, 1L, -2L, 2L))) // 'common' (|d|=0) never outranks
  }

  test("twoProportionZ matches the textbook statistic and hits the " +
    "degenerate shapes") {
    // A: 30/100, B: 20/100 -> classic pooled z
    val rows = (1 to 100).map(i => (1L, true, i <= 30)) ++
      (1 to 100).map(i => (1L, false, i <= 20))
    val out = Stats.twoProportionZ(rows.toDF("k", "side", "hit"),
      "k", "side", "hit").collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) == ((100L, 30L, 100L, 20L)))
    val (pa, pb, p) = (0.3, 0.2, 0.25)
    val z = (pa - pb) / math.sqrt(p * (1.0 - p) * (1.0 / 100 + 1.0 / 100))
    assert(out.getDouble(7) == z)
    // all-hit pool: zero variance -> NaN; missing side -> key drops
    val allHit = Seq((1L, true, true), (1L, false, true))
      .toDF("k", "side", "hit")
    assert(Stats.twoProportionZ(allHit, "k", "side", "hit")
      .collect().head.getDouble(7).isNaN)
    val oneSide = Seq((1L, true, true), (1L, true, false))
      .toDF("k", "side", "hit")
    assert(Stats.twoProportionZ(oneSide, "k", "side", "hit")
      .collect().isEmpty)
  }

  test("exactGroupCdf is a consistent pure-integer CDF: identities " +
    "hold and the median falls out of the pct_x2 column") {
    val rnd = new scala.util.Random(233)
    val rows = Seq.fill(400)((rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
    val cdf = Stats.exactGroupCdf(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val n = g.size.toLong
      g.map(_._2).distinct.foreach { v =>
        val below = g.count(_._2 < v).toLong
        val equal = g.count(_._2 == v).toLong
        assert(cdf((k, v)) == ((below, equal, n, 2 * below + equal)),
          s"k=$k v=$v")
      }
      // the value whose pct_x2 interval straddles n is the lower median
      val s = g.map(_._2).sorted
      val med = s((n.toInt - 1) / 2)
      val (b, e, _, _) = cdf((k, med))
      assert(2 * b < n && n <= 2 * (b + e), s"median straddle k=$k")
    }
  }

  test("spearmanByKey matches brute-force midrank Pearson and hits " +
    "the +1/-1/NaN shapes") {
    val rnd = new scala.util.Random(239)
    val rows = Seq.fill(300)((rnd.nextInt(3).toLong,
      rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val got = Stats.spearmanByKey(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def rank2(vs: Seq[Long]): Map[Long, Long] =
      vs.distinct.map(v => v ->
        (2L * vs.count(_ < v) + vs.count(_ == v))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val (rx, ry) = (rank2(g.map(_._2)), rank2(g.map(_._3)))
      val pairs = g.map(t => (rx(t._2), ry(t._3)))
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
      val (gn, gr) = got(k)
      assert(gn == n, s"k=$k")
      if (vx == 0L || vy == 0L) assert(gr.isNaN, s"k=$k")
      else assert(gr == (n * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)), s"k=$k")
    }
    // monotone increasing -> rho 1; decreasing -> -1; constant y -> NaN
    val inc = (1L to 20L).map(i => (1L, i, i * i)).toDF("k", "x", "y")
    assert(Stats.spearmanByKey(inc, "k", "x", "y")
      .collect().head.getDouble(2) == 1.0)
    val dec = (1L to 20L).map(i => (1L, i, -i * i)).toDF("k", "x", "y")
    assert(Stats.spearmanByKey(dec, "k", "x", "y")
      .collect().head.getDouble(2) == -1.0)
    val const = (1L to 5L).map(i => (1L, i, 7L)).toDF("k", "x", "y")
    assert(Stats.spearmanByKey(const, "k", "x", "y")
      .collect().head.getDouble(2).isNaN)
  }

  test("kendallTauB matches the brute-force pair definition with ties, " +
    "and hits the +1/-1/NaN shapes") {
    val rnd = new scala.util.Random(431)
    // small value ranges force heavy ties on both axes
    val rows = Seq.fill(400)((rnd.nextInt(4).toLong,
      rnd.nextInt(10).toLong, rnd.nextInt(8).toLong))
    val got = Stats.kendallTauB(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val ps = for {
        i <- g.indices; j <- (i + 1) until g.size
      } yield (g(i), g(j))
      val c = ps.count { case ((_, x1, y1), (_, x2, y2)) =>
        (x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2) }.toLong
      val d = ps.count { case ((_, x1, y1), (_, x2, y2)) =>
        (x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2) }.toLong
      val tx = ps.count { case ((_, x1, _), (_, x2, _)) => x1 == x2 }.toLong
      val ty = ps.count { case ((_, _, y1), (_, _, y2)) => y1 == y2 }.toLong
      val n = g.size.toLong
      val n0 = n * (n - 1) / 2
      val (gn, gc, gd, gt) = got(k)
      assert(gn == n && gc == c && gd == d, s"k=$k")
      if (n0 - tx == 0L || n0 - ty == 0L) assert(gt.isNaN, s"k=$k")
      else assert(gt == (c - d).toDouble /
        (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)),
        s"k=$k")
    }
    // perfectly concordant -> +1; reversed -> -1 (up to the operator's
    // fixed sqrt(x)*sqrt(x) IEEE shape, replayed here exactly);
    // constant y -> NaN; single row -> NaN
    val unit = 105.0 / (math.sqrt(105.0) * math.sqrt(105.0)) // n = 15
    val inc = (1L to 15L).map(i => (1L, i, i * 3)).toDF("k", "x", "y")
    assert(Stats.kendallTauB(inc, "k", "x", "y")
      .collect().head.getDouble(4) == unit)
    val dec = (1L to 15L).map(i => (1L, i, -i)).toDF("k", "x", "y")
    assert(Stats.kendallTauB(dec, "k", "x", "y")
      .collect().head.getDouble(4) == -unit)
    val const = (1L to 5L).map(i => (1L, i, 9L)).toDF("k", "x", "y")
    assert(Stats.kendallTauB(const, "k", "x", "y")
      .collect().head.getDouble(4).isNaN)
    val one = Seq((1L, 2L, 3L)).toDF("k", "x", "y")
    val r1 = Stats.kendallTauB(one, "k", "x", "y").collect().head
    assert(r1.getLong(1) == 1L && r1.getLong(2) == 0L &&
      r1.getLong(3) == 0L && r1.getDouble(4).isNaN)
    // the per-key kernel contract is CHECKED
    val e = intercept[IllegalArgumentException] {
      Stats.kendallTauB(inc, "k", "x", "y", maxRowsPerKey = 5L)
    }
    assert(e.getMessage.contains("per-key kernel"))
  }

  test("growthAccounting day-level identity: active(d) = new + " +
    "retained + resurrected, and every churn follows activity") {
    val rnd = new scala.util.Random(113)
    val rows = Seq.fill(500)(
      (rnd.nextInt(10).toLong, (50 + rnd.nextInt(25)).toLong))
    val acc = Stats.growthAccounting(rows.toDF("k", "d"), "k", "d")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val active = rows.distinct.groupBy(_._2).map { case (d, g) =>
      d -> g.map(_._1).distinct.size.toLong
    }
    active.foreach { case (d, n) =>
      val (nw, rt, rs, _) = acc(d)
      assert(nw + rt + rs == n, s"day $d")
    }
    // churned(d) = users active on d-1 and not on d
    val byDay = rows.distinct.groupBy(_._2)
      .map { case (d, g) => d -> g.map(_._1).toSet }
    acc.foreach { case (d, (_, _, _, ch)) =>
      val prev = byDay.getOrElse(d - 1, Set.empty[Long])
      val cur = byDay.getOrElse(d, Set.empty[Long])
      assert((prev -- cur).size.toLong == ch, s"day $d")
    }
  }

  test("spearmanByKey is exact on a hot low-cardinality key whose " +
    "variance products overflow int64 (the decimal(38,0) widening)") {
    import org.apache.spark.sql.functions._
    // 2M rows over 100 distinct values per side: passes the CDF's
    // distinct-value contract trivially, but sxx ~ 4n^3/3 ~ 1.1e19 and
    // n*sxx ~ 2.1e25 — long sums would silently wrap (non-ANSI) or
    // throw mid-query (ANSI); the decimal(38,0) forms stay exact
    val n = 2000000L
    val df = spark.range(n).select(lit(1L).as("k"),
      pmod(col("id"), lit(100L)).as("x"),
      pmod(col("id") * 31L + 7L, lit(100L)).as("y"))
    val got = Stats.spearmanByKey(df, "k", "x", "y").collect().head
    // expected rho from BigInt sufficient statistics over the joint
    // (x, y) histogram — exact midranks, exact sums, one double division
    val xc = new Array[Long](100); val yc = new Array[Long](100)
    val joint = scala.collection.mutable.Map.empty[(Int, Int), Long]
    var i = 0L
    while (i < n) {
      val x = (i % 100L).toInt; val y = ((i * 31L + 7L) % 100L).toInt
      xc(x) += 1; yc(y) += 1
      joint((x, y)) = joint.getOrElse((x, y), 0L) + 1L
      i += 1
    }
    def midranks(c: Array[Long]): Array[BigInt] = {
      var below = 0L
      c.map { cnt => val r = BigInt(2L * below + cnt); below += cnt; r }
    }
    val (rx, ry) = (midranks(xc), midranks(yc))
    var sx = BigInt(0); var sy = BigInt(0); var sxx = BigInt(0)
    var syy = BigInt(0); var sxy = BigInt(0)
    joint.foreach { case ((x, y), cnt) =>
      sx += rx(x) * cnt; sy += ry(y) * cnt
      sxx += rx(x) * rx(x) * cnt; syy += ry(y) * ry(y) * cnt
      sxy += rx(x) * ry(y) * cnt
    }
    val nB = BigInt(n)
    val vx = nB * sxx - sx * sx; val vy = nB * syy - sy * sy
    assert(vx > BigInt(Long.MaxValue),
      "fixture must actually exceed int64 in the variance product")
    val expected = (nB * sxy - sx * sy).toDouble /
      (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
    assert(got.getLong(1) == n)
    assert(got.getDouble(2) == expected, "rho must be bit-exact")
    // and the NEW row-count contract is CHECKED, not documented: a key
    // over the bound fails loudly before any window runs
    val e = intercept[IllegalArgumentException] {
      Stats.spearmanByKey(df, "k", "x", "y", maxRowsPerKey = 1000L)
    }
    assert(e.getMessage.contains("decimal(38,0) exactness"))
  }

  test("groupMoments/groupOls/groupAutocorr drop NULL observations " +
    "consistently (n matches what the sums saw)") {
    import org.apache.spark.sql.functions._
    // 3 clean rows + 2 NULL-x rows: n must be 3, not 5
    val m = Seq((1L, Some(2L)), (1L, None), (1L, Some(4L)), (1L, None),
      (1L, Some(6L))).toDF("k", "x")
    val mr = Stats.groupMoments(m, "k", "x").collect().head
    assert(mr.getLong(1) == 3L && mr.getDouble(2) == 4.0 &&
      mr.getDouble(3) == 8.0 / 3.0)
    // OLS: the NULL-y row drops entirely (not half-counted)
    val o = Seq((1L, 1L, Some(2L)), (1L, 2L, None), (1L, 3L, Some(6L)),
      (1L, 5L, Some(10L))).toDF("k", "x", "y")
    val or = Stats.groupOls(o, "k", "x", "y").collect().head
    assert(or.getLong(1) == 3L && or.getDouble(2) == 2.0 &&
      or.getDouble(3) == 0.0)
    // autocorr: NULL observations leave the series BEFORE pairing, so
    // the surviving values pair up adjacently: (1,2),(2,3),(3,4)
    val a = Seq((1L, 1L, Some(1L)), (1L, 2L, None), (1L, 3L, Some(2L)),
      (1L, 4L, Some(3L)), (1L, 5L, None), (1L, 6L, Some(4L)))
      .toDF("k", "o", "x")
    val ar = Stats.groupAutocorr(a, "k", Seq("o"), "x", 1).collect().head
    // pairs (1,2),(2,3),(3,4): num = 3*20-6*9 = 6, va = vb = 6 — the
    // expected value replays the operator's exact IEEE shape
    assert(ar.getLong(1) == 3L &&
      ar.getDouble(3) == 6.0 / (math.sqrt(6.0) * math.sqrt(6.0)))
  }

  test("twoProportionZ fails loudly on NULL side/hit rows instead of " +
    "silently dropping them") {
    val dirty = Seq((1L, Some(true), Some(true)), (1L, None, Some(false)),
      (1L, Some(false), Some(true))).toDF("k", "side", "hit")
    val e = intercept[Throwable] {
      Stats.twoProportionZ(dirty, "k", "side", "hit").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") +
        messages(t.getCause)
    assert(messages(e).contains("twoProportionZ"))
    val dirtyHit = Seq((1L, Some(true), Some(true)),
      (1L, Some(false), None)).toDF("k", "side", "hit")
    val e2 = intercept[Throwable] {
      Stats.twoProportionZ(dirtyHit, "k", "side", "hit").collect()
    }
    assert(messages(e2).contains("twoProportionZ"))
    // clean input is untouched by the guard branch
    val clean = Seq((1L, true, true), (1L, true, false), (1L, false, true),
      (1L, false, false)).toDF("k", "side", "hit")
    val r = Stats.twoProportionZ(clean, "k", "side", "hit").collect().head
    assert(r.getLong(1) == 2L && r.getLong(3) == 2L && r.getDouble(7) == 0.0)
  }

  test("welchT replays the exact sufficient-statistics shape and agrees " +
    "with a brute-force Welch computation") {
    val rnd = new scala.util.Random(71)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(3).toLong, rnd.nextBoolean(), (rnd.nextInt(2000) + 1).toLong)
    }
    val out = Stats.welchT(rows.toDF("k", "side", "x"), "k", "side", "x")
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L to 2L).foreach { k =>
      val a = rows.filter(r => r._1 == k && r._2).map(_._3)
      val b = rows.filter(r => r._1 == k && !r._2).map(_._3)
      if (a.length > 1 && b.length > 1) {
        val r = out(k)
        val na = a.length.toLong; val nb = b.length.toLong
        val ma = a.sum.toDouble / na.toDouble
        val mb = b.sum.toDouble / nb.toDouble
        val va = (na * a.map(v => v * v).sum - a.sum * a.sum).toDouble /
          (na * (na - 1)).toDouble
        val vb = (nb * b.map(v => v * v).sum - b.sum * b.sum).toDouble /
          (nb * (nb - 1)).toDouble
        val ra = va / na.toDouble; val rb = vb / nb.toDouble
        val se2 = ra + rb
        assert(r.getLong(1) == na && r.getLong(2) == nb)
        assert(r.getDouble(3) == ma && r.getDouble(4) == mb)
        assert(r.getDouble(5) == (ma - mb) / math.sqrt(se2))
        assert(r.getDouble(6) == se2 * se2 /
          (ra * ra / (na - 1).toDouble + rb * rb / (nb - 1).toDouble))
        // sanity: Welch df lies between min(na,nb)-1 and na+nb-2
        assert(r.getDouble(6) >= math.min(na, nb) - 1.0 - 1e-9 &&
          r.getDouble(6) <= na + nb - 2.0 + 1e-9)
      }
    }
    // zero-variance arms: se2 == 0 -> NaN t, not a throw
    val flat = Seq((9L, true, 5L), (9L, true, 5L), (9L, false, 5L),
      (9L, false, 5L)).toDF("k", "side", "x")
    val fr = Stats.welchT(flat, "k", "side", "x").collect().head
    assert(fr.getDouble(5).isNaN && fr.getDouble(6).isNaN)
    // NULL rows fail loudly (the twoProportionZ lazy-checked contract)
    val dirty = Seq((1L, Some(true), Some(3L)), (1L, None, Some(2L)),
      (1L, Some(false), Some(1L)), (1L, Some(true), Some(2L)),
      (1L, Some(false), Some(4L))).toDF("k", "side", "x")
    val e = intercept[Throwable] {
      Stats.welchT(dirty, "k", "side", "x").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") +
        messages(t.getCause)
    assert(messages(e).contains("welchT"))
  }

  test("cupedAdjust computes the pooled theta exactly and the covariate " +
    "shift cancels out of the adjusted delta") {
    val rnd = new scala.util.Random(72)
    // y correlated with x plus arm effect: the CUPED textbook setup
    val rows = (1 to 300).map { _ =>
      val x = (rnd.nextInt(500) + 1).toLong
      val side = rnd.nextBoolean()
      val y = 2 * x + rnd.nextInt(100).toLong + (if (side) 40L else 0L)
      (rnd.nextInt(2).toLong, side, y, x)
    }
    val out = Stats.cupedAdjust(rows.toDF("k", "side", "y", "x"),
      "k", "side", "y", "x").collect().map(r => r.getLong(0) -> r).toMap
    (0L to 1L).foreach { k =>
      val g = rows.filter(_._1 == k)
      val a = g.filter(_._2); val b = g.filterNot(_._2)
      val n = g.length.toLong
      val sx = g.map(_._4).sum; val sy = g.map(_._3).sum
      val sxy = g.map(r => r._4 * r._3).sum
      val sxx = g.map(r => r._4 * r._4).sum
      val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val r = out(k)
      assert(r.getDouble(3) == theta)
      val mxPool = sx.toDouble / n.toDouble
      def arm(s: Seq[(Long, Boolean, Long, Long)]) = {
        val m = s.length.toDouble
        (s.map(_._3).sum.toDouble / m, s.map(_._4).sum.toDouble / m)
      }
      val (mya, mxa) = arm(a); val (myb, mxb) = arm(b)
      assert(r.getDouble(4) == mya - myb)
      val adjA = mya - theta * (mxa - mxPool)
      val adjB = myb - theta * (mxb - mxPool)
      assert(r.getDouble(5) == adjA && r.getDouble(6) == adjB &&
        r.getDouble(7) == adjA - adjB)
      // the point of CUPED: removing the x-explained variance pulls the
      // delta toward the true +40 arm effect (raw delta is noisier)
      assert(math.abs(r.getDouble(7) - 40.0) <= 25.0)
    }
    // zero x-variance: theta undefined -> NaN columns, raw delta intact
    val flat = Seq((5L, true, 10L, 7L), (5L, true, 20L, 7L),
      (5L, false, 12L, 7L), (5L, false, 14L, 7L)).toDF("k", "side", "y", "x")
    val fr = Stats.cupedAdjust(flat, "k", "side", "y", "x").collect().head
    assert(fr.getDouble(3).isNaN && fr.getDouble(7).isNaN &&
      fr.getDouble(4) == 2.0)
  }

  test("trimmedMeans equals the sort-drop-k brute force, winsorized " +
    "equals the clamp brute force, with ties across the cut") {
    val rnd = new scala.util.Random(73)
    (1 to 5).foreach { trial =>
      val rows = (1 to (50 + trial * 37)).map { _ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(12).toLong - 3L)
      }
      val out = Stats.trimmedMeans(rows.toDF("g", "v"), "g", "v", 1L, 10L)
        .collect().map(r => r.getLong(0) -> r).toMap
      (0L to 2L).foreach { k =>
        val vs = rows.filter(_._1 == k).map(_._2).sorted
        val n = vs.length
        val kk = n / 10
        if (n > 2 * kk && n > 0) {
          val kept = vs.slice(kk, n - kk)
          val r = out(k)
          assert(r.getLong(1) == n && r.getLong(2) == kk, s"trial=$trial")
          assert(r.getLong(3) == kept.head && r.getLong(4) == kept.last)
          assert(r.getDouble(5) ==
            kept.sum.toDouble / (n - 2 * kk).toDouble, s"trial=$trial")
          val wins = vs.map(v => math.max(kept.head, math.min(kept.last, v)))
          assert(r.getDouble(6) == wins.sum.toDouble / n.toDouble)
        }
      }
    }
    // k = 0 degenerates to the plain mean for both
    val tiny = Seq((1L, 1L), (1L, 2L), (1L, 9L)).toDF("g", "v")
    val tr = Stats.trimmedMeans(tiny, "g", "v", 1L, 10L).collect().head
    assert(tr.getDouble(5) == 4.0 && tr.getDouble(6) == 4.0)
  }

  test("theilSen equals the brute-force median-of-pairwise-slopes and " +
    "shrugs off the outlier OLS chases") {
    val rnd = new scala.util.Random(74)
    (1 to 5).foreach { trial =>
      val rows = (1 to 60).map { i =>
        (rnd.nextInt(2).toLong, (i + rnd.nextInt(5)).toLong,
          rnd.nextInt(200).toLong)
      }
      val out = Stats.theilSen(rows.toDF("k", "x", "y"), "k", "x", "y")
        .collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val pts = rows.filter(_._1 == k).map(r => (r._2, r._3))
        val slopes = (for {
          i <- pts.indices; j <- pts.indices
          if i < j && pts(i)._1 != pts(j)._1
        } yield (pts(j)._2 - pts(i)._2).toDouble /
          (pts(j)._1 - pts(i)._1).toDouble).sorted
        val m = slopes.length
        val expected = if (m % 2 == 1) slopes(m / 2)
          else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
        val r = out(k)
        assert(r.getLong(1) == pts.length && r.getLong(2) == m)
        assert(r.getDouble(3) == expected, s"trial=$trial k=$k")
      }
    }
    // robustness: a wild outlier barely moves the Theil-Sen slope
    val clean = (1 to 20).map(i => (1L, i.toLong, 3L * i))
    val dirty = clean :+ ((1L, 21L, 100000L))
    val ts = Stats.theilSen(dirty.toDF("k", "x", "y"), "k", "x", "y")
      .collect().head.getDouble(3)
    assert(ts == 3.0)
    // zero x-variance: no slope -> key drops
    val flat = Seq((2L, 5L, 1L), (2L, 5L, 9L)).toDF("k", "x", "y")
    assert(Stats.theilSen(flat, "k", "x", "y").count() == 0L)
    // the O(n^2) kernel bound is CHECKED, not documented
    val wide = (1 to 500).map(i => (1L, i.toLong, i.toLong))
    val e = intercept[IllegalArgumentException] {
      Stats.theilSen(wide.toDF("k", "x", "y"), "k", "x", "y",
        maxRowsPerKey = 100L)
    }
    assert(e.getMessage.contains("theilSen"))
    // kernel-level: past ~65k rows C(n,2) tops Int.MaxValue — the pair
    // count is a Long and the array-capacity require fires BEFORE any
    // allocation (a caller raising maxRowsPerKey cannot reach a
    // NegativeArraySizeException)
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    val n = 66000
    val xs = ArrayData.toArrayData(Array.tabulate(n)(_.toLong))
    val ys = ArrayData.toArrayData(Array.fill(n)(1L))
    val ke = intercept[IllegalArgumentException] {
      graft.functions.TheilSenSlope(Literal(1L), Literal(1L))
        .nullSafeEval(xs, ys)
    }
    assert(ke.getMessage.contains("theil_sen_slope"))
  }

  test("simpsonDiversity: brute parity, degenerate and uniform edges, " +
    "null categories dropped explicitly") {
    val rnd = new scala.util.Random(75)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(3).toLong, s"c${rnd.nextInt(7)}")
    }
    val out = Stats.simpsonDiversity(rows.toDF("g", "cat"), "g", "cat")
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L to 2L).foreach { g =>
      val cs = rows.filter(_._1 == g).groupBy(_._2).map(_._2.size.toLong)
      val n = cs.sum; val sq = cs.map(c => c * c).sum
      val r = out(g)
      assert(r.getLong(1) == n && r.getLong(2) == cs.size &&
        r.getLong(3) == sq)
      assert(r.getDouble(4) == 1.0 - sq.toDouble / (n * n).toDouble)
      assert(r.getDouble(5) == (n * n).toDouble / sq.toDouble)
    }
    // one category -> simpson 0, effective categories exactly 1;
    // perfectly uniform k categories -> effective categories exactly k
    val deg = Seq((1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "x"), (2L, "y"), (2L, "z")).toDF("g", "cat")
    val dr = Stats.simpsonDiversity(deg, "g", "cat")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(dr(1L).getDouble(4) == 0.0 && dr(1L).getDouble(5) == 1.0)
    assert(dr(2L).getDouble(5) == 3.0)
    // null categories drop from n too (n == categorized rows only)
    val dirty = Seq((1L, "a"), (1L, null), (1L, "b")).toDF("g", "cat")
    assert(Stats.simpsonDiversity(dirty, "g", "cat")
      .collect().head.getLong(1) == 2L)
  }

  test("wilsonInterval: exact IEEE-shape parity, sane bounds at the " +
    "edges, NULL outcomes fail loudly") {
    val rnd = new scala.util.Random(76)
    val rows = (1 to 300).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(5) == 0))
    val out = Stats.wilsonInterval(rows.toDF("g", "hit"), "g", "hit")
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L to 3L).foreach { g =>
      val hs = rows.filter(_._1 == g)
      val n = hs.size.toLong; val x = hs.count(_._2).toLong
      val r = out(g)
      val nD = n.toDouble; val p = x.toDouble / nD
      val z = 1.96; val z2 = z * z
      val denom = 1.0 + z2 / nD
      val center = p + z2 / (2.0 * nD)
      val margin = z * math.sqrt(p * (1.0 - p) / nD + z2 / (4.0 * nD * nD))
      assert(r.getLong(1) == n && r.getLong(2) == x)
      assert(r.getDouble(4) == (center - margin) / denom)
      assert(r.getDouble(5) == (center + margin) / denom)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) <= 1.0 &&
        r.getDouble(4) <= p && p <= r.getDouble(5))
    }
    // x = 0 / x = n: Wilson bounds stay strictly inside (0, 1) at the
    // open end — the reason it beats Wald for rare-event segments
    val zero = Seq((1L, false), (1L, false), (1L, false)).toDF("g", "hit")
    val zr = Stats.wilsonInterval(zero, "g", "hit").collect().head
    assert(zr.getDouble(4) == 0.0 && zr.getDouble(5) > 0.0 &&
      zr.getDouble(5) < 1.0)
    val dirty = Seq((1L, Some(true)), (1L, None)).toDF("g", "hit")
    val e = intercept[Throwable] {
      Stats.wilsonInterval(dirty, "g", "hit").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") +
        messages(t.getCause)
    assert(messages(e).contains("wilsonInterval"))
  }

  test("brierDecomposition: exact total Brier, Murphy identity within " +
    "nano resolution, perfect calibration has zero reliability") {
    val rnd = new scala.util.Random(78)
    // forecasts on a coarse grid so groups are meaty
    val rows = (1 to 2000).map { _ =>
      val q = rnd.nextInt(11).toLong * 100000L
      (q, rnd.nextInt(1000000) < q)
    }
    val r = Stats.brierDecomposition(rows.toDF("q", "l"), "q", "l")
      .collect().head
    val n = rows.size.toLong
    val brierExact = rows.map { case (q, l) =>
      val d = if (l) q - 1000000L else q; d * d
    }.sum
    assert(r.getLong(0) == n)
    assert(r.getDouble(2) ==
      BigDecimal(brierExact).toDouble / (n.toDouble * 1e12))
    // Murphy: brier == rel - res + unc, up to the nano quantization of
    // rel/res (each term floor-quantized at 1e-9; groups <= 11)
    val identity = r.getDouble(5) - r.getDouble(6) + r.getDouble(7)
    assert(math.abs(identity - r.getDouble(2)) < 1e-7,
      s"Murphy identity broke: $identity vs ${r.getDouble(2)}")
    // perfectly calibrated forecasts: o_k == p_k exactly -> rel_nano 0
    val cal = Seq.tabulate(10) { i =>
      (1 to 10).map { j => (i.toLong * 100000L, j <= i) }
    }.flatten
    val cr = Stats.brierDecomposition(cal.toDF("q", "l"), "q", "l")
      .collect().head
    assert(cr.getLong(3) == 0L, s"rel_nano=${cr.getLong(3)}")
    // the bounded-forecast contract is CHECKED
    val wide = (1 to 5000).map(i => (i.toLong, i % 2 == 0))
    val e = intercept[IllegalArgumentException] {
      Stats.brierDecomposition(wide.toDF("q", "l"), "q", "l",
        maxDistinctScores = 100L)
    }
    assert(e.getMessage.contains("brierDecomposition"))
  }

  test("cusumAlarms: brute replay parity, sustained drift fires where " +
    "a lone spike cannot, accumulator resets after each alarm") {
    val rnd = new scala.util.Random(79)
    val rows = (1 to 200).map { i =>
      (rnd.nextInt(2).toLong, i.toLong, (40 + rnd.nextInt(30)).toLong)
    }
    val ref = 55L; val h = 60L
    val out = Stats.cusumAlarms(rows.toDF("g", "o", "v"), "g", Seq("o"),
        "v", ref, h)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    (0L to 1L).foreach { g =>
      val xs = rows.filter(_._1 == g).sortBy(_._2).map(_._3)
      var s = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        s = math.max(0L, s + x - ref)
        assert(out((g, i + 1L)) == (s, s >= h), s"g=$g rn=${i + 1}")
        if (s >= h) s = 0L
      }
    }
    // sustained small drift accumulates to an alarm; an equal-mass
    // lone spike inside baseline noise does not
    val drift = (1 to 20).map(i => (1L, i.toLong,
      if (i <= 10) 50L else 58L))
    val dAlarms = Stats.cusumAlarms(drift.toDF("g", "o", "v"), "g",
        Seq("o"), "v", ref = 52L, h = 40L)
      .where(org.apache.spark.sql.functions.col("alarm")).count()
    assert(dAlarms >= 1, "sustained +6 drift must trip the accumulator")
    val spike = (1 to 20).map(i => (1L, i.toLong,
      if (i == 10) 80L else 50L))
    val sAlarms = Stats.cusumAlarms(spike.toDF("g", "o", "v"), "g",
        Seq("o"), "v", ref = 52L, h = 40L)
      .where(org.apache.spark.sql.functions.col("alarm")).count()
    assert(sAlarms == 0, "a lone +28 spike must not trip h = 40")
    // the per-key kernel bound is CHECKED
    val e = intercept[IllegalArgumentException] {
      Stats.cusumAlarms(rows.toDF("g", "o", "v"), "g", Seq("o"), "v",
        ref, h, maxRowsPerKey = 10L)
    }
    assert(e.getMessage.contains("cusumAlarms"))
  }

  test("seasonalNaiveError: brute parity, zero seasonal error on a " +
    "perfectly periodic series, NaN on a flat one") {
    val rnd = new scala.util.Random(80)
    val rows = (1 to 150).map { i =>
      (rnd.nextInt(2).toLong, i.toLong, rnd.nextInt(100).toLong)
    }
    val m = 4
    val out = Stats.seasonalNaiveError(rows.toDF("g", "o", "v"), "g",
        Seq("o"), "v", m)
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L to 1L).foreach { g =>
      val xs = rows.filter(_._1 == g).sortBy(_._2).map(_._3)
      val n = xs.length
      val sadS = (m until n).map(i => math.abs(xs(i) - xs(i - m))).sum
      val sadN = (1 until n).map(i => math.abs(xs(i) - xs(i - 1))).sum
      val r = out(g)
      assert(r.getLong(1) == n && r.getLong(2) == sadS &&
        r.getLong(3) == sadN)
      assert(r.getDouble(4) ==
        (sadS.toDouble / (n - m).toDouble)
          / (sadN.toDouble / (n - 1).toDouble))
    }
    // period-m series: the seasonal naive forecast is PERFECT
    val periodic = (0 until 40).map(i => (1L, i.toLong, (i % m + 1) * 10L))
    val pr = Stats.seasonalNaiveError(periodic.toDF("g", "o", "v"), "g",
      Seq("o"), "v", m).collect().head
    assert(pr.getLong(2) == 0L && pr.getDouble(4) == 0.0)
    // flat series: naive SAD 0 -> NaN, not a throw
    val flat = (0 until 10).map(i => (1L, i.toLong, 7L))
    val fr = Stats.seasonalNaiveError(flat.toDF("g", "o", "v"), "g",
      Seq("o"), "v", m).collect().head
    assert(fr.getDouble(4).isNaN)
    // short keys (n <= m) drop
    val short = (0 until 3).map(i => (1L, i.toLong, i.toLong))
    assert(Stats.seasonalNaiveError(short.toDF("g", "o", "v"), "g",
      Seq("o"), "v", m).count() == 0L)
  }

  test("quantileMap: identity on itself, monotone, matches the " +
    "brute-force min-threshold rule, and normalizes a shifted copy") {
    val rnd = new scala.util.Random(86)
    val refv = Seq.fill(200)((1L, rnd.nextInt(50).toLong))
    val tgtv = Seq.fill(150)((1L, rnd.nextInt(60).toLong))
    val out = Stats.quantileMap(refv.toDF("g", "v"), tgtv.toDF("g", "v"),
        "g", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // brute force: mapped(v) = min va with 2*cumA(va)*nB >= pxB(v)*nA
    val avs = refv.map(_._2).sorted
    val bvs = tgtv.map(_._2).sorted
    val nA = avs.size.toLong; val nB = bvs.size.toLong
    bvs.distinct.foreach { v =>
      val px = 2L * bvs.count(_ < v) + bvs.count(_ == v)
      val expect = avs.distinct.sorted
        .find(va => 2L * avs.count(_ <= va) * nB >= px * nA).get
      assert(out(v) == expect, s"v=$v")
    }
    // monotone in v
    val sortedPairs = out.toSeq.sortBy(_._1).map(_._2)
    assert(sortedPairs == sortedPairs.sorted)
    // mapping a distribution onto ITSELF is the identity on its values
    val self = Stats.quantileMap(refv.toDF("g", "v"), refv.toDF("g", "v"),
        "g", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    self.foreach { case (v, m) => assert(m == v, s"self-map moved $v") }
    // a constant-shifted copy maps back onto the reference scale
    val shifted = refv.map { case (g, v) => (g, v + 1000L) }
    val undo = Stats.quantileMap(refv.toDF("g", "v"),
        shifted.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    undo.foreach { case (v, m) => assert(m == v - 1000L,
      s"shift not undone at $v") }
  }

  test("pearsonByKey equals the closed-form brute computation, drops " +
    "NULL rows from n, and checks the magnitude contract") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 3).flatMap { k =>
      Seq.fill(80)((k.toLong, rnd.nextInt(500).toLong - 250L,
        rnd.nextInt(900).toLong))
    }
    val out = Stats.pearsonByKey(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val n = BigInt(g.size)
      val sx = g.map(r => BigInt(r._2)).sum
      val sy = g.map(r => BigInt(r._3)).sum
      val sxx = g.map(r => BigInt(r._2) * r._2).sum
      val syy = g.map(r => BigInt(r._3) * r._3).sum
      val sxy = g.map(r => BigInt(r._2) * r._3).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      // mirror the operator's exact op order: exact integer -> double
      // once, two sqrts, one division
      val expect = (n * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
      assert(out(k)._1 == g.size && out(k)._2 == expect, s"key $k")
    }
    // zero variance on one axis -> NaN, never a throw
    val flat = Seq((1L, 5L, 1L), (1L, 5L, 2L)).toDF("k", "x", "y")
    assert(Stats.pearsonByKey(flat, "k", "x", "y")
      .collect().head.getDouble(2).isNaN)
    // a NULL on either axis drops the ROW (n must match the sums)
    val dirty = Seq((1L, Some(1L), Some(10L)), (1L, None, Some(99L)),
        (1L, Some(2L), None), (1L, Some(3L), Some(30L)))
      .toDF("k", "x", "y")
    assert(Stats.pearsonByKey(dirty, "k", "x", "y")
      .collect().head.getLong(1) == 2L)
    // the n*B^2 <= 1e19 exactness contract is CHECKED, not documented
    val big = Seq((1L, 4000000000L, 1L), (1L, 1L, 2L)).toDF("k", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Stats.pearsonByKey(big, "k", "x", "y")
    }
    assert(e.getMessage.contains("pearsonByKey"))
  }

  test("vocabGrowth pins the Heaps curve on a planted corpus and " +
    "checks the batch-axis bound") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "a b c"),       // batch 0: 3 tokens, 3 new types
      (1L, "a b"),         // batch 1: 2 tokens, 0 new
      (2L, "c d d"),       // batch 2: 3 tokens, 1 new (d)
      (3L, "e a e")        // batch 3: 3 tokens, 1 new (e)
    ).toDF("batch", "text")
    val out = TextAnalysis.vocabGrowth(docs, "text", "batch")
      .orderBy("batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 3L, 3L, 3L, 3L),
      (1L, 2L, 5L, 0L, 3L),
      (2L, 3L, 8L, 1L, 4L),
      (3L, 3L, 11L, 1L, 5L)))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.vocabGrowth(docs, "text", "batch", maxBatches = 2L)
    }
    assert(e.getMessage.contains("vocabGrowth"))
    // O(delta) fold == full rebuild, at every split point
    val rnd = new scala.util.Random(230)
    val corpus = (0L until 40L).map { i =>
      (i / 8L, Seq.fill(5)(s"w${rnd.nextInt(30)}").mkString(" "))
    }.toDF("batch", "text")
    val full = TextAnalysis.vocabGrowth(corpus, "text", "batch")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    Seq(1L, 3L, 4L).foreach { cut =>
      val hist = corpus.where($"batch" < cut)
      val fresh = corpus.where($"batch" >= cut)
      val delta = TextAnalysis.vocabGrowthDelta(
          TextAnalysis.vocabFirstSeen(hist, "text", "batch"),
          TextAnalysis.vocabBatchTokens(hist, "text", "batch"),
          fresh, "text", "batch")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(delta == full, s"delta != rebuild at cut $cut")
    }
  }

  test("freezeSegments finds exactly the planted static runs with " +
    "half-open eps semantics") {
    import graft.operators.Multimodal
    // frames:      0    1    2    3     4     5     6     7    8
    val series = Seq(100.0, 100.0, 101.0, 5000.0, 5000.0, 5000.0, 9000.0,
      9001.0, 20000.0)
    val df = Seq((1L, series)).toDF("k", "series")
    val got = Multimodal.freezeSegments(df, "k", "series", eps = 1L,
        minFrames = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // runs: frames 0-2 (|d|<=1 twice), 3-5, 6-7; the 8th jumps
    assert(got == Set((0L, 3L), (3L, 3L), (6L, 2L)))
    // minFrames filters the short run
    val got3 = Multimodal.freezeSegments(df, "k", "series", eps = 1L,
        minFrames = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got3 == Set((0L, 3L), (3L, 3L)))
    // eps is inclusive: a move of exactly eps continues the freeze
    val edge = Seq((2L, Seq(0.0, 5.0, 11.0))).toDF("k", "series")
    assert(Multimodal.freezeSegments(edge, "k", "series", 5L, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      == Set((0L, 2L)))
  }

  test("equalFrequencyBuckets: buckets are balanced on distinct " +
    "values, monotone in v, and ties share one bucket") {
    // 100 distinct values, 10 buckets: exactly 10 values per bucket
    val vals = (1L to 100L).map(v => (1L, v))
    val out = Stats.equalFrequencyBuckets(vals.toDF("k", "v"),
        "k", "v", nBuckets = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out.values.groupBy(identity).values.forall(_.size == 10))
    // monotone: higher value never gets a lower bucket
    val sorted = out.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted && sorted.head == 1L
      && sorted.last == 10L)
    // a heavy tie mass lands in ONE bucket (its midrank's), never
    // split across a boundary the way ntile splits it
    val tied = (Seq.fill(70)((2L, 5L)) ++ (1L to 30L).map(v =>
      (2L, 100L + v)))
    val tb = Stats.equalFrequencyBuckets(tied.toDF("k", "v"),
        "k", "v", nBuckets = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // 70 rows at v=5: midrank pct_x2 = 70, n=100 -> bucket 1+700/200=4
    assert(tb(5L) == 4L)
    assert(tb.size == 31)
  }

  test("kaplanMeier matches the brute-force product-limit estimator " +
    "with censoring; contracts fire") {
    val rnd = new scala.util.Random(31)
    val subj = (1 to 2).flatMap { k =>
      Seq.fill(150)((k.toLong, rnd.nextInt(20).toLong, rnd.nextBoolean()))
    }
    val out = Stats.kaplanMeier(subj.toDF("k", "t", "e"), "k", "t", "e")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    subj.groupBy(_._1).foreach { case (k, g) =>
      val times = g.filter(_._3).map(_._2).distinct.sorted
      var s = 1.0
      times.foreach { t =>
        val d = g.count(r => r._2 == t && r._3).toLong
        val n = g.count(_._2 >= t).toLong
        s = s * ((n - d).toDouble / n.toDouble) // the kernel's op order
        val (gd, gn, gs) = out((k, t))
        assert(gd == d && gn == n && gs == s, s"k=$k t=$t")
      }
      // censoring-only times never step the curve
      val evTimes = times.toSet
      g.map(_._2).distinct.filterNot(evTimes).foreach { t =>
        assert(!out.contains((k, t)), s"censor-only time $t stepped")
      }
    }
    // NULL durations are rejected before anything runs
    val dirty = Seq((1L, Some(3L), true), (1L, None, false))
      .toDF("k", "t", "e")
    val e1 = intercept[IllegalArgumentException] {
      Stats.kaplanMeier(dirty, "k", "t", "e")
    }
    assert(e1.getMessage.contains("kaplanMeier"))
    // the duration-histogram bound is CHECKED
    import org.apache.spark.sql.functions.lit
    val wide = spark.range(5000).select(lit(1L).as("k"), $"id".as("t"),
      lit(true).as("e"))
    val e2 = intercept[IllegalArgumentException] {
      Stats.kaplanMeier(wide, "k", "t", "e", maxDistinctPerKey = 100L)
    }
    assert(e2.getMessage.contains("kaplanMeier"))
  }

  test("diffInDiff recovers a planted lift under a shared trend and " +
    "rejects NULL cell assignments") {
    // control: pre mean 100, post mean 140 (shared trend +40)
    // treated: pre mean 200, post mean 290 (trend +40, lift +50)
    val rows =
      Seq.fill(8)((1L, false, false, 100L)) ++
      Seq.fill(4)((1L, false, true, 140L)) ++
      Seq.fill(6)((1L, true, false, 200L)) ++
      Seq.fill(3)((1L, true, true, 290L))
    val out = Stats.diffInDiff(rows.toDF("k", "tr", "po", "v"),
      "k", "tr", "po", "v").collect().head
    assert(out.getLong(1) == 6L && out.getLong(2) == 3L &&
      out.getLong(3) == 8L && out.getLong(4) == 4L)
    assert(out.getDouble(5) == 50.0, s"did=${out.getDouble(5)}")
    // a key missing any of the four cells has no counterfactual
    val missing = Seq((2L, true, true, 5L), (2L, false, true, 5L))
      .toDF("k", "tr", "po", "v")
    assert(Stats.diffInDiff(missing, "k", "tr", "po", "v").count() == 0L)
    // NULL treated/post/value rows fail loudly inside the aggregation
    val dirty = Seq((3L, Some(true), Some(true), Some(1L)),
        (3L, None, Some(false), Some(2L)),
        (3L, Some(false), Some(true), Some(3L)),
        (3L, Some(false), Some(false), Some(4L)),
        (3L, Some(true), Some(false), Some(5L)))
      .toDF("k", "tr", "po", "v")
    val e = intercept[Exception] {
      Stats.diffInDiff(dirty, "k", "tr", "po", "v").collect()
    }
    assert(e.getMessage.contains("diffInDiff")
      || e.getCause != null && e.getCause.getMessage.contains("diffInDiff"))
  }

  test("looTargetEncoding: each row gets the mean of the OTHERS, " +
    "singletons null out, NULL outcomes fail loudly") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 60L),
      (4L, "b", 5L), (5L, "b", 7L), (6L, "c", 99L))
    val out = Stats.looTargetEncoding(rows.toDF("id", "cat", "y"),
        "id", "cat", "y")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L).contains(40.0) && out(2L).contains(35.0) &&
      out(3L).contains(15.0))
    assert(out(4L).contains(7.0) && out(5L).contains(5.0))
    assert(out(6L).isEmpty, "singleton category must encode NULL")
    // the row's own label never leaks into its feature: shifting ONE
    // row's y moves every sibling's encoding but not its own (when the
    // category mean of the others is unchanged)
    val shifted = rows.map { case (i, c, y) =>
      (i, c, if (i == 1L) y + 300L else y) }
    val out2 = Stats.looTargetEncoding(shifted.toDF("id", "cat", "y"),
        "id", "cat", "y")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out2(1L) == out(1L), "own-label leak detected")
    assert(out2(2L) != out(2L) && out2(3L) != out(3L))
    val dirty = Seq((1L, "a", Some(1L)), (2L, "a", None))
      .toDF("id", "cat", "y")
    val e = intercept[IllegalArgumentException] {
      Stats.looTargetEncoding(dirty, "id", "cat", "y")
    }
    assert(e.getMessage.contains("looTargetEncoding"))
    // high-cardinality categorical (every category near-distinct, the
    // case target encoding exists for): works, encodes singletons
    // NULL, and never forces a driver broadcast of the unbounded
    // category table (PlanAuditSpec pins the hint-free plan)
    import org.apache.spark.sql.functions.col
    val hc = (1L to 5000L).map(i => (i, s"cat_$i", i)) :+
      ((5001L, "cat_1", 100L))
    val hout = Stats.looTargetEncoding(hc.toDF("id", "cat", "y"),
      "id", "cat", "y")
    assert(hout.where(col("loo").isNull).count() == 4999L)
    assert(hout.where(col("loo").isNotNull).count() == 2L)
  }

  test("rakePhrases: islands split on stopwords, deg/freq scoring " +
    "surfaces the planted multi-word phrase first") {
    import graft.operators.TextAnalysis
    // "the" is the stopword; "deep neural net" appears twice as an
    // island and must outrank single words (deg rewards long phrases)
    val docs = Seq(
      (1L, "the deep neural net the baseline"),
      (2L, "the deep neural net"),
      (3L, "the baseline the loses")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rakePhrases(docs, "doc_id", "text",
      stopwords = Seq("the"), k = 10).collect()
    val top = out.head
    assert(top.getString(0) == "deep neural net")
    assert(top.getLong(1) == 2L)
    // deg(deep)=deg(neural)=deg(net)=6 over freq 2 each -> 3+3+3
    assert(top.getDouble(2) == 9.0)
    // every phrase is a contiguous non-stopword run: no phrase may
    // contain the stopword
    assert(out.forall(!_.getString(0).split(" ").contains("the")))
  }

  // flattens a nested exception chain into one searchable string — the
  // raise_error checks surface wrapped in SparkRuntimeException layers
  private def chainMessages(t: Throwable): String =
    if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
      chainMessages(t.getCause)

  test("rollingOlsSlope matches the brute trailing-window fit and " +
    "emits only full windows") {
    val rnd = new scala.util.Random(227)
    val rows = (1 to 2).flatMap { k =>
      (1 to 40).map(i => (k.toLong, i.toLong * 10L, i.toLong,
        rnd.nextInt(500).toLong))
    }
    val w = 5
    val out = Stats.rollingOlsSlope(rows.toDF("k", "o", "id", "y"),
        "k", "o", "id", "y", w)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val srt = g.sortBy(r => (r._2, r._3)).zipWithIndex
        .map { case (r, i) => (i + 1L, r._3, r._4) } // (x=rn, id, y)
      srt.foreach { case (x, id, _) =>
        if (x < w) assert(!out.contains((k, id)), "partial window emitted")
        else {
          val win = srt.filter(p => p._1 > x - w && p._1 <= x)
          val n = w.toLong
          val sx = win.map(_._1).sum; val sy = win.map(_._3).sum
          val sxy = win.map(p => p._1 * p._3).sum
          val sxx = win.map(p => p._1 * p._1).sum
          val expect = (n * sxy - sx * sy).toDouble /
            (n * sxx - sx * sx).toDouble
          assert(out((k, id)) == expect, s"k=$k id=$id")
        }
      }
    }
  }

  test("rollingOlsSlope stays exact at value magnitudes the old " +
    "all-long path could not hold, matching a BigInt unrebased " +
    "reference (x-translation invariance)") {
    // |y| ~ 1e15: the rebased decimal path must equal the EXACT BigInt
    // evaluation of the ORIGINAL unrebased formula (n·Σxy − Σx·Σy over
    // true x = 1..n) — pinning both decimal exactness and the
    // translation-invariance identity the rebasing rests on
    val rnd = new scala.util.Random(1227)
    val ys = Vector.fill(30)(rnd.nextLong() % 1000000000000000L)
    val rows = ys.zipWithIndex.map { case (y, i) =>
      (1L, (i + 1).toLong, (i + 1).toLong, y) }
    val w = 7
    val out = Stats.rollingOlsSlope(rows.toDF("k", "o", "id", "y"),
        "k", "o", "id", "y", w)
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(out.size == 30 - w + 1)
    (w to 30).foreach { i =>
      val win = (i - w + 1 to i).map(x => (BigInt(x), BigInt(ys(x - 1))))
      val n = BigInt(w)
      val sx = win.map(_._1).sum; val sy = win.map(_._2).sum
      val sxy = win.map(p => p._1 * p._2).sum
      val sxx = win.map(p => p._1 * p._1).sum
      val expect = (n * sxy - sx * sy).toDouble /
        (n * sxx - sx * sx).toDouble
      assert(out(i.toLong) == expect, s"i=$i")
    }
  }

  test("the decimal sufficient-statistic paths stay exact where a long " +
    "accumulator would wrap (welchT / cupedAdjust / diffInDiff / " +
    "groupMoments / timeWeightedAvg)") {
    // welchT: x ~ 3e9 -> Σx² ≈ 1.8e19 tops int64. t/df are shift-
    // invariant and every double below 2^53 is exact, so the big-value
    // run must equal the small-value run on x − 3e9 bit-for-bit
    val base = 3000000000L
    def wrows(shift: Long) = Seq((1L, true, base + 0L - shift),
      (1L, true, base + 1L - shift), (1L, false, base - 1L - shift),
      (1L, false, base + 2L - shift)).toDF("k", "side", "x")
    val big = Stats.welchT(wrows(0L), "k", "side", "x").collect().head
    val small = Stats.welchT(wrows(base), "k", "side", "x").collect().head
    assert(big.getDouble(5) == small.getDouble(5) &&
      big.getDouble(6) == small.getDouble(6))
    // cupedAdjust: theta's exact integer numerator/denominator are
    // shift-invariant, so the big-value theta must equal the shifted
    // one bit-for-bit; adj_delta mixes big and small doubles (NOT
    // shift-invariant in IEEE), so it's pinned against the exact
    // BigInt -> double cast sequence instead
    def crowsData(shift: Long) = Seq(
      (1L, true, base + 10L - shift, base + 1L - shift),
      (1L, true, base + 30L - shift, base + 3L - shift),
      (1L, false, base + 12L - shift, base + 2L - shift),
      (1L, false, base + 25L - shift, base + 4L - shift))
    def crows(shift: Long) = crowsData(shift).toDF("k", "side", "y", "x")
    val cb = Stats.cupedAdjust(crows(0L), "k", "side", "y", "x")
      .collect().head
    val cs = Stats.cupedAdjust(crows(base), "k", "side", "y", "x")
      .collect().head
    assert(cb.getDouble(3) == cs.getDouble(3))
    locally {
      val g = crowsData(0L)
      val a = g.filter(_._2); val b = g.filterNot(_._2)
      val n = BigInt(g.length)
      val sx = g.map(r => BigInt(r._4)).sum
      val sy = g.map(r => BigInt(r._3)).sum
      val sxy = g.map(r => BigInt(r._4) * BigInt(r._3)).sum
      val sxx = g.map(r => BigInt(r._4) * BigInt(r._4)).sum
      val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val mxPool = sx.toDouble / n.toDouble
      def arm(s: Seq[(Long, Boolean, Long, Long)]) = {
        val m = s.length
        (s.map(r => BigInt(r._3)).sum.toDouble / m.toDouble,
          s.map(r => BigInt(r._4)).sum.toDouble / m.toDouble)
      }
      val (mya, mxa) = arm(a); val (myb, mxb) = arm(b)
      val adjA = mya - theta * (mxa - mxPool)
      val adjB = myb - theta * (mxb - mxPool)
      assert(cb.getDouble(3) == theta && cb.getDouble(7) == adjA - adjB)
    }
    // diffInDiff: two 5e18 rows in one cell -> Σv = 1e19 wraps a long;
    // expected replays the exact BigInt -> double cast sequence
    val v0 = 5000000000000000000L
    val dd = Seq((1L, true, true, v0), (1L, true, true, v0 - 4L),
      (1L, true, false, v0 - 10L), (1L, false, true, v0 - 7L),
      (1L, false, false, v0 - 1L)).toDF("k", "tr", "post", "v")
    val dr = Stats.diffInDiff(dd, "k", "tr", "post", "v").collect().head
    def m(s: BigInt, n: Long) = s.toDouble / n.toDouble
    val expectDid = (m(BigInt(v0) * 2 - 4, 2) - m(BigInt(v0) - 10, 1)) -
      (m(BigInt(v0) - 7, 1) - m(BigInt(v0) - 1, 1))
    assert(dr.getDouble(5) == expectDid)
    // groupMoments: Σx ~ 3e6 -> (Σx)³ ≈ 2.7e19 wraps; BigInt reference
    val xs = Seq(1000000L, 1000003L, 999998L)
    val gm = Stats.groupMoments(xs.map((1L, _)).toDF("k", "x"),
      "k", "x").collect().head
    val n = BigInt(3)
    val s1 = xs.map(BigInt(_)).sum
    val s2 = xs.map(x => BigInt(x) * x).sum
    val s3 = xs.map(x => BigInt(x) * x * x).sum
    val nD = 3.0
    val variance = (n * s2 - s1 * s1).toDouble / (nD * nD)
    val std = math.sqrt(variance)
    val skew = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1).toDouble /
      (nD * nD * nD * std * std * std)
    assert(gm.getDouble(2) == s1.toDouble / nD &&
      gm.getDouble(3) == variance && gm.getDouble(5) == skew)
    // timeWeightedAvg: one 4e18·10 term wraps a long product
    val tv = 4000000000000000000L
    val tw = Stats.timeWeightedAvg(
      Seq((1L, 0L, 1L, tv), (1L, 10L, 2L, 0L)).toDF("k", "ts", "o", "v"),
      "k", "ts", "o", "v").collect().head
    assert(tw.getDouble(2) == (BigInt(tv) * 10).toDouble / 10.0)
    // groupOls: x·y ≈ 9e18 per term — Σxy wraps a long; BigInt ref
    val od = Seq((1L, 3000000000L, 3000000001L),
      (1L, 3000000002L, 2999999997L), (1L, 2999999995L, 3000000004L))
    val or0 = Stats.groupOls(od.toDF("k", "x", "y"), "k", "x", "y")
      .collect().head
    locally {
      val n = BigInt(od.length)
      val sx = od.map(r => BigInt(r._2)).sum
      val sy = od.map(r => BigInt(r._3)).sum
      val sxy = od.map(r => BigInt(r._2) * r._3).sum
      val sxx = od.map(r => BigInt(r._2) * r._2).sum
      val slope = (n * sxy - sx * sy).toDouble /
        (n * sxx - sx * sx).toDouble
      val icpt = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      assert(or0.getDouble(2) == slope && or0.getDouble(3) == icpt)
    }
    // groupAutocorr: m·Σa² ≈ 1.6e19 tops int64 while m·B² = 4e18
    // stays inside the checked envelope; BigInt ref
    val ad = Seq(999999996L, -999999999L, 999999991L, -999999998L,
      999999997L)
    val ar = Stats.groupAutocorr(
      ad.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
        .toDF("k", "o", "x"), "k", Seq("o"), "x", k = 1)
      .collect().head
    locally {
      val pairs2 = ad.zip(ad.tail)
      val m = BigInt(pairs2.length)
      val sa = pairs2.map(p => BigInt(p._1)).sum
      val sb = pairs2.map(p => BigInt(p._2)).sum
      val saa = pairs2.map(p => BigInt(p._1) * p._1).sum
      val sbb = pairs2.map(p => BigInt(p._2) * p._2).sum
      val sab = pairs2.map(p => BigInt(p._1) * p._2).sum
      val va = m * saa - sa * sa
      val vb = m * sbb - sb * sb
      val r = (m * sab - sa * sb).toDouble /
        (math.sqrt(va.toDouble) * math.sqrt(vb.toDouble))
      assert(ar.getLong(2) == sab.toLong && ar.getDouble(3) == r)
    }
  }

  test("the checked magnitude contracts fire loudly instead of " +
    "wrapping (welchT / cupedAdjust / groupMoments / timeWeightedAvg / " +
    "decayedCounts / exactGroupGini / ksStatistic / quantileMap / " +
    "brierDecomposition)") {
    val big = 2000000000000000000L
    // welchT: n·maxAbs(x) = 4·2e18 > 1e18
    assert(chainMessages(intercept[Throwable] {
      Stats.welchT(Seq((1L, true, big), (1L, true, 1L), (1L, false, 1L),
        (1L, false, 2L)).toDF("k", "side", "x"),
        "k", "side", "x").collect()
    }).contains("exactness contract"))
    // cupedAdjust: greatest(|x|, |y|) trips the same bound
    assert(chainMessages(intercept[Throwable] {
      Stats.cupedAdjust(Seq((1L, true, big, 1L), (1L, false, 1L, 1L))
        .toDF("k", "side", "y", "x"),
        "k", "side", "y", "x").collect()
    }).contains("exactness contract"))
    // groupMoments: n·maxAbs(x) = 5e12 > 4e12
    assert(chainMessages(intercept[Throwable] {
      Stats.groupMoments(Seq((1L, 5000000000000L)).toDF("k", "x"),
        "k", "x").collect()
    }).contains("groupMoments"))
    // timeWeightedAvg: 1 row · 5e18 · 5e18 gap > 1e37
    assert(chainMessages(intercept[Throwable] {
      Stats.timeWeightedAvg(Seq((1L, 0L, 1L, 5000000000000000000L),
        (1L, 5000000000000000000L, 2L, 0L)).toDF("k", "ts", "o", "v"),
        "k", "ts", "o", "v").collect()
    }).contains("timeWeightedAvg"))
    // decayedCounts at horizon 62: per-key capacity is ONE event
    assert(chainMessages(intercept[Throwable] {
      Stats.decayedCounts(Seq((1L, 1L), (1L, 2L)).toDF("k", "day"),
        "k", "day", 62).collect()
    }).contains("decayedCounts"))
    // exactGroupGini: n²·maxV = 5e18 > 4e18 (driver-side require)
    assert(chainMessages(intercept[IllegalArgumentException] {
      Stats.exactGroupGini(Seq((1L, 5000000000000000000L)).toDF("k", "x"),
        "k", "x")
    }).contains("exactGroupGini"))
    // ksStatistic: a side past the (test-lowered) per-side row bound
    assert(chainMessages(intercept[IllegalArgumentException] {
      Stats.ksStatistic(Seq((1L, true, 1L), (1L, true, 2L), (1L, true, 3L),
        (1L, false, 2L)).toDF("k", "side", "x"),
        "k", "side", "x", maxRowsPerSide = 2L)
    }).contains("ksStatistic"))
    // quantileMap: reference side past the (test-lowered) bound
    val qa = Seq((1L, 1L), (1L, 2L)).toDF("k", "x")
    assert(chainMessages(intercept[IllegalArgumentException] {
      Stats.quantileMap(qa, qa, "k", "x", maxRowsPerSide = 1L)
    }).contains("quantileMap"))
    // the capacity caps themselves are closed: asking for more than
    // the int64 envelope is rejected up front
    intercept[IllegalArgumentException] {
      Stats.ksStatistic(qa, "k", "x", "x", maxRowsPerSide = 3000000000L)
    }
    // brierDecomposition: forecast above 1e6 micro-prob
    assert(chainMessages(intercept[Throwable] {
      Stats.brierDecomposition(Seq((2000000L, true), (500000L, false))
        .toDF("q", "l"), "q", "l").collect()
    }).contains("micro-prob"))
    // groupOls: n·maxAbs = 2e18 > 1e18
    assert(chainMessages(intercept[Throwable] {
      Stats.groupOls(Seq((1L, big, big)).toDF("k", "x", "y"),
        "k", "x", "y").collect()
    }).contains("groupOls"))
    // groupAutocorr: m·maxAbs² = 8e18 > 4e18
    assert(chainMessages(intercept[Throwable] {
      Stats.groupAutocorr(Seq((1L, 1L, 2000000000L), (1L, 2L, 2000000000L),
        (1L, 3L, 2000000000L)).toDF("k", "o", "x"),
        "k", Seq("o"), "x", k = 1).collect()
    }).contains("groupAutocorr"))
  }

  test("kAnonymityProfile/Violations match a brute reference, with the " +
    "pinned NULL semantics (NULL quasi links; NULL sensitive excluded)") {
    val rnd = new scala.util.Random(235)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(300)((
        if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(6)}",
        rnd.nextInt(4).toLong,
        if (rnd.nextInt(12) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(8).toLong)))
      val df = rows.toDF("qa", "qb", "s")
      val k = 6L
      // brute reference: classes keyed by BOTH quasi values (null is a
      // class value), sensitive distinct excludes nulls
      val classes = rows.groupBy(r => (r._1, r._2)).map { case (key, g) =>
        key -> ((g.size.toLong,
          g.map(_._3).filter(_ != null).distinct.size.toLong))
      }
      val p = Stats.kAnonymityProfile(df, Seq("qa", "qb"), "s", k)
        .collect().head
      val sizes = classes.values.map(_._1)
      assert(p.getLong(0) == 300L)
      assert(p.getLong(1) == classes.size.toLong)
      assert(p.getLong(2) == sizes.min)
      val below = classes.values.filter(_._1 < k)
      assert(p.getLong(3) == below.map(_._1).sum)
      assert(p.getLong(4) == below.size.toLong)
      assert(p.getLong(5) == classes.values.map(_._2).min)
      assert(p.getDouble(6) ==
        below.map(_._1).sum.toDouble / 300.0, s"trial $trial")
      // violations: the sub-k classes, smallest first, key-tiebroken —
      // a prefix of the brute list under the same total order
      val topN = 5
      val v = Stats.kAnonymityViolations(df, Seq("qa", "qb"), "s", k, topN)
        .collect().map(r => (Option(r.getString(0)), r.getLong(1),
          r.getLong(2), r.getLong(3)))
      val expect = classes.toSeq.filter(_._2._1 < k)
        .map { case ((qa, qb), (n, l)) => (Option(qa), qb, n, l) }
        .sortBy { case (qa, qb, n, _) =>
          (n, qa.isDefined, qa.getOrElse(""), qb) }
        .take(topN)
        .map { case (qa, qb, n, l) => (qa, qb, n, l) }
      assert(v.toSeq == expect, s"trial $trial violations")
    }
  }

  test("mannWhitneyZ equals the brute-force pairwise U and tie-corrected " +
    "z, all-tied keys go NaN, NULL rows fail loudly") {
    val rnd = new scala.util.Random(83)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(200)(
        (rnd.nextInt(3).toLong, rnd.nextBoolean(), rnd.nextInt(15).toLong))
      val out = Stats.mannWhitneyZ(rows.toDF("k", "side", "x"),
        "k", "side", "x").collect().map(r => r.getLong(0) -> r).toMap
      (0L to 2L).foreach { k =>
        val a = rows.filter(r => r._1 == k && r._2).map(_._3)
        val b = rows.filter(r => r._1 == k && !r._2).map(_._3)
        if (a.nonEmpty && b.nonEmpty) {
          val r = out(k)
          val u2 = (for (p <- a; n <- b)
            yield if (p > n) 2L else if (p == n) 1L else 0L).sum
          assert(r.getLong(1) == a.length && r.getLong(2) == b.length)
          assert(r.getLong(3) == u2, s"trial=$trial k=$k")
          val na = a.length.toLong; val nb = b.length.toLong
          val n = na + nb
          val t3 = (a ++ b).groupBy(identity).values
            .map { g => val t = g.length.toLong; t * t * t - t }.sum
          val varU = na.toDouble * nb.toDouble / 12.0 *
            ((n + 1).toDouble -
              t3.toDouble / (n.toDouble * (n - 1).toDouble))
          val z = (u2 - na * nb).toDouble / (2.0 * math.sqrt(varU))
          assert(r.getDouble(4) == z, s"trial=$trial k=$k z")
        } else assert(!out.contains(k))
      }
    }
    // every value tied -> sigma_U = 0 exactly -> NaN, not a throw/Inf
    val flat = Seq((9L, true, 7L), (9L, true, 7L), (9L, false, 7L),
      (9L, false, 7L)).toDF("k", "side", "x")
    val fr = Stats.mannWhitneyZ(flat, "k", "side", "x").collect().head
    assert(fr.getLong(3) == 4L && fr.getDouble(4).isNaN)
    // NULL side/value rows fail loudly (the twoProportionZ contract)
    val dirty = Seq((1L, Some(true), Some(3L)), (1L, None, Some(2L)),
      (1L, Some(false), Some(1L))).toDF("k", "side", "x")
    val e = intercept[Throwable] {
      Stats.mannWhitneyZ(dirty, "k", "side", "x").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("mannWhitneyZ"))
  }

  test("conformalBh selects exactly the brute-force BH discovery set " +
    "with exact rational p-values") {
    val rnd = new scala.util.Random(84)
    (1 to 4).foreach { trial =>
      val cal = Seq.fill(150)(rnd.nextInt(40).toLong)
      // shift a slice of the test scores upward so some trials discover
      val tst = (1 to 80).map(i => (i.toLong,
        rnd.nextInt(40).toLong + (if (i % 7 == 0) 35L else 0L)))
      val alphaMicro = 200000L // alpha = 0.2
      val got = Stats.conformalBh(cal.toDF("score"), tst.toDF("id", "score"),
        "id", "score", alphaMicro).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      // brute force: exact rational p per row, textbook BH over sorted p
      val ncal = cal.length.toLong
      val m = tst.length.toLong
      val ps = tst.map { case (id, s) =>
        (id, s, 1L + cal.count(_ >= s).toLong) }
      val sorted = ps.sortBy(_._3)
      val kmax = sorted.zipWithIndex
        .filter { case ((_, _, num), i) =>
          num * m * 1000000L <= (i + 1).toLong * alphaMicro * (ncal + 1) }
        .map(_._2 + 1).lastOption.getOrElse(0)
      val expect =
        if (kmax == 0) Seq.empty
        else {
          val pThr = sorted(kmax - 1)._3
          ps.filter(_._3 <= pThr)
            .map { case (id, s, num) => (id, s, num, ncal + 1) }
            .sortBy(_._1)
        }
      assert(got.toSeq == expect, s"trial=$trial")
    }
    // both-empty guard and NULL-score guard fail loudly
    val e = intercept[Throwable] {
      Stats.conformalBh(Seq.empty[Long].toDF("score"),
        Seq((1L, 2L)).toDF("id", "score"), "id", "score", 100000L)
    }
    assert(Option(e.getMessage).getOrElse("").contains("conformalBh"))
  }

  test("kruskalWallisH equals the brute-force midrank H with tie " +
    "correction, reduces to 0 for one group, NaN when all tied") {
    val rnd = new scala.util.Random(86)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(240)((rnd.nextInt(2).toLong,
        rnd.nextInt(4).toLong, rnd.nextInt(12).toLong))
      val out = Stats.kruskalWallisH(rows.toDF("k", "g", "x"),
        "k", "g", "x").collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { key =>
        val sub = rows.filter(_._1 == key)
        val n = sub.length.toLong
        // doubled midrank of value v: 2*(count below) + (count at) + 1
        val all = sub.map(_._3)
        def r2of(v: Long) =
          2L * all.count(_ < v) + all.count(_ == v) + 1L
        val byG = sub.groupBy(_._2).toSeq.sortBy(_._1)
        val fold = byG.foldLeft(0.0) { case (acc, (_, g)) =>
          val r2 = g.map(r => r2of(r._3)).sum
          acc + (r2.toDouble * r2.toDouble) / (4.0 * g.length.toDouble)
        }
        val t3 = all.groupBy(identity).values
          .map { g => val t = g.length.toLong; t * t * t - t }.sum
        val nD = n.toDouble
        val hRaw = 12.0 / (nD * (nD + 1.0)) * fold - 3.0 * (nD + 1.0)
        val corr = 1.0 - t3.toDouble / (nD * nD * nD - nD)
        val r = out(key)
        assert(r.getLong(1) == n && r.getLong(2) == byG.length.toLong)
        if (corr == 0.0) assert(r.getDouble(3).isNaN)
        else assert(r.getDouble(3) == hRaw / corr, s"trial=$trial k=$key")
      }
    }
    // one group: H == 0 in exact arithmetic (12/(n(n+1)) * n(n+1)^2/4
    // == 3(n+1)); the double shape reproduces it exactly here
    val one = Seq((1L, 0L, 3L), (1L, 0L, 7L), (1L, 0L, 7L), (1L, 0L, 9L))
      .toDF("k", "g", "x")
    val or = Stats.kruskalWallisH(one, "k", "g", "x").collect().head
    assert(or.getLong(2) == 1L && or.getDouble(3) == 0.0)
    // every value tied -> C = 0 -> NaN
    val flat = Seq((1L, 0L, 5L), (1L, 1L, 5L), (1L, 0L, 5L), (1L, 1L, 5L))
      .toDF("k", "g", "x")
    val fr = Stats.kruskalWallisH(flat, "k", "g", "x").collect().head
    assert(fr.getDouble(3).isNaN)
    // NULL group rows fail loudly
    val dirty = Seq((1L, Some(0L), 3L), (1L, None, 2L), (1L, Some(1L), 1L))
      .toDF("k", "g", "x")
    val e = intercept[Throwable] {
      Stats.kruskalWallisH(dirty, "k", "g", "x").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("kruskalWallisH"))
  }

  test("stratifiedSample reproduces the brute-force Hamilton allocation " +
    "and MINSTD pick order; budget always exact; guards fail loudly") {
    val rnd = new scala.util.Random(87)
    (1 to 3).foreach { trial =>
      val rows = (1 to 300).map { i =>
        (s"s${rnd.nextInt(7)}", i.toLong * 13 + rnd.nextInt(5)) }
        .distinct
      val budget = 40L + rnd.nextInt(60)
      val got = Stats.stratifiedSample(rows.toDF("st", "id"),
        "st", "id", budget).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // brute force: Hamilton apportionment then per-stratum hop order
      val n = rows.length.toLong
      val byS = rows.groupBy(_._1).toSeq.sortBy(_._1)
      val base = byS.map { case (s, g) =>
        (s, g, budget * g.length / n, (budget * g.length) % n) }
      val give = (budget - base.map(_._3).sum).toInt
      val boosted = base.sortBy { case (s, _, _, rem) => (-rem, s) }
        .zipWithIndex
        .map { case ((s, g, b, _), i) => (s, g, b + (if (i < give) 1 else 0)) }
      val expect = boosted.flatMap { case (_, g, alloc) =>
        g.sortBy { case (_, id) =>
          ((id % 2147483647L) * 48271L % 2147483647L, id) }
          .take(alloc.toInt)
      }.toSet
      assert(got.size.toLong == budget, s"trial=$trial budget")
      assert(got == expect.map(identity), s"trial=$trial selection")
    }
    // budget beyond the population fails loudly
    val small = Seq(("a", 1L), ("a", 2L)).toDF("st", "id")
    val e = intercept[Throwable] {
      Stats.stratifiedSample(small, "st", "id", 5L)
    }
    assert(Option(e.getMessage).getOrElse("").contains("stratifiedSample"))
    // NULL stratum rejected
    val dirty = Seq((Some("a"), 1L), (None, 2L), (Some("b"), 3L))
      .toDF("st", "id")
    val e2 = intercept[Throwable] {
      Stats.stratifiedSample(dirty, "st", "id", 2L)
    }
    assert(Option(e2.getMessage).getOrElse("").contains("stratifiedSample"))
  }

  test("logRank equals the brute-force hypergeometric accumulation with " +
    "censoring, zero variance goes NaN, NULL rows fail loudly") {
    val rnd = new scala.util.Random(88)
    (1 to 3).foreach { trial =>
      // (key, arm, time, event) — ~30% censored
      val rows = Seq.fill(160)((rnd.nextInt(2).toLong, rnd.nextBoolean(),
        rnd.nextInt(10).toLong, rnd.nextInt(10) < 7))
      val out = Stats.logRank(rows.toDF("k", "arm", "t", "ev"),
        "k", "arm", "t", "ev").collect()
        .map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val sub = rows.filter(_._1 == k)
        val eventTimes = sub.filter(_._4).map(_._3).distinct.sorted
        if (eventTimes.nonEmpty) {
          var e1 = 0.0; var v = 0.0; var o1 = 0L
          eventTimes.foreach { t =>
            val n1 = sub.count(r => r._2 && r._3 >= t).toLong
            val n = sub.count(_._3 >= t).toLong
            val d1 = sub.count(r => r._2 && r._4 && r._3 == t).toLong
            val d = sub.count(r => r._4 && r._3 == t).toLong
            o1 += d1
            e1 += d.toDouble * n1.toDouble / n.toDouble
            if (n > 1L)
              v += d.toDouble * (n1.toDouble / n.toDouble) *
                (1.0 - n1.toDouble / n.toDouble) *
                ((n.toDouble - d.toDouble) / (n.toDouble - 1.0))
          }
          val r = out(k)
          assert(r.getLong(1) == o1, s"trial=$trial k=$k o1")
          assert(r.getDouble(2) == e1, s"trial=$trial k=$k e1")
          assert(r.getDouble(3) == v, s"trial=$trial k=$k v")
          if (v == 0.0) assert(r.getDouble(4).isNaN)
          else assert(r.getDouble(4) ==
            (o1.toDouble - e1) / math.sqrt(v), s"trial=$trial k=$k z")
        } else assert(!out.contains(k))
      }
    }
    // censored rows hold the risk set but never count as events: one
    // event at t=1 with a censored arm-B subject still at risk
    val cs = Seq((1L, true, 1L, true), (1L, false, 3L, false))
      .toDF("k", "arm", "t", "ev")
    val cr = Stats.logRank(cs, "k", "arm", "t", "ev").collect().head
    assert(cr.getLong(1) == 1L && cr.getDouble(2) == 0.5 &&
      cr.getDouble(3) == 0.25 && cr.getDouble(4) == 1.0)
    // all events in a one-arm key -> V = 0 -> NaN
    val single = Seq((2L, true, 1L, true), (2L, true, 2L, true))
      .toDF("k", "arm", "t", "ev")
    val sr = Stats.logRank(single, "k", "arm", "t", "ev").collect().head
    assert(sr.getDouble(4).isNaN)
    // NULL event flag fails loudly
    val dirty = Seq((1L, Some(true), 1L, Some(true)),
      (1L, Some(false), 2L, None)).toDF("k", "arm", "t", "ev")
    val e = intercept[Throwable] {
      Stats.logRank(dirty, "k", "arm", "t", "ev").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("logRank"))
  }

  test("psiByKey equals the brute-force smoothed PSI, identical " +
    "distributions give exactly 0.0, one-sided keys alarm, NULL " +
    "categories fail loudly") {
    val rnd = new scala.util.Random(91)
    (1 to 3).foreach { trial =>
      val a = Seq.fill(120)((rnd.nextInt(2).toLong,
        s"c${rnd.nextInt(5)}"))
      val b = Seq.fill(140)((rnd.nextInt(2).toLong,
        s"c${rnd.nextInt(6)}"))
      val out = Stats.psiByKey(a.toDF("k", "cat"), b.toDF("k", "cat"),
        "k", "cat").collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val ca0 = a.filter(_._1 == k).groupBy(_._2).map { case (c, r) =>
          c -> r.size.toLong }
        val cb0 = b.filter(_._1 == k).groupBy(_._2).map { case (c, r) =>
          c -> r.size.toLong }
        val cats = (ca0.keySet ++ cb0.keySet).toSeq.sorted
        val kk = cats.size.toLong
        val na = ca0.values.sum + kk
        val nb = cb0.values.sum + kk
        var s = BigInt(0)
        cats.foreach { c =>
          val ca = ca0.getOrElse(c, 0L) + 1L
          val cb = cb0.getOrElse(c, 0L) + 1L
          val lnq = math.rint(
            math.log((BigInt(ca) * nb).toDouble /
              (BigInt(cb) * na).toDouble) * 1e6).toLong
          // rint vs HALF_UP differ only at exact .5; test data avoids it
          s += (BigInt(ca) * nb - BigInt(cb) * na) * lnq
        }
        val exp = s.toDouble / (na.toDouble * nb.toDouble) / 1e6
        val r = out(k)
        assert(r.getLong(1) == ca0.values.sum, s"trial=$trial k=$k n_a")
        assert(r.getLong(2) == cb0.values.sum, s"trial=$trial k=$k n_b")
        assert(r.getLong(3) == kk, s"trial=$trial k=$k buckets")
        assert(math.abs(r.getDouble(4) - exp) < 1e-12,
          s"trial=$trial k=$k psi ${r.getDouble(4)} vs $exp")
        assert(r.getDouble(4) >= 0.0, "smoothed PSI is nonnegative")
      }
    }
    // identical multisets -> every cross term is exactly zero
    val same = Seq((1L, "x"), (1L, "x"), (1L, "y")).toDF("k", "cat")
    val z = Stats.psiByKey(same, same, "k", "cat").collect().head
    assert(z.getDouble(4) == 0.0)
    // a key present only in the current side still alarms once it has
    // more than one bucket (a single-bucket key is p = q = 1 -> PSI 0
    // by definition): baseline smooths to uniform over the union
    // buckets, a skewed current distribution diverges from it
    val aOnly = Seq((1L, "x")).toDF("k", "cat")
    val bNew = Seq((1L, "x"), (9L, "z"), (9L, "z"), (9L, "z"),
      (9L, "z"), (9L, "z"), (9L, "z"), (9L, "z"), (9L, "w"))
      .toDF("k", "cat")
    val oneSided = Stats.psiByKey(aOnly, bNew, "k", "cat").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(oneSided.contains(9L) && oneSided(9L).getLong(1) == 0L &&
      oneSided(9L).getDouble(4) > 0.0)
    // NULL category fails loudly
    val dirty = Seq((1L, Some("x")), (1L, None)).toDF("k", "cat")
    val e = intercept[Throwable] {
      Stats.psiByKey(dirty, aOnly, "k", "cat").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("psiByKey"))
  }

  test("jsdByKey equals the brute-force micro-log accumulation, is " +
    "bounded by ln 2, identical distributions give 0, empty sides go " +
    "NaN, NULL categories fail loudly") {
    val rnd = new scala.util.Random(92)
    def lnq(x: Double): Long =
      BigDecimal(math.log(x) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    (1 to 3).foreach { trial =>
      val a = Seq.fill(110)((rnd.nextInt(2).toLong,
        s"c${rnd.nextInt(5)}"))
      val b = Seq.fill(130)((rnd.nextInt(2).toLong,
        s"c${rnd.nextInt(7)}"))
      val out = Stats.jsdByKey(a.toDF("k", "cat"), b.toDF("k", "cat"),
        "k", "cat").collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val ca = a.filter(_._1 == k).groupBy(_._2)
          .map { case (c, r) => c -> r.size.toLong }
        val cb = b.filter(_._1 == k).groupBy(_._2)
          .map { case (c, r) => c -> r.size.toLong }
        val cats = (ca.keySet ++ cb.keySet).toSeq.sorted
        val na = ca.values.sum; val nb = cb.values.sum
        var hm = BigInt(0); var hA = BigInt(0); var hB = BigInt(0)
        val dd = BigInt(2) * BigInt(na) * BigInt(nb)
        cats.foreach { c =>
          val x = ca.getOrElse(c, 0L); val y = cb.getOrElse(c, 0L)
          val u = BigInt(x) * nb + BigInt(y) * na
          if (na > 0 && nb > 0)
            hm += u * (lnq(dd.toDouble) - lnq(u.toDouble))
          if (x > 0) hA += BigInt(x) * (lnq(na.toDouble) - lnq(x.toDouble))
          if (y > 0) hB += BigInt(y) * (lnq(nb.toDouble) - lnq(y.toDouble))
        }
        val haV = hA.toDouble / (na.toDouble * 1e6)
        val hbV = hB.toDouble / (nb.toDouble * 1e6)
        val hmV = hm.toDouble / (2.0 * na.toDouble * nb.toDouble * 1e6)
        val exp = hmV - (haV + hbV) / 2.0
        val r = out(k)
        assert(r.getLong(1) == na && r.getLong(2) == nb &&
          r.getLong(3) == cats.size.toLong, s"trial=$trial k=$k counts")
        assert(math.abs(r.getDouble(4) - haV) < 1e-12, s"$trial/$k h_a")
        assert(math.abs(r.getDouble(5) - hbV) < 1e-12, s"$trial/$k h_b")
        assert(math.abs(r.getDouble(6) - exp) < 1e-12, s"$trial/$k jsd")
        assert(r.getDouble(6) >= -1e-6 &&
          r.getDouble(6) <= math.log(2.0) + 1e-6,
          s"jsd ${r.getDouble(6)} outside [0, ln 2]")
      }
    }
    // identical multisets -> jsd == 0 up to the micro-log quantum
    val same = Seq((1L, "x"), (1L, "x"), (1L, "y")).toDF("k", "cat")
    val z = Stats.jsdByKey(same, same, "k", "cat").collect().head
    assert(math.abs(z.getDouble(6)) < 1e-6)
    // disjoint support -> jsd == ln 2 up to the quantum
    val da = Seq((1L, "x"), (1L, "x")).toDF("k", "cat")
    val db = Seq((1L, "y"), (1L, "y")).toDF("k", "cat")
    val dj = Stats.jsdByKey(da, db, "k", "cat").collect().head
    assert(math.abs(dj.getDouble(6) - math.log(2.0)) < 1e-5)
    // a key empty on one side -> NaN (psiByKey is the alarm there)
    val bOnly = Seq((9L, "z")).toDF("k", "cat")
    val ns = Stats.jsdByKey(da, bOnly, "k", "cat").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(ns(9L).getDouble(4).isNaN && ns(9L).getDouble(6).isNaN)
    // NULL category fails loudly
    val dirty = Seq((1L, Some("x")), (1L, None)).toDF("k", "cat")
    val e = intercept[Throwable] {
      Stats.jsdByKey(dirty, da, "k", "cat").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("jsdByKey"))
  }

  test("weightDiagnostics equals the brute-force Kish ESS, uniform " +
    "weights give efficiency 1, zero mass goes NaN, negative weights " +
    "fail loudly") {
    val rnd = new scala.util.Random(93)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(150)((rnd.nextInt(3).toLong,
        rnd.nextInt(1000).toDouble / 100.0))
      val out = Stats.weightDiagnostics(rows.toDF("k", "w"), "k", "w")
        .collect().map(r => r.getLong(0) -> r).toMap
      (0L to 2L).foreach { k =>
        val ws = rows.filter(_._1 == k)
          .map(r => math.rint(r._2 * 1e6).toLong)
        val s1 = ws.map(BigInt(_)).sum
        val s2 = ws.map(w => BigInt(w) * w).sum
        val r = out(k)
        assert(r.getLong(1) == ws.size.toLong)
        assert(r.getDouble(2) == s1.toDouble / 1e6, s"$trial/$k sum_w")
        val ess = s1.toDouble * s1.toDouble / s2.toDouble
        assert(r.getDouble(3) == ess, s"$trial/$k ess")
        assert(r.getDouble(4) == ess / ws.size.toDouble, s"$trial/$k eff")
        assert(r.getDouble(5) == ws.max.toDouble / s1.toDouble,
          s"$trial/$k share")
      }
    }
    // uniform weights: ESS == n exactly, efficiency == 1
    val uni = Seq.fill(8)((1L, 2.5)).toDF("k", "w")
    val u = Stats.weightDiagnostics(uni, "k", "w").collect().head
    assert(u.getDouble(3) == 8.0 && u.getDouble(4) == 1.0 &&
      u.getDouble(5) == 0.125)
    // one dominant row drives ESS toward 1
    val dom = (Seq((2L, 1000000.0)) ++ Seq.fill(99)((2L, 0.001)))
      .toDF("k", "w")
    val dd = Stats.weightDiagnostics(dom, "k", "w").collect().head
    assert(dd.getDouble(3) < 1.01 && dd.getDouble(5) > 0.999)
    // all-zero mass -> NaN diagnostics
    val z = Stats.weightDiagnostics(Seq((3L, 0.0), (3L, 0.0))
      .toDF("k", "w"), "k", "w").collect().head
    assert(z.getDouble(3).isNaN && z.getDouble(5).isNaN)
    // negative weight fails loudly
    val e = intercept[Throwable] {
      Stats.weightDiagnostics(Seq((1L, 1.0), (1L, -0.5)).toDF("k", "w"),
        "k", "w").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("weightDiagnostics"))
  }

  test("changepointMeanShift equals the brute-force SSE scan with the " +
    "earliest-split tie-break, finds a planted shift, drops 1-row " +
    "keys, NULL rows fail loudly") {
    val rnd = new scala.util.Random(94)
    (1 to 3).foreach { trial =>
      val rows = (0 until 2).flatMap { k =>
        (0 until 40).map(i => (k.toLong, i.toLong,
          rnd.nextInt(20).toLong))
      }
      val out = Stats.changepointMeanShift(rows.toDF("k", "t", "x"),
        "k", "t", "x").collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val xs = rows.filter(_._1 == k).sortBy(r => (r._2, r._3))
        val n = xs.size
        val tot = xs.map(_._3).sum
        var bestF = Double.NegativeInfinity; var bestS = -1
        (1 until n).foreach { s =>
          val a = xs.take(s).map(_._3).sum
          val b = tot - a
          val f = (BigInt(a) * a).toDouble / s.toDouble +
            (BigInt(b) * b).toDouble / (n - s).toDouble
          if (f > bestF) { bestF = f; bestS = s }
        }
        val r = out(k)
        assert(r.getLong(1) == n.toLong && r.getLong(2) == bestS.toLong,
          s"trial=$trial k=$k split")
        assert(r.getLong(3) == xs(bestS - 1)._2, s"trial=$trial k=$k t")
        val a = xs.take(bestS).map(_._3).sum
        assert(r.getDouble(4) == a.toDouble / bestS.toDouble)
        assert(r.getDouble(5) == (tot - a).toDouble / (n - bestS).toDouble)
        assert(r.getDouble(6) ==
          bestF - (BigInt(tot) * tot).toDouble / n.toDouble)
        assert(r.getDouble(6) >= 0.0, "gain is between-segment SS >= 0")
      }
    }
    // a planted level shift is found exactly at the plant
    val planted = (0 until 30).map(i =>
      (5L, i.toLong, if (i < 18) 10L else 50L))
    val p = Stats.changepointMeanShift(planted.toDF("k", "t", "x"),
      "k", "t", "x").collect().head
    assert(p.getLong(2) == 18L && p.getDouble(4) == 10.0 &&
      p.getDouble(5) == 50.0)
    // constant series: every split scores equally -> earliest wins
    val const = (0 until 6).map(i => (6L, i.toLong, 7L))
    val c = Stats.changepointMeanShift(const.toDF("k", "t", "x"),
      "k", "t", "x").collect().head
    assert(c.getLong(2) == 1L && c.getDouble(6) == 0.0)
    // a 1-row key has no candidate split and drops
    val single = Seq((7L, 1L, 3L), (8L, 1L, 4L), (8L, 2L, 5L))
    val so = Stats.changepointMeanShift(single.toDF("k", "t", "x"),
      "k", "t", "x").collect().map(_.getLong(0)).toSet
    assert(so == Set(8L))
    // NULL value fails loudly
    val e = intercept[Throwable] {
      Stats.changepointMeanShift(
        Seq((1L, 1L, Some(2L)), (1L, 2L, None)).toDF("k", "t", "x"),
        "k", "t", "x").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("changepointMeanShift"))
  }

  test("isotonicCalibration equals the brute-force PAVA, preserves " +
    "mass, is monotone, pins the known pooling, NULL rows fail " +
    "loudly") {
    val rnd = new scala.util.Random(95)
    // reference PAVA over a (score, w, y) histogram via repeated
    // leftmost merges (the fit is unique, so this matches any order)
    def pava(h: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      var pools = h.sortBy(_._1)
        .map(b => (b._1, b._1, b._2, b._3)).toVector
      var done = false
      while (!done) {
        val i = (0 until pools.size - 1).find(j =>
          BigInt(pools(j)._4) * pools(j + 1)._3 >
            BigInt(pools(j + 1)._4) * pools(j)._3)
        i match {
          case Some(j) =>
            val m = (pools(j)._1, pools(j + 1)._2,
              pools(j)._3 + pools(j + 1)._3,
              pools(j)._4 + pools(j + 1)._4)
            pools = (pools.take(j) :+ m) ++ pools.drop(j + 2)
          case None => done = true
        }
      }
      pools
    }
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(300)((rnd.nextInt(2).toLong,
        rnd.nextInt(12).toLong, rnd.nextInt(10) < 4))
      val out = Stats.isotonicCalibration(rows.toDF("k", "s", "l"),
        "k", "s", "l").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
        .toMap
      (0L to 1L).foreach { k =>
        val sub = rows.filter(_._1 == k)
        val h = sub.groupBy(_._2).toSeq.map { case (s, rs) =>
          (s, rs.size.toLong, rs.count(_._3).toLong) }
        val exp = pava(h)
        val got = out(k).map(r => (r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
        assert(got == exp, s"trial=$trial k=$k pools")
        // pool indexes are 1..m in score order; rates non-decreasing;
        // mass conserved
        assert(out(k).map(_.getLong(1)).toSeq ==
          (1L to exp.size.toLong))
        val rates = out(k).map(_.getDouble(6)).toSeq
        assert(rates.zip(rates.tail).forall { case (a, b) => a <= b })
        assert(got.map(_._3).sum == sub.size.toLong &&
          got.map(_._4).sum == sub.count(_._3).toLong)
      }
    }
    // the textbook case: rates (1, 0, .5, .25) pool to one block .4
    val known = Seq.fill(2)((9L, 1L, true)) ++ Seq.fill(2)((9L, 2L, false)) ++
      Seq((9L, 3L, true), (9L, 3L, false)) ++
      (Seq((9L, 4L, true)) ++ Seq.fill(3)((9L, 4L, false)))
    val kr = Stats.isotonicCalibration(known.toDF("k", "s", "l"),
      "k", "s", "l").collect()
    assert(kr.length == 1 && kr.head.getLong(2) == 1L &&
      kr.head.getLong(3) == 4L && kr.head.getLong(4) == 10L &&
      kr.head.getLong(5) == 4L && kr.head.getDouble(6) == 0.4)
    // already-monotone input passes through untouched
    val mono = Seq((8L, 1L, false), (8L, 2L, true))
    val mr = Stats.isotonicCalibration(mono.toDF("k", "s", "l"),
      "k", "s", "l").collect().sortBy(_.getLong(1))
    assert(mr.length == 2 && mr(0).getDouble(6) == 0.0 &&
      mr(1).getDouble(6) == 1.0)
    // NULL label fails loudly
    val e = intercept[Throwable] {
      Stats.isotonicCalibration(
        Seq((1L, 1L, Some(true)), (1L, 2L, None)).toDF("k", "s", "l"),
        "k", "s", "l").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("isotonicCalibration"))
  }

  test("holtSmooth equals the brute-force integer Holt recursion, " +
    "locks onto a planted linear ramp, single rows pass through, " +
    "NULL rows fail loudly") {
    val rnd = new scala.util.Random(96)
    val aShift = 2; val gShift = 3
    (1 to 3).foreach { trial =>
      val rows = (0 until 2).flatMap { k =>
        (0 until 50).map(i => (k.toLong, i.toLong,
          rnd.nextInt(2000).toLong - 1000L))
      }
      val out = Stats.holtSmooth(rows.toDF("k", "t", "x"), "k", "t",
        "x", aShift, gShift).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
        .toMap
      (0L to 1L).foreach { k =>
        val xs = rows.filter(_._1 == k).sortBy(_._2).map(_._3)
        var l = xs.head; var b = 0L
        val exp = Seq((xs.head, xs.head, 0L)) ++ xs.tail.map { x =>
          val pred = l + b
          val lN = pred + Math.floorDiv(x - pred, 1L << aShift)
          val bN = b + Math.floorDiv(lN - l - b, 1L << gShift)
          l = lN; b = bN
          (pred, lN, bN)
        }
        val got = out(k).map(r => (r.getLong(4), r.getLong(5),
          r.getLong(6))).toSeq
        assert(got == exp, s"trial=$trial k=$k series")
        assert(out(k).map(_.getLong(3)).toSeq == xs, "x passthrough")
      }
    }
    // a planted linear ramp: the floor-quantized trend converges to
    // within the beta dead zone (the update stalls once the residual
    // quarter drops below 2^gShift, i.e. trend in (m-8, m]) and the
    // forecast then tracks with a CONSTANT lag — steady, not drifting
    val ramp = (0 until 120).map(i => (9L, i.toLong, 1000L + 1000L * i))
    val rr = Stats.holtSmooth(ramp.toDF("k", "t", "x"), "k", "t", "x")
      .collect().sortBy(_.getLong(1))
    val lastRows = rr.takeRight(5)
    assert(lastRows.forall(r =>
      r.getLong(6) > 992L && r.getLong(6) <= 1000L),
      s"trend should land in (992, 1000], got " +
        s"${lastRows.map(_.getLong(6)).toSeq}")
    val lags = lastRows.map(r => r.getLong(3) - r.getLong(4)).toSeq
    assert(lags.distinct.size == 1,
      s"steady-state forecast lag should be constant, got $lags")
    // a single-row key passes through as (x, x, 0)
    val single = Stats.holtSmooth(Seq((1L, 1L, 42L)).toDF("k", "t", "x"),
      "k", "t", "x").collect().head
    assert(single.getLong(4) == 42L && single.getLong(5) == 42L &&
      single.getLong(6) == 0L)
    // NULL value fails loudly
    val e = intercept[Throwable] {
      Stats.holtSmooth(Seq((1L, 1L, Some(2L)), (1L, 2L, None))
        .toDF("k", "t", "x"), "k", "t", "x").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("holtSmooth"))
  }

  test("nelsonAalen equals the brute-force hazard accumulation with " +
    "censoring, exp(-H) tracks survival, NULL rows fail loudly") {
    val rnd = new scala.util.Random(97)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(160)((rnd.nextInt(2).toLong,
        rnd.nextInt(10).toLong, rnd.nextInt(10) < 7))
      val out = Stats.nelsonAalen(rows.toDF("k", "t", "ev"),
        "k", "t", "ev").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(1))).toMap
      (0L to 1L).foreach { k =>
        val sub = rows.filter(_._1 == k)
        val eventTimes = sub.filter(_._3).map(_._2).distinct.sorted
        if (eventTimes.isEmpty) assert(!out.contains(k))
        else {
          var h = 0.0; var vh = 0.0
          val exp = eventTimes.map { t =>
            val n = sub.count(_._2 >= t).toLong
            val d = sub.count(r => r._3 && r._2 == t).toLong
            h += d.toDouble / n.toDouble
            vh += d.toDouble / (n.toDouble * n.toDouble)
            (t, n, d, h, vh)
          }
          val got = out(k).map(r => (r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
          assert(got == exp, s"trial=$trial k=$k hazard path")
        }
      }
    }
    // all events at one time, no censoring: H = 1 exactly at that time
    val one = Seq((5L, 3L, true), (5L, 3L, true))
    val o = Stats.nelsonAalen(one.toDF("k", "t", "ev"), "k", "t", "ev")
      .collect()
    assert(o.length == 1 && o.head.getDouble(4) == 1.0 &&
      o.head.getDouble(5) == 0.5)
    // censored rows hold the risk set but contribute no event rows
    val cs = Seq((6L, 1L, true), (6L, 4L, false))
    val cr = Stats.nelsonAalen(cs.toDF("k", "t", "ev"), "k", "t", "ev")
      .collect()
    assert(cr.length == 1 && cr.head.getLong(2) == 2L &&
      cr.head.getDouble(4) == 0.5)
    // NULL event flag fails loudly
    val e = intercept[Throwable] {
      Stats.nelsonAalen(Seq((1L, 1L, Some(true)), (1L, 2L, None))
        .toDF("k", "t", "ev"), "k", "t", "ev").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("nelsonAalen"))
  }

  test("transitionEntropy equals the brute-force micro-log " +
    "accumulation, deterministic chains give 0, MI is nonnegative " +
    "and 0 for independent streams, NULL states fail loudly") {
    val rnd = new scala.util.Random(98)
    def lnq(v: Double): Long =
      BigDecimal(math.log(v) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(300)((rnd.nextInt(2).toLong,
        s"s${rnd.nextInt(4)}", s"s${rnd.nextInt(4)}"))
      val out = Stats.transitionEntropy(rows.toDF("k", "src", "dst"),
        "k", "src", "dst").collect()
        .map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val sub = rows.filter(_._1 == k)
        val n = sub.size.toLong
        val pairCnt = sub.groupBy(r => (r._2, r._3)).view
          .mapValues(_.size.toLong).toMap
        val srcTot = sub.groupBy(_._2).view.mapValues(_.size.toLong)
        val dstTot = sub.groupBy(_._3).view.mapValues(_.size.toLong)
        var hc = BigInt(0); var hnS = BigInt(0)
        pairCnt.foreach { case ((s, _), c) =>
          hc += BigInt(c) * (lnq(srcTot(s).toDouble) - lnq(c.toDouble)) }
        dstTot.foreach { case (_, dt) =>
          hnS += BigInt(dt) * (lnq(n.toDouble) - lnq(dt.toDouble)) }
        val hcV = hc.toDouble / (n.toDouble * 1e6)
        val hnV = hnS.toDouble / (n.toDouble * 1e6)
        val r = out(k)
        assert(r.getLong(1) == n && r.getLong(2) == pairCnt.size.toLong
          && r.getLong(3) == dstTot.size.toLong, s"$trial/$k counts")
        assert(r.getDouble(4) == hcV, s"$trial/$k h_cond")
        assert(r.getDouble(5) == hnV, s"$trial/$k h_next")
        assert(r.getDouble(6) == hnV - hcV, s"$trial/$k mi")
        assert(r.getDouble(6) >= -1e-6, "MI is nonnegative")
      }
    }
    // a deterministic chain: every src has ONE dst -> H(next|cur) == 0
    // exactly, and all information is in the current state (MI == H)
    val det = Seq((5L, "a", "b"), (5L, "b", "c"), (5L, "c", "a"),
      (5L, "a", "b"))
    val dr = Stats.transitionEntropy(det.toDF("k", "src", "dst"),
      "k", "src", "dst").collect().head
    assert(dr.getDouble(4) == 0.0 && dr.getDouble(6) == dr.getDouble(5))
    // independent uniform stream: dst distribution identical under
    // every src -> conditional == marginal -> MI == 0 exactly
    val ind = for (s <- Seq("a", "b"); d <- Seq("x", "y"))
      yield (6L, s, d)
    val ir = Stats.transitionEntropy(ind.toDF("k", "src", "dst"),
      "k", "src", "dst").collect().head
    assert(ir.getDouble(6) == 0.0)
    // NULL dst fails loudly
    val e = intercept[Throwable] {
      Stats.transitionEntropy(
        Seq((1L, "a", Some("b")), (1L, "b", None)).toDF("k", "src", "dst"),
        "k", "src", "dst").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("transitionEntropy"))
  }

  test("stratifiedAte equals the brute-force post-stratified fold, " +
    "removes a planted mix bias, drops one-armed strata, NULL rows " +
    "fail loudly") {
    val rnd = new scala.util.Random(99)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(240)((rnd.nextInt(2).toLong,
        s"st${rnd.nextInt(4)}", rnd.nextBoolean(),
        rnd.nextInt(400).toLong - 100L))
      val out = Stats.stratifiedAte(rows.toDF("k", "st", "side", "y"),
        "k", "st", "side", "y").collect()
        .map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val sub = rows.filter(_._1 == k)
        val cells = sub.groupBy(_._2).view.mapValues { rs =>
          val a = rs.filter(!_._3); val b = rs.filter(_._3)
          (a.size.toLong, b.size.toLong,
            a.map(r => BigInt(r._4)).sum, b.map(r => BigInt(r._4)).sum)
        }.toMap
        val keptS = cells.filter { case (_, c) => c._1 > 0 && c._2 > 0 }
        val n = keptS.values.map(c => c._1 + c._2).sum
        var ate = 0.0
        keptS.toSeq.sortBy(_._1).foreach { case (_, (na, nb, sa, sb)) =>
          ate += ((na.toDouble + nb.toDouble) / n.toDouble) *
            (sb.toDouble / nb.toDouble - sa.toDouble / na.toDouble)
        }
        val r = out(k)
        assert(r.getLong(1) == n &&
          r.getLong(2) == keptS.size.toLong &&
          r.getLong(3) == (cells.size - keptS.size).toLong,
          s"$trial/$k counts")
        assert(r.getDouble(4) == ate, s"$trial/$k ate")
      }
    }
    // planted mix bias: within every stratum B = A + 10 exactly, but
    // B oversamples the high-mean stratum -> raw_diff is inflated,
    // the post-stratified ATE recovers exactly 10
    val biased =
      Seq.fill(30)((7L, "low", false, 100L)) ++
        Seq.fill(10)((7L, "low", true, 110L)) ++
        Seq.fill(10)((7L, "high", false, 1000L)) ++
        Seq.fill(30)((7L, "high", true, 1010L))
    val br = Stats.stratifiedAte(biased.toDF("k", "st", "side", "y"),
      "k", "st", "side", "y").collect().head
    assert(br.getDouble(4) == 10.0, s"ate should be 10, ${br.getDouble(4)}")
    assert(br.getDouble(5) > 100.0,
      s"raw diff should be mix-inflated, got ${br.getDouble(5)}")
    // a stratum with one arm drops and is counted
    val oneArm = Seq((8L, "a", false, 5L), (8L, "a", true, 7L),
      (8L, "b", true, 9L))
    val or = Stats.stratifiedAte(oneArm.toDF("k", "st", "side", "y"),
      "k", "st", "side", "y").collect().head
    assert(or.getLong(2) == 1L && or.getLong(3) == 1L &&
      or.getDouble(4) == 2.0)
    // a key with zero two-armed strata reports NaN
    val none = Seq((9L, "a", true, 1L))
    val nr = Stats.stratifiedAte(none.toDF("k", "st", "side", "y"),
      "k", "st", "side", "y").collect().head
    assert(nr.getDouble(4).isNaN && nr.getDouble(5).isNaN)
    // NULL side fails loudly
    val e = intercept[Throwable] {
      Stats.stratifiedAte(Seq((1L, "a", Some(true), 1L),
        (1L, "a", None, 2L)).toDF("k", "st", "side", "y"),
        "k", "st", "side", "y").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("stratifiedAte"))
  }

  test("calibrateScores serves each score its pool's rate, clamps " +
    "below-range scores to the first pool, and rides the as-of exec") {
    // training: scores 10/20/30 with rates 0.0 / violation / pooled
    val train = Seq(
      (1L, 10L, false), (1L, 10L, false),            // rate 0
      (1L, 20L, true), (1L, 20L, true),              // rate 1 (pools
      (1L, 30L, true), (1L, 30L, false))             //  with 30: 0.75)
      .toDF("k", "s", "l")
    val pools = Stats.isotonicCalibration(train, "k", "s", "l")
    // serve: in-pool, between-pool (snaps down), above-range (last
    // pool), below-range (clamps to first pool's rate)
    val serve = Seq((1L, 10L), (1L, 25L), (1L, 99L), (1L, 3L))
      .toDF("k", "s")
    val out = Stats.calibrateScores(pools, serve, "k", "s")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(10L) == 0.0)
    assert(out(25L) == 0.75, "between-pool score snaps to prior pool")
    assert(out(99L) == 0.75, "above-range lands in the last pool")
    assert(out(3L) == 0.0, "below-range clamps to the first pool")
    // the serving plan rides the merge as-of exec, no cartesian
    val plan = Stats.calibrateScores(pools, serve, "k", "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoin exec:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("expectedCalibrationError equals the brute-force bin gaps, is " +
    "0 for a perfectly calibrated feed, rejects out-of-range " +
    "forecasts") {
    val rnd = new scala.util.Random(100)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(250)((rnd.nextInt(2).toLong,
        rnd.nextInt(1000001).toLong, rnd.nextBoolean()))
      val out = Stats.expectedCalibrationError(
        rows.toDF("k", "q", "l"), "k", "q", "l", nBuckets = 10)
        .collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val sub = rows.filter(_._1 == k)
        val bins = sub.groupBy(r => math.min(r._2 * 10L / 1000000L, 9L))
        val gaps = bins.toSeq.map { case (_, rs) =>
          val y = rs.count(_._3).toLong
          val sq = rs.map(r => BigInt(r._2)).sum
          (rs.size.toLong, (BigInt(y) * 1000000 - sq).abs)
        }
        val n = sub.size.toLong
        val ece = gaps.map(_._2).sum.toDouble / (n.toDouble * 1e6)
        val mce = gaps.map { case (nb, g) =>
          g.toDouble / (nb.toDouble * 1e6) }.max
        val r = out(k)
        assert(r.getLong(1) == n &&
          r.getLong(2) == bins.size.toLong, s"$trial/$k counts")
        assert(r.getDouble(3) == ece, s"$trial/$k ece")
        assert(r.getDouble(4) == mce, s"$trial/$k mce")
      }
    }
    // a perfectly calibrated bin: forecast 0.5 hits exactly half ->
    // gap 0 -> ECE == 0.0 bit-exactly
    val perfect = Seq((9L, 500000L, true), (9L, 500000L, false))
    val pr = Stats.expectedCalibrationError(perfect.toDF("k", "q", "l"),
      "k", "q", "l").collect().head
    assert(pr.getDouble(3) == 0.0 && pr.getDouble(4) == 0.0)
    // q = 1e6 lands in the top bin, not an 11th
    val top = Seq((8L, 1000000L, true), (8L, 999999L, true))
    val tr = Stats.expectedCalibrationError(top.toDF("k", "q", "l"),
      "k", "q", "l").collect().head
    assert(tr.getLong(2) == 1L)
    // out-of-range forecast fails loudly
    val e = intercept[Throwable] {
      Stats.expectedCalibrationError(
        Seq((1L, 1000001L, true)).toDF("k", "q", "l"),
        "k", "q", "l").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("expectedCalibrationError"))
  }

  test("mannKendall equals the brute-force signed pair walk with tie " +
    "correction, flags a planted monotone drift, constant series go " +
    "NaN, NULL rows fail loudly") {
    val rnd = new scala.util.Random(101)
    (1 to 3).foreach { trial =>
      val rows = (0 until 2).flatMap { k =>
        (0 until 40).map(i => (k.toLong, i.toLong,
          rnd.nextInt(8).toLong))
      }
      val out = Stats.mannKendall(rows.toDF("k", "t", "x"),
        "k", "t", "x").collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val xs = rows.filter(_._1 == k).sortBy(r => (r._2, r._3))
          .map(_._3)
        val n = xs.size
        var s = 0L
        for (i <- 0 until n; j <- i + 1 until n)
          s += java.lang.Long.signum(xs(j) - xs(i))
        val tieV = xs.groupBy(identity).values.map { g =>
          val c = BigInt(g.size)
          c * (c - 1) * (2 * c + 5)
        }.sum
        val vn = BigInt(n) * (n - 1) * (2 * n + 5) - tieV
        val expZ =
          if (vn == 0) Double.NaN
          else if (s > 0) (s.toDouble - 1.0) /
            math.sqrt(vn.toDouble / 18.0)
          else if (s < 0) (s.toDouble + 1.0) /
            math.sqrt(vn.toDouble / 18.0)
          else 0.0
        val r = out(k)
        assert(r.getLong(1) == n.toLong && r.getLong(2) == s,
          s"$trial/$k S")
        if (expZ.isNaN) assert(r.getDouble(3).isNaN)
        else assert(r.getDouble(3) == expZ, s"$trial/$k z")
      }
    }
    // a strictly increasing series: S = C(n,2), z large positive
    val up = (0 until 20).map(i => (5L, i.toLong, i.toLong * 3L))
    val ur = Stats.mannKendall(up.toDF("k", "t", "x"), "k", "t", "x")
      .collect().head
    assert(ur.getLong(2) == 190L && ur.getDouble(3) > 5.0)
    // a constant series: zero variance -> NaN
    val const = (0 until 6).map(i => (6L, i.toLong, 7L))
    val cr = Stats.mannKendall(const.toDF("k", "t", "x"), "k", "t", "x")
      .collect().head
    assert(cr.getLong(2) == 0L && cr.getDouble(3).isNaN)
    // NULL value fails loudly
    val e = intercept[Throwable] {
      Stats.mannKendall(Seq((1L, 1L, Some(2L)), (1L, 2L, None))
        .toDF("k", "t", "x"), "k", "t", "x").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("mannKendall"))
  }

  test("seasonalProfile equals the brute-force centered-window " +
    "residual means, recovers a planted weekly shape net of trend, " +
    "edge rows count but carry no residual") {
    val rnd = new scala.util.Random(102)
    (1 to 3).foreach { trial =>
      val rows = (0 until 2).flatMap { k =>
        (0 until 45).map(i => (k.toLong, i.toLong,
          rnd.nextInt(100).toLong))
      }
      val out = Stats.seasonalProfile(rows.toDF("k", "t", "x"),
        "k", "t", "x", period = 7).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
      (0L to 1L).foreach { k =>
        val xs = rows.filter(_._1 == k).sortBy(_._2).map(_._3)
        val n = xs.size
        (0L until 7L).foreach { pos =>
          val idx = (0 until n).filter(i => i.toLong % 7L == pos)
          val windowed = idx.filter(i => i >= 3 && i < n - 3)
          val rs = windowed.map(i =>
            BigInt(7) * xs(i) - xs.slice(i - 3, i + 4).map(BigInt(_)).sum)
          val r = out((k, pos))
          assert(r.getLong(2) == idx.size.toLong &&
            r.getLong(3) == windowed.size.toLong, s"$trial/$k/$pos n")
          assert(r.getDouble(4) ==
            rs.sum.toDouble / (7.0 * windowed.size.toDouble),
            s"$trial/$k/$pos seasonal")
        }
      }
    }
    // planted: linear trend + weekly bump of +70 on pos 0; the
    // centered-window detrend removes the trend exactly (linear
    // passes through its own centered mean), leaving the bump spread
    // as +70-10 = +60 on pos 0 and -10 elsewhere
    val planted = (0 until 70).map(i => (5L, i.toLong,
      1000L + 3L * i + (if (i % 7 == 0) 70L else 0L)))
    val pr = Stats.seasonalProfile(planted.toDF("k", "t", "x"),
      "k", "t", "x", period = 7).collect()
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(pr(0L) == 60.0, s"bumped weekday: ${pr(0L)}")
    (1L until 7L).foreach(p => assert(pr(p) == -10.0,
      s"flat weekday $p: ${pr(p)}"))
    // seasonal components sum to ~0 across positions by construction
    assert(math.abs(pr.values.sum) < 1e-9)
    // NULL value fails loudly
    val e = intercept[Throwable] {
      Stats.seasonalProfile(Seq((1L, 1L, Some(2L)), (1L, 2L, None))
        .toDF("k", "t", "x"), "k", "t", "x").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("seasonalProfile"))
  }

  test("rankingOverlap equals the brute-force RBO fold, identical " +
    "rankings give 1-ish, disjoint give 0, top changes cost more " +
    "than tail changes") {
    def mk(k: Long, items: Seq[Long]) =
      items.zipWithIndex.map { case (it, i) => (k, it, i.toLong + 1L) }
    def rbo(a: Seq[Long], b: Seq[Long]): Double = {
      val dMax = math.min(a.size, b.size)
      var sum = 0.0; var p9 = 1L; var p10 = 1L
      (1 to dMax).foreach { d =>
        val x = a.take(d).toSet.intersect(b.take(d).toSet).size.toLong
        sum += (p9 * x).toDouble / (p10 * d.toLong).toDouble
        p9 *= 9L; p10 *= 10L
      }
      sum * 0.1
    }
    val rnd = new scala.util.Random(103)
    (1 to 3).foreach { trial =>
      val a = rnd.shuffle((1L to 30L).toList).take(10)
      val b = rnd.shuffle((1L to 30L).toList).take(10)
      val out = Stats.rankingOverlap(
        mk(1L, a).toDF("k", "item", "rank"),
        mk(1L, b).toDF("k", "item", "rank"), "k", "item", "rank", 10)
        .collect().head
      assert(out.getLong(1) == 10L && out.getLong(2) == 10L)
      assert(out.getDouble(3) == rbo(a, b), s"trial $trial")
    }
    val base = (1L to 10L).toSeq
    def one(x: Seq[Long], y: Seq[Long]): Double =
      Stats.rankingOverlap(mk(1L, x).toDF("k", "item", "rank"),
        mk(1L, y).toDF("k", "item", "rank"), "k", "item", "rank", 10)
        .collect().head.getDouble(3)
    val same = one(base, base)
    assert(same > 0.65 && same <= 1.0) // truncated RBO@10 of identity
    assert(one(base, (11L to 20L).toSeq) == 0.0, "disjoint is 0")
    // swapping ranks 1<->2 must hurt more than swapping 9<->10
    val topSwap = one(base, Seq(2L, 1L) ++ (3L to 10L))
    val tailSwap = one(base, (1L to 8L) ++ Seq(10L, 9L))
    assert(topSwap < tailSwap, s"top $topSwap vs tail $tailSwap")
    // k past the exact 10^d int64 weight contract fails loudly, and
    // the kernel itself rejects a deeper array fed directly
    val e = intercept[IllegalArgumentException] {
      Stats.rankingOverlap(mk(1L, base).toDF("k", "item", "rank"),
        mk(1L, base).toDF("k", "item", "rank"), "k", "item", "rank", 20)
    }
    assert(e.getMessage.contains("rankingOverlap"))
    val deep = (1L to 25L).toArray
    val e2 = intercept[Throwable] {
      Seq((deep, deep)).toDF("a", "b")
        .select(graft.functions.rbo_overlap(
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")))
        .collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
        msgs(t.getCause)
    assert(msgs(e2).contains("rbo_overlap"))
  }

  test("cochranArmitage equals the brute-force dose-trend statistic, " +
    "flags a planted monotone dose response, degenerate keys go NaN, " +
    "NULL rows fail loudly") {
    val rnd = new scala.util.Random(104)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(300)((rnd.nextInt(2).toLong,
        rnd.nextInt(5).toLong, rnd.nextInt(10) < 4))
      val out = Stats.cochranArmitage(rows.toDF("k", "w", "hit"),
        "k", "w", "hit").collect().map(r => r.getLong(0) -> r).toMap
      (0L to 1L).foreach { k =>
        val sub = rows.filter(_._1 == k)
        val cells = sub.groupBy(_._2).view.mapValues(rs =>
          (rs.size.toLong, rs.count(_._3).toLong)).toMap
        val n = sub.size.toLong; val y = sub.count(_._3).toLong
        val t = cells.map { case (w, (nj, yj)) =>
          BigInt(w) * (BigInt(yj) * n - BigInt(nj) * y) }.sum
        val s1 = cells.map { case (w, (nj, _)) => BigInt(nj) * w }.sum
        val s2 = cells.map { case (w, (nj, _)) =>
          BigInt(nj) * w * w }.sum
        val v = BigInt(y) * (n - y) * (BigInt(n) * s2 - s1 * s1)
        val expZ =
          if (v <= 0) Double.NaN
          else t.toDouble / math.sqrt(v.toDouble / n.toDouble)
        val r = out(k)
        assert(r.getLong(1) == n && r.getLong(2) == y &&
          r.getLong(3) == cells.size.toLong, s"$trial/$k counts")
        assert(r.getDouble(4) == t.toDouble, s"$trial/$k t")
        if (expZ.isNaN) assert(r.getDouble(5).isNaN)
        else assert(r.getDouble(5) == expZ, s"$trial/$k z")
      }
    }
    // planted monotone dose response: rate = dose/10 -> strongly
    // positive z
    val planted = for (w <- 0L until 5L; i <- 0 until 40)
      yield (7L, w, i.toLong % 10L < w * 2L)
    val pz = Stats.cochranArmitage(planted.toDF("k", "w", "hit"),
      "k", "w", "hit").collect().head.getDouble(5)
    assert(pz > 5.0, s"planted dose response should be strong, got $pz")
    // all hits -> zero variance -> NaN
    val deg = Seq((8L, 1L, true), (8L, 2L, true))
    val dz = Stats.cochranArmitage(deg.toDF("k", "w", "hit"),
      "k", "w", "hit").collect().head
    assert(dz.getDouble(5).isNaN)
    // NULL hit fails loudly
    val e = intercept[Throwable] {
      Stats.cochranArmitage(Seq((1L, 1L, Some(true)), (1L, 2L, None))
        .toDF("k", "w", "hit"), "k", "w", "hit").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("cochranArmitage"))
  }

  test("leadLagCorrelation equals the brute-force per-lag Pearson, " +
    "recovers a planted lead, self-correlation at lag 0 is 1, NULL " +
    "rows fail loudly") {
    val rnd = new scala.util.Random(105)
    def pearson(ps: Seq[(Long, Long)]): Double = {
      val m = ps.size
      if (m < 2) return Double.NaN
      val sx = ps.map(p => BigInt(p._1)).sum
      val sy = ps.map(p => BigInt(p._2)).sum
      val sxy = ps.map(p => BigInt(p._1) * p._2).sum
      val sxx = ps.map(p => BigInt(p._1) * p._1).sum
      val syy = ps.map(p => BigInt(p._2) * p._2).sum
      val d1 = BigInt(m) * sxx - sx * sx
      val d2 = BigInt(m) * syy - sy * sy
      if (d1.signum == 0 || d2.signum == 0) Double.NaN
      else (BigInt(m) * sxy - sx * sy).toDouble /
        (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))
    }
    (1 to 3).foreach { trial =>
      val rows = (0 until 2).flatMap { k =>
        (0 until 30).map(i => (k.toLong, i.toLong,
          rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      }
      val out = Stats.leadLagCorrelation(rows.toDF("k", "t", "x", "y"),
        "k", "t", "x", "y", maxLag = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
      (0L to 1L).foreach { k =>
        val s = rows.filter(_._1 == k).sortBy(_._2)
        val xs = s.map(_._3); val ys = s.map(_._4)
        (-3L to 3L).foreach { lag =>
          val pairs = xs.indices
            .filter(i => i + lag >= 0 && i + lag < ys.size)
            .map(i => (xs(i), ys((i + lag).toInt)))
          val r = out((k, lag))
          assert(r.getLong(2) == pairs.size.toLong,
            s"$trial/$k/$lag pairs")
          val exp = pearson(pairs)
          if (exp.isNaN) assert(r.getDouble(3).isNaN)
          else assert(r.getDouble(3) == exp, s"$trial/$k/$lag r")
        }
      }
    }
    // planted lead: y is exactly x shifted 2 steps later -> the
    // correlation at lag -2 (y_{i-2} == x_i ... i.e. pairing
    // (x_i, y_{i+k}) peaks at k = +2) is exactly 1
    val base = (0 until 40).map(_ => rnd.nextInt(100).toLong)
    val planted2 = (2 until 40).map(i =>
      (9L, i.toLong - 2L, base(i), base(i - 2)))
    val pr = Stats.leadLagCorrelation(
      planted2.toDF("k", "t", "x", "y"), "k", "t", "x", "y", 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // identical overlapped series: num == d1 == d2 exactly, but the
    // fixed shape divides by sqrt(d)*sqrt(d) (1 ulp under d) -> r sits
    // one ulp under 1; it must still dominate every other lag
    assert(pr(2L) > 1.0 - 1e-12, s"planted lead at +2: ${pr(2L)}")
    assert((-3L to 3L).filter(_ != 2L).forall(l => pr(l) < pr(2L)))
    // x vs x: lag 0 is exactly 1
    val self = (0 until 20).map(i => (8L, i.toLong,
      rnd.nextInt(30).toLong))
    val sr = Stats.leadLagCorrelation(
      self.map(r => (r._1, r._2, r._3, r._3)).toDF("k", "t", "x", "y"),
      "k", "t", "x", "y", 2).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(sr(0L) > 1.0 - 1e-12)
    // NULL metric fails loudly
    val e = intercept[Throwable] {
      Stats.leadLagCorrelation(
        Seq((1L, 1L, 2L, Some(3L)), (1L, 2L, 4L, None))
          .toDF("k", "t", "x", "y"), "k", "t", "x", "y").collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("leadLagCorrelation"))
  }

  test("ebShrinkRates equals the brute-force beta-binomial MoM, " +
    "shrinks low-traffic items more, passes degenerate keys through, " +
    "NULL rows fail loudly") {
    val rnd = new scala.util.Random(106)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(400)((rnd.nextInt(2).toLong,
        rnd.nextInt(20).toLong, rnd.nextInt(10) < 3))
      val out = Stats.ebShrinkRates(rows.toDF("k", "i", "hit"),
        "k", "i", "hit").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
      (0L to 1L).foreach { k =>
        val cells = rows.filter(_._1 == k).groupBy(_._2).view
          .mapValues(rs => (rs.size.toLong, rs.count(_._3).toLong))
          .toMap
        val items = cells.keys.toSeq.sorted
        var sr = 0.0; var srr = 0.0
        items.foreach { i =>
          val (n, y) = cells(i)
          val r = y.toDouble / n.toDouble
          sr += r; srr += r * r
        }
        val cnt = items.size.toDouble
        val m = sr / cnt
        val v = srr / cnt - m * m
        val s0 = if (v > 0.0) m * (1.0 - m) / v - 1.0 else 0.0
        val s = if (s0 > 0.0) s0 else 0.0
        items.foreach { i =>
          val (n, y) = cells(i)
          val raw = y.toDouble / n.toDouble
          val exp = if (s > 0.0) (y.toDouble + m * s) / (n.toDouble + s)
            else raw
          val r = out((k, i))
          assert(r.getLong(2) == n && r.getLong(3) == y)
          assert(r.getDouble(4) == raw && r.getDouble(5) == exp,
            s"$trial/$k/$i shrunk")
          assert(r.getDouble(6) == m && r.getDouble(7) == s)
        }
      }
    }
    // a 1/1 item shrinks toward the prior far more than a 50/100 item
    // with the same raw rate distance
    val mix = Seq.fill(60)((5L, 1L, false)) ++ Seq.fill(40)((5L, 1L, true)) ++
      Seq.fill(70)((5L, 2L, false)) ++ Seq.fill(30)((5L, 2L, true)) ++
      Seq((5L, 3L, true)) // 1/1 = raw 100%
    val mr = Stats.ebShrinkRates(mix.toDF("k", "i", "hit"),
      "k", "i", "hit").collect()
      .map(r => r.getLong(1) -> r).toMap
    val tiny = mr(3L)
    assert(tiny.getDouble(4) == 1.0 &&
      tiny.getDouble(5) < 0.8 && tiny.getDouble(5) > tiny.getDouble(6),
      s"1/1 item should shrink hard toward the prior: ${tiny.getDouble(5)}")
    val heavy = mr(1L)
    assert(math.abs(heavy.getDouble(5) - heavy.getDouble(4)) <
      math.abs(tiny.getDouble(5) - tiny.getDouble(4)),
      "heavy item moves less than the 1/1 item")
    // all items share one rate -> zero variance -> no shrinkage
    val flat = Seq((6L, 1L, true), (6L, 1L, false),
      (6L, 2L, true), (6L, 2L, false))
    val fr = Stats.ebShrinkRates(flat.toDF("k", "i", "hit"),
      "k", "i", "hit").collect()
    assert(fr.forall(r => r.getDouble(5) == r.getDouble(4) &&
      r.getDouble(7) == 0.0))
    // NULL hit fails loudly
    val e = intercept[Throwable] {
      Stats.ebShrinkRates(Seq((1L, 1L, Some(true)), (1L, 2L, None))
        .toDF("k", "i", "hit"), "k", "i", "hit").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("ebShrinkRates"))
  }

  test("giniByKey equals the brute-force sorted-rank Gini, zero mass " +
    "goes NaN, negative values fail loudly") {
    val rnd = new scala.util.Random(85)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(250)(
        (rnd.nextInt(3).toLong, rnd.nextInt(50).toLong))
      val out = Stats.giniByKey(rows.toDF("k", "x"), "k", "x")
        .collect().map(r => r.getLong(0) -> r).toMap
      (0L to 2L).foreach { k =>
        val xs = rows.filter(_._1 == k).map(_._2).sorted
        if (xs.nonEmpty) {
          val r = out(k)
          val n = xs.length.toLong
          val sx = xs.sum
          assert(r.getLong(1) == n && r.getLong(2) == sx)
          if (sx == 0L) assert(r.getDouble(3).isNaN)
          else {
            val s2 = xs.zipWithIndex
              .map { case (x, i) => BigInt(2) * (i + 1) * x }.sum
            val g = BigDecimal(s2 - BigInt(n + 1) * sx).toDouble /
              BigDecimal(BigInt(n) * sx).toDouble
            assert(r.getDouble(3) == g, s"trial=$trial k=$k")
          }
        }
      }
    }
    // all-zero mass -> NaN
    val z = Stats.giniByKey(Seq((1L, 0L), (1L, 0L)).toDF("k", "x"),
      "k", "x").collect().head
    assert(z.getLong(1) == 2L && z.getDouble(3).isNaN)
    // negative values rejected (Gini undefined over mixed-sign mass)
    val e = intercept[Throwable] {
      Stats.giniByKey(Seq((1L, -3L), (1L, 5L)).toDF("k", "x"), "k", "x")
        .collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("giniByKey"))
  }

  test("weightedSampleExact equals the global-sort reference, degrades " +
    "to uniform under constant weights, and checks its contracts") {
    import graft.operators.Stats
    import graft.functions.md5_long
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(66)
    (1 to 3).foreach { trial =>
      val rows = (0L until 150L).map(i => (i, 1L + rnd.nextInt(1000).toLong))
      val df = rows.toDF("id", "w")
      val n = 1 + rnd.nextInt(30)
      val got = Stats.weightedSampleExact(df, "id", "w", n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      // reference: the SAME key expression through a global sort+limit
      // (a different physical plan must select the identical rows)
      val key = round(log((md5_long(col("id").cast("string")) + 1L)
        .cast("double") / lit(1152921504606846976.0)) * 1e6, 0)
        .cast("long").cast("double") / col("w").cast("double")
      val want = df.select(col("id"), col("w"), key.as("k"))
        .orderBy(col("k").desc, col("id").desc).limit(n)
        .collect().zipWithIndex.map { case (r, i) =>
          (i + 1L, r.getLong(0), r.getLong(1), r.getDouble(2)) }
      assert(got.toSeq == want.toSeq, s"trial $trial n=$n")
      // exact size, no replacement
      assert(got.length == n && got.map(_._2).distinct.length == n)
    }
    // constant weights -> the uniform deterministic top-n by hash key
    val const = (0L until 60L).map(i => (i, 7L)).toDF("id", "w")
    val u = Stats.weightedSampleExact(const, "id", "w", 10)
      .collect().map(_.getLong(1)).toSet
    val uniform = const.select(col("id"),
        (round(log((md5_long(col("id").cast("string")) + 1L)
          .cast("double") / lit(1152921504606846976.0)) * 1e6, 0))
          .as("lq"))
      .orderBy(col("lq").desc, col("id").desc).limit(10)
      .collect().map(_.getLong(0)).toSet
    assert(u == uniform, "constant weights must reduce to uniform top-n")
    // population < n returns everything
    assert(Stats.weightedSampleExact(const.limit(4), "id", "w", 10)
      .count() == 4L)
    // contracts: weight <= 0, duplicate ids
    val e1 = intercept[Throwable] {
      Stats.weightedSampleExact(Seq((1L, 0L)).toDF("id", "w"),
        "id", "w", 2).collect()
    }
    assert(Option(e1.getMessage).getOrElse("")
      .contains("weightedSampleExact"))
    val e2 = intercept[Throwable] {
      Stats.weightedSampleExact(Seq((1L, 3L), (1L, 5L)).toDF("id", "w"),
        "id", "w", 2).collect()
    }
    assert(Option(e2.getMessage).getOrElse("").contains("duplicate"))
  }

  test("noisyCounts releases count + inverse-CDF Laplace noise exactly " +
    "as the brute md5 reference; deterministic; NULL keys rejected") {
    import graft.operators.Stats
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val rows = (0 until 300).map(i => (s"src${i % 7}", s"u$i"))
    val df = rows.toDF("source", "uid")
    val epsMicro = 250000L // eps = 0.25 -> scale 4
    val got = Stats.noisyCounts(df, Seq("source"), epsMicro)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val u = (md5Long(k) + 1L).toDouble / 1152921504606846976.0
      val arg = math.max(1.0 - 2.0 * math.abs(u - 0.5),
        8.673617379884035e-19)
      val lap = (-math.signum(u - 0.5) *
        BigDecimal(math.log(arg) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
      val noise = lap * 1000000L / epsMicro
      val want = (g.size.toLong, noise, g.size.toLong * 1000000L + noise)
      assert(got(k) == want, s"key=$k: ${got(k)} != $want")
    }
    // noise must actually perturb and go both ways across keys
    assert(got.values.exists(_._2 > 0L) && got.values.exists(_._2 < 0L),
      s"noise never fired both directions: $got")
    // deterministic: a re-run releases the identical values
    val again = Stats.noisyCounts(df, Seq("source"), epsMicro)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == got)
    // larger epsilon -> never larger |noise| (scale shrinks)
    val tight = Stats.noisyCounts(df, Seq("source"), 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    tight.foreach { case (k, nz) =>
      assert(math.abs(nz) <= math.abs(got(k)._2), s"key=$k")
    }
    // NULL keys fail loudly
    val e = intercept[Throwable] {
      Stats.noisyCounts(Seq((Option.empty[String], 1L),
          (Some("a"), 2L)).toDF("k", "v"), Seq("k"), epsMicro)
        .collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("noisyCounts"))
  }

  test("splitAssign matches the brute bucket walk, co-assigns duplicate " +
    "ids, redraws under a new salt, and validates its ladder") {
    import graft.operators.Stats
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val splits = Seq("train" -> 800000L, "val" -> 100000L,
      "test" -> 100000L)
    val df = (0L until 1000L).toDF("id")
    val got = Stats.splitAssign(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 1000L).foreach { i =>
      val b = md5Long(s"$i:v1") % 1000000L
      val want = if (b < 800000L) "train" else if (b < 900000L) "val"
        else "test"
      assert(got(i) == want, s"id=$i")
    }
    // every split is populated at this size and roughly proportional
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes("train") > 700 && sizes("val") > 50 && sizes("test") > 50)
    // duplicate ids co-assign
    val dup = Stats.splitAssign(Seq(7L, 7L, 7L).toDF("id"), "id", splits)
      .collect().map(_.getString(1)).distinct
    assert(dup.length == 1)
    // a different salt redraws at least one assignment
    val redrawn = Stats.splitAssign(df, "id", splits, salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redrawn != got)
    // ladder contracts: sum != 1e6, dup names, non-positive fraction
    intercept[IllegalArgumentException] {
      Stats.splitAssign(df, "id", Seq("a" -> 500000L, "b" -> 400000L))
    }
    intercept[IllegalArgumentException] {
      Stats.splitAssign(df, "id", Seq("a" -> 500000L, "a" -> 500000L))
    }
    intercept[IllegalArgumentException] {
      Stats.splitAssign(df, "id",
        Seq("a" -> 1100000L, "b" -> -100000L))
    }
  }

  test("poissonBootstrapCI equals the brute md5-ladder reference and " +
    "covers the true mean on well-behaved keys") {
    import graft.operators.Stats
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val cdf = {
      val e = math.exp(-1.0); var term = e
      val a = new Array[Double](8); a(0) = e
      (1 until 8).foreach { k => term = term / k; a(k) = a(k - 1) + term }
      a
    }
    def pw(id: String, r: Int): Long = {
      val u = (md5Long(s"$id:$r") + 1L).toDouble / 1152921504606846976.0
      val k = cdf.indexWhere(u < _)
      if (k < 0) 8L else k.toLong
    }
    val rnd = new scala.util.Random(12)
    val rows = (0L until 400L).map(i =>
      (i % 3, i, 100L + rnd.nextInt(41).toLong)) // mean ~ 120 per key
    val df = rows.toDF("k", "id", "x")
    val R = 40
    val got = Stats.poissonBootstrapCI(df, "k", "id", "x", R)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val means = (0 until R).flatMap { r =>
        val ws = g.map(t => (pw(t._2.toString, r), t._3))
        val sw = ws.map(_._1).sum
        if (sw == 0L) None
        else Some(ws.map(t => t._1 * t._2).sum.toDouble / sw.toDouble)
      }.sorted
      val rp = means.length
      val want = (g.size.toLong,
        g.map(_._3).sum.toDouble / g.size.toDouble,
        rp.toLong,
        means(math.ceil(rp * 0.05).toInt - 1),
        means(math.ceil(rp * 0.95).toInt - 1))
      assert(got(k) == want, s"k=$k: ${got(k)} != $want")
      // the 90% interval contains the plain mean on this tame fixture
      assert(want._4 <= want._2 && want._2 <= want._5, s"k=$k coverage")
    }
  }

  test("prCurve equals the brute per-threshold confusion sweep; " +
    "all-negative keys drop; NULL rows rejected") {
    import graft.operators.Stats
    val rnd = new scala.util.Random(41)
    val rows = (1 to 2).flatMap { k =>
      Seq.fill(300)((k.toLong, rnd.nextInt(20).toLong,
        rnd.nextDouble() < 0.3 + 0.02 * k))
    } ++ Seq.fill(40)((9L, rnd.nextInt(20).toLong, false)) // no positives
    val got = Stats.prCurve(rows.toDF("k", "s", "y"), "k", "s", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(!got.keySet.exists(_._1 == 9L), "zero-positive key must drop")
    rows.groupBy(_._1).filter(_._2.exists(_._3)).foreach { case (k, g) =>
      val pos = g.count(_._3).toLong
      g.map(_._2).distinct.foreach { t =>
        val pp = g.count(_._2 >= t).toLong
        val tp = g.count(r => r._2 >= t && r._3).toLong
        val want = (tp, pp - tp, pos - tp,
          tp.toDouble / pp.toDouble, tp.toDouble / pos.toDouble,
          2.0 * tp.toDouble / (pp + pos).toDouble)
        assert(got((k, t)) == want, s"k=$k t=$t: ${got((k, t))} != $want")
      }
      assert(got.keySet.count(_._1 == k) == g.map(_._2).distinct.size)
    }
    intercept[Throwable] {
      Stats.prCurve(Seq((1L, Option.empty[Long], true),
          (1L, Some(3L), true)).toDF("k", "s", "y"), "k", "s", "y")
        .collect()
    }
  }

  test("cohenKappa equals the brute marginal-product formula; constant " +
    "identical raters -> NaN; NULL ratings rejected") {
    val rnd = new scala.util.Random(57)
    val cats = Array("a", "b", "c", "d")
    val rows = (1 to 3).flatMap { k =>
      Seq.fill(200)((k.toLong, cats(rnd.nextInt(4)), cats(rnd.nextInt(3))))
    }
    val got = Stats.cohenKappa(rows.toDF("k", "r1", "r2"), "k", "r1", "r2")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val n = g.size.toLong
      val agree = g.count(r => r._2 == r._3).toLong
      val p = (cats ++ Seq("x")).map { c =>
        BigInt(g.count(_._2 == c)) * BigInt(g.count(_._3 == c))
      }.sum
      val kappa = (BigInt(n) * agree - p).toDouble /
        (BigInt(n) * n - p).toDouble
      assert(got(k) == ((n, agree, agree.toDouble / n.toDouble,
        p.toDouble / (n * n).toDouble, kappa)), s"k=$k")
    }
    // pe = 1: both raters constant and identical -> 0/0 -> NaN
    val const = Seq.fill(10)((1L, "a", "a")).toDF("k", "r1", "r2")
    assert(Stats.cohenKappa(const, "k", "r1", "r2")
      .collect().head.getDouble(5).isNaN)
    intercept[Throwable] {
      Stats.cohenKappa(Seq((1L, "a", Option.empty[String]),
          (1L, "b", Some("b"))).toDF("k", "r1", "r2"), "k", "r1", "r2")
        .collect()
    }
  }

  test("fleissKappa equals the brute per-item agreement formula; " +
    "mixed rating counts and r=1 rejected") {
    val rnd = new scala.util.Random(58)
    val cats = Array("x", "y", "z")
    // key 1: 40 items x 5 raters; key 2: 30 items x 3 raters
    val rows = (1 to 40).flatMap(i => Seq.fill(5)(
      (1L, i.toLong, cats(rnd.nextInt(3))))) ++
      (1 to 30).flatMap(i => Seq.fill(3)(
        (2L, i.toLong, cats(rnd.nextInt(2)))))
    val got = Stats.fleissKappa(rows.toDF("k", "item", "cat"),
        "k", "item", "cat")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val items = g.groupBy(_._2)
      val bigN = items.size.toLong
      val r = g.size.toLong / bigN
      val s = items.values.map(it => cats.map(c =>
        BigInt(it.count(_._3 == c)).pow(2)).sum).sum
      val t2 = cats.map(c => BigInt(g.count(_._3 == c)).pow(2)).sum
      val nr = BigInt(bigN) * r
      val pbar = (s - nr).toDouble / (nr * (r - 1)).toDouble
      val pe = t2.toDouble / (nr * nr).toDouble
      val kappa = ((s - nr) * nr * nr - nr * (r - 1) * t2).toDouble /
        (nr * (r - 1) * (nr * nr - t2)).toDouble
      assert(got(k) == ((bigN, r, pbar, pe, kappa)), s"k=$k")
    }
    val mixed = (Seq.fill(3)((1L, 1L, "x")) ++ Seq.fill(4)((1L, 2L, "y")))
      .toDF("k", "item", "cat")
    val e1 = intercept[IllegalArgumentException] {
      Stats.fleissKappa(mixed, "k", "item", "cat").collect()
    }
    assert(e1.getMessage.contains("differing rating counts"))
    val single = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k", "item", "cat")
    val e2 = intercept[IllegalArgumentException] {
      Stats.fleissKappa(single, "k", "item", "cat").collect()
    }
    assert(e2.getMessage.contains("r >= 2"))
  }

  test("fairnessAudit equals the brute confusion sweep with truncating " +
    "micro rates; empty denominators -> NULL; non-binary rejected") {
    val rnd = new scala.util.Random(59)
    val rows = (1 to 4).flatMap { g =>
      Seq.fill(150)((s"g$g", rnd.nextInt(2).toLong, rnd.nextInt(2).toLong))
    } ++ Seq.fill(20)(("g9", 1L, rnd.nextInt(2).toLong)) // no negatives
    val got = Stats.fairnessAudit(rows.toDF("g", "label", "pred"),
        "g", "label", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val otp = rows.count(r => r._2 == 1 && r._3 == 1).toLong
    val ofp = rows.count(r => r._2 == 0 && r._3 == 1).toLong
    val ofn = rows.count(r => r._2 == 1 && r._3 == 0).toLong
    val otn = rows.count(r => r._2 == 0 && r._3 == 0).toLong
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val r = got(g)
      val tp = rs.count(x => x._2 == 1 && x._3 == 1).toLong
      val fp = rs.count(x => x._2 == 0 && x._3 == 1).toLong
      val fn = rs.count(x => x._2 == 1 && x._3 == 0).toLong
      val tn = rs.count(x => x._2 == 0 && x._3 == 0).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((rs.size.toLong, tp, fp, fn, tn)), s"g=$g")
      def m(a: Long, b: Long): Option[Long] =
        if (b == 0) None else Some(1000000L * a / b)
      def gv(i: Int): Option[Long] =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert(gv(6) == m(tp, tp + fn), s"tpr g=$g")
      assert(gv(7) == m(fp, fp + tn), s"fpr g=$g")
      assert(gv(8) == m(tp + fp, rs.size.toLong), s"sel g=$g")
      def gap(a: Option[Long], b: Option[Long]) =
        for (x <- a; y <- b) yield x - y
      assert(gv(9) == gap(m(tp, tp + fn), m(otp, otp + ofn)))
      assert(gv(10) == gap(m(fp, fp + tn), m(ofp, ofp + otn)))
      assert(gv(11) == gap(m(tp + fp, rs.size.toLong),
        m(otp + ofp, rows.size.toLong)))
    }
    assert(got("g9").isNullAt(7) && got("g9").isNullAt(10),
      "no-negative group must report NULL FPR and gap")
    val e = intercept[IllegalArgumentException] {
      Stats.fairnessAudit(Seq(("a", 2L, 0L)).toDF("g", "label", "pred"),
        "g", "label", "pred")
    }
    assert(e.getMessage.contains("non-binary"))
  }

  test("mutualInfoByKey equals the brute micro-nat fold; a bijective " +
    "mapping pins mi == h_x == h_y and nmi == 1.0; NULLs rejected") {
    val rnd = new scala.util.Random(60)
    def q(x: Double): Long = BigDecimal.valueOf(math.log(x) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = (1 to 2).flatMap { k =>
      Seq.fill(400)((k.toLong, s"x${rnd.nextInt(5)}",
        s"y${rnd.nextInt(4)}"))
    }
    val got = Stats.mutualInfoByKey(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val n = g.size.toLong
      val cells = g.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong)
      val rx = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val cy = g.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val smi = cells.map { case ((x, y), c) => BigInt(c) *
        (q(c.toDouble) + q(n.toDouble) - q(rx(x).toDouble) -
          q(cy(y).toDouble))
      }.sum
      val shx = cells.map { case ((x, _), c) =>
        BigInt(c) * (q(n.toDouble) - q(rx(x).toDouble))
      }.sum
      val shy = cells.map { case ((_, y), c) =>
        BigInt(c) * (q(n.toDouble) - q(cy(y).toDouble))
      }.sum
      val den = (BigInt(n) * 1000000).toDouble
      val (mi, hx, hy) =
        (smi.toDouble / den, shx.toDouble / den, shy.toDouble / den)
      assert(got(k) == ((n, cells.size.toLong, mi, hx, hy,
        mi / math.min(hx, hy))), s"k=$k")
    }
    // y a bijection of x: every cell has c == rx == cy, so the quantized
    // mi and marginal entropies are IDENTICAL sums and nmi is exactly 1.0
    val bij = (1 to 100).map(i => (1L, s"x${i % 4}", s"y${i % 4}"))
    val r = Stats.mutualInfoByKey(bij.toDF("k", "x", "y"), "k", "x", "y")
      .collect().head
    assert(r.getDouble(3) == r.getDouble(4) &&
      r.getDouble(4) == r.getDouble(5) && r.getDouble(6) == 1.0)
    intercept[Throwable] {
      Stats.mutualInfoByKey(Seq((1L, "a", Option.empty[String]),
          (1L, "b", Some("c"))).toDF("k", "x", "y"), "k", "x", "y")
        .collect()
    }
  }

  test("winsorizedMean equals the brute clamp at the exact order " +
    "statistics; alpha >= 1/2 rejected") {
    val rnd = new scala.util.Random(64)
    val rows = (1 to 3).flatMap { k =>
      Seq.fill(250)((k.toLong, rnd.nextInt(40).toLong - 10L))
    }
    val got = Stats.winsorizedMean(rows.toDF("k", "x"), "k", "x", 5L, 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val xs = g.map(_._2).sorted
      val n = xs.length
      val rLo = (5 * n + 99) / 100
      val lo = xs(rLo - 1)
      val hi = xs(n - rLo)
      val ws = xs.map(x => math.max(math.min(x, hi), lo)).sum
      assert(got(k) == ((n.toLong, lo, hi, ws.toDouble / n.toDouble,
        xs.sum.toDouble / n.toDouble)), s"k=$k")
    }
    intercept[IllegalArgumentException] {
      Stats.winsorizedMean(rows.toDF("k", "x"), "k", "x", 50L, 100L)
    }
  }

  test("labelNoiseJoint equals the brute confident-learning walk; " +
    "one-hot scores give a diagonal joint; bad labels rejected") {
    val rnd = new scala.util.Random(65)
    val m = 3
    val rows = Seq.fill(600)((rnd.nextInt(m).toLong,
      rnd.nextInt(100).toLong, rnd.nextInt(100).toLong,
      rnd.nextInt(100).toLong))
    val got = Stats.labelNoiseJoint(rows.toDF("y", "s0", "s1", "s2"),
        "y", Seq("s0", "s1", "s2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val nJ = Array.tabulate(m)(j => rows.count(_._1 == j).toLong)
    val sJ = Array.tabulate(m) { j =>
      rows.filter(_._1 == j).map(r => Seq(r._2, r._3, r._4)(j)).sum
    }
    val want = rows.groupBy { r =>
      val s = Seq(r._2, r._3, r._4)
      var (bs, bj) = (-1L, -1L)
      (0 until m).foreach { j =>
        if (nJ(j) > 0 && s(j) * nJ(j) >= sJ(j) && s(j) > bs) {
          bs = s(j); bj = j.toLong
        }
      }
      (r._1, bj)
    }.view.mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(got.keys.exists(_._2 >= 0), "no confident assignments at all?")
    // one-hot scores: every row guesses its own label -> diagonal joint
    val oneHot = Seq.fill(90)(rnd.nextInt(m).toLong).map { y =>
      (y, if (y == 0) 100L else 0L, if (y == 1) 100L else 0L,
        if (y == 2) 100L else 0L)
    }
    val diag = Stats.labelNoiseJoint(oneHot.toDF("y", "s0", "s1", "s2"),
        "y", Seq("s0", "s1", "s2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(diag.forall(r => r._1 == r._2), s"off-diagonal mass: $diag")
    val e = intercept[IllegalArgumentException] {
      Stats.labelNoiseJoint(Seq((5L, 1L, 1L, 1L))
        .toDF("y", "s0", "s1", "s2"), "y", Seq("s0", "s1", "s2"))
    }
    assert(e.getMessage.contains("outside [0, 3)"))
  }

  test("krippendorffAlpha equals the brute coincidence-matrix rational, " +
    "perfect agreement pins 1.0, unpairable items drop, r > 25 rejected") {
    val rnd = new scala.util.Random(66)
    val cats = Array("x", "y", "z")
    // variable raters per item: 1 (dropped), 2..6
    val rows = (1 to 2).flatMap { k =>
      (1 to 50).flatMap { i =>
        val r = 1 + rnd.nextInt(6)
        Seq.fill(r)((k.toLong, i.toLong, cats(rnd.nextInt(3))))
      }
    }
    val got = Stats.krippendorffAlpha(rows.toDF("k", "item", "cat"),
        "k", "item", "cat")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val L = BigInt(5354228880L)
    rows.groupBy(_._1).foreach { case (k, g) =>
      val items = g.groupBy(_._2).filter(_._2.size >= 2)
      val nItems = items.size.toLong
      val n = items.values.map(_.size.toLong).sum
      val ol = items.values.map { it =>
        val r = it.size.toLong
        val s2 = cats.map(c => BigInt(it.count(_._3 == c)).pow(2)).sum
        (L / (r - 1)) * (BigInt(r) * r - s2)
      }.sum
      val nc2 = cats.map(c => BigInt(
        items.values.map(_.count(_._3 == c)).sum).pow(2)).sum
      val poff = BigInt(n) * n - nc2
      val alpha = (L * poff - (BigInt(n) - 1) * ol).toDouble /
        (L * poff).toDouble
      assert(got(k) == ((nItems, n,
        ol.toDouble / (L * BigInt(n)).toDouble,
        poff.toDouble / (BigInt(n) * (n - 1)).toDouble, alpha)), s"k=$k")
    }
    // perfect agreement (and two categories present) -> alpha exactly 1
    val perfect = (1 to 20).flatMap(i =>
      Seq.fill(3)((1L, i.toLong, if (i % 2 == 0) "a" else "b")))
    assert(Stats.krippendorffAlpha(perfect.toDF("k", "item", "cat"),
      "k", "item", "cat").collect().head.getDouble(5) == 1.0)
    val e = intercept[IllegalArgumentException] {
      Stats.krippendorffAlpha(
        (1 to 26).map(j => (1L, 1L, s"c$j")).toDF("k", "item", "cat"),
        "k", "item", "cat")
    }
    assert(e.getMessage.contains("r <= 25"))
  }

  test("sprtBernoulli equals the brute micro-nat LLR, strong evidence " +
    "accepts, sparse evidence continues, bad outcomes rejected") {
    def lnq(x: Long) = BigDecimal.valueOf(math.log(x.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = Seq.fill(400)(("hot", 1L)) ++ // all successes -> H1
      Seq.fill(400)(("cold", 0L)) ++         // all failures -> H0
      Seq(("thin", 1L), ("thin", 0L))        // 2 rows -> continue
    val got = Stats.sprtBernoulli(rows.toDF("k", "x"), "k", "x",
        p0 = (45L, 100L), p1 = (55L, 100L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6))).toMap
    val w1 = lnq(5500L) - lnq(4500L)
    val w0 = lnq(4500L) - lnq(5500L)
    val lnA = lnq(9500L) - lnq(500L)
    val lnB = lnq(500L) - lnq(9500L)
    rows.groupBy(_._1).foreach { case (k, g) =>
      val n = g.size.toLong
      val s = g.count(_._2 == 1L).toLong
      val llr = s * w1 + (n - s) * w0
      val dec = if (llr >= lnA) "accept_h1"
        else if (llr <= lnB) "accept_h0" else "continue"
      assert(got(k) == ((n, s, llr, lnA, lnB, dec)), s"k=$k")
    }
    assert(got("hot")._6 == "accept_h1" && got("cold")._6 == "accept_h0"
      && got("thin")._6 == "continue")
    intercept[IllegalArgumentException] {
      Stats.sprtBernoulli(rows.toDF("k", "x"), "k", "x",
        p0 = (1L, 2L), p1 = (1L, 2L))
    }
    intercept[Throwable] {
      Stats.sprtBernoulli(Seq(("a", 7L)).toDF("k", "x"), "k", "x",
        p0 = (45L, 100L), p1 = (55L, 100L)).collect()
    }
  }

  test("raterAccuracy equals the brute majority-vote walk with " +
    "smallest-category tie-break; NULL raters rejected") {
    val rnd = new scala.util.Random(67)
    val cats = Array("a", "b", "c")
    val rows = (1 to 60).flatMap { item =>
      (0 until 4).map(r => (item.toLong, r.toLong, cats(rnd.nextInt(3))))
    }
    val got = Stats.raterAccuracy(rows.toDF("item", "rater", "cat"),
        "item", "rater", "cat")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val gold = rows.groupBy(_._1).map { case (item, g) =>
      val byCat = g.groupBy(_._3).view.mapValues(_.size)
      val mx = byCat.values.max
      item -> byCat.filter(_._2 == mx).keys.min
    }
    (0L until 4L).foreach { r =>
      val mine = rows.filter(_._2 == r)
      val n = mine.size.toLong
      val m = mine.count(x => x._3 == gold(x._1)).toLong
      assert(got(r) == ((n, m, 1000000L * m / n)), s"rater=$r")
    }
    intercept[Throwable] {
      Stats.raterAccuracy(Seq((1L, Option.empty[Long], "a"),
          (1L, Some(2L), "a")).toDF("item", "rater", "cat"),
        "item", "rater", "cat").collect()
    }
  }

  test("ipsEstimate equals the brute inverse-propensity fold; zero-" +
    "match keys report NaN; zero propensities rejected") {
    val rnd = new scala.util.Random(71)
    val rows = (1 to 2).flatMap { k =>
      Seq.fill(300)((k.toLong, s"a${rnd.nextInt(3)}", s"a${rnd.nextInt(3)}",
        (rnd.nextInt(1000000) + 1).toLong, rnd.nextInt(200).toLong))
    } ++ Seq((9L, "x", "y", 500000L, 10L)) // never matches
    val got = Stats.ipsEstimate(rows.toDF("k", "a", "pi", "p", "r"),
        "k", "a", "pi", "p", "r")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val m = g.filter(x => x._2 == x._3)
      val sw = m.map(x => BigInt(1000000000000L / x._4)).sum
      val sw2 = m.map(x => BigInt(1000000000000L / x._4).pow(2)).sum
      val srw = m.map(x => BigInt(x._5) * (1000000000000L / x._4)).sum
      val (n, nm) = (g.size.toLong, m.size.toLong)
      val r = got(k)
      assert((r._1, r._2) == ((n, nm)), s"k=$k")
      if (nm == 0) assert(r._3.isNaN && r._4.isNaN && r._5.isNaN)
      else {
        assert(r._3 == srw.toDouble / (BigInt(n) * 1000000000000L).toDouble)
        assert(r._4 == srw.toDouble / sw.toDouble)
        assert(r._5 == sw.toDouble * sw.toDouble / sw2.toDouble)
      }
    }
    val e = intercept[IllegalArgumentException] {
      Stats.ipsEstimate(Seq((1L, "a", "a", 0L, 5L))
        .toDF("k", "a", "pi", "p", "r"), "k", "a", "pi", "p", "r")
    }
    assert(e.getMessage.contains("propensity outside"))
    // clipped variant: a rare-propensity row's weight caps, pulling the
    // estimate toward the uncapped rows (the variance-control tradeoff)
    val clip = Seq((1L, "a", "a", 10L, 100L), (1L, "a", "a", 500000L, 10L))
    val capped = Stats.ipsEstimate(clip.toDF("k", "a", "pi", "p", "r"),
        "k", "a", "pi", "p", "r", weightCap = 5000000L)
      .collect().head
    val wCap = 5000000L // both: min(1e12/p, cap) -> 5e6 and 2e6
    val w2 = 1000000000000L / 500000L
    assert(capped.getDouble(3) ==
      (BigInt(100) * wCap + BigInt(10) * w2).toDouble /
        (BigInt(2) * 1000000000000L).toDouble)
  }

  test("quantileTreatmentEffects equals the brute per-arm rank picks; " +
    "one-armed keys drop; non-binary arms rejected") {
    val rnd = new scala.util.Random(72)
    val qs = Seq((1L, 4L), (2L, 4L), (9L, 10L))
    val rows = (1 to 3).flatMap { k =>
      Seq.fill(400)((k.toLong, rnd.nextInt(2).toLong,
        rnd.nextInt(50).toLong))
    } ++ Seq.fill(20)((9L, 1L, rnd.nextInt(50).toLong)) // treat-only key
    val got = Stats.quantileTreatmentEffects(rows.toDF("k", "arm", "v"),
        "k", "arm", "v", qs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toMap
    assert(!got.keySet.exists(_._1 == 9L), "one-armed key must drop")
    rows.groupBy(_._1).filter(_._1 != 9L).foreach { case (k, g) =>
      val t = g.filter(_._2 == 1L).map(_._3).sorted
      val c = g.filter(_._2 == 0L).map(_._3).sorted
      qs.foreach { case (pn, pd) =>
        def pick(xs: Seq[Long]): Long =
          xs(((pn * xs.size + pd - 1) / pd - 1).toInt)
        val want = (t.size.toLong, c.size.toLong, pick(t), pick(c),
          pick(t) - pick(c))
        assert(got((k, pn, pd)) == want, s"k=$k p=$pn/$pd")
      }
    }
    val e = intercept[IllegalArgumentException] {
      Stats.quantileTreatmentEffects(Seq((1L, 2L, 5L))
        .toDF("k", "arm", "v"), "k", "arm", "v", qs)
    }
    assert(e.getMessage.contains("non-binary"))
  }

  test("covariateBalance equals the brute SMD; identical arms pin " +
    "smd == 0.0; thin arms drop; non-binary arms rejected") {
    val rnd = new scala.util.Random(73)
    val rows = (1 to 3).flatMap { k =>
      Seq.fill(300)((k.toLong, rnd.nextInt(2).toLong,
        rnd.nextInt(2000).toLong - 500L))
    } ++ Seq((9L, 1L, 5L), (9L, 1L, 7L)) // no control arm
    val got = Stats.covariateBalance(rows.toDF("k", "arm", "x"),
        "k", "arm", "x")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(!got.contains(9L), "one-armed key must drop")
    rows.groupBy(_._1).filter(_._1 != 9L).foreach { case (k, g) =>
      def stats(arm: Long) = {
        val xs = g.filter(_._2 == arm).map(_._3)
        val n = xs.size.toLong
        val s = xs.map(BigInt(_)).sum
        val s2 = xs.map(x => BigInt(x) * x).sum
        (n, s.toDouble / n.toDouble,
          (BigInt(n) * s2 - s * s).toDouble /
            (BigInt(n) * (n - 1)).toDouble)
      }
      val (nt, mt, vt) = stats(1L)
      val (nc, mc, vc) = stats(0L)
      val smd = (mt - mc) / math.sqrt((vt + vc) / 2.0)
      assert(got(k) == ((nt, nc, mt, mc, vt, vc, smd)), s"k=$k")
    }
    // two identical arms: numerator exactly 0 -> smd == 0.0
    val same = (1 to 50).flatMap(i =>
      Seq((1L, 0L, i.toLong), (1L, 1L, i.toLong)))
    assert(Stats.covariateBalance(same.toDF("k", "arm", "x"),
      "k", "arm", "x").collect().head.getDouble(7) == 0.0)
    val e = intercept[IllegalArgumentException] {
      Stats.covariateBalance(Seq((1L, 3L, 5L)).toDF("k", "arm", "x"),
        "k", "arm", "x")
    }
    assert(e.getMessage.contains("non-binary"))
  }

  test("clusterPurity equals the brute per-cluster majority mass; all-" +
    "same-label input pins purity == 1e6; NULL labels rejected") {
    val rnd = new scala.util.Random(70)
    val rows = Seq.fill(500)((rnd.nextInt(60).toLong,
      s"l${rnd.nextInt(4)}"))
    val r = Stats.clusterPurity(rows.toDF("cl", "lb"), "cl", "lb")
      .collect().head
    val byCl = rows.groupBy(_._1)
    val mx = byCl.values.map(g =>
      g.groupBy(_._2).values.map(_.size).max.toLong).sum
    val pure = byCl.values.count(g => g.map(_._2).distinct.size == 1)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((rows.size.toLong, byCl.size.toLong, pure.toLong,
        1000000L * mx / rows.size)))
    val pureAll = Stats.clusterPurity(
      Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("cl", "lb"), "cl", "lb")
      .collect().head
    assert(pureAll.getLong(2) == 2L && pureAll.getLong(3) == 1000000L)
    intercept[Throwable] {
      Stats.clusterPurity(Seq((1L, Option.empty[String]),
        (1L, Some("a"))).toDF("cl", "lb"), "cl", "lb").collect()
    }
  }

  test("dawidSkeneHardEm: exact micro-nat EM replay on random data, and " +
    "accuracy weighting flips tied votes toward the reliable rater") {
    def q(x: Long) = BigDecimal.valueOf(math.log(x.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def brute(rows: Seq[(Long, Long, String)], rounds: Int)
      : Map[Long, (String, String, Long)] = {
      val cats = rows.map(_._3).distinct.sorted
      val c = cats.length
      val items = rows.map(_._1).distinct
      val nI = items.size.toLong
      val majority = items.map { it =>
        val byCat = rows.filter(_._1 == it).groupBy(_._3)
          .view.mapValues(_.size).toMap
        val mx = byCat.values.max
        it -> byCat.filter(_._2 == mx).keys.min
      }.toMap
      var gold = majority
      var score = Map.empty[Long, Long]
      (1 to rounds).foreach { _ =>
        val g = gold
        val rw = rows.groupBy(_._2).map { case (r, rs) =>
          val n = rs.size.toLong
          val m = rs.count(x => x._3 == g(x._1)).toLong
          r -> (q(m + 1) - q(n + 2),
            q(n - m + 1) - q(n + 2) - q(c - 1L))
        }
        val gc = g.values.groupBy(identity).view.mapValues(_.size.toLong)
        val pr = cats.map(ct =>
          ct -> (q(gc.getOrElse(ct, 0L) + 1) - q(nI + c))).toMap
        val next = items.map { it =>
          val mine = rows.filter(_._1 == it)
          val scores = cats.map { ct =>
            ct -> (pr(ct) + mine.map { case (_, r, cat) =>
              if (cat == ct) rw(r)._1 else rw(r)._2
            }.sum)
          }
          val mx = scores.map(_._2).max
          it -> (scores.filter(_._2 == mx).map(_._1).min, mx)
        }.toMap
        gold = next.view.mapValues(_._1).toMap
        score = next.view.mapValues(_._2).toMap
      }
      items.map(it => it -> (majority(it), gold(it), score(it))).toMap
    }
    val rnd = new scala.util.Random(69)
    val cats = Array("p", "q", "r", "s")
    val rows = (1 to 80).flatMap(i => (0 to 4).map(r =>
      (i.toLong, r.toLong, cats(rnd.nextInt(4)))))
    val got = Stats.dawidSkeneHardEm(rows.toDF("item", "rater", "cat"),
        "item", "rater", "cat", rounds = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(got == brute(rows, 2))
    // accuracy weighting breaks 1-vs-1 ties toward the reliable rater:
    // calibration items (double-rated by rater 0, always-wrong rater 1)
    // pin the two raters' accuracies apart; on the disputed items the
    // majority tie-breaks lexicographically to the WRONG 'a', and EM
    // must flip every one to the reliable rater's 'b'
    val cs = Array("a", "b", "c")
    val adv =
      (100 until 140).flatMap { i =>
        val truth = cs(i % 3)
        Seq((i.toLong, 0L, truth), (i.toLong, 0L, truth),
          (i.toLong, 1L, cs((i % 3 + 1) % 3)))
      } ++ (0 until 20).flatMap(i =>
        Seq((i.toLong, 0L, "b"), (i.toLong, 1L, "a")))
    val fixed = Stats.dawidSkeneHardEm(adv.toDF("item", "rater", "cat"),
        "item", "rater", "cat", rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    (0 until 20).foreach { i =>
      assert(fixed(i.toLong) == (("a", "b")),
        s"disputed item $i: ${fixed(i.toLong)} — EM must side with " +
          "the calibrated-reliable rater")
    }
    (100 until 140).foreach { i =>
      assert(fixed(i.toLong)._2 == cs(i % 3), s"calibration item $i")
    }
  }

  test("ndcgAtK equals the brute discounted fold; a relevance-sorted " +
    "ranking pins ndcg == 1.0; zero relevance -> NaN; duplicate " +
    "ranks rejected") {
    val k = 10
    def w(i: Int) = BigDecimal.valueOf(1e6 * math.log(2.0) /
      math.log((i + 1).toDouble))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rnd = new scala.util.Random(75)
    val rows = (1 to 4).flatMap { q =>
      (1 to k).map(i => (s"q$q", i.toLong, rnd.nextInt(4).toLong))
    } ++ (1 to 6).map(i => ("sorted", i.toLong, (7 - i).toLong)) ++
      (1 to 5).map(i => ("zero", i.toLong, 0L))
    val got = Stats.ndcgAtK(rows.toDF("q", "rank", "rel"),
        "q", "rank", "rel", k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    rows.groupBy(_._1).foreach { case (q, g) =>
      val dcg = g.map(r => r._3 * w(r._2.toInt)).sum
      val idcg = g.map(_._3).sorted.reverse.zipWithIndex
        .map { case (rel, i) => rel * w(i + 1) }.sum
      val r = got(q)
      assert((r._1, r._2, r._3) == ((g.size.toLong, dcg, idcg)), s"q=$q")
      if (idcg == 0) assert(r._4.isNaN)
      else assert(r._4 == dcg.toDouble / idcg.toDouble)
    }
    assert(got("sorted")._4 == 1.0, "relevance-sorted ranking")
    assert(got("zero")._4.isNaN)
    val e = intercept[IllegalArgumentException] {
      Stats.ndcgAtK(Seq(("a", 1L, 1L), ("a", 1L, 2L))
        .toDF("q", "rank", "rel"), "q", "rank", "rel", k)
    }
    assert(e.getMessage.contains("duplicate ranks"))
    // A NULL rank must be rejected LOUDLY — not silently dropped by
    // the @k filter (NULL <= k is NULL): the contract runs on the
    // unfiltered projection.
    val eNull = intercept[IllegalArgumentException] {
      Stats.ndcgAtK(
        Seq(("a", Some(1L), 1L), ("a", None, 2L))
          .toDF("q", "rank", "rel"), "q", "rank", "rel", k)
    }
    assert(eNull.getMessage.contains("NULL/non-positive rank"))
    // ...and a rank BEYOND k with a valid grade is still simply
    // ignored (the @k semantics), not rejected.
    val beyond = Stats.ndcgAtK(
      Seq(("a", 1L, 2L), ("a", (k + 5).toLong, 3L))
        .toDF("q", "rank", "rel"), "q", "rank", "rel", k)
      .collect().head
    assert(beyond.getLong(1) == 1L)
  }

  test("preferenceCycles: rock-paper-scissors pins one pure cycle, a " +
    "transitive chain pins zero, random tournaments match the brute " +
    "triad walk, ties stay undecided") {
    def run(cs: Seq[(String, String)]) =
      Stats.preferenceCycles(cs.toDF("w", "l"), "w", "l")
        .collect().head
    val rps = run(Seq(("r", "s"), ("s", "p"), ("p", "r")))
    assert((rps.getLong(0), rps.getLong(2), rps.getLong(3),
      rps.getLong(4), rps.getLong(5)) == ((3L, 3L, 1L, 1L, 1000000L)))
    val chain = run(Seq(("a", "b"), ("b", "c"), ("a", "c")))
    assert(chain.getLong(3) == 1L && chain.getLong(4) == 0L &&
      chain.getLong(5) == 0L)
    // a tied pair is undecided: the triad is not testable
    val tied = run(Seq(("r", "s"), ("s", "p"), ("p", "r"), ("r", "p")))
    assert(tied.getLong(2) == 2L && tied.getLong(3) == 0L &&
      tied.isNullAt(5))
    val rnd = new scala.util.Random(74)
    val items = (0 until 8).map(i => s"i$i")
    val cs = Seq.fill(500) {
      val a = items(rnd.nextInt(8)); var b = items(rnd.nextInt(8))
      while (b == a) b = items(rnd.nextInt(8))
      if (rnd.nextBoolean()) (a, b) else (b, a)
    }
    val got = run(cs)
    val wins = cs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def dir(a: String, b: String): Option[Boolean] = {
      val ab = wins.getOrElse((a, b), 0L)
      val ba = wins.getOrElse((b, a), 0L)
      if (ab == ba) None else Some(ab > ba)
    }
    var (triads, cycles) = (0L, 0L)
    for {
      i <- items.indices; j <- items.indices if j > i
      k <- items.indices if k > j
      f1 <- dir(items(i), items(j))
      f2 <- dir(items(i), items(k))
      f3 <- dir(items(j), items(k))
    } {
      triads += 1
      if (f1 == f3 && f1 != f2) cycles += 1
    }
    assert((got.getLong(3), got.getLong(4)) == ((triads, cycles)))
    assert(got.getLong(5) == 1000000L * cycles / triads)
  }

  test("bradleyTerryStrengths: exact integer-MM replay, a dominant item " +
    "pins 1e6, double-MM ranking agrees on a balanced design, " +
    "self-contests rejected") {
    val rnd = new scala.util.Random(62)
    // balanced random tournament over 6 items with distinct true skills
    val skill = Map("a" -> 0.9, "b" -> 0.75, "c" -> 0.6, "d" -> 0.45,
      "e" -> 0.3, "f" -> 0.15)
    val items = skill.keys.toSeq.sorted
    val contests = (for {
      i <- items; j <- items if i < j
      _ <- 1 to 60
    } yield {
      val pi = skill(i) / (skill(i) + skill(j))
      if (rnd.nextDouble() < pi) (i, j) else (j, i)
    })
    val got = Stats.bradleyTerryStrengths(
        contests.toDF("winner", "loser"), "winner", "loser", rounds = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // independent integer replay of the published MM recurrence
    val idx = items.zipWithIndex.toMap
    val nij = scala.collection.mutable.Map[(Int, Int), BigInt]()
    contests.foreach { case (w, l) =>
      val (a, b) = (idx(w) min idx(l), idx(w) max idx(l))
      nij((a, b)) = nij.getOrElse((a, b), BigInt(0)) + 1
    }
    val wins = Array.tabulate(6)(i =>
      BigInt(contests.count(_._1 == items(i))))
    nij.keys.foreach { case (a, b) =>
      nij((a, b)) += 2; wins(a) += 1; wins(b) += 1
    }
    var p = Array.fill(6)(BigInt(1000000))
    (1 to 10).foreach { _ =>
      val d = Array.fill(6)(BigInt(0))
      nij.foreach { case ((a, b), n) =>
        val t = n * BigInt(10).pow(12) / (p(a) + p(b)).max(BigInt(1))
        d(a) += t; d(b) += t
      }
      val raw = Array.tabulate(6)(i =>
        wins(i) * BigInt(10).pow(18) / d(i).max(BigInt(1)))
      val mx = raw.max
      p = raw.map(_ * 1000000 / mx)
    }
    items.zipWithIndex.foreach { case (it, i) =>
      assert(got(it)._3 == p(i).toLong, s"item=$it")
      assert(got(it)._1 == contests.count(c => c._1 == it || c._2 == it))
      assert(got(it)._2 == contests.count(_._1 == it))
    }
    // double-precision MM reference ranking must agree (balanced design)
    var q = Array.fill(6)(1.0)
    (1 to 200).foreach { _ =>
      q = Array.tabulate(6) { i =>
        val d = (0 until 6).map { j =>
          if (i == j) 0.0
          else nij.getOrElse((i min j, i max j), BigInt(0)).toDouble /
            (q(i) + q(j))
        }.sum
        wins(i).toDouble / d
      }
      val s = q.max
      q = q.map(_ / s)
    }
    val wantOrder = items.sortBy(it => -q(idx(it)))
    val gotOrder = items.sortBy(it => -got(it)._3)
    assert(gotOrder == wantOrder, s"ranking: $gotOrder != $wantOrder")
    // a dominant item normalizes to exactly 1e6
    assert(got(gotOrder.head)._3 == 1000000L)
    intercept[IllegalArgumentException] {
      Stats.bradleyTerryStrengths(Seq(("a", "a")).toDF("w", "l"),
        "w", "l")
    }
  }
  test("tClosenessProfile equals the brute total-variation walk; NULL " +
    "sensitive values rejected") {
    val rnd = new scala.util.Random(419)
    val rows = (1 to 400).map { _ =>
      (s"q${rnd.nextInt(6)}", rnd.nextInt(4).toLong,
        s"v${(math.pow(rnd.nextDouble(), 2) * 5).toInt}")
    }
    val got = Stats.tClosenessProfile(rows.toDF("qa", "qb", "sv"),
      Seq("qa", "qb"), "sv", tMicro = 100000L).collect().head
    // brute: exact rational TV per class, micro-floored
    val n = rows.size.toLong
    val gl = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tvs = rows.groupBy(r => (r._1, r._2)).toSeq.map { case (_, g) =>
      val cn = g.size.toLong
      val cv = g.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val num = gl.map { case (v, gv) =>
        (cv.getOrElse(v, 0L) * n - cn * gv).abs
      }.sum
      (cn, BigInt(1000000L) * num / (BigInt(2) * cn * n))
    }
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == tvs.size.toLong)
    assert(got.getLong(2) == gl.size.toLong)
    assert(got.getLong(3) == tvs.map(_._2).max.toLong)
    assert(got.getLong(4) == tvs.count(_._2 > 100000L).toLong)
    assert(got.getLong(5) ==
      tvs.filter(_._2 > 100000L).map(_._1).sum)
    val e = intercept[IllegalArgumentException] {
      Stats.tClosenessProfile(
        Seq(("a", Some("x")), ("a", None)).toDF("qa", "sv"),
        Seq("qa"), "sv", 0L)
    }
    assert(e.getMessage.contains("NULL sensitive"))
  }
  test("tClosenessOrdered equals the brute EMD walk; a one-band shift " +
    "scores below an extreme concentration at equal TV") {
    val rnd = new scala.util.Random(509)
    val rows = (1 to 500).map { _ =>
      (s"q${rnd.nextInt(8)}", (math.pow(rnd.nextDouble(), 2) * 5).toLong)
    }
    val got = Stats.tClosenessOrdered(rows.toDF("qa", "sv"),
      Seq("qa"), "sv", tMicro = 50000L).collect().head
    val n = rows.size.toLong
    val gl = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vs = gl.keys.toSeq.sorted
    val m = vs.size.toLong
    val emds = rows.groupBy(_._1).toSeq.map { case (_, g) =>
      val cn = g.size.toLong
      val cv = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      var cum = BigInt(0); var acc = BigInt(0)
      vs.foreach { v =>
        cum += BigInt(cv.getOrElse(v, 0L)) * n - BigInt(cn) * gl(v)
        acc += cum.abs
      }
      (cn, BigInt(1000000L) * acc / (BigInt(cn) * n * (m - 1)))
    }
    assert(got.getLong(0) == n && got.getLong(1) == emds.size.toLong &&
      got.getLong(2) == m)
    assert(got.getLong(3) == emds.map(_._2).max.toLong)
    assert(got.getLong(4) == emds.count(_._2 > 50000L).toLong)
    assert(got.getLong(5) == emds.filter(_._2 > 50000L).map(_._1).sum)
    // order sensitivity: global uniform over 3 bands; class A sits one
    // band up, class B concentrates at the extreme — same TV, EMD must
    // rank B strictly worse. Build: 3 classes of 6 rows; global counts
    // equal per band.
    val shifted = Seq.fill(6)(("a", 1L)) ++ Seq.fill(6)(("b", 2L)) ++
      (0 until 6).map(i => ("c", (i % 3).toLong))
    def emdOf(cls: String): Long = {
      val all = shifted
      val nn = all.size.toLong
      val gg = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val vv = gg.keys.toSeq.sorted
      val g = all.filter(_._1 == cls)
      val cv = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      var cum = BigInt(0); var acc = BigInt(0)
      vv.foreach { v =>
        cum += BigInt(cv.getOrElse(v, 0L)) * nn - BigInt(g.size) * gg(v)
        acc += cum.abs
      }
      (BigInt(1000000L) * acc /
        (BigInt(g.size) * nn * (vv.size - 1))).toLong
    }
    val gotS = Stats.tClosenessOrdered(shifted.toDF("qa", "sv"),
      Seq("qa"), "sv", tMicro = 0L).collect().head
    assert(gotS.getLong(3) == Seq("a", "b", "c").map(emdOf).max)
    assert(emdOf("b") > emdOf("a"), "extreme must out-score the shift")
    val e = intercept[IllegalArgumentException] {
      Stats.tClosenessOrdered(
        Seq(("a", Some(1L)), ("a", None)).toDF("qa", "sv"),
        Seq("qa"), "sv", 0L)
    }
    assert(e.getMessage.contains("NULL or non-integral"))
  }
  test("t-closeness audits NULL-quasi classes via null-safe joins and " +
    "rejects fractional sensitive values instead of truncate-banding") {
    val rnd = new scala.util.Random(613)
    // ~20% of rows land in the NULL quasi class — it must be audited
    // with its true counts, not dropped (TV) or zeroed (EMD).
    val rows = (1 to 300).map { _ =>
      (if (rnd.nextInt(5) == 0) None else Some(s"q${rnd.nextInt(4)}"),
        s"v${rnd.nextInt(4)}")
    }
    val got = Stats.tClosenessProfile(rows.toDF("qa", "sv"),
      Seq("qa"), "sv", tMicro = 100000L).collect().head
    val n = rows.size.toLong
    val gl = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tvs = rows.groupBy(_._1).toSeq.map { case (_, g) =>
      val cn = g.size.toLong
      val cv = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val num = gl.map { case (v, gv) =>
        (cv.getOrElse(v, 0L) * n - cn * gv).abs
      }.sum
      (cn, BigInt(1000000L) * num / (BigInt(2) * cn * n))
    }
    assert(got.getLong(0) == n, "NULL-quasi rows must not drop")
    assert(got.getLong(1) == tvs.size.toLong, "NULL class must count")
    assert(got.getLong(3) == tvs.map(_._2).max.toLong)
    assert(got.getLong(4) == tvs.count(_._2 > 100000L).toLong)
    val rowsO = (1 to 300).map { _ =>
      (if (rnd.nextInt(5) == 0) None else Some(s"q${rnd.nextInt(4)}"),
        (math.pow(rnd.nextDouble(), 2) * 4).toLong)
    }
    val gotO = Stats.tClosenessOrdered(rowsO.toDF("qa", "sv"),
      Seq("qa"), "sv", tMicro = 50000L).collect().head
    val nO = rowsO.size.toLong
    val glO = rowsO.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vsO = glO.keys.toSeq.sorted
    val emds = rowsO.groupBy(_._1).toSeq.map { case (_, g) =>
      val cn = g.size.toLong
      val cv = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      var cum = BigInt(0); var acc = BigInt(0)
      vsO.foreach { v =>
        cum += BigInt(cv.getOrElse(v, 0L)) * nO - BigInt(cn) * glO(v)
        acc += cum.abs
      }
      (cn, BigInt(1000000L) * acc /
        (BigInt(cn) * nO * (vsO.size - 1)))
    }
    assert(gotO.getLong(0) == nO && gotO.getLong(1) == emds.size.toLong)
    assert(gotO.getLong(3) == emds.map(_._2).max.toLong,
      "NULL class must score its TRUE counts, not an all-zero grid")
    assert(gotO.getLong(4) == emds.count(_._2 > 50000L).toLong)
    // fractional sensitive: ANSI cast truncates 2.7 -> 2; the contract
    // must catch the failed roundtrip and REJECT, not silently band
    val e = intercept[IllegalArgumentException] {
      Stats.tClosenessOrdered(
        Seq(("a", 2.7), ("a", 2.0), ("b", 1.0), ("b", 2.0))
          .toDF("qa", "sv"),
        Seq("qa"), "sv", 0L)
    }
    assert(e.getMessage.contains("NULL or non-integral"))
    // integral doubles roundtrip exactly -> accepted
    val ok = Stats.tClosenessOrdered(
      Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
        .toDF("qa", "sv"),
      Seq("qa"), "sv", 0L).collect().head
    assert(ok.getLong(0) == 4L && ok.getLong(2) == 2L)
  }
}
