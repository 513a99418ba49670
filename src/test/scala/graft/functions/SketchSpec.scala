package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Coverage for the [[BloomAgg]]/[[BloomContains]] and [[CmsAgg]]/
  * [[CmsQuery]] sketches: exact agreement with a driver-side reference
  * model (the reproducibility contract the oracle relies on), no false
  * negatives / over-count-only guarantees, bit-identical buffers under any
  * partitioning, malformed-input null conventions, and parameter bounds.
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  // Driver-side reference models sharing only md5Long with the SUT.
  private def refPositions(h: Long, m: Int, k: Int): Seq[Int] = {
    val h1 = h % m
    val h2 = 1L + (h / m) % (m - 1)
    (0 until k).map(i => ((h1 + i.toLong * h2) % m).toInt)
  }

  private def refBloom(keys: Seq[String], m: Int, k: Int): Array[Byte] = {
    val buf = new Array[Byte]((m + 7) / 8)
    for (key <- keys; p <- refPositions(TextKernels.md5Long(key), m, k))
      buf(p >>> 3) = (buf(p >>> 3) | (1 << (p & 7))).toByte
    buf
  }

  private def refCms(vals: Seq[String], d: Int, w: Int): Array[Long] = {
    val buf = new Array[Long](d * w)
    for (v <- vals) {
      val ps = refPositions(TextKernels.md5Long(v), w, d)
      for (j <- 0 until d) buf(j * w + ps(j)) += 1L
    }
    buf
  }

  test("bloom filter bytes equal the reference model under any partitioning") {
    val keys = (0 until 300).map(i => s"key-$i")
    val expected = refBloom(keys, 1024, 4)
    for (parts <- Seq(1, 7, 32)) {
      val got = keys.toDF("k").repartition(parts)
        .agg(bloom_agg(col("k"), 1024, 4).as("f"))
        .head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(got, expected), s"parts=$parts")
    }
  }

  test("bloom has no false negatives and a plausible false-positive rate") {
    val members = (0 until 200).map(i => s"member-$i")
    val f = members.toDF("k").agg(bloom_agg(col("k"), 4096, 4).as("f"))
    val probes = (members ++ (0 until 2000).map(i => s"other-$i")).toDF("k")
    val hits = probes.crossJoin(f)
      .select(col("k"), bloom_contains(col("f"), col("k"), 4096, 4).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(members.forall(hits(_)), "false negative")
    val fp = (0 until 2000).count(i => hits(s"other-$i"))
    // n=200, m=4096, k=4 -> theoretical fp ~ (1-e^{-800/4096})^4 ~ 0.1%
    assert(fp <= 20, s"false-positive count $fp implausibly high")
  }

  test("bloom_contains nulls out on a wrong-length filter and null inputs") {
    val out = Seq(("x", Array[Byte](1, 2, 3))).toDF("k", "f")
      .select(
        bloom_contains(col("f"), col("k"), 1024, 4).as("bad_len"),
        bloom_contains(lit(null).cast("binary"), col("k"), 1024, 4).as("null_f"),
        bloom_contains(col("f"), lit(null).cast("string"), 24, 2).as("null_k"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  test("cms counters equal the reference model under any partitioning") {
    val vals = (0 until 5000).map(i => s"tok-${i % 700}")
    val expected = refCms(vals, 4, 512)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(cms_agg(col("v"), 4, 512).as("sk"))
        .head().getAs[scala.collection.Seq[Long]](0)
      assert(got.toArray.sameElements(expected), s"parts=$parts")
    }
  }

  test("cms estimates never undercount and are exact without collisions") {
    val vals = (0 until 400).flatMap(i => Seq.fill(1 + i % 5)(s"w$i"))
    val exact = vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val sk = vals.toDF("v").agg(cms_agg(col("v"), 4, 2048).as("sk"))
    val est = exact.keys.toSeq.toDF("v").crossJoin(sk)
      .select(col("v"), cms_query(col("sk"), col("v"), 4, 2048).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, n) => assert(est(v) >= n, s"undercount for $v") }
    // min-over-4-rows at width 2048 with 400 keys: collisions in all 4 rows
    // are vanishingly rare, so most estimates are exact
    val exactCount = exact.count { case (v, n) => est(v) == n }
    assert(exactCount >= 390, s"only $exactCount/400 exact")
  }

  test("cms_query nulls out on a wrong-length sketch") {
    val out = Seq(("x", Seq(1L, 2L, 3L))).toDF("v", "sk")
      .select(cms_query(col("sk"), col("v"), 4, 512).as("bad")).head()
    assert(out.isNullAt(0))
  }

  test("mismatched-parameter probes null out even with non-nullable inputs") {
    // bloom_agg/cms_agg outputs are nullable=false and the probe key is a
    // literal: without the explicit nullable=true overrides on
    // BloomContains/CmsQuery, the wrong-length null would unbox to an NPE
    // in the non-nullable codegen path
    val f = Seq("k1", "k2").toDF("k").agg(bloom_agg(col("k"), 1024, 4).as("f"))
    assert(f.select(bloom_contains(col("f"), lit("k1"), 2048, 4)).head().isNullAt(0))
    val sk = Seq("a").toDF("v").agg(cms_agg(col("v"), 4, 512).as("sk"))
    assert(sk.select(cms_query(col("sk"), lit("a"), 4, 256)).head().isNullAt(0))
  }

  test("merged per-group cms sketches equal the one-shot sketch") {
    val vals = (0 until 3000).map(i => (s"src-${i % 4}", s"tok-${i % 450}"))
    val df = vals.toDF("source", "v")
    val merged = df.groupBy("source").agg(cms_agg(col("v"), 4, 256).as("sk"))
      .agg(cms_merge(col("sk"), 4, 256).as("sk"))
      .head().getAs[scala.collection.Seq[Long]](0)
    val oneShot = df.agg(cms_agg(col("v"), 4, 256).as("sk"))
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(merged == oneShot)
  }

  test("bottom_k equals sort-and-take under any partitioning") {
    val rows = (0 until 500).map { i =>
      (s"g${i % 3}", TextKernels.md5Long(s"item-$i"), i.toLong)
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(5)
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("g", "h", "id").repartition(parts)
        .groupBy("g").agg(bottom_k(struct(col("h"), col("id")), 5).as("bk"))
        .collect().map { r =>
          r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(s => (s.getLong(0), s.getLong(1)))
        }.toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("bottom_k dedups identical pairs and handles groups smaller than k") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 1L), ("a", 3L, 2L)).toDF("g", "h", "id")
    val out = df.groupBy("g").agg(bottom_k(struct(col("h"), col("id")), 8).as("bk"))
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(s => (s.getLong(0), s.getLong(1)))
    assert(out == Seq((3L, 2L), (5L, 1L)))
  }

  test("hist quantiles land within one bin width of the exact percentile") {
    val vals = (0 until 5000).map(i => ((i * 7919) % 10000).toDouble)
    val df = vals.toDF("v")
    val binW = 10000.0 / 128
    val sk = df.agg(hist_agg(col("v"), 0.0, 10000.0, 128).as("h"))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = sk.select(hist_quantile(col("h"), q, 0.0, 10000.0, 128))
        .head().getDouble(0)
      val exact = vals.sorted.apply((q * (vals.length - 1)).toInt)
      assert(math.abs(est - exact) <= binW + 1e-9, s"q=$q est=$est exact=$exact")
    }
  }

  test("hist merge of per-group sketches equals the one-shot histogram") {
    val df = (0 until 4000).map(i => (s"p${i % 5}", (i % 997).toDouble)).toDF("p", "v")
    val merged = df.groupBy("p").agg(hist_agg(col("v"), 0.0, 1000.0, 64).as("h"))
      .agg(hist_merge(col("h"), 64).as("h"))
      .head().getAs[scala.collection.Seq[Long]](0)
    val oneShot = df.agg(hist_agg(col("v"), 0.0, 1000.0, 64).as("h"))
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(merged == oneShot)
  }

  test("hist clamps outliers to edge bins and nulls bad sketches") {
    val df = Seq(-50.0, 5.0, 150.0).toDF("v")
    val bins = df.agg(hist_agg(col("v"), 0.0, 100.0, 10).as("h"))
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(bins.head == 2L && bins.last == 1L) // -50 clamps low, 150 clamps high
    val bad = Seq(Tuple1(Seq(1L, 2L))).toDF("h")
      .select(hist_quantile(col("h"), 0.5, 0.0, 100.0, 10))
    assert(bad.head().isNullAt(0))
    val empty = Seq(Tuple1(Seq.fill(10)(0L))).toDF("h")
      .select(hist_quantile(col("h"), 0.5, 0.0, 100.0, 10))
    assert(empty.head().isNullAt(0))
  }

  test("top_k_by equals the window formulation under any partitioning") {
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", (i * 37) % 100L, i.toLong)
    }
    // expected: per group, top-5 by (score desc, id desc) — the struct's
    // natural descending order with id second
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted(
        Ordering[(Long, Long)].reverse).take(5)
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .groupBy("g").agg(top_k_by(struct(col("score"), col("id")), 5).as("tk"))
        .collect().map { r =>
          r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(s => (s.getLong(0), s.getLong(1)))
        }.toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("top_k_by keeps duplicates (multiset) and handles small groups") {
    val df = Seq(("a", 9L), ("a", 9L), ("a", 1L), ("b", 5L)).toDF("g", "v")
    val out = df.groupBy("g").agg(top_k_by(struct(col("v")), 2).as("tk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))).toMap
    assert(out("a") == Seq(9L, 9L)) // the duplicate survives, 1 is cut
    assert(out("b") == Seq(5L))     // group smaller than k
  }

  test("sketch parameter bounds are enforced") {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal("x")
    intercept[IllegalArgumentException] { BloomAgg(lit, numBits = 4, numHashes = 4) }
    intercept[IllegalArgumentException] { BloomAgg(lit, numBits = 1024, numHashes = 0) }
    intercept[IllegalArgumentException] { CmsAgg(lit, depth = 0, width = 512) }
    intercept[IllegalArgumentException] { CmsAgg(lit, depth = 4, width = 1) }
    intercept[IllegalArgumentException] { VecSumQAgg(lit, dim = 0) }
  }

  test("hist_cdf is the inverse of hist_quantile and tracks the exact rank") {
    val vals = (0 until 1000).map(i => (i * 37 % 1000).toDouble)
    val df = vals.toDF("v").agg(hist_agg(col("v"), 0.0, 1000.0, 100).as("h"))
    // cdf of the exact p-quantile value must come back ~p
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val Seq(q, cdf) = df.select(
        hist_quantile(col("h"), p, 0.0, 1000.0, 100).as("q"),
        hist_cdf(col("h"), hist_quantile(col("h"), p, 0.0, 1000.0, 100),
          0.0, 1000.0, 100).as("c"))
        .head().toSeq.map(_.asInstanceOf[Double])
      assert(math.abs(cdf - p) < 0.02, s"p=$p q=$q cdf=$cdf")
    }
    // exact rank agreement: values are uniform on [0,1000), so
    // cdf(x) ~ x/1000 within one bin width
    val c250 = df.select(hist_cdf(col("h"), lit(250.0), 0.0, 1000.0, 100))
      .head().getDouble(0)
    assert(math.abs(c250 - 0.25) < 0.011, s"cdf(250)=$c250")
  }

  test("hist_cdf nulls out on malformed sketches and NaN probes") {
    val df = Seq(1.0).toDF("v").agg(hist_agg(col("v"), 0.0, 10.0, 16).as("h"))
    assert(df.select(hist_cdf(col("h"), lit(Double.NaN), 0.0, 10.0, 16))
      .head().isNullAt(0))
    // wrong length -> null
    val bad = Seq(Tuple1(Seq(1L, 2L))).toDF("h")
    assert(bad.select(hist_cdf(col("h"), lit(1.0), 0.0, 10.0, 16))
      .head().isNullAt(0))
  }

  test("vec_sum_q equals the floor-quantized reference under any partitioning") {
    val vecs = (0 until 120).map { i =>
      (i % 3, Array.tabulate(4)(d => (math.sin(i * 4 + d) * 1.5).toFloat))
    }
    val expected = vecs.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2).foldLeft(new Array[Long](4)) { (acc, v) =>
        for (d <- 0 until 4)
          acc(d) += math.floor(v(d).toDouble * 1000000.0).toLong
        acc
      }.toSeq
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = vecs.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(vec_sum_q(col("v"), 4).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("vec_sum_q skips malformed vectors whole (wrong length, null, NaN, Inf)") {
    val rows = Seq(
      ("a", Array(1.0f, 2.0f)),       // good
      ("a", Array(3.0f)),             // wrong length -> skipped
      ("a", null.asInstanceOf[Array[Float]]), // null vector -> skipped
      ("a", Array(Float.NaN, 1.0f)),  // NaN component -> whole vector skipped
      ("a", Array(Float.PositiveInfinity, 1.0f)), // Inf would saturate -> skipped
      ("a", Array(0.5f, -0.5f)))      // good
    val got = rows.toDF("g", "v")
      .groupBy("g").agg(vec_sum_q(col("v"), 2).as("s"))
      .head().getSeq[Long](1)
    // floor(1e6*1)+floor(1e6*0.5) = 1500000; floor(2e6)+floor(-0.5e6) = 1500000
    assert(got == Seq(1500000L, 1500000L))
  }

  // --- RQ rank-quantile sketch -----------------------------------------

  /** Driver-side reference replay of the RQ construction: final level
    * J* = min{ j : |{distinct v : hash passes 2^j}| <= budget }, sample
    * = surviving values with FULL counts. Shares only md5Long with the
    * SUT. */
  private def refRq(vals: Seq[Long], budget: Int): (Int, Map[Long, Long]) = {
    val hist = vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    def pass(v: Long, j: Int) =
      (TextKernels.md5Long(v.toString) & ((1L << j) - 1L)) == 0L
    val j = (0 to 60).find(j => hist.keys.count(pass(_, j)) <= budget).get
    (j, hist.filter { case (v, _) => pass(v, j) })
  }

  private def refQuantile(sample: Map[Long, Long], pNum: Long, pDen: Long): Long = {
    val sorted = sample.toSeq.sortBy(_._1)
    val total = sorted.map(_._2).sum
    var cum = 0L
    sorted.find { case (_, c) => cum += c; cum * pDen >= pNum * total }
      .map(_._1).getOrElse(sorted.last._1)
  }

  test("rq_sketch two-level merge equals the one-shot sketch BYTE-FOR-" +
    "BYTE under random grouping, and both equal the reference replay") {
    val rnd = new scala.util.Random(83)
    for ((budget, trial) <- Seq((16, 1), (64, 2), (256, 3))) {
      // skewed multiset: heavy dups on small values + a long tail
      val vals = Seq.fill(3000)(
        if (rnd.nextBoolean()) rnd.nextInt(40).toLong
        else rnd.nextLong() % 100000L)
      val df = vals.map(v => (rnd.nextInt(7).toLong, v)).toDF("g", "v")
      val oneShot = df.agg(rq_sketch(col("v"), budget).as("sk"))
        .head().getAs[Array[Byte]](0)
      val twoLevel = df.groupBy("g").agg(rq_sketch(col("v"), budget).as("sk"))
        .agg(rq_merge(col("sk"), budget).as("sk"))
        .head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(oneShot, twoLevel),
        s"trial $trial: merge tree must not move the sketch")
      // and the state is exactly the reference construction
      val (refJ, refSample) = refRq(vals, budget)
      val buf = RqSketch.deserialize(oneShot)
      assert(buf.level == refJ, s"trial $trial level")
      assert(buf.entries.toMap == refSample, s"trial $trial sample")
      // estimator picks replay exactly
      val row = df.agg(rq_sketch(col("v"), budget).as("sk"))
        .select(rq_quantile(col("sk"), 1L, 2L), rq_quantile(col("sk"), 9L, 10L),
          rq_info(col("sk")).getField("n_est"),
          rq_info(col("sk")).getField("level")).head()
      assert(row.getLong(0) == refQuantile(refSample, 1, 2), s"trial $trial p50")
      assert(row.getLong(1) == refQuantile(refSample, 9, 10), s"trial $trial p90")
      assert(row.getLong(2) ==
        (refSample.values.sum << refJ), s"trial $trial n_est")
      assert(row.getInt(3) == refJ)
    }
  }

  test("rq_sketch at level 0 (budget >= distinct) is the exact histogram " +
    "and rq_quantile is the exact type-1 quantile") {
    val rnd = new scala.util.Random(47)
    val vals = Seq.fill(500)(rnd.nextInt(60).toLong)
    val df = vals.map(Tuple1(_)).toDF("v")
    val sk = df.agg(rq_sketch(col("v"), 512).as("sk"))
    val buf = RqSketch.deserialize(sk.head().getAs[Array[Byte]](0))
    assert(buf.level == 0)
    assert(buf.entries.toMap ==
      vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong })
    val sorted = vals.sorted
    def exactQ(num: Long, den: Long): Long = {
      val k = ((num * sorted.length + den - 1) / den).toInt // ceil rank
      sorted(k - 1)
    }
    val row = sk.select(rq_quantile(col("sk"), 1L, 2L),
      rq_quantile(col("sk"), 3L, 4L), rq_quantile(col("sk"), 99L, 100L),
      rq_info(col("sk")).getField("n_est")).head()
    assert(row.getLong(0) == exactQ(1, 2))
    assert(row.getLong(1) == exactQ(3, 4))
    assert(row.getLong(2) == exactQ(99, 100))
    assert(row.getLong(3) == 500L, "level 0: n_est is the exact row count")
  }

  test("rq_sketch_w folds weights into exact counts: unit weights equal " +
    "the unweighted bytes, and replication equals integer weights") {
    val rnd = new scala.util.Random(29)
    val vals = Seq.fill(800)((rnd.nextLong() % 5000L,
      1L + rnd.nextInt(5).toLong))
    val df = vals.toDF("v", "w")
    // w = 1 everywhere == the unweighted sketch, byte-for-byte
    val unit = vals.map(p => (p._1, 1L)).toDF("v", "w")
    val a = unit.agg(rq_sketch_w(col("v"), col("w"), 64))
      .head().getAs[Array[Byte]](0)
    val b = vals.map(_._1).map(Tuple1(_)).toDF("v")
      .agg(rq_sketch(col("v"), 64)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
    // weight w == the row replicated w times, byte-for-byte
    val weighted = df.agg(rq_sketch_w(col("v"), col("w"), 64))
      .head().getAs[Array[Byte]](0)
    val replicated = vals.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
      .map(Tuple1(_)).toDF("v")
      .agg(rq_sketch(col("v"), 64)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(weighted, replicated))
    // non-positive / NULL weights drop (state stays multiset-pure)
    val dirty = (vals.map { case (v, w) => (v, Some(w)) } ++
      Seq((999999L, Some(0L)), (888888L, Some(-3L)), (777777L, None)))
      .toDF("v", "w")
    val cleaned = dirty.agg(rq_sketch_w(col("v"), col("w"), 64))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(cleaned, weighted))
  }

  test("rq_cdf is the exact sample CDF and inverts rq_quantile") {
    val rnd = new scala.util.Random(53)
    val vals = Seq.fill(5000)(rnd.nextLong() % 100000L)
    val df = vals.map(Tuple1(_)).toDF("v")
    val sk = df.agg(rq_sketch(col("v"), 128).as("sk")).localCheckpoint()
    val buf = RqSketch.deserialize(sk.head().getAs[Array[Byte]](0))
    val sorted = buf.entries.toSeq.sortBy(_._1)
    val total = sorted.map(_._2).sum
    // cdf replays cum/total at arbitrary probes, including below-all
    // and above-all
    for (probe <- Seq(Long.MinValue / 2, -500L, 0L, 1234L, 99999L)) {
      val expect = sorted.filter(_._1 <= probe).map(_._2).sum.toDouble /
        total.toDouble
      val got = sk.select(rq_cdf(col("sk"), lit(probe))).head().getDouble(0)
      assert(got == expect, s"probe $probe")
    }
    // round trip: cdf(quantile(p)) >= p for every sampled rank
    for ((num, den) <- Seq((1L, 4L), (1L, 2L), (9L, 10L))) {
      val qv = sk.select(rq_quantile(col("sk"), num, den)).head().getLong(0)
      val pct = sk.select(rq_cdf(col("sk"), lit(qv))).head().getDouble(0)
      assert(pct >= num.toDouble / den.toDouble, s"$num/$den")
    }
  }

  test("rq_sketch estimates are usefully close on a continuous column " +
    "(the regime the exact family's guards reject)") {
    // 50k distinct-ish values, budget 512 -> deep sampling; rank error
    // of the sampled quantile should stay within a few percent
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(50000)(rnd.nextInt(1000000).toLong)
    val df = vals.map(Tuple1(_)).toDF("v")
    val row = df.agg(rq_sketch(col("v"), 512).as("sk"))
      .select(rq_quantile(col("sk"), 1L, 2L),
        rq_info(col("sk")).getField("n_est")).head()
    val sorted = vals.sorted
    val rank = sorted.count(_ <= row.getLong(0)).toDouble / sorted.length
    assert(math.abs(rank - 0.5) < 0.08, s"p50 rank error too big: $rank")
    val nEst = row.getLong(1).toDouble
    assert(math.abs(nEst - 50000.0) / 50000.0 < 0.25, s"n_est off: $nEst")
  }

  test("rq_ks: equals the exact KS when the budget holds everything, " +
    "0 on identical multisets, 1 on disjoint ranges, accurate under " +
    "deep sampling") {
    // budget >= distinct values: the sketches ARE the exact histograms,
    // so rq_ks must equal Stats.ksStatistic bit-for-bit
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(2000)((rnd.nextBoolean(), rnd.nextInt(50).toLong))
    val df = rows.map { case (s, v) => (1L, s, v) }.toDF("k", "side", "v")
    val sk = df.agg(
        rq_sketch(when(col("side"), col("v")), 256).as("a"),
        rq_sketch(when(!col("side"), col("v")), 256).as("b"))
      .select(rq_ks(col("a"), col("b")).as("ks")).head().getStruct(0)
    val exact = graft.operators.Stats
      .ksStatistic(df, "k", "side", "v").head()
    assert(sk.getLong(0) == exact.getLong(1) &&
      sk.getLong(1) == exact.getLong(2))
    assert(sk.getLong(2) == exact.getLong(3), "d_num mismatch vs exact")
    assert(sk.getDouble(3) == exact.getDouble(4), "d mismatch vs exact")
    // identical multisets -> d exactly 0 (same sampled set both sides)
    val same = Seq.fill(500)(rnd.nextLong() % 100000L)
    val sameDf = same.map(Tuple1(_)).toDF("v")
    val d0 = sameDf.agg(rq_sketch(col("v"), 64).as("a"),
        rq_sketch(col("v"), 64).as("b"))
      .select(rq_ks(col("a"), col("b")).getField("d")).head().getDouble(0)
    assert(d0 == 0.0)
    // disjoint ranges -> d exactly 1
    val dis = ((1 to 300).map(i => (true, i.toLong)) ++
      (1 to 300).map(i => (false, 1000000L + i))).toDF("side", "v")
    val d1 = dis.agg(rq_sketch(when(col("side"), col("v")), 32).as("a"),
        rq_sketch(when(!col("side"), col("v")), 32).as("b"))
      .select(rq_ks(col("a"), col("b")).getField("d")).head().getDouble(0)
    assert(d1 == 1.0)
    // deep sampling on shifted distributions: the estimate lands near
    // the true D (|shift| = 30% of a uniform width -> D = 0.3)
    val ua = Seq.fill(40000)(rnd.nextInt(1000000).toLong)
    val ub = Seq.fill(40000)(300000L + rnd.nextInt(1000000).toLong)
    val big = (ua.map((true, _)) ++ ub.map((false, _))).toDF("side", "v")
    val dBig = big.agg(rq_sketch(when(col("side"), col("v")), 512).as("a"),
        rq_sketch(when(!col("side"), col("v")), 512).as("b"))
      .select(rq_ks(col("a"), col("b")).getField("d")).head().getDouble(0)
    assert(math.abs(dBig - 0.3) < 0.1, s"sampled KS too far off: $dBig")
  }

  test("kmv_set_ops: exact below k, accurate estimates above, " +
    "disjoint and identical edges") {
    def ops(a: Seq[Long], b: Seq[Long], k: Int) = {
      val df = (a.map(v => (0, v)) ++ b.map(v => (1, v))).toDF("side", "v")
        .select(col("side"), md5_long(col("v").cast("string")).as("h"))
      df.agg(
          bottom_k(when(col("side") === 0,
            struct(col("h"), col("h").as("id"))), k).as("a"),
          bottom_k(when(col("side") === 1,
            struct(col("h"), col("h").as("id"))), k).as("b"))
        .select(kmv_set_ops(col("a"), col("b"), k).as("o"))
        .select("o.*").head()
    }
    // both sets under k: the sketches ARE the sets -> everything exact
    val small = ops(1L to 20L, 11L to 35L, 64)
    assert(small.getLong(0) == 1152921504606846976L)
    assert(small.getLong(1) == 35L && small.getLong(2) == 10L)
    assert(small.getDouble(3) == 35.0 && small.getDouble(5) == 10.0)
    assert(small.getDouble(4) == 10.0 / 35.0)
    // large sets, known 50% overlap: estimates land near truth
    val a = (1L to 20000L)
    val b = (10001L to 30000L)
    val big = ops(a, b, 256)
    assert(math.abs(big.getDouble(3) - 30000.0) / 30000.0 < 0.25,
      s"union est off: ${big.getDouble(3)}")
    assert(math.abs(big.getDouble(4) - 1.0 / 3.0) < 0.15,
      s"jaccard est off: ${big.getDouble(4)}")
    // disjoint -> zero commons at any scale
    val dis = ops(1L to 5000L, 100001L to 105000L, 128)
    assert(dis.getLong(2) == 0L && dis.getDouble(5) == 0.0)
    // identical -> jaccard exactly 1 (same sample both sides)
    val same = ops(1L to 5000L, 1L to 5000L, 128)
    assert(same.getDouble(4) == 1.0)
  }

  test("cmsJoinSize never undercounts the exact join cardinality and " +
    "is exact without collisions") {
    import graft.operators.Sketches
    val rnd = new scala.util.Random(223)
    // zipf-ish key skew so the self-join size is dominated by hot keys
    val a = Seq.fill(3000)(s"k${rnd.nextInt(rnd.nextInt(80) + 1)}")
    val b = Seq.fill(2000)(s"k${rnd.nextInt(rnd.nextInt(120) + 1)}")
    val exact = {
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong)
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong)
      ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    }
    def est(w: Int): Long = Sketches.cmsJoinSize(
      a.toDF("k"), col("k"), b.toDF("k"), col("k"), 4, w)
      .collect().head.getLong(2)
    // over-count-only error, at any width
    val narrow = est(16)
    assert(narrow >= exact, s"narrow=$narrow < exact=$exact")
    // cell-exact vs the reference model: est == min over rows of the
    // counter dot product, replayed off-Spark
    def refEst(w: Int): Long = {
      val ca = refCms(a, 4, w); val cb = refCms(b, 4, w)
      (0 until 4).map { j =>
        (0 until w).map(p => ca(j * w + p) * cb(j * w + p)).sum
      }.min
    }
    assert(narrow == refEst(16))
    assert(est(512) == refEst(512) && est(512) >= exact)
    // n_a/n_b carried for the caller's relative-error readout
    val row = Sketches.cmsJoinSize(a.toDF("k"), col("k"), b.toDF("k"),
      col("k"), 4, 64).collect().head
    assert(row.getLong(0) == 3000L && row.getLong(1) == 2000L)
    // the nA·nB int64 envelope is CHECKED in-plan (test-lowered cap):
    // a product past it fails loudly instead of silently over-counting
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
        msgs(t.getCause)
    assert(msgs(intercept[Throwable] {
      Sketches.cmsJoinSize(a.toDF("k"), col("k"), b.toDF("k"), col("k"),
        4, 64, maxExactProduct = 1000L).collect()
    }).contains("cmsJoinSize"))
    // the cap itself is closed at the real capacity
    intercept[IllegalArgumentException] {
      Sketches.cmsJoinSize(a.toDF("k"), col("k"), b.toDF("k"), col("k"),
        4, 64, maxExactProduct = 5000000000000000000L)
    }
  }
}
