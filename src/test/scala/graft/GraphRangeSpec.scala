package graft

import graft.operators.{Dedup, RangeJoin, TextAnalysis}

/** Connected-components clustering and the binned range join. */
class GraphRangeSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components labels every node with the min reachable id") {
    // components: {1,2,3,4} via chain, {5,6}, singleton {7}
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val out = Dedup.connectedComponents(edges, nodes)
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connected components converges on a path graph longer than one hop") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val out = Dedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L) && out.length == n)
  }

  test("binned range join matches the interval predicate exactly") {
    val probe = Seq((1L, 5L, "p1"), (1L, 10L, "p2"), (1L, 19L, "p3"),
      (1L, 20L, "p4"), (2L, 10L, "p5")).toDF("k", "ts", "tag")
    val windows = Seq((1L, 10L, 20L, "w1"), (2L, 0L, 11L, "w2"),
      (3L, 0L, 100L, "w3")).toDF("wk", "start_ts", "end_ts", "wtag")
    val out = RangeJoin.binnedRangeJoin(probe, "k", "ts",
        windows, "wk", "start_ts", "end_ts", binSize = 7L)
      .select("tag", "wtag").as[(String, String)].collect().toSet
    // half-open [start, end): p2 and p3 in w1 (p4 at ts=20 excluded), p5 in w2
    assert(out == Set("p2" -> "w1", "p3" -> "w1", "p5" -> "w2"))
  }

  test("connected components equals union-find on seeded random graphs") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { _ =>
      val n = 8 + rnd.nextInt(23)
      val edgeList = Seq.fill(rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
      // brute-force union-find reference
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (1 to n).map { i =>
        // canonical = min node of the component
        val root = find(i)
        val minMember = (1 to n).filter(j => find(j) == root).min
        i.toLong -> minMember.toLong
      }.toMap
      // default path (small edge set -> driver union-find) vs union-find oracle
      val out = Dedup.connectedComponents(
          edgeList.toDF("a", "b"), (1 to n).map(_.toLong).toDF("id"))
        .as[(Long, Long)].collect().toMap
      assert(out == expected, s"n=$n edges=$edgeList")
      // distributed star-contraction path, forced via driverEdgeLimit=0
      val star = Dedup.connectedComponents(
          edgeList.toDF("a", "b"), (1 to n).map(_.toLong).toDF("id"),
          driverEdgeLimit = 0L)
        .as[(Long, Long)].collect().toMap
      assert(star == expected, s"star path: n=$n edges=$edgeList")
      // independently-derived min-label propagation agrees too
      val minLabel = Dedup.connectedComponentsMinLabel(
          edgeList.toDF("a", "b"), (1 to n).map(_.toLong).toDF("id"))
        .as[(Long, Long)].collect().toMap
      assert(minLabel == expected, s"min-label variant: n=$n edges=$edgeList")
    }
  }

  test("star contraction converges on a deep path graph in few rounds") {
    val n = 40
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val nodes = (1 to n).map(_.toLong).toDF("id")
    // maxIter 8 << diameter 39: only the O(log n) contraction can finish
    val out = Dedup.connectedComponentsStar(edges, nodes, maxIter = 8)
      .as[(Long, Long)].collect()
    assert(out.length == n && out.forall(_._2 == 1L))
  }

  test("binned range join equals the naive interval predicate on random data") {
    val rnd = new scala.util.Random(4815162342L)
    (1 to 5).foreach { _ =>
      val probes = Seq.fill(30)((rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong))
        .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      val windows = Seq.fill(10) {
        val s = rnd.nextInt(1000).toLong
        (rnd.nextInt(3).toLong, s, s + 1 + rnd.nextInt(120).toLong)
      }.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
      val expected = (for {
        (pk, ts, pid) <- probes
        (wk, s, e, wid) <- windows
        if pk == wk && ts >= s && ts < e
      } yield (pid, wid)).toSet
      val out = RangeJoin.binnedRangeJoin(
          probes.toDF("k", "ts", "pid"),
          "k", "ts",
          windows.toDF("wk", "start_ts", "end_ts", "wid"),
          "wk", "start_ts", "end_ts", binSize = 1 + rnd.nextInt(200).toLong)
        .select("pid", "wid").as[(Long, Long)].collect().toSet
      assert(out == expected)
    }
  }

  test("cluster-safe split is cluster-atomic and degrades to hashSplit without dups") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).toDF("doc_id")
    // chain {1,2,3}, pair {10,11}, pair {150,151}, rest singletons
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (150L, 151L)).toDF("a", "b")
    val out = TextAnalysis.clusterSafeSplit(docs, "doc_id", edges)
    // no cluster straddles splits — the whole point of the operator
    val worst = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n")).agg(max("n")).head.getLong(0)
    assert(worst == 1L, "a near-dup cluster straddles splits")
    // the chain's members all carry cluster 1's bucket
    val chain = out.where(col("doc_id").isin(1L, 2L, 3L))
      .select("split").distinct().collect()
    assert(chain.length == 1)
    // dup-free corpus: exactly hashSplit (singletons bucket by own id)
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    val safe = TextAnalysis.clusterSafeSplit(docs, "doc_id", noEdges)
      .select("doc_id", "bucket", "split").collect().map(_.toSeq).toSet
    val plain = TextAnalysis.hashSplit(docs, "doc_id")
      .collect().map(_.toSeq).toSet
    assert(safe == plain)
  }

  test("range joins accept column names needing backtick quoting") {
    import org.apache.spark.sql.functions.col
    // dots, spaces and hyphens in bound columns must parse as one
    // identifier inside the binning expressions
    val probe = Seq((1L, 5L, "p1"), (1L, 15L, "p2")).toDF("k", "event.ts", "tag")
    val windows = Seq((1L, 10L, 20L, "w1")).toDF("wk", "start ts", "end-ts", "wtag")
    val out = RangeJoin.binnedRangeJoin(probe, "k", "event.ts",
        windows, "wk", "start ts", "end-ts", binSize = 7L)
      .select("tag").as[String].collect().toSet
    assert(out == Set("p2"))
    val left = Seq((1L, 1L, 0L, 10L)).toDF("k", "lid", "s.l", "e.l")
    val right = Seq((1L, 2L, 5L, 25L)).toDF("k2", "rid", "s r", "e-r")
    val pairs = operators.RangeJoin.intervalOverlapJoin(
        left, "k", "s.l", "e.l", right, "k2", "s r", "e-r", binSize = 5L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(pairs == Set(1L -> 2L))
  }

  test("binned range join handles windows spanning many bins") {
    val probe = Seq((1L, 0L, "a"), (1L, 99L, "b"), (1L, 100L, "c")).toDF("k", "ts", "tag")
    val windows = Seq((1L, 0L, 100L, "big")).toDF("wk", "start_ts", "end_ts", "wtag")
    val out = RangeJoin.binnedRangeJoin(probe, "k", "ts",
        windows, "wk", "start_ts", "end_ts", binSize = 3L)
      .select("tag").as[String].collect().toSet
    assert(out == Set("a", "b"))
  }

  test("interval overlap join equals the theta-join and emits each pair once") {
    import org.apache.spark.sql.functions._
    // random intervals spanning MANY bins (len up to 40, binSize 5): a
    // pair sharing k bins must still surface exactly once via the
    // responsibility rule, with no distinct pass in the operator
    val rnd = new scala.util.Random(7)
    val left = (1L to 120L).map { i =>
      val s = rnd.nextInt(200).toLong; (i % 5, i, s, s + rnd.nextInt(40))
    }.toDF("k", "lid", "ls", "le")
    val right = (1L to 120L).map { i =>
      val s = rnd.nextInt(200).toLong; (i % 5, i, s, s + rnd.nextInt(40))
    }.toDF("k2", "rid", "rs", "re")
    val got = operators.RangeJoin.intervalOverlapJoin(
        left, "k", "ls", "le", right, "k2", "rs", "re", binSize = 5L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, "pair emitted more than once")
    val want = left.join(right,
        col("k") === col("k2") && col("ls") <= col("re")
          && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == want, s"missing/extra pairs: ${got.toSet.size} vs ${want.size}")
  }

  test("integer pagerank matches a driver-side reference on random graphs") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter { case (a, b) => a != b }.distinct
      val df = edges.toDF("src", "dst")
      val scale = 1000000000000L
      val iters = 4
      val got = Graph.pageRankInt(df, iters, scale)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: same integer recurrence, sequential driver loop
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val n = nodes.length.toLong
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val base = (15L * scale) / (100L * n)
      var rank = nodes.map(_ -> scale / n).toMap
      (1 to iters).foreach { _ =>
        val sums = edges.groupBy(_._2).view.mapValues(
          _.map(e => rank(e._1) / deg(e._1)).sum).toMap
        rank = nodes.map(v =>
          v -> (base + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
      }
      assert(got == rank, s"trial $trial")
      // the distributed rounds are value-identical to the driver loop
      val dist = Graph.pageRankInt(df, iters, scale, driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == rank, s"trial $trial: distributed != driver")
    }
  }

  test("weighted pagerank: driver, distributed and reference agree") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(50)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong,
        1L + rnd.nextInt(9)))
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // unique (src,dst)
    val df = edges.toDF("src", "dst", "w")
    val scale = 1000000000000L
    val got = Graph.pageRankIntWeighted(df, 4, scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.pageRankIntWeighted(df, 4, scale, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length.toLong
    val wdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3.toLong).sum).toMap
    val base = (15L * scale) / (100L * n)
    var rank = nodes.map(_ -> scale / n).toMap
    (1 to 4).foreach { _ =>
      val sums = edges.groupBy(_._2).view.mapValues(
        _.map(e => rank(e._1) * e._3 / wdeg(e._1)).sum).toMap
      rank = nodes.map(v =>
        v -> (base + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
    }
    assert(got == rank && dist == rank)
    // the rank·w int64 envelope is CHECKED in the sizing job: a weight
    // past Long.MaxValue/scale must fail loudly, not wrap a product
    val heavy = Seq((1L, 2L, 10000000L)).toDF("src", "dst", "w")
    val we = intercept[IllegalArgumentException] {
      Graph.pageRankIntWeighted(heavy, 2, scale)
    }
    assert(we.getMessage.contains("pageRankIntWeighted"))
  }

  test("clustering coefficient matches brute force on random graphs") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(43)
    val edges = Seq.fill(70)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    val got = Graph.clusteringCoefficients(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val ce = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (ce ++ ce.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    adj.foreach { case (v, nb) =>
      val ns = nb.toSeq
      val tri = (for {
        i <- ns.indices; j <- (i + 1) until ns.length
        if adj(ns(i)).contains(ns(j))
      } yield 1).size.toLong
      val deg = nb.size.toLong
      val coeff = if (deg < 2) 0.0
        else (2L * tri).toDouble / (deg * (deg - 1)).toDouble
      assert(got(v) == ((deg, tri, coeff)), s"node $v")
    }
  }

  test("k-core peel equals the fixpoint reference; driver == distributed") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3; k <- Seq(2, 3)) {
      val edges = Seq.fill(60)((rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      // reference: peel to the FIXPOINT (exact k-core)
      var pairs = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).distinct
      var changed = true
      while (changed) {
        val deg = pairs.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = pairs.filter(p => keep(p._1) && keep(p._2))
        changed = next.size != pairs.size
        pairs = next
      }
      val want = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      // rounds = |V| guarantees convergence (each non-converged round
      // removes at least one node)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val driver = rows(Graph.kCoreMembers(edges.toDF("u", "v"), k,
        rounds = 14))
      assert(driver == want, s"trial=$trial k=$k (driver path)")
      val dist = rows(Graph.kCoreMembers(edges.toDF("u", "v"), k,
        rounds = 14, driverEdgeLimit = 0L))
      assert(dist == want, s"trial=$trial k=$k (distributed path)")
    }
  }

  test("seed distances equal reference BFS; driver == distributed") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(50)((rnd.nextInt(16).toLong, rnd.nextInt(16).toLong))
      val seeds = Seq(rnd.nextInt(16).toLong, rnd.nextInt(16).toLong).distinct
      val maxHops = 4
      // reference BFS over the symmetric simple graph
      val adj = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var want = seeds.map(_ -> 0L).toMap
      (1 to maxHops).foreach { h =>
        val frontier = want.filter(_._2 == h - 1).keys
          .flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(want.contains)
        want = want ++ frontier.map(_ -> h.toLong)
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val driver = rows(Graph.seedDistances(edges.toDF("u", "v"),
        seeds.toDF("node"), maxHops))
      assert(driver == want, s"trial $trial (driver)")
      val dist = rows(Graph.seedDistances(edges.toDF("u", "v"),
        seeds.toDF("node"), maxHops, driverEdgeLimit = 0L))
      assert(dist == want, s"trial $trial (distributed)")
    }
  }

  test("triangle counts match brute force on random graphs") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(80)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      val df = edges.toDF("src", "dst")
      val got = Graph.triangleCounts(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force over the canonical simple graph
      val ce = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.distinct
      val adj = (ce ++ ce.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val nodes = adj.keySet
      val want = nodes.map { v =>
        val nb = adj(v).toSeq
        v -> (for {
          i <- nb.indices; j <- (i + 1) until nb.length
          if adj(nb(i)).contains(nb(j))
        } yield 1).size.toLong
      }.toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("triangle counts: a clique of 4 has 3 per node, a path has none") {
    import graft.operators.Graph
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("src", "dst")
    assert(Graph.triangleCounts(k4).collect()
      .forall(r => r.getLong(1) == 3L))
    val path3 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.triangleCounts(path3).collect()
      .forall(r => r.getLong(1) == 0L))
  }

  test("integer pagerank favors the hub of a star graph") {
    import graft.operators.Graph
    // star: spokes 1..5 all point at hub 0 (and back, undirected)
    val pairs = (1L to 5L).map(i => (0L, i))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val ranks = Graph.pageRankInt(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(i => ranks(0L) > ranks(i)))
    assert((1L to 5L).map(ranks).distinct.size == 1, "spokes tie exactly")
  }
  test("interval coverage matches a brute-force union on random intervals") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(53)
    val rows = Seq.fill(300) {
      val s = rnd.nextInt(200).toLong
      (rnd.nextInt(5).toLong, s, s + 1 + rnd.nextInt(30))
    }
    val got = RangeJoin.intervalCoverage(rows.toDF("k", "s", "e"),
        "k", "s", "e")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      // brute force: mark covered integer points, count maximal runs
      val pts = g.flatMap(iv => iv._2 until iv._3).toSet
      val covered = pts.size.toLong
      val segs = pts.toSeq.sorted.foldLeft((0L, Long.MinValue)) {
        case ((n, prev), p) => (if (p == prev + 1) n else n + 1, p)
      }._1
      assert(got(k) == ((covered, segs)), s"k=$k")
    }
  }

  test("interval coverage merges touching intervals") {
    import graft.operators.RangeJoin
    val df = Seq((1L, 0L, 10L), (1L, 10L, 20L), (1L, 25L, 30L))
      .toDF("k", "s", "e")
    val out = RangeJoin.intervalCoverage(df, "k", "s", "e").collect().head
    assert(out.getLong(1) == 25L && out.getLong(2) == 2L)
  }

  test("degree assortativity matches brute-force sufficient statistics " +
    "on random graphs, and signs match the known shapes") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 5) {
      val raw = Seq.fill(120)(
        (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      val edges = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      val out = Graph.degreeAssortativity(raw.toDF("src", "dst"))
        .collect().head
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
      val m = edges.size.toLong
      val sx = edges.map(e => deg(e._1) + deg(e._2)).sum
      val sxx = edges.map(e => deg(e._1) * deg(e._1)
        + deg(e._2) * deg(e._2)).sum
      val sxy = 2L * edges.map(e => deg(e._1) * deg(e._2)).sum
      assert((out.getLong(0), out.getLong(1), out.getLong(2),
        out.getLong(3)) == ((m, sx, sxx, sxy)), s"trial=$trial")
      val expected = (2L * m * sxy - sx * sx).toDouble /
        (2L * m * sxx - sx * sx).toDouble
      val got = out.getDouble(4)
      assert(got == expected ||
        (got.isNaN && expected.isNaN), s"trial=$trial")
    }
    // star graph: the hub (deg n) links only to leaves (deg 1) ->
    // maximally disassortative, r = -1
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graph.degreeAssortativity(star).collect().head.getDouble(4)
      == -1.0)
    // a disjoint pair of edges: every stub sees deg (1,1) -> zero
    // variance -> NaN (0/0) by convention
    val regular = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.degreeAssortativity(regular)
      .collect().head.getDouble(4).isNaN)
    // the M·Sxx int64 envelope is CHECKED: a 40k-leaf star carries
    // m·maxDeg = 1.6e9 > 1e9 and must fail loudly, not wrap
    import org.apache.spark.sql.functions.{col, lit}
    val hub = spark.range(1, 40001).select(lit(0L).as("src"),
      col("id").as("dst"))
    val ae = intercept[IllegalArgumentException] {
      Graph.degreeAssortativity(hub)
    }
    assert(ae.getMessage.contains("degreeAssortativity"))
  }

  test("labelPropagation: driver == distributed, two cliques converge " +
    "to their smallest members, bridge nodes join a community") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(83)
    (1 to 3).foreach { trial =>
      val n = 25
      val edges = (for {
        u <- 1 to n; v <- (u + 1) to n if rnd.nextInt(5) == 0
      } yield (u.toLong, v.toLong))
      if (edges.nonEmpty) {
        val df = edges.toDF("u", "v")
        val drv = Graph.labelPropagation(df, rounds = 4)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Graph.labelPropagation(df, rounds = 4,
            driverEdgeLimit = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(drv == dist, s"trial=$trial driver != distributed")
      }
    }
    // two 4-cliques joined by one bridge edge: after a few rounds each
    // clique carries its smallest member's label
    val cl1 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val cl2 = for (u <- 11L to 14L; v <- (u + 1) to 14L) yield (u, v)
    val g = (cl1 ++ cl2 :+ ((4L, 11L))).toDF("u", "v")
    val labels = Graph.labelPropagation(g, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 3L).forall(labels(_) == 1L),
      s"clique 1 must converge to label 1: $labels")
    assert((12L to 14L).forall(labels(_) == 11L),
      s"clique 2 must converge to label 11: $labels")
  }

  test("personalizedPageRankInt: driver == distributed, seed proximity " +
    "orders ranks, the checked seed bound fires") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(84)
    (1 to 3).foreach { trial =>
      val edges = (for {
        u <- 1 to 20; v <- 1 to 20 if u != v && rnd.nextInt(5) == 0
      } yield (u.toLong, v.toLong))
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val seeds = Seq(Tuple1(edges.head._1)).toDF("node")
        val drv = Graph.personalizedPageRankInt(df, seeds, 4)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Graph.personalizedPageRankInt(df, seeds, 4,
            driverEdgeLimit = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(drv == dist, s"trial=$trial driver != distributed")
      }
    }
    // a chain 1->2->3->4 seeded at 1: rank decays monotonically with
    // hop distance, and only the seed holds the teleport base
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.personalizedPageRankInt(chain,
        Seq(Tuple1(1L)).toDF("node"), iterations = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L),
      s"proximity order broke: $r")
    // an unreachable node gets rank 0 (no teleport off-seed)
    val withIsland = (Seq((1L, 2L), (5L, 6L))).toDF("src", "dst")
    val ri = Graph.personalizedPageRankInt(withIsland,
        Seq(Tuple1(1L)).toDF("node"), iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(ri(5L) == 0L && ri(6L) == 0L && ri(2L) > 0L)
    // the seed-count contract is CHECKED
    val e = intercept[IllegalArgumentException] {
      Graph.personalizedPageRankInt(chain,
        spark.emptyDataFrame.select(org.apache.spark.sql.functions
          .lit(1L).as("node")).where("false"), 2)
    }
    assert(e.getMessage.contains("personalizedPageRankInt"))
  }

  test("modularity matches the brute-force Newman score; the trivial " +
    "one-community partition scores exactly 0") {
    import graft.operators.Graph
    val cl1 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val cl2 = for (u <- 5L to 8L; v <- (u + 1) to 8L) yield (u, v)
    val edges = (cl1 ++ cl2 :+ ((4L, 5L)))
    val g = edges.toDF("u", "v")
    def brute(labels: Map[Long, Long]): Double = {
      val m = edges.size
      val dc = edges.flatMap(e => Seq(labels(e._1), labels(e._2)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      // .toSeq: mapping over the key SET would collapse equal terms
      val num = dc.keys.toSeq.map(c => BigInt(4L) * m *
        edges.count(e => labels(e._1) == c && labels(e._2) == c)
        - BigInt(dc(c)) * dc(c)).sum
      num.toDouble / (BigInt(4L) * m * m).toDouble
    }
    val perfect = ((1L to 4L).map(_ -> 1L) ++ (5L to 8L).map(_ -> 5L)).toMap
    val out = Graph.modularity(g, perfect.toSeq.toDF("node", "label"))
      .collect().head
    assert(out.getLong(0) == edges.size)
    assert(out.getLong(1) == 2L)
    assert(out.getDouble(3) == brute(perfect),
      s"got ${out.getDouble(3)}, want ${brute(perfect)}")
    // one community holding everything: Q = e/m - (2m/2m)^2 = 0 exactly
    val one = (1L to 8L).map(_ -> 1L).toMap
    assert(Graph.modularity(g, one.toSeq.toDF("node", "label"))
      .collect().head.getDouble(3) == 0.0)
    // edges with an unlabeled endpoint drop: judge only the partition
    val partial = Graph.modularity(g,
      (1L to 4L).map(_ -> 1L).toSeq.toDF("node", "label")).collect().head
    assert(partial.getLong(0) == cl1.size && partial.getDouble(3) == 0.0)
  }

  test("hitsInt matches the brute-force unnormalized trajectory and " +
    "checks rounds + growth contracts") {
    import graft.operators.Graph
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 2L))
    val out = Graph.hitsInt(edges.toDF("src", "dst"), rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // brute: exact integer half-rounds, one normalization at the end
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var hub = nodes.map(_ -> BigInt(1)).toMap
    var auth = hub
    (1 to 2).foreach { _ =>
      auth = nodes.map(v => v ->
        edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap
      hub = nodes.map(u => u ->
        edges.filter(_._1 == u).map(e => auth(e._2)).sum).toMap
    }
    val mh = hub.values.max; val ma = auth.values.max
    nodes.foreach { v =>
      assert(out(v)._1 == hub(v).toDouble / mh.toDouble, s"hub $v")
      assert(out(v)._2 == auth(v).toDouble / ma.toDouble, s"auth $v")
    }
    // the distributed rounds are value-identical to the driver loop
    val dist = Graph.hitsInt(edges.toDF("src", "dst"), rounds = 2,
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(dist == out, "hitsInt: distributed != driver")
    // rounds contract
    intercept[IllegalArgumentException] {
      Graph.hitsInt(edges.toDF("src", "dst"), rounds = 9)
    }
    // the decimal(38,0) growth ladder is CHECKED before any round runs:
    // a 70k-out-degree star at 8 rounds reaches ~(7e4)^8 > 1e36
    val star = spark.range(70000).select(
      org.apache.spark.sql.functions.lit(0L).as("src"),
      (org.apache.spark.sql.functions.col("id") + 1L).as("dst"))
    val e = intercept[IllegalArgumentException] {
      Graph.hitsInt(star, rounds = 8)
    }
    assert(e.getMessage.contains("hitsInt"))
  }

  test("sccMembership equals a brute reachability reference; " +
    "driver == distributed; cycles and tails classify correctly") {
    import graft.operators.Graph
    // hand graph: 3-cycle a->b->c->a, tail a->d, isolated pair e<->f
    val hand = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"),
      ("e", "f"), ("f", "e"))
    val got = Graph.sccMembership(hand.toDF("src", "dst"),
        Seq("a", "e").toDF("node"), maxHops = 4)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)),
          Option(r.getString(3)))).toMap
    assert(got("a") == (Some("a"), Some("a"), Some("a")))
    assert(got("b") == (Some("a"), Some("a"), Some("a")))
    assert(got("c") == (Some("a"), Some("a"), Some("a")))
    assert(got("d") == (Some("a"), None, None), "tail: reached, no cycle")
    assert(got("e") == (Some("e"), Some("e"), Some("e")))
    assert(got("f") == (Some("e"), Some("e"), Some("e")))
    // regression: a smaller seed strictly UPSTREAM of another seed's
    // ring must not mask the detection (the min-label reduction did:
    // fwd carried seed 1 while bwd carried seed 2) — seeds {1, 2},
    // 1→2, 2→3, 3→2: nodes 2 and 3 ARE seed 2's SCC
    val up = Graph.sccMembership(
        Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst"),
        Seq(1L, 2L).toDF("node"), maxHops = 3)
      .collect().map { r =>
        def o(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> (o(1), o(2), o(3))
      }.toMap
    assert(up(2L) == (Some(1L), Some(2L), Some(2L)), s"got ${up(2L)}")
    assert(up(3L) == (Some(1L), Some(2L), Some(2L)), s"got ${up(3L)}")
    // a seed is trivially its own SCC anchor
    assert(up(1L) == (Some(1L), Some(1L), Some(1L)), s"got ${up(1L)}")
    // random graphs vs a brute per-seed bounded transitive closure
    val rnd = new scala.util.Random(57)
    (1 to 4).foreach { trial =>
      val edges = Seq.fill(34)(
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq(rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)
        .distinct
      val h = 1 + rnd.nextInt(5)
      def reach(es: Seq[(Long, Long)], s: Long): Set[Long] = {
        var seen = Set(s); var frontier = Set(s); var round = 0
        while (round < h && frontier.nonEmpty) {
          frontier = es.filter(e => frontier(e._1)).map(_._2).toSet -- seen
          seen ++= frontier; round += 1
        }
        seen
      }
      val fwdSets = seeds.map(s => s -> reach(edges, s)).toMap
      val bwdSets = seeds.map(s =>
        s -> reach(edges.map(e => (e._2, e._1)), s)).toMap
      val nodes = fwdSets.values.flatten.toSet ++ bwdSets.values.flatten
      val want = nodes.map { v =>
        def minOf(m: Map[Long, Set[Long]]) = {
          val hit = seeds.filter(s => m(s)(v))
          if (hit.isEmpty) None else Some(hit.min)
        }
        // SCC membership = SOME seed reaches v both ways (the full
        // set intersection, not agreement of the two minima)
        val both = seeds.filter(s => fwdSets(s)(v) && bwdSets(s)(v))
        v -> (minOf(fwdSets), minOf(bwdSets),
          if (both.isEmpty) None else Some(both.min))
      }.toMap
      def run(limit: Long) = Graph.sccMembership(edges.toDF("src", "dst"),
          seeds.toDF("node"), h, driverEdgeLimit = limit)
        .collect().map { r =>
          def o(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          r.getLong(0) -> (o(1), o(2), o(3))
        }.toMap
      assert(run(1L << 20) == want, s"trial $trial (driver)")
      assert(run(0L) == want, s"trial $trial (distributed)")
    }
  }

  test("peakConcurrency matches the brute sweep with half-open " +
    "semantics and earliest onset") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(228)
    val iv = (1 to 2).flatMap { k =>
      Seq.fill(200) {
        val s = rnd.nextInt(100).toLong
        (k.toLong, s, s + 1L + rnd.nextInt(12).toLong)
      }
    }
    val got = RangeJoin.peakConcurrency(iv.toDF("k", "s", "e"),
        "k", "s", "e")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    iv.groupBy(_._1).foreach { case (k, g) =>
      // brute: live count at every point p = intervals with s <= p < e
      val pts = g.flatMap(i => Seq(i._2, i._3)).distinct.sorted
      val live = pts.map(p => p -> g.count(i => i._2 <= p && p < i._3))
      val peak = live.map(_._2).max
      val at = live.filter(_._2 == peak).map(_._1).min
      assert(got(k) == ((peak.toLong, at)), s"k=$k got=${got(k)}")
    }
    // touching intervals [0,5) + [5,9) never overlap
    val touch = Seq((9L, 0L, 5L), (9L, 5L, 9L)).toDF("k", "s", "e")
    assert(RangeJoin.peakConcurrency(touch, "k", "s", "e")
      .collect().head.getLong(1) == 1L)
    // zero-length intervals are rejected
    intercept[IllegalArgumentException] {
      RangeJoin.peakConcurrency(Seq((1L, 4L, 4L)).toDF("k", "s", "e"),
        "k", "s", "e")
    }
    // NULL boundaries are rejected by the same pinned-input guard (a
    // NULL start would silently vanish from the un-pinned comparison)
    intercept[IllegalArgumentException] {
      RangeJoin.peakConcurrency(
        Seq((1L, Some(4L), None), (1L, Some(1L), Some(2L)))
          .toDF("k", "s", "e"), "k", "s", "e")
    }
  }

  test("pairBetweenness: driver == distributed == brute Brandes pair " +
    "dependencies on random graphs; sigma guard fires on both paths") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(237)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60)(
        (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
        .filter(e => e._1 != e._2).distinct
      val adj = (edges ++ edges.map(_.swap)).distinct.groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val prs = Seq((0L, 9L), (1L, 12L), (3L, 7L))
      val maxDepth = 4
      def bfs(s: Long): Map[Long, (Long, Long)] = {
        var dist = Map(s -> (0L, 1L)); var fr = Seq(s)
        (1 to maxDepth).foreach { d =>
          val nxt = scala.collection.mutable.Map.empty[Long, Long]
          fr.foreach { x =>
            adj.getOrElse(x, Set.empty).foreach { y =>
              if (!dist.contains(y))
                nxt(y) = nxt.getOrElse(y, 0L) + dist(x)._2
            }
          }
          nxt.foreach { case (y, sg) => dist += y -> (d.toLong, sg) }
          fr = nxt.keys.toSeq
        }
        dist
      }
      // brute: per-node sorted pair fractions folded in idx order —
      // the exact float shape the operator commits to
      val fracs = scala.collection.mutable
        .Map.empty[Long, List[(Long, Long, Long)]]
      prs.zipWithIndex.foreach { case ((s, t), idx) =>
        val fs = bfs(s); val ft = bfs(t)
        fs.get(t).foreach { case (dst, sigst) =>
          fs.foreach { case (v, (dsv, sigsv)) =>
            ft.get(v).foreach { case (dvt, sigvt) =>
              if (v != s && v != t && dsv + dvt == dst)
                fracs(v) = fracs.getOrElse(v, Nil) :+
                  ((idx.toLong, sigsv * sigvt, sigst))
            }
          }
        }
      }
      val expect = fracs.map { case (v, fs) =>
        v -> ((fs.size.toLong,
          fs.sortBy(_._1).foldLeft(0.0) { case (acc, (_, n, d)) =>
            acc + n.toDouble / d.toDouble }))
      }.toMap
      val df = edges.toDF("src", "dst")
      def run(limit: Long) =
        Graph.pairBetweenness(df, prs, maxDepth, driverEdgeLimit = limit)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
          .toMap
      val drv = run(1L << 20)
      val dist = run(0L)
      assert(drv == expect, s"trial $trial driver != brute")
      assert(dist == expect, s"trial $trial distributed != brute")
    }
    // sigma guard: a diamond (two equal-length paths) at maxSigma = 1
    // must fail loudly on BOTH paths, not wrap silently
    val diamond = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
        msgs(t.getCause)
    Seq(1L << 20, 0L).foreach { limit =>
      assert(msgs(intercept[Throwable] {
        Graph.pairBetweenness(diamond, Seq((0L, 3L)), maxDepth = 3,
          maxSigma = 1L, driverEdgeLimit = limit).collect()
      }).contains("pairBetweenness"), s"limit=$limit")
    }
  }

  test("linkPrediction finds the missing edge of an almost-clique and " +
    "checks the degree bound") {
    import graft.operators.Graph
    // K5 minus the (1,2) edge: 1 and 2 share neighbors {3,4,5} -> the
    // top candidate must be (1,2) with cn=3, jaccard=3/(3+3-3)=1.0
    val full = for (u <- 1L to 5L; v <- (u + 1) to 5L) yield (u, v)
    val g = full.filterNot(_ == ((1L, 2L))).toDF("u", "v")
    val top = Graph.linkPrediction(g, minCommon = 1L, k = 3)
      .collect().head
    assert((top.getLong(0), top.getLong(1), top.getLong(2)) == ((1L, 2L, 3L)))
    assert(top.getDouble(3) == 1.0)
    // existing edges never come back as candidates
    val all = Graph.linkPrediction(g, minCommon = 1L, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.intersect(full.filterNot(_ == ((1L, 2L))).toSet).isEmpty)
    // the wedge fan-out contract is CHECKED
    val hub = (1L to 50L).map(i => (0L, i)).toDF("u", "v")
    val e = intercept[IllegalArgumentException] {
      Graph.linkPrediction(hub, minCommon = 1L, k = 5, maxDegree = 10L)
    }
    assert(e.getMessage.contains("linkPrediction"))
  }
}
