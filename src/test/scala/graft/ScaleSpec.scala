package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Scale-path mechanisms: salted aggregation equivalence, IVF ANN, and
  * bucketed joins planning without a shuffle. */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("salted exact clusters equal the plain groupBy result") {
    val docs = (1L to 200L).map(i => (i, s"text-${i % 23}")).toDF("id", "text")
    val plain = Dedup.exactClusters(docs, "id", "text")
      .orderBy("text_hash").collect().toSeq
    val salted = Dedup.exactClustersSalted(docs, "id", "text", salts = 8)
      .orderBy("text_hash").collect().toSeq
    assert(plain == salted)
  }

  test("IVF top-k finds the identical vector in the probed cells") {
    val vecs = (0L until 40L).map { i =>
      val base = Array.tabulate(8)(d => if (d == (i % 4).toInt) 1.0f else 0.05f * d)
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") === 20L) // duplicate of pattern i%4==0
    val top = Similarity.ivfTopK(vecs, queries, k = 3, nCells = 4, nProbe = 2)
      .orderBy("rank").collect()
    assert(top.nonEmpty)
    // rank-1 candidate shares the query's direction (cos ~ 1)
    assert(top(0).getAs[Double]("cos_sim") > 0.99)
  }

  test("ivf_assign/ivf_probes match a driver-side argmax-cosine reference") {
    val rnd = new scala.util.Random(11)
    val dim = 6
    val cents = Array.fill(5, dim)(rnd.nextDouble() * 2 - 1)
    // include exact copies of centroids (score ties with themselves at 1.0
    // up to rounding) and scaled copies (exact cosine ties between two
    // different cells' scores are exercised by duplicated centroids below)
    val dupCents = cents.updated(4, cents(0).map(_ * 2.0)) // cell 4 ∥ cell 0
    val vecs = (0 until 50).map { i =>
      val v = if (i < 5) dupCents(i % 5).map(_.toFloat)
      else Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      (i.toLong, v.toSeq)
    }
    def scoresOf(v: Array[Float]): Array[Double] = {
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      dupCents.map { c =>
        var s = 0.0; var k = 0
        while (k < dim) { s += v(k).toDouble * c(k); k += 1 }
        s / (nv * math.sqrt(c.map(x => x * x).sum))
      }
    }
    def cmp(x: Double, y: Double) = if (x == y) 0 else java.lang.Double.compare(x, y)
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.ivf_assign(col("embedding"), dupCents).as("cell"),
        graft.functions.ivf_probes(col("embedding"), dupCents, 3).as("probes"))
      .orderBy("vec_id").collect()
    vecs.zip(df).foreach { case ((id, v), row) =>
      val s = scoresOf(v.toArray)
      // earliest index on ties (parallel centroids 0 and 4 give equal cosine)
      val expectAssign = s.indices.reduceLeft((a, b) => if (cmp(s(a), s(b)) >= 0) a else b)
      assert(row.getInt(1) == expectAssign, s"assign mismatch at vec $id")
      val expectProbes = s.indices.sortWith { (a, b) =>
        val c = cmp(s(a), s(b)); if (c != 0) c > 0 else a > b
      }.take(3)
      assert(row.getSeq[Int](2) == expectProbes, s"probes mismatch at vec $id")
    }
  }

  test("pq_encode/pqTopK: codes match a driver-side argmin and exact dups rank first") {
    val rnd = new scala.util.Random(13)
    val dim = 12
    val m = 3
    val sub = dim / m
    val vecs = (0L until 40L).map { i =>
      // vectors 20..23 are exact copies of 0..3 → PQ codes identical,
      // ADC distance to the twin == ADC distance to self's cell == min
      val v = if (i >= 20 && i < 24) null
      else Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      (i, v)
    }
    val filled = vecs.map { case (i, v) =>
      (i, Option(v).getOrElse(vecs((i - 20).toInt)._2).toSeq)
    }
    val df = filled.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(df, m, ks = 8)
    assert(cb.length == m && cb.head.length == 8 && cb.head.head.length == sub)
    // driver-side reference encode: per-subspace argmin, earliest wins
    def encodeRef(v: Seq[Float]): Seq[Int] =
      (0 until m).map { mi =>
        val d = cb(mi).map { c =>
          var s = 0.0; var k = 0
          while (k < sub) {
            val t = v(mi * sub + k).toDouble - c(k); s += t * t; k += 1
          }
          s
        }
        d.indices.reduceLeft((a, b) => if (d(b) < d(a)) b else a)
      }
    val got = df.select(col("vec_id"),
        graft.functions.pq_encode(col("embedding"), cb).as("codes"))
      .orderBy("vec_id").collect()
    filled.zip(got).foreach { case ((id, v), row) =>
      assert(row.getSeq[Int](1) == encodeRef(v), s"encode mismatch at vec $id")
    }
    // the exact twin is among the zero-extra-distance front: ADC distance
    // query→twin equals the query's own code distance (same codes)
    val top = Similarity.pqTopK(df, df.where(col("vec_id") === 20L), k = 3,
        m = m, ks = 8).orderBy("rank").collect()
    assert(top.nonEmpty)
    val twinDist = top.find(_.getAs[Long]("cand_id") == 0L).map(_.getAs[Long]("adc_micro"))
    assert(twinDist.contains(top(0).getAs[Long]("adc_micro")),
      s"exact twin not at the minimum ADC distance: ${top.toSeq}")
  }

  test("persisted IVFADC: full probe == flat ADC, restricted probe prunes cell partitions") {
    val rnd = new scala.util.Random(17)
    val dim = 8
    val df = (0L until 60L).map(i =>
      (i, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    Similarity.buildPqIndex(df, dir, m = 4, ks = 8, nCells = 4)
    val idx = Similarity.loadPqIndex(spark, dir)
    assert(idx.centroids.length == 4 && idx.codebooks.length == 4 &&
      idx.codebooks.head.length == 8 && idx.codebooks.head.head.length == 2)
    // probing every cell through the persisted index reproduces the
    // flat-scan ADC exactly (the q97 oracle gate's claim, spark-side)
    val queries = df.where(col("vec_id") < 3)
    val full = Similarity.ivfPqTopK(idx, queries, k = 4, nProbe = 4)
      .orderBy("query_id", "rank").collect().toSeq
    val flat = Similarity.pqTopK(df, queries, k = 4, m = 4, ks = 8)
      .orderBy("query_id", "rank").collect().toSeq
    assert(full == flat)
    // restricted probe: the probed-cell set becomes a LITERAL partition
    // filter, so the parquet scan prunes every other cell's files —
    // PartitionFilters must be non-empty at the scan node
    val q0 = df.where(col("vec_id") === 0L)
    val restricted = Similarity.ivfPqTopK(idx, q0, k = 4, nProbe = 1)
    val plan = restricted.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe restriction did not reach the scan as a partition filter:\n$plan")
    // and every returned candidate really lives in the probed cell
    val probed = q0.select(explode(
        graft.functions.ivf_probes(col("embedding"), idx.centroids, 1)))
      .collect().map(_.getInt(0)).toSet
    val cellOf = idx.codes.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cands = restricted.select("cand_id").collect().map(_.getLong(0))
    assert(cands.nonEmpty && cands.forall(c => probed.contains(cellOf(c))))
  }

  test("updatePqIndex re-encodes only added/changed vectors against fixed codebooks") {
    import graft.operators.Snapshot
    val rnd = new scala.util.Random(23)
    val dim = 8
    def vec() = Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val prevRows = (0L until 40L).map(i => (i, vec()))
    val prev = prevRows.toDF("vec_id", "embedding")
    // cur: vec 5 changed, vec 7 removed, vec 50 added
    val curRows = prevRows.filterNot(_._1 == 7L).map {
      case (5L, v) => (5L, v.map(x => x + 0.5f))
      case r => r
    } :+ (50L, vec())
    val cur = curRows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pqdelta").toString
    Similarity.buildPqIndex(prev, dir, m = 4, ks = 8, nCells = 4)
    val idx = Similarity.loadPqIndex(spark, dir)
    val d = Snapshot.delta(prev, cur, "vec_id",
      Snapshot.vecFingerprint(col("embedding")))
    // TAMPER vec 0's stored codes: unchanged rows must survive verbatim
    val tampered = idx.copy(codes = idx.codes.withColumn("codes",
      when(col("vec_id") === 0L, typedLit(Seq(-1, -1, -1, -1)))
        .otherwise(col("codes"))))
    val out = Similarity.updatePqIndex(tampered, d, cur).collect()
    assert(out.find(_.getLong(0) == 0L).get.getSeq[Int](2) == Seq(-1, -1, -1, -1),
      "unchanged vector was re-encoded")
    assert(!out.exists(_.getLong(0) == 7L), "removed vector not retired")
    // changed + added rows equal a fresh encode with the SAME index
    // codebooks (never retrained by a delta)
    val expect = cur.where(col("vec_id").isin(5L, 50L))
      .select(col("vec_id"),
        graft.functions.ivf_assign(col("embedding"), idx.centroids).as("cell"),
        graft.functions.pq_encode(col("embedding"), idx.codebooks).as("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val got = out.filter(r => r.getLong(0) == 5L || r.getLong(0) == 50L)
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(got == expect)
  }

  test("trained k-means recovers well-separated cluster means and full-probe IVF is exact") {
    val rnd = new scala.util.Random(5)
    val dim = 4
    // 3 tight clusters on orthogonal axes
    val vecs = (0L until 60L).map { i =>
      val axis = (i % 3).toInt
      val v = Array.tabulate(dim)(d =>
        (if (d == axis) 1.0 else 0.0) + rnd.nextDouble() * 0.01).map(_.toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, nCells = 3, iters = 5)
    // every trained centroid is dominated by exactly one axis, each axis taken once
    val axes = cents.map(c => c.indexOf(c.max)).sorted
    assert(axes.toSeq == Seq(0, 1, 2), s"centroids did not separate: ${cents.map(_.toSeq).toSeq}")
    // determinism: same codebook regardless of partitioning (integer-sum means)
    val cents2 = Similarity.kmeansCentroids(vecs.repartition(7), nCells = 3, iters = 5)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
    // probing every cell makes IVF exhaustive == brute force
    val queries = vecs.where(col("vec_id") < 3)
    val ivf = Similarity.ivfTopK(vecs, queries, k = 4, nCells = 3, nProbe = 3,
        centroids = cents)
      .select("query_id", "cand_id", "cos_sim", "rank")
      .orderBy("query_id", "rank").collect().toSeq
    val bf = Similarity.bruteForceTopK(vecs, queries, k = 4)
      .select("query_id", "cand_id", "cos_sim", "rank")
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == bf)
  }

  test("annRecallAudit counts intersection hits exactly; ivfRecallSweep " +
    "is monotone in nProbe and closes at recall 1.0 when every cell " +
    "is probed; duplicate pairs rejected") {
    val rnd = new scala.util.Random(331)
    val vecs = (0L until 60L).map { i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(vecs, queries, k = 5)
    // brute check of the audit on one ANN table
    val ann = Similarity.ivfTopK(vecs, queries, k = 5, nCells = 4,
      nProbe = 1)
    val got = Similarity.annRecallAudit(ann, truth)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val tSet = truth.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val aSet = ann.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    tSet.groupBy(_._1).foreach { case (q, ts) =>
      val hits = ts.count(aSet.contains)
      val want = (ts.size.toLong, hits.toLong,
        hits.toLong * 1000000L / ts.size)
      assert(got(q) == want, s"query $q: ${got(q)} != $want")
    }
    // sweep: recall non-decreasing in nProbe, exhaustive probe == 1.0
    val sweep = Similarity.ivfRecallSweep(vecs, queries, k = 5,
        nCells = 4, nProbes = Seq(1, 2, 4))
      .orderBy("n_probe").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(sweep.map(_._1).toSeq == Seq(1L, 2L, 4L))
    assert(sweep.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      s"recall not monotone: ${sweep.toSeq}")
    assert(sweep.last._2 == 1000000L && sweep.last._3 == 1000000L)
    val e = intercept[IllegalArgumentException] {
      Similarity.annRecallAudit(ann.unionByName(ann.limit(1)), truth)
        .collect()
    }
    assert(e.getMessage.contains("double-count"))
  }

  test("dimRecallSweep closes at 1.0 on the full dimension; " +
    "marginBitextMine equals the brute margin criterion and rejects " +
    "overlapping id sets") {
    val rnd = new scala.util.Random(733)
    val vecs = (0L until 50L).map { i =>
      (i, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val sweep = Similarity.dimRecallSweep(vecs,
        vecs.where(col("vec_id") < 6), k = 4, dims = Seq(4, 16))
      .orderBy("dim").collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(sweep.last == ((16L, 1000000L)))
    assert(sweep.head._2 <= 1000000L)
    // margin mining vs a plain-Scala reference over collected cosines
    val xs = vecs.where(col("vec_id") % 2 === 0)
    val ys = vecs.where(col("vec_id") % 2 === 1)
    val k = 3
    val got = Similarity.marginBitextMine(xs, ys, k, 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4))).toMap
    val all = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      def nrm(x: Array[Double]) =
        math.sqrt(x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * x(i)))
      val c6 = BigDecimal(dot / (nrm(a) * nrm(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(c6 * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val xIds = all.keys.filter(_ % 2 == 0).toSeq.sorted
    val yIds = all.keys.filter(_ % 2 == 1).toSeq.sorted
    def top(q: Long, cands: Seq[Long]) = cands
      .map(c => (c, cosMicro(all(q), all(c))))
      .sortBy(p => (-p._2, p._1)).take(k)
    val xTop = xIds.map(x => x -> top(x, yIds)).toMap
    val yTop = yIds.map(y => y -> top(y, xIds)).toMap
    val expected = xIds.flatMap { x =>
      val (y, c) = xTop(x).head
      if (yTop(y).head._1 == x) {
        val (sxV, nx) = (xTop(x).map(_._2).sum, xTop(x).size.toLong)
        val (syV, ny) = (yTop(y).map(_._2).sum, yTop(y).size.toLong)
        val den = sxV * ny + syV * nx
        val m = if (den > 0 && c >= 0)
          Some(2L * c * nx * ny * 1000000L / den) else None
        Some((x, y) -> (c, m, m.exists(_ >= 1000000L)))
      } else None
    }.toMap
    assert(got == expected && got.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      Similarity.marginBitextMine(xs, xs, k, 1000000L).collect()
    }
    assert(e.getMessage.contains("BOTH sets"))
  }

  test("marginBitextMineFromTopK accepts any ranked kNN source (brute " +
    "== wrapper, IVF-fed mines cross-side pairs) and enforces the " +
    "broadcast, rank-1-uniqueness and neighborhood contracts") {
    val rnd = new scala.util.Random(881)
    val vecs = (0L until 40L).map { i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val xs = vecs.where(col("vec_id") % 2 === 0)
    val ys = vecs.where(col("vec_id") % 2 === 1)
    val k = 3
    val viaWrapper = Similarity.marginBitextMine(xs, ys, k, 1000000L)
      .collect().map(_.toSeq).toSet
    val viaTopK = Similarity.marginBitextMineFromTopK(
      Similarity.bruteForceTopK(ys, xs, k),
      Similarity.bruteForceTopK(xs, ys, k), 1000000L)
      .collect().map(_.toSeq).toSet
    assert(viaWrapper == viaTopK && viaTopK.nonEmpty,
      "brute-fed FromTopK must equal the wrapper exactly")
    // IVF-fed: same composition over the index's ranked tables —
    // pairs stay cross-side and margins stay integral micro
    val ivfMined = Similarity.marginBitextMineFromTopK(
      Similarity.ivfTopK(ys, xs, k, nCells = 4, nProbe = 2),
      Similarity.ivfTopK(xs, ys, k, nCells = 4, nProbe = 2), 1000000L)
      .collect()
    assert(ivfMined.nonEmpty)
    ivfMined.foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
      assert(Option(r.get(3)).forall(_.asInstanceOf[Long] >= 0L))
    }
    // broadcast bound: loud, names the index-backed remedy
    val eB = intercept[IllegalArgumentException] {
      Similarity.marginBitextMine(xs, ys, k, 1000000L,
        maxBroadcastRows = 5L)
    }
    assert(eB.getMessage.contains("broadcast contract") &&
      eB.getMessage.contains("marginBitextMineFromTopK"))
    // a kNN source with a duplicated rank 1 would fabricate pairs
    val dup = Seq((1L, 2L, 0.9, 1), (1L, 3L, 0.9, 1))
      .toDF("query_id", "cand_id", "cos_sim", "rank")
    val eR = intercept[IllegalArgumentException] {
      Similarity.marginBitextMineFromTopK(dup, dup, 0L)
    }
    assert(eR.getMessage.contains("rank-1"))
    // neighborhoods above 1000 would overflow the int64 margin
    val wide = spark.range(1001).select(lit(7L).as("query_id"),
      col("id").as("cand_id"), lit(0.5).as("cos_sim"),
      (col("id") + 1).cast("int").as("rank"))
    val eN = intercept[IllegalArgumentException] {
      Similarity.marginBitextMineFromTopK(wide, wide, 0L)
    }
    assert(eN.getMessage.contains("neighborhoods"))
  }

  test("allButTheTop deflates the planted dominant direction — " +
    "residual top share collapses and per-row v1-orthogonality holds " +
    "to the truncation bound") {
    val rnd = new scala.util.Random(1201)
    val w = Array.fill(8)(rnd.nextDouble() * 2 - 1)
    val vecs = (0L until 60L).map { i =>
      val a = rnd.nextDouble() * 4 - 2
      (i, (0 until 8).map(d =>
        (a * w(d) + (rnd.nextDouble() - 0.5) * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val audit = Similarity.topPrincipalComponent(vecs, "embedding")
      .collect().sortBy(_.getLong(0))
    val before = audit.head.getDouble(3)
    val v1 = audit.map(_.getLong(1))
    val out = Similarity.allButTheTop(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 60 * 8)
    val byRow = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    // per-row orthogonality to v1 within the truncation bound:
    // p_i = r_i - (v1_i*t) div den leaves |Σ v1_i p_i| < Σ|v1_i|
    val bound = v1.map(x => BigInt(x).abs).sum
    byRow.values.foreach { p =>
      val dot = p.indices.map(i => BigInt(v1(i)) * p(i)).sum
      assert(dot.abs <= bound, s"residual v1-dot $dot exceeds $bound")
    }
    // the transform REMOVES the anisotropy the audit measured (share
    // is scale-invariant, so the descale factor is arbitrary)
    val resid = byRow.toSeq.map { case (id, p) =>
      (id, p.map(x => (x.toDouble / 1e8).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val after = Similarity.topPrincipalComponent(resid, "embedding")
      .select(col("top_share")).head().getDouble(0)
    assert(before > 0.8, s"fixture must be anisotropic, got $before")
    assert(after < before / 2,
      s"deflation must collapse the top share: $before -> $after")
  }

  test("hardNegatives drops same-label candidates NULL-safely and " +
    "re-ranks survivors deterministically from any ranked source") {
    // hand-built ranked table: anchor 1 (label A), anchor 2 (NULL)
    val topk = Seq(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2), (1L, 12L, 0.7, 3),
      (1L, 13L, 0.7, 4),
      (2L, 10L, 0.95, 1), (2L, 14L, 0.6, 2))
      .toDF("query_id", "cand_id", "cos_sim", "rank")
    val labels = Seq((1L, "A"), (2L, null: String), (10L, "A"),
      (11L, "B"), (12L, "B"), (13L, "C"), (14L, null: String))
      .toDF("vec_id", "label")
    val got = Similarity.hardNegatives(topk, labels, "vec_id", "label",
        n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    // anchor 1: cand 10 shares label A -> dropped; survivors by
    // (cos DESC, id ASC): 11 then 12 (13 ties 12 on cos, loses on id)
    // anchor 2 (NULL label): cand 14's NULL label MATCHES null-safely
    // -> dropped as a positive; labeled cand 10 survives
    assert(got == Set((1L, 11L, 1L), (1L, 12L, 2L), (2L, 10L, 1L)),
      s"got $got")
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(topk, labels, "vec_id", "label", n = 0)
    }
    val eD = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(topk.unionByName(topk.limit(1)), labels,
        "vec_id", "label", n = 2)
    }
    assert(eD.getMessage.contains("repeats"))
    // a repeated id in the LABELS table fans out both label joins —
    // rejected loudly, same dedup discipline as the kNN-pair check
    val eL = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(topk, labels.unionByName(labels.limit(1)),
        "vec_id", "label", n = 2)
    }
    assert(eL.getMessage.contains("labels table repeats"), eL.getMessage)
  }

  test("q346 substring-dedup recall grid pins the alignment law: " +
    "relative stride misalignment never detects, aligned copies need " +
    "L >= 16 + ((-o) mod 8), multi-window spans count every window") {
    val tmp = java.nio.file.Files.createTempDirectory("sraudit").toString
    spark.range(32).select(col("id").as("doc_id"), lit("x").as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        lit(1L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Queries.all("q346_substring_recall").impl(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(rows.size == 16 && rows.values.forall(_._1 == 2L),
      s"32 docs = 2 pairs per case: $rows")
    val caught = Set(0L, 1L, 3L, 8L, 9L, 10L, 12L, 13L, 14L)
    for (c <- 0L until 16L) {
      val (_, det, _, recall) = rows(c)
      if (caught(c))
        assert(det == 2L && recall == 1000000L, s"case $c must be caught")
      else
        assert(det == 0L && recall == 0L, s"case $c must escape")
    }
    // windows caught per pair: i ≡ −o (mod 8) with i + 16 ≤ L
    val windowsPerPair = Map(0L -> 1L, 1L -> 1L, 3L -> 1L, 8L -> 1L,
      9L -> 2L, 10L -> 1L, 12L -> 1L, 13L -> 3L, 14L -> 3L)
    for ((c, w) <- windowsPerPair)
      assert(rows(c)._3 == 2L * w,
        s"case $c: expected ${2 * w} dup windows, got ${rows(c)._3}")
  }

  test("reciprocalPairs keeps exactly the mutual top-1 pairs") {
    val rnd = new scala.util.Random(179)
    val vecs = (0L until 40L).map { i =>
      (i, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(vecs, vecs, k = 1)
    val got = Similarity.reciprocalPairs(top1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: mutual rank-1 relation from the same top-1 table
    val nn = top1.where(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = nn.collect {
      case (a, b) if nn.get(b).contains(a) && a < b => (a, b)
    }.toSet
    assert(got == expected && got.nonEmpty)
    // planted twins: two near-identical vectors must surface as a pair
    val twin = vecs.unionByName(Seq(
      (100L, Seq(10f, 0f, 0f, 0f)), (101L, Seq(10f, 0.001f, 0f, 0f)))
      .toDF("vec_id", "embedding"))
    val pairs2 = Similarity.reciprocalPairs(
        Similarity.bruteForceTopK(twin, twin, k = 1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2.contains((100L, 101L)))
  }

  test("hashRingNegatives matches the global first-at-or-after rule " +
    "and is invariant to the bucket decomposition") {
    def ringHash(s: String): Long = {
      var h = 0L
      s.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
      h
    }
    val ids = (0L until 60L).map(i => i * 7L + 3L)
    val df = ids.toDF("doc_id")
    val got = Similarity.hashRingNegatives(df, "doc_id", k = 4,
        buckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // brute force: THE rule, with no buckets at all — one member per
    // position (smallest id), first position at-or-after the probe,
    // wrap to the ring minimum, self-draws dropped
    val ring = ids.groupBy(id => ringHash(id.toString))
      .view.mapValues(_.min).toMap
    val sortedPos = ring.keys.toSeq.sorted
    val expected = (for { id <- ids; j <- 1 to 4 } yield {
      val q = ringHash(s"$id#$j")
      val pos = sortedPos.find(_ >= q).getOrElse(sortedPos.head)
      ((id, j), ring(pos))
    }).filter { case ((id, _), neg) => neg != id }.toMap
    assert(got == expected && got.nonEmpty)
    // bucket decomposition is an implementation detail: 1 bucket
    // (pure as-of + wrap) == 16 == 256
    val b1 = Similarity.hashRingNegatives(df, "doc_id", k = 4, buckets = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val b256 = Similarity.hashRingNegatives(df, "doc_id", k = 4,
        buckets = 256)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(b1 == expected && b256 == expected)
    // determinism across runs: same corpus -> byte-identical pairs
    val again = Similarity.hashRingNegatives(df, "doc_id", k = 4,
        buckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(again == got)
    // THE consistent-hashing stability property: growing the corpus by
    // one member may only re-point probes ONTO that member (the arcs
    // it lands on) — every other assignment survives verbatim. A
    // random sampler reshuffles everything; this is why the ring.
    val newId = 1001L
    val grown = Similarity.hashRingNegatives(
        (ids :+ newId).toDF("doc_id"), "doc_id", k = 4, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val oldAnchorKeys = expected.keySet
    oldAnchorKeys.foreach { key =>
      val before = expected(key)
      grown.get(key) match {
        case Some(after) =>
          assert(after == before || after == newId,
            s"$key moved $before -> $after, not onto the new member")
        case None =>
          // a probe can only DISAPPEAR if the new member became its
          // pick and the pick equals the anchor — impossible here
          // (newId is not an old anchor), so every old probe survives
          fail(s"probe $key vanished when the corpus grew")
      }
    }
  }

  test("hll_distinct partial-aggregates: registers, not values, cross the shuffle") {
    val df = (0L until 2000L).map(i => (s"g${i % 3}", s"v${i % 701}"))
      .toDF("g", "v").repartition(7)
    val agg = df.groupBy("g").agg(graft.functions.hll_distinct(col("v"), 10).as("est"))
    val plan = agg.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate partial/final:
    // the map side folds values into the 2^p-byte register buffer and only
    // that buffer crosses the exchange — the 100 TB distinct-count shape.
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate, got:\n$plan")
    val rows = agg.orderBy("g").collect()
    assert(rows.length == 3)
    // estimates track the exact per-group distincts (linear counting is
    // near-exact at ~667/1024 fill), and must be identical to a single
    // partition run (reproducibility under partitioning)
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .orderBy("g").collect().map(_.getLong(1))
    val single = df.coalesce(1).groupBy("g")
      .agg(graft.functions.hll_distinct(col("v"), 10).as("est"))
      .orderBy("g").collect()
    rows.zip(single).zip(exact).foreach { case ((a, b), n) =>
      assert(java.lang.Double.doubleToLongBits(a.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(1)))
      assert(math.abs(a.getDouble(1) - n) / n < 0.05,
        s"est=${a.getDouble(1)} exact=$n")
    }
  }

  test("curation pipeline output is identical under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 300L).map { i =>
      // mix of languages, duplicated texts every 7th doc, one empty doc
      val text =
        if (i == 7L) ""
        else if (i % 7 == 0) "the quick brown fox the of and to in " * 4
        else s"der und die das ist word-$i payload " * 5
      (i, text)
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      operators.TextAnalysis.curate(docs.repartition(parts), "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
    val ref = run(1)
    assert(ref.nonEmpty)
    assert(run(13) == ref && run(32) == ref)
  }

  test("z-ordered write bounds per-file ranges in BOTH key dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 64x64 uniform grid; a lexicographic sort on `a` would give every
    // file the FULL range of `b`, so min/max stats could never prune
    // b-filters — the z-order layout must bound both
    val grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    operators.Sinks.writeZOrdered(grid, s"$dir/t", bitsPer = 6,
      keys = Seq(col("a"), col("b")), nFiles = 16)
    val spans = spark.read.parquet(s"$dir/t")
      .groupBy(input_file_name().as("f"))
      .agg((max(col("a")) - min(col("a"))).as("ra"),
        (max(col("b")) - min(col("b"))).as("rb"))
      .collect()
    assert(spans.length > 8, s"expected ~16 files, got ${spans.length}")
    val (avgA, avgB) = (spans.map(_.getLong(1)).sum.toDouble / spans.length,
      spans.map(_.getLong(2)).sum.toDouble / spans.length)
    // 4096 cells / 16 files = 256-cell z-blocks = ~16x16 tiles: each
    // file must span far less than the full 0..63 range in BOTH dims
    assert(avgA < 24 && avgB < 24, s"per-file spans too wide: a=$avgA b=$avgB")
  }

  test("search serving: persisted index answers BM25 top-k with zero corpus rescan") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val docs = (1L to 60L).map(i =>
      (i, s"the data point $i " + ("data " * (i % 4).toInt))).toDF("doc_id", "text")
    val idx = TextAnalysis.buildSearchIndex(docs, "doc_id", "text", nShards = 2)
    val dir = java.nio.file.Files.createTempDirectory("searchidx").toString
    // first-class persistence (token-range-sorted postings, doc-sorted
    // docmeta) — the layout a deployment would otherwise hand-roll
    TextAnalysis.saveSearchIndex(idx, dir)
    val served = TextAnalysis.loadSearchIndex(spark, dir)
    val top = TextAnalysis.searchTopK(served, Seq("data", "point"), k = 5)
    val plan = top.queryExecution.executedPlan.toString
    // query time never tokenizes and the term probe reaches the scan
    assert(!plan.contains("tokenize("), s"query-time tokenize:\n$plan")
    assert(plan.contains("PushedFilters: [In(token"), s"term probe not pushed:\n$plan")
    val rows = top.orderBy("rank").collect()
    assert(rows.length == 5 && rows.head.getAs[Int]("rank") == 1)
    // result parity with the direct (index-built-inline) path
    val direct = TextAnalysis.searchTopK(idx, Seq("data", "point"), k = 5)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(rows.map(_.toSeq).toSeq == direct)
    // prefix search rides a startsWith RANGE predicate that also reaches
    // the on-disk scan (contiguous on the token-range-sorted layout)
    val pre = TextAnalysis.prefixSearch(served, "poi")
    val pplan = pre.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*StringStartsWith\\(token".r
        .findFirstIn(pplan).isDefined,
      s"prefix probe not pushed:\n$pplan")
    assert(pre.count() == 60L) // every doc contains "point"
  }

  test("range-sorted write produces non-overlapping in-order shards") {
    import org.apache.spark.sql.functions._
    // shuffled input: the writer must both balance and order it
    val rows = scala.util.Random.javaRandomToRandom(new java.util.Random(41))
      .shuffle((0L until 4096L).toList).toDF("k")
      .withColumn("payload", col("k") * 7)
    val dir = java.nio.file.Files.createTempDirectory("rangesorted").toString
    operators.Sinks.writeRangeSorted(rows, s"$dir/t", Seq(col("k")), nFiles = 16)
    val spans = spark.read.parquet(s"$dir/t")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(spans.length > 8, s"expected ~16 shards, got ${spans.length}")
    // non-overlapping, in order, covering all rows
    for (Seq((_, hi1, _), (lo2, _, _)) <- spans.toSeq.sliding(2))
      assert(hi1 < lo2, s"overlapping shards: $spans")
    assert(spans.map(_._3).sum == 4096L)
    // a point predicate prunes to one file via footer min/max
    val hit = spark.read.parquet(s"$dir/t").where(col("k") === 2048L)
      .select(input_file_name()).distinct().collect()
    assert(hit.length == 1)
  }

  test("bucketed tables join without an exchange") {
    // default warehouse (spark-warehouse/ under the test cwd, gitignored);
    // the in-memory catalog forgets tables between JVMs, so stale
    // locations from prior runs must go too
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    (1L to 1000L).map(i => (i, s"o$i")).toDF("okey", "opayload")
      .write.bucketBy(4, "okey").sortBy("okey").saveAsTable("b_orders")
    (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("okey", "lid")
      .write.bucketBy(4, "okey").sortBy("okey").saveAsTable("b_lineitem")
    // force a sort-merge join so bucketing (not broadcast) must avoid
    // the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle, got:\n$plan")
      assert(joined.count() == 5000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("segmented search serving equals a full rebuild of the current snapshot") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // prev -> cur exercises every delta class: docs 3,6 removed; 61..65
    // added; every 7th text edited (changed); the rest unchanged. Terms
    // chosen so removed/added/changed docs all cross posting lists.
    val prev = (1L to 60L).map(i =>
      (i, s"the data point $i " + ("data " * (i % 4).toInt))).toDF("doc_id", "text")
    val cur = (1L to 65L).filter(i => i != 3 && i != 6).map { i =>
      val base = s"the data point $i " + ("data " * (i % 4).toInt)
      (i, if (i % 7 == 0) base + " edited data" else base)
    }.toDF("doc_id", "text")
    val base = TextAnalysis.buildSearchIndex(prev, "doc_id", "text", nShards = 2)
    val delta = TextAnalysis.searchIndexDelta(prev, cur, "doc_id", "text",
      nShards = 2)
    val rebuilt = TextAnalysis.buildSearchIndex(cur, "doc_id", "text", nShards = 2)
    val terms = Seq("data", "point", "edited")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(rows(TextAnalysis.searchSegmentsTopK(base, delta, terms, k = 12))
      == rows(TextAnalysis.searchTopK(rebuilt, terms, k = 12)))
    // the tombstone list is exactly removed + changed ids
    val tombs = delta.tombstones.collect().map(_.getLong(0)).sorted.toSeq
    assert(tombs == (Seq(3L, 6L) ++ (1L to 60L).filter(_ % 7 == 0)).sorted)
    // compaction folds the segment back into ONE index bit-identical to
    // the rebuild (same grouping keys, same sorted posting arrays)
    val compacted = TextAnalysis.compactSearchIndex(base, delta, nShards = 2)
    def postings(idx: TextAnalysis.SearchIndex) =
      idx.postings.collect().map(_.toSeq).toSet
    def docmeta(idx: TextAnalysis.SearchIndex) =
      idx.docmeta.collect().map(_.toSeq).toSet
    assert(postings(compacted) == postings(rebuilt))
    assert(docmeta(compacted) == docmeta(rebuilt))
    // serving through the compacted index matches too
    assert(rows(TextAnalysis.searchTopK(compacted, terms, k = 12))
      == rows(TextAnalysis.searchTopK(rebuilt, terms, k = 12)))
  }

  test("multi-segment serving equals a rebuild and never regroups the base postings") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // three snapshot generations: removals, additions, and docs changed
    // in BOTH deltas (i%6==0: delta 2's tombstone must kill segment 1's
    // copy, not only base's)
    val v0 = (1L to 50L).map(i =>
      (i, s"the data point $i " + ("data " * (i % 4).toInt))).toDF("doc_id", "text")
    val v1 = (1L to 55L).filter(_ != 3).map { i =>
      val base = s"the data point $i " + ("data " * (i % 4).toInt)
      (i, if (i % 6 == 0) base + " edited" else base)
    }.toDF("doc_id", "text")
    val v2 = (1L to 58L).filter(i => i != 3 && i != 10).map { i =>
      val base = s"the data point $i " + ("data " * (i % 4).toInt)
      (i, if (i % 6 == 0) base + " edited twice" else base)
    }.toDF("doc_id", "text")
    val base = TextAnalysis.buildSearchIndex(v0, "doc_id", "text", nShards = 2)
    val d1 = TextAnalysis.searchIndexDelta(v0, v1, "doc_id", "text", nShards = 2)
    val d2 = TextAnalysis.searchIndexDelta(v1, v2, "doc_id", "text", nShards = 2)
    val rebuilt = TextAnalysis.buildSearchIndex(v2, "doc_id", "text", nShards = 2)
    val terms = Seq("data", "point", "edited", "twice")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect().map(_.toSeq).toSeq
    val served = TextAnalysis.searchSegmentsTopK(base, Seq(d1, d2), terms, k = 15)
    assert(rows(served) == rows(TextAnalysis.searchTopK(rebuilt, terms, k = 15)))
    // the read path does NO compaction work: no postings regroup
    // (collect_list/sort_array is the compaction signature) anywhere in
    // the serving plan, and the tombstone drops are broadcast anti-joins
    // so every level's postings scan stays map-only
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      s"serving plan regroups postings:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone drop is not a broadcast anti-join:\n$plan")
    // multi-segment compaction folds BOTH segments into one index
    // bit-identical to the rebuild
    val compacted = TextAnalysis.compactSearchIndex(base, Seq(d1, d2), nShards = 2)
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(tbl(compacted.postings) == tbl(rebuilt.postings))
    assert(tbl(compacted.docmeta) == tbl(rebuilt.docmeta))
  }

  test("positional index serves phrase queries with zero corpus rescan") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // docs with known phrase structure: "data point" occurs i%3 times in
    // doc i plus decoys where the words appear NON-adjacent
    val docs = (1L to 40L).map { i =>
      val phrase = "data point " * (i % 3).toInt
      (i, s"the $phrase data x point tail $i")
    }.toDF("doc_id", "text")
    val idx = TextAnalysis.buildPositionalIndex(docs, "doc_id", "text",
      nShards = 2)
    // first-class persistence: save/load must round-trip the shard count
    // and keep the probe pruning on the ON-DISK form
    val dir = java.nio.file.Files.createTempDirectory("posidx").toString
    TextAnalysis.savePositionalIndex(idx, dir, nShards = 2)
    val loaded = TextAnalysis.loadPositionalIndex(spark, dir)
    assert(loaded.nShards == 2)
    val served = TextAnalysis.phraseSearch(loaded.postings, Seq("data", "point"))
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("tokenize("), s"query-time tokenize:\n$plan")
    assert(plan.contains("PushedFilters: [In(token"), s"probe not pushed:\n$plan")
    // the saved layout is token-range-sorted, so a single-token point
    // probe reads FEWER files than the index holds (footer min/max
    // skipping — the on-disk analogue of the literal isin prune)
    val allFiles = loaded.postings.select(input_file_name()).distinct().count()
    val hitFiles = loaded.postings.where(col("token") === "tail")
      .select(input_file_name()).distinct().count()
    assert(allFiles > 1 && hitFiles == 1,
      s"point probe read $hitFiles of $allFiles files")
    val got = served.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    // doc i: i%3 phrase hits; i%3==0 docs have only the non-adjacent
    // decoy ("data x point") and must NOT match
    val want = (1L to 40L).filter(_ % 3 != 0)
      .map(i => i -> ((i % 3, 1L))).toMap
    assert(got == want, s"phrase results wrong: $got")
    // proximity served from the same index: "x" sits 1 before "point"
    // in every doc's decoy tail, so every doc keeps at gap <= 1
    val prox = TextAnalysis.proximitySearch(idx, Seq("x"), Seq("point"),
      maxGap = 1L).collect()
    assert(prox.length == 40 && prox.forall(_.getAs[Boolean]("keep")))
    assert(prox.forall(_.getAs[Long]("min_gap") == 1L))
  }

  test("positional segments serve phrases equal to a rebuild and compact bit-identically") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val v0 = (1L to 50L).map(i =>
      (i, s"the data point $i " + ("data point " * (i % 3).toInt)))
      .toDF("doc_id", "text")
    val v1 = (1L to 55L).filter(_ != 3).map { i =>
      val base = s"the data point $i " + ("data point " * (i % 3).toInt)
      (i, if (i % 6 == 0) s"moved front $base" else base) // positions SHIFT
    }.toDF("doc_id", "text")
    val v2 = (1L to 58L).filter(i => i != 3 && i != 10).map { i =>
      val base = s"the data point $i " + ("data point " * (i % 3).toInt)
      (i, if (i % 6 == 0) s"moved twice front $base" else base)
    }.toDF("doc_id", "text")
    val base = TextAnalysis.buildPositionalIndex(v0, "doc_id", "text",
      nShards = 2)
    val d1 = TextAnalysis.positionalIndexDelta(v0, v1, "doc_id", "text",
      nShards = 2)
    val d2 = TextAnalysis.positionalIndexDelta(v1, v2, "doc_id", "text",
      nShards = 2)
    val rebuilt = TextAnalysis.buildPositionalIndex(v2, "doc_id", "text",
      nShards = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val served = TextAnalysis.phraseSearchSegments(base, Seq(d1, d2),
      Seq("data", "point"))
    assert(rows(served) == rows(TextAnalysis.phraseSearch(rebuilt,
      Seq("data", "point"))))
    // a twice-edited doc's POSITIONS come from the newest segment only
    // (the "moved twice front" shift): spot-check doc 6
    val d6 = served.where(col("doc_id") === 6L).collect()
    assert(d6.length == 1 && d6(0).getAs[Long]("first_pos") == 4L,
      s"doc 6 positions not from newest segment: ${d6.toSeq}")
    // no regroup in the serving plan; tombstone drops broadcast
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), s"serving plan regroups:\n$plan")
    // proximity serves from the SAME segments (shared occurrence merge):
    // must equal the single-index server over the rebuild, q117's claim
    val proxSeg = TextAnalysis.proximitySearchSegments(base, Seq(d1, d2),
      Seq("moved"), Seq("front"), maxGap = 2L)
    assert(rows(proxSeg) == rows(TextAnalysis.proximitySearch(rebuilt,
      Seq("moved"), Seq("front"), maxGap = 2L)))
    // compaction folds both segments bit-identically to the rebuild
    val compacted = TextAnalysis.compactPositionalIndex(base, Seq(d1, d2),
      nShards = 2)
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(tbl(compacted) == tbl(rebuilt))
  }

  test("phrase and proximity serving match brute-force references on random corpora") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 120L).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val idx = TextAnalysis.buildPositionalIndex(docs.toDF("doc_id", "text"),
      "doc_id", "text", nShards = 3)
    def tokens(t: String) = t.split("\\s+").filter(_.nonEmpty)
    // phrase "a b" — the dense vocab makes every structural case appear
    val expect = docs.flatMap { case (id, t) =>
      val tk = tokens(t)
      val starts = tk.indices.dropRight(1)
        .filter(j => tk(j) == "a" && tk(j + 1) == "b")
      if (starts.nonEmpty) Some((id, starts.size.toLong, starts.min.toLong))
      else None
    }.toSet
    val got = TextAnalysis.phraseSearch(idx, Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // proximity A={a,c}, B={b}, maxGap 2, both directions
    for (ordered <- Seq(false, true)) {
      val gotP = TextAnalysis.proximitySearch(idx, Seq("a", "c"), Seq("b"),
          maxGap = 2L, ordered).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
      val expP = docs.flatMap { case (id, t) =>
        val tk = tokens(t)
        val pa = tk.indices.filter(j => tk(j) == "a" || tk(j) == "c").map(_.toLong)
        val pb = tk.indices.filter(j => tk(j) == "b").map(_.toLong)
        if (pa.nonEmpty && pb.nonEmpty) {
          val gaps = for { a <- pa; b <- pb; if !ordered || b > a }
            yield if (ordered) b - a else math.abs(a - b)
          val mg = gaps.reduceOption(_ min _)
          Some((id, pa.size.toLong, pb.size.toLong, mg, mg.exists(_ <= 2L)))
        } else None
      }.toSet
      assert(gotP == expP, s"ordered=$ordered")
    }
  }

  test("segmented phrase/proximity serving equals a rebuild on random re-crawl histories") {
    import graft.operators.TextAnalysis
    // randomized LSM histories: random base corpus, then two re-crawls
    // each applying random deletes, edits (position-shifting prepends
    // included) and adds — the structural cases (delete-then-readd,
    // edit-twice, add-then-delete) all occur across trials
    val rnd = new scala.util.Random(20260814L)
    // "ax"/"ay" share a prefix with "a" so the wildcard probe below
    // spans a real token family, not a single exact term
    val vocab = Vector("a", "b", "c", "d", "ax", "ay")
    def text() = Seq.fill(1 + rnd.nextInt(20))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (trial <- 1 to 3) {
      var nextId = 61L
      val v0 = (1L to 60L).map(i => (i, text()))
      def recrawl(prev: Seq[(Long, String)]): Seq[(Long, String)] = {
        val survived = prev.filter(_ => rnd.nextInt(5) != 0)
        val edited = survived.map { case (id, t) =>
          if (rnd.nextInt(4) == 0) (id, s"${vocab(rnd.nextInt(vocab.size))} $t")
          else (id, t)
        }
        val added = (1 to 8).map { _ => val id = nextId; nextId += 1; (id, text()) }
        edited ++ added
      }
      val v1 = recrawl(v0); val v2 = recrawl(v1)
      val base = TextAnalysis.buildPositionalIndex(v0.toDF("doc_id", "text"),
        "doc_id", "text", nShards = 2)
      val d1 = TextAnalysis.positionalIndexDelta(v0.toDF("doc_id", "text"),
        v1.toDF("doc_id", "text"), "doc_id", "text", nShards = 2)
      val d2 = TextAnalysis.positionalIndexDelta(v1.toDF("doc_id", "text"),
        v2.toDF("doc_id", "text"), "doc_id", "text", nShards = 2)
      val rebuilt = TextAnalysis.buildPositionalIndex(v2.toDF("doc_id", "text"),
        "doc_id", "text", nShards = 2)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(rows(TextAnalysis.phraseSearchSegments(base, Seq(d1, d2),
          Seq("a", "b")))
        == rows(TextAnalysis.phraseSearch(rebuilt, Seq("a", "b"))),
        s"trial $trial: segmented phrase != rebuild")
      for (ordered <- Seq(false, true))
        assert(rows(TextAnalysis.proximitySearchSegments(base, Seq(d1, d2),
            Seq("a", "c"), Seq("b"), maxGap = 2L, ordered))
          == rows(TextAnalysis.proximitySearch(rebuilt, Seq("a", "c"),
            Seq("b"), maxGap = 2L, ordered)),
          s"trial $trial ordered=$ordered: segmented proximity != rebuild")
      // compaction of the random history is bit-identical to the rebuild
      assert(TextAnalysis.compactPositionalIndex(base, Seq(d1, d2), nShards = 2)
          .collect().map(_.toSeq).toSet
        == rebuilt.collect().map(_.toSeq).toSet,
        s"trial $trial: compaction != rebuild")
      // the BM25 LSM twin over the same random history: segmented top-k
      // and compaction must also equal a rebuild (deterministic integer
      // scoring makes the equality exact)
      val sBase = TextAnalysis.buildSearchIndex(v0.toDF("doc_id", "text"),
        "doc_id", "text", nShards = 2)
      val sd1 = TextAnalysis.searchIndexDelta(v0.toDF("doc_id", "text"),
        v1.toDF("doc_id", "text"), "doc_id", "text", nShards = 2)
      val sd2 = TextAnalysis.searchIndexDelta(v1.toDF("doc_id", "text"),
        v2.toDF("doc_id", "text"), "doc_id", "text", nShards = 2)
      val sRebuilt = TextAnalysis.buildSearchIndex(v2.toDF("doc_id", "text"),
        "doc_id", "text", nShards = 2)
      def rrows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("rank").collect().map(_.toSeq).toSeq
      assert(rrows(TextAnalysis.searchSegmentsTopK(sBase, Seq(sd1, sd2),
          Seq("a", "b"), k = 10))
        == rrows(TextAnalysis.searchTopK(sRebuilt, Seq("a", "b"), k = 10)),
        s"trial $trial: segmented BM25 != rebuild")
      // segmented inclusion/exclusion selection == rebuild too
      def drows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(drows(TextAnalysis.termFilterSegments(sBase, Seq(sd1, sd2),
          Seq("a"), Seq("d")))
        == drows(TextAnalysis.termFilter(sRebuilt, Seq("a"), Seq("d"))),
        s"trial $trial: segmented term filter != rebuild")
      // segmented wildcard (a* spans a/ax/ay) == rebuild
      assert(drows(TextAnalysis.prefixSearchSegments(sBase, Seq(sd1, sd2),
          "a"))
        == drows(TextAnalysis.prefixSearch(sRebuilt, "a")),
        s"trial $trial: segmented prefix != rebuild")
      val sComp = TextAnalysis.compactSearchIndex(sBase, Seq(sd1, sd2),
        nShards = 2)
      assert(sComp.postings.collect().map(_.toSeq).toSet
          == sRebuilt.postings.collect().map(_.toSeq).toSet
        && sComp.docmeta.collect().map(_.toSeq).toSet
          == sRebuilt.docmeta.collect().map(_.toSeq).toSet,
        s"trial $trial: BM25 compaction != rebuild")
    }
  }

  test("term filter matches a brute-force predicate on random corpora") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(77)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 150L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val idx = TextAnalysis.buildSearchIndex(docs.toDF("doc_id", "text"),
      "doc_id", "text", nShards = 3)
    for ((have, not) <- Seq(Seq("a") -> Nil, Seq("a", "b") -> Seq("e"),
        Seq("a", "b", "c") -> Seq("d", "e"))) {
      val got = TextAnalysis.termFilter(idx, have, not)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = docs.flatMap { case (id, t) =>
        val tk = t.split(" ").toSet
        if (have.forall(tk) && !not.exists(tk)) Some(id -> t.split(" ").length.toLong)
        else None
      }.toMap
      assert(got == exp, s"have=$have not=$not")
    }
  }

  test("BPE training matches a brute-force reference trainer on random corpora") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(12)
    val alphabet = "abcd"
    for (trial <- 1 to 3) {
      val docs = (1L to 40L).map { i =>
        val words = Seq.fill(2 + rnd.nextInt(6))(
          Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(4))).mkString)
        (i, words.mkString(" "))
      }
      val got = TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), "text", 6)
        .orderBy("merge_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      // brute-force reference: word-freq dict of symbol vectors
      var dict = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, ws) => w.map(_.toString).toVector -> ws.length.toLong }
      val expect = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var r = 1
      var done = false
      while (r <= 6 && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        dict.foreach { case (syms, f) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f }
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
          expect += ((r.toLong, a, b, c))
          dict = dict.toSeq.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          r += 1
        }
      }
      assert(got.toSeq == expect.toSeq, s"trial $trial")
    }
  }

  test("unigram-LM training matches a brute-force Viterbi-EM reference " +
    "on random corpora, and token counts join back per doc") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(233)
    val alphabet = "abcd"
    val (seedSize, rounds, mpl, vocabSize) = (8, 2, 3, 5)
    for (trial <- 1 to 3) {
      val docs = (1L to 30L).map { i =>
        val words = Seq.fill(2 + rnd.nextInt(5))(
          Seq.fill(1 + rnd.nextInt(7))(alphabet(rnd.nextInt(4))).mkString)
        (i, words.mkString(" "))
      }
      // ---- brute reference: same arithmetic, same tie-breaks ----
      val wordFreq = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      def seedCounts: Map[String, Long] = {
        val m = scala.collection.mutable.Map.empty[String, Long]
        wordFreq.foreach { case (w, f) =>
          for (s <- 1 to w.length;
               l <- 1 to math.min(mpl, w.length - s + 1)) {
            val p = w.substring(s - 1, s - 1 + l)
            m(p) = m.getOrElse(p, 0L) + f
          }
        }
        m.toMap
      }
      def probs(v: Map[String, Long]): Map[String, Double] = {
        val nv = v.values.sum + v.size
        v.map { case (p, c) => p -> (c + 1L).toDouble / nv.toDouble }
      }
      def viterbi(w: String, pr: Map[String, Double]): Seq[String] = {
        val n = w.length
        val best = Array.fill(n + 1)(-1.0); best(0) = 1.0
        val ch = Array.fill(n + 1)((0, ""))
        for (e <- 1 to n) {
          var bv = -1.0; var bs = Int.MaxValue; var bp = ""
          for (s <- 1 to e; if e - s + 1 <= mpl) {
            val piece = w.substring(s - 1, e)
            pr.get(piece).foreach { p =>
              val v = best(s - 1) * p
              if (v > bv || (v == bv && s < bs)) { bv = v; bs = s; bp = piece }
            }
          }
          best(e) = bv; ch(e) = (bs, bp)
        }
        var pos = n
        var out = List.empty[String]
        while (pos > 0) { out = ch(pos)._2 :: out; pos = ch(pos)._1 - 1 }
        out
      }
      val sc = seedCounts
      var vocab: Map[String, Long] =
        sc.filter(_._1.length == 1) ++
          sc.filter(_._1.length >= 2).toSeq
            .sortBy { case (p, c) => (-c, p) }.take(seedSize)
      (1 to rounds).foreach { _ =>
        val pr = probs(vocab)
        val nc = scala.collection.mutable.Map.empty[String, Long]
        wordFreq.foreach { case (w, f) =>
          viterbi(w, pr).foreach(p => nc(p) = nc.getOrElse(p, 0L) + f) }
        vocab = vocab.keys.filter(_.length == 1)
          .map(p => p -> nc.getOrElse(p, 0L)).toMap ++
          vocab.keys.filter(_.length >= 2)
            .map(p => p -> nc.getOrElse(p, 0L)).filter(_._2 > 0L).toSeq
            .sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      }
      val prF = probs(vocab)
      val expect = vocab.map { case (p, c) => p -> ((c, prF(p))) }
      // ---- the operator must reproduce it EXACTLY (incl. doubles) ----
      val vdf = TextAnalysis.unigramLmTrain(docs.toDF("doc_id", "text"),
        "text", seedSize, rounds, mpl, vocabSize, maxWordLen = 16)
      val got = vdf.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == expect, s"trial $trial")
      // ---- per-doc token budget joins back exactly ----
      val tc = TextAnalysis.unigramTokenCounts(docs.toDF("doc_id", "text"),
        "doc_id", "text", vdf, maxPieceLen = mpl, maxWordLen = 16)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val expTc = docs.map { case (i, t) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        i -> ((ws.length.toLong,
          ws.map(w => viterbi(w, prF).length.toLong).sum))
      }.toMap
      assert(tc == expTc, s"trial $trial token counts")
    }
    // kernel contract: an uncoverable position throws loudly instead of
    // silently dropping the word from the counts
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = intercept[IllegalStateException] {
      graft.functions.UnigramViterbi(Literal(1), Literal(1L), Literal(1.0))
        .nullSafeEval(2,
          ArrayData.toArrayData(Array(102L)), // (s=1, l=2) only
          ArrayData.toArrayData(Array(0.5)))
    }
    assert(e.getMessage.contains("unigram_viterbi"))
  }

  test("AutoShards derives the shard count and bounds the worst postings row") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // every doc contains the stopword "the": with nShards=1 its postings
    // row would be the ENTIRE corpus in one array — the exact row
    // explosion the auto default exists to prevent
    val docs = (1L to 100L).map(i => (i, s"the data $i")).toDF("doc_id", "text")
    val idx = TextAnalysis.buildSearchIndex(docs, "doc_id", "text",
      nShards = TextAnalysis.AutoShards, maxDocsPerShard = 20)
    // ceil(100/20) = 5 shards actually materialize
    val shards = idx.postings.select("shard").distinct().count()
    assert(shards == 5L, s"expected 5 shards, got $shards")
    // the stopword's worst row is bounded by its shard's doc count (md5
    // sharding is uniform; 50 is a >6-sigma bound on a Binomial(100,1/5))
    val maxRow = idx.postings.agg(max(size(col("postings")))).head.getInt(0)
    assert(maxRow <= 50, s"postings row too large: $maxRow")
    // and results are shard-count-invariant: same top-k as nShards=1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect().map(_.toSeq).toSeq
    val one = TextAnalysis.buildSearchIndex(docs, "doc_id", "text", nShards = 1)
    assert(rows(TextAnalysis.searchTopK(idx, Seq("the", "data"), k = 7))
      == rows(TextAnalysis.searchTopK(one, Seq("the", "data"), k = 7)))
  }
  test("bucketed tables equi-join with zero exchanges") {
    import graft.operators.Sinks
    import org.apache.spark.sql.functions._
    // two fact tables persisted bucketed+sorted on the join key: the
    // join must read co-located buckets directly — no Exchange on
    // either side (at 100 TB this is the difference between a
    // cluster-wide shuffle and pure local reads)
    val a = spark.range(10000).select(col("id").as("k"),
      (col("id") % 97).as("va"))
    val b = spark.range(10000).select(col("id").as("k"),
      (col("id") % 89).as("vb"))
    Sinks.writeBucketed(a, "graft_bucket_a", "k", nBuckets = 4)
    Sinks.writeBucketed(b, "graft_bucket_b", "k", nBuckets = 4)
    // force the shuffle-join path: with broadcast allowed the planner
    // would BHJ the small fixture and skip bucketed reads entirely (at
    // fact-scale neither side broadcasts, which is the case bucketing
    // exists for)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(joined.count() == 10000L)
      // control: the same data as plain (unbucketed) frames DOES shuffle
      val pa = spark.range(10000).select(col("id").as("k"),
        (col("id") % 97).as("va"))
      val pb = spark.range(10000).select(col("id").as("k"),
        (col("id") % 89).as("vb"))
      val control = pa.join(pb, "k").queryExecution.executedPlan.toString
      assert(control.contains("Exchange"),
        s"control join unexpectedly exchange-free:\n$control")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("topPrincipalComponent equals a brute BigInt power-iteration " +
    "reference and finds the planted direction") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val d = 4
    val u = Array(0.8, -0.4, 0.4, 0.2) // planted direction
    val rows = (0 until 30).map { _ =>
      val a = rnd.nextGaussian() * 2.0
      Seq.tabulate(d)(i =>
        (a * u(i) + rnd.nextGaussian() * 0.05).toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val rounds = 12
    val got = Similarity.topPrincipalComponent(df, "embedding", rounds)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // brute: same quantization (bround = HALF_EVEN), BigInt covariance,
    // identical L-inf re-quantization per round
    def q6(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong
    val qv = rows.map(v => v.map(f => q6(f.toDouble)).toArray)
    val n = qv.length
    val s = Array.tabulate(d)(i => qv.map(_(i)).sum)
    val c = Array.tabulate(d, d)((i, j) =>
      BigInt(n) * qv.map(r => BigInt(r(i)) * r(j)).sum -
        BigInt(s(i)) * s(j))
    var v = Array.fill(d)(1000000L)
    def mul() = Array.tabulate(d)(i =>
      (0 until d).map(j => c(i)(j) * v(j)).sum)
    (1 to rounds).foreach { _ =>
      val w = mul()
      val mx = w.map(_.abs).max
      v = w.map(wi => BigDecimal(wi.toDouble * 1e6 / mx.toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val w = mul()
    val num = (0 until d).map(i => BigInt(v(i)) * w(i)).sum
    val den = (0 until d).map(i => BigInt(v(i)) * v(i)).sum
    val tr = (0 until d).map(i => c(i)(i)).sum
    val ray = num.toDouble / den.toDouble
    val share = ray / tr.toDouble
    (0 until d).foreach { i =>
      assert(got(i.toLong) == ((v(i), ray, share)),
        s"dim $i: ${got(i.toLong)} != ${(v(i), ray, share)}")
    }
    // the planted direction dominates: share near 1, v parallel to u
    assert(share > 0.95, s"share $share")
    val cos = {
      val dot = (0 until d).map(i => v(i).toDouble * u(i)).sum
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nu = math.sqrt(u.map(x => x * x).sum)
      math.abs(dot) / (nv * nu)
    }
    assert(cos > 0.99, s"cos to planted direction $cos")
    // ragged vectors fail loudly
    intercept[Throwable] {
      Similarity.topPrincipalComponent(
        Seq(Tuple1(Seq(1.0f, 2.0f)), Tuple1(Seq(1.0f)))
          .toDF("embedding"), "embedding").collect()
    }
  }

  test("topTwoComponents: exact deflated-round replay, v1 identical to " +
    "topPrincipalComponent, both planted directions found in order") {
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(24)
    val d = 6
    val u1 = Array(0.7, -0.5, 0.3, 0.3, -0.2, 0.2) // dominant
    val u2 = Array(0.3, 0.5, 0.6, -0.4, 0.3, -0.2) // secondary (not ⊥,
    // power iteration still separates by magnitude)
    val rows = (0 until 60).map { _ =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      Seq.tabulate(d)(i =>
        (a * u1(i) + b * u2(i) + rnd.nextGaussian() * 0.03).toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val got = Similarity.topTwoComponents(df, "embedding", rounds = 12)
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    // v1 must be byte-identical to topPrincipalComponent's
    val v1ref = Similarity.topPrincipalComponent(df, "embedding", 12)
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    (0 until d).foreach { i =>
      assert(got(i)._1 == v1ref(i)._1, s"v1 dim $i")
      assert(got(i)._3 == v1ref(i)._2 && got(i)._5 == v1ref(i)._3)
    }
    // independent exact replay of BOTH phases
    def q6(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong
    val qv = rows.map(v => v.map(f => q6(f.toDouble)).toArray)
    val n = qv.length
    val s = Array.tabulate(d)(i => qv.map(_(i)).sum)
    val c = Array.tabulate(d, d)((i, j) =>
      BigInt(n) * qv.map(r => BigInt(r(i)) * r(j)).sum -
        BigInt(s(i)) * s(j))
    def mul(x: Array[Long]) = Array.tabulate(d)(i =>
      (0 until d).map(j => c(i)(j) * x(j)).sum)
    def quant(w: Array[BigInt]) = {
      val mx = w.map(_.abs).max
      w.map(wi => if (mx == 0) 0L
        else BigDecimal(wi.toDouble * 1e6 / mx.toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    var v1 = Array.fill(d)(1000000L)
    (1 to 12).foreach(_ => v1 = quant(mul(v1)))
    val den1 = (0 until d).map(i => BigInt(v1(i)) * v1(i)).sum
    var v2 = Array.tabulate(d)(i => if (i % 2 == 0) 1000000L else -1000000L)
    (1 to 12).foreach { _ =>
      val wq = quant(mul(v2))
      val tn = (0 until d).map(j => BigInt(v1(j)) * wq(j)).sum
      v2 = quant(Array.tabulate(d)(i => BigInt(wq(i)) -
        (BigInt(v1(i)) * tn) / (if (den1 == 0) BigInt(1) else den1)))
    }
    (0 until d).foreach { i =>
      assert(got(i)._2 == v2(i), s"v2 dim $i: ${got(i)._2} != ${v2(i)}")
    }
    // planted directions recovered in magnitude order
    def cos(v: Array[Long], u: Array[Double]) = {
      val dot = (0 until d).map(i => v(i).toDouble * u(i)).sum
      math.abs(dot) / (math.sqrt(v.map(x => x.toDouble * x).sum) *
        math.sqrt(u.map(x => x * x).sum))
    }
    // the dominant fitted direction blends the correlated planted pair;
    // what matters: v1/v2 span ≈ span(u1, u2) with share order and near-
    // orthogonality of the fitted pair
    assert(got(0)._5 > got(0)._6, "share1 must exceed share2")
    assert(got(0)._5 + got(0)._6 > 0.97,
      s"two components must explain the planted plane: " +
        s"${got(0)._5} + ${got(0)._6}")
    val v1a = Array.tabulate(d)(i => got(i)._1)
    val v2a = Array.tabulate(d)(i => got(i)._2)
    val v12cos = {
      val dot = (0 until d).map(i => v1a(i).toDouble * v2a(i)).sum
      math.abs(dot) / (math.sqrt(v1a.map(x => x.toDouble * x).sum) *
        math.sqrt(v2a.map(x => x.toDouble * x).sum))
    }
    assert(v12cos < 0.05, s"fitted components not near-orthogonal: $v12cos")
    assert(cos(v1a, u1) > 0.9, s"v1 off the dominant direction")
  }

  test("mmrTopK equals a brute greedy MMR reference and degrades to " +
    "plain top-k at lambda = 1") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 3)
    val (kc, m, lam) = (8, 4, 700000L)
    val got = Similarity.mmrTopK(corpus, queries, kc, m, lam)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def hu(x: Double, scale: Int) =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x * y }
      def nrm(v: Seq[Double]) =
        math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
      dot / (nrm(ad) * nrm(bd))
    }
    (0L until 3L).foreach { qid =>
      val qv = vecs(qid.toInt)._2
      val cands = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, hu(cos(qv, v), 6).toDouble) }
        .sortBy { case (id, c) => (-c, id) }.take(kc)
        .map { case (id, c) =>
          (id, hu(c * 1e6, 0).toLong, vecs(id.toInt)._2) }
      val simQ = Array.tabulate(kc, kc)((i, j) =>
        if (i == j) 0L else hu(cos(cands(i)._3, cands(j)._3) * 1e6, 0)
          .toLong)
      var sel = Vector.empty[Int]
      (1 to m).foreach { _ =>
        val best = (0 until kc).filterNot(sel.contains).map { c =>
          val ms = if (sel.isEmpty) 0L else sel.map(s => simQ(c)(s)).max
          (c, lam * cands(c)._2 - (1000000L - lam) * ms)
        }.minBy { case (c, sc) => (-sc, c) }
        sel :+= best._1
        val (idx, score) = best
        val want = (cands(idx)._1, cands(idx)._2, score)
        assert(got((qid, sel.size.toLong)) == want,
          s"q=$qid rank=${sel.size}: ${got((qid, sel.size.toLong))} != $want")
      }
    }
    // lambda = 1.0 -> the MMR order IS the brute top-k order
    val plain = Similarity.mmrTopK(corpus, queries, kc, m, 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val brute = Similarity.bruteForceTopK(corpus, queries, m)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong) ->
        r.getLong(1)).toMap
    assert(plain == brute, "lambda=1 must reduce to the plain top-k")
  }

  test("jsonl ingest is shuffle-free and loses no rows to the error channel") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField,
      StructType}
    import graft.sources.TextIngest
    // a 100 TB corpus's first pass must be embarrassingly parallel:
    // line-local parse + projection, NEVER a shuffle — the first
    // exchange of any pipeline belongs to the consumer (dedup keys,
    // quality rollups), not the ingest
    val dir = java.nio.file.Files.createTempDirectory("graft-scale-jsonl")
    val rows = (0 until 2000).map { i =>
      if (i % 97 == 0) s"""{{"id": $i}"""               // corrupt
      else if (i % 89 == 0) s"""{"id": $i}"""           // text missing
      else s"""{"id": $i, "text": "doc number $i"}"""
    }
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      rows.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val ing = TextIngest.jsonlWithErrors(spark, dir.toString, schema,
      Seq("id", "text"))
    val plan = ing.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"ingest must be shuffle-free:\n$plan")
    // the text scan reads the one line column — no phantom wide reads
    assert(plan.contains("ReadSchema: struct<value:string>"),
      s"expected a single-column text scan:\n$plan")
    // exact corpus accounting: ok + missing_required + corrupt == lines
    val n = ing.count()
    val ok = TextIngest.valid(ing).count()
    val err = TextIngest.errors(ing).count()
    assert(n == rows.length.toLong, s"row parity broken: $n")
    assert(ok + err == n, s"status channels must partition the lines")
    assert(ok == rows.count(r => r.contains("text")) &&
      err == rows.count(r => !r.contains("text")))
  }
}
