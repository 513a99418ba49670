package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query set
  * against the corpus — a broadcast nested-loop that scales linearly in the
  * corpus and never shuffles it. `lshTopK` is the scale path: random-
  * hyperplane LSH buckets both sides, so each query only scans its bucket —
  * an equi-join on bucket id instead of a full scan.
  */
object Similarity {

  /** Rank `(query_id, cand_id, cos_sim)` candidate rows to per-query top-k
    * (cos_sim desc, cand_id asc tiebreak) via the partial-combining
    * `top_k_by` aggregate — NOT a `row_number().over(partitionBy(query_id))`
    * window, which would drag every candidate row of a query onto one
    * partition and SORT it. The aggregate partial-combines: at most k rows
    * per query per partition cross the shuffle and nothing is globally
    * sorted — at corpus scale that is the difference between a sort and a
    * map-side combine. cand_id rides negated so its tiebreak runs
    * ascending under the descending struct order (the q65 pattern).
    * Output matches the window form: (query_id, cand_id, cos_sim, rank). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(top_k_by(struct(col("cos_sim"), (-col("cand_id")).as("neg_cand")), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (-col("col.neg_cand")).as("cand_id"),
        col("col.cos_sim").as("cos_sim"), (col("pos") + 1).as("rank"))

  /** Exact top-k by cosine: every query row against the whole corpus.
    * Similarities are rounded to 6 dp before ranking (with id tiebreak) so
    * rank boundaries are stable across engines. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Norms staged per row BEFORE the pair join: recomputing them inside
    // the pair-level cosine would fold each vector |corpus| times.
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_v"))
      .withColumn("cand_norm", vec_norm(col("cand_v")))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("query_v"))
      .withColumn("query_norm", vec_norm(col("query_v")))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(vec_dot(col("query_v"), col("cand_v"))
          / (col("query_norm") * col("cand_norm")), 6).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** Deterministic random hyperplanes (numPlanes x dim), fixed seed. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-bucket id: bit p set iff dot(v, plane_p) > 0. */
  def lshBucket(v: org.apache.spark.sql.Column, planes: Array[Array[Double]]) = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(vec_dot(v, planeCol) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic seed centroids: the `nCells` lowest-id corpus vectors.
    * A bounded driver-side collect (nCells rows), standing in for — or
    * seeding — a trained k-means codebook. */
  def seedCentroids(corpus: DataFrame, nCells: Int): Array[Array[Double]] =
    corpus.orderBy("vec_id").limit(nCells)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Lloyd's k-means training of the IVF coarse quantizer, DataFrame-
    * iterative: each round assigns every vector to its nearest centroid
    * (`ivf_assign`, one primitive scan per row), then recomputes per-cell
    * per-dimension means through a (cell, dim) partial aggregation — the
    * shuffle carries only nCells x dim partially-combined rows per
    * partition, and the driver collects the bounded (cell, dim) sum table
    * to rebuild the codebook.
    *
    * Means are computed over 1e-6-quantized coordinates with INTEGER
    * summation, so the trained centroids are bit-identical regardless of
    * partition count or aggregation order — floating-point summation
    * would make the codebook depend on the physical plan. Empty cells
    * keep their previous centroid. Train on a bounded sample at corpus
    * scale (`corpus.sample(...)` upstream); the iteration cost is one
    * corpus scan per round.
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, iters: Int,
                      vecCol: String = "embedding"): Array[Array[Double]] = {
    var centroids = seedCentroids(corpus, nCells)
    for (_ <- 1 to iters) {
      val sums = corpus
        .select(ivf_assign(col(vecCol), centroids).as("cell"),
          col(vecCol).as("v"))
        .select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos")
        .agg(sum(round(col("col").cast("double") * 1e6).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val (cell, pos) = (r.getInt(0), r.getInt(1))
        next(cell)(pos) = r.getLong(2).toDouble / (r.getLong(3).toDouble * 1e6)
      }
      centroids = next
    }
    centroids
  }

  /** IVF (inverted-file) top-k: corpus vectors are assigned to their
    * nearest centroid cell once; each query probes only its `nProbe`
    * nearest cells. The scale path when LSH's recall/cost curve is too
    * coarse — cells partition the corpus, and the candidate join is an
    * equi-join on cell id.
    *
    * `centroids` defaults to the deterministic first-`nCells` seed (the
    * exact-oracle configuration); pass `kmeansCentroids(...)` for a
    * trained codebook — nothing structural changes. Cell assignment and
    * probe selection are single-pass expressions over a literal centroid
    * matrix; norms are staged once per row before the candidate join.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 8, nProbe: Int = 2,
              centroids: Array[Array[Double]] = null): DataFrame = {
    val cents = if (centroids != null) centroids else seedCentroids(corpus, nCells)
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_v"))
      .withColumn("cand_norm", vec_norm(col("cand_v")))
      .withColumn("cell", ivf_assign(col("cand_v"), cents))
    // queries probe their nProbe nearest cells
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("query_v"))
      .withColumn("query_norm", vec_norm(col("query_v")))
      .select(col("query_id"), col("query_v"), col("query_norm"),
        explode(ivf_probes(col("query_v"), cents, nProbe)).as("cell"))
    val scored = c.join(broadcast(probes), Seq("cell"))
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(vec_dot(col("query_v"), col("cand_v"))
          / (col("query_norm") * col("cand_norm")), 6).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** LSH-bucketed top-k: candidates restricted to the query's sign bucket.
    * Recall < 1 by construction; bucket count tunes the recall/cost trade.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_v"),
      lshBucket(col("embedding"), planes).as("bucket"))
      .withColumn("cand_norm", vec_norm(col("cand_v")))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("query_v"),
      lshBucket(col("embedding"), planes).as("bucket"))
      .withColumn("query_norm", vec_norm(col("query_v")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(vec_dot(col("query_v"), col("cand_v"))
          / (col("query_norm") * col("cand_norm")), 6).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** PQ codebooks from the `ks` lowest-id corpus vectors, each split
    * into `m` contiguous subvectors — deterministic (the seedCentroids
    * stance; per-subspace kmeansCentroids-style training drops into the
    * same shape). Bounded driver collect: ks x dim doubles. */
  def pqCodebooks(corpus: DataFrame, m: Int, ks: Int): Seq[Seq[Seq[Double]]] = {
    val seeds = seedCentroids(corpus, ks)
    val dim = seeds(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map(mi =>
      seeds.toSeq.map(v => v.slice(mi * sub, (mi + 1) * sub).toSeq))
  }

  /** Product-quantization ANN top-k by asymmetric distance computation
    * (Jegou et al. 2011): the corpus is encoded ONCE into M small codes
    * per vector (`pq_encode` — the localCheckpoint stands in for the
    * persisted index table a real deployment maintains), each query
    * precomputes its M x ks squared-L2 lookup table (`pq_dist_table`,
    * broadcast with the query row), and scoring a candidate is M integer
    * table lookups instead of a dim-length float fold — dim/M times less
    * per-candidate work than bruteForceTopK, on a code table ~dim/M
    * times smaller than the raw vectors. Per-subspace distances are
    * floor-quantized to integer micro-units BEFORE the M-way sum, so the
    * total is order-free and bit-stable across engines and partitionings.
    * This is the flat-scan ADC kernel; at corpus scale it composes with
    * the IVF cell restriction (ivfTopK's probe join) to scan only probed
    * cells — IVFADC. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, ks: Int = 8): DataFrame = {
    val cb = pqCodebooks(corpus, m, ks)
    // materialized attribute: the ADC lambda below reads `codes` per
    // subspace, and a staged pq_encode expression would be re-inlined
    // (and re-run) once per lookup by CollapseProject
    val codes = corpus.select(col("vec_id").as("cand_id"),
      pq_encode(col("embedding"), cb).as("codes")).localCheckpoint()
    val qt = queries.select(col("vec_id").as("query_id"),
      pq_dist_table(col("embedding"), cb).as("dtable"))
    val scored = codes.join(broadcast(qt), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, mi) =>
          acc + floor(element_at(element_at(col("dtable"), mi + 1),
            element_at(col("codes"), mi + 1) + 1) * 1e6)).as("adc_micro"))
    // Malformed vectors (length != dim) NULL their pq_encode /
    // pq_dist_table, so adc_micro is NULL — drop them BEFORE ranking, or
    // ascending NULLS-FIRST order would seat every malformed corpus row
    // at rank 1 of every query instead of degrading it out of the join
    // (the DHashBands posture).
    val valid = scored.where(col("adc_micro").isNotNull)
    // top_k_by keeps the LARGEST structs: adc_micro rides negated for the
    // ascending distance order, cand_id negated for its asc tiebreak.
    valid.groupBy("query_id")
      .agg(top_k_by(struct((-col("adc_micro")).as("neg_adc"),
        (-col("cand_id")).as("neg_cand")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (-col("col.neg_cand")).as("cand_id"),
        (-col("col.neg_adc")).as("adc_micro"), (col("pos") + 1).as("rank"))
  }
}
