package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
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

  /** IVF (inverted-file) top-k: corpus vectors are assigned to their
    * nearest centroid cell once; each query probes only its `nProbe`
    * nearest cells. The scale path when LSH's recall/cost curve is too
    * coarse — cells partition the corpus, and the candidate join is an
    * equi-join on cell id.
    *
    * Centroids here are taken deterministically from the corpus (the
    * `nCells` lowest-id vectors) standing in for a trained k-means
    * codebook; plugging in trained centroids changes nothing structural.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 8, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.Row
    val centroids: Array[(Int, Array[Double])] =
      corpus.orderBy("vec_id").limit(nCells)
        .select(col("embedding")).collect()
        .zipWithIndex.map { case (r, i) =>
          i -> r.getSeq[Float](0).map(_.toDouble).toArray
        }
    def cosTo(v: Column, c: Array[Double]): Column = {
      val cCol = array(c.map(lit): _*)
      vec_dot(v, cCol) / (vec_norm(v) * math.sqrt(c.map(x => x * x).sum))
    }
    // nearest cell per corpus vector (argmax cosine to centroid)
    def cellAssign(v: Column): Column =
      centroids.map { case (i, c) => struct(cosTo(v, c).as("s"), lit(i).as("i")) }
        .reduce((a, b) => when(a("s") >= b("s"), a).otherwise(b))("i")
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_v"))
      .withColumn("cand_norm", vec_norm(col("cand_v")))
      .withColumn("cell", cellAssign(col("cand_v")))
    // queries probe their nProbe nearest cells
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("query_v"))
      .withColumn("query_norm", vec_norm(col("query_v")))
      .withColumn("cells",
        slice(reverse(array_sort(array(centroids.map { case (i, cv) =>
          struct(cosTo(col("query_v"), cv).as("s"), lit(i).as("i")) }: _*))), 1, nProbe))
      .select(col("query_id"), col("query_v"), col("query_norm"),
        explode(col("cells")("i")).as("cell"))
    val scored = c.join(broadcast(probes), Seq("cell"))
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(vec_dot(col("query_v"), col("cand_v"))
          / (col("query_norm") * col("cand_norm")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
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
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
