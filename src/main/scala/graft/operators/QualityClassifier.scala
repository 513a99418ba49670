package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the DCLM / FineWeb-Edu-shaped step the
  * hand-rule filters (q70/q90) and perplexity filters (q99/q307) lead
  * up to: a LINEAR model over [[TextAnalysis.hashingVectorizer]]
  * features ranks documents, trained on a small labeled set and served
  * over the whole corpus. Public shape: fastText's linear classifier /
  * DCLM's quality filter (Li et al. 2024), re-expressed deterministic:
  *
  *  - '''Averaged perceptron''' (Freund & Schapire 1999), FIXED round
  *    count, integer weights — every quantity is an exact int64
  *    (feature counts are term frequencies; updates add ±cnt), so the
  *    trained model is bit-reproducible across engines and replayable
  *    by an oracle that unrolls the rounds (the q233 hard-EM
  *    discipline). No learning rate, no float, no RNG: examples are
  *    visited in ascending id order, a margin of exactly 0 counts as
  *    a mistake, and the "average" is kept as the unnormalized RUNNING
  *    SUM of the weight vector after each step (sign-equivalent to the
  *    true average, division-free).
  *  - '''Train driver-side, serve distributed''' — the honest split:
  *    a labeled quality set is thousands of rows (bounded loudly by
  *    `maxTrainRows`), so the sequential fold happens on the driver
  *    over one bounded collect, exactly like the q338 covariance
  *    collects; SERVING is the 100 TB side and stays a broadcast
  *    equi-join + partial-aggregated groupBy (weights are `dim` rows,
  *    always broadcastable).
  *
  * Update rule per (x, y) with y ∈ {+1,−1}: if y·(w·x + b) ≤ 0 then
  * w += y·x, b += y; afterwards (updated or not) u += w, ub += b.
  * Predictions use (u, ub). */
object QualityClassifier {

  /** The trained artifact: final + summed weights, dense over
    * `dim` buckets, plus the bias pair and the step count. */
  final case class PerceptronModel(w: Array[Long], b: Long,
                                   wSum: Array[Long], bSum: Long,
                                   dim: Int, rounds: Int, steps: Long)

  /** Train on `features` ((idCol, dim, cnt) sparse rows — the
    * [[TextAnalysis.hashingVectorizer]] contract) against `labels`
    * ((idCol, labelCol) with values exactly +1/−1). Ids present in
    * `labels` but absent from `features` train as all-zero vectors
    * (only the bias can move on them); ids in `features` but not in
    * `labels` are ignored. Loud contracts: label-id uniqueness
    * (duplicate ids would make "ascending id order" ambiguous),
    * label-value domain, feature-dim domain, and the `maxTrainRows`
    * collect bound. */
  def trainAveragedPerceptron(features: DataFrame, labels: DataFrame,
                              idCol: String, labelCol: String, dim: Int,
                              rounds: Int,
                              maxTrainRows: Long = 100000L): PerceptronModel = {
    require(dim >= 1 && dim <= (1 << 20),
      s"trainAveragedPerceptron: dim out of range: $dim")
    require(rounds >= 1 && rounds <= 64,
      s"trainAveragedPerceptron: rounds out of range: $rounds")
    val lab = labels.select(col(idCol).cast("long").as("__id"),
      col(labelCol).cast("long").as("__y")).localCheckpoint()
    Contracts.enforce(lab,
      Contracts.Bound(count(lit(1)), _ <= maxTrainRows, m =>
        s"trainAveragedPerceptron: $m labeled rows exceed the " +
          s"driver-collect bound (maxTrainRows=$maxTrainRows) — " +
          "train on a sample; serving is the distributed side"),
      Contracts.Bound(count(lit(1)) - countDistinct(col("__id")),
        _ == 0L, m =>
          s"trainAveragedPerceptron: $m duplicate label ids — " +
            "ascending-id visit order would be ambiguous"),
      Contracts.Bound(
        sum(when(col("__y") === 1L || col("__y") === -1L, 0L)
          .otherwise(1L)), _ == 0L, m =>
          s"trainAveragedPerceptron: $m labels outside {+1,-1}"))
    val fx = lab.join(
      features.select(col(idCol).cast("long").as("__id"),
        col("dim").cast("long").as("__d"), col("cnt").cast("long")
          .as("__c")),
      Seq("__id"), "left")
    Contracts.enforce(fx,
      Contracts.Bound(
        sum(when(col("__d").isNull ||
          (col("__d") >= 0L && col("__d") < dim.toLong), 0L)
          .otherwise(1L)), _ == 0L, m =>
          s"trainAveragedPerceptron: $m feature rows outside " +
            s"[0, $dim) — dim must match the vectorizer's"))
    val rows = fx.collect()
    // sparse per-id vectors in ascending id order
    val byId = new scala.collection.mutable.TreeMap[Long,
      (Long, scala.collection.mutable.ArrayBuffer[(Int, Long)])]()
    rows.foreach { r =>
      val id = r.getLong(0)
      val e = byId.getOrElseUpdate(id,
        (r.getLong(1), new scala.collection.mutable.ArrayBuffer))
      if (!r.isNullAt(2)) e._2 += ((r.getLong(2).toInt, r.getLong(3)))
    }
    val w = new Array[Long](dim)
    val u = new Array[Long](dim)
    var b = 0L
    var ub = 0L
    var steps = 0L
    var r = 0
    while (r < rounds) {
      byId.foreach { case (_, (y, x)) =>
        var dot = 0L
        x.foreach { case (d, c) => dot += w(d) * c }
        if (y * (dot + b) <= 0L) {
          x.foreach { case (d, c) => w(d) += y * c }
          b += y
        }
        var i = 0
        while (i < dim) { u(i) += w(i); i += 1 }
        ub += b
        steps += 1
      }
      r += 1
    }
    PerceptronModel(w, b, u, ub, dim, rounds, steps)
  }

  /** The trained weights as a frame: one row per bucket
    * (dim, w, w_sum) plus the bias at dim = −1 — the committable /
    * oracle-comparable artifact. */
  def weightsFrame(spark: SparkSession, m: PerceptronModel): DataFrame = {
    import spark.implicits._
    ((-1L, m.b, m.bSum) +: m.w.indices.map(d =>
      (d.toLong, m.w(d), m.wSum(d))))
      .toDF("dim", "w", "w_sum")
  }

  /** Persist the trained artifact: `dir/weights` (the
    * [[weightsFrame]] layout, bias at dim = −1) + `dir/meta`
    * (dim, rounds, steps), committed by a marker written LAST — the
    * [[graft.streaming.Streaming.PqIndexMaintainer]] checkpoint
    * protocol, so a crash mid-save can never be loaded as a mixed
    * generation. */
  def saveModel(spark: SparkSession, m: PerceptronModel,
                dir: String): Unit = {
    import spark.implicits._
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_commit")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(marker, false)
    weightsFrame(spark, m).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/weights")
    Seq((m.dim, m.rounds, m.steps)).toDF("dim", "rounds", "steps")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
    val out = fs.create(marker, true)
    out.writeBytes("graft-perceptron v1\n")
    out.close()
  }

  /** Load a [[saveModel]] artifact; refuses loudly when the commit
    * marker is absent (crash mid-save or wrong directory). */
  def loadModel(spark: SparkSession, dir: String): PerceptronModel = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_commit")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      throw new IllegalStateException(
        s"QualityClassifier.loadModel: no commit marker at $marker — " +
          "the save is absent or was interrupted; re-save the model.")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val dim = meta.getInt(0)
    val w = new Array[Long](dim)
    val u = new Array[Long](dim)
    var b = 0L
    var ub = 0L
    spark.read.parquet(s"$dir/weights").collect().foreach { r =>
      val d = r.getLong(0)
      if (d == -1L) { b = r.getLong(1); ub = r.getLong(2) }
      else { w(d.toInt) = r.getLong(1); u(d.toInt) = r.getLong(2) }
    }
    PerceptronModel(w, b, u, ub, dim, meta.getInt(1), meta.getLong(2))
  }

  /** Serve: score every id in `features` with the AVERAGED (summed)
    * weights — margin = Σ_d cnt_d · u_d + ub, pred = margin > 0. One
    * broadcast equi-join on the `dim`-row weight table + one
    * partial-aggregated groupBy(id); ids with no feature rows (empty
    * docs) are absent, matching the vectorizer's sparse contract. */
  def scoreAveraged(spark: SparkSession, features: DataFrame,
                    idCol: String, m: PerceptronModel): DataFrame = {
    import spark.implicits._
    val wdf = m.wSum.indices.map(d => (d.toLong, m.wSum(d)))
      .toDF("dim", "__w")
    features.join(broadcast(wdf), Seq("dim"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("__w")).as("__s"))
      .select(col(idCol), (col("__s") + lit(m.bSum)).as("margin"),
        (col("__s") + lit(m.bSum) > 0L).as("pred"))
  }
}
