package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Averaged perceptron: hand-computable trace, separable convergence,
  * loud contracts, and the serving plan shape. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("hand trace: two examples, one round, exact w/b and sums") {
    // x1 = {d0: 2}, y1 = +1 ; x2 = {d1: 3}, y2 = -1, dim = 2
    val feats = Seq((1L, 0L, 2L), (2L, 1L, 3L)).toDF("id", "dim", "cnt")
    val labels = Seq((1L, 1L), (2L, -1L)).toDF("id", "label")
    val m = QualityClassifier.trainAveragedPerceptron(
      feats, labels, "id", "label", dim = 2, rounds = 1)
    // step 1: margin 0 → update: w = (2, 0), b = 1; u = (2, 0), ub = 1
    // step 2: y(w·x+b) = -1·(0+1) ≤ 0 → update: w = (2, -3), b = 0;
    //         u = (4, -3), ub = 1
    assert(m.w.toSeq == Seq(2L, -3L) && m.b == 0L)
    assert(m.wSum.toSeq == Seq(4L, -3L) && m.bSum == 1L)
    assert(m.steps == 2L)
  }

  test("separable data converges and serving scores it perfectly; " +
    "weightsFrame carries the bias at dim = -1") {
    // label = sign of (count of 'pos' tokens minus count of 'neg')
    val docs = (0L until 40L).map { i =>
      val pos = (i % 5 + (if (i % 2 == 0) 3 else 0)).toInt
      val neg = (i % 3 + (if (i % 2 == 0) 0 else 3)).toInt
      (i, ("pos " * pos + "neg " * neg).trim,
        if (pos > neg) 1L else -1L)
    }.toDF("id", "text", "label")
    val feats = graft.operators.TextAnalysis.hashingVectorizer(
      docs, "id", "text", 16)
    val m = QualityClassifier.trainAveragedPerceptron(
      feats, docs.select($"id", $"label"), "id", "label", 16, rounds = 5)
    val scored = QualityClassifier.scoreAveraged(spark, feats, "id", m)
      .join(docs.select($"id", $"label"), Seq("id"))
    val acc = scored.where(($"pred" && $"label" === 1L) ||
      (!$"pred" && $"label" === -1L)).count()
    assert(acc == 40L, s"separable data must classify perfectly, got $acc/40")
    val wf = QualityClassifier.weightsFrame(spark, m).collect()
    assert(wf.length == 17)
    val bias = wf.find(_.getLong(0) == -1L).get
    assert(bias.getLong(1) == m.b && bias.getLong(2) == m.bSum)
    // serving joins the dim-row weight table broadcast, no sort/window
    val plan = QualityClassifier.scoreAveraged(spark, feats, "id", m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("Window"),
      s"serving must broadcast the weights:\n$plan")
  }

  test("saveModel/loadModel roundtrip: weights identical, scoring " +
    "identical, missing commit marker refuses loudly") {
    val feats = Seq((1L, 0L, 2L), (2L, 1L, 3L), (3L, 0L, 1L))
      .toDF("id", "dim", "cnt")
    val labels = Seq((1L, 1L), (2L, -1L), (3L, 1L)).toDF("id", "label")
    val m = QualityClassifier.trainAveragedPerceptron(
      feats, labels, "id", "label", dim = 4, rounds = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-clsmodel")
      .toString
    QualityClassifier.saveModel(spark, m, dir)
    val l = QualityClassifier.loadModel(spark, dir)
    assert(l.w.toSeq == m.w.toSeq && l.wSum.toSeq == m.wSum.toSeq &&
      l.b == m.b && l.bSum == m.bSum && l.dim == m.dim &&
      l.rounds == m.rounds && l.steps == m.steps)
    val a = QualityClassifier.scoreAveraged(spark, feats, "id", m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bScores = QualityClassifier.scoreAveraged(spark, feats, "id", l)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == bScores, "loaded model must score identically")
    // a crash between marker delete and re-create must refuse to load
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_commit")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(marker, false)
    val e = intercept[IllegalStateException] {
      QualityClassifier.loadModel(spark, dir)
    }
    assert(e.getMessage.contains("commit marker"))
  }

  test("contracts: duplicate label ids, out-of-domain labels, " +
    "oversized train sets and foreign dims all fail loudly") {
    val feats = Seq((1L, 0L, 1L)).toDF("id", "dim", "cnt")
    val dup = Seq((1L, 1L), (1L, -1L)).toDF("id", "label")
    val e1 = intercept[IllegalArgumentException] {
      QualityClassifier.trainAveragedPerceptron(feats, dup, "id",
        "label", 4, 1)
    }
    assert(e1.getMessage.contains("duplicate label ids"))
    val bad = Seq((1L, 2L)).toDF("id", "label")
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.trainAveragedPerceptron(feats, bad, "id",
        "label", 4, 1)
    }
    assert(e2.getMessage.contains("outside {+1,-1}"))
    val lab = Seq((1L, 1L), (2L, -1L)).toDF("id", "label")
    val e3 = intercept[IllegalArgumentException] {
      QualityClassifier.trainAveragedPerceptron(feats, lab, "id",
        "label", 4, 1, maxTrainRows = 1L)
    }
    assert(e3.getMessage.contains("driver-collect bound"))
    val wide = Seq((1L, 9L, 1L)).toDF("id", "dim", "cnt")
    val e4 = intercept[IllegalArgumentException] {
      QualityClassifier.trainAveragedPerceptron(wide, lab, "id",
        "label", 4, 1)
    }
    assert(e4.getMessage.contains("dim must match"))
    // an id labeled but featureless trains as a zero vector (bias only)
    val m = QualityClassifier.trainAveragedPerceptron(
      Seq((1L, 0L, 1L)).toDF("id", "dim", "cnt"),
      Seq((1L, 1L), (7L, -1L)).toDF("id", "label"),
      "id", "label", 4, 1)
    assert(m.steps == 2L)
  }
}
