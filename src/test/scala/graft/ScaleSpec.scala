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
}
