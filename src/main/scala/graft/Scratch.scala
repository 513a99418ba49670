package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition experiments for the optimization rounds —
  * NOT part of the driver contract; times labeled sub-plans with the
  * bench's noop-sink methodology. Edit freely per investigation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(df: => DataFrame): Unit = {
      (1 to 2).foreach { sweep =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $label sweep$sweep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- q237 decomposition ----
    import graft.operators.Graph
    val d = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val e = timed("q237-e-ckpt") {
      d.as("l").join(d.as("r"), col("l.b") === col("r.b")
          && col("l.i") < col("r.i"))
        .select(col("l.i").as("u"), col("r.i").as("v"))
        .distinct().localCheckpoint()
    }
    println("[scratch] e rows " + e.count())
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val ends = timed("q237-ends") {
      deg.agg(
        graft.functions.top_k_by(struct(col("dg"), (-col("node")).as("nn")), 3).as("h"),
        graft.functions.top_k_by(struct((-col("dg")).as("nd"), (-col("node")).as("nn")), 3).as("a")).head()
    }
    def nodesAt(i: Int): Array[Long] =
      ends.getSeq[org.apache.spark.sql.Row](i).map(r => -r.getLong(1)).toArray
    val (hubs, antis) = (nodesAt(0), nodesAt(1))
    timed("q237-pairBetweenness-job") {
      Graph.pairBetweenness(e, hubs.zip(antis).toSeq, maxDepth = 3)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- q264 decomposition ----
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    timed("q264-full-job") {
      TextAnalysis.stupidBackoffPerplexity(docs, "doc_id", "text",
          col("doc_id") % 3 =!= 0L, order = 5, thresholdMicro = 2550000L)
        .write.format("noop").mode("overwrite").save()
    }
    timed("q264-full-job2") {
      TextAnalysis.stupidBackoffPerplexity(docs, "doc_id", "text",
          col("doc_id") % 3 =!= 0L, order = 5, thresholdMicro = 2550000L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
