package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Ad-hoc stage decomposition experiments for the optimization rounds —
  * NOT part of the driver contract. This revision dumps the formatted
  * plans of INTERNAL (pre-checkpoint) stages that the per-query
  * PlanDump cannot show, as evidence for OPTIMIZATION_r16.md's claims. */
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
    def dump(name: String, df: DataFrame): Unit = {
      Files.writeString(Paths.get("plans/r16", name),
        df.queryExecution.explainString(FormattedMode))
      System.err.println(s"[scratch] wrote plans/r16/$name")
    }

    // q237/q229/q208/q214 internal shape: ONE exchange to a
    // basket-partitioned dedup (HashAggregate directly over the
    // repartition, no second exchange), then the self-join on b over
    // the checkpointed RDD (its plan shows no exchange on either side).
    val dPlan = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .repartition(col("b")).dropDuplicates("b", "i")
    dump("q237_internal_dedup_after.txt", dPlan)
    val d = dPlan.localCheckpoint()
    dump("q237_internal_selfjoin_after.txt",
      d.as("l").join(d.as("r"), col("l.b") === col("r.b")
          && col("l.i") < col("r.i"))
        .select(col("l.i").as("u"), col("r.i").as("v")).distinct())

    // brute-force pair scan internals (q179/q313/q333/q345 family):
    // the corpus side fans out through a round-robin exchange before
    // the BroadcastNestedLoopJoin, norms computed below the join.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    dump("q179_internal_brute_after.txt",
      graft.operators.Similarity.bruteForceTopK(emb, emb, 1))
    spark.stop()
  }
}
