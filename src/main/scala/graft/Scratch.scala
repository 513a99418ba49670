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

    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cand_v"))
      .withColumn("cand_norm", graft.functions.vec_norm(col("cand_v")))
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("query_v"))
      .withColumn("query_norm", graft.functions.vec_norm(col("query_v")))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(graft.functions.vec_dot(col("query_v"), col("cand_v"))
          / (col("query_norm") * col("cand_norm")), 6).as("cos_sim"))
    val cC = c.localCheckpoint()
    val qC = q.localCheckpoint()
    val scoredC = cC.join(broadcast(qC), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(graft.functions.vec_dot(col("query_v"), col("cand_v"))
          / (col("query_norm") * col("cand_norm")), 6).as("cos_sim"))
    val dotOnly = cC.join(broadcast(qC), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (graft.functions.vec_dot(col("query_v"), col("cand_v"))
          / (col("query_norm") * col("cand_norm"))).as("cos_sim"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def agg(df: DataFrame) = df.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), count(lit(1)))
    time("agg-nospread")(agg(li))
    time("agg-roundrobin")(agg(li.repartition(32)))
    time("agg-xxhash")(agg(li.repartition(32,
      xxhash64(struct(li.columns.map(col).toIndexedSeq: _*)))))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def toks(df: DataFrame) = df.select(col("doc_id"),
      explode(graft.functions.ws_tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)))
    time("toks-nospread")(toks(docs))
    time("toks-roundrobin")(toks(docs.repartition(32)))
    time("toks-xxhash")(toks(docs.repartition(32, xxhash64(col("doc_id")))))
    spark.stop()
  }
}
