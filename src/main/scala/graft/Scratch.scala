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

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      val d = timed(s"p$pass-d-ckpt") {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
          .where(col("b").isNotNull && col("i").isNotNull)
          .repartition(col("b")).dropDuplicates("b", "i").localCheckpoint()
      }
      val e = timed(s"p$pass-e-ckpt") {
        d.as("l").join(d.as("r"), col("l.b") === col("r.b")
            && col("l.i") < col("r.i"))
          .select(col("l.i").as("u"), col("r.i").as("v"))
          .distinct().localCheckpoint()
      }
      val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val ends = timed(s"p$pass-ends") {
        deg.agg(
          graft.functions.top_k_by(struct(col("dg"), (-col("node")).as("nn")), 3).as("h"),
          graft.functions.top_k_by(struct((-col("dg")).as("nd"), (-col("node")).as("nn")), 3).as("a")).head()
      }
      def nodesAt(i: Int): Array[Long] =
        ends.getSeq[org.apache.spark.sql.Row](i).map(r => -r.getLong(1)).toArray
      val pairs = nodesAt(0).zip(nodesAt(1)).toSeq

      // inline pairBetweenness distributed path, timed per stage
      val e0 = e.toDF("u", "v")
        .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
        .where(col("u") =!= col("v"))
      val sym = timed(s"p$pass-sym-ckpt") {
        e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
          .repartition(col("u")).dropDuplicates("u", "v").localCheckpoint()
      }
      timed(s"p$pass-nEdges")(sym.count())
      import spark.implicits._
      val seeds = pairs.zipWithIndex.flatMap { case ((s, t), idx) =>
        Seq((idx.toLong, 0L, s), (idx.toLong, 1L, t)) }
      val seed0 = seeds.toDF("idx", "dir", "node")
        .withColumn("d", lit(0L)).withColumn("sig", lit(1L))
        .localCheckpoint()
      val frames = scala.collection.mutable.ArrayBuffer(seed0)
      var frontier = seed0
      (1 to 3).foreach { depth =>
        val settledU = frames.reduce(_ unionByName _)
        val nxt = timed(s"p$pass-level$depth") {
          frontier.withColumnRenamed("node", "u")
            .join(sym, "u")
            .select(col("idx"), col("dir"), col("v").as("node"), col("sig"))
            .join(settledU.select(col("idx"), col("dir"), col("node")),
              Seq("idx", "dir", "node"), "left_anti")
            .groupBy(col("idx"), col("dir"), col("node"))
            .agg(sum(col("sig")).as("sig"))
            .withColumn("d", lit(depth.toLong))
            .localCheckpoint()
        }
        frames += nxt
        frontier = nxt
        timed(s"p$pass-dry$depth")(nxt.limit(1).count())
      }
      val settled = frames.reduce(_ unionByName _)
      timed(s"p$pass-rows")(println("  settled " + settled.count()))
    }
    spark.stop()
  }
}
