package graft
import org.apache.spark.sql.SparkSession
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args(0) == "ALL") Queries.all.keys.toSeq.sorted else args.toSeq
    names.foreach { name =>
      val df = Queries.all(name).impl(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
      val t1 = System.nanoTime()
      df.repartition(1).write.mode("overwrite").parquet(s"/tmp/profq_out/$name")
      println(f"[prof] $name repart-write ${(System.nanoTime()-t1)/1e9}%.1f s")
    }
    spark.stop()
  }
}
