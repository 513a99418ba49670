package graft.tmp
import org.apache.spark.sql.SparkSession

object ExplainQ {
  def main(args: Array[String]): Unit = {
    val explain = args.headOption.contains("-e")
    val names = if (explain) args.drop(1) else args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name =====")
      if (explain)
        graft.Queries.all(name).impl(spark, sfDir).explain("formatted")
      else (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.Queries.all(name).impl(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[time] $name trial$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
