package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for named queries to text files — the
  * optimization rounds' before/after plan evidence
  * (`plans/r<N>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <name...|ALL>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default all cores) — same session shape as
  *      Bench so the dumped plan is the benched plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (args.length > 2 && args(2) == "ALL") Queries.all.keys.toSeq.sorted
      else args.drop(2).toSeq
    names.foreach { name =>
      val full = Queries.all.keys.find(k => k == name || k.startsWith(name + "_"))
        .getOrElse(sys.error(s"no query named $name"))
      try {
        val df = Queries.all(full).impl(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(outDir, s"${full.takeWhile(_ != '_')}_$tag.txt"), txt)
        System.err.println(s"[plandump] $full -> $outDir (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $full FAILED: $e")
      }
    }
    spark.stop()
  }
}
