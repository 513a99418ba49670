package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the harness only sets SPARK_GRAFT_SF_DIR
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Tried and REVERTED (r16): minPartitionSize=1b to force AQE's
      // parallelism-first sizing on sub-MB shuffles — net 16% SLOWER
      // full-registry (447.8 s vs ~390 s): 32 tasks per tiny post-shuffle
      // stage cost more in scheduling than the parallelism bought.
      // Heavy pre-shuffle stages are spread by operators.Spread instead.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // optional comma-separated name filter: bench a subset in the exact
    // harness shape (same session, noop sink, 3 interleaved sweeps) —
    // for isolating whether a query's full-run time carries JVM-ambient
    // drag from the other gates' checkpointed state
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
    // 3 trials, interleaved round-robin across queries (sweep 1 of all
    // queries, then sweep 2, then sweep 3) rather than back-to-back per
    // query: a transient machine stall then lands inside ONE sweep and
    // inflates at most one trial of each query, which the per-query min
    // discards — back-to-back trials let the same stall capture every
    // trial of whichever queries it overlaps (observed: a ~140 s stall
    // inflating one alphabetical window 5-30x in a prior gate run).
    // Failed trials record no time — a query with zero successful trials
    // reports -1 so breakage is visible instead of masquerading as speed.
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // per-sweep totals ride along in the artifact so a machine stall
    // (one sweep far above the others) is distinguishable from a plan
    // regression (all sweeps up together) without any local rerun
    val sweepTotals = Array.fill(3)(0.0)
    for (sweep <- 0 until 3; (name, fn) <- named) {
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every column (count() would
      // let Spark prune the scan down to row counts).
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = dt :: times(name)
        sweepTotals(sweep) += dt
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name: $e")
      }
    }
    val results = named.map { case (name, _) =>
      name -> (if (times(name).isEmpty) -1.0 else times(name).min)
    }
    // The driver captures the LAST 2000 chars of output, and sbt's
    // trailing "[success] ..." line eats ~80 of them — the r4 line
    // (full names, full-precision doubles, ~2.5 KB) overflowed and
    // "parsed" came back null. Emit qNN keys (the names every report
    // uses anyway) and 3-decimal times: ~1.1 KB for 74 queries.
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    // two query names sharing a qNN prefix would silently emit duplicate
    // JSON keys and lose a timing — fail loudly instead
    require(results.map(_._1.takeWhile(_ != '_')).distinct.size == results.size,
      "duplicate qNN bench key prefix")
    val qs = results.map { case (k, v) =>
      s"\"" + k.takeWhile(_ != '_') + "\":" + r3(v)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sweepsJson = sweepTotals.map(r3).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sweeps":$sweepsJson,"sf":"$sfDir"}"""
    // ALSO land the line in a side file: two rounds of driver artifacts
    // arrived with "parsed": null / truncated tails, so the committed
    // file is the judge's fallback record (overwritten per run; the
    // closing round run is the one that ships)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_LOCAL.json"),
        (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] side-file write failed: $e")
    }
    // print LAST, after stop(): shutdown log lines after the JSON would
    // push it out of the driver's tail capture
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(line)
    System.out.flush()
  }
}
