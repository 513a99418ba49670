package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Structured Streaming sessionization/count tests via MemoryStream. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming sessionization groups events by gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "value")
    val q = Streaming.sessionized(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    try {
      // user 1: two events 10 min apart (one session), then one 90 min later
      mem.addData((ts(0), 1L, 1.0), (ts(10), 1L, 2.0), (ts(100), 1L, 5.0),
                  (ts(5), 2L, 7.0))
      q.processAllAvailable()
      val out = spark.table("sess").orderBy("user_id", "session_start").collect()
      assert(out.length == 3)
      val u1 = out.filter(_.getLong(0) == 1L)
      assert(u1.length == 2)
      assert(u1(0).getAs[Long]("n_events") == 2L)
      assert(u1(0).getAs[Double]("total_value") == 3.0)
      assert(u1(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("streaming session funnel reports entry/exit types and distinct counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "event_id", "event_type", "value")
    val q = Streaming.sessionFunnel(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("funnel").outputMode("complete").start()
    try {
      // user 1, one session: view -> click -> view -> buy (10 min apart);
      // same-ts tie inside (ts(20)): event_id orders click(4) before view(5)
      mem.addData(
        (ts(0), 1L, 1L, "view", 1.0), (ts(10), 1L, 2L, "click", 2.0),
        (ts(20), 1L, 4L, "click", 0.5), (ts(20), 1L, 5L, "view", 0.5),
        (ts(30), 1L, 6L, "buy", 9.0),
        (ts(0), 2L, 3L, "view", 4.0))
      q.processAllAvailable()
      val out = spark.table("funnel").orderBy("user_id").collect()
      assert(out.length == 2)
      val u1 = out.head
      assert(u1.getAs[Long]("n_events") == 5L)
      assert(u1.getAs[Long]("n_types") == 3L)
      assert(u1.getAs[String]("first_type") == "view")
      assert(u1.getAs[String]("last_type") == "buy")
      assert(u1.getAs[Double]("total_value") == 13.0)
      assert(out(1).getAs[String]("first_type") == "view"
        && out(1).getAs[String]("last_type") == "view")
    } finally q.stop()
  }

  test("streaming anomaly z-scores match the batch trailing-window math") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val counts = mem.toDF().toDF("event_type", "bucket", "cnt")
    val q = Streaming.streamingAnomaly(counts, window = 4, minPrev = 2)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    try {
      // two micro-batches: state must carry the trailing window across
      mem.addData(("a", 0L, 10L), ("a", 1L, 12L), ("a", 2L, 11L))
      q.processAllAvailable()
      mem.addData(("a", 3L, 30L), ("b", 0L, 5L))
      q.processAllAvailable()
      val out = spark.table("anom").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (Option(r.get(3)).map(_.asInstanceOf[Double]),
           Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
      assert(out(("a", 0L)) == (None, None), "no trailing buckets yet")
      assert(out(("a", 1L)) == (None, None), "below minPrev")
      // bucket 2: prev = {10, 12}: mean 11, var 1 -> z = (11-11)/1 = 0
      assert(out(("a", 2L)) == (Some(11.0), Some(0.0)))
      // bucket 3 (second batch, state carried): prev = {10, 12, 11}:
      // mean 11, var = (100+144+121)/3 - 121 = 2/3
      val (m3, z3) = out(("a", 3L))
      assert(m3.contains(11.0))
      assert(math.abs(z3.get - (30.0 - 11.0) / math.sqrt(2.0 / 3)) < 1e-12)
      assert(out(("b", 0L)) == (None, None), "keys are independent")
    } finally q.stop()
  }

  test("streaming Bloom decontamination matches the batch probe on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.functions._
    val (m, k) = (2048, 4)
    // held-out set: two eval docs; training doc 11 shares a 3-gram with doc 1
    val heldOut = Seq("alpha beta gamma delta", "one two three four five")
      .toDF("text")
    val bloom = heldOut
      .select(explode(word_shingles(ws_tokens(col("text")), 3, distinct = true)).as("sg"))
      .agg(bloom_agg(col("sg"), m, k).as("f"))
    val train = Seq(
      (11L, "alpha beta gamma zeta eta"), // overlaps "alpha beta gamma"
      (12L, "totally unrelated text here now"),
      (13L, null.asInstanceOf[String]))   // NULL text -> clean empty doc
    val batch = Streaming.streamingDecontaminate(
      train.toDF("doc_id", "text"), bloom, m, k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.streamingDecontaminate(
      mem.toDF().toDF("doc_id", "text"), bloom, m, k)
      .writeStream.format("memory").queryName("decon").outputMode("append").start()
    try {
      mem.addData(train: _*)
      q.processAllAvailable()
      val streamed = spark.table("decon")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed(11L)._2 >= 1L, "shared shingle must hit")
      assert(streamed(13L) == (0L, 0L), "NULL text must be a clean empty doc")
    } finally q.stop()
  }

  test("streaming chunker emits exactly the batch chunk table") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")), // 3 windows at 16/8
      (2L, "short doc"),
      (3L, null.asInstanceOf[String]))                // no chunks
    val batch = graft.operators.TextAnalysis.chunkOffsets(
        docs.toDF("doc_id", "text"), "doc_id", "text", 16, 8)
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.streamingChunks(mem.toDF().toDF("doc_id", "text"), 16, 8)
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("chunks").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.count(_.head == 1L) == 4) // doc 1: starts 0, 8, 16, 24
    } finally q.stop()
  }

  test("streaming quality gate scores exactly like the batch classifier") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "000 111 222 333 444 555"), // digit-heavy: should fail the gate
      (3L, null.asInstanceOf[String]))
    val batch = graft.operators.TextAnalysis.classifierQualityFilter(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        bias = -0.7, wMeanLen = 0.05, wAlpha = 0.4, wStop = 1.0, wDigit = -3.0)
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.streamingQualityGate(mem.toDF().toDF("doc_id", "text"),
        bias = -0.7, wMeanLen = 0.05, wAlpha = 0.4, wStop = 1.0, wDigit = -3.0)
      .writeStream.format("memory").queryName("qgate").outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("qgate").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      // the digit-heavy doc is rejected in both engines
      assert(streamed.toSeq.filter(_.head == 2L).forall(_.last == false))
      assert(streamed.toSeq.filter(_.head == 1L).forall(_.last == true))
    } finally q.stop()
  }

  test("streaming vectorizer emits exactly the batch hashing-trick rows") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta alpha gamma alpha"),
      (2L, "one two three"),
      (3L, null.asInstanceOf[String]))
    val batch = graft.operators.TextAnalysis.hashingVectorizer(
        docs.toDF("doc_id", "text"), "doc_id", "text", 64)
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.streamingVectorize(mem.toDF().toDF("doc_id", "text"), 64)
      .writeStream.format("memory").queryName("vecz").outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("vecz").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      // per-doc counts must sum to the doc's token count (collision-proof;
      // toSeq first — summing over the Set would collapse equal counts)
      assert(streamed.toSeq.filter(_.head == 1L).map(_(2).asInstanceOf[Long]).sum == 5L)
      assert(streamed.toSeq.filter(_.head == 2L).map(_(2).asInstanceOf[Long]).sum == 3L)
    } finally q.stop()
  }

  test("streaming vectorizer matches batch on a long skewed document") {
    // 20k tokens over ~1.5k distinct words into 256 buckets — the shape
    // where the old per-distinct-bucket rescan went quadratic; the
    // single-pass histogram must still match the batch groupBy exactly
    implicit val sqlCtx = spark.sqlContext
    val words = (0 until 20000).map(i => s"w${i % 1499}")
    val doc = (7L, words.mkString(" "))
    val batch = graft.operators.TextAnalysis.hashingVectorizer(
        Seq(doc).toDF("doc_id", "text"), "doc_id", "text", 256)
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.streamingVectorize(mem.toDF().toDF("doc_id", "text"), 256)
      .writeStream.format("memory").queryName("veczlong").outputMode("append").start()
    try {
      mem.addData(doc)
      q.processAllAvailable()
      val streamed = spark.table("veczlong").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.toSeq.map(_(2).asInstanceOf[Long]).sum == 20000L)
    } finally q.stop()
  }

  test("streaming perplexity gate matches the batch filter on the same LM") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the rug"),
      (4L, "zq wv xj kp qr bn"),
      (5L, "single"),
      (6L, null.asInstanceOf[String]))
    val df = docs.toDF("doc_id", "text")
    val threshold = 3500000L
    val batch = graft.operators.TextAnalysis
      .ccnetPerplexityFilter(df, "doc_id", "text", threshold)
      .collect().map(_.toSeq).toSet
    // serve the SAME trained table to the stream as a literal map
    val nllMap = graft.operators.TextAnalysis.bigramNllTable(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.streamingPerplexityGate(
        mem.toDF().toDF("doc_id", "text"), nllMap, threshold,
        unseenNllMicro = Long.MaxValue / 4)
      .writeStream.format("memory").queryName("pplgate").outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("pplgate").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      // both keeps and drops occur at this threshold
      assert(streamed.exists(_.last == true) && streamed.exists(_.last == false))
      // a doc whose bigrams the LM has never seen must DEGRADE (charged
      // the unseen penalty, keep=false), not throw MAP_KEY_DOES_NOT_EXIST
      // under Spark 4 default ANSI
      mem.addData((7L, "completely novel never trained phrasing"))
      q.processAllAvailable()
      val unseen = spark.table("pplgate").collect()
        .find(_.getLong(0) == 7L).get
      assert(unseen.getAs[Long]("n_bigrams") == 4L &&
        !unseen.getAs[Boolean]("keep"))
    } finally q.stop()
  }

  test("streaming dedup emits only the first occurrence per content hash") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Timestamp)]
    val docs = mem.toDF().toDF("content_hash", "doc_id", "ts")
    val q = Streaming.streamingDedup(docs)
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(("h1", 1L, ts(0)), ("h2", 2L, ts(0)), ("h1", 3L, ts(1)))
      q.processAllAvailable()
      mem.addData(("h1", 4L, ts(2)), ("h3", 5L, ts(2))) // h1 already seen in state
      q.processAllAvailable()
      val out = spark.table("dedup").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.keySet == Set("h1", "h2", "h3"))
      assert(out("h1") != 4L) // the later duplicate never re-emits
      assert(out("h2") == 2L && out("h3") == 5L)
    } finally q.stop()
  }

  test("streaming dedup state expires after the event-time TTL and re-admits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Timestamp)]
    val docs = mem.toDF().toDF("content_hash", "doc_id", "ts")
    // 1-minute TTL, no watermark lag: silence past a minute drops the key
    val q = Streaming.streamingDedup(docs, watermarkDelay = "0 seconds",
        ttlMs = 60000L)
      .writeStream.format("memory").queryName("dedup_ttl").outputMode("append").start()
    try {
      mem.addData(("h1", 1L, ts(0)))
      q.processAllAvailable()
      // advance the watermark far past h1's timer (minute 1)
      mem.addData(("hx", 9L, ts(100)))
      q.processAllAvailable()
      mem.addData(("hy", 10L, ts(101))) // a batch with no h1 rows: timer fires
      q.processAllAvailable()
      mem.addData(("h1", 4L, ts(102))) // expired key re-admits
      q.processAllAvailable()
      val h1 = spark.table("dedup_ttl").collect()
        .filter(_.getString(0) == "h1").map(_.getLong(1)).toSet
      assert(h1 == Set(1L, 4L), s"expected re-admission after TTL, got $h1")
    } finally q.stop()
  }

  test("streaming windowed event-type counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val q = Streaming.eventTypeCounts(events, windowMinutes = 10)
      .writeStream.format("memory").queryName("etc").outputMode("complete").start()
    try {
      mem.addData((ts(1), "click"), (ts(2), "click"), (ts(3), "view"), (ts(15), "click"))
      q.processAllAvailable()
      val out = spark.table("etc").collect()
      assert(out.map(_.getAs[Long]("n")).sum == 4L)
      assert(out.length == 3) // (w0,click)=2, (w0,view)=1, (w1,click)=1
    } finally q.stop()
  }

  test("streaming windowed HLL distinct equals the batch sketch on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "user_id")
    val q = Streaming.windowedDistinctUsers(events, windowMinutes = 10, p = 12)
      .writeStream.format("memory").queryName("wdu").outputMode("complete").start()
    try {
      val rows = Seq(
        (ts(1), "click", 1L), (ts(2), "click", 2L), (ts(3), "click", 1L),
        (ts(4), "view", 7L), (ts(15), "click", 1L), (ts(16), "click", 3L))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("wdu").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getString(1)) -> r.getDouble(2))
        .toMap
      // batch replay of the identical aggregation — the sketch contract
      // says the estimate is bit-identical regardless of execution mode
      import spark.implicits._
      val batch = rows.toDF("ts", "event_type", "user_id")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(graft.functions.hll_distinct(col("user_id").cast("string"), 12).as("n"))
        .select(col("window.start"), col("event_type"), col("n")).collect()
        .map(r => (r.getAs[Timestamp](0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(streamed == batch)
      // p=12 linear counting is near-exact at these cardinalities
      assert(math.abs(streamed.values.sum - (2 + 1 + 2)) < 0.01)
    } finally q.stop()
  }

  test("streaming windowed histogram quantiles equal the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedValueQuantiles(events, windowMinutes = 10,
        lo = 0.0, hi = 100.0, nBins = 50)
      .writeStream.format("memory").queryName("wvq").outputMode("complete").start()
    try {
      val rows = (1 to 40).map(i => (ts(i % 9), "click", (i * 7 % 100).toDouble))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("wvq").collect()
        .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      import spark.implicits._
      val batch = rows.toDF("ts", "event_type", "value")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(graft.functions.hist_agg(col("value"), 0.0, 100.0, 50).as("h"))
        .select(col("event_type"),
          graft.functions.hist_quantile(col("h"), 0.5, 0.0, 100.0, 50),
          graft.functions.hist_quantile(col("h"), 0.9, 0.0, 100.0, 50),
          graft.functions.hist_quantile(col("h"), 0.99, 0.0, 100.0, 50))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      assert(streamed.toSet == batch.toSet)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming windowed top-k events match a batch sort per window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "event_id", "value")
    val q = Streaming.windowedTopEvents(events, k = 2, windowMinutes = 10)
      .writeStream.format("memory").queryName("wte").outputMode("complete").start()
    try {
      val rows = (1L to 30L).map(i => (ts((i % 9).toInt), "click", i, (i * 13 % 97).toDouble))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("wte").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getInt(2), r.getLong(3)))
        .toSet
      // batch expectation: per window, 2 largest by (cents desc, id asc)
      val expected = rows.groupBy { case (t, _, _, _) =>
        new Timestamp(t.getTime / 600000 * 600000)
      }.flatMap { case (w, rs) =>
        rs.map(r => (math.rint(r._4 * 100).toLong, r._3))
          .sortBy { case (c, id) => (-c, id) }.take(2).zipWithIndex
          .map { case ((_, id), i) => (w, i + 1, id) }
      }.toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("file-source stream runs batch ClipOps over incrementally arriving clips") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-clipstream").toString
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("wav", ArrayType(DoubleType))))
    Seq(("c1", Seq(0.1, -0.2, 0.3, -0.4))).toDF("name", "wav")
      .write.mode("append").parquet(dir)
    val stream = Streaming.clipFileStream(spark, dir, schema)
    // the SAME registered op graph as batch (sr=4, fps=2 -> hop 2)
    val out = graft.plans.OpRegistry.resolve("volume").get
      .apply(stream, Map("sample_rate" -> "4", "fps" -> "2"))
    val q = out.writeStream.format("memory").queryName("clipstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("clipstream").count() == 1)
      // a clip file arriving later is picked up incrementally (the
      // streaming form of the memoization manifest: no reprocessing of c1)
      Seq(("c2", Seq(1.0, 1.0))).toDF("name", "wav")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.table("clipstream").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
      assert(rows.keySet == Set("c1", "c2"))
      assert(rows("c1") == Seq(0.15000000000000002, 0.35)) // mean |x| per hop
      assert(rows("c2") == Seq(1.0))
    } finally q.stop()
  }

  test("streaming LSH emits candidate pairs against the bucket anchor") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val banded = graft.operators.Dedup.bandedSignatures(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
      extraCols = Seq("ts"))
    val q = Streaming.streamingLshCandidates(banded)
      .writeStream.format("memory").queryName("lshcand").outputMode("append").start()
    try {
      mem.addData((1L, text, ts(0)), (2L, text, ts(0)),
        (7L, "completely different words here", ts(0)))
      q.processAllAvailable()
      val first = spark.table("lshcand").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(first == Set((1L, 2L))) // identical docs collide; 7 is alone
      // a later arrival pairs with the bucket's ANCHOR (1), not with 2
      mem.addData((3L, text, ts(1)))
      q.processAllAvailable()
      val all = spark.table("lshcand").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all == Set((1L, 2L), (1L, 3L)))
    } finally q.stop()
  }

  test("streaming LSH bucket anchors expire after the TTL and re-admit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val banded = graft.operators.Dedup.bandedSignatures(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
      extraCols = Seq("ts"))
    val q = Streaming.streamingLshCandidates(banded,
        watermarkDelay = "0 seconds", ttlMs = 60000L)
      .writeStream.format("memory").queryName("lshcand_ttl")
      .outputMode("append").start()
    try {
      mem.addData((1L, text, ts(0)), (2L, text, ts(0)))
      q.processAllAvailable()
      mem.addData((7L, "completely different words here", ts(100)))
      q.processAllAvailable()
      mem.addData((8L, "other unrelated phrasing entirely", ts(101)))
      q.processAllAvailable() // anchor-1 timers fire in a batch without its rows
      mem.addData((3L, text, ts(102)), (4L, text, ts(102)))
      q.processAllAvailable()
      val all = spark.table("lshcand_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // after expiry doc 3 (not 1) anchors the bucket: re-admission
      assert(all == Set((1L, 2L), (3L, 4L)), s"expected fresh anchor, got $all")
    } finally q.stop()
  }

  test("streaming LSH replay is candidate-parity with the batch LSH step") {
    // The streaming op emits a STAR around each bucket's anchor where the
    // batch candidate step emits the bucket CLIQUE, so parity modulo
    // anchor choice means: (1) every streaming edge is a batch candidate
    // edge, and (2) both edge sets induce the same connected components —
    // the invariant that matters for dedup clustering.
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      3L -> "the quick brown fox jumps over the lazy dog again and again",
      4L -> "pack my box with five dozen liquor jugs every single day now",
      5L -> "pack my box with five dozen liquor jugs every single day now",
      6L -> "completely different words that match nothing else in this corpus",
      7L -> "one more unrelated document with its own vocabulary entirely")
    // batch candidate step: bucket clique on (band, band_sig)
    val banded = graft.operators.Dedup.bandedSignatures(
      texts.toDF("doc_id", "text"), "doc_id", "text")
    val batchCand = banded.select(col("band"), col("band_sig"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("band_sig"), col("doc_id").as("id_b")),
        Seq("band", "band_sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // streaming replay of the same corpus across two micro-batches
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sBanded = graft.operators.Dedup.bandedSignatures(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
      extraCols = Seq("ts"))
    val q = Streaming.streamingLshCandidates(sBanded)
      .writeStream.format("memory").queryName("lshparity")
      .outputMode("append").start()
    try {
      mem.addData(texts.take(4).map { case (id, t) => (id, t, ts(0)) }: _*)
      q.processAllAvailable()
      mem.addData(texts.drop(4).map { case (id, t) => (id, t, ts(1)) }: _*)
      q.processAllAvailable()
      val streamCand = spark.table("lshparity").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
                   math.max(r.getLong(0), r.getLong(1)))).toSet
      assert(streamCand.subsetOf(batchCand),
        s"streaming emitted non-candidates: ${streamCand -- batchCand}")
      // identical connected components over the full vertex set
      def components(edges: Set[(Long, Long)]): Set[Set[Long]] = {
        val parent = scala.collection.mutable.Map(texts.map(_._1).map(k => k -> k): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
        edges.foreach { case (a, b) => parent(find(a)) = find(b) }
        texts.map(_._1).groupBy(find).values.map(_.toSet).toSet
      }
      assert(components(streamCand) == components(batchCand),
        s"stream=${components(streamCand)} batch=${components(batchCand)}")
    } finally q.stop()
  }

  test("stream-stream interval join matches views in the click's range") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val views = vMem.toDF().toDF("user_id", "ts", "event_id")
    val clicks = cMem.toDF().toDF("user_id", "ts", "event_id")
    val q = Streaming.clickViewJoin(views, clicks, rangeMinutes = 10)
      .writeStream.format("memory").queryName("cvj").outputMode("append").start()
    try {
      vMem.addData((1L, ts(0), 100L), (1L, ts(8), 101L), (1L, ts(30), 102L),
                   (2L, ts(9), 200L))
      cMem.addData((1L, ts(10), 900L)) // range [minute 0, minute 10]
      q.processAllAvailable()
      val matched = spark.table("cvj").collect()
        .map(r => r.getAs[Long]("view_id")).toSet
      // view 102 is after the click, view 200 is another user
      assert(matched == Set(100L, 101L))
    } finally q.stop()
  }

  test("watermark drops late events from append-mode windowed counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val q = Streaming.eventTypeCounts(events, windowMinutes = 10, watermark = "20 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      mem.addData((ts(1), "click"), (ts(2), "click"))
      q.processAllAvailable()
      // advance the watermark far past window [0,10): its count finalizes
      mem.addData((ts(120), "view"))
      q.processAllAvailable()
      // a straggler inside the finalized window: dropped, not recounted
      mem.addData((ts(3), "click"))
      q.processAllAvailable()
      // windows align to epoch multiples of 10 min, so assert by type: the
      // click window finalized with 2 — the straggler was dropped
      val clicksOut = spark.table("late").collect()
        .filter(_.getAs[String]("event_type") == "click")
      assert(clicksOut.length == 1 && clicksOut(0).getAs[Long]("n") == 2L)
    } finally q.stop()
  }

  test("streaming upserts maintain the search index to batch-rebuild parity") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextAnalysis
    val v0 = Seq((1L, "the data point one"), (2L, "the data two"),
      (3L, "point three data"))
    // batch 1: change doc 2, add doc 4; batch 2: change doc 1 (drops
    // "data"/"point" entirely), add doc 5, re-send doc 3 UNCHANGED
    val b1 = Seq((2L, "the data two edited point"), (4L, "fresh data point four"))
    val b2 = Seq((1L, "the one rewritten"), (5L, "five data"),
      (3L, "point three data"))
    val m = new Streaming.SearchIndexMaintainer(
      v0.toDF("doc_id", "text"), "doc_id", "text", nShards = 2)
    val mem = MemoryStream[(Long, String)]
    val q = m.attach(mem.toDF().toDF("doc_id", "text"))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val finalCorpus = (v0.toMap ++ b1.toMap ++ b2.toMap).toSeq
      .toDF("doc_id", "text")
    val rebuilt = TextAnalysis.buildSearchIndex(finalCorpus, "doc_id", "text",
      nShards = 2)
    // the maintained index TABLES are bit-identical to the rebuild
    // (not just the served top-k): same grouping keys, sorted postings
    assert(m.index.postings.collect().map(_.toSeq).toSet ==
      rebuilt.postings.collect().map(_.toSeq).toSet)
    assert(m.index.docmeta.collect().map(_.toSeq).toSet ==
      rebuilt.docmeta.collect().map(_.toSeq).toSet)
    val terms = Seq("data", "point")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(rows(TextAnalysis.searchTopK(m.index, terms, k = 4)) ==
      rows(TextAnalysis.searchTopK(rebuilt, terms, k = 4)))
  }

  test("streamed upserts+deletes with periodic compaction equal a rebuild of the surviving corpus") {
    import graft.operators.TextAnalysis
    val v0 = Seq((1L, "the data point one"), (2L, "the data two"),
      (3L, "point three data"), (4L, "four data point"))
    val m = new Streaming.SearchIndexMaintainer(
      v0.toDF("doc_id", "text"), "doc_id", "text", nShards = 2,
      compactEvery = 2, deleteCol = Some("del"), maintainPositions = true)
    def batch(rows: Seq[(Long, String, Boolean)]): Unit =
      m.applyBatch(rows.toDF("doc_id", "text", "del"))
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect().map(_.toSeq).toSeq
    // b1: edit 2, delete 3 -> one pending segment, NO compaction
    batch(Seq((2L, "the data two edited point", false), (3L, null, true)))
    assert(m.segmentCount == 1 && m.compactionCount == 0L)
    // b2: add 5 with NULL text (presence-based add — fingerprint
    // equality alone would see fp <=> fp_prev, both NULL, and drop it
    // from docmeta, drifting the corpus stats), edit 1 -> 2nd segment
    // triggers the periodic compaction
    batch(Seq((5L, null, false), (1L, "the one rewritten data", false)))
    assert(m.segmentCount == 0 && m.compactionCount == 1L)
    val midRebuilt = TextAnalysis.buildSearchIndex(
      Seq[(Long, String)]((1L, "the one rewritten data"),
        (2L, "the data two edited point"), (4L, "four data point"),
        (5L, null)).toDF("doc_id", "text"),
      "doc_id", "text", nShards = 2)
    assert(tbl(m.index.docmeta) == tbl(midRebuilt.docmeta),
      "NULL-text add must carry a dl=0 docmeta row")
    assert(tbl(m.index.postings) == tbl(midRebuilt.postings))
    // b3: delete the NULL-text doc, re-add a deleted id, delete an
    // absent id (no-op)
    batch(Seq((5L, null, true), (3L, "point three returns data", false),
      (99L, null, true)))
    assert(m.segmentCount == 1 && m.compactionCount == 1L)
    val rebuilt = TextAnalysis.buildSearchIndex(
      Seq((1L, "the one rewritten data"), (2L, "the data two edited point"),
        (3L, "point three returns data"), (4L, "four data point"))
        .toDF("doc_id", "text"),
      "doc_id", "text", nShards = 2)
    val terms = Seq("data", "point")
    // the multi-segment serve path answers without compaction work
    assert(rows(m.topK(terms, k = 4)) ==
      rows(TextAnalysis.searchTopK(rebuilt, terms, k = 4)))
    assert(m.segmentCount == 1, "topK must not trigger compaction")
    // inclusion/exclusion selection serves from the same segments
    def frows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(frows(m.termFilter(Seq("data"), Seq("point"))) ==
      frows(TextAnalysis.termFilter(rebuilt, Seq("data"), Seq("point"))))
    assert(m.segmentCount == 1, "termFilter must not trigger compaction")
    // the co-maintained positional levels serve phrase queries equal to
    // a positional rebuild — from the same uncompacted segments
    val posRebuilt = TextAnalysis.buildPositionalIndex(
      Seq((1L, "the one rewritten data"), (2L, "the data two edited point"),
        (3L, "point three returns data"), (4L, "four data point"))
        .toDF("doc_id", "text"),
      "doc_id", "text", nShards = 2)
    def prows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(prows(m.phrase(Seq("data", "point"))) ==
      prows(TextAnalysis.phraseSearch(posRebuilt, Seq("data", "point"))))
    // ...and proximity from the same uncompacted segments (both forms)
    for (ordered <- Seq(false, true))
      assert(prows(m.proximity(Seq("the", "point"), Seq("data"),
          maxGap = 2L, ordered)) ==
        prows(TextAnalysis.proximitySearch(posRebuilt, Seq("the", "point"),
          Seq("data"), maxGap = 2L, ordered)),
        s"streamed proximity (ordered=$ordered) != rebuild")
    assert(m.segmentCount == 1, "proximity must not trigger compaction")
    // wildcard selection serves from the same segments ("dat*" spans
    // base docs and both pending-edited docs)
    assert(frows(m.prefix("dat")) ==
      frows(TextAnalysis.prefixSearch(rebuilt, "dat")))
    assert(m.segmentCount == 1, "prefix must not trigger compaction")
    // the single-index accessor folds the pending segments of BOTH
    // artifacts: bit-identical tables
    val idx = m.index
    assert(m.compactionCount == 2L && m.segmentCount == 0)
    assert(tbl(idx.postings) == tbl(rebuilt.postings))
    assert(tbl(idx.docmeta) == tbl(rebuilt.docmeta))
    assert(tbl(m.positionalIndex) == tbl(posRebuilt))
  }

  test("maintainer checkpoint/restore resumes mid-stream without the corpus") {
    import graft.operators.TextAnalysis
    val v0 = Seq((1L, "the data point one"), (2L, "the data two"),
      (3L, "point three data"), (4L, "four data point"))
    def mk() = new Streaming.SearchIndexMaintainer(
      v0.toDF("doc_id", "text"), "doc_id", "text", nShards = 2,
      compactEvery = 3, deleteCol = Some("del"), maintainPositions = true)
    val live = mk()
    def batch(m: Streaming.SearchIndexMaintainer,
              rows: Seq[(Long, String, Boolean)]): Unit =
      m.applyBatch(rows.toDF("doc_id", "text", "del"))
    val b1 = Seq((2L, "the data two edited point", false), (3L, null, true))
    val b2 = Seq((5L, "five fresh data point", false),
      (1L, "the one rewritten data", false))
    // live maintainer sees b1, checkpoints WITH a pending segment, then b2
    batch(live, b1)
    assert(live.segmentCount == 1, "checkpoint must capture pending state")
    val dir = java.nio.file.Files.createTempDirectory("maintckpt").toString
    live.checkpoint(dir)
    batch(live, b2)
    // restored maintainer resumes from disk alone and sees the same b2
    val restored = Streaming.SearchIndexMaintainer.restore(spark, dir,
      nShards = 2, compactEvery = 3, deleteCol = Some("del"))
    assert(restored.segmentCount == 1 && restored.compactionCount == 0L)
    batch(restored, b2)
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect().map(_.toSeq).toSeq
    // serves agree with the live run BEFORE any compaction...
    assert(rows(restored.topK(Seq("data", "point"), k = 5)) ==
      rows(live.topK(Seq("data", "point"), k = 5)))
    def prows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(prows(restored.phrase(Seq("data", "point"))) ==
      prows(live.phrase(Seq("data", "point"))))
    assert(prows(restored.proximity(Seq("the"), Seq("data"), maxGap = 3L)) ==
      prows(live.proximity(Seq("the"), Seq("data"), maxGap = 3L)))
    // ...and the fully-compacted artifacts are bit-identical to a rebuild
    // of the surviving corpus. The third batch is an unchanged re-send:
    // it must trigger the every-3rd-batch compaction on cadence, and if
    // the fingerprint table had NOT survived the round trip it would be
    // classified `added`, duplicate doc 5's postings, and break the
    // bit-identity below
    batch(restored, Seq((5L, "five fresh data point", false)))
    assert(restored.segmentCount == 0 && restored.compactionCount == 1L,
      "compaction cadence drifted after restore")
    val rebuilt = TextAnalysis.buildSearchIndex(
      Seq((1L, "the one rewritten data"), (2L, "the data two edited point"),
        (4L, "four data point"), (5L, "five fresh data point"))
        .toDF("doc_id", "text"),
      "doc_id", "text", nShards = 2)
    assert(tbl(restored.index.postings) == tbl(rebuilt.postings))
    assert(tbl(restored.index.docmeta) == tbl(rebuilt.docmeta))
  }
  test("similarity maintainer keeps the PPJoin pair set live to batch parity") {
    import graft.operators.Dedup
    def prs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v0 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "unrelated words entirely different here"),
      (4L, "alpha beta gamma delta epsilon"))
    val m = new Streaming.SimilarityMaintainer(v0.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5, shingleN = 2,
      deleteCol = Some("del"))
    var corpus: Map[Long, String] = v0.toMap
    def expect() = prs(Dedup.ppJoin(corpus.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5, shingleN = 2))
    assert(prs(m.pairs) == expect(), "initial pair set != batch ppJoin")
    def batch(rows: Seq[(Long, String, Boolean)], label: String): Unit = {
      m.applyBatch(rows.toDF("doc_id", "text", "del"))
      rows.foreach { case (id, txt, del) =>
        if (del) corpus -= id else corpus += id -> txt }
      assert(prs(m.pairs) == expect(),
        s"streamed pairs != batch ppJoin of the surviving corpus after $label")
    }
    // edit toward the cluster + delete an unrelated doc
    batch(Seq((2L, "alpha beta gamma delta epsilon", false), (3L, null, true)),
      "edit+delete")
    // add a partial overlap + edit a cluster member AWAY (its old pairs
    // must die with it)
    batch(Seq((5L, "alpha beta gamma other words", false),
      (4L, "now completely changed text", false)), "add+edit-away")
    // unchanged re-send (no-op: survivors keep their carried jaccard)
    // + delete of an absent id (no-op)
    batch(Seq((2L, "alpha beta gamma delta epsilon", false),
      (99L, null, true)), "no-op batch")
    // delete a cluster member + re-add an id that matches the cluster
    batch(Seq((1L, null, true),
      (6L, "alpha beta gamma delta zeta", false)), "delete+re-add")
    // seeded random history: the invariant must hold on arbitrary
    // upsert/delete interleavings, not just the scripted edges
    val rnd = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    (1 to 3).foreach { i =>
      val rows = (1 to 4).map { _ =>
        val id = 1L + rnd.nextInt(10)
        if (rnd.nextInt(4) == 0) (id, null: String, true)
        else (id, Seq.fill(5)(words(rnd.nextInt(words.size))).mkString(" "),
          false)
      }.groupBy(_._1).map(_._2.head).toSeq // ids unique within a batch
      batch(rows, s"random batch $i")
    }
  }

  test("similarity maintainer checkpoint/restore resumes without the corpus") {
    import graft.operators.Dedup
    def prs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v0 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "unrelated words entirely different here"))
    val live = new Streaming.SimilarityMaintainer(v0.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5, shingleN = 2,
      deleteCol = Some("del"))
    def batch(mm: Streaming.SimilarityMaintainer,
              rows: Seq[(Long, String, Boolean)]): Unit =
      mm.applyBatch(rows.toDF("doc_id", "text", "del"))
    val b1 = Seq((4L, "alpha beta gamma delta epsilon", false),
      (3L, null, true))
    val b2 = Seq((2L, "now entirely rewritten words", false),
      (5L, "alpha beta gamma delta other", false))
    batch(live, b1)
    val dir = java.nio.file.Files.createTempDirectory("simckpt").toString
    live.checkpoint(dir)
    batch(live, b2)
    // the restored maintainer resumes from disk alone — no corpus text
    // anywhere — and must track the live one through the same b2
    val restored = Streaming.SimilarityMaintainer.restore(spark, dir,
      threshold = 0.5, shingleN = 2, deleteCol = Some("del"))
    batch(restored, b2)
    assert(prs(restored.pairs) == prs(live.pairs),
      "restored pair set diverged from the live maintainer")
    val surviving = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "now entirely rewritten words"),
      (4L, "alpha beta gamma delta epsilon"),
      (5L, "alpha beta gamma delta other"))
    assert(prs(restored.pairs) == prs(Dedup.ppJoin(
      surviving.toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, shingleN = 2)),
      "restored pair set != batch ppJoin of the surviving corpus")
  }

  test("streaming k-anonymity classes serve the exact capped batch " +
    "readout, with bounded state under saturation and NULL sensitive " +
    "counted in n but never l") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(236)
    val lCap = 3
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(String, Option[Long])]
    val mem = MemoryStream[(String, Option[Long])]
    val q = Streaming.streamingKAnonymityClasses(
        mem.toDF().toDF("cls", "s"), lCap)
      .writeStream.format("memory").queryName("kanon")
      .outputMode("append").start()
    try {
      (1 to 3).foreach { b =>
        val rows = Seq.fill(120) {
          val cls = s"c${rnd.nextInt(5)}"
          // class c4 floods with distinct values (saturation); c3 sends
          // NULL sensitive rows; others draw from a small pool
          val s: Option[Long] =
            if (cls == "c4") Some(rnd.nextLong())
            else if (cls == "c3" && rnd.nextBoolean()) None
            else Some(rnd.nextInt(3).toLong)
          (cls, s)
        }
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        val streamed = spark.table("kanon").collect().zipWithIndex
          .groupBy(_._1.getString(0))
          .map { case (c, rs) =>
            val r = rs.maxBy(_._2)._1
            c -> ((r.getLong(1), r.getLong(2)))
          }
        val batch = hist.groupBy(_._1).map { case (c, g) =>
          c -> ((g.size.toLong,
            math.min(g.flatMap(_._2).distinct.size, lCap + 1).toLong))
        }
        assert(streamed == batch, s"streamed != capped batch after $b")
        // saturation: the flooded class reports exactly lCap+1
        assert(streamed("c4")._2 == lCap + 1L)
      }
    } finally q.stop()
  }

  test("assoc maintainer keeps the pair-rule readout live to batch " +
    "parity, rejects re-sent baskets, and checkpoint/restores") {
    import graft.operators.Assoc
    def rls(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(1), r.getString(0),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7))).toSet
    val rnd = new scala.util.Random(214)
    val catalog = Vector("milk", "bread", "eggs", "beer", "chips",
      "salsa", "tea")
    def mkBaskets(ids: Range): Seq[(Long, String)] = ids.flatMap { b =>
      val n = 2 + rnd.nextInt(4)
      rnd.shuffle(catalog).take(n).map(i => (b.toLong, i))
    }
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val v0 = mkBaskets(1 to 12)
    hist ++= v0
    val m = new Streaming.AssocMaintainer(v0.toDF("basket", "item"),
      "basket", "item")
    def expect(minSupport: Long) = rls(Assoc.pairRules(
      hist.toSeq.toDF("basket", "item"), "basket", "item", minSupport))
    assert(rls(m.rules(2L)) == expect(2L), "initial rules != batch")
    // fold two append-only batches; parity at every moment, at BOTH a
    // tight and a loose threshold (the state stays unfiltered, so a
    // pair crossing minSupport only with a later batch must appear)
    Seq(13 to 20, 21 to 30).zipWithIndex.foreach { case (ids, i) =>
      val b = mkBaskets(ids)
      hist ++= b
      m.applyBatch(b.toDF("basket", "item"))
      assert(rls(m.rules(2L)) == expect(2L), s"rules(2) after batch $i")
      assert(rls(m.rules(5L)) == expect(5L), s"rules(5) after batch $i")
    }
    // append-only is CHECKED: re-sending a folded basket id fails
    // loudly instead of double-counting its supports
    val e = intercept[IllegalArgumentException] {
      m.applyBatch(Seq((5L, "milk"), (31L, "tea")).toDF("basket", "item"))
    }
    assert(e.getMessage.contains("AssocMaintainer"))
    assert(rls(m.rules(2L)) == expect(2L), "rejected batch mutated state")
    // checkpoint, fold one more batch into live AND restored: the
    // restored maintainer resumes from the support tables alone (no
    // basket rows on disk) and must track the live one exactly
    val dir = java.nio.file.Files.createTempDirectory("assocckpt").toString
    m.checkpoint(dir)
    val restored = Streaming.AssocMaintainer.restore(spark, dir,
      "basket", "item")
    val b3 = mkBaskets(31 to 38)
    hist ++= b3
    m.applyBatch(b3.toDF("basket", "item"))
    restored.applyBatch(b3.toDF("basket", "item"))
    assert(rls(restored.rules(2L)) == rls(m.rules(2L)),
      "restored maintainer diverged from the live one")
    assert(rls(restored.rules(2L)) == expect(2L),
      "restored rules != batch pairRules of the accumulated corpus")
  }

  test("psi maintainer keeps the drift readout live to batch parity, " +
    "rejects NULL categories, and checkpoint/restores") {
    import graft.operators.Stats
    def ps(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val rnd = new scala.util.Random(244)
    def mkRows(n: Int, skew: Int): Seq[(Long, String)] =
      Seq.fill(n)((rnd.nextInt(3).toLong, s"c${rnd.nextInt(skew)}"))
    val baseline = mkRows(200, 4)
    val m = new Streaming.PsiMaintainer(baseline.toDF("k", "cat"),
      "k", "cat")
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def expect() = ps(Stats.psiByKey(baseline.toDF("k", "cat"),
      hist.toSeq.toDF("k", "cat"), "k", "cat"))
    // parity at every moment, including after the mix shifts (skew 6
    // introduces brand-new categories the baseline never saw)
    Seq(4, 4, 6).zipWithIndex.foreach { case (skew, i) =>
      val b = mkRows(80, skew)
      hist ++= b
      m.applyBatch(b.toDF("k", "cat"))
      assert(ps(m.psi()) == expect(), s"psi after batch $i")
    }
    // NULL category fails loudly BEFORE touching state
    val e = intercept[Throwable] {
      m.applyBatch(Seq((1L, Option.empty[String]), (2L, Some("c1")))
        .toDF("k", "cat"))
    }
    assert(Option(e.getMessage).getOrElse("").contains("PsiMaintainer"))
    assert(ps(m.psi()) == expect(), "rejected batch mutated state")
    // checkpoint, fold one more batch into live AND restored: the
    // restored monitor resumes from the two histograms alone
    val dir = java.nio.file.Files.createTempDirectory("psickpt").toString
    m.checkpoint(dir)
    val restored = Streaming.PsiMaintainer.restore(spark, dir, "k", "cat")
    val b3 = mkRows(60, 5)
    hist ++= b3
    m.applyBatch(b3.toDF("k", "cat"))
    restored.applyBatch(b3.toDF("k", "cat"))
    assert(ps(restored.psi()) == ps(m.psi()),
      "restored monitor diverged from the live one")
    assert(ps(restored.psi()) == expect(),
      "restored psi != batch psiByKey of the accumulated rows")
  }

  test("pr-curve maintainer serves batch parity live, rejects NULL " +
    "labels, and checkpoint/restores") {
    import graft.operators.Stats
    def pc(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSet
    val rnd = new scala.util.Random(271)
    def mkRows(n: Int): Seq[(Long, Long, Boolean)] =
      Seq.fill(n)((rnd.nextInt(3).toLong, rnd.nextInt(15).toLong,
        rnd.nextBoolean()))
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    val m = new Streaming.PrCurveMaintainer(
      hist.toSeq.toDF("k", "s", "y"), "k", "s", "y")
    def expect() = pc(Stats.prCurve(hist.toSeq.toDF("k", "s", "y"),
      "k", "s", "y"))
    (1 to 3).foreach { i =>
      val b = mkRows(70)
      hist ++= b
      m.applyBatch(b.toDF("k", "s", "y"))
      assert(pc(m.curve()) == expect(), s"curve after batch $i")
    }
    // NULL label fails loudly BEFORE touching state
    val e = intercept[Throwable] {
      m.applyBatch(Seq((1L, Some(2L), Option.empty[Boolean]),
        (1L, Some(3L), Some(true))).toDF("k", "s", "y"))
    }
    assert(Option(e.getMessage).getOrElse("").contains("PrCurveMaintainer"))
    assert(pc(m.curve()) == expect(), "rejected batch mutated state")
    // checkpoint/restore, then both monitors fold one more batch
    val dir = java.nio.file.Files.createTempDirectory("prckpt").toString
    m.checkpoint(dir)
    val restored = Streaming.PrCurveMaintainer.restore(spark, dir,
      "k", "s", "y")
    val b4 = mkRows(50)
    hist ++= b4
    m.applyBatch(b4.toDF("k", "s", "y"))
    restored.applyBatch(b4.toDF("k", "s", "y"))
    assert(pc(restored.curve()) == pc(m.curve()),
      "restored monitor diverged from the live one")
    assert(pc(restored.curve()) == expect(),
      "restored curve != batch prCurve of the accumulated rows")
  }

  test("fairness maintainer serves batch parity live, rejects " +
    "non-binary labels, and checkpoint/restores") {
    import graft.operators.Stats
    def fa(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        def g(i: Int) = if (r.isNullAt(i)) Long.MinValue else r.getLong(i)
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), g(6), g(7), g(8), g(9), g(10),
          g(11))
      }.toSet
    val rnd = new scala.util.Random(272)
    def mkRows(n: Int): Seq[(String, Long, Long)] =
      Seq.fill(n)((s"g${rnd.nextInt(3)}", rnd.nextInt(2).toLong,
        rnd.nextInt(2).toLong))
    val hist = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val m = new Streaming.FairnessMaintainer(
      hist.toSeq.toDF("g", "label", "pred"), "g", "label", "pred")
    def expect() = fa(Stats.fairnessAudit(
      hist.toSeq.toDF("g", "label", "pred"), "g", "label", "pred"))
    (1 to 3).foreach { i =>
      val b = mkRows(80)
      hist ++= b
      m.applyBatch(b.toDF("g", "label", "pred"))
      assert(fa(m.audit()) == expect(), s"audit after batch $i")
    }
    // non-binary label fails loudly BEFORE touching state
    val e = intercept[Throwable] {
      m.applyBatch(Seq(("g1", 2L, 0L)).toDF("g", "label", "pred"))
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("FairnessMaintainer"))
    assert(fa(m.audit()) == expect(), "rejected batch mutated state")
    val dir = java.nio.file.Files.createTempDirectory("fairckpt").toString
    m.checkpoint(dir)
    val restored = Streaming.FairnessMaintainer.restore(spark, dir,
      "g", "label", "pred")
    val b4 = mkRows(60)
    hist ++= b4
    m.applyBatch(b4.toDF("g", "label", "pred"))
    restored.applyBatch(b4.toDF("g", "label", "pred"))
    assert(fa(restored.audit()) == fa(m.audit()),
      "restored monitor diverged from the live one")
    assert(fa(restored.audit()) == expect(),
      "restored audit != batch fairnessAudit of the accumulated rows")
  }

  test("sentence-dedup maintainer serves batch dedup parity live " +
    "(dedup against history), and checkpoint/restores") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(613)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    var nextId = 0L
    def mkDocs(n: Int): Seq[(Long, Seq[String])] = (1 to n).map { _ =>
      nextId += 1L
      val sents = (0 to rnd.nextInt(3)).map(_ =>
        Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ") + ".")
      (nextId, sents)
    }
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[String])]
    val m = new Streaming.SentenceDedupMaintainer(
      hist.toSeq.toDF("id", "sents"), "id", "sents")
    def served(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    def expect() = served(TextAnalysis.dedupLines(
        hist.toSeq.toDF("id", "sents"), "id", "sents")
      .where(col("n_kept") > 0L))
    (1 to 3).foreach { i =>
      val b = mkDocs(12)
      hist ++= b
      m.applyBatch(b.toDF("id", "sents"))
      assert(served(m.audit()) == expect(), s"audit after batch $i")
    }
    val dir = java.nio.file.Files
      .createTempDirectory("sentdedupckpt").toString
    m.checkpoint(dir)
    val restored = Streaming.SentenceDedupMaintainer.restore(spark,
      dir, "id", "sents")
    val b4 = mkDocs(10)
    hist ++= b4
    m.applyBatch(b4.toDF("id", "sents"))
    restored.applyBatch(b4.toDF("id", "sents"))
    assert(served(restored.audit()) == served(m.audit()),
      "restored monitor diverged from the live one")
    assert(served(restored.audit()) == expect(),
      "restored audit != batch dedupLines of the accumulated docs")
    // state-bound contract fires at serve time
    val tiny = new Streaming.SentenceDedupMaintainer(
      hist.toSeq.toDF("id", "sents"), "id", "sents", maxDistinct = 2L)
    val e = intercept[IllegalArgumentException] { tiny.audit() }
    assert(e.getMessage.contains("SentenceDedupMaintainer"))
  }

  test("sprt maintainer serves batch decisions live, flips to accept " +
    "as evidence accumulates, checkpoint/restores") {
    import graft.operators.Stats
    def dd(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6))).toMap
    val p0 = (45L, 100L); val p1 = (55L, 100L)
    val hist = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val m = new Streaming.SprtMaintainer(
      hist.toSeq.toDF("k", "x"), "k", "x", p0, p1)
    def expect() = dd(Stats.sprtBernoulli(hist.toSeq.toDF("k", "x"),
      "k", "x", p0, p1))
    // "hot" accumulates all-successes: must continue, then accept_h1
    (1 to 3).foreach { i =>
      val b = Seq.fill(40)(("hot", 1L)) ++
        Seq.tabulate(30)(j => ("mixed", (j % 2).toLong))
      hist ++= b
      m.applyBatch(b.toDF("k", "x"))
      assert(dd(m.decisions()) == expect(), s"decisions after batch $i")
    }
    assert(dd(m.decisions())("hot")._4 == "accept_h1")
    assert(dd(m.decisions())("mixed")._4 == "continue")
    val e = intercept[Throwable] {
      m.applyBatch(Seq(("hot", 7L)).toDF("k", "x"))
    }
    assert(Option(e.getMessage).getOrElse("").contains("SprtMaintainer"))
    assert(dd(m.decisions()) == expect(), "rejected batch mutated state")
    val dir = java.nio.file.Files.createTempDirectory("sprtckpt").toString
    m.checkpoint(dir)
    val restored = Streaming.SprtMaintainer.restore(spark, dir,
      "k", "x", p0, p1)
    val b4 = Seq.fill(25)(("mixed", 0L))
    hist ++= b4
    m.applyBatch(b4.toDF("k", "x"))
    restored.applyBatch(b4.toDF("k", "x"))
    assert(dd(restored.decisions()) == dd(m.decisions()) &&
      dd(restored.decisions()) == expect(),
      "restored monitor diverged")
  }

  test("mutual-info maintainer serves batch parity live, rejects NULL " +
    "categories, checkpoint/restores") {
    import graft.operators.Stats
    def mm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    val rnd = new scala.util.Random(273)
    def mkRows(n: Int): Seq[(Long, String, String)] =
      Seq.fill(n)((rnd.nextInt(2).toLong, s"x${rnd.nextInt(4)}",
        s"y${rnd.nextInt(3)}"))
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val m = new Streaming.MutualInfoMaintainer(
      hist.toSeq.toDF("k", "x", "y"), "k", "x", "y")
    def expect() = mm(Stats.mutualInfoByKey(
      hist.toSeq.toDF("k", "x", "y"), "k", "x", "y"))
    (1 to 3).foreach { i =>
      val b = mkRows(90)
      hist ++= b
      m.applyBatch(b.toDF("k", "x", "y"))
      assert(mm(m.mi()) == expect(), s"mi after batch $i")
    }
    val e = intercept[Throwable] {
      m.applyBatch(Seq((1L, Option.empty[String], Some("y1")),
        (1L, Some("x1"), Some("y1"))).toDF("k", "x", "y"))
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("MutualInfoMaintainer"))
    assert(mm(m.mi()) == expect(), "rejected batch mutated state")
    val dir = java.nio.file.Files.createTempDirectory("mickpt").toString
    m.checkpoint(dir)
    val restored = Streaming.MutualInfoMaintainer.restore(spark, dir,
      "k", "x", "y")
    val b4 = mkRows(70)
    hist ++= b4
    m.applyBatch(b4.toDF("k", "x", "y"))
    restored.applyBatch(b4.toDF("k", "x", "y"))
    assert(mm(restored.mi()) == mm(m.mi()) &&
      mm(restored.mi()) == expect(), "restored monitor diverged")
  }

  test("noisy-counts maintainer re-releases the batch release live, " +
    "same noise draw per key, NULL keys rejected, checkpoint/restores") {
    import graft.operators.Stats
    def rel(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val eps = 250000L
    val hist = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new Streaming.NoisyCountsMaintainer(
      hist.toSeq.toDF("src"), Seq("src"), eps)
    def expect() = rel(Stats.noisyCounts(hist.toSeq.toDF("src"),
      Seq("src"), eps))
    val rnd = new scala.util.Random(77)
    var firstNoise = Map.empty[String, Long]
    (1 to 3).foreach { i =>
      val b = Seq.fill(50)(s"s${rnd.nextInt(4)}")
      hist ++= b
      m.applyBatch(b.toDF("src"))
      val live = rel(m.release())
      assert(live == expect(), s"release after batch $i")
      // the noise draw per key never re-randomizes as counts grow
      if (firstNoise.isEmpty) firstNoise = live.map { case (k, v) =>
        k -> v._2 }
      else live.foreach { case (k, v) =>
        firstNoise.get(k).foreach(n0 => assert(v._2 == n0,
          s"noise re-randomized for $k"))
      }
    }
    val e = intercept[Throwable] {
      m.applyBatch(Seq(Option.empty[String], Some("s1")).toDF("src"))
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("NoisyCountsMaintainer"))
    assert(rel(m.release()) == expect(), "rejected batch mutated state")
    val dir = java.nio.file.Files.createTempDirectory("dpckpt").toString
    m.checkpoint(dir)
    val restored = Streaming.NoisyCountsMaintainer.restore(spark, dir,
      Seq("src"), eps)
    val b4 = Seq.fill(30)(s"s${rnd.nextInt(5)}")
    hist ++= b4
    m.applyBatch(b4.toDF("src"))
    restored.applyBatch(b4.toDF("src"))
    assert(rel(restored.release()) == rel(m.release()))
    assert(rel(restored.release()) == expect())
  }

  test("streaming LOCF emits the batch grid prefix below each key's last obs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = Streaming.streamingLocf(mem.toDF().toDF("k", "ts", "v"),
        stepNs = 10L)
      .writeStream.format("memory").queryName("locf").outputMode("append")
      .start()
    try {
      // key 1: obs at 3 (v=5), 27 (v=8) -> grids 10, 20 carry 5
      // key 2: obs at 12 (v=1) -> nothing emitted yet
      mem.addData((1L, 3L, 5L), (1L, 27L, 8L), (2L, 12L, 1L))
      q.processAllAvailable()
      // next batch: key 1 obs at 41 -> grids 30, 40 carry 8;
      // key 2 obs at 40 -> grids 20, 30 carry 1 (obs AT 40 claims 40
      // itself only once a later obs arrives)
      mem.addData((1L, 41L, 9L), (2L, 40L, 2L))
      q.processAllAvailable()
      val out = spark.table("locf").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set(
        (1L, 10L, 5L), (1L, 20L, 5L), (1L, 30L, 8L), (1L, 40L, 8L),
        (2L, 20L, 1L), (2L, 30L, 1L)))
      // parity: the emitted set equals the batch per-key LOCF fill
      // restricted to grid points strictly below each key's last obs
      val all = Seq((1L, 3L, 5L), (1L, 27L, 8L), (1L, 41L, 9L),
        (2L, 12L, 1L), (2L, 40L, 2L))
      val lastTs = all.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val batch = graft.operators.AsOf.gridResample(
          all.toDF("k", "ts", "v"), "k", "ts", stepNs = 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(r => r._2 < lastTs(r._1)).toSet
      assert(out == batch)
    } finally q.stop()
  }
  test("streaming EWMA equals the batch kernel over the history") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = Streaming.streamingEwma(mem.toDF().toDF("k", "ts", "x"),
        shift = 3)
      .writeStream.format("memory").queryName("ew").outputMode("append")
      .start()
    try {
      // state must carry the baseline across the batch boundary, and
      // the negative deviation must FLOOR (baseline moves down)
      mem.addData((1L, 1L, 100L), (1L, 2L, 0L), (2L, 1L, 0L))
      q.processAllAvailable()
      mem.addData((1L, 3L, 0L), (2L, 2L, -1L))
      q.processAllAvailable()
      val out = spark.table("ew").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val batchOf = Map(1L -> Seq(100L, 0L, 0L), 2L -> Seq(0L, -1L))
      val batch = batchOf.toSeq.map { case (k, xs) => (k, xs) }
        .toDF("k", "xs")
        .select(col("k"),
          posexplode(graft.functions.ewma_shift(col("xs"), 3)))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1) + 1L, r.getLong(2))).toSet
      assert(out == batch,
        "streamed EWMA baselines != batch kernel over the same history")
    } finally q.stop()
  }

  test("streaming CUSUM equals the batch kernel over the history, " +
    "alarms and resets crossing batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = Streaming.streamingCusum(mem.toDF().toDF("k", "ts", "x"),
        ref = 10L, h = 25L)
      .writeStream.format("memory").queryName("cs").outputMode("append")
      .start()
    try {
      // key 1 drifts to an alarm ACROSS the batch boundary (state must
      // carry the accumulator); key 2 stays quiet
      mem.addData((1L, 1L, 20L), (1L, 2L, 18L), (2L, 1L, 5L))
      q.processAllAvailable()
      mem.addData((1L, 3L, 22L), (1L, 4L, 20L), (2L, 2L, 8L))
      q.processAllAvailable()
      val out = spark.table("cs").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(3), r.getBoolean(4))).toMap
      val batch = graft.operators.Stats.cusumAlarms(
          Seq((1L, 1L, 20L), (1L, 2L, 18L), (1L, 3L, 22L), (1L, 4L, 20L),
            (2L, 1L, 5L), (2L, 2L, 8L)).toDF("k", "o", "v"),
          "k", Seq("o"), "v", ref = 10L, h = 25L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(3), r.getBoolean(4))).toMap
      // batch rn is 1-based position == our ts here by construction
      assert(out == batch, "streamed CUSUM != batch kernel")
      // the drift key alarmed at least once and then RESET (a later s
      // value must be below the running total a no-reset fold implies)
      assert(out.exists { case ((k, _), (_, a)) => k == 1L && a })
    } finally q.stop()
  }

  test("live drift monitoring: rq_ks over two streamed sketches equals " +
    "the batch sketch KS at every moment") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(81)
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[(Long, Long)]
    val q = Streaming.streamingRqSketch(mem.toDF().toDF("k", "v"),
        budget = 64)
      .writeStream.format("memory").queryName("drift").outputMode("append")
      .start()
    try {
      (1 to 3).foreach { b =>
        // side 0 stationary, side 1 drifts upward batch by batch
        val rows = Seq.fill(300)(if (rnd.nextBoolean())
          (0L, rnd.nextInt(10000).toLong)
        else (1L, b * 2000L + rnd.nextInt(10000).toLong))
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        val latest = spark.table("drift").collect().zipWithIndex
          .groupBy(_._1.getLong(0))
          .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getAs[Array[Byte]](1) }
        val served = Seq((latest(0L), latest(1L)))
          .toDF("a", "b")
          .select(graft.functions.rq_ks(col("a"), col("b")).getField("d"))
          .head().getDouble(0)
        val batch = hist.toSeq.toDF("k", "v")
          .groupBy()
          .agg(graft.functions.rq_sketch(when(col("k") === 0L, col("v")), 64)
              .as("a"),
            graft.functions.rq_sketch(when(col("k") === 1L, col("v")), 64)
              .as("b"))
          .select(graft.functions.rq_ks(col("a"), col("b")).getField("d"))
          .head().getDouble(0)
        assert(served == batch,
          s"live rq_ks != batch sketch KS after batch $b")
      }
    } finally q.stop()
  }

  test("streaming golden records equal the batch survivorship merge " +
    "after every batch") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(212)
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Option[String], Option[Long])]
    var nextId = 0L
    val mem = MemoryStream[(Long, Long, Long, Option[String], Option[Long])]
    val q = Streaming.streamingGoldenRecords(
        mem.toDF().toDF("k", "ts", "id", "a_s", "a_l"))
      .writeStream.format("memory").queryName("golden")
      .outputMode("append").start()
    try {
      (1 to 3).foreach { b =>
        val rows = Seq.fill(120) {
          nextId += 1L
          (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, nextId,
            if (rnd.nextInt(3) == 0) None else Some(s"s${rnd.nextInt(7)}"),
            if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(900).toLong))
        }
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        val latest = spark.table("golden").collect().zipWithIndex
          .groupBy(_._1.getLong(0))
          .map { case (_, rs) => rs.maxBy(_._2)._1 }
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
            Option(r.getString(3)), if (r.isNullAt(4)) None
            else Some(r.getLong(4)))).toMap
        val batch = graft.operators.Snapshot.goldenRecords(
            hist.toSeq.toDF("k", "ts", "id", "a_s", "a_l"),
            "k", "id", Seq("ts", "id"), Seq("a_s", "a_l"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
            Option(r.getString(3)), if (r.isNullAt(4)) None
            else Some(r.getLong(4)))).toMap
        assert(latest == batch, s"streamed != batch golden after $b")
      }
    } finally q.stop()
  }

  test("streaming last-touch credits equal the batch attribution " +
    "rollup after every time-ordered batch") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(227)
    val tol = 40L
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String, Option[String], Option[Long])]
    val mem = MemoryStream[(Long, Long, String, Option[String], Option[Long])]
    val q = Streaming.streamingLastTouch(
        mem.toDF().toDF("k", "ts", "kind", "channel", "v"), tol)
      .writeStream.format("memory").queryName("touchq")
      .outputMode("append").start()
    try {
      var ts = 0L
      (1 to 3).foreach { b =>
        val rows = Seq.fill(150) {
          ts += rnd.nextInt(5).toLong // nondecreasing event time
          if (rnd.nextInt(3) == 0)
            (rnd.nextInt(4).toLong, ts, "conv", None,
              Some(1L + rnd.nextInt(50).toLong))
          else
            (rnd.nextInt(4).toLong, ts, "touch",
              Some(if (rnd.nextBoolean()) "ads" else "organic"), None)
        }
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        val streamed = spark.table("touchq").collect()
          .map(r => r.getString(3) -> r.getLong(2))
          .groupBy(_._1).view
          .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
        val batch = graft.operators.AsOf.lastTouchAttribution(
            hist.filter(_._3 == "conv").toSeq
              .map(r => (r._1, r._2, r._5.get)).toDF("k", "ts", "v"),
            hist.filter(_._3 == "touch").toSeq
              .map(r => (r._1, r._2, r._4.get)).toDF("k", "ts", "ch"),
            "k", "ts", "v", "ch", tol)
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(streamed == batch, s"streamed != batch credits after $b")
      }
    } finally q.stop()
  }

  test("streaming rolling slope equals the batch trailing-window fit " +
    "bit-for-bit across batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(231)
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    var o = 0L
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = Streaming.streamingRollingSlope(
        mem.toDF().toDF("k", "o", "id", "y"), window = 6)
      .writeStream.format("memory").queryName("rslope")
      .outputMode("append").start()
    try {
      (1 to 3).foreach { b =>
        val rows = Seq.fill(90) {
          o += 1L + rnd.nextInt(3)
          (rnd.nextInt(4).toLong, o, o * 10L, rnd.nextInt(800).toLong)
        }
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        val streamed = spark.table("rslope").collect()
          .map(r => (r.getLong(0), r.getLong(2)) ->
            (r.getLong(3), r.getDouble(4))).toMap
        val batch = graft.operators.Stats.rollingOlsSlope(
            hist.toSeq.toDF("k", "o", "id", "y"), "k", "o", "id", "y", 6)
          .collect()
          .map(r => (r.getLong(0), r.getLong(2)) ->
            (r.getLong(3), r.getDouble(4))).toMap
        assert(streamed == batch, s"streamed != batch slopes after $b")
      }
    } finally q.stop()
  }

  test("streaming rolling slope CHECKS its per-value magnitude bound " +
    "instead of wrapping int64") {
    // rebased x keeps every magnitude bounded by window and value
    // scale; the w³·B ≤ 4e18 envelope is enforced per row — a value
    // past it (|y| > 4e18/w³) must fail the batch loudly
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = Streaming.streamingRollingSlope(
        mem.toDF().toDF("k", "o", "id", "y"), window = 8)
      .writeStream.format("memory").queryName("rslope_guard")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, 1L, 10000000000000000L)) // 1e16 > 4e18/512
      val e = intercept[Throwable] { q.processAllAvailable() }
      def msgs(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
          msgs(t.getCause)
      assert(msgs(e).contains("streamingRollingSlope"))
    } finally q.stop()
  }

  test("streaming Holt equals the batch level+trend smoothing " +
    "bit-for-bit across batches and checks its magnitude bound") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(249)
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    var o = 0L
    val mem = MemoryStream[(Long, Long, Long)]
    val q = Streaming.streamingHolt(mem.toDF().toDF("k", "o", "x"))
      .writeStream.format("memory").queryName("holt")
      .outputMode("append").start()
    try {
      (1 to 3).foreach { b =>
        val rows = Seq.fill(80) {
          o += 1L + rnd.nextInt(3)
          (rnd.nextInt(4).toLong, o, rnd.nextInt(5000).toLong - 2500L)
        }
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        val streamed = spark.table("holt").collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
        val batch = graft.operators.Stats.holtSmooth(
            hist.toSeq.toDF("k", "o", "x"), "k", "o", "x")
          .collect()
          .map(r => (r.getLong(0), r.getLong(2)) ->
            (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
        assert(streamed == batch, s"streamed != batch holt after $b")
      }
      mem.addData((1L, o + 1L, 2000000000000000L)) // 2e15 > 1e15
      val e = intercept[Throwable] { q.processAllAvailable() }
      def msgs(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
          msgs(t.getCause)
      assert(msgs(e).contains("streamingHolt"))
    } finally q.stop()
  }

  test("transition-entropy maintainer keeps the predictability " +
    "readout live to batch parity and checkpoint/restores") {
    import graft.operators.Stats
    def es(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toSet
    val rnd = new scala.util.Random(252)
    def mkRows(n: Int, states: Int): Seq[(Long, String, String)] =
      Seq.fill(n)((rnd.nextInt(2).toLong, s"s${rnd.nextInt(states)}",
        s"s${rnd.nextInt(states)}"))
    val hist = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String)]
    val v0 = mkRows(100, 3)
    hist ++= v0
    val m = new Streaming.TransitionEntropyMaintainer(
      v0.toDF("k", "src", "dst"), "k", "src", "dst")
    def expect() = es(Stats.transitionEntropy(
      hist.toSeq.toDF("k", "src", "dst"), "k", "src", "dst"))
    assert(es(m.entropy()) == expect(), "initial != batch")
    Seq(3, 5).zipWithIndex.foreach { case (states, i) =>
      val b = mkRows(80, states)
      hist ++= b
      m.applyBatch(b.toDF("k", "src", "dst"))
      assert(es(m.entropy()) == expect(), s"entropy after batch $i")
    }
    // NULL state fails loudly BEFORE touching state
    val e = intercept[Throwable] {
      m.applyBatch(Seq((1L, Some("a"), Option.empty[String]))
        .toDF("k", "src", "dst"))
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("TransitionEntropyMaintainer"))
    assert(es(m.entropy()) == expect(), "rejected batch mutated state")
    // checkpoint/restore: the restored monitor tracks the live one
    val dir = java.nio.file.Files.createTempDirectory("tentckpt").toString
    m.checkpoint(dir)
    val restored = Streaming.TransitionEntropyMaintainer.restore(
      spark, dir, "k", "src", "dst")
    val b3 = mkRows(60, 4)
    hist ++= b3
    m.applyBatch(b3.toDF("k", "src", "dst"))
    restored.applyBatch(b3.toDF("k", "src", "dst"))
    assert(es(restored.entropy()) == es(m.entropy()),
      "restored monitor diverged from the live one")
    assert(es(restored.entropy()) == expect(),
      "restored entropy != batch of the accumulated transitions")
  }

  test("streaming ESS monitor serves the exact batch weight " +
    "diagnostics at every moment and rejects negative weights") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(246)
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val mem = MemoryStream[(Long, Double)]
    val q = Streaming.streamingEss(mem.toDF().toDF("k", "w"))
      .writeStream.format("memory").queryName("ess")
      .outputMode("append").start()
    try {
      (1 to 3).foreach { b =>
        val rows = Seq.fill(70)((rnd.nextInt(3).toLong,
          rnd.nextInt(1000).toDouble / 50.0))
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        // append mode: keep each key's LATEST row (max n)
        val streamed = spark.table("ess").collect()
          .groupBy(_.getLong(0)).view.mapValues(rs =>
            rs.maxBy(_.getLong(1))).toMap
          .map { case (k, r) => k -> (r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4), r.getDouble(5)) }
        val batch = graft.operators.Stats.weightDiagnostics(
            hist.toSeq.toDF("k", "w"), "k", "w")
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
        assert(streamed == batch, s"streamed != batch ESS after $b")
      }
      mem.addData((1L, -2.0))
      val e = intercept[Throwable] { q.processAllAvailable() }
      def msgs(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + " " +
          msgs(t.getCause)
      assert(msgs(e).contains("streamingEss"))
    } finally q.stop()
  }

  test("streaming A/B cells serve the exact batch two-proportion z " +
    "readout at every moment") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(77)
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Boolean, Boolean)]
    val mem = MemoryStream[(Long, Boolean, Boolean)]
    val q = Streaming.streamingAbCells(mem.toDF().toDF("k", "side", "hit"))
      .writeStream.format("memory").queryName("ab").outputMode("append")
      .start()
    try {
      (1 to 3).foreach { _ =>
        val rows = Seq.fill(200)((rnd.nextInt(3).toLong,
          rnd.nextBoolean(), rnd.nextInt(10) < 3))
        hist ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
        // latest emitted cells per key == the batch cell aggregation,
        // and the z served from them == the batch operator bit-for-bit
        val latest = spark.table("ab").collect().zipWithIndex
          .groupBy(_._1.getLong(0))
          .map { case (k, rs) => rs.maxBy(_._2)._1 }
          .toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        val cells = latest.toDF("k", "n_a", "x_a", "n_b", "x_b")
        val served = graft.operators.Stats
          .twoProportionZFromCells(cells, "k")
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getDouble(7))).toMap
        val batch = graft.operators.Stats
          .twoProportionZ(hist.toSeq.toDF("k", "side", "hit"),
            "k", "side", "hit")
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getDouble(7))).toMap
        assert(served == batch,
          "streamed cells != batch two-proportion readout")
      }
    } finally q.stop()
  }

  test("streaming RQ sketch bytes are BIT-IDENTICAL to the batch " +
    "aggregate over each key's full history") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(71)
    val hist = scala.collection.mutable.Map
      .empty[Long, Vector[Long]].withDefaultValue(Vector.empty)
    val mem = MemoryStream[(Long, Long)]
    val q = Streaming.streamingRqSketch(mem.toDF().toDF("k", "v"),
        budget = 32)
      .writeStream.format("memory").queryName("rqs").outputMode("append")
      .start()
    try {
      // three batches of skewed values over two keys: enough distincts
      // to force the level past 0 (real sampling, not the degenerate
      // full histogram)
      (1 to 3).foreach { _ =>
        val rows = Seq.fill(300)((1L + rnd.nextInt(2),
          if (rnd.nextBoolean()) rnd.nextInt(10).toLong
          else rnd.nextLong() % 10000L))
        rows.foreach { case (k, v) => hist(k) = hist(k) :+ v }
        mem.addData(rows: _*)
        q.processAllAvailable()
      }
      // latest emitted row per key (the Append contract)
      val latest = spark.table("rqs").collect()
        .zipWithIndex
        .groupBy(_._1.getLong(0))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getAs[Array[Byte]](1) }
      val batch = hist.toSeq.flatMap { case (k, vs) => vs.map((k, _)) }
        .toDF("k", "v")
        .groupBy("k").agg(graft.functions.rq_sketch(col("v"), 32).as("sk"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(latest.keySet == batch.keySet)
      latest.foreach { case (k, bytes) =>
        assert(java.util.Arrays.equals(bytes, batch(k)),
          s"key $k: streamed sketch bytes != batch aggregate")
        assert(graft.functions.RqSketch.deserialize(bytes).level > 0,
          s"key $k: fixture must force real sampling")
      }
    } finally q.stop()
  }

  test("streaming decayed popularity serves batch-identical scores, " +
    "with late events pruned exactly like the batch cutoff") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = Streaming.streamingDecayedState(mem.toDF().toDF("k", "d"),
        horizonDays = 4)
      .writeStream.format("memory").queryName("decay").outputMode("append")
      .start()
    try {
      mem.addData((1L, 100L), (1L, 101L), (2L, 100L))
      q.processAllAvailable()
      // second batch: a fresh day for key 1 and a LATE event for key 2
      // (already beyond the horizon of key 2's own max day)
      mem.addData((1L, 103L), (2L, 95L))
      q.processAllAvailable()
      // latest state row per key: n_events strictly grows per emission
      val snap = spark.table("decay")
        .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")
            .orderBy(col("n_events").desc)))
        .where(col("__rk") === 1).drop("__rk")
      val served = Streaming.decayedFromState(snap, horizonDays = 4)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      val batch = graft.operators.Stats.decayedCounts(
          Seq((1L, 100L), (1L, 101L), (2L, 100L), (1L, 103L), (2L, 95L))
            .toDF("k", "d"), "k", "d", horizonDays = 4)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      assert(served == batch,
        "streamed decayed scores != batch kernel over the full history")
      // spot-check the arithmetic: global max 103, h=4 ->
      // key1 2^1+2^2+2^4 = 22; key2 keeps only day 100 -> 2, n=2
      assert(served(1L) == ((3L, 22L, 22.0 / 16.0)))
      assert(served(2L) == ((2L, 2L, 2.0 / 16.0)))
    } finally q.stop()
  }

  test("streaming state runs equal batch RLE over the history, " +
    "with runs growing across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val q = Streaming.streamingStateRuns(mem.toDF().toDF("k", "o", "st"))
      .writeStream.format("memory").queryName("rle").outputMode("append")
      .start()
    try {
      mem.addData((1L, 1L, "a"), (1L, 2L, "a"), (2L, 1L, "x"))
      q.processAllAvailable()
      // key 1's run of a's continues across the boundary, then flips
      mem.addData((1L, 3L, "a"), (1L, 4L, "b"), (2L, 2L, "y"))
      q.processAllAvailable()
      // keep the longest emission per (k, run_idx): a run emits once
      // per batch it grows in
      val out = spark.table("rle").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3))))
        .groupBy(_._1).map { case (kr, vs) => kr -> vs.map(_._2).maxBy(_._2) }
      val batch = graft.operators.Stats.stateRuns(
          Seq((1L, 1L, "a"), (1L, 2L, "a"), (2L, 1L, "x"),
            (1L, 3L, "a"), (1L, 4L, "b"), (2L, 2L, "y"))
            .toDF("k", "o", "st"), "k", Seq("o"), "st")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3)))).toMap
      assert(out == batch,
        "streamed RLE != batch stateRuns over the same history")
      assert(out((1L, 1L)) == (("a", 3L))) // grew across the boundary
    } finally q.stop()
  }

  test("streaming token bucket equals the batch kernel over the history") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = Streaming.streamingTokenBucket(mem.toDF().toDF("k", "ts"),
        capacityMilli = 2000L, refillMilliPerSec = 1000L, costMilli = 1000L,
        ticksPerSecond = 1000000L)
      .writeStream.format("memory").queryName("tb").outputMode("append")
      .start()
    try {
      mem.addData((1L, 0L), (1L, 100000L), (1L, 200000L))
      q.processAllAvailable()
      mem.addData((1L, 1300000L), (1L, 1350000L), (2L, 0L))
      q.processAllAvailable()
      val out = spark.table("tb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      // key 1 replays the StatsSpec example: grant, grant, deny, grant,
      // deny; key 2's first request drains the fresh bucket
      assert(out == Set((1L, 0L, true), (1L, 100000L, true),
        (1L, 200000L, false), (1L, 1300000L, true), (1L, 1350000L, false),
        (2L, 0L, true)))
      // aggregate parity with the batch kernel over the full history
      val batch = Seq((1L, Seq(0L, 100000L, 200000L, 1300000L, 1350000L)),
          (2L, Seq(0L)))
        .toDF("k", "us")
        .select(col("k"), graft.functions.token_bucket(col("us"),
          2000L, 1000L, 1000L).as("r"))
        .select(col("k"), col("r.granted"), col("r.denied")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val streamed = out.groupBy(_._1).view.mapValues(rs =>
        (rs.count(_._3).toLong, rs.count(!_._3).toLong)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("video dedup maintainer keeps streamed edges == batch rebuild " +
    "over clip upserts and deletes") {
    import graft.operators.Dedup
    def series(v: Int) = Seq.tabulate(8)(f => if (f >= 4 + v) 10000.0 else 0.0)
    def px(seed: Int, i: Int, j: Int): Double =
      ((seed * 31 + i * 131 + j * 17) * 2654435761L % 256 + 256) % 256
    def mat(g: Int, scene: Int, b: Double) =
      Seq.tabulate(8, 9)((i, j) =>
        px(g * 10 + scene, i, j) + (if (i == 1 && j == 2) b else 0.0))
    // corpus model: clip -> (group, variant, bump) — the OperatorSpec
    // random-refresh fixture
    type Corpus = Map[Long, (Int, Int, Double)]
    def clipsDf(c: Corpus) = c.toSeq.map { case (id, (_, v, _)) =>
      (id, series(v)) }.toDF("clip_id", "series")
    def framesDf(c: Corpus) = c.toSeq.flatMap { case (id, (g, _, b)) =>
      Seq((id, 2L, mat(g, 0, b)), (id, 6L, mat(g, 1, b))) }
      .toDF("clip_id", "frame_idx", "matrix")
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def expect(c: Corpus) = edgeSet(Dedup.videoNearDupEdges(clipsDf(c),
      framesDf(c), "clip_id", "series", "frame_idx", "matrix",
      cutThreshold = 5000.0, maxHamming = 6, minVotes = 2, bandBytes = 2))
    var corpus: Corpus = (1L to 6L).map(id =>
      id -> ((1 + (id % 3).toInt, (id % 2).toInt, 0.0))).toMap
    val m = new Streaming.VideoDedupMaintainer(clipsDf(corpus),
      framesDf(corpus), "clip_id", "series", "frame_idx", "matrix",
      cutThreshold = 5000.0, deleteCol = Some("del"))
    assert(edgeSet(m.edges) == expect(corpus),
      "initial edge set != batch videoNearDupEdges")
    // one batch row per clip: (clip_id, series, frames nested, del)
    def applyB(rows: Seq[(Long, Option[(Int, Int, Double)])],
               label: String): Unit = {
      val clipPart = rows.map {
        case (id, Some((_, v, _))) => (id, series(v), false)
        case (id, None) => (id, Seq.empty[Double], true)
      }.toDF("clip_id", "series", "del")
      val framesPart = rows.flatMap {
        case (id, Some((g, _, b))) =>
          Seq((id, 2L, mat(g, 0, b)), (id, 6L, mat(g, 1, b)))
        case (id, None) => Seq((id, 0L, Seq(Seq(0.0)))) // ignored payload
      }.toDF("clip_id", "frame_idx", "matrix")
        .groupBy("clip_id")
        .agg(collect_list(struct(col("frame_idx"), col("matrix")))
          .as("frames"))
      m.applyBatch(clipPart.join(framesPart, Seq("clip_id")))
      rows.foreach {
        case (id, Some(s)) => corpus += id -> s
        case (id, None) => corpus -= id
      }
      assert(edgeSet(m.edges) == expect(corpus),
        s"streamed edges != batch rebuild of the surviving corpus after $label")
    }
    // add a new group-1 clip (pairs with existing) + delete one
    applyB(Seq(7L -> Some((1, 0, 0.0)), 3L -> None), "add+delete")
    // re-encode (bump flips fingerprints, content leaves its pairs) +
    // variant shift of another (same content, new series)
    applyB(Seq(4L -> Some((2, 0, 1.0)), 2L -> Some((2, 1, 0.0))),
      "re-encode+shift")
    // unchanged re-send (no-op: survivors carry votes) + delete of an
    // absent id (no-op)
    applyB(Seq(1L -> Some((2, 1, 0.0)), 99L -> None), "no-op batch")
    // seeded random history over the same refresh model
    val rnd = new scala.util.Random(59)
    (1 to 2).foreach { i =>
      val rows = (1 to 4).map { _ =>
        val id = 1L + rnd.nextInt(9)
        if (rnd.nextInt(4) == 0) id -> (None: Option[(Int, Int, Double)])
        else id -> Some((1 + rnd.nextInt(3), rnd.nextInt(2),
          rnd.nextInt(2).toDouble))
      }.groupBy(_._1).map(_._2.head).toSeq
      applyB(rows, s"random batch $i")
    }
  }

  test("video dedup maintainer checkpoint/restore resumes without the " +
    "frame corpus") {
    import graft.operators.Dedup
    def series(v: Int) = Seq.tabulate(8)(f => if (f >= 4 + v) 10000.0 else 0.0)
    def px(seed: Int, i: Int, j: Int): Double =
      ((seed * 31 + i * 131 + j * 17) * 2654435761L % 256 + 256) % 256
    def mat(g: Int, scene: Int, b: Double) =
      Seq.tabulate(8, 9)((i, j) =>
        px(g * 10 + scene, i, j) + (if (i == 1 && j == 2) b else 0.0))
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val c0: Map[Long, (Int, Int, Double)] = Map(
      1L -> ((1, 0, 0.0)), 2L -> ((1, 1, 0.0)), 3L -> ((2, 0, 0.0)))
    def clipsDf(c: Map[Long, (Int, Int, Double)]) = c.toSeq.map {
      case (id, (_, v, _)) => (id, series(v)) }.toDF("clip_id", "series")
    def framesDf(c: Map[Long, (Int, Int, Double)]) = c.toSeq.flatMap {
      case (id, (g, _, b)) =>
        Seq((id, 2L, mat(g, 0, b)), (id, 6L, mat(g, 1, b))) }
      .toDF("clip_id", "frame_idx", "matrix")
    val live = new Streaming.VideoDedupMaintainer(clipsDf(c0), framesDf(c0),
      "clip_id", "series", "frame_idx", "matrix", cutThreshold = 5000.0,
      deleteCol = Some("del"))
    def mkBatch(rows: Seq[(Long, Option[(Int, Int, Double)])]) = {
      val clipPart = rows.map {
        case (id, Some((_, v, _))) => (id, series(v), false)
        case (id, None) => (id, Seq.empty[Double], true)
      }.toDF("clip_id", "series", "del")
      val framesPart = rows.flatMap {
        case (id, Some((g, _, b))) =>
          Seq((id, 2L, mat(g, 0, b)), (id, 6L, mat(g, 1, b)))
        case (id, None) => Seq((id, 0L, Seq(Seq(0.0))))
      }.toDF("clip_id", "frame_idx", "matrix")
        .groupBy("clip_id")
        .agg(collect_list(struct(col("frame_idx"), col("matrix")))
          .as("frames"))
      clipPart.join(framesPart, Seq("clip_id"))
    }
    val b1 = Seq(4L -> Some((1, 0, 0.0)), 3L -> None)
    val b2 = Seq(2L -> Some((2, 0, 0.0): (Int, Int, Double)),
      5L -> Some((1, 1, 0.0): (Int, Int, Double)))
    live.applyBatch(mkBatch(b1))
    val dir = java.nio.file.Files.createTempDirectory("vidckpt").toString
    live.checkpoint(dir)
    live.applyBatch(mkBatch(b2))
    // the restored maintainer resumes from disk alone — no frame corpus
    // anywhere — and must track the live one through the same b2
    val restored = Streaming.VideoDedupMaintainer.restore(spark, dir,
      "clip_id", "series", "frame_idx", "matrix", cutThreshold = 5000.0,
      deleteCol = Some("del"))
    restored.applyBatch(mkBatch(b2))
    assert(edgeSet(restored.edges) == edgeSet(live.edges),
      "restored edge set diverged from the live maintainer")
    val surviving: Map[Long, (Int, Int, Double)] = Map(
      1L -> ((1, 0, 0.0)), 2L -> ((2, 0, 0.0)), 4L -> ((1, 0, 0.0)),
      5L -> ((1, 1, 0.0)))
    assert(edgeSet(restored.edges) == edgeSet(Dedup.videoNearDupEdges(
      clipsDf(surviving), framesDf(surviving), "clip_id", "series",
      "frame_idx", "matrix", cutThreshold = 5000.0)),
      "restored edge set != batch rebuild of the surviving corpus")
  }

  test("streaming conformal monitor serves the exact batch BH threshold " +
    "and discovery count across batches") {
    implicit val sqlCtx = spark.sqlContext
    val calHist = (0L to 19L).map(_ -> 1L).toMap
    val mem = MemoryStream[(Long, Long)]
    val q = Streaming.streamingConformal(mem.toDF().toDF("k", "s"),
        calHist, alphaMicro = 200000L)
      .writeStream.format("memory").queryName("conf").outputMode("append")
      .start()
    try {
      // key 1 accumulates normal scores, then out-of-distribution ones
      // ACROSS the batch boundary (state must carry the histogram);
      // key 2 stays in-distribution
      val b1 = Seq((1L, 5L), (1L, 12L), (2L, 3L), (2L, 8L))
      mem.addData(b1: _*); q.processAllAvailable()
      val b2 = Seq((1L, 30L), (1L, 31L), (1L, 32L), (1L, 7L), (2L, 9L))
      mem.addData(b2: _*); q.processAllAvailable()
      val latest = spark.table("conf").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
      val calDF = calHist.toSeq
        .flatMap { case (v, c) => Seq.fill(c.toInt)(v) }.toDF("score")
      (1L to 2L).foreach { k =>
        val acc = (b1 ++ b2).filter(_._1 == k).map(_._2).zipWithIndex
          .map { case (v, i) => (i.toLong, v) }
        val disc = graft.operators.Stats.conformalBh(calDF,
            acc.toDF("id", "score"), "id", "score", 200000L)
          .collect()
        val (_, m, nd, thr, any) = latest(k)
        assert(m == acc.length.toLong, s"key $k m")
        assert(nd == disc.length.toLong, s"key $k discoveries")
        assert(any == disc.nonEmpty, s"key $k any")
        if (disc.nonEmpty)
          assert(thr == disc.map(_.getLong(1)).min, s"key $k threshold")
      }
      // the shifted key discovered its injected outliers; the quiet
      // key did not
      assert(latest(1L)._5 && latest(1L)._3 == 3L && !latest(2L)._5)
    } finally q.stop()
  }

  test("streaming jsonl ingest == batch ingest file-drop by file-drop, " +
    "error channel included") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField,
      StructType}
    import graft.sources.TextIngest
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-jsonl")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    def drop(name: String, lines: Seq[String]): Unit = {
      // write-then-rename: the file source must never read half a file
      val tmp = dir.resolve(s".$name.tmp")
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    drop("b1.jsonl", Seq(
      """{"id": 1, "text": "first"}""",
      """{"id": 2}""",
      """garbage"""))
    val q = TextIngest.jsonlStream(spark, dir.toString, schema,
        required = Seq("id", "text"), maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("jsonl_ing")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def state() = spark.table("jsonl_ing").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          r.getString(1), r.getString(2), r.getString(3))).toSet
      def batch() = TextIngest.jsonlWithErrors(spark, dir.toString,
          schema, Seq("id", "text")).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          r.getString(1), r.getString(2), r.getString(3))).toSet
      assert(state() == batch(), "after first drop")
      assert(state().count(_._3 == "ok") == 1 &&
        state().count(_._3 != "ok") == 2)
      // second file lands later; the stream picks up ONLY the new
      // lines (exactly-once per file) and stays equal to a batch
      // re-read of the whole directory
      drop("b2.jsonl", Seq(
        """{"id": 3, "text": "late arrival"}""",
        """{"id": null, "text": "orphan"}"""))
      q.processAllAvailable()
      assert(state() == batch(), "after second drop")
      assert(state().size == 5 && state().count(_._3 == "ok") == 2)
    } finally q.stop()
  }
  test("streaming WARC ingest == batch ingest file-drop by file-drop, " +
    "damage and offsets included") {
    import graft.sources.Warc
    val crlf = "\r\n"
    def rec(id: Int, body: String) =
      "WARC/1.0" + crlf +
        "WARC-Type: response" + crlf +
        s"WARC-Record-ID: <urn:uuid:$id>" + crlf +
        "WARC-Date: 2024-01-01T00:00:00Z" + crlf +
        s"Content-Length: ${body.length}" + crlf + crlf +
        body + crlf + crlf
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-warc")
    def drop(name: String, content: String): Unit = {
      val tmp = dir.resolve(s".$name.tmp")
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    drop("a.warc", rec(1, "first doc") + "junk junk" + crlf + rec(2, "second"))
    val q = Warc.warcStream(spark, dir.toString, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("warc_ing")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df
        .select(col("path"), col("rec_offset"), col("record_id"),
          col("_status"), col("_raw"))
        .collect().map(r => (r.getString(0).split('/').last, r.getLong(1),
          Option(r.get(2)).map(_.toString), r.getString(3),
          Option(r.get(4)).map(_.toString))).toSet
      def state() = snap(spark.table("warc_ing"))
      def batch() = snap(Warc.warcWithErrors(spark, dir.toString))
      assert(state() == batch(), "after first drop")
      assert(state().count(_._4 == "ok") == 2 &&
        state().count(_._4 == "corrupt") == 1)
      drop("b.warc", rec(3, "third") +
        rec(4, "body").replace("WARC/1.0", "WARC/oops"))
      q.processAllAvailable()
      assert(state() == batch(), "after second drop")
      assert(state().count(_._4 == "ok") == 3 &&
        state().count(_._4 == "corrupt") == 2)
    } finally q.stop()
  }

  test("streaming WARC -> HTML extraction -> quality curation == batch " +
    "curate file-drop by file-drop, including a checkpoint restart") {
    import graft.sources.{HtmlText, Warc}
    val crlf = "\r\n"
    def http(status: String, ct: String, body: String): String =
      s"HTTP/1.1 $status" + crlf + s"Content-Type: $ct" + crlf + crlf + body
    def rec(id: Int, payload: String) =
      "WARC/1.0" + crlf +
        "WARC-Type: response" + crlf +
        s"WARC-Record-ID: <urn:uuid:$id>" + crlf +
        "WARC-Date: 2024-01-01T00:00:00Z" + crlf +
        s"WARC-Target-URI: http://x.org/$id" + crlf +
        s"Content-Length: ${payload.getBytes("UTF-8").length}" +
        crlf + crlf + payload + crlf + crlf
    val html = "<html><body><nav>menu menu</nav><p>the data pipeline " +
      "keeps this long paragraph of words</p></body></html>"
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cur")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-ck")
    def drop(name: String, content: String): Unit = {
      val tmp = dir.resolve(s".$name.tmp")
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("record_id"), col("target_uri"), col("charset"),
        col("n_tokens"), col("stopword_ratio"), col("quality_score"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    val out = java.nio.file.Files.createTempDirectory("graft-warc-out")
    def batch() = snap(HtmlText.curateFromWarc(
      Warc.warcWithErrors(spark, dir.toString)))
    // parquet sink + checkpoint: the production landing shape, and the
    // one that supports restart recovery (memory sinks do not)
    def start() = HtmlText.curateFromWarc(
      Warc.warcStream(spark, dir.toString, maxFilesPerTrigger = 1))
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    def state() = snap(spark.read.parquet(out.toString))
    // file 1: one curatable HTML page, one skip-status page, one
    // plain-text record — only ok/ok_plain rows reach curation
    drop("a.warc", rec(1, http("200 OK", "text/html", html)) +
      rec(2, http("404 Not Found", "text/html", html)) +
      rec(3, http("200 OK", "text/plain", "plain words here now ok")))
    val q1 = start()
    try {
      q1.processAllAvailable()
      val got = state()
      assert(got == batch(), "streamed curate != batch after first drop")
      assert(got.size == 2 &&
        got.exists(_._1 == "<urn:uuid:1>") &&
        got.exists(_._1 == "<urn:uuid:3>"),
        s"only the ok html + ok_plain records curate: $got")
    } finally q1.stop()
    // restart from the checkpoint: the new query must replay ONLY the
    // new file (exactly-once across restarts) and land on batch parity
    drop("b.warc", rec(4, http("200 OK", "text/html",
      html.replace("words", "tokens"))))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(state() == batch(),
        "post-restart sink != batch curate (duplicate or missing rows)")
      assert(state().count(_._1 == "<urn:uuid:4>") == 1)
    } finally q2.stop()
  }

  test("live domain-mix report: streamed complete-mode aggregation == " +
    "batch report drop-by-drop, state survives a checkpoint restart") {
    import graft.sources.{HtmlText, Warc}
    val crlf = "\r\n"
    def http(status: String, ct: String, body: String): String =
      s"HTTP/1.1 $status" + crlf + s"Content-Type: $ct" + crlf + crlf + body
    def rec(id: Int, hostN: Int, payload: String) =
      "WARC/1.0" + crlf +
        "WARC-Type: response" + crlf +
        s"WARC-Record-ID: <urn:uuid:$id>" + crlf +
        "WARC-Date: 2024-01-01T00:00:00Z" + crlf +
        s"WARC-Target-URI: http://h$hostN.example.com/p$id" + crlf +
        s"Content-Length: ${payload.getBytes("UTF-8").length}" +
        crlf + crlf + payload + crlf + crlf
    def page(words: String) =
      s"<html><body><nav>m m</nav><p>the curated paragraph with $words " +
        "inside of it stays long</p></body></html>"
    val dir = java.nio.file.Files.createTempDirectory("graft-dmix")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dmix-ck")
    val out = java.nio.file.Files.createTempDirectory("graft-dmix-out")
    def drop(name: String, content: String): Unit = {
      val tmp = dir.resolve(s".$name.tmp")
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    def batch() = snap(HtmlText.domainMix(HtmlText.extractFromWarc(
      Warc.warcWithErrors(spark, dir.toString))))
    // the production live-report pattern: complete-mode aggregation,
    // each micro-batch OVERWRITES the report table via foreachBatch;
    // aggregation state lives in the query checkpoint, so a restarted
    // query resumes the counters instead of recounting from zero
    def start() = HtmlText.domainMix(HtmlText.extractFromWarc(
        Warc.warcStream(spark, dir.toString, maxFilesPerTrigger = 1)))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out.toString)
      }.start()
    def state() = snap(spark.read.parquet(out.toString))
    drop("a.warc",
      rec(1, 0, http("200 OK", "text/html", page("alpha"))) +
      rec(2, 0, http("404 Not Found", "text/html", page("beta"))) +
      rec(3, 1, http("200 OK", "text/plain", "short plain body here")))
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(state() == batch(), "live report != batch after first drop")
      assert(state()("h0.example.com").head == 2L &&
        state()("h1.example.com").head == 1L)
    } finally q1.stop()
    // second drop lands while the query is DOWN; the restarted query
    // must fold it into the checkpointed counters
    drop("b.warc",
      rec(4, 0, http("200 OK", "text/html", page("gamma"))) +
      rec(5, 2, http("200 OK", "image/png", "xx")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(state() == batch(),
        "restarted live report != batch over all drops")
      assert(state()("h0.example.com").head == 3L &&
        state().contains("h2.example.com"))
    } finally q2.stop()
  }

  test("PqIndexMaintainer: streamed code table == batch re-encode of " +
    "the surviving corpus under the frozen quantizers, serving parity " +
    "holds, and checkpoint/restore resumes without the vectors") {
    import graft.operators.Similarity
    import graft.functions.{ivf_assign, pq_encode}
    val rnd = new scala.util.Random(907)
    def vec(seed: Long): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(8)((r.nextDouble() * 2 - 1).toFloat)
    }
    val v0 = (0L until 40L).map(i => (i, vec(i)))
    val m = new Streaming.PqIndexMaintainer(
      v0.toDF("vec_id", "embedding"), "vec_id", "embedding",
      m = 4, ks = 8, nCells = 4, deleteCol = Some("del"))
    // the reference quantizers: derived the same deterministic way
    // from the same initial corpus
    val cents = Similarity.seedCentroids(v0.toDF("vec_id", "embedding"), 4)
    val cbs = Similarity.pqCodebooks(v0.toDF("vec_id", "embedding"), 4, 8)
    var corpus: Map[Long, Seq[Float]] = v0.toMap
    def codeSet(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toSeq)).toSet
    def expect() = codeSet(corpus.toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"), ivf_assign(col("embedding"), cents).as("cell"),
        pq_encode(col("embedding"), cbs).as("codes")))
    assert(codeSet(m.index.codes) == expect(), "initial codes != encode")
    def batch(mm: Streaming.PqIndexMaintainer,
              rows: Seq[(Long, Seq[Float], Boolean)], label: String,
              track: Boolean = true): Unit = {
      mm.applyBatch(rows.toDF("vec_id", "embedding", "del"))
      if (track) {
        rows.foreach { case (id, v, del) =>
          if (del) corpus -= id else corpus += id -> v }
        assert(codeSet(mm.index.codes) == expect(),
          s"streamed codes != batch re-encode after $label")
      }
    }
    batch(m, Seq((3L, vec(103L), false), (7L, null, true)), "edit+delete")
    batch(m, Seq((40L, vec(140L), false), (41L, vec(141L), false)), "adds")
    batch(m, Seq((3L, vec(103L), false), (99L, null, true)),
      "unchanged re-send + absent delete")
    batch(m, Seq((0L, null, true), (40L, vec(240L), false)),
      "delete a centroid seed + re-edit")
    (1 to 3).foreach { i =>
      val rows = (1 to 5).map { _ =>
        val id = rnd.nextInt(45).toLong
        if (rnd.nextInt(4) == 0) (id, null: Seq[Float], true)
        else (id, vec(rnd.nextInt(1000).toLong), false)
      }.groupBy(_._1).map(_._2.head).toSeq
      batch(m, rows, s"random batch $i")
    }
    // serving parity: IVFADC over the maintained index == over a fresh
    // index wrapped around the batch re-encode of the same corpus
    val queries = corpus.keys.toSeq.sorted.take(5)
      .map(id => (id, corpus(id))).toDF("vec_id", "embedding")
    val fresh = Similarity.PqIndex(corpus.toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"), ivf_assign(col("embedding"), cents).as("cell"),
        pq_encode(col("embedding"), cbs).as("codes")), cents, cbs)
    def tk(idx: Similarity.PqIndex) =
      Similarity.ivfPqTopK(idx, queries, k = 3, nProbe = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
    assert(tk(m.index) == tk(fresh), "serving diverged from rebuild")
    // checkpoint/restore: resumes from disk alone and tracks the live
    // maintainer through one more batch
    val dir = java.nio.file.Files.createTempDirectory("pqm").toString
    m.checkpoint(dir)
    val restored = Streaming.PqIndexMaintainer.restore(spark, dir,
      "vec_id", "embedding", deleteCol = Some("del"))
    val b2 = Seq((5L, vec(205L), false), (41L, null, true))
    batch(m, b2, "post-checkpoint")
    batch(restored, b2, "post-checkpoint (restored)", track = false)
    assert(codeSet(restored.index.codes) == codeSet(m.index.codes),
      "restored maintainer diverged from the live one")
    assert(codeSet(restored.index.codes) == expect(),
      "restored maintainer != batch re-encode")
    // commit-marker protocol: a checkpoint dir whose marker is gone
    // (crash between the marker delete and the final re-create) must
    // refuse to restore instead of loading mixed generations
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_commit")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(marker), "checkpoint must leave a commit marker")
    fs.delete(marker, false)
    val eM = intercept[IllegalStateException] {
      Streaming.PqIndexMaintainer.restore(spark, dir, "vec_id",
        "embedding", deleteCol = Some("del"))
    }
    assert(eM.getMessage.contains("commit marker"), eM.getMessage)
    m.checkpoint(dir) // re-checkpoint re-creates the marker
    assert(fs.exists(marker), "re-checkpoint must restore the marker")
  }
}
