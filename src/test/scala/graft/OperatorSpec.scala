package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators._

/** Column-expression and operator tests on tiny in-memory frames. */
class OperatorSpec extends SparkTestBase {
  import spark.implicits._

  test("savgol_smooth column matches the JVM kernel") {
    val xs = Array(7.63, 77.99, 43.84, 72.35, 97.8, 53.85, 50.11, 7.21, 26.84, 49.99)
    val df = Seq(Tuple1(xs.toSeq)).toDF("series")
    val out = df.select(savgol_smooth(col("series"), 5, 2)).head.getSeq[Double](0)
    val expected = graft.functions.SavGol(xs, 5, 2)
    out.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("savgol_smooth yields null for series shorter than the window") {
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("series")
    assert(df.select(savgol_smooth(col("series"), 5, 2)).head.isNullAt(0))
  }

  test("linear_resample_vec and sliding boxes null malformed matrices") {
    // ragged inner row -> null row, not ArrayIndexOutOfBounds
    val ragged = Seq(Tuple1(Seq(Seq(1.0, 2.0), Seq(3.0)))).toDF("m")
    assert(ragged.select(linear_resample_vec(col("m"), lit(5), lit(25.0)))
      .head().isNullAt(0))
    // null inner row -> null row, not NPE
    val nullRow = Seq(Tuple1(Seq(Seq(1.0, 2.0), null.asInstanceOf[Seq[Double]])))
      .toDF("m")
    assert(nullRow.select(linear_resample_vec(col("m"), lit(5), lit(25.0)))
      .head().isNullAt(0))
    // null frame in the landmark matrix -> null row
    val lm = spark.sql(
      """SELECT array(array(named_struct('x', 1.0d, 'y', 2.0d)),
        |  CAST(NULL AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)) AS lm""".stripMargin)
    assert(lm.select(ClipOps.emocaLikeBboxes(col("lm"), 1.25, 5).as("b"))
      .head().isNullAt(0))
  }

  test("edge_moving_avg_vec nulls malformed rows instead of throwing") {
    // ragged inner row (shorter than rows(0))
    val ragged = Seq(Tuple1(Seq(Seq(1.0, 2.0), Seq(3.0)))).toDF("m")
    assert(ragged.select(edge_moving_avg_vec(col("m"), 4)).head.isNullAt(0))
    // null inner row
    val withNull = Seq(Tuple1(Seq(Seq(1.0, 2.0), null.asInstanceOf[Seq[Double]])))
      .toDF("m")
    assert(withNull.select(edge_moving_avg_vec(col("m"), 4)).head.isNullAt(0))
    // well-formed input is unaffected: matches the scalar kernel per column
    val rows = Array(Array(1.0, 10.0), Array(2.0, 20.0), Array(3.0, 30.0))
    val ok = Seq(Tuple1(rows.map(_.toSeq).toSeq)).toDF("m")
      .select(edge_moving_avg_vec(col("m"), 2)).head
      .getSeq[scala.collection.Seq[Double]](0)
    val c0 = graft.functions.EdgeMovingAvg(rows.map(_(0)), 2)
    val c1 = graft.functions.EdgeMovingAvg(rows.map(_(1)), 2)
    ok.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r(0) - c0(i)) < 1e-12 && math.abs(r(1) - c1(i)) < 1e-12)
    }
  }

  test("bbox geometry: to_square keeps center, pad then integerize") {
    val df = Seq((10.0, 20.0, 30.0, 30.0, 0.875)).toDF("x1", "y1", "x2", "y2", "c")
    val b = bbox(col("x1"), col("y1"), col("x2"), col("y2"), col("c"))
    // width 20, height 10 -> square 20x20 centered: y1-5, y2+5
    val sq = df.select(bbox_to_square(b).as("b")).select("b.x1", "b.y1", "b.x2", "b.y2").head
    assert(sq == Row(10.0, 15.0, 30.0, 35.0))
    // pad by round_even(20*0.1)=2
    val pd = df.select(bbox_pad_frac(bbox_to_square(b), 0.1).as("b"))
      .select("b.x1", "b.y1", "b.x2", "b.y2").head
    assert(pd == Row(8.0, 13.0, 32.0, 37.0))
    // integerize: conf -> round(0.875*100) = round_even(87.5) = 88
    val it = df.select(bbox_to_integer(bbox_to_square(b)).as("b")).select("b.conf").head
    assert(it == Row(88L))
  }

  test("blink features on a synthetic eye geometry") {
    // p36=(0,0), p39=(4,0): horizontal 4; p37=(1,1), p41=(1,-1): vert 2; p38=(3,1), p40=(3,-1): vert 2
    val pts = Array.tabulate(68)(i => i match {
      case 36 => (0.0, 0.0); case 39 => (4.0, 0.0)
      case 37 => (1.0, 1.0); case 41 => (1.0, -1.0)
      case 38 => (3.0, 1.0); case 40 => (3.0, -1.0)
      // right eye: wider open
      case 42 => (10.0, 0.0); case 45 => (14.0, 0.0)
      case 43 => (11.0, 2.0); case 47 => (11.0, -2.0)
      case 44 => (13.0, 2.0); case 46 => (13.0, -2.0)
      case _ => (0.0, 0.0)
    })
    val df = Seq(Tuple1(pts.toSeq)).toDF("raw")
      .select(transform(col("raw"), p =>
        struct(p("_1").as("x"), p("_2").as("y"))).as("lm"))
    val r = df.select(blink_features(col("lm")).as("bf"))
      .select("bf.left_blink", "bf.right_blink", "bf.average_blink").head
    // left: (2+2)/(2*4) = 0.5 ; right: (4+4)/(2*4) = 1.0
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.75) < 1e-12)
  }

  test("exact dedup clusters duplicate texts") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "unique")).toDF("id", "text")
    val out = Dedup.exactClusters(df, "id", "text")
      .orderBy("canonical_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("canonical_id") == 1L)
    assert(out(0).getAs[Long]("cluster_size") == 2L)
  }

  test("minhash LSH finds an exact duplicate pair with jaccard 1.0") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, text), (3L, "completely different words entirely here now"))
      .toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(df, "id", "text", shingleN = 3,
      bands = 8, rowsPerBand = 2, threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("id_a") == 1L && pairs(0).getAs[Long]("id_b") == 2L)
    assert(math.abs(pairs(0).getAs[Double]("jaccard") - 1.0) < 1e-12)
  }

  test("uax29-tokenized minhash sees space-free CJK near-dups the " +
    "whitespace path is structurally blind to") {
    import graft.functions.uax29_tokens
    val base = "深度学习模型需要大量高质量的训练数据来学习语言结构"
    val df = Seq(
      (1L, base + "甲"), (2L, base + "乙"),
      (3L, "an unrelated english document with several words here"))
      .toDF("id", "text")
    // whitespace tokens: each CJK doc is ONE token -> zero 3-shingles
    // -> no candidates at all
    val ws = Dedup.minhashLshPairs(df, "id", "text", shingleN = 3,
      bands = 8, rowsPerBand = 2, threshold = 0.5).collect()
    assert(ws.isEmpty, s"ws path should be blind: ${ws.toSeq}")
    // uax29 char-unigram tokens: the shared passage is a high-Jaccard
    // shingle set
    val ux = Dedup.minhashLshPairs(df, "id", "text", shingleN = 3,
      bands = 8, rowsPerBand = 2, threshold = 0.5,
      tokens = uax29_tokens).collect()
    assert(ux.length == 1 && ux(0).getAs[Long]("id_a") == 1L &&
      ux(0).getAs[Long]("id_b") == 2L &&
      ux(0).getAs[Double]("jaccard") > 0.8)
  }

  test("tokenFertility: CJK text inflates the uax/ws ratio exactly; " +
    "nfcAudit: decomposed text flags non-NFC and hashes equal its " +
    "precomposed twin") {
    val docs = Seq(
      ("a", "plain words here"),                 // ws 3, uax 3
      ("a", "\u6f22\u5b57\u6e2c\u8a66 ok"),  // ws 2, uax 5
      ("b", "")).toDF("src", "text")
    val f = TextAnalysis.tokenFertility(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(f("a") == ((2L, 5L, 8L, Some(8L * 1000000L / 5L))))
    assert(f("b") == ((1L, 0L, 0L, None)))
    val nf = TextAnalysis.nfcAudit(Seq(
        (1L, "cafe\u0301"), (2L, "caf\u00e9"), (3L, "ascii")
      ).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(!nf(1L)._1 && nf(1L)._2 == 5L && nf(1L)._3 == 4L)
    assert(nf(2L)._1 && nf(2L)._2 == 4L)
    assert(nf(1L)._4 == nf(2L)._4, "NFC hash must unify the twins")
    assert(nf(3L)._1)
  }

  test("codeQualityProfile flags long lines, low-alnum and autogen " +
    "markers; dialogueFormatAudit validates alternation structurally") {
    import graft.operators.Validate
    val files = Seq(
      (1L, "# c\nval x = 1\nval y = 2"),            // clean -> keep
      (2L, "short\n" + "z" * 1500),                  // long line
      (3L, "// DO NOT EDIT\ncode here"),             // autogen
      (4L, "@@ ## $$ %% ^^ && !!")                   // low alnum
    ).toDF("id", "text")
    val got = TextAnalysis.codeQualityProfile(files, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getBoolean(6),
          r.getBoolean(7))).toMap
    assert(got(1L) == ((3L, 9L, 1L, false, true)))
    assert(got(2L)._2 == 1500L && !got(2L)._5)
    assert(got(3L)._4 && !got(3L)._5 && got(3L)._3 == 1L)
    assert(!got(4L)._5)
    def turns(ts: (String, String)*) = ts.map { case (r, c) => (r, c) }
    val convs = Seq(
      (1L, Seq(("system", "s"), ("user", "hi"), ("assistant", "yo"))),
      (2L, Seq(("user", "hi"), ("assistant", "yo"),
        ("user", "more"), ("assistant", "ok"))),
      (3L, Seq(("user", "hi"), ("user", "again"), ("assistant", "yo"))),
      (4L, Seq(("user", "hi"), ("assistant", "yo"), ("user", "end"))),
      (5L, Seq(("user", "hi"), ("assistant", " "))),
      (6L, Seq(("system", "s"))),
      (7L, Seq.empty[(String, String)]),
      (8L, Seq(("assistant", "starts wrong"))),
      (9L, Seq(("user", "hi"), ("assistant", null: String))))
      .toDF("id", "turns")
      .select(col("id"), expr(
        "transform(turns, t -> struct(t._1 AS role, t._2 AS content))")
        .as("turns"))
    val aud = Validate.dialogueFormatAudit(convs, "id", "turns")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(4), r.getLong(6),
          r.getBoolean(7))).toMap
    assert(aud(1L) == ((true, true, 0L, true)))
    assert(aud(2L) == ((false, true, 0L, true)))
    assert(!aud(3L)._2 && !aud(3L)._4, "doubled user must fail")
    assert(!aud(4L)._4, "ending on user must fail")
    assert(aud(5L)._3 == 1L && !aud(5L)._4, "blank content must fail")
    assert(!aud(6L)._4 && !aud(7L)._4 && !aud(8L)._4)
    assert(aud(9L)._3 == 1L && !aud(9L)._4,
      "NULL content must count as empty, not slip the NULL predicate")
  }

  test("fimTransform partitions exactly (prefix+middle+suffix == doc) " +
    "and is deterministic; lossMaskSpans offsets equal the cumulative " +
    "token walk") {
    import graft.operators.Validate
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "x"))
      .toDF("id", "text")
    val f = TextAnalysis.fimTransform(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    f.foreach { case (id, (l, p, m, sfx, _)) =>
      assert(p + m + sfx == l, s"doc $id: $p+$m+$sfx != $l")
    }
    assert(f(2L)._1 == 0L)
    val f2 = TextAnalysis.fimTransform(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(f.view.mapValues(_._5).toMap == f2, "must be deterministic")
    val convs = Seq(
      (1L, Seq(("user", "one two three"), ("assistant", "four five"),
        ("user", "six"), ("assistant", "seven eight nine"))))
      .toDF("id", "turns")
      .select(col("id"), expr(
        "transform(turns, t -> struct(t._1 AS role, t._2 AS content))")
        .as("turns"))
    val spans = Validate.lossMaskSpans(convs, "id", "turns")
      .orderBy("turn_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // tokens: 3, 2, 1, 3 -> assistant spans [3,5) at idx 1, [6,9) at 3
    assert(spans == Seq((1L, 3L, 5L), (3L, 6L, 9L)))
  }

  test("NFC normalization is what lets cross-form boilerplate dedup " +
    "collapse: decomposed and precomposed twins survive separately " +
    "without it, once with it") {
    import graft.functions.{nfc_normalize, uax29_sentences}
    val docs = Seq(
      (1L, "Visit the cafe\u0301 lounge now! unique one."),
      (2L, "Visit the caf\u00e9 lounge now! unique two."))
      .toDF("id", "text")
    def kept(norm: Boolean): Map[Long, Long] = {
      val txt = if (norm) nfc_normalize(col("text")) else col("text")
      TextAnalysis.dedupLines(
          docs.select(col("id"), uax29_sentences(txt).as("sents")),
          "id", "sents")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(kept(norm = false) == Map(1L -> 2L, 2L -> 2L),
      "raw forms hash apart - no cross-doc dedup")
    assert(kept(norm = true) == Map(1L -> 2L, 2L -> 1L),
      "NFC unifies the boilerplate - only the first doc keeps it")
  }

  test("binarySpillAudit: uniform text pins entropy == lnq(k); spam " +
    "and blobs trip their meters; sftResponseAudit echo extremes") {
    import graft.operators.Validate
    def lnq(x: Long) = BigDecimal(math.log(x.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val docs = Seq(
      (1L, "abcd" * 25),                        // uniform over 4 chars
      (2L, "a" * 120),                          // entropy 0 -> spam
      (3L, "QWERTYuiopASDFGhjkl+" * 3),         // 60-char base64 run
      (4L, ""),
      (5L, "the quick brown fox! jumps over lazy dogs again."))
      .toDF("id", "text")
    val got = TextAnalysis.binarySpillAudit(docs, "id", "text",
        minEntropyMicro = 1000000L, maxEntropyMicro = 4000000L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3),
          r.getBoolean(5))).toMap
    assert(got(1L)._1.contains(lnq(4L)), s"uniform-4 entropy ${got(1L)}")
    assert(!got(1L)._3, "a 100-char unbroken alnum run IS a blob")
    assert(got(5L)._3, "natural text must keep")
    assert(got(2L)._1.contains(0L) && !got(2L)._3)
    assert(got(3L)._2 == 60L && !got(3L)._3, "blob mass must reject")
    assert(got(4L)._1.isEmpty && !got(4L)._3, "empty doc never keeps")
    val convs = Seq(
      (1L, Seq(("user", "tell me about spark"),
        ("assistant", "spark about me tell"))),      // pure echo
      (2L, Seq(("user", "what now"), ("assistant", "fresh words only"))))
      .toDF("id", "turns")
      .select(col("id"), expr(
        "transform(turns, t -> struct(t._1 AS role, t._2 AS content))")
        .as("turns"))
    val aud = Validate.sftResponseAudit(convs, "id", "turns")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(aud(1L) == ((4L, 4L, 1000000L, 1000000L)))
    assert(aud(2L)._4 == 0L)
  }

  test("minhashBandRecallSweep: finer banding never adds candidates " +
    "or recall; the exact-dup pair is caught by every configuration") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = ((1 to 20).map(i => (i.toLong,
      s"completely unrelated filler document number $i with words")) ++
      Seq((100L, text), (101L, text))).toDF("id", "text")
    val got = Dedup.minhashBandRecallSweep(df, "id", "text",
        shingleN = 3, threshold = 0.9)
      .orderBy(col("rows_per_band")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._3).distinct.toSeq == Seq(1L), "one true pair")
    assert(got.forall(_._5 == 1L), "the exact dup collides everywhere")
    assert(got.sliding(2).forall(p => p(0)._4 >= p(1)._4),
      s"candidate count must fall with finer banding: ${got.toSeq}")
  }

  test("luhnCardAudit: checksum separates real card numbers from " +
    "same-length junk; short runs are never candidates") {
    val docs = Seq(
      (1L, "pay 4111111111111111 or 4532015112830366 today"), // 2 valid
      (2L, "ref 4532015112830367 is not a card"),             // bad sum
      (3L, "order 1234567890 and zip 94110"),                 // short runs
      (4L, "")).toDF("id", "text")
    val got = TextAnalysis.luhnCardAudit(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got(1L) == ((2L, 2L, 2L, true)))
    assert(got(2L) == ((1L, 1L, 0L, false)))
    assert(got(3L) == ((2L, 0L, 0L, false)))
    assert(got(4L) == ((0L, 0L, 0L, false)))
  }

  test("dropCrossDocParagraphs drops boilerplate everywhere, keeps within-doc repeats") {
    val df = Seq(
      (1L, Seq("shared footer", "unique a")),
      (2L, Seq("unique b", "shared footer")),
      (3L, Seq("solo", "solo")), // within-doc repeat: NOT cross-doc, survives
      (4L, Seq.empty[String])).toDF("id", "paras")
    val out = TextAnalysis.dropCrossDocParagraphs(df, "id", "paras")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_dropped") == 1L &&
      out(0).getAs[String]("kept_text") == "unique a")
    assert(out(1).getAs[Long]("n_dropped") == 1L &&
      out(1).getAs[String]("kept_text") == "unique b")
    assert(out(2).getAs[Long]("n_dropped") == 0L &&
      out(2).getAs[String]("kept_text") == "solo\nsolo")
    assert(out(3).getAs[Long]("n_paras") == 0L &&
      out(3).getAs[String]("kept_text") == "")
  }

  test("multiBloomDecontaminate matches per-set single-run decontamination") {
    val heldOut = Seq(
      ("evalA", Seq("alpha beta gamma", "beta gamma delta")),
      ("evalB", Seq("omega psi chi"))).toDF("set_name", "shingles")
    val train = Seq(
      (1L, Seq("alpha beta gamma", "unrelated one two")), // hits A only
      (2L, Seq("omega psi chi")),                         // hits B only
      (3L, Seq("nothing shared here")),
      (4L, Seq.empty[String])).toDF("doc_id", "shingles")
    val out = Sketches.multiBloomDecontaminate(heldOut, train, 16384, 4)
      .orderBy("doc_id", "eval_set").collect()
    assert(out.length == 8)
    def row(d: Long, s: String) = out.find(r =>
      r.getAs[Long]("doc_id") == d && r.getAs[String]("eval_set") == s).get
    assert(row(1L, "evalA").getAs[Long]("n_hits") == 1L &&
      row(1L, "evalA").getAs[Boolean]("contaminated"))
    assert(row(1L, "evalB").getAs[Long]("n_hits") == 0L)
    assert(row(2L, "evalB").getAs[Boolean]("contaminated") &&
      row(2L, "evalA").getAs[Long]("n_hits") == 0L)
    assert(!row(3L, "evalA").getAs[Boolean]("contaminated") &&
      !row(3L, "evalB").getAs[Boolean]("contaminated"))
    assert(row(4L, "evalA").getAs[Long]("n_shingles") == 0L &&
      row(4L, "evalA").getAs[Long]("n_hits") == 0L)
  }

  test("multiBloomDecontaminate: an all-empty-shingle set still emits its rows") {
    // evalEmpty's documents have no shingles, so it builds no Bloom at the
    // explode — the roster must still carry it (all-zero filter) or the
    // |train| x K row contract silently breaks
    val heldOut = Seq(
      ("evalA", Seq("alpha beta gamma")),
      ("evalEmpty", Seq.empty[String])).toDF("set_name", "shingles")
    val train = Seq(
      (1L, Seq("alpha beta gamma")),
      (2L, Seq("other"))).toDF("doc_id", "shingles")
    val out = Sketches.multiBloomDecontaminate(heldOut, train, 16384, 4)
      .orderBy("doc_id", "eval_set").collect()
    assert(out.length == 4) // 2 docs x 2 sets, empty set included
    val empties = out.filter(_.getAs[String]("eval_set") == "evalEmpty")
    assert(empties.length == 2)
    assert(empties.forall(r => r.getAs[Long]("n_hits") == 0L &&
      !r.getAs[Boolean]("contaminated")))
    assert(out.exists(r => r.getAs[String]("eval_set") == "evalA" &&
      r.getAs[Boolean]("contaminated")))
  }

  test("audioEnergyMatrix: short clips degrade to a NULL matrix, not an ANSI error") {
    // 2 frames x 2 segs x 4 samples = 16 needed; the 10-sample clip must
    // NULL out (and drop from the dedup join), not throw
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's default ANSI mode
    val df = Seq(
      (1L, (1 to 16).map(_.toLong)),
      (2L, (1 to 10).map(_.toLong)),
      (3L, Seq.empty[Long])).toDF("clip_id", "samples")
    val out = df.select(col("clip_id"),
        Multimodal.audioEnergyMatrix(col("samples"), 2, 2, 4).as("m"))
      .orderBy("clip_id").collect()
    val full = out(0).getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("m")
    assert(full.length == 2 && full(0).length == 2)
    assert(full(0)(0) == (1 to 4).map(x => x.toLong * x).sum.toDouble)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    // and the fingerprint side nulls with it
    val fp = df.select(col("clip_id"), dhash_bands(
      Multimodal.audioEnergyMatrix(col("samples"), 2, 2, 4)).as("b"))
    assert(fp.count() == 3) // evaluates without throwing
  }

  test("updateSignatureIndex touches only added/changed docs and retires removed") {
    import graft.operators.Snapshot
    val prev = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four"),
      (3L, "doomed text gets removed now")).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "alpha beta gamma delta"),        // unchanged
      (2L, "one two three four CHANGED"),    // changed
      (5L, "brand new arrival text here")).toDF("doc_id", "text") // added
    val d = Snapshot.delta(prev, cur, "doc_id", "text")
    // TAMPER doc 1's previous signatures: if the incremental path
    // recomputed unchanged docs, the tampered rows could not survive
    val tampered = Dedup.bandedSignatures(prev, "doc_id", "text", 3, 8, 2)
      .withColumn("band_sig", when(col("doc_id") === 1L,
        typedLit(Seq(-9L, -9L))).otherwise(col("band_sig")))
    val out = Snapshot.updateSignatureIndex(tampered, d, cur, "doc_id", "text",
      3, 8, 2).collect()
    assert(out.filter(_.getLong(0) == 1L)
      .forall(_.getSeq[Long](2) == Seq(-9L, -9L)), "unchanged doc was recomputed")
    assert(!out.exists(_.getLong(0) == 3L), "removed doc not retired")
    // changed + added docs carry fresh signatures == the full rebuild's
    val rebuilt = Dedup.bandedSignatures(cur, "doc_id", "text", 3, 8, 2)
      .where(col("doc_id").isin(2L, 5L))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSet
    val freshened = out.filter(r => r.getLong(0) == 2L || r.getLong(0) == 5L)
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSet
    assert(freshened == rebuilt)
  }

  test("vecFingerprint is ANSI-safe on degenerate vectors and change-detecting") {
    import graft.operators.Snapshot
    val df = Seq(
      (1L, Seq(0.25f, -0.5f)),
      (2L, Seq(0.25f, -0.5f)),                       // identical to 1
      (3L, Seq(0.25f, -0.5000005f)),                 // differs past 1e-6
      (4L, Seq(Float.NaN, 1.0f)),                    // must not throw (ANSI)
      (5L, Seq(Float.PositiveInfinity, Float.MinValue))
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        Snapshot.vecFingerprint(col("embedding")).as("h"))
      .orderBy("vec_id").collect().map(_.getLong(1))
    assert(out(0) == out(1))       // identical vectors, identical prints
    assert(out(0) != out(2))       // sub-micro change detected
    assert(out.distinct.length >= 4) // degenerate rows hash deterministically
  }

  test("ccnetPerplexityFilter scores predictable text lower and drops degenerate docs") {
    import graft.operators.TextAnalysis
    // docs 1-3 repeat the same bigrams (a predictable sub-language);
    // doc 4 is one-of-a-kind bigrams; docs 5/6 have no bigrams at all
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the rug"),
      (4L, "zq wv xj kp qr bn"),
      (5L, "single"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.ccnetPerplexityFilter(docs, "doc_id", "text",
      thresholdMicro = Long.MaxValue).orderBy("doc_id").collect()
    assert(out.length == 6) // row parity incl. degenerate docs
    val avg = out.map(r => r.getLong(0) -> r.getAs[Long]("nll_avg_micro")).toMap
    assert(avg(1L) == avg(2L)) // identical docs, identical score
    assert(avg(1L) < avg(4L), s"repeated bigrams must be cheaper: $avg")
    // no-bigram docs: zero counts, keep = false even at +inf threshold
    for (id <- Seq(5L, 6L)) {
      val r = out.find(_.getLong(0) == id).get
      assert(r.getAs[Long]("n_bigrams") == 0L && !r.getAs[Boolean]("keep"))
    }
    assert(out.filter(r => r.getLong(0) <= 4L).forall(_.getAs[Boolean]("keep")))
  }

  test("substringDedupRemove cuts later-occurrence spans, keeps the first") {
    import graft.operators.TextAnalysis
    // doc 1 owns the 16-token window; doc 2 repeats it verbatim at a
    // STRIDE-ALIGNED offset (8 unique prefix tokens — the chunker
    // windows start at multiples of the stride, the documented
    // approximation of the suffix-array method) — the repeated window
    // must vanish from doc 2 only; doc 3 is clean; doc 4 NULL
    val shared = (1 to 16).map(i => s"w$i").mkString(" ")
    val prefix = (1 to 8).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, shared),
      (2L, s"$prefix $shared tail2 unique9"),
      (3L, "completely separate clean text"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.substringDedupRemove(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_kept_tokens"), r.getAs[String]("kept_text"))).toMap
    assert(byId(1L)._2 == shared.toLowerCase) // first occurrence intact
    assert(byId(3L) == (4L, "completely separate clean text"))
    assert(byId(4L) == (0L, ""))
    // doc 2 lost the shared window's tokens; its unique tokens survive
    assert(!byId(2L)._2.contains("w8") && byId(2L)._2.contains("u2")
      && byId(2L)._2.contains("unique9"))
    assert(byId(2L)._1 < 20L)
    // partitioning independence (collect_list order must not matter)
    val repart = TextAnalysis.substringDedupRemove(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(repart == out.map(_.toSeq).toSeq)
  }

  test("urlCurate collapses cosmetic URL variants and fires the blocklist") {
    val df = Seq(
      (1L, "https://WWW.News.Example.COM:443/a/b/?utm_source=x&id=7#frag"),
      (2L, "http://news.example.com/a/b?id=7&fbclid=zzz"),
      (3L, "https://news.example.com/a/b?id=8"),
      (4L, "http://Evil.Bad.org/x")).toDF("id", "url")
    val out = TextAnalysis.urlCurate(df, "id", "url", Seq("bad.org"))
      .orderBy("doc_id").collect()
    // 1 and 2 canonicalize identically; 1 wins as the lower id
    assert(out(0).getAs[String]("canon_url") == "news.example.com/a/b?id=7")
    assert(out(0).getAs[String]("canon_url") == out(1).getAs[String]("canon_url"))
    assert(out(0).getAs[Boolean]("is_canonical") && !out(1).getAs[Boolean]("is_canonical"))
    assert(out(2).getAs[Boolean]("kept")) // different query -> different URL
    assert(out(0).getAs[String]("domain") == "example.com")
    assert(out(3).getAs[Boolean]("blocked") && !out(3).getAs[Boolean]("kept"))
    assert(out(3).getAs[String]("domain") == "bad.org")
  }

  test("substringDedupSpans charges later occurrences, keeps the first") {
    // doc 1 owns the repeated 16-token run; doc 2 repeats it verbatim at
    // offset 0; doc 3 shares no window
    val run = (1 to 16).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, run + " " + (1 to 8).map(i => s"t$i").mkString(" ")),
      (2L, run),
      (3L, (1 to 24).map(i => s"u$i").mkString(" ")),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.substringDedupSpans(df, "doc_id", "text", 16, 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_dup_spans") == 0L) // doc 1 is first everywhere
    assert(out(1).getAs[Long]("n_dup_spans") == 1L) // doc 2's window 0 is owned by doc 1
    assert(out(1).getAs[Long]("first_dup_start") == 0L)
    assert(out(1).getAs[Long]("dup_span_tokens") == 16L)
    assert(out(2).getAs[Long]("n_spans") > 0 && out(2).getAs[Long]("n_dup_spans") == 0L)
    assert(out(3).getAs[Long]("n_spans") == 0L && out(3).isNullAt(
      out(3).fieldIndex("first_dup_start")))
  }

  test("dhashPairs links a noised image copy but not an unrelated image") {
    // integer-valued 16x18 gray matrices: a base scene, a +/-1-noised
    // copy (perceptually identical), and an unrelated scene
    def px(seed: Int, i: Int, j: Int): Double =
      ((seed * 31 + i * 131 + j * 17) * 2654435761L % 256 + 256) % 256
    val base = Seq.tabulate(16, 18)((i, j) => px(1, i, j))
    val noised = Seq.tabulate(16, 18)((i, j) => px(1, i, j) + (i + j) % 3 - 1)
    val other = Seq.tabulate(16, 18)((i, j) => px(9, i, j))
    val df = Seq((1L, base), (2L, noised), (3L, other)).toDF("id", "matrix")
    val pairs = Dedup.dhashPairs(df, "id", "matrix", maxHamming = 6).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("id_a") == 1L && pairs(0).getAs[Long]("id_b") == 2L)
    assert(pairs(0).getAs[Long]("hamming") <= 6L)
  }

  test("videoNearDupClips merges shifted variants, prunes non-keyframes, enforces the vote") {
    // two clip groups, two temporal-shift variants each: 8 frames, two
    // scenes, the cut at frame 4 (clips 1, 3) or 5 (clips 2, 4) — all
    // four land keyframes at 2 and 6 for v=0 / 2 and 6 for v=1 (5>>1=2,
    // 5+(3>>1)=6), so the matching below is content-based regardless
    def series(v: Int) = Seq.tabulate(8)(f => if (f >= 4 + v) 10000.0 else 0.0)
    val clips = Seq((1L, series(0)), (2L, series(1)),
      (3L, series(0)), (4L, series(1))).toDF("clip_id", "series")
    def px(seed: Int, i: Int, j: Int): Double =
      ((seed * 31 + i * 131 + j * 17) * 2654435761L % 256 + 256) % 256
    // scene 0 content is SHARED across the two groups -> exactly one
    // matching keyframe pair between cross-group clips, which must stay
    // below minVotes = 2; scene 1 content is per-group
    def mat(group: Int, scene: Int) =
      Seq.tabulate(8, 9)((i, j) => px(if (scene == 0) 7 else group, i, j))
    // POISON non-keyframe frames: identical flat content on every clip —
    // if the keyframe join failed to prune the frame store, these would
    // pair every clip with every other and merge everything into one
    // cluster
    val flat = Seq.fill(8)(Seq.fill(9)(128.0))
    val frames = (for {
      c <- 1L to 4L
      group = if (c <= 2) 1 else 2
      (idx, m) <- Seq((2L, mat(group, 0)), (6L, mat(group, 1)),
        (0L, flat), (3L, flat), (7L, flat))
    } yield (c, idx, m)).toDF("clip_id", "frame_idx", "matrix")
    val out = Dedup.videoNearDupClips(clips, frames, "clip_id", "series",
        "frame_idx", "matrix", cutThreshold = 5000.0, maxHamming = 6,
        minVotes = 2)
      .orderBy("clip_id").collect()
    assert(out.map(_.getAs[Long]("cluster_id")).toSeq == Seq(1L, 1L, 3L, 3L),
      "expected the two shift-variant groups, unmerged across groups")
    assert(out.map(_.getAs[Boolean]("is_canonical")).toSeq ==
      Seq(true, false, true, false))
    assert(out.forall(_.getAs[Long]("n_dup_neighbors") == 1L))
    assert(out.forall(_.getAs[Long]("max_votes") == 2L),
      "both scenes must vote for the in-group pair")
  }

  test("videoNearDup vote is order-consistent: shared packaging frames " +
    "in scrambled order cannot merge distinct clips") {
    // 8-frame clips, cut at 4 -> keyframes at 2 and 6 (the fixture shape
    // of the neighboring tests)
    val series = Seq.tabulate(8)(f => if (f >= 4) 10000.0 else 0.0)
    def px(seed: Int, i: Int, j: Int): Double =
      ((seed * 31 + i * 131 + j * 17) * 2654435761L % 256 + 256) % 256
    def mat(seed: Int) = Seq.tabulate(8, 9)((i, j) => px(seed, i, j))
    val clips = Seq((1L, series), (2L, series), (3L, series), (4L, series))
      .toDF("clip_id", "series")
    // DECOY pair (1, 2): the same two contents appear in SWAPPED order
    // (clip 1: M1 then M2; clip 2: M2 then M1) — the broadcast-packaging
    // shape (shared intro/outro/slate). Two keyframe pairs match, but no
    // order-consistent chain longer than 1 exists.
    // CONTROL pair (3, 4): the same two contents in the SAME order.
    val frames = Seq(
      (1L, 2L, mat(1)), (1L, 6L, mat(2)),
      (2L, 2L, mat(2)), (2L, 6L, mat(1)),
      (3L, 2L, mat(3)), (3L, 6L, mat(4)),
      (4L, 2L, mat(3)), (4L, 6L, mat(4)))
      .toDF("clip_id", "frame_idx", "matrix")
    val edges = Dedup.videoNearDupEdges(clips, frames, "clip_id", "series",
        "frame_idx", "matrix", cutThreshold = 5000.0, maxHamming = 6,
        minVotes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges == Set((3L, 4L, 2L)),
      "the scrambled-order decoy must NOT vote through; the aligned pair must")
    // the unordered rule WOULD have merged the decoy: both keyframe
    // pairs really do match (verify via the LIS kernel directly)
    import graft.functions.lis_pairs
    val packed = Seq(Tuple1(Seq((2L << 32) | 6L, (6L << 32) | 2L)))
      .toDF("xs")
    assert(packed.select(lis_pairs(sort_array(col("xs"))))
      .collect().head.getLong(0) == 1L)
    val aligned = Seq(Tuple1(Seq((2L << 32) | 2L, (6L << 32) | 6L)))
      .toDF("xs")
    assert(aligned.select(lis_pairs(sort_array(col("xs"))))
      .collect().head.getLong(0) == 2L)
    // kernel pin: duplicates in one coordinate never chain (strict both)
    val dupA = Seq(Tuple1(Seq((2L << 32) | 2L, (2L << 32) | 6L,
      (6L << 32) | 7L))).toDF("xs")
    assert(dupA.select(lis_pairs(sort_array(col("xs"))))
      .collect().head.getLong(0) == 2L)
  }

  test("videoNearDupEdgesDelta equals a full edge rebuild after remove/change/add") {
    def series(v: Int) = Seq.tabulate(8)(f => if (f >= 4 + v) 10000.0 else 0.0)
    def px(seed: Int, i: Int, j: Int): Double =
      ((seed * 31 + i * 131 + j * 17) * 2654435761L % 256 + 256) % 256
    def mat(group: Int, scene: Int, bump: Double = 0.0) =
      Seq.tabulate(8, 9)((i, j) =>
        px(if (scene == 0) 7 else group, i, j) + (if (i == 0 && j == 0) bump else 0.0))
    def frames(rows: Seq[(Long, Int, Double)]) = // (clip, group, bump)
      (for { (c, g, b) <- rows
             (idx, m) <- Seq((2L, mat(g, 0, b)), (6L, mat(g, 1, b))) }
        yield (c, idx, m)).toDF("clip_id", "frame_idx", "matrix")
    val v0c = Seq((1L, series(0)), (2L, series(1)), (3L, series(0)),
      (4L, series(1))).toDF("clip_id", "series")
    val v0f = frames(Seq((1L, 1, 0.0), (2L, 1, 0.0), (3L, 2, 0.0), (4L, 2, 0.0)))
    // v1: clip 4 removed, clip 2 re-encoded (pixel bump flips its
    // fingerprints -> changed), clip 5 added into group 1
    val v1c = Seq((1L, series(0)), (2L, series(1)), (3L, series(0)),
      (5L, series(0))).toDF("clip_id", "series")
    val v1f = frames(Seq((1L, 1, 0.0), (2L, 1, 1.0), (3L, 2, 0.0), (5L, 1, 0.0)))
    import graft.operators.Dedup
    def edges(c: org.apache.spark.sql.DataFrame,
              f: org.apache.spark.sql.DataFrame,
              fresh: Option[org.apache.spark.sql.DataFrame] = None) =
      Dedup.videoNearDupEdges(c, f, "clip_id", "series", "frame_idx",
        "matrix", cutThreshold = 5000.0, maxHamming = 6, minVotes = 2,
        bandBytes = 2, freshClips = fresh)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val prevEdges = edges(v0c, v0f)
    val full = rows(edges(v1c, v1f))
    val delta = rows(Dedup.videoNearDupEdgesDelta(v0c, v0f, prevEdges,
      v1c, v1f, "clip_id", "series", "frame_idx", "matrix",
      cutThreshold = 5000.0, maxHamming = 6, minVotes = 2, bandBytes = 2))
    assert(delta == full,
      "survivors + delta must equal the full edge rebuild of v1")
    // sanity: v1 really exercises all three delta classes
    assert(full.exists(e => e._1 == 1L && e._2 == 5L), "added clip must pair")
    assert(!full.exists(e => e._1 == 4L || e._2 == 4L), "removed clip gone")
  }

  test("videoNearDupEdgesDelta maintains rebuild parity on random refreshes") {
    val rnd = new scala.util.Random(97)
    def series(v: Int) = Seq.tabulate(8)(f => if (f >= 4 + v) 10000.0 else 0.0)
    def px(seed: Int, i: Int, j: Int): Double =
      ((seed * 31 + i * 131 + j * 17) * 2654435761L % 256 + 256) % 256
    def mat(group: Int, scene: Int, bump: Double) =
      Seq.tabulate(8, 9)((i, j) =>
        px(group * 10 + scene, i, j) + (if (i == 1 && j == 2) bump else 0.0))
    // corpus model: clip -> (group, variant, bump); frames derive from it
    type Corpus = Map[Long, (Int, Int, Double)]
    def clipsDf(c: Corpus) = c.toSeq.map { case (id, (_, v, _)) =>
      (id, series(v)) }.toDF("clip_id", "series")
    def framesDf(c: Corpus) = c.toSeq.flatMap { case (id, (g, _, b)) =>
      Seq((id, 2L, mat(g, 0, b)), (id, 6L, mat(g, 1, b))) }
      .toDF("clip_id", "frame_idx", "matrix")
    import graft.operators.Dedup
    def edges(c: Corpus, fresh: Option[Seq[Long]] = None) =
      Dedup.videoNearDupEdges(clipsDf(c), framesDf(c), "clip_id", "series",
        "frame_idx", "matrix", cutThreshold = 5000.0, maxHamming = 6,
        minVotes = 2, bandBytes = 2,
        freshClips = fresh.map(_.toDF("clip_id")))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (trial <- 1 to 2) {
      var v0: Corpus = (1L to 8L).map(id =>
        id -> ((1 + rnd.nextInt(3), rnd.nextInt(2), 0.0))).toMap
      // random refresh: each clip removed (1/5), re-encoded (1/4),
      // shifted variant (1/4), or kept; plus 1-2 added clips
      var v1: Corpus = v0.flatMap { case (id, (g, v, b)) =>
        rnd.nextInt(5) match {
          case 0 => None
          case 1 => Some(id -> ((g, v, b + 1.0)))
          case 2 => Some(id -> ((g, 1 - v, b)))
          case _ => Some(id -> ((g, v, b)))
        }
      }
      (1 to 1 + rnd.nextInt(2)).foreach { i =>
        v1 += (100L + i) -> ((1 + rnd.nextInt(3), rnd.nextInt(2), 0.0))
      }
      val delta = rows(Dedup.videoNearDupEdgesDelta(clipsDf(v0),
        framesDf(v0), edges(v0), clipsDf(v1), framesDf(v1), "clip_id",
        "series", "frame_idx", "matrix", cutThreshold = 5000.0,
        maxHamming = 6, minVotes = 2, bandBytes = 2))
      assert(delta == rows(edges(v1)), s"trial $trial")
    }
  }

  test("dhash_bands nulls malformed matrices and is shape-generic") {
    val ok = Seq.tabulate(32, 36)((i, j) => (i * 7 + j * 13) % 256.0) // 2x scale
    val ragged = Seq(Seq.fill(18)(1.0), Seq.fill(17)(1.0)) ++
      Seq.fill(14)(Seq.fill(18)(2.0))
    val tooSmall = Seq.fill(4)(Seq.fill(18)(1.0))
    val df = Seq((1L, ok), (2L, ragged), (3L, tooSmall)).toDF("id", "matrix")
    val out = df.select(col("id"), dhash_bands(col("matrix")).as("b"))
      .orderBy("id").collect()
    val bands = out(0).getSeq[Long](1)
    assert(bands.length == 8 && bands.forall(v => v >= 0 && v <= 255))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("brute-force top-k ranks an identical vector first") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.1f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = corpus.where(col("vec_id") === 1L)
    val top = Similarity.bruteForceTopK(corpus, q, k = 3)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("cand_id")).toSeq == Seq(3L, 2L, 4L))
  }

  test("multimodal stub features are deterministic and md5-consistent") {
    val df = Seq((1L, "payload-a"), (2L, "payload-b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    // cross-check against the SQL md5_long on the same bytes
    val viaSql = Seq((1L, "payload-a"), (2L, "payload-b")).toDF("doc_id", "text")
      .select(col("doc_id"), md5_long(col("text")).as("h")).orderBy("doc_id").collect()
    feats.zip(viaSql).foreach { case (f, s) =>
      assert(f.getAs[Long]("media_hash") == s.getAs[Long]("h"))
    }
    assert(feats(0).getAs[Long]("n_bytes") == 9L)
  }

  test("sessionize-style window: edge moving avg column matches kernel") {
    val xs = Array(5.0, 1.0, 4.0, 9.0, 2.0, 7.0, 3.0)
    val df = Seq(Tuple1(xs.toSeq)).toDF("s")
    val out = df.select(edge_moving_avg(col("s"), 4)).head.getSeq[Double](0)
    out.zip(EdgeMovingAvg(xs, 4)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("dedupLines keeps only the globally first occurrence of each line") {
    val df = Seq(
      (1L, Seq("alpha", "beta", "alpha")),     // in-doc repeat of alpha
      (2L, Seq("beta", "gamma")),              // beta seen in doc 1
      (3L, Seq("alpha", "beta"))               // everything seen earlier
    ).toDF("doc_id", "lines")
    val out = TextAnalysis.dedupLines(df, "doc_id", "lines")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq == Seq(
      (1L, 2L, "alpha\nbeta"),
      (2L, 1L, "gamma"),
      (3L, 0L, "")))   // fully-deduped doc survives with empty text
  }

  test("dedupLines first-occurrence choice is partition-independent") {
    val df = (1L to 40L).map(i => (i, Seq(s"common-${i % 3}", s"only-$i"))).toDF("doc_id", "lines")
    val a = TextAnalysis.dedupLines(df.repartition(1), "doc_id", "lines")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.dedupLines(df.repartition(13), "doc_id", "lines")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // the three common lines survive only in docs 1, 2, 3
    assert(a.take(3).forall(_.getLong(1) == 2L) && a.drop(3).forall(_.getLong(1) == 1L))
  }

  test("semanticDedup drops the higher id of a within-cell near-dup pair") {
    // two tight clusters; ids 11/12 nearly identical, 21/22 nearly identical
    val vecs = Seq(
      (11L, Seq(1.0f, 0.0f)), (12L, Seq(0.999f, 0.001f)),
      (21L, Seq(0.0f, 1.0f)), (22L, Seq(0.001f, 0.999f)))
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val out = Dedup.semanticDedup(df, "vec_id", "embedding", cents, 0.99)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq((11L, 0L, true), (12L, 0L, false),
                      (21L, 1L, true), (22L, 1L, false)))
  }

  test("bloomSemiJoinPrune never drops a true member") {
    val build = (1L to 50L).map(i => Tuple1(i * 3)).toDF("k")
    val probe = (1L to 300L).map(Tuple1(_)).toDF("p")
    val kept = Sketches.bloomSemiJoinPrune(
      build, col("k").cast("string"), probe, col("p").cast("string"), 2048, 4)
      .select("p").as[Long].collect().toSet
    assert((1L to 50L).map(_ * 3).forall(kept.contains))
  }

  test("cmsFrequencies estimates match exact counts for distinct-cell keys") {
    val values = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val out = Sketches.cmsFrequencies(
      values.map(Tuple1(_)).toDF("v"), col("v"),
      Seq("a", "b", "c", "zzz").map(Tuple1(_)).toDF("q"), col("q"), 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 4 keys in a 4x1024 sketch: no colliding cells (deterministic), so
    // the estimates are exact and the absent key reads zero
    assert(out == Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "zzz" -> 0L))
  }

  test("curate composes quality gate, canonical dedup, lang id and split") {
    val good = "the quick brown fox jumps over the lazy dog " * 3
    val docs = Seq(
      (1L, good),   // en, passes every quality band
      (2L, good),   // exact duplicate -> only the min id survives
      (3L, "zz")    // 1 alnum token: fails length + stopword bands -> 0.5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.curate(docs, "doc_id", "text", minQuality = 0.6).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "en")
    assert(r.getLong(2) == 27L)
    assert(r.getDouble(3) == 1.0)
    assert(Set("train", "validation", "test").contains(r.getString(4)))
  }

  test("zorder_key interleaves bits, masks to bitsPer, propagates nulls") {
    val out = Seq((5L, 0L), (0L, 5L), (3L, 3L), (65536L + 1L, 0L))
      .toDF("a", "b")
      .select(zorder_key(16, col("a"), col("b")).as("z")).as[Long].collect().toSeq
    // 5=101b interleaved into even bits -> 10001b; odd bits for col 2;
    // 65537 masked to 16 bits -> 1
    assert(out == Seq(17L, 34L, 15L, 1L))
    val n = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(zorder_key(16, col("a"), col("b"))).head()
    assert(n.isNullAt(0))
    intercept[IllegalArgumentException] {
      ZOrderKey(Seq.fill(4)(org.apache.spark.sql.catalyst.expressions.Literal(1L)), 16)
    }
  }

  test("invertedIndex shards postings by doc hash with exact df counts") {
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "a b a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.invertedIndex(docs, "doc_id", "text", nShards = 0)
    }
    val rows = TextAnalysis.invertedIndex(docs, "doc_id", "text", nShards = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Long](2), r.getLong(3)))
    // per token: shard postings are disjoint, sorted, and union to the
    // containing docs; df matches the posting length (multiplicity gone)
    val byTok = rows.groupBy(_._1)
    assert(byTok("a").flatMap(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(byTok("b").flatMap(_._3).sorted.toSeq == Seq(1L, 3L))
    rows.foreach { case (_, _, postings, df) =>
      assert(postings == postings.sorted && df == postings.length.toLong)
    }
  }

  test("weightedSample is partition-stable and nested across rates") {
    val docs = (1L to 500L).map(i => (i, "x")).toDF("doc_id", "text")
    def ids(rate: Double, parts: Int = 4) =
      TextAnalysis.weightedSample(docs.repartition(parts), "doc_id", lit(rate))
        .select("doc_id").as[Long].collect().toSet
    val lo = ids(0.3)
    val hi = ids(0.7)
    assert(lo.subsetOf(hi), "higher rate must contain the lower-rate sample")
    assert(ids(0.3, parts = 17) == lo, "sample must not depend on partitioning")
    // md5 is uniform: keep counts land near rate * n
    assert(math.abs(lo.size - 150) < 60 && math.abs(hi.size - 350) < 60)
  }

  test("packingOffsets tiles each bucket's token stream contiguously") {
    val docs = (1L to 100L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packingOffsets(docs, "doc_id", "text", 10, 4).collect()
    assert(out.length == 100)
    out.groupBy(_.getAs[Long]("bucket")).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("start_tok") == cum, "stream must be contiguous")
        val (st, nt) = (r.getAs[Long]("start_tok"), r.getAs[Long]("ntok"))
        assert(r.getAs[Long]("start_block") == st / 10)
        assert(r.getAs[Long]("end_block") == (st + math.max(nt - 1, 0)) / 10)
        cum += nt
      }
    }
  }

  test("ClipOps.fixedBboxes computes the reference square-box math") {
    // one clip, 2 frames, 2 points each: xs in [0,10], ys in [0,4]
    val df = Seq(Tuple1(Seq(
      Seq((0.0, 0.0), (10.0, 2.0)),
      Seq((2.0, 4.0), (8.0, 1.0))))).toDF("raw")
      .select(transform(col("raw"), f =>
        transform(f, p => struct(p("_1").as("x"), p("_2").as("y")))).as("lm"))
    val out = df.select(ClipOps.fixedBboxes(col("lm"), 1.25).as("bb")).head.getSeq[Row](0)
    // left=0,right=10,top=0,bottom=4: size=(10+4)/2*1.1=7.7; radius=int(1.25*7.7/2)=int(4.8125)=4
    // xc=int(5)=5, yc=int(2)=2 -> (1,-2,9,6)
    assert(out.length == 2)
    assert(out.head == Row(1L, -2L, 9L, 6L))
  }

  test("saltedJoin equals the plain join on heavily skewed keys") {
    // 90% of the big side hits ONE key — the salted result multiset must
    // still equal the plain join under any salt width
    val big = spark.range(2000).select(
      when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 7).as("k"),
      col("id").as("v"))
    val small = Seq((0L, "z"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("sk", "name")
    val plain = big.join(small, col("k") === col("sk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (nSalts <- Seq(1, 4, 32)) {
      val salted = SkewJoin.saltedJoin(big, small, col("k"), col("sk"),
          hash(col("v")), nSalts)
        .groupBy("name").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain, s"nSalts=$nSalts")
    }
    // the small side must actually replicate (a Generate/explode node)
    val plan = SkewJoin.saltedJoin(big, small, col("k"), col("sk"), hash(col("v")), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"small side must explode per salt:\n$plan")
  }

  test("normalizedDedup canonicalizes case/punctuation/whitespace variants") {
    val docs = Seq(
      (1L, "The  cat, sat!"), (2L, "the cat sat"), (3L, "THE CAT   SAT."),
      (4L, "a different document"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .withColumn("text", coalesce(col("text"), lit("")))
    val out = TextAnalysis.normalizedDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("canon_id"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(out(1L) == (1L, true))
    assert(out(2L) == (1L, false), "variant must map to the smallest id")
    assert(out(3L) == (1L, false))
    assert(out(4L)._2, "unique doc is its own canonical")
    assert(out(5L)._2, "empty/NULL text forms its own group")
  }

  test("gopherRules sets one fail bit per violated rule") {
    val good = ("good", (("the a of and that is " * 8) + "words more here").trim)
    val tiny = ("tiny", "the of a")                   // too few tokens -> bit 0
    val bullets = ("bul", (1 to 40).map(i => s"- the item of $i and thing").mkString("\n"))
    val noStops = ("nostop", ("zzz qqq www " * 20).trim) // no stopwords -> bit 5
    val out = TextAnalysis.gopherRules(
      Seq(good, tiny, bullets, noStops).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("fail_mask"), r.getAs[Long]("keep"))).toMap
    assert(out("good") == (0L, 1L))
    assert((out("tiny")._1 & 1L) == 1L && out("tiny")._2 == 0L)
    assert((out("bul")._1 & 8L) == 8L, s"bullet bit missing: ${out("bul")}")
    assert((out("nostop")._1 & 32L) == 32L && out("nostop")._2 == 0L)
  }

  test("gopherRules keeps row parity and fails NULL text") {
    val df = Seq(("a", "the a of and that is fine " * 5), ("b", null))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text").collect()
    assert(out.length == 2, "NULL-text row must not vanish")
    val b = out.find(_.getString(0) == "b").get
    assert(b.getAs[Long]("keep") == 0L, "NULL text cannot pass the rules")
  }

  test("rrfFuse sums integer reciprocal-rank contributions across lists") {
    // hand-computed: 1e6/(60+rank) integer-floored per list, summed
    val sparse = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val dense = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(sparse, dense), k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_micro"),
        r.getAs[Long]("n_systems"), r.getAs[Int]("rank"))).toSeq
    val c = (r: Int) => 1000000L / (60L + r)
    // doc 20: both lists (rank2 sparse + rank1 dense) -> top fused score
    assert(out == Seq(
      (20L, c(2) + c(1), 2L, 1),
      (10L, c(1), 1L, 2),
      (40L, c(2), 1L, 3),
      (30L, c(3), 1L, 4)))
  }

  test("rrfFuse breaks fused-score ties by doc_id ascending") {
    // two docs with identical single-list rank -> identical rrf_micro
    val a = Seq((7L, 1)).toDF("doc_id", "rank")
    val b = Seq((3L, 1)).toDF("doc_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(a, b), k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toSeq
    assert(out == Seq((3L, 1), (7L, 2)))
  }

  test("buildDictionary ranks by doc frequency with lexicographic ties") {
    val docs = Seq(
      (1L, "wolf wolf bear lynx"), // wolf df=3 despite repeats per doc
      (2L, "wolf bear hare"),
      (3L, "wolf bear xray"),
      (4L, "ant")).toDF("doc_id", "text") // len<4 filtered out
    val dict = TextAnalysis.buildDictionary(docs, "doc_id", "text",
      topK = 3, minLen = 4)
    // df: wolf=3, bear=3, hare=lynx=xray=1 -> ties broken token asc
    assert(dict == Seq("bear", "wolf", "hare"))
  }

  test("dictTag counts substring hits per dictionary term") {
    val docs = Seq(
      (1L, "Interesting Notes: note the note"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val out = TextAnalysis.dictTag(docs, "doc_id", "text",
      Seq("note", "interesting"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    // lower-cased match: doc1 "notes"+2x"note" -> 3 hits of "note";
    // doc2 "nothing" contains "not" but not "note"
    assert(out == Set((1L, "note", 3L), (1L, "interesting", 1L)))
  }

  test("collocations computes exact lift over a hand-built corpus") {
    // vocab = {aaaa, bbbb, cccc}; aaaa+bbbb co-occur in 2 of 4 docs
    val docs = Seq(
      (1L, "aaaa bbbb"),
      (2L, "aaaa bbbb cccc"),
      (3L, "aaaa cccc"),
      (4L, "dddd")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "doc_id", "text",
      Seq("aaaa", "bbbb", "cccc"), minPairDocs = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // N=4; df: aaaa=3, bbbb=2, cccc=2
    assert(out == Set(
      ("aaaa", "bbbb", 2L, 2L * 4 / (3.0 * 2)),
      ("aaaa", "cccc", 2L, 2L * 4 / (3.0 * 2))))
  }

  test("phraseRankedTopK ranks phrase matches by BM25 of the phrase tf") {
    val docs = Seq(
      (1L, "big data big data big data"), // tf 3, dl 6
      (2L, "big data and more words here"), // tf 1, dl 6
      (3L, "data big"), // reversed: no phrase
      (4L, "nothing relevant at all")).toDF("doc_id", "text")
    val pos = TextAnalysis.buildPositionalIndex(docs, "doc_id", "text",
      nShards = 2)
    val idx = TextAnalysis.buildSearchIndex(docs, "doc_id", "text",
      nShards = 2)
    val out = TextAnalysis.phraseRankedTopK(pos, idx.docmeta,
        Seq("big", "data"), k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_phrase"),
        r.getAs[Long]("rank"))).toSeq
    // same dl, same df -> higher tf ranks first; doc 3/4 never match
    assert(out == Seq((1L, 3L, 1L), (2L, 1L, 2L)))
  }

  test("validate reports exact violation counts per check") {
    import graft.operators.Validate
    import graft.operators.Validate._
    val dirty = Seq(
      (Some(1L), 5.0, "A"), (Some(1L), 200.0, "X"), // dup key, range, accept
      (None, 3.0, "N")) // null key
      .toDF("k", "q", "flag")
    val dim = Seq(1L).toDF("pk")
    val out = Validate.validate(dirty, Seq(
        NotNull("k"), InRange("q", 0, 100), Accepted("flag", Seq("A", "N")),
        Predicate("q_pos", col("q") > 0), Unique(Seq("k")),
        RefIntegrity("k", dim, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("not_null:k") == ((1L, false)))
    assert(out("in_range:q") == ((1L, false)))
    assert(out("accepted:flag") == ((1L, false)))
    assert(out("predicate:q_pos") == ((0L, true)))
    // keys: 1 appears twice (1 extra row), null key groups on its own
    assert(out("unique:k") == ((1L, false)))
    assert(out("ref:k") == ((0L, true)))
  }

  test("validate MonotonicBy counts per-key order regressions, empty-safe") {
    import graft.operators.Validate
    import graft.operators.Validate._
    // key 1: 5, 3 (drop), 7, 2 (drop) -> 2 violations; key 2: rising -> 0
    val df = Seq((1L, 1L, 1L, 5L), (1L, 2L, 2L, 3L), (1L, 3L, 3L, 7L),
      (1L, 4L, 4L, 2L), (2L, 1L, 5L, 1L), (2L, 2L, 6L, 9L))
      .toDF("k", "t", "id", "v")
    val out = Validate.validate(df,
        Seq(MonotonicBy(Seq("k"), "t", "id", "v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("monotonic:v", 2L, false)))
    val empty = spark.range(0).select(col("id").as("k"), col("id").as("t"),
      col("id").as("id2"), col("id").as("v"))
    val eo = Validate.validate(empty,
        Seq(MonotonicBy(Seq("k"), "t", "id2", "v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(eo.toSeq == Seq(("monotonic:v", 0L, true)))
  }

  test("validate folds all row-predicate checks into one aggregation") {
    import graft.operators.Validate
    import graft.operators.Validate._
    val df = spark.range(1000).select(col("id").as("a"),
      (col("id") % 7).as("b"))
    val plan = Validate.validate(df, Seq(
        NotNull("a"), InRange("b", 0, 6), Predicate("p", col("a") >= 0)))
      .queryExecution.executedPlan.toString
    // one scan, one partial/final aggregate pair, no join, no extra scan
    assert("Range \\(0, 1000".r.findAllIn(plan).length == 1,
      s"predicate checks must share one scan:\n$plan")
    assert(!plan.contains("Join"), s"no join for predicate checks:\n$plan")
  }

  test("ppJoin recall equals brute force on random corpora") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(67)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    for (trial <- 1 to 3; t <- Seq(0.4, 0.6)) {
      val docs = (1L to 40L).map { id =>
        (id, Seq.fill(2 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.ppJoin(docs.toDF("doc_id", "text"), "doc_id", "text",
          t, shingleN = 1) // token sets: matches the brute oracle below
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = docs.map { case (id, s) =>
        id -> s.split(" ").toSet
      }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys; if a < b
        j = sets(a).intersect(sets(b)).size.toDouble /
          sets(a).union(sets(b)).size
        if j >= t
      } yield (a, b)).toSet
      assert(got == want, s"trial=$trial t=$t")
    }
  }

  test("containmentJoin recall equals the brute-force directed join") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(83)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    for (trial <- 1 to 3; t <- Seq(0.5, 0.8)) {
      val docs = (1L to 40L).map { id =>
        (id, Seq.fill(2 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.containmentJoin(docs.toDF("doc_id", "text"),
          "doc_id", "text", t, shingleN = 1) // token sets match the oracle
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = docs.map { case (id, s) => id -> s.split(" ").toSet }.toMap
      // DIRECTED pairs: a's coverage by b — both orders can qualify
      val want = (for {
        a <- sets.keys; b <- sets.keys; if a != b
        c = sets(a).intersect(sets(b)).size.toDouble / sets(a).size
        if c >= t
      } yield (a, b)).toSet
      assert(got == want, s"trial=$trial t=$t")
    }
  }

  test("decayedCounts weighs events by exact powers of two inside the horizon") {
    import graft.operators.Stats
    // key A: events at ages 0, 1, 3 (relative to global max day 10) ->
    // 2^4 + 2^3 + 2^1; key B: one event past the 4-day horizon -> 0
    // weight but still counted
    val df = Seq(("a", 10L), ("a", 9L), ("a", 7L), ("b", 2L))
      .toDF("k", "day")
    val out = Stats.decayedCounts(df, "k", "day", horizonDays = 4)
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("n_events") == 3L)
    assert(out(0).getAs[Long]("decayed") == 16L + 8L + 2L)
    assert(out(0).getAs[Double]("score") == 26.0 / 16.0)
    assert(out(1).getAs[Long]("n_events") == 1L &&
      out(1).getAs[Long]("decayed") == 0L &&
      out(1).getAs[Double]("score") == 0.0)
    // empty input: lazy-safe, no rows (the trailingActives discipline)
    val empty = spark.range(0).select(col("id").as("k"), col("id").as("day"))
    assert(Stats.decayedCounts(empty, "k", "day", 7).count() == 0L)
  }

  test("ewma_shift matches the reference recurrence, flooring negatives") {
    val series = Seq(100L, 0L, 0L, 0L, 50L, -100L, 7L)
    def ref(xs: Seq[Long], k: Int): Seq[Long] =
      xs.tail.scanLeft(xs.head)((s, x) => s + Math.floorDiv(x - s, 1L << k))
    for (k <- Seq(0, 1, 3)) {
      val out = Seq(Tuple1(series)).toDF("xs")
        .select(graft.functions.ewma_shift(col("xs"), k).as("s"))
        .collect().head.getSeq[Long](0).toSeq
      assert(out == ref(series, k), s"k=$k")
    }
    // floor, not truncation: x=-1 below s=0 must move the baseline DOWN
    val neg = Seq(Tuple1(Seq(0L, -1L))).toDF("xs")
      .select(graft.functions.ewma_shift(col("xs"), 3).as("s"))
      .collect().head.getSeq[Long](0).toSeq
    assert(neg == Seq(0L, -1L), "floor((-1-0)/8) must be -1, not 0")
  }

  test("long-array kernels return SQL NULL on null elements instead of " +
    "reading garbage (the public-API containsNull contract)") {
    import graft.functions.{ewma_shift, inversion_count, containment_threshold}
    // containsNull = true arrays with an actual null slot: every kernel
    // that reads raw long elements must answer NULL, never a value
    val dirty = Seq(Tuple1(Seq(Some(3L), None, Some(1L))))
      .toDF("xs")
    assert(dirty.select(inversion_count(col("xs"))).collect().head.isNullAt(0))
    assert(dirty.select(ewma_shift(col("xs"), 2)).collect().head.isNullAt(0))
    val pair = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
    assert(pair.select(containment_threshold(col("a"), col("b"), 0.1))
      .collect().head.isNullAt(0))
    // and clean containsNull=true arrays still compute normally
    val clean = Seq(Tuple1(Seq(Some(3L), Some(2L), Some(1L)))).toDF("xs")
    assert(clean.select(inversion_count(col("xs")))
      .collect().head.getLong(0) == 3L)
  }

  test("ppJoinAgainst equals the fresh-touching slice of the full ppJoin") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(59)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def text() = Seq.fill(4 + rnd.nextInt(6))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpus = (1L to 25L).map(i => (i, text()))
    val fresh = (26L to 34L).map(i => (i, text()))
    def prs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = prs(Dedup.ppJoinAgainst(fresh.toDF("doc_id", "text"),
      corpus.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5,
      shingleN = 2))
    val freshIds = fresh.map(_._1).toSet
    val want = prs(Dedup.ppJoin((corpus ++ fresh).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5, shingleN = 2))
      .filter(p => freshIds(p._1) || freshIds(p._2))
    assert(got == want)
  }

  test("ppJoinDelta maintains full-rebuild parity on random re-crawls") {
    import graft.operators.{Dedup, Snapshot}
    val rnd = new scala.util.Random(71)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def text() = Seq.fill(4 + rnd.nextInt(6))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (trial <- 1 to 2) {
      val v0 = (1L to 30L).map(i => (i, text()))
      val v1 = v0.filter(_ => rnd.nextInt(5) != 0)
        .map { case (id, t) =>
          if (rnd.nextInt(3) == 0) (id, text()) else (id, t) } ++
        (31L to 36L).map(i => (i, text()))
      val t = 0.5
      val full = Dedup.ppJoin(v1.toDF("doc_id", "text"), "doc_id", "text",
          t, shingleN = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val prev = Dedup.ppJoin(v0.toDF("doc_id", "text"), "doc_id", "text",
        t, shingleN = 2)
      val unchanged = Snapshot.delta(v0.toDF("doc_id", "text"),
          v1.toDF("doc_id", "text"), "doc_id", "text")
        .where(col("status") === "unchanged").select(col("doc_id"))
      val survivors = prev
        .join(unchanged.withColumnRenamed("doc_id", "id_a"), Seq("id_a"),
          "left_semi")
        .join(unchanged.withColumnRenamed("doc_id", "id_b"), Seq("id_b"),
          "left_semi")
        .select(col("id_a"), col("id_b"), col("jaccard"))
      val delta = Dedup.ppJoinDelta(v0.toDF("doc_id", "text"),
          v1.toDF("doc_id", "text"), "doc_id", "text", t, shingleN = 2)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      val got = survivors.unionByName(delta)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == full, s"trial $trial")
    }
  }

  test("scd2 history reconstructs a full validity timeline") {
    import graft.operators.Snapshot
    // doc 1: unchanged across all 3; doc 2: edited at v1; doc 3:
    // removed at v1, re-added at v2 with old content; doc 4: added v1
    val v0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v1 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val h = Snapshot.scdApply(
      Snapshot.scdApply(Snapshot.scdInit(v0, "doc_id", "text", 0L),
        v1, "doc_id", "text", 1L),
      v2, "doc_id", "text", 2L)
    val rows = h.collect().map(r => (r.getLong(0),
      r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows == Set(
      (1L, 0L, -1L),          // open since v0
      (2L, 0L, 1L), (2L, 1L, -1L), // closed at edit, reopened
      (3L, 0L, 1L), (3L, 2L, -1L), // closed at removal, re-added at v2
      (4L, 1L, -1L)))         // added at v1, still open
    // as-of v0 returns exactly v0's keys
    val asOf0 = h.where(col("valid_from") <= 0 &&
      (col("valid_to").isNull || col("valid_to") > 0))
      .select("doc_id").as[Long].collect().toSet
    assert(asOf0 == Set(1L, 2L, 3L))
  }

  test("zipfSlope fits the micro-log rank-frequency line exactly, " +
    "hits -1 on a planted Zipfian corpus, 0 on flat counts, and " +
    "drops unfittable groups") {
    // planted exact power law: token w_r appears round(1000/r) times
    // -> the log-log fit over the quantized points lands near -1
    val zipfText = (1 to 30).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w$r")).mkString(" ")
    // flat spectrum: every token appears exactly 4 times -> slope 0
    val flatText = (1 to 20).flatMap(r => Seq.fill(4)(s"t$r")).mkString(" ")
    val df = Seq(("zipf", zipfText), ("flat", flatText),
      ("tiny", "solo")).toDF("source", "text")
    val out = TextAnalysis.zipfSlope(df, "source", "text", 100)
      .collect().map(r => r.getString(0) -> r).toMap
    // brute-force replay for the zipf group: counts, (cnt desc, token
    // desc) ranks, micro-log OLS
    val counts = zipfText.split(" ").groupBy(identity).view
      .mapValues(_.length.toLong).toSeq
    val ranked = counts.sortBy { case (tok, c) => (-c, tok) }(
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
      .zipWithIndex.map { case ((_, c), i) => (i + 1L, c) }
    def lnq(v: Long): Long =
      BigDecimal(math.log(v.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val pts = ranked.map { case (r, c) => (lnq(r), lnq(c)) }
    val n = pts.size.toLong
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val slope = (BigInt(n) * sxy - sx * sy).toDouble /
      (BigInt(n) * sxx - sx * sx).toDouble
    assert(out("zipf").getLong(1) == n)
    assert(out("zipf").getDouble(2) == slope, "exact OLS replay")
    assert(slope < -0.9 && slope > -1.1,
      s"planted Zipf corpus should fit near -1, got $slope")
    assert(out("flat").getDouble(2) == 0.0,
      "flat spectrum fits slope 0 exactly")
    // a single-token group has zero x-variance -> no fit -> dropped
    assert(!out.contains("tiny"))
  }

  test("tokenBurstiness equals the brute-force zero-inclusive VMR, " +
    "uniform spread gives 0, a bursty token overdisperses") {
    // 4 docs: "a" once in every doc (uniform -> VMR 0 exactly);
    // "b" four times in one doc (bursty); "c" once in two docs
    val df = Seq(
      (1L, "a b b b b"), (2L, "a c"), (3L, "a c"), (4L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenBurstiness(df, "doc_id", "text", 10)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    def vmr(cf: Long, m2: Long, n: Long): Double =
      (BigInt(n) * m2 - BigInt(cf) * cf).toDouble /
        (BigInt(n) * cf).toDouble
    assert(out("a") == ((4L, 4L, 4L, vmr(4, 4, 4))))
    assert(out("a")._4 == 0.0, "uniform token has zero variance")
    assert(out("b") == ((4L, 1L, 4L, vmr(4, 16, 4))))
    assert(out("b")._4 == 3.0, "4-in-1-doc over 4 docs: VMR 3")
    assert(out("c") == ((2L, 2L, 4L, vmr(2, 2, 4))))
    assert(out("c")._4 == 0.5, "1-in-2-of-4 docs: VMR 1/2")
    // top-k cut respects (cf desc, token desc): k = 1 keeps only "a"
    // (cf 4 ties with "b", token desc prefers... "b" > "a") -> "b"
    val k1 = TextAnalysis.tokenBurstiness(df, "doc_id", "text", 1)
      .collect().map(_.getString(0)).toSeq
    assert(k1 == Seq("b"), s"tie at cf=4 breaks token-desc, got $k1")
  }

  test("lexicalDiversity counts tokens/types/hapax exactly and " +
    "matches brute force on random corpora") {
    val df = Seq(
      (1L, "a", "the cat sat on the mat"),   // the x2 -> 6 tok, 5 types, 4 hapax
      (2L, "a", ""),                          // no tokens
      (3L, "b", "x x x")                      // 3 tok, 1 type, 0 hapax
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.lexicalDiversity(df, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out("a") == ((6L, 5L, 4L, 5.0 / 6.0, 4.0 / 5.0)))
    assert(out("b") == ((3L, 1L, 0L, 1.0 / 3.0, 0.0)))
    // random property: brute-force token maps per group
    val rnd = new scala.util.Random(139)
    val corpus = Seq.tabulate(60)(i => (i.toLong, s"s${i % 4}",
      Seq.fill(1 + rnd.nextInt(12))("w" + rnd.nextInt(8)).mkString(" ")))
    val got = TextAnalysis.lexicalDiversity(
        corpus.toDF("doc_id", "source", "text"), "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    corpus.groupBy(_._2).foreach { case (src, g) =>
      val toks = g.flatMap(_._3.split("\\s+").filter(_.nonEmpty))
      val counts = toks.groupBy(identity).map { case (_, v) => v.size }
      assert(got(src) == ((toks.size.toLong, counts.size.toLong,
        counts.count(_ == 1).toLong)), s"source=$src")
    }
  }

  test("distinctiveTerms matches the brute-force chi-squared over " +
    "token contingency tables") {
    val rnd = new scala.util.Random(163)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    val corpus = Seq.tabulate(50)(i => (i.toLong, s"s${i % 3}",
      Seq.fill(5 + rnd.nextInt(10))(
        // skew: source s0 over-uses "alpha"
        if (i % 3 == 0 && rnd.nextInt(3) == 0) "alpha"
        else words(rnd.nextInt(words.size))).mkString(" ")))
    val df = corpus.toDF("doc_id", "source", "text")
    val got = TextAnalysis.distinctiveTerms(df, "source", "text",
        minCount = 1L, minChi2 = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // brute force
    val toks = corpus.flatMap { case (_, s, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(s -> _) }
    val n = toks.size.toLong
    val cells = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tt = toks.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val gt = toks.groupBy(_._1).map { case (s, v) => s -> v.size.toLong }
    var checked = 0
    cells.foreach { case ((s, t), a) =>
      val (ad, bd, cd, dd) = (a.toDouble, (tt(t) - a).toDouble,
        (gt(s) - a).toDouble, (n - tt(t) - gt(s) + a).toDouble)
      val diff = ad * dd - bd * cd
      if (diff > 0) {
        val chi2 = n.toDouble * diff * diff /
          ((ad + bd) * (cd + dd) * (ad + cd) * (bd + dd))
        assert(got((s, t)) == ((a, chi2)), s"($s,$t)")
        checked += 1
      } else assert(!got.contains((s, t)), s"($s,$t) not positive")
    }
    assert(checked > 0 && got.size == checked)
    // the planted skew surfaces: alpha is s0's top distinctive term
    val s0 = got.collect { case ((s, t), (_, chi2)) if s == "s0" => t -> chi2 }
    assert(s0.nonEmpty && s0.maxBy(_._2)._1 == "alpha")
  }

  test("kwic serves boundary-clamped contexts from the positional index") {
    val docs = Seq(
      (1L, "data at start and data at end data"),
      (2L, "no keyword here"),
      (3L, "one data two")).toDF("doc_id", "text")
    val idx = TextAnalysis.buildPositionalIndex(docs, "doc_id", "text",
      nShards = 2)
    val out = TextAnalysis.kwic(idx, docs, "doc_id", "text",
        term = "data", window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getString(4)))).toMap
    assert(out == Map(
      (1L, 0L) -> (("", "data", "at start")),     // left clamps empty
      (1L, 4L) -> (("start and", "data", "at end")),
      (1L, 7L) -> (("at end", "data", "")),       // right clamps empty
      (3L, 1L) -> (("one", "data", "two"))))      // short both sides
  }

  test("loudnessStats computes exact peak and RMS over cents series") {
    import graft.operators.Multimodal
    val df = Seq(
      (1L, Seq(3L, -4L, 0L)), // peak 4, rms sqrt(25/3)
      (2L, Seq.empty[Long])   // empty clip drops
    ).toDF("id", "series")
    val out = Multimodal.loudnessStats(df, "id", "series").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == math.sqrt(25.0 / 3.0))
  }

  test("embeddingDimProfile: exact per-dim stats, collapsed/dead dims " +
    "and null elements surface instead of poisoning the sums") {
    // dim0 healthy, dim1 collapsed (constant non-zero), dim2 dead
    // (all zero), dim3 carries a null element
    val vecs: Seq[Seq[java.lang.Float]] = Seq(
      Seq[java.lang.Float](1.0f, 0.5f, 0.0f, 2.0f),
      Seq[java.lang.Float](2.0f, 0.5f, 0.0f, null),
      Seq[java.lang.Float](3.0f, 0.5f, 0.0f, 4.0f))
    val df = vecs.toDF("embedding")
    val out = Similarity.embeddingDimProfile(df, "embedding", scale = 10L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // dim0: q = 10, 20, 30 (deci-quantized) -> n=3; mean/variance are
    // DESCALED to raw units: mean = Σq/(n·scale), var = (nΣq²−(Σq)²)/
    // (n·scale)²
    val d0 = out(0L)
    assert(d0.getLong(1) == 3 && d0.getLong(2) == 0 && d0.getLong(3) == 0)
    assert(d0.getLong(4) == 10L && d0.getLong(5) == 30L)
    assert(d0.getDouble(6) == 60.0 / 30.0)
    assert(d0.getDouble(7) == (3.0 * 1400.0 - 3600.0) / 900.0)
    // dim1 collapsed: variance exactly 0, n_zero 0
    val d1 = out(1L)
    assert(d1.getDouble(7) == 0.0 && d1.getLong(3) == 0)
    // dim2 dead: all-zero -> n_zero == n, mean 0, variance 0
    val d2 = out(2L)
    assert(d2.getLong(3) == 3 && d2.getDouble(6) == 0.0 &&
      d2.getDouble(7) == 0.0)
    // dim3: the null element is COUNTED (n_null) and excluded from n
    // and every statistic
    val d3 = out(3L)
    assert(d3.getLong(1) == 2 && d3.getLong(2) == 1)
    assert(d3.getLong(4) == 20L && d3.getLong(5) == 40L)
    assert(d3.getDouble(6) == 60.0 / 20.0)
    // a null VECTOR drops entirely at the explode
    val withNullVec = (vecs :+ null.asInstanceOf[Seq[java.lang.Float]])
      .toDF("embedding")
    val out2 = Similarity.embeddingDimProfile(withNullVec, "embedding", 10L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out2(0L).getLong(1) == 3)
  }

  test("pairRules: brute-force parity, multi-quantity lines collapse, " +
    "pathological baskets fail loudly") {
    import graft.operators.Assoc
    val rnd = new scala.util.Random(82)
    val rows = (1 to 120).flatMap { b =>
      Seq.fill(2 + rnd.nextInt(4))((b.toLong, s"i${rnd.nextInt(12)}"))
    }
    val out = Assoc.pairRules(rows.toDF("b", "i"), "b", "i", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // brute force over distinct (basket, item)
    val baskets = rows.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val isup = rows.distinct.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet.size.toLong).toMap
    val pairs = baskets.values.flatMap { items =>
      items.toSeq.sorted.combinations(2).map(p => (p(0), p(1)))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    assert(out.keySet == pairs.keySet.map { case (a, b) => (a, b) })
    pairs.foreach { case ((a, b), sab) =>
      val r = out((a, b))
      assert(r.getLong(2) == sab)
      assert(r.getLong(3) == isup(a) && r.getLong(4) == isup(b))
      assert(r.getDouble(5) == sab.toDouble / isup(a).toDouble)
      assert(r.getDouble(6) == sab.toDouble / isup(b).toDouble)
      assert(r.getDouble(7) ==
        (n * sab).toDouble / (isup(a) * isup(b)).toDouble)
    }
    // a basket holding an item twice counts ONE co-occurrence
    val dup = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("b", "i")
    val dr = graft.operators.Assoc.pairRules(dup, "b", "i", 2L)
      .collect().head
    assert(dr.getLong(2) == 2L && dr.getDouble(7) == 1.0)
    // the per-basket fan-out bound is CHECKED before the pair join
    val wide = (1 to 300).map(i => (1L, s"i$i"))
    val e = intercept[IllegalArgumentException] {
      Assoc.pairRules(wide.toDF("b", "i"), "b", "i", 1L,
        maxItemsPerBasket = 100L)
    }
    assert(e.getMessage.contains("pairRules"))
  }

  test("centroidDrift: identical snapshots give cosine 1, orthogonal " +
    "slices 0, opposite slices -1, exact sums verified") {
    import graft.operators.Similarity
    def df(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("k", "embedding")
    // identical snapshots -> cos exactly 1.0 (dot == nx == ny)
    val a = df(Seq((1L, Seq(0.5f, -0.25f, 0.125f)),
      (1L, Seq(0.1f, 0.2f, 0.3f))))
    val same = Similarity.centroidDrift(a, a, "k", "embedding")
      .collect().head
    assert(same.getLong(1) == 2 && same.getLong(2) == 2)
    // dot == nx == ny exactly, but sqrt(n)*sqrt(n) != n in IEEE —
    // last-ulp only (both engines compute the identical value)
    assert(math.abs(same.getDouble(4) - 1.0) < 1e-12)
    // orthogonal centroids -> 0; opposite -> -1
    val x = df(Seq((1L, Seq(1.0f, 0.0f))))
    val y = df(Seq((1L, Seq(0.0f, 1.0f))))
    assert(Similarity.centroidDrift(x, y, "k", "embedding")
      .collect().head.getDouble(4) == 0.0)
    val negx = df(Seq((1L, Seq(-1.0f, 0.0f))))
    assert(Similarity.centroidDrift(x, negx, "k", "embedding")
      .collect().head.getDouble(4) == -1.0)
    // exact quantized dot: [0.5, 0.25] x 2 rows vs [1.0, -0.5]
    val p = df(Seq((1L, Seq(0.5f, 0.25f)), (1L, Seq(0.5f, 0.25f))))
    val q = df(Seq((1L, Seq(1.0f, -0.5f))))
    val r = Similarity.centroidDrift(p, q, "k", "embedding")
      .collect().head
    // sums: a = (1e6, 5e5); b = (1e6, -5e5); dot = 1e12 - 2.5e11
    assert(r.getDouble(3) == 7.5e11)
    // a zero-norm side -> NaN, not a throw
    val z = df(Seq((1L, Seq(0.0f, 0.0f))))
    assert(Similarity.centroidDrift(x, z, "k", "embedding")
      .collect().head.getDouble(4).isNaN)
    // keys missing from one side drop
    val twoKeys = df(Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))))
    assert(Similarity.centroidDrift(twoKeys, x, "k", "embedding")
      .count() == 1L)
  }

  test("goldenRecords: latest non-null wins per attribute " +
    "independently, all-null attributes stay null") {
    import graft.operators.Snapshot
    // cluster 1: the newest row (o=4) has a null name but a fresh
    // email; the name must survive from the OLDER row 3 — per-attr
    // independence is the whole point of survivorship
    val rows = Seq(
      (1L, 1L, Some("alice"), Some("a@old")),
      (1L, 3L, Some("alicia"), None),
      (1L, 4L, None, Some("a@new")),
      (2L, 1L, None, None),
      (2L, 2L, Some("bob"), None)).map { case (c, o, nm, em) =>
      (c, o, nm.orNull, em.orNull)
    }
    val out = Snapshot.goldenRecords(rows.toDF("c", "o", "name", "email"),
        "c", "o", Seq("o"), Seq("name", "email"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val c1 = out(1L)
    assert(c1.getLong(1) == 3 && c1.getLong(2) == 1L)
    assert(c1.getString(3) == "alicia" && c1.getString(4) == "a@new")
    val c2 = out(2L)
    assert(c2.getString(3) == "bob" && c2.isNullAt(4),
      "an attribute with no non-null source must stay null")
  }

  test("pairRulesDelta == full rebuild on random append-only splits, " +
    "including pairs that cross minSupport only with the delta") {
    import graft.operators.Assoc
    val rnd = new scala.util.Random(85)
    (1 to 3).foreach { trial =>
      val rows = (1 to 90).flatMap { b =>
        Seq.fill(2 + rnd.nextInt(4))((b.toLong, s"i${rnd.nextInt(10)}"))
      }
      val df = rows.toDF("b", "i")
      val cut = 30 + rnd.nextInt(30)
      val hist = df.where(col("b") <= cut)
      val fresh = df.where(col("b") > cut)
      val full = Assoc.pairRules(df, "b", "i", minSupport = 3L)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(7))).toMap
      val delta = Assoc.pairRulesDelta(
          Assoc.itemSupports(hist, "b", "i"),
          Assoc.pairSupports(hist, "b", "i"),
          hist.select("b").distinct().count(),
          fresh, "b", "i", minSupport = 3L)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(7))).toMap
      assert(delta == full, s"trial=$trial delta != rebuild")
    }
  }

  test("neighborCosineProfile: hand cosines, bin edges clamp, " +
    "single-vector keys drop") {
    import graft.operators.Similarity
    val rows = Seq(
      (1, 1L, Seq(1.0f, 0.0f)), (1, 2L, Seq(1.0f, 0.0f)),   // cos 1.0
      (1, 3L, Seq(-1.0f, 0.0f)),                            // cos -1.0
      (2, 4L, Seq(1.0f, 0.0f)), (2, 5L, Seq(1.0f, 1.0f)),   // cos .7071
      (3, 6L, Seq(1.0f, 0.0f)))                             // alone: drop
    val got = Similarity.neighborCosineProfile(
        rows.toDF("label", "vec_id", "embedding"),
        "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // key 1: pair(1,2) cos 1.0 -> micro 1e6 -> bin (2e6 div 2e5)=10
    // clamped to 9; pair(2,3) cos -1.0 -> micro -1e6 -> bin 0
    assert(got((1, 9L)) == ((800000L, 1L, 2L, 0L)))
    assert(got((1, 0L)) == ((-1000000L, 1L, 2L, 0L)))
    // key 2: cos = 1/sqrt(2) -> micro 707107 -> bin 8; mean = itself
    assert(got((2, 8L)) == ((600000L, 1L, 1L, 707107L)))
    assert(!got.keySet.exists(_._1 == 3), "single-vector key must drop")
  }

  test("collocationNpmi: hand values, the every-doc pair hits the " +
    "npmi=1 convention, and rare pairs rank below tight pairs") {
    import graft.operators.TextAnalysis
    // 6 docs; (alpha, beta) always together in all 6 -> pmi = 0 AND
    // -ln p(a,b) = 0: the npmi = 1 convention branch. (gamma, delta):
    // df 3 each, together twice of N = 6 -> lift 4/3 -> 0 < npmi < 1
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma filler"),
      (4L, "alpha beta delta filler"),
      (5L, "alpha beta filler"),
      (6L, "alpha beta filler")).toDF("doc_id", "text")
    val vocab = Seq("alpha", "beta", "gamma", "delta", "filler")
    val got = TextAnalysis.collocationNpmi(docs, "doc_id", "text", vocab,
        minPairDocs = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val ab = got(("alpha", "beta"))
    assert(ab._1 == 6L && ab._2 == 1.0 && ab._3 == 0L && ab._4 == 1.0,
      s"every-doc pair: $ab")
    val gd = got(("delta", "gamma"))
    assert(gd._1 == 2L && gd._4 > 0.0 && gd._4 < 1.0, s"tight pair: $gd")
    // exact hand value: pmi = ln(2·6/(3·3)), den = -ln(2/6)
    val pmiQ = BigDecimal(math.log(2.0 * 6.0 / (3.0 * 3.0)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val denQ = -BigDecimal(math.log(2.0 / 6.0) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(gd._3 == pmiQ && gd._4 == pmiQ.toDouble / denQ.toDouble)
    // anti-correlated pairs land negative: filler never meets gamma
    // in docs 1-2 but shares 3; check it scores below the tight pair
    val gf = got(("filler", "gamma"))
    assert(gf._4 < gd._4, s"anti pair must rank below: $gf vs $gd")
  }

  test("stupidBackoffPerplexity matches a brute-force backoff reference " +
    "on random corpora and fires every backoff depth") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(97)
    (1 to 3).foreach { trial =>
      val order = 2 + rnd.nextInt(3) // 2..4
      val vocab = Vector("a", "b", "c", "d", "e")
      val docs = (0L until 24L).map { id =>
        val n = rnd.nextInt(9) // includes empty docs
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = TextAnalysis.stupidBackoffPerplexity(df, "doc_id", "text",
          col("doc_id") % 3 =!= 0L, order, thresholdMicro = 2000000L)
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getBoolean(5))).toMap
      // brute-force: literal Brants et al. recursion per position
      val train = docs.filter(_._1 % 3 != 0)
        .map(_._2.split("\\s+").filter(_.nonEmpty).toSeq)
      val counts = scala.collection.mutable.Map.empty[String, Long]
      train.foreach { tk =>
        (1 to order).foreach { k =>
          tk.sliding(k).filter(_.size == k)
            .foreach(g => counts.update(g.mkString(" "),
              counts.getOrElse(g.mkString(" "), 0L) + 1L))
        }
      }
      val nTrain = train.map(_.size.toLong).sum
      val vTrain = train.flatten.distinct.size.toLong
      val pen = Iterator.iterate(1.0)(_ * 0.4).take(order).toArray
      var backoffDepths = Set.empty[Int]
      def nllOf(tk: Seq[String], i: Int): Long = {
        val L = math.min(i + 1, order)
        val key = tk.slice(i - L + 1, i + 1)
        val hit = (L to 2 by -1).iterator.flatMap { k =>
          val g = key.takeRight(k)
          counts.get(g.mkString(" ")).map { c =>
            (c.toDouble / counts(g.dropRight(1).mkString(" ")).toDouble,
              L - k)
          }.iterator
        }.nextOption()
        val (ratio, j) = hit.getOrElse(
          ((counts.getOrElse(key.last, 0L) + 1L).toDouble /
            (nTrain + vTrain).toDouble, L - 1))
        backoffDepths += j
        val q = BigDecimal(math.log(ratio * pen(j)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        -q
      }
      docs.foreach { case (id, text) =>
        val tk = text.split("\\s+").filter(_.nonEmpty).toSeq
        val nll = tk.indices.map(i => nllOf(tk, i))
        val sum = nll.sum
        val avg = if (tk.nonEmpty) sum / tk.size else 0L
        val want = (id % 3 != 0L, tk.size.toLong, sum, avg,
          tk.nonEmpty && avg <= 2000000L)
        assert(got(id) == want,
          s"trial=$trial order=$order doc=$id: ${got(id)} != $want")
      }
      // held-out docs must exercise real backoff, not just the ramp
      assert(backoffDepths.exists(_ >= 1),
        s"trial=$trial: no backoff step ever fired — fixture too tame")
    }
  }

  test("readabilityProfile: hand-counted words/sentences/syllables, " +
    "vowel-less words floor at one syllable, empty text rejected") {
    val docs = Seq(
      (1L, "the quick brown fox jumps. it runs far! really?"),
      (2L, "tsk tsk hmm"), // three vowel-less words -> 3 syllables, 1 sent
      (3L, "beautiful analysis over there")).toDF("id", "text")
    val got = TextAnalysis.readabilityProfile(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // doc 1: 9 words, 3 sentences; syllables: the=1 quick=2(ui,i? u-i is
    // one group 'ui'; qu-i-ck: groups 'ui' -> 1... count per vowel-run:
    // the(1) quick(ui=1) brown(o=1) fox(1) jumps.(u=1) it(1) runs(u=1)
    // far!(1) really?(ea=1,y=1 -> 2) = 10
    assert(got(1L)._1 == 9L && got(1L)._2 == 3L && got(1L)._3 == 10L)
    assert(got(2L) == ((3L, 1L, 3L,
      (39.0 * 9 + 1180 * 3 - 1559 * 3) / (100.0 * 3),
      (206835.0 * 3 - 1015 * 9 - 84600 * 3) / (1000.0 * 3))))
    // doc 3: beau-ti-ful? groups: eau=1,i=1,u=1 -> 3; analysis a=1,a=1,y=1,
    // i=1 -> 4; over o=1,e=1 -> 2; there e=1,e=1 -> 2 => 11
    assert(got(3L)._1 == 4L && got(3L)._2 == 1L && got(3L)._3 == 11L)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.readabilityProfile(
        Seq((1L, "ok"), (2L, "  ")).toDF("id", "text"), "id", "text")
    }
    assert(e.getMessage.contains("NULL/empty"))
  }

  test("stripBoilerplate: link-dense lines drop, the exact-half boundary " +
    "keeps, tags inside anchors strip, blank-after-strip lines drop") {
    val html =
      "<h1>Title Here</h1>\n" +                          // kept
      "<div><a href=\"/x\">all links</a></div>\n" +      // 100% -> drop
      "body text with <a href=\"/y\">a link</a> and more words\n" + // kept
      "half <a>half</a>\n" +    // text="half half" 9, link 4, 8<=9 keep
      "<br/> <hr>\n" +                                   // empty -> drop
      // anchor content "bold link only" strips to 14 of 21 visible
      // chars (tags INSIDE the anchor strip too) -> 67% link -> drop
      "<p>nested <a href=\"/z\"><b>bold link</b> only</a></p>"
    val got = TextAnalysis.stripBoilerplate(
      Seq((7L, html)).toDF("id", "html"), "id", "html").collect().head
    assert(got.getLong(1) == 6L, "n_lines")
    assert(got.getLong(2) == 3L, "n_kept")
    assert(got.getString(4) == "Title Here " +
      "body text with a link and more words half half")
    assert(got.getLong(3) == got.getString(4).length.toLong)
  }

  test("aspectBucketAssign: brute rational argmin parity, ties take the " +
    "earlier bucket, bad dimensions rejected") {
    val rnd = new scala.util.Random(61)
    val dims = Seq.fill(300)((rnd.nextInt(2000) + 1L).toLong ->
      (rnd.nextInt(2000) + 1L).toLong) ++
      Seq((1024L, 1024L), (1536L, 640L), (640L, 1536L))
    val df = dims.zipWithIndex
      .map { case ((w, h), i) => (i.toLong, w, h) }.toDF("id", "w", "h")
    val got = Multimodal.aspectBucketAssign(df, "w", "h")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      // brute: min over buckets of |w/h - bw/bh| compared as exact
      // rationals |w*bh - h*bw| / bh (h cancels), first bucket on ties
      val best = Multimodal.AspectBuckets.minBy { case (bw, bh) =>
        (BigInt((w * bh - h * bw).abs) * Multimodal.AspectBuckets
          .map(b => BigInt(b._2)).product / bh,
          Multimodal.AspectBuckets.indexOf((bw, bh)))
      }
      assert(got(i.toLong) == best, s"($w, $h)")
    }
    // a (7, 7) square: exact 0 cost on the square bucket
    assert(got(300L) == ((1024L, 1024L)))
    val e = intercept[IllegalArgumentException] {
      Multimodal.aspectBucketAssign(
        Seq((1L, 0L, 5L)).toDF("id", "w", "h"), "w", "h")
    }
    assert(e.getMessage.contains("non-positive"))
  }

  test("cdc_chunks equals the brute cut walk; chunk identity survives a " +
    "prefix edit; cdcDedupProfile counts duplicate mass exactly") {
    import graft.functions.TextKernels
    val rnd = new scala.util.Random(68)
    val alpha = "abcdefgh "
    def mk(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val texts = Seq.fill(20)(mk(200 + rnd.nextInt(200)))
    val (w, m) = (8, 16L)
    def brute(text: String): Seq[(Long, Long, Long)] = {
      val cutPts = (w to text.length).filter(i =>
        java.lang.Math.floorMod(
          TextKernels.md5Long(text.substring(i - w, i)), m) == 0L)
      val starts = 0 +: cutPts
      val ends = cutPts :+ text.length
      starts.zip(ends).filter(p => p._2 > p._1).map { case (s, e) =>
        (s.toLong, (e - s).toLong, TextKernels.md5Long(text.substring(s, e)))
      }
    }
    val got = texts.zipWithIndex.map { case (tx, i) => (i.toLong, tx) }
      .toDF("id", "text")
      .select(col("id"), explode(cdc_chunks(col("text"), w, m)).as("c"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map { r =>
        val st = r.getStruct(1)
        (st.getLong(0), st.getLong(1), st.getLong(2))
      }.toSeq.sortBy(_._1)).toMap
    texts.zipWithIndex.foreach { case (tx, i) =>
      assert(got(i.toLong) == brute(tx), s"doc $i")
    }
    // CDC property: a prefix edit only disturbs chunks before the first
    // surviving cut — everything after re-aligns (fixed-size blocks
    // would shift EVERY block)
    val base = texts.head
    val edited = "zz" + base
    val hb = brute(base).map(_._3).toSet
    val he = brute(edited).map(_._3).toSet
    assert((hb & he).size >= hb.size - 2,
      s"CDC must re-find shared chunks: ${(hb & he).size} of ${hb.size}")
    // profile: duplicating one doc adds only duplicate mass
    val solo = Dedup.cdcDedupProfile(
      Seq((1L, base)).toDF("id", "text"), "id", "text", w, m)
      .collect().head
    val dup = Dedup.cdcDedupProfile(
      Seq((1L, base), (2L, base)).toDF("id", "text"), "id", "text", w, m)
      .collect().head
    assert(dup.getLong(2) == solo.getLong(2), "n_distinct must not grow")
    assert(dup.getLong(4) == solo.getLong(4),
      "distinct_chars must not grow")
    assert(dup.getLong(1) == 2 * solo.getLong(1) &&
      dup.getLong(3) == 2 * solo.getLong(3))
    assert(dup.getDouble(5) == dup.getLong(4).toDouble /
      dup.getLong(3).toDouble)
  }

  test("pairLabelConflicts canonicalizes label pairs, flags conflicts, " +
    "and rejects pairs whose ids miss from the label table") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (2L, 5L))
      .toDF("id_a", "id_b")
    val labels = Seq((1L, "en"), (2L, "fr"), (3L, "en"), (4L, "en"),
      (5L, "en"), (6L, "fr")).toDF("id", "lang")
    val got = Dedup.pairLabelConflicts(pairs, labels, "id", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // (1,2)=(en,fr) conflict; (3,4)=(en,en); (5,6)=(en,fr); (2,5)=(fr,en)
    // canonicalizes to (en,fr) — so (en,fr) counts 3
    assert(got == Map(("en", "fr") -> ((3L, true)),
      ("en", "en") -> ((1L, false))))
    val e = intercept[IllegalArgumentException] {
      Dedup.pairLabelConflicts(Seq((1L, 99L)).toDF("id_a", "id_b"),
        labels, "id", "lang")
    }
    assert(e.getMessage.contains("missing from the label table"))
  }

  test("packFirstFitDecreasing equals the brute greedy walk, every bin " +
    "respects capacity, oversize and NULL docs rejected, per-key " +
    "fold bound enforced") {
    val rnd = new scala.util.Random(63)
    val cap = 50L
    val rows = (1 to 3).flatMap { k =>
      (1 to 120).map(i => (s"k$k", i.toLong, rnd.nextInt(50) + 1L))
    }
    val got = TextAnalysis.packFirstFitDecreasing(
        rows.toDF("k", "id", "tok"), "k", "id", "tok", cap)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      // brute FFD: sort by (tok desc, id asc), first fitting bin
      val bins = scala.collection.mutable.ArrayBuffer[Long]()
      val want = g.sortBy(r => (-r._3, r._2)).map { case (_, id, tok) =>
        val i = bins.indexWhere(_ + tok <= cap)
        val bin = if (i >= 0) { bins(i) += tok; i.toLong }
          else { bins += tok; bins.size - 1L }
        (id, tok, bin)
      }
      want.foreach { case (id, tok, bin) =>
        assert(got((k, id)) == ((tok, bin)), s"k=$k id=$id")
      }
      assert(bins.forall(_ <= cap))
      assert(bins.sum == g.map(_._3).sum)
    }
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.packFirstFitDecreasing(
        Seq(("a", 1L, 51L)).toDF("k", "id", "tok"), "k", "id", "tok", cap)
    }
    assert(e1.getMessage.contains("outside [1, capacity"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.packFirstFitDecreasing(
        (1 to 30).map(i => ("a", i.toLong, 3L)).toDF("k", "id", "tok"),
        "k", "id", "tok", cap, maxDocsPerKey = 10L)
    }
    assert(e2.getMessage.contains("bounded-fold"))
  }
  test("unicodeWordProfile: CJK singletons, apostrophe joins and the " +
    "token hash pin the segmentation; unicodeSentenceProfile: terminal " +
    "runs with closers and the unterminated tail") {
    val docs = Seq(
      (1L, "don't stop \u6f22\u5b57 it\u2019s 123_x"),
      (2L, "\u6771\u4eac\u90fd\u2019s \u30c7\u30fc\u30bf ok"),
      (3L, "plain latin only")).toDF("id", "text")
    val w = TextAnalysis.unicodeWordProfile(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: don't | stop | \u6f22 | \u5b57 | it's | 123_x -> 6 tokens,
    // 2 CJK singletons, 2 apostrophe tokens
    assert(w(1L) == ((6L, 2L, 2L)))
    // doc 2: \u6771 \u4eac \u90fd are Han singletons, the possessive
    // apostrophe cannot join a CJK char -> "s" is its own token;
    // \u30c7\u30fc\u30bf: Katakana singletons but \u30fc (long-vowel
    // mark) is script=Common, Lm -> a word char run of its own
    assert(w(2L)._2 == 5L && w(2L)._3 == 0L)
    assert(w(3L) == ((3L, 0L, 0L)))
    val sd = Seq(
      (1L, "Dr. No said \"Stop!\" twice... The end"),
      (2L, "one sentence only"),
      (3L, "...")).toDF("id", "text")
    val g = TextAnalysis.unicodeSentenceProfile(sd, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc 1: Dr. | No said "Stop!" | twice... | The end
    assert(g(1L)._1 == 4L)
    assert(g(2L) == ((1L, 17L)))
    assert(g(3L) == ((0L, 0L)))
  }
  test("kneserNeyPerplexity matches a brute-force modified-KN reference " +
    "on a templated corpus, and the per-context conditionals normalize " +
    "to exactly 1") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(211)
    val order = 3
    // Zipf-skewed 30-word vocabulary: common words give repeated grams
    // (count-of-counts mass at 2, 3, 4), rare words keep level-1
    // continuation counts sparse (mass at 1) -- modified-KN discounts
    // need BOTH at every level; repeated template phrases pin exact
    // 2x/3x gram counts at the top level
    val vocab = (0 until 30).map(i => f"w$i%02d").toVector
    def skewed(): String = {
      val u = rnd.nextDouble()
      vocab(math.min(29, (-math.log(u) * 5.0).toInt))
    }
    val docs = (0L until 40L).map { id =>
      val inject =
        if (id == 1L || id == 2L) "w00 w01 w02 w03 "
        else if (id == 4L || id == 5L || id == 7L) "w04 w05 w06 w07 "
        else ""
      val tail = Seq.fill(8 + rnd.nextInt(7))(skewed()).mkString(" ")
      (id, (inject + tail).trim)
    }
    val got = TextAnalysis.kneserNeyPerplexity(docs.toDF("doc_id", "text"),
        "doc_id", "text", col("doc_id") % 3 =!= 0L, order,
        thresholdMicro = 2000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    // ---- brute force: the literal Chen–Goodman modified-KN chain ----
    val train = docs.filter(_._1 % 3 != 0)
      .map(_._2.split("\\s+").filter(_.nonEmpty).toSeq)
    val raw = scala.collection.mutable.Map.empty[Seq[String], Long]
      .withDefaultValue(0L)
    train.foreach { tk =>
      (1 to order).foreach(k =>
        tk.sliding(k).filter(_.size == k).foreach(g => raw(g) += 1L))
    }
    val tl = scala.collection.mutable.Map.empty[(Int, Seq[String]), Long]
      .withDefaultValue(0L)
    raw.foreach { case (g, c) =>
      if (g.size == order) tl((order, g)) = c
      if (g.size >= 2 && g.size <= order) tl((g.size - 1, g.drop(1))) += 1L
    }
    val den = scala.collection.mutable.Map.empty[(Int, Seq[String]), Long]
      .withDefaultValue(0L)
    val nTy = scala.collection.mutable.Map
      .empty[(Int, Seq[String], Int), Long].withDefaultValue(0L)
    tl.foreach { case ((k, g), c) =>
      val ctx = g.dropRight(1)
      den((k, ctx)) += c
      val cls = if (c == 1L) 1 else if (c == 2L) 2 else 3
      nTy((k, ctx, cls)) += 1L
    }
    val disc = (1 to order).map { k =>
      val ms = (1L to 4L).map(i => tl.count { case ((l, _), c) =>
        l == k && c == i }.toLong)
      val (m1, m2, m3, m4) = (ms(0), ms(1), ms(2), ms(3))
      assert(m1 > 0 && m2 > 0 && m3 > 0,
        s"fixture too tame: level $k count-of-counts $ms lack mass")
      val y = m1.toDouble / (m1 + 2 * m2).toDouble
      val d = (1.0 - 2.0 * y * m2 / m1, 2.0 - 3.0 * y * m3 / m2,
        3.0 - 4.0 * y * m4 / m3)
      assert(d._1 >= 0 && d._1 <= 1 && d._2 >= 0 && d._2 <= 2 &&
        d._3 >= 0 && d._3 <= 3, s"fixture gives invalid discounts $d")
      k -> d
    }.toMap
    val v = raw.keys.count(_.size == 1).toLong
    def pOf(key: Seq[String]): Double = {
      var p = 1.0 / v
      (1 to key.size).foreach { k =>
        val gram = key.takeRight(k)
        val ctx = gram.dropRight(1)
        if (den.contains((k, ctx))) {
          val dn = den((k, ctx)).toDouble
          val cnt = tl((k, gram))
          val (d1, d2, d3) = disc(k)
          val dd = if (cnt == 1L) d1 else if (cnt == 2L) d2
            else if (cnt >= 3L) d3 else 0.0
          val a = (cnt.toDouble - dd) / dn
          val gma = (d1 * nTy((k, ctx, 1)) + d2 * nTy((k, ctx, 2)) +
            d3 * nTy((k, ctx, 3))) / dn
          p = a + gma * p
        }
      }
      p
    }
    // independent sanity: every observed top-level conditional
    // normalizes -- sum_w p(w | ctx) == 1 within float tolerance
    val ctxs = tl.keys.collect { case (k, g) if k == order => g.dropRight(1) }
      .toSeq.distinct.take(5)
    val words = raw.keys.filter(_.size == 1).map(_.head).toSeq
    ctxs.foreach { ctx =>
      val tot = words.map(w => pOf(ctx :+ w)).sum
      assert(math.abs(tot - 1.0) < 1e-9, s"ctx=$ctx sums to $tot")
    }
    docs.foreach { case (id, text) =>
      val tk = text.split("\\s+").filter(_.nonEmpty).toSeq
      val nll = tk.indices.map { i =>
        val L = math.min(i + 1, order)
        val p = pOf(tk.slice(i - L + 1, i + 1))
        -BigDecimal(math.log(p) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      val sum = nll.sum
      val avg = if (tk.nonEmpty) sum / tk.size else 0L
      val want = (id % 3 != 0L, tk.size.toLong, sum, avg,
        tk.nonEmpty && avg <= 2000000L)
      assert(got(id) == want, s"doc=$id: ${got(id)} != $want")
    }
    // saturated-continuation corpus (tiny dense vocab): without a
    // fallback the invalid level rejects loudly; with KenLM's default
    // it scores
    val dense = (0L until 12L).map(id =>
      (id, Seq.fill(10)(Vector("a", "b", "c")((rnd.nextInt(3))))
        .mkString(" "))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyPerplexity(dense, "doc_id", "text",
        col("doc_id") % 3 =!= 0L, order = 3)
    }
    assert(e.getMessage.contains("no valid modified-KN discounts"))
    val fb = TextAnalysis.kneserNeyPerplexity(dense, "doc_id", "text",
      col("doc_id") % 3 =!= 0L, order = 3,
      thresholdMicro = 2000000L, discountFallback = Some((0.5, 1.0, 1.5)))
    assert(fb.count() == 12L &&
      fb.where(col("nll_avg_micro") > 0L).count() > 0L)
  }
  test("langIdWide: every profile sentence predicts its own language " +
    "with the exact cross-overlap margin, number soup abstains to " +
    "und, and the plan stays map-only") {
    import graft.operators.TextAnalysis
    val profs = TextAnalysis.WideLangProfiles
    assert(profs.size >= 20, "the widened table must cover >= 20 langs")
    val rows = profs.map { case (lang, sw) => (lang, sw.mkString(" ")) } :+
      (("und", "42 1337 999 xyzzy12"))
    val df = rows.toDF("id", "text")
    val got = TextAnalysis.langIdWide(df, "id", "text")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    profs.foreach { case (lang, sw) =>
      val (pred, best, margin) = got(lang)
      assert(pred == lang, s"$lang predicted $pred")
      assert(best == 10L, s"$lang own score $best")
      // margin must equal the TRUE lexical overlap with the closest
      // rival profile — the abstention threshold is meaningful only
      // if the table keeps every language separable
      val second = profs.filter(_._1 != lang)
        .map(p => p._2.count(sw.contains)).max.toLong
      assert(margin.contains(1000000L * (10L - second) / 10L),
        s"$lang margin $margin vs overlap $second")
      assert(margin.get >= 200000L,
        s"$lang margin ${margin.get} under the abstention threshold")
    }
    assert(got("und")._1 == "und" && got("und")._2 == 0L)
    val plan = TextAnalysis.langIdWide(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Window"), s"langIdWide must stay map-only:\n$plan")
  }

  test("galeChurchAlign equals an independent DP reference on random " +
    "lengths, recovers planted merge/drop beads, partitions both " +
    "sides exactly, and enforces its contracts") {
    import graft.operators.TextAnalysis
    type Bead = (Option[Long], Long, Option[Long], Long, Long)
    val P10 = 4500000L; val P21 = 2302585L; val P22 = 4392317L
    def mm(rM: Long)(sa: Long, sb: Long): Long = {
      val x = sa * rM; val y = sb * 1000000L; val d = BigInt(y - x)
      ((d * d) / BigInt(7L * (x + y) + 1L)).toLong
    }
    // independent reference: full table, candidate LIST per cell in
    // the documented order, min by value then first-in-order
    def ref(la: Array[Long], lb: Array[Long], rM: Long): Seq[Bead] = {
      val f = mm(rM) _
      val n = la.length; val m = lb.length
      val c = Array.fill(n + 1, m + 1)(Long.MaxValue)
      c(0)(0) = 0L
      def cands(i: Int, j: Int): Seq[(Long, Bead, (Int, Int))] = Seq(
        (i >= 1 && j >= 1, () => (c(i - 1)(j - 1), f(la(i - 1), lb(j - 1)),
          (Some(i.toLong), 1L, Some(j.toLong), 1L), (i - 1, j - 1))),
        (i >= 1, () => (c(i - 1)(j), P10,
          (Some(i.toLong), 1L, None, 0L), (i - 1, j))),
        (j >= 1, () => (c(i)(j - 1), P10,
          (None, 0L, Some(j.toLong), 1L), (i, j - 1))),
        (i >= 2 && j >= 1, () => (c(i - 2)(j - 1),
          P21 + f(la(i - 2) + la(i - 1), lb(j - 1)),
          (Some((i - 1).toLong), 2L, Some(j.toLong), 1L), (i - 2, j - 1))),
        (i >= 1 && j >= 2, () => (c(i - 1)(j - 2),
          P21 + f(la(i - 1), lb(j - 2) + lb(j - 1)),
          (Some(i.toLong), 1L, Some((j - 1).toLong), 2L), (i - 1, j - 2))),
        (i >= 2 && j >= 2, () => (c(i - 2)(j - 2),
          P22 + f(la(i - 2) + la(i - 1), lb(j - 2) + lb(j - 1)),
          (Some((i - 1).toLong), 2L, Some((j - 1).toLong), 2L),
          (i - 2, j - 2)))
      ).collect { case (ok, t) if ok => t() }
        .collect { case (prev, add, (as, al, bs, bl), back)
          if prev != Long.MaxValue =>
          (prev + add, (as, al, bs, bl, add), back) }
      for (i <- 0 to n; j <- 0 to m if i + j > 0)
        c(i)(j) = cands(i, j).map(_._1).minOption.getOrElse(Long.MaxValue)
      var (bi, bj) = (n, m)
      var beads = List.empty[Bead]
      while (bi + bj > 0) {
        val (_, bead, (pi, pj)) =
          cands(bi, bj).find(_._1 == c(bi)(bj)).get
        beads ::= bead
        bi = pi; bj = pj
      }
      beads
    }
    val rnd = new scala.util.Random(1789)
    val pairs = (0L until 60L).map { id =>
      val n = rnd.nextInt(11)
      val m = rnd.nextInt(11)
      (id, Seq.fill(n)("x" * (rnd.nextInt(200) + 1)),
        Seq.fill(m)("y" * (rnd.nextInt(200) + 1)))
    }
    val got = TextAnalysis.galeChurchAlign(
        pairs.toDF("id", "a", "b"), "id", "a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5),
          r.getLong(6))))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    pairs.foreach { case (id, a, b) =>
      val la = a.map(_.length.toLong).toArray
      val lb = b.map(_.length.toLong).toArray
      val want = ref(la, lb, 1000000L)
      val g = got.getOrElse(id, Seq.empty)
      assert(g == want, s"pair $id: $g != $want")
      // beads PARTITION both sides in order
      assert(g.map(_._2).sum == la.length && g.map(_._4).sum == lb.length)
    }
    // planted structure: a merge (2-1) and a drop (1-0) recover exactly
    val a2 = Seq("s" * 100, "s" * 80, "s" * 120, "s" * 90, "s" * 60)
    val b2 = Seq("t" * 101, "t" * 203, "t" * 89, "t" * 61) // 80+120 merged
    val gotP = TextAnalysis.galeChurchAlign(
        Seq((1L, a2, b2)).toDF("id", "a", "b"), "id", "a", "b")
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(3), r.getLong(5))).toSeq
    assert(gotP == Seq((1L, 1L), (2L, 1L), (1L, 1L), (1L, 1L)),
      s"merge bead not recovered: $gotP")
    val a3 = Seq("s" * 100, "s" * 80, "s" * 2000, "s" * 90, "s" * 60)
    val b3 = Seq("t" * 101, "t" * 79, "t" * 89, "t" * 61) // 2000 dropped
    val gotD = TextAnalysis.galeChurchAlign(
        Seq((1L, a3, b3)).toDF("id", "a", "b"), "id", "a", "b")
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(3), r.getLong(5))).toSeq
    assert(gotD == Seq((1L, 1L), (1L, 1L), (1L, 0L), (1L, 1L), (1L, 1L)),
      s"drop bead not recovered: $gotD")
    // one empty side: all insertions; both empty: no rows
    val gotE = TextAnalysis.galeChurchAlign(
        Seq((1L, Seq.empty[String], Seq("q" * 10, "q" * 20)),
          (2L, Seq.empty[String], Seq.empty[String]))
          .toDF("id", "a", "b"), "id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(5)))
    assert(gotE.toSeq == Seq((1L, 0L, 1L), (1L, 0L, 1L)))
    // contracts: NULL sentence, oversize sentence, too many sentences
    val eN = intercept[IllegalArgumentException] {
      TextAnalysis.galeChurchAlign(
        Seq((1L, Seq("ok", null: String), Seq("ok")))
          .toDF("id", "a", "b"), "id", "a", "b")
    }
    assert(eN.getMessage.contains("NULL sentence"))
    val eS = intercept[IllegalArgumentException] {
      TextAnalysis.galeChurchAlign(
        Seq((1L, Seq("x" * 100001), Seq("ok"))).toDF("id", "a", "b"),
        "id", "a", "b")
    }
    assert(eS.getMessage.contains("1e5 octets"))
    val eM = intercept[IllegalArgumentException] {
      TextAnalysis.galeChurchAlign(
        Seq((1L, Seq.fill(9)("x"), Seq("ok"))).toDF("id", "a", "b"),
        "id", "a", "b", maxSentences = 8)
    }
    assert(eM.getMessage.contains("bounded-DP"))
  }
}
