package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{EdgeMovingAvg, LinearResample, SavGol, TextKernels}

/** Property-style tests (SURVEY.md §5 item 2) over seeded random samples —
  * deterministic, no generator-framework dependency. */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private def randSeries(min: Int = 2, max: Int = 60): Array[Double] = {
    val n = min + rnd.nextInt(max - min + 1)
    Array.fill(n)(math.rint(rnd.nextDouble() * 2e4 - 1e4) / 4)
  }
  private def trials(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  test("resample is exact identity when target length equals source length") {
    trials(50) {
      val xs = randSeries()
      assert(LinearResample.resample(xs, xs.length, 50.0).toSeq == xs.toSeq)
    }
  }

  test("resample endpoints: last output equals last input (x_hat ends at L)") {
    trials(50) {
      val xs = randSeries()
      val num = 2 + rnd.nextInt(79)
      val out = LinearResample.resample(xs, num, 50.0)
      assert(out.length == num)
      assert(math.abs(out.last - xs.last) < 1e-9)
    }
  }

  test("resample preserves affine series at every target position") {
    trials(50) {
      val n = 3 + rnd.nextInt(48)
      val num = 3 + rnd.nextInt(48)
      val a = rnd.nextDouble() * 10 - 5
      val b = rnd.nextDouble() * 200 - 100
      val src = LinearResample.linspace(0.01, n / 50.0, n).map(t => a * t + b)
      val out = LinearResample.resample(src, num, 50.0)
      val l = n / 50.0
      val xh = LinearResample.linspace(l / (2.0 * (num / l)) / l * l, l, num)
      // recompute x_hat exactly as the kernel does
      val dxh = 1.0 / ((num / l) * 2)
      val xh2 = LinearResample.linspace(dxh, l, num)
      out.zip(xh2).foreach { case (v, t) =>
        assert(math.abs(v - (a * t + b)) < 1e-7, s"at t=$t")
      }
    }
  }

  test("edge moving average equals brute force with clamped indices") {
    trials(50) {
      val xs = randSeries()
      val w = 1 + rnd.nextInt(20)
      val n = xs.length
      val lo = w - w / 2
      val brute = Array.tabulate(n)(i =>
        (i - lo to i + w / 2 - 1).map(j => xs(math.max(0, math.min(n - 1, j)))).sum / w)
      EdgeMovingAvg(xs, w).zip(brute).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
  }

  test("edge moving average stays within series bounds") {
    trials(50) {
      val xs = randSeries()
      val w = 1 + rnd.nextInt(16)
      val out = EdgeMovingAvg(xs, w)
      assert(out.forall(v => v >= xs.min - 1e-9 && v <= xs.max + 1e-9))
    }
  }

  test("savgol is linear in its input") {
    trials(30) {
      val n = 30
      val xs = Array.fill(n)(rnd.nextDouble() * 200 - 100)
      val ys = Array.fill(n)(rnd.nextDouble() * 200 - 100)
      val a = rnd.nextDouble() * 6 - 3
      val b = rnd.nextDouble() * 6 - 3
      val fx = SavGol(xs, 7, 3)
      val fy = SavGol(ys, 7, 3)
      val combined = SavGol(xs.indices.map(i => a * xs(i) + b * ys(i)).toArray, 7, 3)
      combined.indices.foreach { i =>
        assert(math.abs(combined(i) - (a * fx(i) + b * fy(i))) < 1e-6)
      }
    }
  }

  test("savgol of a constant series is the constant") {
    trials(30) {
      val c = rnd.nextDouble() * 2e3 - 1e3
      val n = 15 + rnd.nextInt(26)
      val out = SavGol(Array.fill(n)(c), 15, 3)
      assert(out.forall(v => math.abs(v - c) < 1e-9 * math.max(1, math.abs(c))))
    }
  }

  test("tokenize lowercases, drops empties; shingle count = max(0, tokens-n+1)") {
    val words = Array("alpha", "beta", "Gamma", "  ", "x9", "")
    trials(50) {
      val t = Array.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" ")
      val toks = TextKernels.tokenize(t)
      assert(toks.forall(tok => tok.nonEmpty && tok == tok.toLowerCase))
    }
  }

  test("md5Long is non-negative, stable, and 60-bit") {
    trials(100) {
      val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val h = TextKernels.md5Long(s)
      assert(h >= 0 && h < (1L << 60) && h == TextKernels.md5Long(s))
    }
  }

  test("hll sketch of a union equals the byte-max merge of the part sketches") {
    import graft.functions.Hll
    trials(30) {
      val p = 4 + rnd.nextInt(8)
      val a = Seq.fill(50 + rnd.nextInt(400))(s"a-${rnd.nextInt(300)}")
      val b = Seq.fill(50 + rnd.nextInt(400))(s"b-${rnd.nextInt(300)}")
      def sketch(vs: Seq[String]) = {
        val buf = new Array[Byte](1 << p); vs.foreach(Hll.update(buf, _, p)); buf
      }
      val merged = sketch(a).zip(sketch(b)).map { case (x, y) => if (y > x) y else x }
      assert(java.util.Arrays.equals(merged, sketch(a ++ b)))
      // and the estimate only depends on the buffer (order-free)
      assert(Hll.estimate(merged) == Hll.estimate(sketch(rnd.shuffle(a ++ b))))
    }
  }

  test("sketch double-hash positions are in range and match the SQL arithmetic") {
    import graft.functions.{SketchHash, TextKernels}
    trials(100) {
      val m = 8 << rnd.nextInt(10)
      val k = 1 + rnd.nextInt(16)
      val h = TextKernels.md5Long(rnd.alphanumeric.take(12).mkString)
      val ps = SketchHash.positions(h, m, k)
      assert(ps.length == k && ps.forall(p => p >= 0 && p < m))
      // the oracle's integer replay: (h % m + i * (1 + (h // m) % (m-1))) % m
      ps.zipWithIndex.foreach { case (p, i) =>
        assert(p == ((h % m + i * (1 + (h / m) % (m - 1))) % m).toInt)
      }
    }
  }

  test("zorder key de-interleaves back to the masked inputs") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    trials(100) {
      val bits = 1 + rnd.nextInt(16)
      val nCols = 1 + rnd.nextInt(63 / bits).min(4)
      val vals = Seq.fill(nCols)(rnd.nextLong().abs)
      val z = graft.functions.ZOrderKey(vals.map(Literal(_)), bits)
        .eval(null).asInstanceOf[Long]
      val mask = (1L << bits) - 1
      vals.zipWithIndex.foreach { case (v, c) =>
        var back = 0L
        (0 until bits).foreach(i => back |= ((z >>> (i * nCols + c)) & 1L) << i)
        assert(back == (v & mask), s"col $c of $nCols, bits=$bits")
      }
    }
  }

  test("dhash is invariant to brightness shift, contrast scale and 2x upscale") {
    // the perceptual contract: gradient SIGNS survive the global
    // photometric edits that break exact byte hashes
    import graft.functions.ImageKernels
    trials(30) {
      val h = 8 + rnd.nextInt(17)
      val w = 9 + rnd.nextInt(19)
      val m = Array.fill(h, w)((rnd.nextInt(256)).toDouble)
      val base = ImageKernels.dhashOf(m).toSeq
      assert(base.forall(b => b >= 0 && b <= 255))
      val brighter = m.map(_.map(_ + 37.0))
      assert(ImageKernels.dhashOf(brighter).toSeq == base, "brightness shift")
      val contrast = m.map(_.map(_ * 2.0))
      assert(ImageKernels.dhashOf(contrast).toSeq == base, "contrast scale")
      // 2x nearest-neighbor upscale: every block mean is unchanged only
      // when the grid divides evenly, so test on an exact-multiple base
      val m2 = Array.tabulate(16, 18)((i, j) => m(i % 8 + 0)(j % 9))
      val up = Array.tabulate(32, 36)((i, j) => m2(i / 2)(j / 2))
      assert(ImageKernels.dhashOf(up).toSeq == ImageKernels.dhashOf(m2).toSeq,
        "2x upscale")
    }
  }

  test("bbox to_square is idempotent (squares stay fixed)") {
    // to_square of an already-square box is the identity (utils.py:27-39)
    trials(50) {
      val x1 = rnd.nextDouble() * 100; val y1 = rnd.nextDouble() * 100
      val s = rnd.nextDouble() * 50 + 1
      // square: width == height -> dx = dy = 0
      val (w, h) = (s, s)
      val size = math.max(w, h)
      assert((size - w) / 2 == 0.0 && (size - h) / 2 == 0.0)
    }
  }
  // --- UAX-29-subset segmentation: the single-pass kernel must equal
  // the two-step regex program the DuckDB oracle replays (same rule
  // set, independent implementations) on random mixed-script text. ---

  private val uaxPool: Array[String] = Array(
    "a", "b", "Z", "q", "0", "9", "_", " ", " ", "\t", "\n", "\r",
    "'", "\u2019", ".", "!", "?", "\"", ")", "]", "\u201d", "\u00bb",
    ",", ";", "-", "<", "(",
    "\u6f22", "\u5b57", "\u6e2c",          // Han
    "\u3042", "\u3044",                    // Hiragana
    "\u30ab", "\u30bf",                    // Katakana
    "\u0e44", "\u0e17",                    // Thai
    "\ud55c", "\uae00",                    // Hangul (word chars, NOT singletons)
    "\u00e9", "\u00dc",                    // accented Latin
    "\u0301", "\u0941",                    // combining marks (Mn, Mc-ish)
    new String(Character.toChars(0x20000)) // supplementary Han (CJK ext B)
  )

  private def randUaxText(): String = {
    val n = rnd.nextInt(80)
    val sb = new StringBuilder
    (1 to n).foreach(_ => sb.append(uaxPool(rnd.nextInt(uaxPool.length))))
    sb.toString
  }

  private def regexTokens(text: String): Seq[String] = {
    val cjk = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsThai}]"
    val s1 = text.replaceAll("(" + cjk + ")", " $1 ")
    val w = "[\\p{L}\\p{Nd}\\p{Mn}\\p{Mc}_]"
    val m = java.util.regex.Pattern
      .compile(w + "+(?:['\u2019]" + w + "+)*").matcher(s1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  private def regexSentences(text: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile("[^.!?]+[.!?]+[\"')\\]\u201d\u2019\u00bb]*|[^.!?]+$")
      .matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) {
      val t = m.group().replaceAll("^[ \\t\\n\\r]+|[ \\t\\n\\r]+$", "")
      if (t.nonEmpty) out += t
    }
    out.toSeq
  }

  test("uax29 word kernel equals the two-step regex program on random " +
    "mixed-script text (CJK singletons, apostrophe joins, marks, " +
    "supplementary planes)") {
    import graft.functions.Uax29Kernels
    assert(Uax29Kernels.tokens("don't stop \u6f22\u5b57abc\u30ab 123_x it\u2019s").toSeq ==
      Seq("don't", "stop", "\u6f22", "\u5b57", "abc", "\u30ab", "123_x", "it\u2019s"))
    assert(Uax29Kernels.tokens("a''b dogs' '\u6f22").toSeq ==
      Seq("a", "b", "dogs", "\u6f22"))
    trials(400) {
      val t = randUaxText()
      assert(Uax29Kernels.tokens(t).toSeq == regexTokens(t), s"text=${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("uax29 sentence kernel equals the regex program on random text " +
    "(terminal runs, closers, untrimmed tails, pure-terminal noise)") {
    import graft.functions.Uax29Kernels
    assert(Uax29Kernels.sentences("Hi. How are you?! (Fine.) ...").toSeq ==
      Seq("Hi.", "How are you?!", "(Fine.)", "..."))
    assert(Uax29Kernels.sentences("no terminal tail").toSeq ==
      Seq("no terminal tail"))
    assert(Uax29Kernels.sentences("...").toSeq == Seq.empty[String])
    trials(400) {
      val t = randUaxText()
      assert(Uax29Kernels.sentences(t).toSeq == regexSentences(t), s"text=${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }
}
