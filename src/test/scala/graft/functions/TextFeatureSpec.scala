package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Parity pins for the single-pass replacements of composed built-in
  * shapes: [[QualityFeatures]] must reproduce the `size(filter(...))` /
  * `aggregate(...)` feature formulas it replaced field for field, and
  * [[MinHashSignatureFromHashes]] must be bit-identical to
  * [[MinHashSignature]] over the strings the hashes came from — the
  * whole point of both is that swapping them in cannot move a value,
  * only the evaluation count. */
class TextFeatureSpec extends SparkTestBase {
  import spark.implicits._

  private val stops = Seq("the", "a", "of")

  test("quality_features matches the composed built-in formulas field by field") {
    val df = Seq(
      (1L, "The quick brown fox 123 jumps over the lazy dog 45"),
      (2L, "of OF Of oF"),            // case folding before stopword match
      (3L, "1 22 333 4444"),          // no alpha, all digits
      (4L, ""),                       // empty: zero tokens, zero chars
      (5L, "  \t \n "),               // whitespace only
      (6L, "naïve café £5 €10 → ok"), // multi-byte code points
      (7L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val allStops = array(stops.map(lit): _*)
    val composed = df.select(col("id"),
        ws_tokens(col("text")).as("toks"), col("text"))
      .select(col("id"),
        when(col("text").isNotNull, size(col("toks"))).cast("long").as("n_tok"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("sum_tok_len"),
        size(filter(col("toks"), t => t.rlike("\\p{L}"))).cast("long").as("n_alpha"),
        size(filter(col("toks"), t => array_contains(allStops, t))).cast("long").as("n_stop"),
        length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digit"))
      .orderBy("id").collect()
    val single = df.select(col("id"), quality_features(col("text"), stops).as("f"))
      .select(col("id"), col("f.n_tok"), col("f.sum_tok_len"), col("f.n_alpha"),
        col("f.n_stop"), col("f.n_chars"), col("f.n_digit"))
      .orderBy("id").collect()
    for ((c, s) <- composed.zip(single)) {
      assert(c.getLong(0) == s.getLong(0))
      for (i <- 1 to 6)
        assert((c.isNullAt(i) && s.isNullAt(i)) ||
          (!c.isNullAt(i) && !s.isNullAt(i) && c.getLong(i) == s.getLong(i)),
          s"id=${c.getLong(0)} field $i: composed=$c single=$s")
    }
    // NULL text nulls the whole struct (row 7 survives with a NULL f)
    val nulls = df.select(col("id"), quality_features(col("text"), stops).as("f"))
      .where(col("f").isNull).collect()
    assert(nulls.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("quality_features parity holds on randomized unicode text") {
    // alphabet chosen to poke every semantic seam: supplementary-plane
    // emoji (surrogate pairs — code-point vs UTF-16 length), combining
    // marks (\p{M}, not \p{L}), non-Latin scripts, digits, mixed
    // whitespace, and stopwords that only match after case folding
    val alphabet = Array("a", "B", "ß", "É", "ж", "漢", "7", "0", "😀",
      "é", " ", "\t", "\n", ".", "-", "the", "OF", "a")
    val rnd = new scala.util.Random(31)
    val docs = (1L to 200L).map { i =>
      (i, (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    }.toDF("id", "text")
    val allStops = array(stops.map(lit): _*)
    val composed = docs.select(col("id"),
        ws_tokens(col("text")).as("toks"), col("text"))
      .select(col("id"),
        size(col("toks")).cast("long").as("n_tok"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("sum_tok_len"),
        size(filter(col("toks"), t => t.rlike("\\p{L}"))).cast("long").as("n_alpha"),
        size(filter(col("toks"), t => array_contains(allStops, t))).cast("long").as("n_stop"),
        length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digit"))
      .orderBy("id").collect().map(_.toSeq)
    val single = docs.select(col("id"), quality_features(col("text"), stops).as("f"))
      .select(col("id"), col("f.n_tok"), col("f.sum_tok_len"), col("f.n_alpha"),
        col("f.n_stop"), col("f.n_chars"), col("f.n_digit"))
      .orderBy("id").collect().map(_.toSeq)
    assert(composed.toSeq == single.toSeq)
  }

  test("hash_bucket_counts matches the explode-groupBy vectorizer on random docs") {
    val words = Array("alpha", "beta", "Gamma", "δ", "漢字", "x1", "", "the")
    val rnd = new scala.util.Random(37)
    val docs = (1L to 100L).map { i =>
      (i, (0 until rnd.nextInt(40)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val batch = graft.operators.TextAnalysis
      .hashingVectorizer(docs, "doc_id", "text", 32)
      .collect().map(_.toSeq).toSet
    val single = docs.select(col("doc_id"),
        explode(hash_bucket_counts(col("text"), 32)).as("e"))
      .select(col("doc_id"), col("e.dim"), col("e.cnt"))
      .collect().map(_.toSeq).toSet
    assert(single == batch)
  }

  test("remove_token_spans equals brute-force span-union filtering on random input") {
    val rnd = new scala.util.Random(43)
    val cases = (1 to 120).map { i =>
      val n = rnd.nextInt(30)
      val toks = (0 until n).map(j => s"t$j")
      val spans = (0 until rnd.nextInt(5)).map { _ =>
        val s = rnd.nextInt(n + 3) - 1            // may start before 0
        (s.toLong, (s + 1 + rnd.nextInt(6)).toLong) // may end past n
      }
      (i.toLong, toks, spans.map { case (s, e) => (s, e) })
    }
    val df = cases.toDF("id", "toks", "raw")
      .select(col("id"), col("toks"),
        transform(col("raw"), r =>
          struct(r.getField("_1").as("start"), r.getField("_2").as("end")))
          .as("spans"))
    val got = df.select(col("id"),
        remove_token_spans(col("toks"), col("spans")).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, toks, spans) <- cases) {
      val expect = toks.zipWithIndex.collect {
        case (t, j) if !spans.exists { case (s, e) => j >= s && j < e } => t
      }
      assert(got(id) == expect, s"case $id: spans=$spans")
    }
  }

  test("best_token_window equals brute-force anchor counting on random hits") {
    val rnd = new scala.util.Random(51)
    val cases = (1 to 150).map { i =>
      val m = rnd.nextInt(25)
      // unsorted with duplicates: the kernel must sort internally
      val hits = (0 until m).map(_ => rnd.nextInt(60).toLong)
      (i.toLong, hits, 1 + rnd.nextInt(12))
    }
    val df = cases.toDF("id", "hits", "w")
    val got = df.select(col("id"),
        best_token_window(col("hits"), col("w").cast("long")).as("bw"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))))).toMap
    for ((id, hits, w) <- cases) {
      val expect =
        if (hits.isEmpty) None
        else {
          val anchors = hits.sorted.map(s =>
            (s, hits.count(p => p >= s && p < s + w).toLong))
          // max count, smallest start on ties
          Some(anchors.maxBy { case (s, c) => (c, -s) })
        }
      assert(got(id) == expect, s"case $id: hits=$hits w=$w")
    }
    // degenerate inputs degrade to NULL, never throw
    val edge = Seq((1L, Seq.empty[Long], 5L), (2L, Seq(3L), 0L))
      .toDF("id", "hits", "w")
      .select(best_token_window(col("hits"), col("w")))
      .collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("min_pos_gap equals brute-force pairwise minimum on random hits") {
    val rnd = new scala.util.Random(67)
    val cases = (1 to 150).map { i =>
      val (m, n) = (rnd.nextInt(15), rnd.nextInt(15))
      ((i.toLong, (0 until m).map(_ => rnd.nextInt(50).toLong),
        (0 until n).map(_ => rnd.nextInt(50).toLong)))
    }
    val df = cases.toDF("id", "ha", "hb")
    for (ordered <- Seq(false, true)) {
      val got = df.select(col("id"),
          min_pos_gap(col("ha"), col("hb"), ordered).as("gap"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      for ((id, ha, hb) <- cases) {
        val pairs =
          if (ordered) for (a <- ha; b <- hb if b > a) yield b - a
          else for (a <- ha; b <- hb) yield math.abs(a - b)
        val expect = if (pairs.isEmpty) None else Some(pairs.min)
        assert(got(id) == expect,
          s"case $id ordered=$ordered: ha=$ha hb=$hb")
      }
    }
  }

  test("minhash_sig_from_hashes is bit-identical to minhash_signature") {
    val df = Seq(
      (1L, Seq("alpha beta gamma", "beta gamma delta", "gamma delta eps")),
      (2L, Seq("one two three")),
      (3L, Seq.empty[String]) // empty set: every permutation Long.MaxValue
    ).toDF("id", "shingles")
    val both = df.select(col("id"),
        minhash_signature(col("shingles"), 16).as("direct"),
        minhash_sig_from_hashes(
          transform(col("shingles"), s => md5_long(s)), 16).as("via_hashes"))
      .collect()
    for (r <- both)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    assert(both.find(_.getLong(0) == 3L).get
      .getSeq[Long](1).forall(_ == Long.MaxValue))
  }

  test("aho-corasick counts equal String.replace counts on random text") {
    // String.replace removes non-overlapping occurrences greedily left to
    // right — the exact semantics DictMatchCounts claims, including for
    // self-overlapping terms like "aa" and nested dictionaries where one
    // term is a substring (or suffix) of another.
    val rnd = new scala.util.Random(7)
    val dict = Array("a", "aa", "ab", "aba", "bab", "bb", "abab", "caca")
    val ac = new AhoCorasick(dict)
    (1 to 300).foreach { _ =>
      val text = Array.fill(rnd.nextInt(40))(
        "abc".charAt(rnd.nextInt(3))).mkString
      val got = ac.countsNonOverlapping(text)
      dict.zipWithIndex.foreach { case (term, i) =>
        val expect =
          (text.length - text.replace(term, "").length) / term.length
        assert(got(i) == expect.toLong,
          s"term=$term text=$text got=${got(i)} want=$expect")
      }
    }
  }

  test("dict_match_counts tags docs with per-term non-overlap counts") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "aaaa"), // "aa" twice non-overlapping, "aaa" once
      (3L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        explode(graft.functions.dict_match_counts(col("text"),
          Seq("the", "cat", "aa", "aaa", "zz"))).as("m"))
      .select(col("id"), col("m.term"), col("m.cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set((1L, "the", 2L), (1L, "cat", 1L),
      (2L, "aa", 2L), (2L, "aaa", 1L)))
  }
}
