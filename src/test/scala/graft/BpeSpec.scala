package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE training and application: hand-computable merges, tie-breaks,
  * non-overlapping rewrite, the replace-chain application's equality
  * with training's own segmentation, and the loud contracts. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("hand trace: merges follow (count DESC, pair ASC); rewrite is " +
    "left-to-right non-overlapping") {
    // corpus: "abab" x3, "aab" x2  → pairs: (a,b): 3*2+2 = 8,
    // (b,a): 3, (a,a): 2 → merge 1 = (a,b) count 8
    // after: [ab,ab] x3, [a,ab] x2 → pairs: (ab,ab): 3, (a,ab): 2
    // → merge 2 = (ab,ab) count 3
    val docs = Seq("abab abab abab aab aab").toDF("text")
    val m = Bpe.train(docs, "text", merges = 2)
    assert(m.map(x => (x.left, x.right, x.pairCount)) ==
      Seq(("a", "b", 8L), ("ab", "ab", 3L)))
    // "bbb": pieces [b,b,b] has pair (b,b) twice (adjacency count),
    // but the rewrite merges only the FIRST (non-overlapping)
    val docs2 = Seq("bbb").toDF("text")
    val m2 = Bpe.train(docs2, "text", merges = 2)
    assert(m2.head == Bpe.Merge("b", "b", 2L),
      "adjacency count includes the overlap")
    assert(m2(1) == Bpe.Merge("bb", "b", 1L),
      "after the rewrite [bb, b] remains — non-overlapping merge")
    // tie-break: "ab cd" — all pairs count 1 → (a,b) < (c,d)
    val m3 = Bpe.train(Seq("ab cd").toDF("text"), "text", merges = 1)
    assert(m3.head == Bpe.Merge("a", "b", 1L))
  }

  test("tokenBudget's replace chain reproduces training's own " +
    "segmentation, and handles unseen words") {
    val docs = Seq((1L, "table table scan scan scan key"),
      (2L, "scan table")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", merges = 6)
    val got = Bpe.tokenBudget(docs, "id", "text", merges)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 == 6L && got(2L)._1 == 2L)
    // after 6 merges over this tiny vocab, "scan" and "table" must
    // compress below their char counts
    assert(got(1L)._2 < 6 * 5, s"pieces must compress: ${got(1L)}")
    // unseen word: applies whatever merges fire, never crashes;
    // n_pieces <= chars
    val unseen = Bpe.tokenBudget(Seq((9L, "zzz scanner")).toDF("id", "text"),
      "id", "text", merges).collect().head
    assert(unseen.getLong(1) == 2L &&
      unseen.getLong(2) >= 2L && unseen.getLong(2) <= 3L + 7L)
    // plan shape: the application is pure string ops — no UDF, no
    // extra shuffle beyond the one doc roll-up
    val plan = Bpe.tokenBudget(docs, "id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUdf"),
      s"application must stay codegen string ops:\n$plan")
  }

  test("contracts: vocab bound, word length, separator, exhaustion") {
    val docs = Seq("aa bb").toDF("text")
    val e1 = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", merges = 1, maxVocab = 1L)
    }
    assert(e1.getMessage.contains("distinct words exceed"))
    val e2 = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", merges = 1, maxWordLen = 1)
    }
    assert(e2.getMessage.contains("maxWordLen"))
    val e3 = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", merges = 5)
    }
    assert(e3.getMessage.contains("pairs exhausted"))
    val e4 = intercept[IllegalArgumentException] {
      Bpe.train(Seq("ab ok").toDF("text"), "text", merges = 1)
    }
    assert(e4.getMessage.contains("separator"))
  }
}
