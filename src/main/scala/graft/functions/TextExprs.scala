package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text expressions for the LLM-data operators.
  *
  * Why custom expressions instead of `split`/`transform`/`aggregate`
  * compositions: Catalyst's CollapseProject freely re-inlines aliased
  * subexpressions into higher-order-function lambdas, where they are then
  * re-evaluated once per array element (and `StringSplit` recompiles its
  * regex on every call). A composed shingle+minhash pipeline degenerated to
  * O(shingles x tokenize) per row. Each expression below evaluates its
  * child exactly once per row and runs a tight primitive loop, so plan-level
  * inlining cannot multiply work.
  */

object TextKernels {
  val ws = java.util.regex.Pattern.compile("\\s+")

  def tokenize(text: String): Array[String] =
    ws.split(text.toLowerCase(Locale.ROOT)).filter(_.nonEmpty)

  // MessageDigest.getInstance does a provider lookup + allocation on
  // EVERY call (~µs) — measured as the top cost of the md5-bound
  // operators (sketch builds/probes hash hundreds of thousands of
  // shingles per scan). One digest per task thread; digest() leaves the
  // instance reset for the next call.
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of MD5 as a non-negative long — identical to
    * `conv(substring(md5(s),1,15),16,10)` and the DuckDB oracle's
    * `('0x' || substr(md5(s),1,15))::BIGINT`. */
  def md5Long(s: String): Long =
    md5Long(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Same hash over raw UTF-8 bytes — the expression-side entry point:
    * `UTF8String.getBytes` hands these over without the decode+re-encode
    * round trip of `.toString.getBytes`. */
  def md5Long(bytes: Array[Byte]): Long = {
    val d = mdPool.get().digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

/** Lower-cased whitespace tokens, empties dropped (precompiled pattern). */
case class Tokenize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tokenize needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = TextKernels.tokenize(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(toks.map(UTF8String.fromString(_): Any))
  }
  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Word n-gram shingles joined with single spaces; `distinct` dedups while
  * preserving first-occurrence order (matches `array_distinct`). */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs array<string>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = Array.tabulate(m)(i => arr.getUTF8String(i).toString)
    val count = m - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val sb = new java.lang.StringBuilder
      val out = new Array[String](count)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      val res: Array[String] =
        if (distinct) {
          val seen = new java.util.LinkedHashSet[String]()
          out.foreach(seen.add)
          seen.toArray(new Array[String](seen.size))
        } else out
      new GenericArrayData(res.map(UTF8String.fromString(_): Any))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Per-position scoring keys for an order-`n` language model: for each
  * token position i (0-based) the space-joined gram of the up-to-`n`
  * tokens ENDING at i — full n-grams once i ≥ n−1, the shorter
  * available prefix ramp before that (the KenLM scoring convention:
  * every token gets scored, doc starts with truncated context). One
  * output element per input token; single pass, shared StringBuilder. */
case class NgramContextKeys(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_context_keys"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_context_keys needs array<string>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = Array.tabulate(m)(i => arr.getUTF8String(i).toString)
    val sb = new java.lang.StringBuilder
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = math.max(0, i - n + 1)
      while (j <= i) {
        if (j > math.max(0, i - n + 1)) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(
      newChild: Expression): NgramContextKeys = copy(child = newChild)
}

/** One BPE merge application: greedy left-to-right single pass over a
  * symbol array replacing every adjacent (a, b) occurrence with the
  * concatenation a+b; after a merge the scan resumes PAST the merged
  * pair (subword-nmt semantics — the merged symbol is not re-considered
  * as a left side within the same pass). O(n) per word, plan-literal
  * pair so the comparison is two pointer-equality-fast UTF8 compares. */
case class MergeAdjacentPair(child: Expression, a: String, b: String)
    extends UnaryExpression with CodegenFallback {
  require(a.nonEmpty && b.nonEmpty, "merge pair symbols must be non-empty")
  private val ua = UTF8String.fromString(a)
  private val ub = UTF8String.fromString(b)
  private val merged = UTF8String.fromString(a + b)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "merge_adjacent_pair"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"merge_adjacent_pair needs array<string>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new java.util.ArrayList[Any](m)
    var i = 0
    while (i < m) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < m && cur == ua && arr.getUTF8String(i + 1) == ub) {
        out.add(merged)
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): MergeAdjacentPair =
    copy(child = newChild)
}

/** md5-based 60-bit hash of a string (see TextKernels.md5Long). */
case class Md5Long(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_long needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.md5Long(input.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

/** MinHash signature over a shingle array: one md5 per shingle, then for
  * each permutation i the min of (a_i*h + b_i) mod p. h = md5Long mod p.
  * Permutation constants must come from `graft.functions.minhashPerms`
  * (fixed seed) so the SQL oracle can reproduce them. */
case class MinHashSignature(child: Expression, perms: Seq[(Long, Long)], prime: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature needs array<string>, got $t")
  }
  @transient private lazy val pa = perms.map(_._1).toArray
  @transient private lazy val pb = perms.map(_._2).toArray
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val k = pa.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = TextKernels.md5Long(arr.getUTF8String(i).getBytes) % prime
      var p = 0
      while (p < k) {
        val v = (pa(p) * h + pb(p)) % prime
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 32-bit SimHash over a token array (multiplicity counts): bit j of the
  * result is set iff sum over tokens of (2*bit_j(md5Long(token)) - 1) > 0. */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash32 needs array<string>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val votes = new Array[Long](32)
    var i = 0
    while (i < m) {
      val h = TextKernels.md5Long(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < 32) {
        votes(j) += ((h >> j) & 1L) * 2 - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Jaccard similarity of two SORTED distinct long arrays via a single
  * merge scan — |intersection| / |union| with no per-pair hash-set
  * allocation (`array_intersect`/`array_union` build hash sets per pair;
  * in a blocked self-join that is per-candidate-pair work). Inputs must be
  * sorted ascending and distinct (stage `array_sort` once per document
  * BEFORE the pair join). Returns the same value as the set formulation.
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"jaccard_sorted needs two array<long>, got $t")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedLongs =
    copy(left = l, right = r)
}

/** Sequential-fold dot product of two numeric arrays in doubles — the same
  * IEEE sequence as `aggregate(zip_with(a,b,*), 0.0, +)` and the DuckDB
  * oracle's `list_reduce(list_transform(...), +)`, but one pass, no
  * per-element allocation. Null if lengths differ. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_dot needs two float/double arrays, got $t")
  }
  private def get(arr: ArrayData, dt: DataType, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += get(a, left.dataType, i) * get(b, right.dataType, i); i += 1 }
      s
    }
  }
  // Real codegen (not CodegenFallback): the dot product is the innermost
  // loop of every cosine pair join, and staying inside whole-stage codegen
  // avoids a boxed InternalRow round-trip per row.
  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      def elem(v: String, dt: DataType) = dt match {
        case ArrayType(FloatType, _) => s"(double) $v.getFloat($i)"
        case _ => s"$v.getDouble($i)"
      }
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${elem(a, left.dataType)} * ${elem(b, right.dataType)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Threshold-pruned Jaccard over two SORTED distinct long arrays: merge
  * scan with an exact upper-bound bail-out — J_max = (inter + min(rem)) /
  * (n + m - inter - min(rem)) is monotone in the final intersection, so
  * once it drops below the threshold no suffix can reach it. Returns null
  * below the threshold (never a wrong value: the bound is exact), which
  * makes the common non-duplicate pair O(gap) instead of O(n+m) in a
  * blocked self-join.
  */
case class JaccardThresholdLongs(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_threshold"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"jaccard_threshold needs two array<long>, got $t")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return if (threshold <= 0.0) Double.box(0.0) else null
    // size-ratio bound: J <= min/max
    if (math.min(n, m).toDouble < threshold * math.max(n, m)) return null
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        val rem = math.min(n - i, m - j)
        val maxInter = inter + rem
        if (maxInter.toDouble < threshold * (n + m - maxInter)) return null
      }
    }
    val jac = inter.toDouble / (n + m - inter)
    if (jac >= threshold) Double.box(jac) else null
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardThresholdLongs =
    copy(left = l, right = r)
}

/** Threshold-pruned CONTAINMENT of the left sorted distinct long array
  * in the right one: C(A→B) = |A∩B| / |A| — the asymmetric sibling of
  * [[JaccardThresholdLongs]], the signal for "this doc is a
  * boilerplate-wrapped copy of that one", which symmetric Jaccard
  * misses when the wrapper dwarfs the payload. Same merge-scan with an
  * exact upper-bound bail-out (inter + min remaining < t·|A| ⇒ no
  * suffix can reach the threshold); returns null below the threshold,
  * never a wrong value. Empty A (or B) is null — containment of
  * nothing is undefined, and callers' shingle scans drop empties.
  */
case class ContainmentThresholdLongs(left: Expression, right: Expression,
                                     threshold: Double)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "containment_threshold"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"containment_threshold needs two array<long>, got $t")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // null elements are undefined set members: SQL NULL, never garbage
    if (ArrayNulls.anyNull(a) || ArrayNulls.anyNull(b)) return null
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return null
    // the intersection can never exceed |B|
    if (m.toDouble < threshold * n) return null
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        val maxInter = inter + math.min(n - i, m - j)
        if (maxInter.toDouble < threshold * n) return null
      }
    }
    val c = inter.toDouble / n
    if (c >= threshold) Double.box(c) else null
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ContainmentThresholdLongs =
    copy(left = l, right = r)
}

/** Sliding token-window chunk spans in ONE pass over the token array:
  * windows of `chunkTokens` advancing by `chunkTokens - overlap`, the
  * last truncated at the document end, trailing starts that would only
  * re-cover the previous window's overlap region dropped. Emits one
  * struct<start, end, hash> per chunk (hash = md5Long of the
  * space-joined window — identical to `md5_long(array_join(slice(...),
  * ' '))`). A composed sequence/filter/slice formulation references the
  * token array from several columns, and CollapseProject re-inlines the
  * tokenizer into each (measured 8x in the q76 plan); here the child is
  * evaluated exactly once. */
case class ChunkSpans(child: Expression, chunkTokens: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback {
  require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
    s"chunk_spans needs 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
  private val stride = chunkTokens - overlap

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "chunk_spans"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"chunk_spans needs array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = Array.tabulate(n)(i => arr.getUTF8String(i).toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sb = new java.lang.StringBuilder
    var s0 = 0
    while (s0 < n && (s0 == 0 || s0 < n - overlap)) {
      val e = math.min(s0 + chunkTokens, n)
      sb.setLength(0)
      var j = s0
      while (j < e) {
        if (j > s0) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val h = TextKernels.md5Long(sb.toString)
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](s0.toLong, e.toLong, h))
      s0 += stride
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): ChunkSpans =
    copy(child = newChild)
}

/** MinHash signature from a PRE-HASHED shingle set (raw 60-bit md5Long
  * values, as built for the Jaccard verification sets): h mod p, then for
  * each permutation i the min of (a_i*h + b_i) mod p — bit-identical to
  * [[MinHashSignature]] over the shingle strings the hashes came from.
  * Exists so one corpus scan can feed BOTH sides of the LSH pipeline
  * (signatures for banding, sorted hash sets for verification) instead of
  * re-tokenizing per consumer; cf. reference dpl/processor/nodes (each
  * node re-reads its inputs — here one materialized scan serves all). */
case class MinHashSignatureFromHashes(child: Expression, perms: Seq[(Long, Long)],
                                      prime: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_from_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig_from_hashes needs array<long>, got $t")
  }
  @transient private lazy val pa = perms.map(_._1).toArray
  @transient private lazy val pb = perms.map(_._2).toArray
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val k = pa.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = arr.getLong(i) % prime
      var p = 0
      while (p < k) {
        val v = (pa(p) * h + pb(p)) % prime
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureFromHashes =
    copy(child = newChild)
}

/** All token-derived quality-classifier features in ONE pass over the
  * document: tokenize once, then count tokens / token code points /
  * letter-bearing tokens / stopword tokens in a single loop, plus a
  * char-level digit count over the ORIGINAL (un-lowercased) text — the
  * feature set of the classifier gate (DCLM, FineWeb-Edu). A composed
  * `size(filter(toks, ...))` formulation references the staged token
  * array from four feature columns and CollapseProject re-inlines the
  * tokenizer into each (plan-audited 4x per doc before this expression).
  * Field semantics are pinned to the built-ins they replace:
  * `sum_tok_len` = sum of `length(tok)` (code points), `n_alpha` =
  * tokens where `rlike('\p{L}')` finds a letter, `n_stop` = tokens in
  * the stopword set (exact equality), `n_chars` = `length(text)`,
  * `n_digit` = `length(text) - length(regexp_replace(text,'[0-9]',''))`
  * (ASCII digits are single code points, so a char scan is identical).
  * NULL text nulls the whole struct. */
case class QualityFeatures(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false)))
  override def prettyName: String = "quality_features"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"quality_features needs string, got $t")
  }
  @transient private lazy val stopSet: Set[String] = stopwords.toSet
  @transient private lazy val alphaPattern =
    java.util.regex.Pattern.compile("\\p{L}")
  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = TextKernels.tokenize(text)
    var sumLen = 0L; var nAlpha = 0L; var nStop = 0L
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      sumLen += tok.codePointCount(0, tok.length)
      if (alphaPattern.matcher(tok).find()) nAlpha += 1
      if (stopSet.contains(tok)) nStop += 1
      t += 1
    }
    var nDigit = 0L
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= '0' && c <= '9') nDigit += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, sumLen, nAlpha, nStop,
      text.codePointCount(0, text.length).toLong, nDigit))
  }
  override protected def withNewChildInternal(newChild: Expression): QualityFeatures =
    copy(child = newChild)
}

/** Hashing-trick bucket histogram of a document in ONE pass: tokenize,
  * hash each token (md5Long mod `dim` — identical to
  * `pmod(md5_long(tok), dim)` over `ws_tokens`), and count per bucket in
  * a single LinkedHashMap walk, emitting array<struct<dim, cnt>> in
  * first-occurrence bucket order (what `array_distinct` over the hashed
  * token array produced). Replaces the composed
  * `transform(array_distinct(dims), d -> size(filter(dims, _ == d)))`
  * shape, which tokenized twice and paid O(tokens x distinct buckets)
  * per document — quadratic for long documents; this is O(tokens).
  * Zero-count buckets stay absent; NULL text nulls the array (and an
  * explode drops the row, as before). */
case class HashBucketCounts(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim >= 2 && dim <= (1 << 24), s"hash_bucket_counts dim out of range: $dim")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dim", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "hash_bucket_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hash_bucket_counts needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = TextKernels.tokenize(input.asInstanceOf[UTF8String].toString)
    val counts = new java.util.LinkedHashMap[Long, Long]()
    var i = 0
    while (i < toks.length) {
      val b = TextKernels.md5Long(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)) % dim
      counts.put(b, counts.getOrDefault(b, 0L) + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): HashBucketCounts =
    copy(child = newChild)
}

/** Remove the tokens covered by any [start, end) span in ONE walk:
  * spans are sorted by start internally (collect_list order is
  * partition-dependent — the expression must not be), then a single
  * merged sweep keeps every token outside the span union —
  * O(tokens + spans log spans), where a per-token `exists(spans, ...)`
  * HOF would be O(tokens x spans) (the streamingVectorize lesson). NULL
  * token array nulls the result; a NULL span array (a doc with no
  * duplicate spans, via left join) keeps every token. */
case class RemoveTokenSpans(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "remove_token_spans"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StructType(fs), _))
      if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"remove_token_spans needs (array<string>, array<struct<long,long>>), got $t")
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toksV = left.eval(input)
    if (toksV == null) return null
    val toks = toksV.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val spansV = right.eval(input)
    if (spansV == null) return toks.copy()
    val spans = spansV.asInstanceOf[ArrayData]
    val m = spans.numElements()
    val se = Array.tabulate(m) { i =>
      val r = spans.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0L; var s = 0
    var coveredUntil = Long.MinValue
    while (i < n) {
      while (s < m && se(s)._1 <= i) {
        if (se(s)._2 > coveredUntil) coveredUntil = se(s)._2
        s += 1
      }
      if (i >= coveredUntil) out += toks.getUTF8String(i.toInt)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RemoveTokenSpans =
    copy(left = l, right = r)
}

/** Best fixed-width token window by hit count: given the token positions
  * of query-term hits and a window width, return (start, cnt) for the
  * width-token window anchored at a hit position that covers the most
  * hits; ties break to the SMALLEST start. One two-pointer sweep over
  * the sorted positions — O(hits), where the HOF count-per-anchor form
  * is O(hits^2) and a term-spammy document (thousands of hits) would go
  * quadratic inside a lambda. NULL or empty hits (and non-positive
  * width) -> NULL: a document with no hits has no window, and NULL
  * degrades out of downstream snippet assembly (the repo's
  * malformed-rows-drop posture). */
case class BestTokenWindow(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "best_token_window"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType | IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"best_token_window needs (array<long>, int/long width), got $t")
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val hv = left.eval(input)
    if (hv == null) return null
    val wv = right.eval(input)
    if (wv == null) return null
    val w = wv match { case i: java.lang.Integer => i.toLong
                       case l: java.lang.Long => l.longValue() }
    if (w <= 0) return null
    val arr = hv.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val hb = scala.collection.mutable.ArrayBuffer.empty[Long]
    var x = 0
    while (x < m) { if (!arr.isNullAt(x)) hb += arr.getLong(x); x += 1 }
    if (hb.isEmpty) return null
    val h = hb.toArray.sorted
    var bestI = 0; var bestCnt = 0
    var i = 0; var j = 0
    while (i < h.length) {
      if (j < i) j = i
      while (j < h.length && h(j) < h(i) + w) j += 1
      if (j - i > bestCnt) { bestCnt = j - i; bestI = i }
      i += 1
    }
    new GenericInternalRow(Array[Any](h(bestI), bestCnt.toLong))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BestTokenWindow =
    copy(left = l, right = r)
}

/** Minimum token gap between two hit-position lists — the proximity /
  * phrase predicate of a search stack: unordered (`ordered = false`)
  * min |a - b|, or ordered (`ordered = true`) min (b - a) over pairs
  * with b strictly after a. One merge sweep over the two sorted lists —
  * O(m + n), where the pairwise HOF spelling is O(m*n) and two common
  * terms in a long document make that quadratic. NULL or empty either
  * side -> NULL (no pair, degrades out of a keep-filter). */
case class MinPosGap(left: Expression, right: Expression, ordered: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_pos_gap"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_pos_gap needs (array<long>, array<long>), got $t")
  }
  private def sortedLongs(v: Any): Array[Long] = {
    val arr = v.asInstanceOf[ArrayData]
    val b = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) b += arr.getLong(i); i += 1
    }
    b.toArray.sorted
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val av = left.eval(input); if (av == null) return null
    val bv = right.eval(input); if (bv == null) return null
    val a = sortedLongs(av); val b = sortedLongs(bv)
    if (a.isEmpty || b.isEmpty) return null
    var best = Long.MaxValue
    var i = 0; var j = 0
    if (ordered) {
      // for each b(j), the largest a(i) strictly below it
      while (j < b.length) {
        while (i < a.length && a(i) < b(j)) i += 1
        if (i > 0 && b(j) - a(i - 1) < best) best = b(j) - a(i - 1)
        j += 1
      }
      if (best == Long.MaxValue) return null // every b at or before every a
    } else {
      while (i < a.length && j < b.length) {
        val d = math.abs(a(i) - b(j))
        if (d < best) best = d
        if (a(i) < b(j)) i += 1 else j += 1
      }
    }
    best
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinPosGap =
    copy(left = l, right = r)
}

/** Aho–Corasick multi-pattern automaton with `replace()`-equivalent
  * per-term counting: ONE pass over the text finds every dictionary
  * term, regardless of dictionary size.
  *
  * Counting rule: for each term independently, occurrences are accepted
  * greedily left-to-right and may not overlap a previously accepted
  * occurrence of the SAME term — exactly the occurrences SQL
  * `replace(text, term, '')` removes, so
  * `(len(text) - len(replace(text, term, ''))) / len(term)` is an exact
  * oracle for any term (even self-overlapping ones like "aaa").
  * Occurrences of DIFFERENT terms count independently (a position can
  * contribute to many terms).
  *
  * Scale shape: the naive plan is a docs × dictionary nested-loop
  * (one `contains` scan per term per doc — what the oracle does); this
  * automaton is O(text + matches) per doc with the dictionary folded
  * into a trie, so a 1M-term gazetteer costs the same scan as a 10-term
  * one. The trie is built lazily once per expression instance
  * (per task after deserialization), never per row.
  */
final class AhoCorasick(val terms: Array[String]) extends Serializable {
  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "AhoCorasick needs non-empty terms")
  require(terms.distinct.length == terms.length,
    "AhoCorasick terms must be distinct")
  private val termLen: Array[Int] = terms.map(_.length)

  // trie: children maps + the (unique) term id ending at each node
  private val children =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
  private val endsTerm = scala.collection.mutable.ArrayBuffer(-1)
  terms.zipWithIndex.foreach { case (t, id) =>
    var s = 0
    var i = 0
    while (i < t.length) {
      val m = children(s)
      val nxt = m.get(Character.valueOf(t.charAt(i)))
      if (nxt == null) {
        children += new java.util.HashMap[Character, Integer]()
        endsTerm += -1
        m.put(Character.valueOf(t.charAt(i)), Integer.valueOf(children.size - 1))
        s = children.size - 1
      } else s = nxt.intValue()
      i += 1
    }
    endsTerm(s) = id
  }

  private val nNodes = children.size
  private val fail = new Array[Int](nNodes)
  // nearest proper-suffix node that ends a term: walking this chain from
  // a state enumerates every term ending at the current position
  private val outLink = Array.fill(nNodes)(-1)
  locally { // BFS over the trie sets fail + outLink level by level
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, v) => fail(v.intValue()) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outLink(u) =
        if (endsTerm(fail(u)) >= 0) fail(u) else outLink(fail(u))
      children(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(c)) f = fail(f)
        val fc = children(f).get(c)
        fail(v.intValue()) = if (fc != null && fc.intValue() != v.intValue())
          fc.intValue() else 0
        queue.add(v)
      }
    }
  }

  /** Per-term non-overlapping occurrence counts (index-aligned with
    * `terms`); one left-to-right scan. */
  def countsNonOverlapping(text: String): Array[Long] = {
    val cnt = new Array[Long](terms.length)
    val lastEnd = new Array[Int](terms.length) // exclusive end of last hit
    var s = 0
    var pos = 0
    while (pos < text.length) {
      val c = Character.valueOf(text.charAt(pos))
      while (s != 0 && !children(s).containsKey(c)) s = fail(s)
      val nxt = children(s).get(c)
      s = if (nxt == null) 0 else nxt.intValue()
      var m = if (endsTerm(s) >= 0) s else outLink(s)
      while (m >= 0) {
        val id = endsTerm(m)
        val end = pos + 1
        if (end - termLen(id) >= lastEnd(id)) { // greedy non-overlap
          cnt(id) += 1L
          lastEnd(id) = end
        }
        m = outLink(m)
      }
      pos += 1
    }
    cnt
  }
}

/** Dictionary tagging: per-term non-overlapping occurrence counts of a
  * plan-literal term list in one [[AhoCorasick]] pass over the text.
  * Returns `array<struct<term, cnt>>` for terms with cnt > 0, in
  * dictionary order. The term list is a bounded, plan-literal roster
  * (the Bloom/centroid pattern) — typically a collected top-k
  * vocabulary or a curated gazetteer, never data-sized. */
case class DictMatchCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(terms.nonEmpty, "dict_match_counts needs at least one term")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "dict_match_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dict_match_counts needs string, got $t")
  }

  @transient private lazy val ac = new AhoCorasick(terms.toArray)
  @transient private lazy val termUtf8 =
    terms.map(t => UTF8String.fromString(t)).toArray

  override def nullSafeEval(input: Any): Any = {
    val cnt = ac.countsNonOverlapping(input.asInstanceOf[UTF8String].toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < cnt.length) {
      if (cnt(i) > 0L)
        out += new GenericInternalRow(Array[Any](termUtf8(i), cnt(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): DictMatchCounts =
    copy(child = newChild)
}

/** Token-bucket rate-limiter REPLAY over one entity's sorted event
  * times (epoch micros): the deterministic integer simulation an
  * abuse-detection / quota-audit pass runs to ask "which of this key's
  * requests would policy X have granted?". All state in milli-tokens:
  *
  *   refill  = dt_us * refillMilliPerSec / 1_000_000   (floor)
  *   tokens' = min(capacityMilli, tokens + refill)
  *   grant   = tokens' >= costMilli  (then tokens' -= costMilli)
  *
  * starting from a full bucket (`ticksPerSecond` sets the time unit:
  * 1e6 for micros, 1e9 for nanos). Pure long arithmetic (dt·refill
  * stays far inside int64 for sane rates), one pass, O(n) per entity —
  * engine-exact against a list_reduce replay. Returns
  * struct<granted, denied, tokens_milli>. */
case class TokenBucket(child: Expression, capacityMilli: Long,
                       refillMilliPerSec: Long, costMilli: Long,
                       ticksPerSecond: Long = 1000000L)
    extends UnaryExpression with CodegenFallback {
  require(capacityMilli > 0 && refillMilliPerSec >= 0 && costMilli > 0
      && ticksPerSecond > 0,
    s"token_bucket needs capacity/cost/ticksPerSecond > 0 and refill >= 0")

  override def dataType: DataType = StructType(Seq(
    StructField("granted", LongType, nullable = false),
    StructField("denied", LongType, nullable = false),
    StructField("tokens_milli", LongType, nullable = false)))
  override def prettyName: String = "token_bucket"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_bucket needs array<long> (sorted epoch micros), got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var tokens = capacityMilli
    var granted = 0L
    var denied = 0L
    var prev = -1L
    var i = 0
    while (i < n) {
      val us = arr.getLong(i)
      if (prev >= 0L) {
        val refill = (us - prev) * refillMilliPerSec / ticksPerSecond
        tokens = math.min(capacityMilli, tokens + refill)
      }
      if (tokens >= costMilli) { tokens -= costMilli; granted += 1L }
      else denied += 1L
      prev = us
      i += 1
    }
    new GenericInternalRow(Array[Any](granted, denied, tokens))
  }
  override protected def withNewChildInternal(newChild: Expression): TokenBucket =
    copy(child = newChild)
}

/** First-fit-decreasing bin assignment over a PRE-SORTED token-count
  * array: position i of the input (already ordered tokens-desc by the
  * caller) gets the first bin whose load + tokens(i) fits `capacity`,
  * else opens a new bin; returns the per-position bin ids. One tight
  * O(n·bins) primitive loop per row — the `aggregate` HOF formulation
  * re-evaluates the first-fit scan once per array element of every
  * step's load-update lambda (measured 163 s at sf0.1 where this
  * expression runs the identical fold in under a second). Inputs are
  * validated by the operator ([[graft.operators.TextAnalysis
  * .packFirstFitDecreasing]]): tokens ∈ [1, capacity]. */
case class FfdPack(child: Expression, capacity: Long)
    extends UnaryExpression with CodegenFallback {
  require(capacity >= 1L, s"ffd_pack needs capacity >= 1, got $capacity")
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ffd_pack"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"ffd_pack needs array<long>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Int](n)
    val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < n) {
      val tok = arr.getLong(i)
      var b = 0
      while (b < loads.length && loads(b) + tok > capacity) b += 1
      if (b < loads.length) loads(b) += tok else loads += tok
      out(i) = b
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): FfdPack =
    copy(child = newChild)
}

/** Content-defined chunk spans by an md5 cut rule: position i (1-based,
  * i >= window) cuts AFTER i when md5Long(text[i-window+1 .. i]) mod
  * modulus == 0 — cut points depend only on the LOCAL window, the
  * property that makes chunk identity survive inserts/deletes upstream
  * (the dedup-storage CDC recipe; gear/Rabin hashes are cheaper but
  * md5 is the engine-replayable choice, swappable behind this same
  * span interface). Every chunk emits struct<start, len, hash> with
  * hash = md5Long of the chunk text. One pass per row; empty text
  * yields no chunks. */
case class CdcChunks(child: Expression, window: Int, modulus: Long)
    extends UnaryExpression with CodegenFallback {
  require(window >= 1 && modulus >= 1,
    s"cdc_chunks needs window >= 1 and modulus >= 1, got $window/$modulus")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = window
    while (i <= n) {
      val h = TextKernels.md5Long(text.substring(i - window, i))
      if (java.lang.Math.floorMod(h, modulus) == 0L) {
        out += new GenericInternalRow(Array[Any](start.toLong,
          (i - start).toLong,
          TextKernels.md5Long(text.substring(start, i))))
        start = i
      }
      i += 1
    }
    if (start < n)
      out += new GenericInternalRow(Array[Any](start.toLong,
        (n - start).toLong,
        TextKernels.md5Long(text.substring(start, n))))
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** The UAX-29-subset segmentation rule set shared by [[Uax29Tokens]] and
  * [[Uax29Sentences]] — a DETERMINISTIC, oracle-replayable subset of
  * Unicode TR-29 word/sentence breaking (the full standard needs
  * dictionaries for CJK/Thai; this subset is the practical
  * StandardTokenizer-style behavior):
  *
  * Words —
  *  - a char of script Han, Hiragana, Katakana or Thai is ONE token by
  *    itself (scriptio-continua scripts carry no space boundaries;
  *    char-unigrams are the deterministic fallback every search engine
  *    ships without a dictionary);
  *  - a word char is `\p{L}`, `\p{Nd}`, `\p{Mn}`, `\p{Mc}` or `_`,
  *    EXCLUDING the four singleton scripts; maximal runs form tokens;
  *  - an apostrophe (U+0027 or U+2019) with word chars on BOTH sides
  *    joins its runs (UAX-29 WB6/WB7 MidLetter: "don't" is one token);
  *  - everything else separates. No case folding — segmentation only.
  *
  * The rule set is EXACTLY the two-step regex program
  *   s1 = replace each [\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}] char
  *        with " c " ;  tokens = matches of
  *   [\p{L}\p{Nd}\p{Mn}\p{Mc}_]+(?:['U+2019][\p{L}\p{Nd}\p{Mn}\p{Mc}_]+)*
  * which RE2 (the DuckDB oracle) and java.util.regex both support with
  * identical semantics — PropertySpec pins expression == regex program
  * on random mixed-script text, the gate pins engine == oracle.
  *
  * Sentences — maximal segments matching (leftmost-first, no
  * lookaround, so RE2-safe)
  *   [^.!?]+[.!?]+["')\]”’»]*  |  [^.!?]+$
  * then trimmed of {space, \t, \n, \r} with empties dropped: a sentence
  * ends at a terminal run plus trailing closers, and the unterminated
  * tail is a sentence. Pure-terminal noise ("...") yields none. */
object Uax29Kernels {
  import java.lang.Character.{UnicodeScript => US}

  private def isSingleton(cp: Int): Boolean = {
    val s = US.of(cp)
    s == US.HAN || s == US.HIRAGANA || s == US.KATAKANA || s == US.THAI
  }

  private def isWordChar(cp: Int): Boolean = {
    if (cp == '_') return true
    val t = Character.getType(cp)
    val core = t == Character.UPPERCASE_LETTER ||
      t == Character.LOWERCASE_LETTER ||
      t == Character.TITLECASE_LETTER ||
      t == Character.MODIFIER_LETTER ||
      t == Character.OTHER_LETTER ||
      t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.NON_SPACING_MARK ||
      t == Character.COMBINING_SPACING_MARK
    core && !isSingleton(cp)
  }

  private def isApos(cp: Int): Boolean = cp == 0x27 || cp == 0x2019

  def tokens(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (isSingleton(cp)) {
        out += s.substring(i, i + w)
        i += w
      } else if (isWordChar(cp)) {
        val start = i
        i += w
        var cont = true
        while (cont && i < n) {
          val c2 = s.codePointAt(i)
          if (isWordChar(c2)) i += Character.charCount(c2)
          else if (isApos(c2)) {
            val j = i + Character.charCount(c2)
            if (j < n && isWordChar(s.codePointAt(j)))
              i = j + Character.charCount(s.codePointAt(j))
            else cont = false
          } else cont = false
        }
        out += s.substring(start, i)
      } else i += w
    }
    out.toArray
  }

  private val terminals = Set('.', '!', '?')
  private val closers = Set('"', '\'', ')', ']', '”', '’',
    '»')
  private def isTrim(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  def sentences(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      // unmatched leading terminals are skipped (neither regex
      // alternative can start on one)
      while (i < n && terminals(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !terminals(s.charAt(i))) i += 1
        if (i < n) {                       // terminal run + closers
          while (i < n && terminals(s.charAt(i))) i += 1
          while (i < n && closers(s.charAt(i))) i += 1
        }
        var a = start
        var b = i
        while (a < b && isTrim(s.charAt(a))) a += 1
        while (b > a && isTrim(s.charAt(b - 1))) b -= 1
        if (b > a) out += s.substring(a, b)
      }
    }
    out.toArray
  }
}

/** UAX-29-subset word tokens (see [[Uax29Kernels]]) — one pass per row. */
case class Uax29Tokens(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "uax29_tokens"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"uax29_tokens needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Uax29Kernels
      .tokens(input.asInstanceOf[UTF8String].toString)
      .map(UTF8String.fromString(_): Any))
  override protected def withNewChildInternal(newChild: Expression): Uax29Tokens =
    copy(child = newChild)
}

/** UAX-29-subset sentences (see [[Uax29Kernels]]) — one pass per row. */
case class Uax29Sentences(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "uax29_sentences"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"uax29_sentences needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Uax29Kernels
      .sentences(input.asInstanceOf[UTF8String].toString)
      .map(UTF8String.fromString(_): Any))
  override protected def withNewChildInternal(newChild: Expression): Uax29Sentences =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) — one
  * `java.text.Normalizer` pass per row. Conformant NFC is
  * implementation-independent (UAX-15), so the DuckDB oracle's
  * utf8proc `nfc_normalize` replays it byte-for-byte on assigned
  * codepoints. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Character-unigram Shannon entropy in integer micro-nats — the
  * gibberish/binary-spill scalar (random base64 scores near ln 64,
  * repeated-char spam near 0, natural language in between):
  *
  *   H_micro = ⌊ Σ_c cnt_c · (lnq n − lnq cnt_c) / n ⌋
  *
  * with lnq(x) = round(10⁶·ln x) HALF_UP — ONE IEEE ln per distinct
  * exact integer operand (the jsdByKey micro-log discipline), so the
  * value replays bit-for-bit from any engine's per-char counts. Counts
  * are by CODEPOINT. NULL for empty input (no distribution exists).
  * One pass per row. */
case class CharEntropyMicro(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy_micro"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_micro needs string, got $t")
  }
  private def lnq(x: Long): Long =
    BigDecimal.valueOf(math.log(x.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1L
      i += Character.charCount(cp)
    }
    val lnN = lnq(n)
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      acc += c * (lnN - lnq(c))
    }
    acc / n
  }
  override protected def withNewChildInternal(newChild: Expression): CharEntropyMicro =
    copy(child = newChild)
}

/** Gale–Church sentence-alignment beads (Gale & Church 1993, the
  * classic length-based bitext aligner) as ONE bounded DP per doc
  * pair, integral throughout so any engine replaying the same
  * recurrence reproduces every cell bit-for-bit.
  *
  * Inputs: the two sides' sentence OCTET lengths (array<long>).
  * Bead types and their fixed micro-penalties (≈ −ln(Pr_type/Pr_1:1)
  * over the paper's Table 5 priors 0.89 / 0.0099 / 0.089 / 0.011,
  * frozen as integer constants):
  *   1–1: 0   1–0 / 0–1: 4500000   2–1 / 1–2: 2302585   2–2: 4392317
  * Length-mismatch cost of a MATCHING bead covering `sa` source
  * octets vs `sb` target octets (rM = expected target/source ratio
  * ×10⁶; x = sa·rM, y = sb·10⁶):
  *   match = ⌊(y − x)² / (V·(x + y) + 1)⌋,  V = 7
  * — the paper's Gaussian-tail −log cost is ≈ δ²/2 with
  * δ² = (l₂ − l₁·c)²/(s²·l), so a quadratic-over-total-length form
  * with a frozen variance-like V = 7 keeps the SHAPE (quadratic
  * growth — a wild mismatch costs more than a deletion, which a
  * saturating cost cannot express) while staying integral: the
  * square is formed exactly (128-bit intermediate; sa, sb ≤ 10⁵ and
  * rM ≤ 4·10⁶ bound |y − x| ≤ 4·10¹¹) and floored ONCE by the
  * int64 denominator. Deletion/insertion beads (1–0 / 0–1) carry NO
  * match term — their fixed penalty alone prices them, exactly so a
  * genuinely unpairable sentence is dropped instead of force-merged.
  * DP: cost(i,j) = min over the six bead transitions;
  * ties resolve to the FIRST candidate in the order
  * [1–1, 1–0, 0–1, 2–1, 1–2, 2–2] — the backtrack re-evaluates the
  * candidates in that order and takes the first that achieves the
  * stored minimum, so the bead sequence is total-order deterministic.
  *
  * Output: the bead sequence in reading order —
  * (a_start, a_len, b_start, b_len, cost_micro) with 1-based starts
  * (NULL start for the empty side of a 1–0/0–1 bead) and cost_micro
  * the bead's ADDED cost (penalty + match). NULL for NULL inputs,
  * NULL elements, more than `maxSentences` sentences a side, or a
  * length outside [0, 10⁵] — the operator rejects all of those
  * loudly BEFORE evaluation ([[graft.operators.TextAnalysis]]
  * galeChurchAlign). O(n·m) cells, n, m ≤ maxSentences ≤ 64. */
case class GaleChurchBeads(left: Expression, right: Expression,
                           ratioMicro: Long, maxSentences: Int)
    extends BinaryExpression with CodegenFallback {
  require(ratioMicro >= 250000L && ratioMicro <= 4000000L,
    s"gale_church_beads: ratioMicro must be in [0.25e6, 4e6], got $ratioMicro")
  require(maxSentences >= 1 && maxSentences <= 64,
    s"gale_church_beads: maxSentences must be in [1, 64], got $maxSentences")
  private val P10 = 4500000L
  private val P21 = 2302585L
  private val P22 = 4392317L
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_start", LongType, nullable = true),
    StructField("a_len", LongType, nullable = false),
    StructField("b_start", LongType, nullable = true),
    StructField("b_len", LongType, nullable = false),
    StructField("cost_micro", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gale_church_beads"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"gale_church_beads needs two array<long>, got ($l, $r)")
    }
  private def lens(x: Any): Array[Long] = {
    val ad = x.asInstanceOf[ArrayData]
    if (ArrayNulls.anyNull(ad)) return null
    val a = ad.toLongArray()
    if (a.length > maxSentences || a.exists(v => v < 0L || v > 100000L))
      null
    else a
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = lens(l)
    val lb = lens(r)
    if (la == null || lb == null) return null
    val n = la.length
    val m = lb.length
    def matchMicro(sa: Long, sb: Long): Long = {
      val x = sa * ratioMicro
      val y = sb * 1000000L
      val d = BigInt(y - x)
      ((d * d) / BigInt(7L * (x + y) + 1L)).toLong
    }
    val W = m + 1
    val cost = Array.fill((n + 1) * W)(Long.MaxValue)
    cost(0) = 0L
    var i = 0
    while (i <= n) {
      var j = 0
      while (j <= m) {
        if (i + j > 0) {
          var best = Long.MaxValue
          def cand(pi: Int, pj: Int, add: Long): Unit = {
            val c = cost(pi * W + pj)
            if (c != Long.MaxValue && c + add < best) best = c + add
          }
          if (i >= 1 && j >= 1)
            cand(i - 1, j - 1, matchMicro(la(i - 1), lb(j - 1)))
          if (i >= 1) cand(i - 1, j, P10)
          if (j >= 1) cand(i, j - 1, P10)
          if (i >= 2 && j >= 1)
            cand(i - 2, j - 1,
              P21 + matchMicro(la(i - 2) + la(i - 1), lb(j - 1)))
          if (i >= 1 && j >= 2)
            cand(i - 1, j - 2,
              P21 + matchMicro(la(i - 1), lb(j - 2) + lb(j - 1)))
          if (i >= 2 && j >= 2)
            cand(i - 2, j - 2,
              P22 + matchMicro(la(i - 2) + la(i - 1),
                lb(j - 2) + lb(j - 1)))
          cost(i * W + j) = best
        }
        j += 1
      }
      i += 1
    }
    // backtrack: first candidate (fixed order) achieving the minimum
    var bi = n
    var bj = m
    var beads = List.empty[InternalRow]
    while (bi + bj > 0) {
      val cur = cost(bi * W + bj)
      def hit(pi: Int, pj: Int, add: Long): Boolean = {
        val c = cost(pi * W + pj)
        c != Long.MaxValue && c + add == cur
      }
      if (bi >= 1 && bj >= 1 &&
        hit(bi - 1, bj - 1, matchMicro(la(bi - 1), lb(bj - 1)))) {
        val add = matchMicro(la(bi - 1), lb(bj - 1))
        beads ::= InternalRow(bi.toLong, 1L, bj.toLong, 1L, add)
        bi -= 1; bj -= 1
      } else if (bi >= 1 && hit(bi - 1, bj, P10)) {
        beads ::= InternalRow(bi.toLong, 1L, null, 0L, P10)
        bi -= 1
      } else if (bj >= 1 && hit(bi, bj - 1, P10)) {
        beads ::= InternalRow(null, 0L, bj.toLong, 1L, P10)
        bj -= 1
      } else if (bi >= 2 && bj >= 1 &&
        hit(bi - 2, bj - 1,
          P21 + matchMicro(la(bi - 2) + la(bi - 1), lb(bj - 1)))) {
        beads ::= InternalRow((bi - 1).toLong, 2L, bj.toLong, 1L,
          P21 + matchMicro(la(bi - 2) + la(bi - 1), lb(bj - 1)))
        bi -= 2; bj -= 1
      } else if (bi >= 1 && bj >= 2 &&
        hit(bi - 1, bj - 2,
          P21 + matchMicro(la(bi - 1), lb(bj - 2) + lb(bj - 1)))) {
        beads ::= InternalRow(bi.toLong, 1L, (bj - 1).toLong, 2L,
          P21 + matchMicro(la(bi - 1), lb(bj - 2) + lb(bj - 1)))
        bi -= 1; bj -= 2
      } else {
        val add = P22 + matchMicro(la(bi - 2) + la(bi - 1),
          lb(bj - 2) + lb(bj - 1))
        beads ::= InternalRow((bi - 1).toLong, 2L, (bj - 1).toLong, 2L,
          add)
        bi -= 2; bj -= 2
      }
    }
    new GenericArrayData(beads.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GaleChurchBeads =
    copy(left = newLeft, right = newRight)
}
