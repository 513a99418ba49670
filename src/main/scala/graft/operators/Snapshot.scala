package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Incremental corpus maintenance: diff two corpus snapshots.
  *
  * A continuously-rebuilt training corpus is re-crawled / re-filtered per
  * release; downstream stages (tokenization, dedup state, index shards)
  * only want the DELTA. `delta` classifies every doc id across two
  * versions as added / removed / changed / unchanged with ONE full-outer
  * hash join: both sides reduce to (id, content-hash) before the shuffle,
  * so the join carries two longs per doc regardless of document size —
  * the same fingerprint-not-payload discipline as the memoization
  * anti-join (Pipeline.scala) that this generalizes bidirectionally.
  * Content equality is null-safe: a doc with NULL text in both snapshots
  * is unchanged.
  */
object Snapshot {

  def delta(prev: DataFrame, cur: DataFrame,
            idCol: String, textCol: String): DataFrame =
    delta(prev, cur, idCol, md5_long(col(textCol)))

  /** [[delta]] with a caller-supplied content fingerprint expression —
    * any deterministic Column over each side's rows (e.g.
    * [[vecFingerprint]] for embedding snapshots). */
  def delta(prev: DataFrame, cur: DataFrame,
            idCol: String, fingerprint: org.apache.spark.sql.Column): DataFrame = {
    val p = prev.select(col(idCol).as("id"), fingerprint.as("h_prev"),
      lit(true).as("in_prev"))
    val c = cur.select(col(idCol).as("id"), fingerprint.as("h_cur"),
      lit(true).as("in_cur"))
    p.join(c, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        when(col("in_prev").isNull, lit("added"))
          .when(col("in_cur").isNull, lit("removed"))
          .when(col("h_prev") <=> col("h_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** 60-bit content fingerprint of a float-vector column, for
    * embedding-snapshot [[delta]]s: coordinates quantize to micro-unit
    * integers BEFORE the string join (integer decimal formatting is
    * identical in every engine; float formatting is not), then hash.
    * Two longs per vector cross the delta join, never the vector.
    * NaN / infinite / out-of-quantization-range coordinates map to
    * deterministic sentinel strings instead of reaching the long cast —
    * under Spark 4's default ANSI mode casting a non-finite or
    * overflowing double to long THROWS, and a fingerprint must never
    * fail the job on a degenerate vector (coordinates beyond ±9e12
    * collapse to a signed sentinel: still deterministic, still
    * change-detecting for the finite range embeddings live in). */
  def vecFingerprint(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5_long(array_join(
      transform(v, x => {
        val d = x.cast("double")
        when(isnan(d), lit("nan"))
          .when(d > lit(9e12), lit("big"))
          .when(d < lit(-9e12), lit("-big"))
          .otherwise(floor(d * 1e6).cast("long").cast("string"))
      }),
      ","))

  /** Incremental maintenance of the banded MinHash signature index
    * ([[Dedup.bandedSignatures]]' (doc_id, band, band_sig) table — the
    * LSH bucket keys candidate generation joins on): given the previous
    * index and a [[delta]] classification, re-fingerprint ONLY
    * `added`/`changed` docs and retire `removed` ones — `unchanged`
    * docs (the overwhelming bulk of a re-crawl) keep their previous
    * signature rows untouched, so the per-release fingerprint cost is
    * O(|delta|), not O(|corpus|).
    *
    * Two joins, both keyed on doc_id: the previous index anti-joins the
    * retire list (`removed` + `changed` — `added` ids are absent from it
    * by definition), and the current corpus semi-joins the refresh list
    * (`added` + `changed`) before fingerprinting, so the tokenizer never
    * touches an unchanged document. No broadcast hint on either list: a
    * steady-state delta broadcasts via AQE's size estimate; a
    * full-churn re-crawl degrades to a shuffled anti-join instead of
    * OOMing the driver. Deterministic signatures make the result
    * EXACTLY the full rebuild on the current snapshot — the q98 oracle
    * gate replays that equality in SQL. */
  def updateSignatureIndex(prevIndex: DataFrame, delta: DataFrame,
                           cur: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, bands: Int = 8,
                           rowsPerBand: Int = 2): DataFrame = {
    val retire = delta.where(col("status").isin("removed", "changed"))
      .select(col("doc_id"))
    val refresh = delta.where(col("status").isin("added", "changed"))
      .select(col("doc_id").as(idCol))
    val kept = prevIndex.join(retire, Seq("doc_id"), "left_anti")
    val fresh = Dedup.bandedSignatures(
      cur.join(refresh, Seq(idCol), "left_semi"),
      idCol, textCol, shingleN, bands, rowsPerBand)
    kept.unionByName(fresh)
  }
  /** Start an SCD Type-2 dimension history from a first snapshot: one
    * OPEN row per key (valid_from = version, valid_to = null), content
    * summarized by the 60-bit md5 fingerprint. */
  def scdInit(cur: DataFrame, idCol: String, textCol: String,
              version: Long): DataFrame =
    cur.select(col(idCol).as("doc_id"), md5_long(col(textCol)).as("h"),
      lit(version).as("valid_from"), lit(null).cast("long").as("valid_to"))

  /** SCD Type-2 history maintenance (the warehouse dimension-versioning
    * standard): fold the next snapshot into the history — open rows
    * whose key disappeared or changed CLOSE at `version`, added/changed
    * keys OPEN a new row, unchanged rows pass through untouched. Every
    * doc's full validity timeline is reconstructable; as-of queries
    * (`valid_from <= v < coalesce(valid_to, inf)`) read any historical
    * version without storing the corpus per release.
    *
    * Scale shape: the [[delta]] discipline — only OPEN rows join the
    * snapshot, both sides reduced to (id, fingerprint) before the
    * shuffle (two longs per doc regardless of document size); the
    * CLOSED partition of the history is never read or rewritten (in a
    * deployment it lives in partitioned storage and this function's
    * output appends/replaces only the open partition + this version's
    * closures). */
  def scdApply(history: DataFrame, cur: DataFrame, idCol: String,
               textCol: String, version: Long): DataFrame = {
    val open = history.where(col("valid_to").isNull)
      .select(col("doc_id"), col("h"), col("valid_from"),
        lit(true).as("in_open"))
    val closed = history.where(col("valid_to").isNotNull)
    val c = cur.select(col(idCol).as("doc_id"),
      md5_long(col(textCol)).as("h_cur"), lit(true).as("in_cur"))
    val j = open.join(c, Seq("doc_id"), "full_outer")
    val kept = j
      .where(col("in_open").isNotNull && col("in_cur").isNotNull &&
        col("h") === col("h_cur"))
      .select(col("doc_id"), col("h"), col("valid_from"),
        lit(null).cast("long").as("valid_to"))
    val closedNow = j
      .where(col("in_open").isNotNull &&
        (col("in_cur").isNull || col("h") =!= col("h_cur")))
      .select(col("doc_id"), col("h"), col("valid_from"),
        lit(version).as("valid_to"))
    val opened = j
      .where(col("in_cur").isNotNull &&
        (col("in_open").isNull || col("h") =!= col("h_cur")))
      .select(col("doc_id"), col("h_cur").as("h"),
        lit(version).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    closed.select(col("doc_id"), col("h"), col("valid_from"), col("valid_to"))
      .unionByName(kept).unionByName(closedNow).unionByName(opened)
  }

  /** As-of read of an SCD Type-2 history: the corpus fingerprint set as
    * it stood at `version` — rows whose validity interval
    * [valid_from, valid_to) contains it (open rows = to infinity). The
    * payoff of the timeline: any historical corpus version
    * reconstructs from the history alone, without storing the corpus
    * per release (gate q164 proves the read equals the actual
    * snapshot). One filter over the history — at scale a partition
    * prune on the closed/open layout, no join at all. */
  def scdAsOf(history: DataFrame, version: Long): DataFrame =
    history.where(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .select(col("doc_id"), col("h"))

  /** GOLDEN-RECORD survivorship merge — the entity-resolution tail
    * step: duplicate clusters in, ONE merged record per entity out,
    * each attribute surviving from the MOST RECENT row where it is
    * non-null (the standard MDM "latest non-null wins" rule — a stale
    * record's filled field beats a fresh record's missing one).
    *
    * Shape: ONE decomposable aggregation — per attribute a
    * `max_by(attr, order-struct-if-non-null)` (the NULL ordering key
    * makes null-attribute rows invisible to that attribute's pick
    * without filtering the row out of the others), plus min(id) as the
    * canonical representative and the member count. The order columns
    * must make rows unique within a cluster (e.g. (ts, event_id)) so
    * the pick is deterministic — the same contract every sequence
    * operator here documents. Map-side combining, shuffle bounded by
    * cluster cardinality; no window, no second pass per attribute.
    * Output: (cluster, n_members, canonical_id, <attrCols...>). */
  def goldenRecords(df: DataFrame, clusterCol: String, idCol: String,
                    orderCols: Seq[String],
                    attrCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "goldenRecords needs order columns")
    require(attrCols.nonEmpty, "goldenRecords needs attribute columns")
    val ord = struct(orderCols.map(col): _*)
    val picks = attrCols.map { a =>
      max_by(col(a), when(col(a).isNotNull, ord)).as(a)
    }
    df.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"),
        (min(col(idCol)).as("canonical_id") +: picks): _*)
  }
}
