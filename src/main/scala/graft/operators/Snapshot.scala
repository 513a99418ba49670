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
            idCol: String, textCol: String): DataFrame = {
    val p = prev.select(col(idCol).as("id"), md5_long(col(textCol)).as("h_prev"),
      lit(true).as("in_prev"))
    val c = cur.select(col(idCol).as("id"), md5_long(col(textCol)).as("h_cur"),
      lit(true).as("in_cur"))
    p.join(c, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        when(col("in_prev").isNull, lit("added"))
          .when(col("in_cur").isNull, lit("removed"))
          .when(col("h_prev") <=> col("h_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
