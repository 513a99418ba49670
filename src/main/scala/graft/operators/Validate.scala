package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the expectations-suite shape):
  * a check list compiles to the MINIMUM number of jobs — every
  * row-predicate check on the same table folds into ONE aggregation
  * pass (conditional sums, map-side combining), uniqueness adds one
  * groupBy, referential integrity one anti-join per dimension — and the
  * result is a uniform per-check report (check, violations, passed)
  * a pipeline gate can alert on. The contract-enforcement front door of
  * a 100 TB ingest: run before anything expensive touches the batch.
  */
object Validate {

  sealed trait Check { def name: String }

  /** Column must be non-null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }

  /** Column must lie in [lo, hi] (inclusive); nulls count as violations. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range:$col"
  }

  /** Column must be one of the accepted values; nulls violate. */
  final case class Accepted(col: String, values: Seq[String]) extends Check {
    def name = s"accepted:$col"
  }

  /** Row predicate must hold (violations = rows where it is false or
    * null). */
  final case class Predicate(label: String, expr: Column) extends Check {
    def name = s"predicate:$label"
  }

  /** The key columns must be unique (violations = rows beyond the first
    * of each duplicated key). */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }

  /** Every foreign key must exist in `dim.pk` (violations = rows whose
    * non-null fk has no match; null fks pass — compose with NotNull to
    * forbid them). */
  final case class RefIntegrity(fk: String, dim: DataFrame, pk: String)
      extends Check {
    def name = s"ref:$fk"
  }

  /** `valueCol` must be non-decreasing within each key group under the
    * (orderCol, tieCol) order — the event-log sanity check (timestamps
    * never step backwards within a session, versions never regress per
    * doc). A violation is a row whose value is BELOW its predecessor's.
    * Costs one lag() window partitioned by the key columns (bounded by
    * one group's rows — the sessionize discipline, never global) — the
    * one check class that cannot fold into the shared aggregation
    * pass. */
  final case class MonotonicBy(keyCols: Seq[String], orderCol: String,
                               tieCol: String, valueCol: String)
      extends Check {
    def name = s"monotonic:$valueCol"
  }

  /** Run a check suite over one table. Returns
    * (check: string, violations: long, passed: boolean), one row per
    * check, deterministic order-independent content. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val spark = df.sparkSession

    def rowPredicate(c: Check): Option[(String, Column)] = c match {
      case NotNull(cl) => Some(c.name -> col(cl).isNotNull)
      case InRange(cl, lo, hi) =>
        Some(c.name -> (col(cl).isNotNull && col(cl) >= lo && col(cl) <= hi))
      case Accepted(cl, vs) => Some(c.name -> col(cl).isin(vs: _*))
      case Predicate(_, e) => Some(c.name -> coalesce(e, lit(false)))
      case _ => None
    }

    // all row-predicate checks: ONE aggregation pass over the table
    val preds = checks.flatMap(rowPredicate)
    val predReport: Option[DataFrame] =
      if (preds.isEmpty) None
      else {
        val aggs = preds.map { case (n, p) =>
          sum(when(p, 0L).otherwise(1L)).as(n)
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the one-row aggregate into (check, violations)
        Some(row.select(explode(array(preds.map { case (n, _) =>
          struct(lit(n).as("check"), coalesce(col(s"`$n`"), lit(0L))
            .as("violations"))
        }: _*)).as("r")).select(col("r.check"), col("r.violations")))
      }

    val others = checks.collect {
      case u @ Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("violations"))
          .select(lit(u.name).as("check"), col("violations"))
      case r @ RefIntegrity(fk, dim, pk) =>
        df.where(col(fk).isNotNull)
          .join(dim.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("check"), col("violations"))
      case m @ MonotonicBy(keys, ord, tie, vc) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(ord), col(tie))
        df.select(col(vc).as("__v"),
            lag(col(vc), 1).over(w).as("__pv"))
          .agg(sum(when(col("__pv").isNotNull && col("__v") < col("__pv"),
            1L).otherwise(0L)).as("violations"))
          .select(lit(m.name).as("check"),
            coalesce(col("violations"), lit(0L)).as("violations"))
    }

    val all = (predReport.toSeq ++ others).reduce(_ unionByName _)
    all.select(col("check"), col("violations"),
      (col("violations") === 0L).as("passed"))
  }

  /** DIALOGUE-FORMAT AUDIT per conversation — the SFT-data front-door
    * check (chat corpora are schema'd as role/content turn arrays,
    * and a single malformed transcript poisons a packed batch): a
    * VALID conversation opens with an optional `system` turn, then
    * alternates user/assistant strictly, ends on `assistant`, and
    * carries no blank contents (space-only OR NULL — both count
    * toward n_empty).
    *
    * Determinism: pure structural booleans over the turn array —
    * alternation is an exact positional fold (guarded for the
    * too-short case: Spark's `sequence(a, b)` DESCENDS when a > b, so
    * the fold never sees a reversed range), and every rule is
    * engine-replayable array arithmetic.
    *
    * Scale shape: per-row HOFs over the bounded turn array, map-only.
    * Output: (id, n_turns, has_system, head_ok, alternates,
    * ends_assistant, n_empty, valid). */
  def dialogueFormatAudit(df: DataFrame, idCol: String,
                          turnsCol: String): DataFrame = {
    val turns = col(turnsCol)
    val roles = transform(turns, t => t.getField("role"))
    val n = size(turns).cast("long")
    // try_element_at, not element_at: ANSI mode throws on the empty /
    // too-short arrays this audit exists to flag
    val hasSystem = coalesce(
      try_element_at(roles, lit(1)) === "system", lit(false))
    val offset = when(hasSystem, lit(2)).otherwise(lit(1))
    val headOk = coalesce(
      try_element_at(roles, lit(1)).isin("system", "user"), lit(false))
    val alternates = when(n >= offset.cast("long"),
      aggregate(sequence(offset, size(turns)), lit(true),
        (acc, i) => acc && try_element_at(roles, i) ===
          when(pmod(i - offset, lit(2)) === 0, lit("user"))
            .otherwise(lit("assistant")))).otherwise(lit(false))
    val endsAssistant = coalesce(
      try_element_at(roles, lit(-1)) === "assistant", lit(false))
    // coalesce-to-0: length(trim(NULL)) is NULL and a NULL predicate
    // DROPS from filter(), so a NULL content would count as non-empty
    // and the transcript could be marked valid — NULL content IS a
    // blank-content violation.
    val nEmpty = size(filter(turns,
      t => coalesce(length(trim(t.getField("content"))), lit(0)) === 0))
      .cast("long")
    df.select(col(idCol), n.as("n_turns"), hasSystem.as("has_system"),
      headOk.as("head_ok"), alternates.as("alternates"),
      endsAssistant.as("ends_assistant"), nEmpty.as("n_empty"),
      (headOk && alternates && endsAssistant && nEmpty === 0L &&
        (n - offset.cast("long") + 1L) >= 2L).as("valid"))
  }

  /** SFT RESPONSE AUDIT per conversation — the two cheap quality
    * signals instruction-data curation reads before training
    * ([[dialogueFormatAudit]] checks STRUCTURE; this checks CONTENT
    * shape): the response/prompt token-length ratio (degenerate
    * one-word answers and runaway rambles both correlate with label
    * noise) and the ECHO fraction — how much of the response's
    * distinct vocabulary is copied from the prompt (near-1 echo means
    * the "answer" just restates the question, a classic synthetic-data
    * failure). Prompt = all user turns' text, response = all
    * assistant turns'.
    *
    *   ratio_micro = 10⁶·resp_tokens / prompt_tokens (NULL when the
    *   prompt is empty); echo_micro = 10⁶·|distinct resp ∩ distinct
    *   prompt| / |distinct resp| (NULL when the response is empty).
    *
    * Scale shape: per-row HOFs over the bounded turn array, map-only.
    * Output: (id, prompt_tokens, resp_tokens, ratio_micro,
    * echo_micro). */
  def sftResponseAudit(df: DataFrame, idCol: String,
                       turnsCol: String): DataFrame = {
    def toksOf(role: String) = graft.functions.ws_tokens(
      array_join(transform(filter(col(turnsCol),
        t => t.getField("role") === role),
        t => t.getField("content")), " "))
    val p = toksOf("user")
    val r = toksOf("assistant")
    df.select(col(idCol),
        size(p).cast("long").as("prompt_tokens"),
        size(r).cast("long").as("resp_tokens"),
        size(array_intersect(array_distinct(r), array_distinct(p)))
          .cast("long").as("__hit"),
        size(array_distinct(r)).cast("long").as("__rd"))
      .select(col(idCol), col("prompt_tokens"), col("resp_tokens"),
        when(col("prompt_tokens") > 0L, call_function("div",
          col("resp_tokens") * 1000000L, col("prompt_tokens")))
          .otherwise(lit(null).cast("long")).as("ratio_micro"),
        when(col("__rd") > 0L, call_function("div",
          col("__hit") * 1000000L, col("__rd")))
          .otherwise(lit(null).cast("long")).as("echo_micro"))
  }

  /** LOSS-MASK SPANS per conversation — the SFT packing companion to
    * [[dialogueFormatAudit]]: supervised fine-tuning computes loss on
    * ASSISTANT tokens only, so the packer needs each assistant turn's
    * [start, end) token span in the concatenated transcript. One
    * sequential fold per conversation accumulates cumulative
    * whitespace-token offsets (bounded by turn count — the
    * [[graft.functions.ewma_smooth]] bounded-append shape), then the
    * assistant spans explode to rows with their turn index.
    *
    * Scale shape: per-row HOFs over the bounded turn array + one
    * explode of the assistant spans, no shuffle, no UDF.
    * Output: (id, turn_idx, start_tok, end_tok) — token offsets,
    * turn_idx 0-based over ALL turns. */
  def lossMaskSpans(df: DataFrame, idCol: String,
                    turnsCol: String): DataFrame = {
    val withTok = transform(col(turnsCol), t => struct(
      t.getField("role").as("role"),
      size(graft.functions.ws_tokens(t.getField("content")))
        .cast("long").as("tok")))
    val emptySpans = array().cast(
      "array<struct<role:string,start_tok:bigint,end_tok:bigint>>")
    val spans = aggregate(withTok,
      struct(emptySpans.as("arr"), lit(0L).as("off")),
      (acc, t) => struct(
        concat(acc.getField("arr"), array(struct(
          t.getField("role").as("role"),
          acc.getField("off").as("start_tok"),
          (acc.getField("off") + t.getField("tok")).as("end_tok"))))
          .as("arr"),
        (acc.getField("off") + t.getField("tok")).as("off")),
      acc => acc.getField("arr"))
    df.select(col(idCol), posexplode(spans))
      .where(col("col.role") === "assistant")
      .select(col(idCol), col("pos").cast("long").as("turn_idx"),
        col("col.start_tok").as("start_tok"),
        col("col.end_tok").as("end_tok"))
  }
}
