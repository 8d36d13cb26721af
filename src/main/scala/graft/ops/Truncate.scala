package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** T5 — tokenizer-aware truncation (SURVEY.md §2.6; reference:
  * truncate_text, diagnostic_group_pipeline_with_api.py:49-69).
  *
  * Reference semantics: tokenize with offsets; if the report exceeds the
  * model budget (510 tokens), keep the LAST `budget` tokens when
  * `part_of_report == "entire report"` (the diagnosis usually sits at the
  * end of a full report) and the FIRST `budget` tokens otherwise
  * (gross_or_micro / diag_or_add sections lead with the signal).
  *
  * The HF offset-mapping tokenizer is replaced by a deterministic
  * whitespace tokenizer (the documented seam, SURVEY.md §7.3): same
  * first/last-budget slicing contract, reproducible across engines. A real
  * subword tokenizer plugs in behind the same column contract.
  *
  * Implementation is pure built-ins (`split`/`slice`/`concat_ws`/`when`) —
  * codegen'd, no UDF, array ops stay inside WholeStageCodegen.
  */
object Truncate {

  val ReferenceBudget = 510 // max_length 512 minus [CLS]/[SEP], dx_group.py:49-61

  def tokenCount(text: Column): Column =
    when(trim(text) === "", lit(0)).otherwise(size(split(trim(text), "\\s+")))

  /** Truncated text per the reference's branch logic. `budget` is the token
    * budget (510 in the reference; tests use small budgets so fixtures
    * actually truncate).
    */
  def truncateText(text: Column, partOfReport: Column, budget: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    val keepLast = concat_ws(" ", slice(toks, -budget, budget))
    val keepFirst = concat_ws(" ", slice(toks, 1, budget))
    when(n <= budget, trim(text))
      .when(partOfReport === "entire report", keepLast)
      .otherwise(keepFirst)
  }

  /** The api-pipeline variant also reports the cut point (reference returns
    * the character offset of the cut; the deterministic analog reports how
    * many tokens were dropped — same observability contract).
    */
  def truncateStruct(text: Column, partOfReport: Column, budget: Int): Column =
    struct(
      truncateText(text, partOfReport, budget).as("filtered_message"),
      greatest(tokenCount(text) - budget, lit(0)).as("offset"))
}
