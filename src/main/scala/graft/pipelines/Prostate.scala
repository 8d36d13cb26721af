package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Inference

/** O2/J2/M3/M4 — the prostate fan-out/fan-in pipeline (SURVEY.md §2.8;
  * reference: prostate_dag.py:314-319 — `create_b >> create_segments >>
  * {lvi, hist} >> merge`, plus 4 more parallel branches).
  *
  * Spark shape: one cached common input (`persist()` — each branch would
  * otherwise recompute the QA sectioning), independent DataFrame branches,
  * fan-in as a chained equi-join on `msg_id`. All branches join on the same
  * key, and each branch output is (msg_id, pred, score): Catalyst plans the
  * fan-in as sort-merge joins on one exchange of each side — or broadcast
  * when branch outputs are small. The reference's constant predictors
  * (site_code='C61.9', behaviour='3', laterality='00', scores 1.0,
  * prostate_dag.py:167-177) stay literal columns.
  */
object Prostate {

  /** One prediction branch: name + (sectioned DF → (msg_id, pred, score)). */
  final case class Branch(name: String, f: DataFrame => DataFrame)

  private def flagBranch(name: String, section: String): Branch =
    Branch(name, df => df.select(
      col("msg_id"),
      when(col(section) =!= "", lit("1")).otherwise(lit("0")).as(name),
      when(col(section) =!= "", lit(1.0)).otherwise(lit(0.5)).as(s"${name}_pred_score")))

  private def constBranch(name: String, value: String): Branch =
    Branch(name, df => df.select(
      col("msg_id"), lit(value).as(name), lit(1.0).as(s"${name}_pred_score")))

  /** The reference's 9 prediction columns (prostate_dag.py:180-200). */
  def branches: Seq[Branch] = Seq(
    constBranch("site_code", "C61.9"),
    Branch("histology_code", df => df.select(
      col("msg_id"),
      concat(lit("81"), lpad((length(col("overall_report")) % 100).cast("string"), 2, "0")).as("histology_code"),
      lit(1.0).as("histology_code_pred_score"))),
    constBranch("behaviour_code", "3"),
    constBranch("laterality", "00"),
    flagBranch("lymph_vascular_invasion", "microscopic"),
    flagBranch("invasive_surgery_flag", "gross_description"),
    flagBranch("addendum_section_flag", "addendum"),
    flagBranch("diagnostic_procedure_flag", "diagnosis"),
    flagBranch("neoadjuvant_therapy_flag", "clinical_history"))

  /** create_segments (M3) → fan-out branches → fan-in multi-join (J2).
    * The sectioned input is persisted (via [[graft.core.Caches]]) because
    * every branch re-reads it; the harness releases it after the fan-in
    * result's terminal action via `Caches.releaseAll()`.
    */
  def run(spark: SparkSession, raw: DataFrame,
          idCol: String = "doc_id", textCol: String = "text",
          questions: Seq[Inference.QaQuestion] = Inference.prostateQuestions): DataFrame = {
    val sectioned = graft.core.Caches.track(Inference.answerQuestions(
      raw.select(col(idCol).as("msg_id"), col(textCol)), textCol, questions))
    branches.map(_.f(sectioned)).reduce((a, b) => a.join(b, Seq("msg_id")))
  }
}
