package graft.compliance

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One compliance checklist row (fixed schema — the only fixed-schema
  * record in the engine, so a typed Dataset is warranted; SURVEY.md §1.5). */
case class ChecklistItem(key: String, description: String, status: Boolean, notes: String)

/** Compliance operators (SURVEY.md §2.6 C1–C3; reference
  * `modules/compliance.py`). Driver-side constants + one trivial aggregate —
  * no scale concerns. */
object Checklist {

  /** C1 default checklist: 7 DPDP items + 5 GDPR items, all unchecked
    * (`modules/compliance.py:3-23`). */
  val DefaultItems: Seq[ChecklistItem] = Seq(
    ("lawful_purpose_documented", "Lawful purpose documented for processing/sharing"),
    ("consent_or_legal_basis", "Consent or other legal basis recorded"),
    ("pii_identified", "PII fields identified and cataloged"),
    ("minimization_applied", "Data minimization applied (only necessary fields retained)"),
    ("privacy_techniques", "Privacy techniques applied (SDC/DP/Synthetic)"),
    ("logging_enabled", "Logging/Audit trail enabled for data transformations"),
    ("retention_policy", "Retention period defined & enforced"),
    ("dpa_dpia_done", "DPA/DPIA performed when required"),
    ("dpo_contact", "Data Protection Officer contact available (if required)"),
    ("data_subject_rights", "Mechanism for data subject rights (access, rectification, erasure)"),
    ("cross_border_checks", "Cross-border transfer checks (SCCs/adequacy)"),
    ("privacy_by_design", "Privacy by design/defaults considered"),
  ).map { case (k, d) => ChecklistItem(k, d, status = false, notes = "") }

  def defaultChecklist(spark: SparkSession): Dataset[ChecklistItem] = {
    import spark.implicits._
    spark.createDataset(DefaultItems)
  }

  /** C2 completion score: mean of `status` as 0/1; 0.0 on empty
    * (`modules/compliance.py:25-28`). */
  def score(ds: Dataset[ChecklistItem]): DataFrame =
    ds.agg(coalesce(avg(col("status").cast("double")), lit(0.0)).as("score"))
}
