package graft.compliance

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One compliance checklist row (fixed schema — the only fixed-schema
  * record in the engine, so a typed Dataset is warranted; SURVEY.md §1.5). */
case class ChecklistItem(key: String, description: String, status: Boolean, notes: String)

/** Compliance operators (SURVEY.md §2.6 C1–C3; reference
  * `modules/compliance.py`). Driver-side constants + one trivial aggregate —
  * no scale concerns.
  *
  * The checklist content is a flat text registry (`regulation | key |
  * description` lines) rather than code-level collections: auditors review
  * the registry as data, and the engine derives everything else (grouping,
  * completion score, rendered report) from it.
  */
object Checklist {

  /** Registry of audit items, one per line: `regulation|key|description`.
    * Content matches the reference checklist verbatim
    * (`modules/compliance.py:3-23`); representation is ours. */
  private val Registry: String =
    """DPDP|lawful_purpose_documented|Lawful purpose documented for processing/sharing
      |DPDP|consent_or_legal_basis|Consent or other legal basis recorded
      |DPDP|pii_identified|PII fields identified and cataloged
      |DPDP|minimization_applied|Data minimization applied (only necessary fields retained)
      |DPDP|privacy_techniques|Privacy techniques applied (SDC/DP/Synthetic)
      |DPDP|logging_enabled|Logging/Audit trail enabled for data transformations
      |DPDP|retention_policy|Retention period defined & enforced
      |GDPR|dpa_dpia_done|DPA/DPIA performed when required
      |GDPR|dpo_contact|Data Protection Officer contact available (if required)
      |GDPR|data_subject_rights|Mechanism for data subject rights (access, rectification, erasure)
      |GDPR|cross_border_checks|Cross-border transfer checks (SCCs/adequacy)
      |GDPR|privacy_by_design|Privacy by design/defaults considered
      |""".stripMargin

  /** (regulation, key, description) triples parsed from [[Registry]]. */
  val Entries: Seq[(String, String, String)] =
    Registry.linesIterator.filter(_.nonEmpty).map { line =>
      line.split('|') match {
        case Array(reg, key, desc) => (reg, key, desc)
        case other => sys.error(s"malformed registry line: ${other.mkString("|")}")
      }
    }.toSeq

  /** Regulations present in the registry, in declaration order. */
  val Regulations: Seq[String] = Entries.map(_._1).distinct

  /** C1 default checklist: every registry entry starts unchecked with empty
    * notes. */
  val DefaultItems: Seq[ChecklistItem] =
    Entries.map { case (_, key, desc) => ChecklistItem(key, desc, status = false, notes = "") }

  def defaultChecklist(spark: SparkSession): Dataset[ChecklistItem] = {
    import spark.implicits._
    spark.createDataset(DefaultItems)
  }

  /** Items belonging to one regulation (e.g. "GDPR"), still unchecked. */
  def itemsFor(regulation: String): Seq[ChecklistItem] =
    Entries.collect { case (reg, key, desc) if reg == regulation =>
      ChecklistItem(key, desc, status = false, notes = "")
    }

  /** Mark the given keys complete (optionally with a note); unknown keys are
    * ignored so callers can feed pipeline-derived evidence keys directly. */
  def complete(ds: Dataset[ChecklistItem], keys: Set[String],
               note: String = ""): Dataset[ChecklistItem] = {
    import ds.sparkSession.implicits._
    ds.map { item =>
      if (keys(item.key)) item.copy(status = true, notes = note) else item
    }
  }

  /** C2 completion score: fraction of checked items; 0.0 on an empty
    * checklist (reference semantics, `modules/compliance.py:25-28`). */
  def score(ds: Dataset[ChecklistItem]): DataFrame =
    ds.agg(coalesce(avg(col("status").cast("double")), lit(0.0)).as("score"))

  /** C3 report fragment: the checklist rendered as a markdown task list,
    * grouped per regulation (consumed by `graft.report.Html`). */
  def renderMarkdown(items: Seq[ChecklistItem]): String = {
    val byKey = items.map(i => i.key -> i).toMap
    val sections = Regulations.map { reg =>
      val lines = Entries.collect {
        case (r, key, desc) if r == reg =>
          val it = byKey.getOrElse(key, ChecklistItem(key, desc, status = false, notes = ""))
          val box = if (it.status) "[x]" else "[ ]"
          val suffix = if (it.notes.nonEmpty) s" — ${it.notes}" else ""
          s"- $box ${it.description}$suffix"
      }
      s"## $reg\n" + lines.mkString("\n")
    }
    sections.mkString("\n\n")
  }
}
