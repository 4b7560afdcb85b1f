package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: rule-based redaction via native
  * regexp_replace (codegen'd, linear scan — the standard first pass
  * before any model-based PII detection). Rules are ordered; each maps
  * a pattern to a placeholder token. */
object Redact {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
  val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val defaultRules: Seq[(String, String)] = Seq(
    emailRe -> "<EMAIL>", phoneRe -> "<PHONE>", ipv4Re -> "<IP>")

  def redactPII(c: Column, rules: Seq[(String, String)] = defaultRules): Column =
    rules.foldLeft(c) { case (col0, (re, tok)) => regexp_replace(col0, re, tok) }

  /** Count of redactable spans (for corpus-quality reporting). */
  def piiCount(c: Column, rules: Seq[(String, String)] = defaultRules): Column =
    rules.map { case (re, _) =>
      size(regexp_extract_all(c, lit(re), lit(0)))
    }.reduce(_ + _)
}
