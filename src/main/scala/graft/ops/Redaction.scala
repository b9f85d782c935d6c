package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: emails, URLs, IPv4s and
  * phone-shaped numbers replaced by stable placeholder tags.
  *
  * Built entirely from `regexp_replace`/`regexp_count` — codegen'd
  * built-ins, no UDFs — so redaction runs inside whole-stage codegen on
  * the scan projection: at 100 TB this is a map-only pass whose cost is
  * the regex automaton, with nothing shuffled and nothing collected. The
  * patterns stay inside the regex subset Java and RE2 share (character
  * classes, bounded/unbounded repetition — no backreferences or
  * lookaround), which keeps the operator ORACLE-CHECKABLE: DuckDB applies
  * the same patterns with `regexp_replace(..., 'g')` and must produce
  * byte-identical output (`q_redact_pii`).
  *
  * Rule order matters and is part of the contract: emails before URLs
  * (both contain dotted hosts), URLs before bare IPv4s (a URL may embed
  * one), phones last (disjoint shape). Each rule's hit counter is taken
  * on the text AS THAT RULE SAW IT (after earlier rules ran), so the
  * audit columns count replacements actually made — an IP inside a URL
  * is one URL hit, not a phantom IP hit.
  */
object Redaction {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[A-Za-z0-9./_%?=&+~#:-]+"
  val Ipv4Pattern = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"

  /** (pattern, replacement tag), applied in order. */
  val DefaultRules: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    UrlPattern -> "<URL>",
    Ipv4Pattern -> "<IP>",
    PhonePattern -> "<PHONE>")

  /** The scrubbed column: sequential global replacement per rule. */
  def scrub(c: Column, rules: Seq[(String, String)] = DefaultRules): Column =
    rules.foldLeft(c) { case (acc, (re, tag)) =>
      regexp_replace(acc, lit(re), lit(tag))
    }

  /** Scrubbed column plus per-rule hit counters (counted at each rule's
    * stage — see class doc for the ordering contract).
    */
  def scrubWithCounts(
      c: Column,
      rules: Seq[(String, String)] = DefaultRules): (Column, Seq[Column]) = {
    var cur = c
    val counts = rules.map { case (re, tag) =>
      val n = regexp_count(cur, lit(re)).cast("long")
        .as("n_" + tag.stripPrefix("<").stripSuffix(">").toLowerCase)
      cur = regexp_replace(cur, lit(re), lit(tag))
      n
    }
    (cur, counts)
  }
}
