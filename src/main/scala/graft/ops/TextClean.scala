package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact e-mail
  * addresses, IPv4 addresses and international-format phone numbers.
  * Pure `regexp_replace`/`regexp_extract_all` compositions — codegen'd
  * narrow projections, no shuffle, full pushdown; the patterns stay in
  * the regex subset shared by Java (Spark) and RE2 (DuckDB, re2 in Go)
  * so the transform is engine-replayable: no backreferences, no
  * lookaround.
  */
object TextClean {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "(\\d{1,3}\\.){3}\\d{1,3}"
  /** +CC-NNN…: international prefix then 2+ separator-delimited digit
    * groups — deliberately strict (no bare 10-digit runs) to keep the
    * false-positive rate near zero on numeric-heavy corpora.
    */
  val PhoneRe = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}(-\\d{3,4})?"

  def countEmails(text: Column): Column = countOf(text, EmailRe)
  def countIpv4(text: Column): Column = countOf(text, Ipv4Re)
  def countPhones(text: Column): Column = countOf(text, PhoneRe)

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Text with all three PII classes replaced by typed placeholders.
    * Phone first (its digit groups may contain things IP would then
    * half-match), then e-mail, then IP — fixed order so every engine
    * replaying the chain agrees.
    */
  def redactPii(text: Column): Column = {
    val p1 = regexp_replace(text, PhoneRe, "<PHONE>")
    val p2 = regexp_replace(p1, EmailRe, "<EMAIL>")
    regexp_replace(p2, Ipv4Re, "<IP>")
  }

  /** Pre-tokenization normalization: lowercase, control characters out,
    * whitespace runs collapsed, edges trimmed — the canonical form fed to
    * exact dedup and tokenizers so that byte-level noise (tabs, CRs,
    * doubled spaces, case) doesn't split otherwise-identical documents.
    * All regexes live in the Java∩RE2 subset (like the PII patterns), so
    * any engine replays the chain identically; pure codegen projection.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x1f\\x7f]", " "),
      " {2,}", " "))
}
