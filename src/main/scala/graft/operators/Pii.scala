package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora (the Dolma/BigScience-style regex
  * pass): detect and mask emails, IPv4 addresses and NANP-style phone
  * numbers before a corpus ships. A pure per-row projection — codegen'd
  * `regexp_replace`/`regexp_count`, runs at scan parallelism with zero
  * shuffle, so the cost at 100 TB is one read-rewrite pass.
  *
  * Patterns deliberately stay within the common subset of Java regex and
  * RE2 (no backrefs, no lookaround), so any engine the corpus pipeline
  * pairs with (DuckDB audits, Go sidecars) reproduces the same masks.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+1-\\d{3}-\\d{4}"

  /** Adds `n_emails`/`n_ips`/`n_phones` match counts and `redacted`
    * (emails -> [EMAIL], IPv4 -> [IP], phones -> [PHONE]; email masking
    * runs first so an address's digit runs can't half-match as numbers).
    *
    * Counts are applied-mask counts, not raw-text detections: each stage
    * counts on the text the PREVIOUS stage already redacted, so a
    * digit-dotted email local part (1.2.3.4@x.com) that an IP scan over
    * the raw text would double-count is swallowed by [EMAIL] and counted
    * once — `n_*` always equals the number of `[*]` masks visible in
    * `redacted`.
    */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "[IP]")
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhoneRe)).cast("long"))
      .withColumn("redacted", regexp_replace(afterIp, PhoneRe, "[PHONE]"))
  }
}
