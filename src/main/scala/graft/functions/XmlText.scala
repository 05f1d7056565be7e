package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * F6 XML entity helpers, faithful to the reference's XmlHelper
 * (reference: src/util/XmlHelper.cpp:109-179):
 *
 *  - encode maps the 5 markup chars AND \n \r \t to entities
 *    (XmlHelper.cpp:115-133);
 *  - decode is the reference's single-pass scanner re-expressed as a literal
 *    replace chain with &amp; LAST (so "&amp;lt;" decodes to "&lt;", exactly
 *    like the one-pass scan). The reference's decode of &quot;/&apos;
 *    deliberately emits an ESCAPING BACKSLASH (`\"` / `\'`, for SPARQL
 *    string-literal embedding, XmlHelper.cpp:152-160) — reproduced verbatim;
 *  - isXmlEncoded = "contains any of the 8 entities"
 *    (XmlHelper.cpp:109-112).
 *
 * All chains use the literal (non-regex) `replace` SQL function, which Spark
 * and DuckDB evaluate identically — no regex metacharacter hazards.
 */
object XmlText {

  private def rep(c: Column, from: String, to: String): Column =
    call_function("replace", c, lit(from), lit(to))

  private val encodePairs: Seq[(String, String)] = Seq(
    "&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
    "\"" -> "&quot;", "'" -> "&apos;",
    "\n" -> "&#xA;", "\r" -> "&#xD;", "\t" -> "&#x9;")

  /** `&` must encode FIRST (or the entities' own ampersands double-encode). */
  def xmlEncode(c: Column): Column =
    encodePairs.foldLeft(c) { case (acc, (f, t)) => rep(acc, f, t) }

  private val decodePairs: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\\\"", "&apos;" -> "\\'",
    "&#xA;" -> "\n", "&#xD;" -> "\r", "&#x9;" -> "\t",
    "&amp;" -> "&") // last: an encoded ampersand must not re-trigger entities

  def xmlDecode(c: Column): Column =
    decodePairs.foldLeft(c) { case (acc, (f, t)) => rep(acc, f, t) }

  def isXmlEncoded(c: Column): Column =
    c.rlike("&(amp|lt|gt|quot|apos|#xA|#xD|#x9);")

  /** The DuckDB-dialect mirror of [[xmlEncode]] over a SQL fragment. */
  def sqlEncode(expr: String): String =
    encodePairs.foldLeft(expr) { case (acc, (f, t)) =>
      s"replace($acc, ${sqlLit(f)}, ${sqlLit(t)})"
    }

  /** The DuckDB-dialect mirror of [[xmlDecode]]. */
  def sqlDecode(expr: String): String =
    decodePairs.foldLeft(expr) { case (acc, (f, t)) =>
      s"replace($acc, ${sqlLit(f)}, ${sqlLit(t)})"
    }

  def sqlIsEncoded(expr: String): String =
    s"regexp_matches($expr, '&(amp|lt|gt|quot|apos|#xA|#xD|#x9);')"

  /** Single-quoted DuckDB string literal (backslash is a literal char;
   * newline/CR/tab via chr() so the SQL stays one line). */
  private def sqlLit(s: String): String = s match {
    case "\n" => "chr(10)"
    case "\r" => "chr(13)"
    case "\t" => "chr(9)"
    case _ => "'" + s.replace("'", "''") + "'"
  }
}
