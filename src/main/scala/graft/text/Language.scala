package graft.text

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * i18n name utilities — semantics from the reference's
 * `util/LanguageUtils.java:18-118` (latin detection, latin/non-latin
 * splitting, OSM localized-name key validation) re-expressed for both
 * plain-JVM use (inside profiles) and as Spark column functions.
 *
 * Transliteration: the reference optionally uses ICU; this sandbox has
 * none, so `transliterate` does Unicode-NFD decomposition + combining
 * mark removal (covers the Latin-Extended -> ASCII family) and returns
 * the input unchanged for non-decomposable scripts.
 */
object Language {

  // match strings that only contain latin characters (reference regex)
  private val OnlyLatin =
    Pattern.compile("^[\\P{IsLetter}[\\p{IsLetter}&&\\p{IsLatin}]]+$")
  private val LatinLetter = Pattern.compile("[\\p{IsLetter}&&\\p{IsLatin}]+")
  private val NonLatinLetter = Pattern.compile("[\\p{IsLetter}&&[^\\p{IsLatin}]]+")
  private val EmptyParens = Pattern.compile("(\\([ -.]*\\)|\\[[ -.]*])")
  private val LeadingTrailingJunk = Pattern.compile("((^[\\s./-]*)|([\\s./-]*$))")
  private val Whitespace = Pattern.compile("\\s+")

  def containsOnlyLatinCharacters(s: String): Boolean =
    s != null && OnlyLatin.matcher(s).matches()

  /** Strip latin letters (keeping the non-latin part of bilingual
    * names), then tidy leftover parens/junk — reference
    * `removeLatinCharacters`. */
  def removeLatinCharacters(name: String): String = {
    if (name == null) return null
    val m = LatinLetter.matcher(name)
    if (!m.find()) return name.trim
    var r = m.replaceAll("")
    r = EmptyParens.matcher(r).replaceAll("")
    r = LeadingTrailingJunk.matcher(r).replaceAll("")
    r = Whitespace.matcher(r).replaceAll(" ").trim
    if (r.isEmpty) null else r
  }

  /** Mirror image: strip non-latin letters and tidy. */
  def removeNonLatinCharacters(name: String): String = {
    if (name == null) return null
    val m = NonLatinLetter.matcher(name)
    if (!m.find()) return name.trim
    var r = m.replaceAll("")
    r = EmptyParens.matcher(r).replaceAll("")
    r = LeadingTrailingJunk.matcher(r).replaceAll("")
    r = Whitespace.matcher(r).replaceAll(" ").trim
    if (r.isEmpty) null else r
  }

  /** OSM localized-name subkey check (`name:xx` with a well-formed
    * BCP 47 language tag of <= 3 letters). */
  def isValidOsmNameTag(tag: String): Boolean =
    tag != null && tag.startsWith("name:") && isValidLanguageTag(tag.substring(5))

  def isValidLanguageTag(tag: String): Boolean = {
    if (tag == null || tag.isEmpty || !Character.isLowerCase(tag.charAt(0))) return false
    try {
      val lang = new java.util.Locale.Builder().setLanguageTag(tag).build().getLanguage
      lang.nonEmpty && lang.length <= 3
    } catch { case _: java.util.IllformedLocaleException => false }
  }

  /** NFD-decompose and drop combining marks: "Ã…land" -> "Aland". Input
    * returned unchanged if nothing decomposes (no ICU in sandbox). */
  def transliterate(s: String): String = {
    if (s == null) return null
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val r = d.replaceAll("\\p{M}+", "")
    if (r.isEmpty) s else r
  }

  /**
   * Pick the best latin name from a tag map — reference priority: the
   * primary `name` if already latin, else `name:en`, `int_name`,
   * `name:de`, else the first latin-valued localized name key, else a
   * transliteration of `name`.
   */
  def latinName(tags: Map[String, String]): Option[String] = {
    def latin(v: Option[String]): Option[String] =
      v.filter(s => s.nonEmpty && containsOnlyLatinCharacters(s))
    latin(tags.get("name"))
      .orElse(latin(tags.get("name:en")))
      .orElse(latin(tags.get("int_name")))
      .orElse(latin(tags.get("name:de")))
      .orElse(tags.toSeq.sortBy(_._1).collectFirst {
        case (k, v) if isValidOsmNameTag(k) && v.nonEmpty && containsOnlyLatinCharacters(v) => v
      })
      .orElse(tags.get("name").map(transliterate).filter(containsOnlyLatinCharacters))
  }

  // ---- column forms (regex-only checks stay codegen'd) ----

  def onlyLatinCol(c: Column): Column =
    c.rlike("^[\\P{IsLetter}[\\p{IsLetter}&&\\p{IsLatin}]]+$")
}
