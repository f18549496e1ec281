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
 * Transliteration: the reference optionally uses ICU's any-latin;
 * this sandbox has none, so `transliterate` does Unicode-NFD
 * decomposition + combining mark removal (the Latin-Extended -> ASCII
 * family) followed by built-in romanization tables for Cyrillic and
 * Greek (the two most common non-latin scripts with simple
 * letter-level romanizations). Scripts needing data tables or
 * phonetic analysis (CJK, Arabic, Indic) return unchanged — an
 * honest, documented subset.
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

  /** Letter-level romanization for Cyrillic (BGN/PCGN-style simplified)
    * and Greek (ELOT-style simplified), applied after NFD mark
    * stripping so accented forms map through their base letters. */
  private val Romanization: Map[Char, String] = Map(
    // Cyrillic (Russian core + common Ukrainian/Serbian letters)
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d", 'е' -> "e",
    'ж' -> "zh", 'з' -> "z", 'и' -> "i", 'й' -> "y", 'к' -> "k", 'л' -> "l",
    'м' -> "m", 'н' -> "n", 'о' -> "o", 'п' -> "p", 'р' -> "r", 'с' -> "s",
    'т' -> "t", 'у' -> "u", 'ф' -> "f", 'х' -> "kh", 'ц' -> "ts", 'ч' -> "ch",
    'ш' -> "sh", 'щ' -> "shch", 'ъ' -> "", 'ы' -> "y", 'ь' -> "", 'э' -> "e",
    'ю' -> "yu", 'я' -> "ya",
    'і' -> "i", 'ї' -> "yi", 'є' -> "ye", 'ґ' -> "g",
    'ђ' -> "dj", 'ј' -> "j", 'љ' -> "lj", 'њ' -> "nj", 'ћ' -> "c", 'џ' -> "dz",
    // Greek
    'α' -> "a", 'β' -> "v", 'γ' -> "g", 'δ' -> "d", 'ε' -> "e", 'ζ' -> "z",
    'η' -> "i", 'θ' -> "th", 'ι' -> "i", 'κ' -> "k", 'λ' -> "l", 'μ' -> "m",
    'ν' -> "n", 'ξ' -> "x", 'ο' -> "o", 'π' -> "p", 'ρ' -> "r", 'σ' -> "s",
    'ς' -> "s", 'τ' -> "t", 'υ' -> "y", 'φ' -> "f", 'χ' -> "ch", 'ψ' -> "ps",
    'ω' -> "o")

  /** Per character: romanization table first (so precomposed letters
    * like Ukrainian yi keep their digraph), then NFD-decompose +
    * strip marks and retry the base letter (accented Latin to ASCII,
    * accented Greek through its base), else pass through. */
  def transliterate(s: String): String = {
    if (s == null) return null
    // CJK pre-pass: Hangul/kana/known-Han runs romanize via the
    // dedicated tables in [[Translit]]; everything else flows through
    // the per-character path below.
    val src = if (s.exists(Translit.handles)) Translit.transliterateCjk(s) else s
    val sb = new java.lang.StringBuilder(src.length + 8)
    def emit(ch: Char, wasUpper: Boolean): Unit =
      Romanization.get(Character.toLowerCase(ch)) match {
        case Some(rep) =>
          if (wasUpper && rep.nonEmpty) {
            sb.append(Character.toUpperCase(rep.charAt(0)))
            sb.append(rep.substring(1))
          } else sb.append(rep)
        case None =>
          val d = java.text.Normalizer.normalize(String.valueOf(ch),
            java.text.Normalizer.Form.NFD).replaceAll("\\p{M}+", "")
          if (d.length == 1 && d.charAt(0) != ch) emit(d.charAt(0), wasUpper)
          else sb.append(d) // mark-only chars decompose to "" and drop
      }
    var i = 0
    while (i < src.length) {
      val ch = src.charAt(i)
      emit(ch, Character.isUpperCase(ch))
      i += 1
    }
    val r = sb.toString
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
    c.rlike(OnlyLatin.pattern()) // single source for the latin rule
}
