package graft.dsl

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Minimal YAML 1.2 subset parser for declarative profile schemas —
 * the front end the reference's custommap takes (reference
 * `planetiler-custommap/README.md`, `SchemaConfig` via
 * `util/YAML.java`; this is a from-scratch parser of the public YAML
 * spec subset those schemas use, since the sandbox ships no snakeyaml):
 *
 *  - block mappings and sequences by indentation, flow `[...]`/`{...}`
 *  - plain / single-quoted / double-quoted scalars, typed plain
 *    scalars (null, booleans, integers, floats)
 *  - comments, document markers
 *  - anchors `&a` (on mapping values and sequence items), aliases
 *    `*a`, and merge keys `<<: *a` (explicit keys win over merged
 *    ones; among merged sources earlier ones win, per the spec)
 *  - plain multi-line scalar continuation lines
 *
 * Not supported (not used by profile schemas): block literals `|`/`>`,
 * multiple documents, complex keys, tags (`!!type`).
 */
object Yaml {

  sealed trait Y {
    def asMap: YMap = this.asInstanceOf[YMap]
    def asSeq: Vector[Y] = this.asInstanceOf[YSeq].items
    def asScalar: Any = this.asInstanceOf[YScalar].value
    def str: String = String.valueOf(asScalar)
    def int: Int = asScalar match {
      case l: Long => l.toInt
      case d: Double => d.toInt
      case s: String => s.trim.toInt
      case other => throw new IllegalArgumentException(s"not an int: $other")
    }
    def bool: Boolean = asScalar match {
      case b: Boolean => b
      case s: String => s.trim.toBoolean
      case other => throw new IllegalArgumentException(s"not a bool: $other")
    }
  }
  case class YMap(entries: Vector[(String, Y)]) extends Y {
    def get(k: String): Option[Y] = entries.find(_._1 == k).map(_._2)
    def apply(k: String): Y = get(k).getOrElse(
      throw new IllegalArgumentException(s"missing key '$k' (have ${entries.map(_._1).mkString(", ")})"))
  }
  case class YSeq(items: Vector[Y]) extends Y
  case class YScalar(value: Any) extends Y // null | Boolean | Long | Double | String

  private case class Line(indent: Int, text: String)

  def parse(src: String): Y = {
    val anchors = mutable.Map.empty[String, Y]
    val lines = src.split("\n", -1).toVector
      .map(stripComment)
      .filter(l => l.trim.nonEmpty)
      .filterNot(l => l.trim == "---" || l.trim == "...")
      .map(l => Line(l.takeWhile(_ == ' ').length, l.trim))
    if (lines.isEmpty) return YScalar(null)
    val (v, rest) = parseNode(lines, 0, lines.head.indent, anchors)
    require(rest >= lines.length, s"trailing content at line: ${lines(rest).text}")
    v
  }

  /** Remove a trailing comment (a `#` at start or preceded by space,
    * outside quotes). */
  private def stripComment(l: String): String = {
    var i = 0
    var quote: Char = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (quote != 0) {
        if (c == quote && !(quote == '"' && i > 0 && l.charAt(i - 1) == '\\')) quote = 0
      } else c match {
        case '\'' | '"' => quote = c
        case '#' if i == 0 || l.charAt(i - 1) == ' ' => return l.substring(0, i)
        case _ =>
      }
      i += 1
    }
    l
  }

  /** Parse the node starting at lines(i) with block indent `indent`;
    * returns (node, next index). */
  private def parseNode(lines: Vector[Line], i: Int, indent: Int,
                        anchors: mutable.Map[String, Y]): (Y, Int) = {
    val t = lines(i).text
    if (t == "-" || t.startsWith("- ")) parseSeq(lines, i, indent, anchors)
    else if (t.startsWith("{") || t.startsWith("[")) (flowOrScalar(t, anchors), i + 1)
    else if (colonIndex(t) < 0) (flowOrScalar(t, anchors), i + 1) // bare scalar node
    else parseMap(lines, i, indent, anchors)
  }

  private def parseSeq(lines: Vector[Line], i0: Int, indent: Int,
                       anchors: mutable.Map[String, Y]): (Y, Int) = {
    val items = ArrayBuffer.empty[Y]
    var i = i0
    while (i < lines.length && lines(i).indent == indent &&
      (lines(i).text == "-" || lines(i).text.startsWith("- "))) {
      var content = lines(i).text.drop(1).trim
      // anchor on a SEQUENCE ITEM: '- &a value' or '- &a' (block follows) —
      // without this the literal "&a value" would leak into the data and
      // the anchor would never register
      var anchorName: Option[String] = None
      if (content.startsWith("&")) {
        val sp = content.indexOf(' ')
        if (sp < 0) { anchorName = Some(content.drop(1)); content = "" }
        else { anchorName = Some(content.substring(1, sp)); content = content.substring(sp + 1).trim }
      }
      def register(v: Y): Y = { anchorName.foreach(anchors.put(_, v)); v }
      if (content.isEmpty) {
        // nested block on following deeper lines
        if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (v, next) = parseNode(lines, i + 1, lines(i + 1).indent, anchors)
          items += register(v)
          i = next
        } else { items += register(YScalar(null)); i += 1 }
      } else {
        // treat the remainder as a virtual line at the content column;
        // the item spans following lines indented past the dash
        val contentIndent = indent + (lines(i).text.length - content.length)
        val virtual = Line(contentIndent, content)
        var j = i + 1
        while (j < lines.length && lines(j).indent > indent) j += 1
        val sub = virtual +: lines.slice(i + 1, j)
        val (v, consumed) = parseNode(sub, 0, contentIndent, anchors)
        require(consumed >= sub.length, s"unparsed item content near: ${sub(consumed).text}")
        items += register(v)
        i = j
      }
    }
    (YSeq(items.toVector), i)
  }

  private def parseMap(lines: Vector[Line], i0: Int, indent: Int,
                       anchors: mutable.Map[String, Y]): (Y, Int) = {
    var entries = Vector.empty[(String, Y)]
    val merged = ArrayBuffer.empty[(String, Y)]
    var i = i0
    while (i < lines.length && lines(i).indent == indent &&
      !(lines(i).text == "-" || lines(i).text.startsWith("- "))) {
      val t = lines(i).text
      val ci = colonIndex(t)
      require(ci >= 0, s"expected 'key: value' line, got: $t")
      val key = unquote(t.substring(0, ci).trim)
      var rest = t.substring(ci + 1).trim
      // anchor on the VALUE: '&name' alone (block follows) or prefix
      var anchorName: Option[String] = None
      if (rest.startsWith("&")) {
        val sp = rest.indexOf(' ')
        if (sp < 0) { anchorName = Some(rest.drop(1)); rest = "" }
        else { anchorName = Some(rest.substring(1, sp)); rest = rest.substring(sp + 1).trim }
      }
      val (value, next) =
        if (rest.isEmpty) {
          // nested block: deeper indent, OR a sequence at the SAME
          // indent as the key (YAML allows un-indented block seqs)
          if (i + 1 < lines.length && (lines(i + 1).indent > indent ||
            (lines(i + 1).indent == indent &&
              (lines(i + 1).text == "-" || lines(i + 1).text.startsWith("- ")))))
            parseNode(lines, i + 1, lines(i + 1).indent, anchors)
          else (YScalar(null), i + 1)
        } else {
          var v = flowOrScalar(rest, anchors)
          var j = i + 1
          // plain multi-line scalar continuation
          while (j < lines.length && lines(j).indent > indent &&
            colonIndex(lines(j).text) < 0 && !lines(j).text.startsWith("- ") &&
            v.isInstanceOf[YScalar] && v.asScalar.isInstanceOf[String] &&
            !rest.startsWith("[") && !rest.startsWith("{")) {
            v = YScalar(v.str + " " + lines(j).text)
            j += 1
          }
          (v, j)
        }
      anchorName.foreach(anchors(_) = value)
      if (key == "<<") {
        val sources = value match {
          case YSeq(items) => items
          case other => Vector(other)
        }
        sources.foreach {
          case YMap(es) => merged ++= es
          case other => throw new IllegalArgumentException(s"merge key target not a map: $other")
        }
      } else entries :+= (key, value)
      i = next
    }
    // merge semantics per the YAML merge-key spec: explicit keys win;
    // among merged sources, EARLIER mapping nodes override later ones
    // ("keys in mapping nodes earlier in the sequence override keys
    // specified in later mapping nodes") — snakeyaml, which the
    // reference's custommap uses, behaves the same way
    val explicit = entries.map(_._1).toSet
    val mergedKept = merged.distinctBy(_._1).filterNot(e => explicit.contains(e._1))
    (YMap(mergedKept.toVector ++ entries), i)
  }

  /** Index of the key/value separator ':' outside quotes (followed by
    * space or end-of-line); -1 if none. */
  private def colonIndex(t: String): Int = {
    var i = 0
    var quote: Char = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (quote != 0) {
        if (c == quote && !(quote == '"' && t.charAt(i - 1) == '\\')) quote = 0
      } else c match {
        case '\'' | '"' if i == 0 => quote = c
        case ':' if i + 1 >= t.length || t.charAt(i + 1) == ' ' => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')))
      unescape(s.substring(1, s.length - 1), s.head)
    else s

  private def unescape(s: String, quote: Char): String =
    if (quote == '\'') s.replace("''", "'")
    else {
      // single pass: a replace CHAIN is order-unsafe — "C:\\new"
      // (escaped backslash before an n) must not turn into a newline
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case other => sb.append('\\').append(other) // unknown: keep verbatim
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  /** Parse a flow node (`[...]`, `{...}`), alias, or scalar. */
  private[dsl] def flowOrScalar(s0: String, anchors: mutable.Map[String, Y]): Y = {
    val s = s0.trim
    if (s.startsWith("*")) {
      anchors.getOrElse(s.drop(1),
        throw new IllegalArgumentException(s"unknown alias $s"))
    } else if (s.startsWith("[")) {
      require(s.endsWith("]"), s"unterminated flow sequence: $s")
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) YSeq(Vector.empty)
      else YSeq(splitFlow(inner).map(e => flowOrScalar(e, anchors)).toVector)
    } else if (s.startsWith("{")) {
      require(s.endsWith("}"), s"unterminated flow mapping: $s")
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) YMap(Vector.empty)
      else YMap(splitFlow(inner).map { e =>
        val ci = colonIndex(e)
        require(ci >= 0, s"flow map entry missing ':': $e")
        unquote(e.substring(0, ci).trim) -> flowOrScalar(e.substring(ci + 1), anchors)
      }.toVector)
    } else scalar(s)
  }

  /** Split flow content on top-level commas. */
  private def splitFlow(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0
    var quote: Char = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote && !(quote == '"' && s.charAt(i - 1) == '\\')) quote = 0
      } else c match {
        case '\'' | '"' => quote = c
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start).trim
    out.toSeq
  }

  private val IntRe = "^[-+]?[0-9]+$".r
  private val FloatRe = "^[-+]?([0-9]*\\.[0-9]+|[0-9]+\\.[0-9]*|[0-9]+)([eE][-+]?[0-9]+)?$".r

  private def scalar(s: String): Y = {
    if (s.startsWith("'") || s.startsWith("\"")) YScalar(unquote(s))
    else s match {
      case "null" | "~" | "" => YScalar(null)
      case "true" | "True" => YScalar(true)
      case "false" | "False" => YScalar(false)
      case IntRe() => YScalar(s.toLong)
      case FloatRe(_, _) => YScalar(s.toDouble)
      case other => YScalar(other)
    }
  }
}
