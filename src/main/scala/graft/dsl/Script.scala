package graft.dsl

/**
 * Inline script expressions for the declarative profile — the analog of
 * the reference's CEL `${ ... }` attribute scripts
 * (`custommap/expression/ConfigExpressionScript.java:23`, custommap
 * README "Inline Script Expression"): typed expressions over
 * `feature.tags.*` / `feature.id` / `feature.source` with arithmetic,
 * comparisons, boolean logic, ternaries, string methods and a handful
 * of builtins. Scripts with no feature references CONSTANT-FOLD at
 * compile time (the reference does the same), so static expressions
 * cost nothing per row.
 *
 * Values are dynamically typed: null | Boolean | Long | Double | String.
 */
object Script {

  sealed trait Node
  case class Lit(v: Any) extends Node
  case class TagRef(key: String) extends Node
  case object IdRef extends Node
  case object SourceRef extends Node
  case class Un(op: String, e: Node) extends Node
  case class Bin(op: String, l: Node, r: Node) extends Node
  case class Cond(c: Node, t: Node, f: Node) extends Node
  case class Call(name: String, args: List[Node]) extends Node
  case class Method(target: Node, name: String, args: List[Node]) extends Node

  /** `${ ... }` marker test. */
  def isScript(s: String): Boolean = {
    val t = s.trim
    t.startsWith("${") && t.endsWith("}")
  }

  final case class Compiled(node: Node) {
    def eval(tags: Map[String, String], id: Long, source: String): Any =
      Script.eval(node, tags, id, source)
    /** Evaluate to the engine's string attr form (null stays null). */
    def evalString(tags: Map[String, String], id: Long, source: String): String =
      Script.eval(node, tags, id, source) match {
        case null => null
        case d: Double if d == math.rint(d) && math.abs(d) < 1e15 => d.toLong.toString
        case other => other.toString
      }
  }

  /** Parse + constant-fold. Accepts either the bare expression or the
    * full `${ ... }` form. */
  def compile(raw: String): Compiled = {
    val body = {
      val t = raw.trim
      if (isScript(t)) t.substring(2, t.length - 1) else t
    }
    val node = new Parser(body).parseFull()
    Compiled(if (isConstant(node)) Lit(eval(node, Map.empty, 0L, "")) else node)
  }

  private def isConstant(n: Node): Boolean = n match {
    case TagRef(_) | IdRef | SourceRef | TagsMapRef => false
    case Lit(_) => true
    case Un(_, e) => isConstant(e)
    case Bin(_, l, r) => isConstant(l) && isConstant(r)
    case Cond(c, t, f) => isConstant(c) && isConstant(t) && isConstant(f)
    case Call(_, as) => as.forall(isConstant)
    case Method(t, _, as) => isConstant(t) && as.forall(isConstant)
  }

  // ---------------- evaluation ----------------

  private def num(v: Any): Option[Either[Long, Double]] = v match {
    case l: Long => Some(Left(l))
    case d: Double => Some(Right(d))
    case i: Int => Some(Left(i.toLong))
    case _ => None
  }
  private def asDouble(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case i: Int => i.toDouble
    case s: String => s.toDouble
    case _ => Double.NaN
  }
  private def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case l: Long => l != 0
    case d: Double => d != 0
    case _ => true
  }

  def eval(n: Node, tags: Map[String, String], id: Long, source: String): Any = n match {
    case Lit(v) => v
    case TagRef(k) => tags.getOrElse(k, null)
    case IdRef => id
    case SourceRef => source
    case Un("-", e) => num(eval(e, tags, id, source)) match {
      case Some(Left(l)) => -l
      case Some(Right(d)) => -d
      case None => null
    }
    case Un("!", e) => !truthy(eval(e, tags, id, source))
    case Cond(c, t, f) =>
      if (truthy(eval(c, tags, id, source))) eval(t, tags, id, source)
      else eval(f, tags, id, source)
    case Bin("&&", l, r) =>
      truthy(eval(l, tags, id, source)) && truthy(eval(r, tags, id, source))
    case Bin("||", l, r) =>
      truthy(eval(l, tags, id, source)) || truthy(eval(r, tags, id, source))
    case Bin(op, l0, r0) =>
      val l = eval(l0, tags, id, source)
      val r = eval(r0, tags, id, source)
      op match {
        case "==" => l == r || (num(l).isDefined && num(r).isDefined && asDouble(l) == asDouble(r))
        case "!=" => !(l == r || (num(l).isDefined && num(r).isDefined && asDouble(l) == asDouble(r)))
        case "+" => (l, r) match {
          case (a: String, b) => a + (if (b == null) "" else b.toString)
          case (a, b: String) => (if (a == null) "" else a.toString) + b
          case _ => arith(l, r, _ + _, _ + _)
        }
        case "-" => arith(l, r, _ - _, _ - _)
        case "*" => arith(l, r, _ * _, _ * _)
        case "/" => arith(l, r, (a, b) => if (b == 0) 0L else a / b, _ / _)
        case "%" => arith(l, r, (a, b) => if (b == 0) 0L else a % b, _ % _)
        case "<" | "<=" | ">" | ">=" =>
          val c = (l, r) match {
            case (a: String, b: String) => a.compareTo(b)
            case _ if l == null || r == null => return null
            // null on a non-numeric operand (e.g. lanes="1;2"), matching
            // the evaluator's null-safe arith — never a task-killing
            // NumberFormatException from one malformed tag
            case _ => try java.lang.Double.compare(asDouble(l), asDouble(r))
              catch { case _: NumberFormatException => return null }
          }
          op match {
            case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0; case _ => c >= 0
          }
        case other => throw new IllegalArgumentException(s"unknown op $other")
      }
    case Call(name, args0) =>
      val args = args0.map(eval(_, tags, id, source))
      name match {
        case "coalesce" => args.find(_ != null).orNull
        case "has" => args.head != null
        case "double" => if (args.head == null) null else
          (try asDouble(args.head) catch { case _: NumberFormatException => null })
        case "long" => if (args.head == null) null else
          (try { args.head match {
            case s: String => s.trim.toDouble.toLong
            case other => asDouble(other).toLong
          } } catch { case _: NumberFormatException => null })
        case "string" => if (args.head == null) null else args.head.toString
        case "size" => args.head match {
          case null => 0L
          case s: String => s.length.toLong
          case _ => 1L
        }
        case "min" => args.filter(_ != null) match {
          case Nil => null
          case xs => try xs.minBy(asDouble)
            catch { case _: NumberFormatException => null } // non-numeric operand
        }
        case "max" => args.filter(_ != null) match {
          case Nil => null
          case xs => try xs.maxBy(asDouble)
            catch { case _: NumberFormatException => null }
        }
        case other => throw new IllegalArgumentException(s"unknown function $other")
      }
    case Method(t0, name, args0) =>
      val t = eval(t0, tags, id, source)
      val args = args0.map(eval(_, tags, id, source))
      if (t == null) null
      else {
        val s = t.toString
        name match {
          case "replace" => s.replace(args(0).toString, args(1).toString)
          case "contains" => s.contains(args.head.toString)
          case "startsWith" => s.startsWith(args.head.toString)
          case "endsWith" => s.endsWith(args.head.toString)
          case "lowerAscii" | "lower" => s.toLowerCase(java.util.Locale.ROOT)
          case "upperAscii" | "upper" => s.toUpperCase(java.util.Locale.ROOT)
          case "trim" => s.trim
          case "matches" => s.matches(args.head.toString)
          case "split" => s.split(args.head.toString, -1).headOption.orNull // first piece
          case other => throw new IllegalArgumentException(s"unknown method $other")
        }
      }
    case Un(op, _) => throw new IllegalArgumentException(s"unknown unary $op")
    case TagsMapRef =>
      throw new IllegalArgumentException("feature.tags must be indexed (feature.tags.k or feature.tags[\"k\"])")
  }

  private def arith(l: Any, r: Any, fl: (Long, Long) => Long, fd: (Double, Double) => Double): Any =
    (num(l), num(r)) match {
      case (Some(Left(a)), Some(Left(b))) => fl(a, b)
      case (Some(a), Some(b)) => fd(a.fold(_.toDouble, identity), b.fold(_.toDouble, identity))
      case _ => null
    }

  // ---------------- parser (precedence climbing) ----------------

  private final class Parser(s: String) {
    private var pos = 0

    def parseFull(): Node = {
      val n = parseTernary()
      skipWs()
      require(pos >= s.length, s"trailing input at $pos in: $s")
      n
    }

    private def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'
    private def eat(c: Char): Unit = {
      skipWs()
      require(peek == c, s"expected '$c' at $pos in: $s")
      pos += 1
    }
    private def tryEat(t: String): Boolean = {
      skipWs()
      if (s.startsWith(t, pos)) { pos += t.length; true } else false
    }

    private def parseTernary(): Node = {
      val c = parseOr()
      skipWs()
      if (tryEat("?")) {
        val t = parseTernary()
        eat(':')
        Cond(c, t, parseTernary())
      } else c
    }
    private def parseOr(): Node = {
      var l = parseAnd()
      while ({ skipWs(); tryEat("||") }) l = Bin("||", l, parseAnd())
      l
    }
    private def parseAnd(): Node = {
      var l = parseCmp()
      while ({ skipWs(); tryEat("&&") }) l = Bin("&&", l, parseCmp())
      l
    }
    private def parseCmp(): Node = {
      var l = parseAdd()
      var go = true
      while (go) {
        skipWs()
        val op = Seq("==", "!=", "<=", ">=", "<", ">").find(tryEat)
        op match {
          case Some(o) => l = Bin(o, l, parseAdd())
          case None => go = false
        }
      }
      l
    }
    private def parseAdd(): Node = {
      var l = parseMul()
      var go = true
      while (go) {
        skipWs()
        if (tryEat("+")) l = Bin("+", l, parseMul())
        else if (peek == '-' && !s.startsWith("->", pos)) { pos += 1; l = Bin("-", l, parseMul()) }
        else go = false
      }
      l
    }
    private def parseMul(): Node = {
      var l = parseUnary()
      var go = true
      while (go) {
        skipWs()
        if (tryEat("*")) l = Bin("*", l, parseUnary())
        else if (tryEat("/")) l = Bin("/", l, parseUnary())
        else if (tryEat("%")) l = Bin("%", l, parseUnary())
        else go = false
      }
      l
    }
    private def parseUnary(): Node = {
      skipWs()
      if (tryEat("!")) Un("!", parseUnary())
      else if (peek == '-') { pos += 1; Un("-", parseUnary()) }
      else parsePostfix()
    }

    private def parsePostfix(): Node = {
      var n = parsePrimary()
      var go = true
      while (go) {
        skipWs()
        if (peek == '.') {
          pos += 1
          val name = ident()
          skipWs()
          if (peek == '(') n = Method(n, name, parseArgs())
          else throw new IllegalArgumentException(s"unexpected member .$name at $pos in: $s")
        } else if (peek == '[') { // tags["key with spaces"]
          pos += 1
          val key = parsePrimary() match {
            case Lit(v: String) => v
            case other => throw new IllegalArgumentException(s"non-literal index $other")
          }
          eat(']')
          n match {
            case TagsMapRef => n = TagRef(key)
            case _ => throw new IllegalArgumentException("indexing only supported on feature.tags")
          }
        } else go = false
      }
      n
    }

    private def parseArgs(): List[Node] = {
      eat('(')
      skipWs()
      if (peek == ')') { pos += 1; Nil }
      else {
        val args = scala.collection.mutable.ListBuffer[Node](parseTernary())
        while ({ skipWs(); peek == ',' }) { pos += 1; args += parseTernary() }
        eat(')')
        args.toList
      }
    }

    private def ident(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      require(pos > start, s"expected identifier at $start in: $s")
      s.substring(start, pos)
    }

    private def parsePrimary(): Node = {
      skipWs()
      peek match {
        case '(' =>
          pos += 1
          val n = parseTernary()
          eat(')')
          n
        case '\'' | '"' =>
          val quote = peek
          pos += 1
          val sb = new StringBuilder
          while (peek != quote) {
            require(pos < s.length, "unterminated string")
            if (peek == '\\') {
              pos += 1
              require(pos < s.length, "unterminated string")
              // standard escapes decode to their control characters —
              // copying the letter verbatim would make '\n' the letter n
              sb += (s.charAt(pos) match {
                case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
                case other => other // quote, backslash and passthrough
              })
            } else sb += s.charAt(pos)
            pos += 1
          }
          pos += 1
          Lit(sb.toString)
        case c if c.isDigit =>
          val start = pos
          while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
          val t = s.substring(start, pos)
          if (t.contains('.')) Lit(t.toDouble) else Lit(t.toLong)
        case c if c.isLetter || c == '_' =>
          val name = ident()
          name match {
            case "true" => Lit(true)
            case "false" => Lit(false)
            case "null" => Lit(null)
            case "feature" =>
              eat('.')
              ident() match {
                case "id" => IdRef
                case "source" => SourceRef
                case "tags" =>
                  skipWs()
                  if (peek == '.') { pos += 1; TagRef(ident()) }
                  else TagsMapRef // for tags["..."] indexing / has()
                case other => throw new IllegalArgumentException(s"unknown feature.$other")
              }
            case fn =>
              skipWs()
              if (peek == '(') Call(fn, parseArgs())
              else throw new IllegalArgumentException(s"unknown identifier $fn at $pos in: $s")
          }
        case other => throw new IllegalArgumentException(s"unexpected '$other' at $pos in: $s")
      }
    }
  }

  /** Internal marker for `feature.tags` awaiting an index. */
  private case object TagsMapRef extends Node
}
