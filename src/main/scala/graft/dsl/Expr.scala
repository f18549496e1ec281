package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Boolean expression DSL over the open-world tag map — the profile
 * "query language" (reference `expression/Expression.java:49-175`):
 * and / or / not / matchAny (with %wildcards%) / matchField /
 * matchSource / matchSourceLayer, plus:
 *
 *  - `simplify`: fixed-point rewrite (hoist nested and/or, drop
 *    TRUE/FALSE units, De Morgan pushdown, not(matchAny(f, "")) ->
 *    matchField(f)) — reference `Expression.java:289-391`;
 *  - `partialEvaluate`: substitute known tag/source values and fold to
 *    TRUE/FALSE where decidable — the partition-pruning hook
 *    (reference `Expression.java:225-232`, used to skip whole hive
 *    partitions);
 *  - `toColumn`: compile to a Catalyst `Column` tree over
 *    (tags MAP<STRING,STRING>, source STRING) so the runtime predicate
 *    is whole-stage-codegen'd — Catalyst then applies its own
 *    BooleanSimplification/ConstantFolding on top.
 */
sealed trait Expr {
  def &&(other: Expr): Expr = And(Seq(this, other))
  def ||(other: Expr): Expr = Or(Seq(this, other))
  def unary_! : Expr = Not(this)

  def simplify: Expr = Expr.fixedPoint(this)

  /** Partial evaluation against known bindings: tags that are known to
    * hold (key->value) and keys known to be ABSENT. */
  def partialEvaluate(known: Map[String, String], absentKeys: Set[String],
                      source: Option[String] = None): Expr =
    Expr.partial(this, known, absentKeys, source).simplify

  def toColumn(tags: Column, source: Column): Column = Expr.compile(this, tags, source)

  def evaluate(tags: Map[String, String], src: String): Boolean =
    Expr.eval(this, tags, src)
}

case object True extends Expr
case object False extends Expr
case class And(children: Seq[Expr]) extends Expr
case class Or(children: Seq[Expr]) extends Expr
case class Not(child: Expr) extends Expr
/** tag `field` has one of `values`; "%x%" wildcards match substrings;
  * the empty string means "field absent or empty" (reference
  * `Expression.MatchAny` semantics). */
case class MatchAny(field: String, values: Seq[String]) extends Expr
/** tag `field` present with non-empty value. */
case class MatchField(field: String) extends Expr
case class MatchSource(sources: Seq[String]) extends Expr

object Expr {
  def and(es: Expr*): Expr = And(es)
  def or(es: Expr*): Expr = Or(es)
  def matchAny(field: String, values: String*): Expr = MatchAny(field, values)

  // ---- simplifier (one pass; driven to fixed point) ----
  private def simplifyOnce(e: Expr): Expr = e match {
    case And(cs0) =>
      val cs = cs0.map(simplifyOnce).flatMap {
        case And(inner) => inner // hoist nested and
        case True => Nil // drop TRUE unit
        case other => Seq(other)
      }
      if (cs.contains(False)) False
      else if (cs.isEmpty) True
      else if (cs.size == 1) cs.head
      else And(cs.distinct)
    case Or(cs0) =>
      val cs = cs0.map(simplifyOnce).flatMap {
        case Or(inner) => inner
        case False => Nil
        case other => Seq(other)
      }
      if (cs.contains(True)) True
      else if (cs.isEmpty) False
      else if (cs.size == 1) cs.head
      else Or(cs.distinct)
    case Not(c0) =>
      simplifyOnce(c0) match {
        case True => False
        case False => True
        case Not(inner) => inner // double negation
        case And(cs) => Or(cs.map(Not(_))) // De Morgan
        case Or(cs) => And(cs.map(Not(_)))
        case MatchAny(f, vs) if vs == Seq("") => MatchField(f) // not(absent) = present
        case other => Not(other)
      }
    case other => other
  }

  private[dsl] def fixedPoint(e: Expr): Expr = {
    var cur = e
    var next = simplifyOnce(cur)
    var iter = 0
    while (next != cur && iter < 100) {
      cur = next
      next = simplifyOnce(cur)
      iter += 1
    }
    next
  }

  // ---- partial evaluation ----
  private def partial(e: Expr, known: Map[String, String], absent: Set[String],
                      source: Option[String]): Expr = e match {
    case And(cs) => And(cs.map(partial(_, known, absent, source)))
    case Or(cs) => Or(cs.map(partial(_, known, absent, source)))
    case Not(c) => Not(partial(c, known, absent, source))
    case m @ MatchAny(f, vs) =>
      if (known.contains(f)) { if (matchesAny(known(f), vs)) True else False }
      else if (absent.contains(f)) { if (vs.contains("")) True else False }
      else m
    case m @ MatchField(f) =>
      if (known.contains(f)) { if (known(f).nonEmpty) True else False }
      else if (absent.contains(f)) False
      else m
    case m @ MatchSource(ss) =>
      source.map(s => if (ss.contains(s)) True else False: Expr).getOrElse(m)
    case other => other
  }

  private def matchesAny(v: String, values: Seq[String]): Boolean =
    values.exists { pat =>
      if (pat == "") v == null || v.isEmpty
      else if (pat.contains("%")) wildcardRegex(pat).matches(v)
      else pat == v
    }

  private def wildcardRegex(pat: String): scala.util.matching.Regex =
    pat.split("%", -1).map(java.util.regex.Pattern.quote).mkString(".*").r

  // ---- interpreter (tests / driver-side pruning) ----
  private[dsl] def eval(e: Expr, tags: Map[String, String], src: String): Boolean = e match {
    case True => true
    case False => false
    case And(cs) => cs.forall(eval(_, tags, src))
    case Or(cs) => cs.exists(eval(_, tags, src))
    case Not(c) => !eval(c, tags, src)
    case MatchAny(f, vs) =>
      val v = tags.getOrElse(f, null)
      if (v == null) vs.contains("") else matchesAny(v, vs)
    case MatchField(f) => tags.get(f).exists(_.nonEmpty)
    case MatchSource(ss) => ss.contains(src)
  }

  // ---- Catalyst compilation ----
  private[dsl] def compile(e: Expr, tags: Column, source: Column): Column = e match {
    case True => lit(true)
    case False => lit(false)
    // empty conjunction/disjunction identities (reachable when callers
    // compile without simplify — Nil.reduce would throw)
    case And(cs) if cs.isEmpty => lit(true)
    case Or(cs) if cs.isEmpty => lit(false)
    case And(cs) => cs.map(compile(_, tags, source)).reduce(_ && _)
    case Or(cs) => cs.map(compile(_, tags, source)).reduce(_ || _)
    case Not(c) => !compile(c, tags, source)
    case MatchAny(f, vs) =>
      val v = element_at(tags, f)
      val (empties, nonEmpty) = vs.partition(_ == "")
      val (wild, exact) = nonEmpty.partition(_.contains("%"))
      val tests = Seq(
        if (exact.nonEmpty) Some(v.isin(exact.map(x => x: Any): _*)) else None,
        if (wild.nonEmpty) Some(wild.map(p =>
          v.rlike(p.split("%", -1).map(java.util.regex.Pattern.quote).mkString("^", ".*", "$")))
          .reduce(_ || _)) else None,
        if (empties.nonEmpty) Some(v.isNull || v === "") else None
      ).flatten
      // MatchAny with no values matches nothing (interpreter parity)
      if (tests.isEmpty) lit(false)
      else tests.map(t => coalesce(t, lit(false))).reduce(_ || _)
    case MatchField(f) =>
      coalesce(element_at(tags, f) =!= "", lit(false))
    case MatchSource(ss) => source.isin(ss.map(x => x: Any): _*)
  }

  /**
   * MultiExpression first-match index (reference
   * `expression/MultiExpression.java:333`): given ordered (result,
   * expr) entries, produce a Column evaluating to the FIRST matching
   * result — compiled as a CASE WHEN chain preserving declaration
   * order (Catalyst codegens the whole chain; no runtime index needed).
   */
  def firstMatch(entries: Seq[(String, Expr)], tags: Column, source: Column): Column =
    entries.foldRight(lit(null).cast("string")) { case ((result, expr), elseCol) =>
      when(compile(expr.simplify, tags, source), lit(result)).otherwise(elseCol)
    }
}
