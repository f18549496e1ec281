package graft.functions

import graft.dsl.Script
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `cel_eval(script, tags, id, source)` — evaluate an inline profile
 * script (the CEL analog, [[graft.dsl.Script]]) as a Catalyst
 * expression. The script must be a literal: it compiles (and
 * constant-folds) ONCE at plan time, then evaluates per row against
 * the tags map / id / source columns.
 */
object ScriptFunctions {

  case class CelEval(children: Seq[Expression]) extends Expression with CodegenFallback {
    require(children.length == 4, "cel_eval(script, tags, id, source)")
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    @transient private lazy val compiled: Script.Compiled = {
      require(children.head.foldable, "cel_eval script must be a literal")
      Script.compile(children.head.eval(InternalRow.empty).toString)
    }

    override def eval(input: InternalRow): Any = {
      val tagsRaw = children(1).eval(input)
      val idRaw = children(2).eval(input)
      val srcRaw = children(3).eval(input)
      if (idRaw == null) return null
      val tags: Map[String, String] = tagsRaw match {
        case null => Map.empty
        case m: MapData =>
          val keys = m.keyArray(); val vals = m.valueArray()
          (0 until m.numElements()).iterator.flatMap { i =>
            val v = if (vals.isNullAt(i)) null else vals.getUTF8String(i).toString
            if (v == null) None else Some(keys.getUTF8String(i).toString -> v)
          }.toMap
      }
      val out = compiled.evalString(tags, idRaw.asInstanceOf[Long],
        if (srcRaw == null) "" else srcRaw.toString)
      if (out == null) null else UTF8String.fromString(out)
    }
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs)
  }

  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  def cel_eval(script: Column, tags: Column, id: Column, source: Column): Column =
    SqlBridge.col(CelEval(Seq(SqlBridge.expr(script), SqlBridge.expr(tags),
      toLong(SqlBridge.expr(id)), SqlBridge.expr(source))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("cel_eval",
      es => CelEval(Seq(es(0), es(1), toLong(es(2)), es(3))), "built-in")
}
