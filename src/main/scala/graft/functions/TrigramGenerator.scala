package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram table generator — a REAL Catalyst [[Generator]]
  * (SURVEY §4.2 rung (b⁺), VERDICT r12 missing #5: `udtf_generator`
  * proves the explode/flatMap surface; this is the extension-backed
  * twin that plans as its own `Generate` node).
  *
  * One input string row expands to one output row per length-3 window
  * (n − 2 rows for an n-char string; null or sub-trigram input yields
  * zero rows — exactly the `explode(sequence(...))` guard the composed
  * form needs by hand, here owned by the generator itself).
  *
  * Semantics notes:
  * - Windows are by Java char index. The fixture is ASCII, where char,
  *   code point, and DuckDB `substr` positions coincide (the shingleTids
  *   convention); a surrogate-pair corpus would need code-point stepping.
  * - Registered two ways, like the Vec kernel family: imperatively via
  *   [[Vec.register]] (so the driver's vanilla session resolves
  *   `graft_trigrams(text)` through the same helper path every query
  *   uses) and declaratively via [[graft.plans.GraftExtensions]] (plain
  *   SQL on an extension-built session — tested in ExtensionsRuleSpec).
  * - CodegenFallback: Generate evaluates the generator per row; the
  *   SURROUNDING plan stays in whole-stage codegen (GenerateExec
  *   supports codegen for its child side), which PlanSpec pins.
  */
case class TrigramGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("tri", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_trigrams expects STRING, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < 3) Nil
      else (0 to s.length - 3).iterator
        .map(i => InternalRow(UTF8String.fromString(s.substring(i, i + 3))))
    }
  }

  override def prettyName: String = "graft_trigrams"

  override protected def withNewChildInternal(newChild: Expression): TrigramGenerator =
    copy(child = newChild)
}
