package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** O(1) hash lookup into a RAM-resident dictionary table — the per-row
  * kernel behind [[graft.sources.Dictionary]] (the CH external-dictionary
  * analog; the reference's schema keys most tables by enum-like ids that
  * CH deployments resolve through `dictGet`, migrations/ and
  * [ddl] `sql/` in `/root/reference`).
  *
  * Why an Expression and not a join: a dictionary is by definition small
  * enough for every executor to hold (that's what makes it a dictionary);
  * resolving it per row costs one hash probe inside WholeStageCodegen —
  * no shuffle, no join node, no row-batch boundary. The table rides the
  * serialized expression in the task binary (broadcast once per stage),
  * holding CATALYST-converted keys and values so generated code compares
  * and returns them without conversion.
  *
  * Null semantics: NULL key → NULL; absent key → NULL (callers layer
  * `coalesce` for dictGetOrDefault / dictHas).
  */
case class DictLookup(
    child: Expression,
    table: java.util.HashMap[Any, AnyRef],
    override val dataType: DataType,
    dictName: String,
    attr: String) extends UnaryExpression {

  override def nullable: Boolean = true
  override def prettyName: String = "dict_get"
  override def toString: String = s"dict_get($dictName.$attr, $child)"

  override def eval(input: InternalRow): Any = {
    val k = child.eval(input)
    if (k == null) null else table.get(k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dictTable", table, "java.util.HashMap")
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("dictVal")
    val boxed = CodeGenerator.boxedType(dataType)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      ${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${c.isNull}) {
        Object $tmp = $mapRef.get((Object) ${c.value});
        if ($tmp != null) {
          ${ev.isNull} = false;
          ${ev.value} = ($boxed) $tmp;
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DictLookup =
    copy(child = newChild)
}
