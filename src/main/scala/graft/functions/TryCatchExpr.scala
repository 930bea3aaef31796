package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** plpgsql `BEGIN ... EXCEPTION WHEN <cond> THEN ...` (reference
  * `src/pl/plpgsql/src/pl_exec.c` exec_stmt_block's PG_CATCH path) as
  * ONE expression: evaluate the body; if it RAISES an error of the
  * handled class, evaluate the handler instead. The same try/catch
  * shape Spark's own TryEval uses for try_add/try_divide — but with a
  * handler expression instead of a fixed NULL, which is exactly PG's
  * block semantics (the handler sees the block's inputs, not partial
  * state). Fully codegen: the generated Java wraps the body's code in
  * try/catch, so the error path costs nothing until an error occurs.
  *
  * Condition classes map to JVM error types: `division_by_zero` and
  * `numeric_value_out_of_range` catch ArithmeticException (what ANSI
  * Spark raises for integral/decimal division by zero and overflow);
  * `others` catches any Exception — including `raise_error` and cast
  * failures, as PG's OTHERS does. Known divergence: PG raises
  * division_by_zero for float8/0 while IEEE doubles yield Infinity in
  * Spark (with or without this expression) — use integral/decimal
  * operands where the raise matters. */
case class PlpgsqlCatch(body: Expression, handler: Expression,
                        errClass: String) extends Expression {

  override def children: Seq[Expression] = Seq(body, handler)
  override def dataType: DataType = body.dataType
  override def nullable: Boolean = body.nullable || handler.nullable
  override def foldable: Boolean = body.foldable && handler.foldable
  override def prettyName: String = "plpgsql_catch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PlpgsqlCatch.conditions.contains(errClass))
      TypeCheckResult.TypeCheckFailure(
        s"unsupported plpgsql condition '$errClass' " +
          s"(supported: ${PlpgsqlCatch.conditions.mkString(", ")})")
    else if (DataType.equalsStructurally(body.dataType, handler.dataType,
      ignoreNullability = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"plpgsql handler type ${handler.dataType.simpleString} does not match " +
        s"body type ${body.dataType.simpleString}")

  private def catchableJavaType: String = errClass match {
    case "division_by_zero" | "numeric_value_out_of_range" =>
      "java.lang.ArithmeticException"
    case _ => "java.lang.Exception"
  }

  override def eval(input: InternalRow): Any =
    try body.eval(input)
    catch {
      case e: Exception
        if catchableJavaType == "java.lang.Exception" ||
          e.isInstanceOf[ArithmeticException] => handler.eval(input)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bodyGen = body.genCode(ctx)
    val handlerGen = handler.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        try {
          ${bodyGen.code}
          ${ev.isNull} = ${bodyGen.isNull};
          ${ev.value} = ${bodyGen.value};
        } catch ($catchableJavaType ${ctx.freshName("e")}) {
          ${handlerGen.code}
          ${ev.isNull} = ${handlerGen.isNull};
          ${ev.value} = ${handlerGen.value};
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PlpgsqlCatch =
    copy(body = newChildren(0), handler = newChildren(1))
}

object PlpgsqlCatch {
  val conditions: Seq[String] =
    Seq("division_by_zero", "numeric_value_out_of_range", "others")
}
