package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}

/** doGenCode for complex single-pass expressions: emit one call to the
  * task-local expression object instead of using CodegenFallback.
  *
  * CollapseCodegenStages excludes any operator containing a
  * CodegenFallback expression from whole-stage codegen, so a fallback
  * inside a Project splits the WSCG span and forces a row
  * materialization boundary around it. A direct reference call keeps
  * the span intact while the algorithm itself stays ordinary Scala —
  * the right trade for md5/shingle/rolling-hash loops that would be
  * unreadable as generated Java.
  *
  * Thread-safety: the reference object is task-local (each task
  * deserializes its own copy of the task binary), so per-object state
  * such as a MessageDigest is thread-confined.
  */
trait RefCallCodegen extends UnaryExpression {

  /** Public bridge so generated Java can reach the protected eval. */
  final def evalNonNull(v: Any): Any = nullSafeEval(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this,
      classOf[RefCallCodegen].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${CodeGenerator.boxedType(dataType)}) $ref.evalNonNull($c);")
  }
}
