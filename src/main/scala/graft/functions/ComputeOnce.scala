package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Value-passthrough barrier that keeps an expensive projected column
  * from being re-evaluated by predicate pushdown.
  *
  * `df.withColumn("score", expensive).filter($"score" >= t)` looks like
  * one evaluation, but Catalyst pushes the filter below the projection,
  * rewriting the predicate to `expensive >= t` — the kernel then runs
  * once in the Filter and again in the Project (Spark's whole-stage
  * codegen does not share subexpressions ACROSS operators). Measured on
  * this engine's retrieval path, that is ~25% of query time.
  *
  * Wrapping the projected expression in `ComputeOnce` declares it
  * non-deterministic, which `PushPredicateThroughNonJoin` refuses to push
  * through — the filter stays above the projection and references the
  * materialized attribute. Evaluation and codegen delegate to the child
  * unchanged (the value IS deterministic; the flag is only a plan
  * barrier), so the expression stays inside whole-stage codegen.
  *
  * Use where a filter (not a rank-limit) consumes an expensive projected
  * column. Where the consumer is `row_number() <= k`, prefer ranking
  * first and filtering after — see `Retrieval.keywordSearch`.
  */
object ComputeOnce {
  /** Column-level wrapper — the form every call site wants: projects
    * `c` behind the barrier so downstream lambdas/filters reference the
    * materialized attribute instead of inlining (and re-evaluating) the
    * expression. */
  def once(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumns.column(
      ComputeOnce(org.apache.spark.sql.GraftColumns.expression(c)))
}

case class ComputeOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "compute_once"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): ComputeOnce =
    copy(child = newChild)
}
