package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `ARRAY<FLOAT>` columns (SURVEY.md §4.3 #1 — the flagship query's hot
  * loop; reference scoring is delegated to Pinecone's index,
  * `config.py:20`, `pinecone_manager.py:115-121`).
  *
  * Why an Expression and not the `aggregate(zip_with(...))` composition
  * ([[VectorOps.cosine]]): higher-order functions allocate a lambda frame
  * per element and box the accumulator; this expression compiles (via
  * `doGenCode`) to a tight primitive-float loop inside whole-stage
  * codegen — no allocation, no virtual calls — and stays codegen-
  * compatible so the surrounding projection/filter fuses around it.
  * Semantics vs the composition: identical double accumulation
  * (dot(a,b) / (||a||·||b||)), null if either input is null, and null on
  * MISMATCHED dimensions (a truncated score would mask corrupt data —
  * the zip_with composition surfaces the same case as null). The one
  * deliberate divergence: zero-norm inputs return 0.0 (the reference's
  * zero-vector fallback, `embedding_generator.py:111`) where the
  * composition yields NaN from 0/0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (ARRAY<FLOAT>, ARRAY<FLOAT>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on mismatched dimensions
  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      // Widen BEFORE multiplying: float*float rounds to float, which
      // would diverge from the double-cast composition / DuckDB oracle.
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i); double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |    : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })
}
