package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, CountContained}

/** Engine SQL surface: `spark.sql.extensions=graft.GraftExtensions`
  * registers the engine's native functions so plain `spark.sql(...)`
  * users get them too (the Spark-idiomatic way to ship custom
  * expressions — no internal APIs, works on any session including
  * Connect server-side).
  *
  * Currently: `cosine_sim(ARRAY<FLOAT>, ARRAY<FLOAT>) -> DOUBLE`
  * ([[graft.functions.CosineSimilarity]]).
  */
object GraftExtensions {
  /** Register the same functions on an already-running session (for
    * sessions not built with the extensions config). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftColumns.registerFunction(spark, "cosine_sim", {
      children =>
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
    })
    org.apache.spark.sql.GraftColumns.registerFunction(spark, "count_contained", {
      children =>
        require(children.size == 2, "count_contained takes exactly 2 arguments")
        CountContained(children.head, children(1))
    })
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("count_contained"),
      new ExpressionInfo(classOf[CountContained].getName, "count_contained"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "count_contained takes exactly 2 arguments")
        CountContained(children.head, children(1))
      }))
  }
}
