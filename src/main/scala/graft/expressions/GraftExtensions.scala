package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session wiring for the engine's native expressions so they are callable
  * from SQL text as well as the Column API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or on a live session:
  *   GraftExtensions.register(spark)
  *   spark.sql("SELECT polyhash(text), dot_product(a, b) FROM t")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.polyhashDescriptor)
    e.injectFunction(GraftExtensions.dotProductDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private val polyhashDescriptor =
    (FunctionIdentifier("polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "polyhash"),
      (children: Seq[Expression]) => PolyHash(children.head))

  private val dotProductDescriptor =
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("polyhash",
      (children: Seq[Expression]) => PolyHash(children.head), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      (children: Seq[Expression]) => DotProduct(children(0), children(1)), "built-in")
  }
}
