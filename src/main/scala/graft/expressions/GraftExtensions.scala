package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session wiring for the engine's native expressions so they are callable
  * from SQL text as well as the Column API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or on a live session:
  *   GraftExtensions.register(spark)
  *   spark.sql("SELECT polyhash(text), min_hash_sig(text) FROM t")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(e.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "polyhash" -> (children => PolyHash(children.head)),
    "dot_product" -> (children => DotProduct(children(0), children(1))),
    "min_hash_sig" -> (children => MinHashSig(children.head)),
    "winnow_sig" -> (children => WinnowSig(children.head)),
    "sim_hash_sig" -> (children => SimHashSig(children.head)),
    // n is an optional int literal (default 5) — it must not be silently
    // dropped: ngram_hashes(text, 8) has different semantics. The second
    // argument shapes the kernel itself, so it must be a FOLDABLE integer
    // >= 1: a column reference here would mis-resolve (eval() on an
    // unbound attribute), and n = 0 or negative would index out of the
    // token-boundary arrays.
    "ngram_hashes" -> (children => children match {
      case Seq(c) => NgramHashes(c)
      case Seq(c, n) =>
        val integral = n.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType => true
          case _ => false
        }
        if (!n.foldable || !integral)
          throw new IllegalArgumentException(
            "ngram_hashes: n must be an integer literal, got " + n.sql)
        val nv = n.eval().asInstanceOf[Number]
        if (nv == null || nv.intValue() < 1)
          throw new IllegalArgumentException(
            s"ngram_hashes: n must be >= 1, got $nv")
        NgramHashes(c, nv.intValue())
      case _ => throw new IllegalArgumentException(
        s"ngram_hashes expects 1 or 2 arguments, got ${children.length}")
    }),
    "array_max_abs" -> (children => ArrayMaxAbs(children.head)),
    "quantize_max_err" -> (children => QuantizeMaxErr(children.head)))

  private val descriptors = builders.map { case (name, builder) =>
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name), builder)
  }

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
