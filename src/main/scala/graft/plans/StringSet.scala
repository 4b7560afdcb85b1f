package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hash-set membership test against a FIXED string vocabulary —
  * the O(1) probe a trained-tokenizer apply loop needs where the
  * built-in alternatives are linear or worse:
  *
  *  - `array_contains(vocabLit, x)` scans the whole literal array per
  *    probe — O(|vocab|) at EVERY cursor step of a greedy segmenter,
  *    ~3·MaxWordLen probes per word type;
  *  - `isInCollection` only becomes a hash-set `InSet` when the
  *    optimizer's OptimizeIn rule rewrites it, and that rule does NOT
  *    descend into higher-order-function lambda bodies — inside an
  *    `aggregate` fold it stays a |vocab|-child `In` chain.
  *
  * Measured on a 200k-row word-type frame against a 10.5k-unit
  * vocabulary (the WordPiece greedy fold, local[4]): this expression
  * 2.1 s, the `In` chain 5.9 s, `array_contains` 64.3 s — 31× — with
  * identical segmentations.
  *
  * The vocabulary is a constructor field (not an expression child), so
  * the hash set is built once per executor (`@transient lazy`) and the
  * probe is a single UTF8String hash lookup in both the interpreted
  * path (which is what runs inside HOF lambdas) and codegen.
  */
case class StringSetContains(child: Expression, values: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_string_set_native"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(values.size * 2, 16))
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  def contains(v: UTF8String): Boolean = set.contains(v)

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(set.contains(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("inStringSet", this,
      classOf[StringSetContains].getName)
    defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringSetNative {
  val Name = "in_string_set_native"

  /** Registry form takes the vocabulary as a foldable array<string>
    * second argument and freezes it into the expression at resolution
    * time (the PqCodes int-argument precedent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => StringSetContains(asString(exprs(0)),
        arrayArg(exprs(1))), "built-in")

  private[plans] def asString(e: Expression): Expression =
    if (e.dataType == StringType) e else Cast(e, StringType)

  private[plans] def arrayArg(e: Expression): Seq[String] = {
    require(e.foldable,
      s"$Name: the vocabulary argument must be a literal array")
    val arr = e.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val v = arr.getUTF8String(i)
      if (v == null) null else v.toString
    }
  }

  /** O(1) membership of `c` in the fixed `values` vocabulary. */
  def inStringSet(spark: SparkSession, c: Column,
                  values: Seq[String]): Column = {
    register(spark)
    call_function(Name, c, typedLit(values))
  }
}
