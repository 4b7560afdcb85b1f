package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native codegen'd set-Jaccard over two SORTED, DISTINCT arrays.
  *
  * The composable form — `size(array_intersect(a, b)) /
  * size(array_union(a, b))` — is correct and oracle-mirrorable, but
  * per PAIR it builds a hash set over one side, probes the other, and
  * materializes BOTH the intersection and the union arrays just to
  * take their sizes. On an LSH verify stage that is the hot loop: the
  * candidate count is orders above the document count, so the per-pair
  * constant dominates the whole near-dup pipeline (guide §4: make the
  * per-task inner loop allocation-free before touching anything else).
  *
  * This expression is a single merge pass over the two sorted arrays —
  * one intersection counter, zero allocation — and |∪| falls out as
  * |a| + |b| − |∩| (exact for distinct inputs). Sorting happens ONCE
  * per document (an `array_sort` in the projection that builds the
  * token/hash frame), not once per pair, which flips the economics:
  * O(T log T) per doc buys O(|a|+|b|) comparisons per pair with no
  * hashing and no garbage.
  *
  * Value contract: bit-identical to the composable form on its
  * declared inputs — sorted ascending, distinct, no null elements
  * (the NearDup pipelines guarantee all three: `array_distinct` +
  * `array_sort` over non-null tokens/hashes). Both-empty inputs yield
  * NaN (0.0/0.0), matching `size/size` division; a null ARRAY yields
  * null (nullSafeEval). Element types: array<bigint> (hashed
  * shingles) and array<string> (token sets), dispatched at bind time.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_jaccard"

  private lazy val isLongElem: Boolean = left.dataType match {
    case ArrayType(LongType, _)   => true
    case ArrayType(StringType, _) => false
    case other => throw new IllegalArgumentException(
      s"sorted_jaccard: need array<bigint> or array<string>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    if (isLongElem) {
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { inter += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < n && j < m) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    java.lang.Double.valueOf(inter.toDouble / (n + m - inter).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val cmp = ctx.freshName("cmp")
      // every local is ctx.freshName'd (the CosineSimilarity lesson:
      // fixed names break Janino when two instances share a scope)
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val step =
        if (isLongElem)
          s"""long $xv = $a.getLong($i); long $yv = $b.getLong($j);
             |int $cmp = $xv == $yv ? 0 : ($xv < $yv ? -1 : 1);""".stripMargin
        else
          s"int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));"
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n && $j < $m) {
         |  $step
         |  if ($cmp == 0) { $inter++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = (double) $inter / (double) ($n + $m - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccardNative {
  val Name = "sorted_jaccard"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => SortedJaccard(exprs(0), exprs(1)), "built-in")

  /** Jaccard over two sorted distinct arrays (array<bigint> or
    * array<string>, both sides the same type). */
  def sortedJaccard(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(Name, a, b)
  }
}
