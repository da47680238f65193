package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED-ascending, duplicate-free `array<bigint>`
  * token-hash sets, as one fused codegen expression.
  *
  * This is the hot inner loop of every pair-verification stage (blocked /
  * prefix / LSH dedup, millions of candidate pairs): the composed
  * `size(array_intersect(a,b))` form builds a hash set per pair per row,
  * while this two-pointer merge is allocation-free and stays inside
  * whole-stage codegen. Value contract is IDENTICAL to
  * `|a ∩ b| / (|a| + |b| - |a ∩ b|)` with integer cardinalities divided in
  * double (so DuckDB oracles match bit-for-bit), including the 0/0 => NaN
  * edge for two empty sets. Inputs MUST be sorted ascending and distinct —
  * produce them with `sort_array(array_distinct(...))`; unsorted input
  * silently undercounts, which is why the Dedup operators own the prep.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        // null ELEMENTS have no set semantics and getLong on one returns
        // garbage silently — demand a provably null-free element type
        // (array_distinct(transform(...)) over non-null lambdas qualifies)
        TypeCheckResult.TypeCheckFailure(
          "jaccard_sorted requires array<bigint> with non-nullable elements; " +
            "wrap inputs so containsNull = false (e.g. filter(x -> x IS NOT NULL))")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"jaccard_sorted expects two array<bigint> arguments, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { inter += 1; i += 1; j += 1 }
    }
    inter.toDouble / (n + m - inter).toDouble
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n && $j < $m) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else { $inter++; $i++; $j++; }
         |}
         |${ev.value} = (double) $inter / (double) ($n + $m - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

object SetFunctions {

  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSorted(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sorted", {
        case Seq(a, b) => JaccardSorted(a, b)
        case es => throw new IllegalArgumentException(
          s"jaccard_sorted takes exactly 2 arguments, got ${es.length}")
      }, "built-in")
  }
}
