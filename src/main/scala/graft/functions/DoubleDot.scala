package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)` —
  * the same left-to-right IEEE double fold, so results stay bit-identical
  * to the DuckDB oracle's list_reduce — but evaluated as a tight
  * generated loop with no intermediate zipped array and no per-element
  * lambda interpretation. This is the hot inner op of the similarity
  * family (q44 runs it ~12.5M times per sf0.1 pass), which is exactly
  * the "custom Catalyst Expression over builtin composition" tradeoff
  * SURVEY §6 reserves for proven hot loops.
  *
  * Nulls: null if either array is null (standard binary null semantics);
  * arrays are assumed element-non-null (parquet embeddings), enforced by
  * the cast upstream.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double> (callers cast; AbstractDataType
  // is private[sql] in Spark 4, so no ExpectsInputTypes here).
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}
