package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-hyperplane LSH codes as a single native expression.
  *
  * Composing this from builtins needs `tables x bits` sign-bit columns,
  * each a dot product against a 64-literal array — ~4600 literal nodes in
  * one projection, which overflows whole-stage codegen limits and drops
  * the whole stage to interpreted eval (measured: the q51 code projection
  * lost its codegen star and cost ~3s of the query). Here the hyperplane
  * matrix rides along as a codegen reference object and the generated
  * code is one tight triple loop.
  *
  * Returns `tables` longs; bit i of code t is the sign of
  * dot(e, planes[t*bits + i]).
  */
case class HyperplaneCodes(child: Expression, planes: Array[Array[Double]],
    bits: Int) extends UnaryExpression {

  private def tables: Int = planes.length / bits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def code(e: ArrayData, t: Int): Long = {
    var c = 0L
    var i = 0
    while (i < bits) {
      val h = planes(t * bits + i)
      var d = 0.0
      var j = 0
      val n = math.min(h.length, e.numElements())
      while (j < n) { d += e.getDouble(j) * h(j); j += 1 }
      if (d >= 0) c |= (1L << i)
      i += 1
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    new GenericArrayData(Array.tabulate(tables)(t => code(e, t)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |long[] $codes = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $c = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    double[] $h = $p[$t * $bits + $i];
         |    double $d = 0.0;
         |    int $n = java.lang.Math.min($h.length, $e.numElements());
         |    for (int $j = 0; $j < $n; $j++) {
         |      $d += $e.getDouble($j) * $h[$j];
         |    }
         |    if ($d >= 0) $c |= (1L << $i);
         |  }
         |  $codes[$t] = $c;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodes =
    copy(child = newChild)
}
