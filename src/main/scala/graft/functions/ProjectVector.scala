package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense random-projection (matrix × vector) as one native expression —
  * the Johnson–Lindenstrauss dimensionality reduction that shrinks the
  * bytes an ANN scan touches (the companion lever to q54's 8-bit
  * quantization: fewer DIMENSIONS instead of smaller cells).
  *
  * Same codegen rationale as [[HyperplaneCodes]]: composing k output
  * dims from builtins needs k × 64 literal nodes, which overflows
  * whole-stage codegen; here the plane matrix rides along as a codegen
  * reference object and the generated code is one tight double loop.
  * Returns `planes.length` doubles; element i is dot(e, planes(i)).
  */
case class ProjectVector(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Double](planes.length)
    var i = 0
    while (i < planes.length) {
      val h = planes(i)
      var d = 0.0
      var j = 0
      val n = math.min(h.length, e.numElements())
      while (j < n) { d += e.getDouble(j) * h(j); j += 1 }
      out(i) = d
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      s"""
         |double[] $out = new double[${planes.length}];
         |for (int $i = 0; $i < ${planes.length}; $i++) {
         |  double[] $h = $p[$i];
         |  double $d = 0.0;
         |  int $n = java.lang.Math.min($h.length, $e.numElements());
         |  for (int $j = 0; $j < $n; $j++) {
         |    $d += $e.getDouble($j) * $h[$j];
         |  }
         |  $out[$i] = $d;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProjectVector =
    copy(child = newChild)
}
