package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}

/** Argmin-over-centroids as a single native expression: returns
  * struct(cluster int, d2 double) — the nearest centroid (ties -> lowest
  * id) and the exact squared L2 distance to it.
  *
  * Why native: composing this from builtins needs k distance expressions,
  * each a dot against a dim-literal array, referenced 2-3x across
  * `least` + the tie-breaking when-chain — k x dim x 3 literal nodes in
  * one projection, which overflows whole-stage codegen and drops the
  * stage to interpreted eval (the same failure mode HyperplaneCodes
  * exists to avoid). Here the k x dim centroid matrix rides along as a
  * codegen reference object and the generated code is one tight loop,
  * re-used unchanged by every Lloyd iteration and the final profile pass.
  *
  * Reference origin: ny_taxi/MlLibNyTaxiExamples.scala:69-87 (KMeans
  * assignment step).
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))

  private def k: Int = cents.length
  private def dim: Int = cents(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    // A vector whose length differs from the centroids' is a caller bug
    // (the centroids were estimated from these same vectors) — fail loud
    // rather than silently truncating the distance (DoubleDot policy).
    if (e.numElements() != dim)
      throw new IllegalArgumentException(
        s"NearestCentroid: vector dim ${e.numElements()} != centroid dim $dim")
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val diff = e.getDouble(i) - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestD))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val p = ctx.addReferenceObj("cents", cents, "double[][]")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val cent = ctx.freshName("cent")
      s"""
         |if ($e.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "NearestCentroid: vector dim " + $e.numElements() +
         |    " != centroid dim " + $dim);
         |}
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  double[] $cent = $p[$c];
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $diff = $e.getDouble($i) - $cent[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $best, $bestD });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
