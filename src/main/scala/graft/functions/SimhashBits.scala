package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Simhash of an array<long> of token hashes: bit b of the result is set
  * iff sum over tokens of (+1 if bit b of the token hash is set else -1)
  * is >= 0. Bit-for-bit the same semantics as the 48 separate
  * `aggregate(th, 0L, ...)` folds it replaces — those are interpreted
  * lambda evaluations (HOF lambdas never enter codegen) and were the
  * suite's last big interpreted hot spot; this is one compiled pass.
  *
  * An EMPTY token array yields 0, not all-bits-set: zero tokens is zero
  * evidence for any bit (the >= 0 vacuous-truth reading would set every
  * bit and make all empty documents hamming-0 near-dups of each other at
  * a hash no real document can reach), and 0 is also what the SQL twin
  * computes (list_sum over an empty list is NULL, so no CASE term fires
  * — see the q43 oracle in [[graft.operators.Dedup]]). With non-empty
  * input, bit 63 still never fires for [[TextOps.tokenHashes64]] hashes
  * (the mix keeps bit 63 clear, so its sum is -n < 0).
  */
case class SimhashBits(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    if (th.numElements() == 0) return 0L
    val counts = new Array[Int](bits)
    var j = 0
    while (j < th.numElements()) {
      val h = th.getLong(j)
      var b = 0
      while (b < bits) {
        counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) >= 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, th => {
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
         |long $sim = 0L;
         |if ($th.numElements() > 0) {
         |  int[] $counts = new int[$bits];
         |  for (int $j = 0; $j < $th.numElements(); $j++) {
         |    long $h = $th.getLong($j);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $counts[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ($counts[$b] >= 0) $sim |= (1L << $b);
         |  }
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}
