package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `seeds` minhash values of an array<long> of element hashes in one
  * native pass.
  *
  * The builtin composition (`seeds` x `array_min(transform(hs, h =>
  * xxhash64(h, seed)))`) builds an expression tree of ~2.5k lambda nodes
  * that falls out of whole-stage codegen and evaluates interpreted —
  * ~33M boxed lambda calls at sf0.1 in q42's signature build. Here one
  * compiled double loop remixes each element hash per seed with
  * splitmix64 (a full-period 64-bit finalizer; the hash family only
  * needs determinism and good mixing — nothing downstream depends on
  * xxhash64 specifically, since LSH candidates are always re-verified
  * with the exact Jaccard).
  *
  * Empty input arrays produce Long.MaxValue minima (documents shorter
  * than one shingle never collide into any band bucket of real docs).
  */
case class MinhashSignature(child: Expression, seeds: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @inline private def mix(h: Long, seed: Int): Long = {
    var z = h + 0x9e3779b97f4a7c15L * (seed + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(seeds)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var s = 0
      while (s < seeds) {
        val v = mix(h, s)
        if (v < out(s)) out(s) = v
        s += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      s"""
         |long[] $out = new long[$seeds];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $hs.numElements(); $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $s = 0; $s < $seeds; $s++) {
         |    long $z = $h + 0x9e3779b97f4a7c15L * ($s + 1);
         |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $out[$s]) $out[$s] = $z;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
