package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.LongType

/** Morton (z-order) interleave as a raw Catalyst expression tree — the
  * SQL-surface twin of [[graft.sources.ZOrderStore.interleave16]]'s
  * Column composition. `injectFunction` builders must return trees of
  * concrete expressions (a bridged Column arrives as unresolved column
  * nodes the analyzer never visits on that path), hence this second
  * spelling; ExtensionsSpec pins both to the same values.
  */
object Morton {

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd
    * positions); inputs are cast to long so integer-typed SQL literals
    * work. */
  def interleave16Expr(a: Expression, b: Expression): Expression = {
    val la = Cast(a, LongType)
    val lb = Cast(b, LongType)
    def bit(e: Expression, i: Int, pos: Int): Expression =
      ShiftLeft(BitwiseAnd(ShiftRight(e, Literal(i)), Literal(1L)), Literal(pos))
    (0 until 16)
      .flatMap(i => Seq(bit(la, i, 2 * i), bit(lb, i, 2 * i + 1)))
      .reduce(BitwiseOr)
  }
}
