package graft

import graft.functions.DoubleDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("... graft_dot(a, b) ...")`
  * works for SQL-surface users exactly like the Column API
  * ([[graft.functions.VectorOps.dot]]).
  *
  * Install via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — done by
  * [[Engine.session]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DoubleDot(children.head, children(1))
      }))
  }
}
