package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{IpInCidrExpr, IpSortableExpr}

/** Library entry point for `spark.sql.extensions=graft.GraftExtensions`.
  *
  * On a shared cluster, sessions are usually created by the platform
  * (Thrift server, notebook kernel, job launcher) — not by library code —
  * so graft's native expressions must be injectable by config alone. Any
  * session built with the extension gets `ip_in_cidr` / `ip_sortable` in
  * its catalog; `graft.Sessions.builder` sessions can keep using the
  * imperative [[graft.functions.CidrExpression.register]] path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ip_in_cidr"),
      new ExpressionInfo(classOf[IpInCidrExpr].getName, "ip_in_cidr"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "ip_in_cidr(ipCol, 'cidr')")
        val cidr = exprs(1) match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"ip_in_cidr: cidr must be a string literal, got $other")
        }
        IpInCidrExpr(exprs.head, cidr)
      }))
    ext.injectFunction((
      FunctionIdentifier("ip_sortable"),
      new ExpressionInfo(classOf[IpSortableExpr].getName, "ip_sortable"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "ip_sortable(ipCol)")
        IpSortableExpr(exprs.head)
      }))
  }
}
