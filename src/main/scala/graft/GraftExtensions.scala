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
    // The whole session expression language as a SQL predicate:
    //   SELECT ... FROM sessions WHERE graft_expr('http.uri == *login* && country == US')
    // The compiled tree contains UnresolvedAttributes for the session
    // columns; the analyzer resolves them against the enclosing plan, so
    // the function works over any relation with session-schema columns
    // (table, view, subquery). Relative dates snap against
    // `spark.graft.now` (ISO instant) when set — pin it for deterministic
    // replay — else wall clock.
    ext.injectFunction((
      FunctionIdentifier("graft_expr"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_expr"),
      GraftExtensions.graftExprBuilder))
  }
}

object GraftExtensions {

  /** FunctionBuilder for `graft_expr('<session expression>')`. */
  private[graft] def graftExprBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "graft_expr('<session expression>')")
    val q = exprs.head match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_expr: expression must be a string literal, got $other")
    }
    val now =
      try java.time.Instant.parse(org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.now"))
      catch { case _: Exception => java.time.Instant.now() }
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(
      new graft.expr.Compiler(graft.model.FieldRegistry.sessions,
        graft.model.FieldRegistry.sessionCol, now).compile(q))
  }

  /** Imperative twin of the config-only injection, for sessions the
    * library did build itself (Sessions.builder / tests). Also registers
    * the fused pipeline kernels as SQL UDFs so `spark.sql` users get the
    * same per-document one-call hashing the Column API uses:
    * `shingle_hashes(text, k, distinct)` → array<long>,
    * `graft_simhash(text)` → long.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.CidrExpression.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_expr", graftExprBuilder, "built-in")
    spark.udf.register("shingle_hashes",
      (s: String, k: Int, distinct: Boolean) =>
        graft.functions.ShingleHashes.hashes(s, k, distinct))
    spark.udf.register("graft_simhash",
      (s: String) => graft.functions.ShingleHashes.simhash32(s))
  }
}
