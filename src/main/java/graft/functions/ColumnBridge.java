package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Bridge between catalyst {@code Expression}s and user-facing
 * {@code Column}s for the classic (non-Connect) engine.
 *
 * Spark 4 marks {@code org.apache.spark.sql.classic.ExpressionUtils}
 * {@code private[sql]}, but that visibility exists only in the Scala
 * signature — the JVM static forwarders are public, so a Java call
 * site is the sanctioned-bytecode way for an extension library to
 * wrap its custom expressions (e.g. {@link RollingHash}) as Columns.
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
  }
}
