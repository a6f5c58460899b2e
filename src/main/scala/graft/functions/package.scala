package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * User-facing function surface of the engine (the analog of
 * `org.apache.spark.sql.functions` for graft-specific expressions).
 */
package object functions {

  /** Cassandra Murmur3 partition token of the given partition-key columns.
   *  See [[graft.functions.CassandraToken]]. */
  def graft_token(cols: Column*): Column = CassandraToken(cols: _*)

  /** Register graft SQL functions on a session so `spark.sql("... graft_token(...)")`
   *  works. Idempotent. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("graft_token")
    val info = new ExpressionInfo(classOf[CassandraToken].getName, "graft_token")
    registry.registerFunction(
      ident, info, (exprs: Seq[Expression]) => CassandraToken(exprs))
  }
}
