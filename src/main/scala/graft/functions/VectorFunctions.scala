package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorBridge

/** Public entry points for the native codegen'd vector expressions
  * (implementation in org.apache.spark.sql.graft — the expressions need
  * sql-package-private Catalyst types like AbstractDataType). */
object VectorFunctions {
  /** One-pass codegen'd dot product over two array<double> columns. */
  def vecDot(a: Column, b: Column): Column = VectorBridge.vecDot(a, b)

  /** One-pass codegen'd cosine similarity over two array<double> columns. */
  def vecCosine(a: Column, b: Column): Column = VectorBridge.vecCosine(a, b)

  /** All hyperplane-LSH sign tests in one codegen'd array pass: element t
    * of the result packs table t's plane sign bits into a bucket id. */
  def hyperplaneBuckets(v: Column, planes: Array[Double], tables: Int,
      planesPerTable: Int, dim: Int): Column =
    VectorBridge.hyperplaneBuckets(v, planes, tables, planesPerTable, dim)

  /** Register `vector_dot`/`vector_cosine` as SQL functions on a session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    VectorBridge.registerSqlFunctions(spark)
}
