package graft.catalog

import graft.core.TableStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalog-resolved SQL functions. `bucket(n, key)` is the engine's md5
  * bucket transform as a V2 ScalarFunction — the piece that makes
  * storage-partitioned SQL WRITES work: a write into a bucket-partitioned
  * table requests clustering on `bucket(n, col)`, Spark resolves the
  * transform against this FunctionCatalog and shuffles rows by OUR bucket
  * arithmetic, so each task holds whole buckets and the writer rolls one
  * file per bucket (Iceberg registers its bucket function for exactly
  * this). Also directly callable: `SELECT cat.ns.bucket(16, id)`. */
object GraftFunctions {

  val names: Seq[String] = Seq("bucket")

  def load(name: String): Option[UnboundFunction] =
    if (name.equalsIgnoreCase("bucket")) Some(BucketUnbound) else None

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, key): md5-prefix bucket of key, in [0, n) — the table " +
        "format's bucket partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket(n, key) takes 2 arguments, got ${inputType.fields.length}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket(n, key): n must be INT, got ${inputType.fields(0).dataType}")
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  /** Hashes the key's Cast-to-string rendering, bit-identical to
    * [[TableStore.bucketOf]] (which hashes `key.cast("string")`), so SQL
    * writes, library writes, and merge planning all agree on bucket ids. */
  private final class BucketBound(keyType: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket($keyType)"
    // rendering delegated to Spark's own Cast so every type formats
    // exactly as bucketOf saw it
    @transient private lazy val render =
      Cast(BoundReference(1, keyType, nullable = true), StringType,
        Option("UTC"))
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val s = render.eval(input).asInstanceOf[UTF8String]
      TableStore.bucketOfString(if (s == null) null else s.toString, n)
    }
  }
}
