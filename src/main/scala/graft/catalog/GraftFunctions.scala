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

  val names: Seq[String] =
    Seq("bucket", "days", "months", "hours", "years", "truncate")

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase match {
      case "bucket" => Some(BucketUnbound)
      case "days" => Some(new TemporalUnbound("days", "yyyy-MM-dd"))
      case "months" => Some(new TemporalUnbound("months", "yyyy-MM"))
      case "hours" => Some(new TemporalUnbound("hours", "yyyy-MM-dd-HH"))
      case "years" => Some(new TemporalUnbound("years", "yyyy"))
      case "truncate" => Some(TruncateUnbound)
      case _ => None
    }

  /** Temporal partition transforms as V2 functions, so writes into
    * days/months/hours/years-partitioned tables can request clustering on
    * the transform (same mechanism as `bucket`; Iceberg registers these
    * identically). Rendering matches [[TableStore.transformExpr]]'s
    * `date_format` pattern; the fixed UTC zone mirrors the sessions this
    * store documents (bench/verify pin spark.sql.session.timeZone=UTC). */
  private final class TemporalUnbound(fname: String, pattern: String)
      extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(ts): the table format's $fname partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fname(ts) takes 1 argument, got ${inputType.fields.length}")
      val dt = inputType.fields(0).dataType
      require(dt == TimestampType || dt == DateType,
        s"$fname(ts) needs a timestamp/date argument, got $dt")
      new TemporalBound(fname, pattern, dt)
    }
  }

  private final class TemporalBound(fname: String, pattern: String,
      argType: DataType) extends ScalarFunction[UTF8String] {
    override def inputTypes(): Array[DataType] = Array(argType)
    override def resultType(): DataType = StringType
    override def name(): String = fname
    override def canonicalName(): String = s"graft.$fname($argType)"
    @transient private lazy val render =
      org.apache.spark.sql.catalyst.expressions.DateFormatClass(
        Cast(BoundReference(0, argType, nullable = true), TimestampType,
          Option("UTC")),
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(pattern), StringType),
        Option("UTC"))
    override def produceResult(input: InternalRow): UTF8String =
      render.eval(input).asInstanceOf[UTF8String]
  }

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, s): byte-prefix truncate partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate(w, s) takes 2 arguments, got ${inputType.fields.length}")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate(w, s): w must be INT, got ${inputType.fields(0).dataType}")
      require(inputType.fields(1).dataType == StringType,
        s"truncate(w, s): s must be STRING, got ${inputType.fields(1).dataType}")
      TruncateBound
    }
  }

  private object TruncateBound extends ScalarFunction[UTF8String] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = StringType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate"
    override def produceResult(input: InternalRow): UTF8String = {
      val w = input.getInt(0)
      val s = input.getUTF8String(1)
      if (s == null) null else UTF8String.fromString(s.toString.take(w))
    }
  }

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
