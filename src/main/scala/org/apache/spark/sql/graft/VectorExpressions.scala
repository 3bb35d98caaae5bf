package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<double>`.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*),…)`)
  * evaluates an interpreted lambda per element — measured ~30 s for the
  * hyperplane-LSH bucketing at sf0.1. These expressions generate a tight
  * Java loop inside whole-stage codegen instead (SURVEY.md §7 "custom
  * `Expression` for vector similarity if UDF proves too slow"), with an
  * interpreted `eval` fallback. Accumulation is strictly left-to-right, so
  * results are bit-identical to the sequential-fold formulation they
  * replace (and to an equivalent engine-side loop elsewhere).
  *
  * Null array elements are not supported (training-data embeddings are
  * dense); a null array input yields null via the standard null-safe path.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE array pass: dot, |a|², |b|² accumulated
  * together, result `dot / (sqrt(na) * sqrt(nb))` — the exact expression
  * shape of [[graft.ext.Similarity.cosine]], so values are bit-identical. */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)
}

/** All `tables × planesPerTable` hyperplane sign tests of LSH bucketing in
  * ONE array pass: output element t packs the table's `planesPerTable`
  * sign bits into a bucket id (`Σ (dot(v, plane_p) >= 0 ? 1<<p : 0)`).
  * Replaces `tables·planesPerTable` independent fold expressions that each
  * re-read the vector. Dot accumulation is strictly left-to-right per
  * plane, so bucket ids are bit-identical to the per-plane formulation
  * (and to an engine-side replica with the same plane literals). */
case class HyperplaneBuckets(child: Expression, planes: Array[Double],
    tables: Int, planesPerTable: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(planes.length == tables * planesPerTable * dim)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < planesPerTable) {
        val off = (t * planesPerTable + p) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * planes(off + i); i += 1 }
        if (s >= 0) out(t) |= (1L << p)
        p += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  for (int $p = 0; $p < $planesPerTable; $p++) {
         |    int $off = ($t * $planesPerTable + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $a.getDouble($i) * $planesRef[$off + $i];
         |    }
         |    if ($s >= 0) $out[$t] |= (1L << $p);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** All `outDim` signed-sum components of a JL random projection in ONE
  * array pass over int8 codes: out(j) = Σ_i codes(i)·signs(j·inDim+i),
  * signs ∈ {−1,+1}. Replaces the interpreted
  * `transform(sequence, j => aggregate(zip_with(...)))` chain, which ran
  * a boxed lambda per matrix element (~9.5 s for 2,000 vectors at
  * sf0.1); this is a tight int loop inside whole-stage codegen.
  * Accumulation is strictly ascending-i per component and every sum is
  * exact in long (|out| ≤ dim·127), so results are bit-identical to the
  * fold formulation and to any engine-side replay. */
case class SignedProjection(child: Expression, signs: Array[Int],
    outDim: Int, inDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(signs.length == outDim * inDim,
    s"signs length ${signs.length} != $outDim x $inDim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "signed_projection"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), inDim)
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      val off = j * inDim
      var s = 0L
      var i = 0
      while (i < n) { s += v.getInt(i).toLong * signs(off + i); i += 1 }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $inDim);
         |long[] $out = new long[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  int $off = $j * $inDim;
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (long) $a.getInt($i) * $signsRef[$off + $i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignedProjection =
    copy(child = newChild)
}

/** sql-package-private bridge used by graft.functions.VectorFunctions. */
object VectorBridge {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorCosine(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplaneBuckets(v: Column, planes: Array[Double], tables: Int,
      planesPerTable: Int, dim: Int): Column =
    ExpressionUtils.column(HyperplaneBuckets(
      ExpressionUtils.expression(v), planes, tables, planesPerTable, dim))

  def signedProjection(codes: Column, signs: Array[Int], outDim: Int,
      inDim: Int): Column =
    ExpressionUtils.column(SignedProjection(
      ExpressionUtils.expression(codes), signs, outDim, inDim))

  /** Expose the expressions as SQL functions (`vector_dot`, `vector_cosine`)
    * on an already-built session — complements [[graft.GraftExtensions]]
    * which injects them at session-build time. */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vector_dot",
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_cosine",
      (exprs: Seq[Expression]) => VectorCosine(exprs(0), exprs(1)), "built-in")
  }
}
