package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the embedding-similarity family (x1, x5-x7).
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * correct but slow at scale: Catalyst evaluates higher-order-function
  * lambdas interpreted, per element, with a freshly allocated intermediate
  * array per row pair; a per-bucket self-join over 64-dim embeddings spends
  * most of its CPU inside that lambda machinery. These expressions run the
  * same left-to-right float math as one fused whole-stage-codegen'd loop
  * over the raw ArrayData (no intermediate array, no boxing), reading
  * float32 embeddings directly — the upstream per-element cast-to-double
  * `transform` disappears too (widening happens inside the loop, exactly).
  *
  * Bit-compatibility contract: accumulation is left-to-right from 0.0 with
  * per-element double widening — the identical sequence of IEEE operations
  * as the zip_with form and as the DuckDB oracle's list_inner_product /
  * list_cosine_similarity on DOUBLE[] casts, so hash-verified results are
  * unchanged. Mismatched lengths return NULL at the expression layer (the
  * zip_with form nulls out too — ragged input is a data error, not a
  * truncation); null elements read as 0 (embeddings carry neither).
  */
object VectorKernels {

  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def norm(a: ArrayData, aFloat: Boolean): Double =
    math.sqrt(dot(a, aFloat, a, aFloat))

  /** Nearest-code argmin for product quantization: `flat` holds K
    * codewords of width w = flat.length / k concatenated in CODE ORDER;
    * returns [d, code] for the code minimizing the round-6 expanded L2
    * — EXACTLY the [[graft.operators.ProductQuantizer.l2sq]] decision:
    * d_c = round((|sv|² − 2·sv·cb_c) + |cb_c|², 6), strict-< tracking so
    * ties keep the SMALLEST code. One fused loop replaces a K-entry
    * higher-order-function argmin whose lambda Catalyst evaluates
    * interpreted per entry (struct allocation per candidate — the
    * measured bottleneck of codebook training at m=32/k=64); every
    * IEEE operation, the HALF_UP rounding (Spark's `round`), and the
    * tie-break are identical, so codes and oracle hashes are unchanged
    * (spec-held: kernel == HOF form). */
  def nearestCode(sv: ArrayData, svFloat: Boolean, flat: ArrayData,
      k: Int): ArrayData = {
    val w = flat.numElements() / k
    val aa = dot(sv, svFloat, sv, svFloat)
    var bestD = Double.MaxValue
    var bestC = -1
    var c = 0
    while (c < k) {
      var ab = 0.0
      var bb = 0.0
      var j = 0
      val off = c * w
      while (j < w) {
        val x = if (svFloat) sv.getFloat(j).toDouble else sv.getDouble(j)
        val y = flat.getDouble(off + j)
        ab += x * y
        bb += y * y
        j += 1
      }
      // same association as the expression form: (aa − 2·ab) + bb,
      // then Spark round's HALF_UP at 6 (scala BigDecimal(double) is
      // the exact code path Catalyst's Round takes for DoubleType)
      val d = BigDecimal((aa - 2.0 * ab) + bb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (d < bestD) { bestD = d; bestC = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Double](bestD, bestC.toDouble))
  }

  /** dot(a,b) / (|a|·|b|) in one pass over both arrays. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sab += x * y
      saa += x * x
      sbb += y * y
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }
}

object VectorExprs {
  def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkVec(e: Expression, side: String): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$side must be array<float|double>, got ${other.simpleString}")
    }

  /** Register vec_dot / vec_norm / vec_cosine on the session's function
    * registry (idempotent; temp-function route — see
    * [[graft.GraftExtensions]] for the catalog-extension route). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"))) {
      reg.createOrReplaceTempFunction("vec_dot",
        exprs => VecDotExpr(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("vec_norm",
        exprs => VecNormExpr(exprs.head), "built-in")
      reg.createOrReplaceTempFunction("vec_cosine",
        exprs => VecCosineExpr(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("vec_nearest_code",
        exprs => VecNearestCodeExpr(exprs(0), exprs(1), exprs(2)),
        "built-in")
    }
  }
}

/** [[VectorKernels.nearestCode]] as a codegen expression:
  * (sv array<float|double>, flat array<double>, k int) → [d, code].
  * NULL on a null/empty input or a flat length not divisible by k —
  * a codebook/width mismatch is a data error, never a truncation. */
case class VecNearestCodeExpr(sv: Expression, flat: Expression,
    k: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = sv
  override def second: Expression = flat
  override def third: Expression = k
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val s = VectorExprs.checkVec(sv, "sv")
    if (!s.isSuccess) s
    else (flat.dataType, k.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected (array<double>, int), got $other")
    }
  }
  private lazy val sF = VectorExprs.isFloat(sv)
  override protected def nullSafeEval(a: Any, f: Any, kk: Any): Any = {
    val (x, fl) = (a.asInstanceOf[ArrayData], f.asInstanceOf[ArrayData])
    val ki = kk match { case l: Long => l.toInt; case i: Int => i }
    if (ki <= 0 || fl.numElements() == 0 || fl.numElements() % ki != 0) null
    else VectorKernels.nearestCode(x, sF, fl, ki)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, f, kk) => s"""
      int graftK = (int) $kk;
      if (graftK <= 0 || $f.numElements() == 0
          || $f.numElements() % graftK != 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.nearestCode($a, $sF, $f, graftK);
      }""")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(sv = newFirst, flat = newSecond, k = newThird)
}

case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // ragged inputs yield null (below), independent of child nullability
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = VectorExprs.checkVec(left, "left")
    if (l.isSuccess) VectorExprs.checkVec(right, "right") else l
  }
  private lazy val lF = VectorExprs.isFloat(left)
  private lazy val rF = VectorExprs.isFloat(right)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else VectorKernels.dot(x, lF, y, rF)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.dot($a, $lF, $b, $rF);
      }""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class VecNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprs.checkVec(child, "argument")
  private lazy val cF = VectorExprs.isFloat(child)
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.norm(a.asInstanceOf[ArrayData], cF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm($a, $cF)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class VecCosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // ragged inputs yield null (below), independent of child nullability
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = VectorExprs.checkVec(left, "left")
    if (l.isSuccess) VectorExprs.checkVec(right, "right") else l
  }
  private lazy val lF = VectorExprs.isFloat(left)
  private lazy val rF = VectorExprs.isFloat(right)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else VectorKernels.cosine(x, lF, y, rF)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.cosine($a, $lF, $b, $rF);
      }""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
