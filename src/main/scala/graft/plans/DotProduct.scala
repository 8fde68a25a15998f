package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native codegen'd dot product over array<float>/array<double>.
  *
  * Replaces the interpreted `aggregate(zip_with(...))` higher-order-function
  * fold in the vector hot paths (SURVEY §5): HOFs allocate a lambda frame
  * per element and never enter WholeStageCodegen, while this compiles to a
  * tight primitive loop inside the generated code. Accumulation is in
  * element order, so results stay bitwise identical to the fold (and to the
  * DuckDB oracle's left-associated sums).
  *
  * Null semantics: null array → null; null elements are skipped (treated
  * as 0 contribution) — matches cleaned embedding data where element nulls
  * cannot occur.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // fail loudly: a silently truncated sum is a plausible-but-wrong
    // similarity score (one corrupt short embedding would quietly re-rank
    // its whole neighborhood)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product length mismatch: ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var sum = 0.0d
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        sum += xv * yv
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product length mismatch: " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  val info = new ExpressionInfo(classOf[DotProduct].getName, "dot_product")
  val builder: Seq[Expression] => Expression = children => {
    require(children.size == 2, "dot_product takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }
}

/** SparkSessionExtensions entry point: register with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` to make
  * the graft function surface available from PLAIN SQL — `spark.sql(...)`
  * users get the same operators the DataFrame API exposes, with identical
  * semantics because each SQL name resolves to the very Column expression
  * the Scala function builds (no parallel implementation to drift):
  * `dot_product`/`shingle_hash` are the native codegen'd Expressions;
  * the `parse_*`/text functions unfold into their built-in expression
  * trees at resolution time, so they stay inside whole-stage codegen
  * exactly like their DataFrame twins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.Column
  import graft.functions.{CleanFns, TextFns}

  type Registration = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Adapt a Column-combinator to a FunctionRegistry builder: wrap the SQL
    * call's child expressions as Columns, apply the combinator, unwrap.
    */
  private def col1(name: String, fn: Column => Column): Registration = {
    val builder: Seq[Expression] => Expression = { children =>
      require(children.size == 1, s"$name takes exactly 1 argument")
      // Spark 4 Columns wrap ColumnNodes, not Expressions — adapt both
      // ways through the sql-package bridge (ExpressionUtils is
      // private[sql] in Spark 4)
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.toExpression(fn(GraftColumnBridge.toColumn(children.head)))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(CleanFns.getClass.getName, name), builder)
  }

  private val shingleBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1 || children.size == 2,
      "shingle_hash takes 1 or 2 arguments: shingle_hash(text[, n])")
    if (children.size == 1) ShingleHash(children.head, distinct = true)
    else {
      // width must be a literal: it shapes the expression, not a per-row
      // input (matches how Spark's own `ngrams`-style widths are consumed)
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v.toInt
        case other => throw new IllegalArgumentException(
          s"shingle_hash width must be an integer literal, got $other")
      }
      ShingleHash(children.head, distinct = true, n = n)
    }
  }

  /** The full SQL function surface, public so hosts that cannot set
    * `spark.sql.extensions` at build time (e.g. an already-running
    * session) can install it directly into a FunctionRegistry.
    */
  private def gridHashBuilder(d: Boolean): Seq[Expression] => Expression = {
    children =>
      require(children.size == 1,
        s"image_grid_${if (d) "d" else "a"}hash takes exactly 1 argument")
      ImageGridHash(children.head, dhash = d)
  }

  val registrations: Seq[Registration] = Seq(
    (FunctionIdentifier("dot_product"), DotProduct.info, DotProduct.builder),
    (FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      shingleBuilder),
    (FunctionIdentifier("image_grid_dhash"),
      new ExpressionInfo(classOf[ImageGridHash].getName, "image_grid_dhash"),
      gridHashBuilder(d = true)),
    (FunctionIdentifier("image_grid_ahash"),
      new ExpressionInfo(classOf[ImageGridHash].getName, "image_grid_ahash"),
      gridHashBuilder(d = false))) ++ Seq[(String, Column => Column)](
    "parse_sales_volume" -> CleanFns.parseSalesVolume,
    "parse_discount_rate" -> CleanFns.parseDiscountRate,
    "clean_price" -> CleanFns.cleanPrice,
    "extract_category_id" -> CleanFns.extractCategoryId,
    "extract_url_key" -> CleanFns.extractUrlKey,
    "parse_snapshot_date" -> CleanFns.toSnapshotDate,
    "category_leaf" -> CleanFns.categoryLeaf,
    "category_root" -> CleanFns.categoryRoot,
    "category_depth" -> CleanFns.categoryDepth,
    "language_id" -> TextFns.languageId,
    "quality_score" -> TextFns.qualityScore,
    "token_count_ws" -> TextFns.tokenCountWs,
    "token_count_bpe" -> TextFns.tokenCountBpe,
    "normalize_text" -> TextFns.normalizeText,
    "doc_fingerprint" -> TextFns.fingerprint,
    "redact_text" -> TextFns.redact
  ).map { case (name, fn) => col1(name, fn) }
}
