package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._

import graft.operators.similarity.VectorFns
import graft.plans.DotProduct

class DotProductSpec extends SparkSpec {

  test("native DotProduct is bitwise identical to the HOF fold on real embeddings") {
    val v = Tables.embeddings(spark, sf("0.001"))
    val both = v.select(
      VectorFns.dot(col("embedding"), col("embedding")).as("native"),
      VectorFns.dotFold(col("embedding"), col("embedding")).as("fold"))
    val mismatches = both.filter(col("native") =!= col("fold")).count()
    assert(mismatches == 0)
  }

  test("DotProduct participates in whole-stage codegen") {
    val v = Tables.embeddings(spark, sf("0.001"))
    val plan = v.select(VectorFns.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // whole-stage codegen shows as "WholeStageCodegen" in tree form or a
    // "*(n)" stage prefix in compact form
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen span in:\n$plan")
  }

  test("dot_product is SQL-callable once registered (GraftExtensions builder)") {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"), DotProduct.info, DotProduct.builder)
    Tables.embeddings(spark, sf("0.001")).createOrReplaceTempView("emb")
    val row = spark.sql(
      """SELECT vec_id, dot_product(embedding, embedding) AS d
        |FROM emb ORDER BY vec_id LIMIT 1""".stripMargin).head()
    assert(row.getDouble(1) > 0.0)
  }

  test("GraftExtensions registers the whole function surface for plain SQL") {
    import graft.plans.GraftExtensions
    GraftExtensions.registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Tables.documents(spark, sf("0.001")).createOrReplaceTempView("docs_sql")
    // each SQL name must produce EXACTLY the DataFrame twin's result
    val sql = spark.sql(
      """SELECT doc_id, language_id(text) AS lang_id, token_count_ws(text) AS n_tok,
        |  doc_fingerprint(text) AS fp, size(shingle_hash(text)) AS n_shingles
        |FROM docs_sql WHERE text IS NOT NULL""".stripMargin)
    val df = Tables.documents(spark, sf("0.001")).filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextFns.languageId(col("text")).as("lang_id"),
        graft.functions.TextFns.tokenCountWs(col("text")).as("n_tok"),
        graft.functions.TextFns.fingerprint(col("text")).as("fp"),
        size(graft.operators.dedup.TextShingles.shingleHashes(col("text"))).as("n_shingles"))
    assert(sql.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    // the parser family resolves and evaluates from SQL too
    val p = spark.sql(
      "SELECT parse_sales_volume('Đã bán 1.5k') AS v, clean_price('1.234.567 ₫') AS p").head()
    assert(p.getLong(0) == 1500L)
  }

  test("null arrays yield null; mismatched lengths fail loudly") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))) // null array -> null
    ).toDF("a", "b")
    val out = df.select(VectorFns.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    // a silently truncated sum would be a plausible-but-wrong similarity
    val bad = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f, 9.0f))).toDF("a", "b")
    val e = intercept[Throwable] {
      bad.select(VectorFns.dot(col("a"), col("b")).as("d")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("length mismatch")), e.toString)
  }
}
