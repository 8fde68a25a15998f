package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.similarity.{CosineTopK, SqAnn}

class SqAnnSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf("0.001"))

  test("SQ8 codes are bounded int8 and the 8-per-long packing round-trips") {
    val enc = SqAnn.encoded(vecs, "vec_id", "embedding", 64)
    // bounds: symmetric maxabs quantization can never leave [-127, 127]
    val outOfRange = enc.select(explode(col("codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count()
    assert(outOfRange == 0L)
    // pack/unpack identity, re-derived INDEPENDENTLY of SqAnn's internals:
    // big-endian byte p of long j, sign-extended via the 255-mask trick
    def unpack(j: Int, p: Int) = {
      val b = shiftright(element_at(col("packed"), j + 1), (8 - 1 - p) * 8)
        .bitwiseAND(lit(255L))
      b - when(b > 127L, lit(256L)).otherwise(lit(0L))
    }
    val unpacked = array((0 until 8).flatMap(j => (0 until 8).map(p =>
      unpack(j, p).cast("int"))): _*)
    val mismatches = enc.filter(not(col("codes") === unpacked)).count()
    assert(mismatches == 0L, "packed longs must encode exactly the int8 codes")
  }

  test("SQ8 recall@10 vs brute force is usable at rerank=50") {
    val exact = CosineTopK.search(vecs, "vec_id", "embedding", _ < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = SqAnn.search(vecs, "vec_id", "embedding", _ < 10,
        k = 10, rerank = 50, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sq.size == 100, s"expected 10 queries x 10 neighbors, got ${sq.size}")
    val recall = exact.intersect(sq).size.toDouble / exact.size
    info(s"SQ8 recall@10 = $recall")
    // int8 keeps far more signal than PQ's 4 bits/dim — expect near-exact
    assert(recall >= 0.9, s"SQ8 recall regressed: $recall")
    // determinism across fresh plans
    val again = SqAnn.search(vecs, "vec_id", "embedding", _ < 10,
        k = 10, rerank = 50, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == sq)
  }

  test("exhaustive rerank reproduces brute force exactly (cut is the only approximation)") {
    val n = vecs.count().toInt
    val exact = CosineTopK.search(vecs, "vec_id", "embedding", _ < 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val sq = SqAnn.search(vecs, "vec_id", "embedding", _ < 3,
        k = 5, rerank = n, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(sq == exact,
      "with every candidate surviving the cut, the exact re-rank must equal brute force")
  }

  test("all-zero vectors encode to zero codes and never surface as candidates") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq.fill(8)(0.0f)),                       // zero query
      Row(1L, Seq(1f, 2f, 3f, 4f, -1f, -2f, -3f, -4f)),
      Row(2L, Seq(1f, 2f, 3f, 4f, -1f, -2f, -3f, -4f)),
      Row(3L, Seq.fill(8)(0.0f)))                       // zero corpus vector
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r.get(0), r.getSeq[Float](1))), 2), schema)
    val enc = SqAnn.encoded(df, "vec_id", "embedding", 8)
    val zeroCodes = enc.filter(col("vid").isin(0L, 3L))
      .select(explode(col("codes")).as("c")).filter(col("c") =!= 0).count()
    assert(zeroCodes == 0L)
    val out = SqAnn.search(df, "vec_id", "embedding", _ <= 1,
        k = 2, rerank = 3, dims = 8).collect()
    // query 0 has no defined cosine → no rows; query 1 must not see vec 3
    assert(out.forall(_.getLong(0) == 1L))
    assert(out.forall(_.getLong(1) != 3L))
    assert(out.map(_.getLong(1)).toSet == Set(2L))
  }
}
