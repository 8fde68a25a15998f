package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 SCALAR quantization ANN (the FAISS `SQ8` shape) — the fifth ANN
  * path beside LSH (q25), IVF (q33), the NSW graph (q100) and PQ (q102):
  * where PQ compresses to 4 bits/dim through a trained codebook, SQ8
  * keeps one signed byte PER DIMENSION — 4× smaller than float32 with no
  * training pass at all, and the compressed-domain score is a plain
  * integer dot product instead of PQ's per-query lookup table.
  *
  * Quantization is per-vector symmetric maxabs: `code_i =
  * floor(x_i·127/maxabs + 0.5)` with `maxabs = max_i |x_i|` — every code
  * lands in [-127, 127], and because the per-vector scale factor is
  * uniform and positive, `Σ qcode_i·dcode_i / (‖qcode‖·‖dcode‖)` is the
  * cosine of the quantized vectors: the candidate cut ranks by it and
  * only the top-`rerank` survivors pay the exact float cosine (the same
  * approximate-cut / exact-re-rank contract as [[PqAnn]]).
  *
  * Exact-arithmetic discipline: codes are one IEEE multiply, divide and
  * floor each (bit-replayable); the dot product and both squared norms
  * are INTEGER sums — partition/fold-order independent by construction,
  * where a float compressed score would be shuffle-order sensitive. The
  * quantized cosine is then two casts of exact ints (both ≤ 2^53, so the
  * doubles are exact), one multiply (≤ 1.1e12 — still exact), one
  * correctly-rounded sqrt and one division — bitwise reproducible on any
  * IEEE engine, which is what lets the q139 oracle replay every score.
  *
  * Storage shape: codes PACK 8-per-long big-endian (leading byte signed,
  * the 7 that follow biased via `& 255`, so the long stays in range) —
  * the persisted corpus frame carries (vid, 8 longs, n2) ≈ 80 B/vector
  * against 256 B of float32; the scored scan reads ONLY the packed
  * representation (codes are unpacked arithmetically inside the score
  * expression — shift, mask, sign-extend), proving the compressed frame
  * is self-sufficient. Scale shape: encoding is one whole-stage-codegen
  * projection over the corpus; the scan is a broadcast of the (bounded)
  * query set against the packed frame with the per-query top-`rerank`
  * cut through [[graft.operators.TopK]]'s k-bounded partial aggregation
  * — no corpus-wide sort, no shuffle of the corpus itself; only
  * ≤ `rerank` rows per query rejoin the float vectors.
  */
object SqAnn {

  /** Codes per packed long. */
  val PerLong = 8

  /** code_i as a Column: floor(x_i·127/maxabs + 0.5) — evaluation order
    * pinned (multiply, then divide, then +0.5, then floor) so the oracle
    * replays the doubles bitwise. maxabs = 0 (the all-zero vector) maps
    * every code to 0; such rows are excluded from the candidate scan
    * (cosine undefined) but kept in the encoded frame.
    */
  private def codesCol(vec: Column): Column = {
    val maxabs = aggregate(vec, lit(0.0d),
      (a, x) => greatest(a, abs(x.cast("double"))))
    when(maxabs > 0.0d,
      transform(vec, x =>
        floor(x.cast("double") * lit(127.0d) / maxabs + lit(0.5d)).cast("int")))
      .otherwise(transform(vec, _ => lit(0)))
  }

  /** The encoded corpus frame: (vid, codes, packed, n2). `codes` is the
    * unpacked int array (what a caller collects for the query side);
    * `packed` is the 8-per-long big-endian packing a persisted index
    * stores; `n2` = Σ code² (long, exact). Pure projection — column
    * pruning drops `codes`/`vec` wherever only the packed frame is read.
    */
  def encoded(vectors: DataFrame, idCol: String, vecCol: String,
              dims: Int): DataFrame = {
    require(dims % PerLong == 0, s"dims $dims must pack into $PerLong-byte longs")
    val v = vectors.select(col(idCol).cast("long").as("vid"),
      col(vecCol).as("vec"))
    val withCodes = v.withColumn("codes", codesCol(col("vec")))
    // big-endian: leading byte rides signed (|acc| ≤ 127 then ×256^7 +
    // 7 biased bytes < 2^63 — no long overflow), the rest bias via & 255
    val packs = (0 until dims / PerLong).map { j =>
      (1 until PerLong).foldLeft(
        element_at(col("codes"), j * PerLong + 1).cast("long")) { (acc, p) =>
        acc * lit(256L) +
          element_at(col("codes"), j * PerLong + p + 1).cast("long")
            .bitwiseAND(lit(255L))
      }
    }
    val n2 = aggregate(col("codes"), lit(0L),
      (a, c) => a + (c * c).cast("long"))
    withCodes
      .withColumn("packed", array(packs: _*))
      .withColumn("n2", n2)
  }

  /** Sign-extended code at position `p` (0-based) of packed long `j`
    * (0-based), from the packed array column — shift, mask, sign-extend;
    * the `& 255` makes the leading byte's arithmetic-vs-logical shift
    * distinction irrelevant.
    */
  private def unpackAt(packed: Column, j: Int, p: Int): Column = {
    val b = shiftright(element_at(packed, j + 1), (PerLong - 1 - p) * 8)
      .bitwiseAND(lit(255L))
    b - when(b > 127L, lit(256L)).otherwise(lit(0L))
  }

  /** Approximate top-k per query, same output contract as [[CosineTopK]]
    * / [[PqAnn]]: (query_id, neighbor_id, cosine, rank) with EXACT
    * cosines — the approximation is which `rerank` candidates survive the
    * int8 cut.
    */
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             queryPred: Column => Column, k: Int, rerank: Int,
             dims: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val v = graft.operators.OpCache.cache(
      vectors.select(col(idCol).cast("long").as("vid"), col(vecCol).as("vec"),
        VectorFns.norm(col(vecCol)).as("nrm")))
    val enc = graft.operators.OpCache.cache(
      encoded(v, "vid", "vec", dims).select("vid", "packed", "n2"))

    // query codes ride a bounded broadcast frame (the PqAnn lutDf shape):
    // (query_id, qcodes, qn2) — quantized through the SAME projection
    val qEnc = encoded(v.filter(queryPred(col("vid"))), "vid", "vec", dims)
      .select(col("vid").as("query_id"), col("codes").as("qcodes"),
        col("n2").as("qn2"))

    // integer dot product, unpacked arithmetically from the packed frame:
    // 64 exact-int terms — order-independent, so a plain sum is safe
    val dot = (0 until dims / PerLong).flatMap { j =>
      (0 until PerLong).map { p =>
        element_at(col("qcodes"), j * PerLong + p + 1).cast("long") *
          unpackAt(col("packed"), j, p)
      }
    }.reduce(_ + _)
    // quantized cosine: every operand an exact small int in a double —
    // one multiply, one sqrt, one division, all correctly rounded
    val qcos = dot.cast("double") /
      sqrt(col("n2").cast("double") * col("qn2").cast("double"))

    val scored = enc
      .filter(col("n2") > 0L) // all-zero vectors: cosine undefined
      .join(broadcast(qEnc),
        col("vid") =!= col("query_id") && col("qn2") > 0L)
      .select(col("query_id"), col("vid"), qcos.as("qcos"))
    val cand = graft.operators.TopK.perGroup(scored, Seq("query_id"),
        sortCol = "qcos", idCol = "vid", k = rerank)
      .select(col("query_id"), col("vid"))

    // exact re-rank: only ≤ rerank rows per query rejoin the float vectors
    val queries = v.filter(queryPred(col("vid")))
      .select(col("vid").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.join(v, Seq("vid"))
      .join(queries, Seq("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        VectorFns.cosine(VectorFns.dot(col("qvec"), col("vec")),
          col("qnrm"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
