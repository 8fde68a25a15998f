package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.plans.{PqCodebook, PqEncode}

/** Product-quantization ANN: the COMPRESSED-DOMAIN path beside LSH (q25),
  * IVF (q33) and the NSW graph (q100) — for corpora where the embedding
  * BYTES are the bottleneck. Each 64-float vector (256 B) encodes to one
  * packed int (4 B): 8 subspaces × 16 codewords, nearest-codeword per
  * subspace. Search scores candidates against a per-query LOOKUP TABLE
  * (asymmetric distance computation): subs·k·subDim multiplies ONCE per
  * query to build the table, then 8 table lookups per candidate — the
  * scan never touches a float vector until the exact re-rank of the
  * top-`rerank` survivors.
  *
  * Deterministic training, two paths sharing one encode/ADC/re-rank
  * contract: [[search]] takes the first-k vector ids' sub-vectors as
  * codewords (the zero-cost convention), [[searchTrained]] refines them
  * per subspace with [[KMeansExact]]'s exact-integer Lloyd iterations. In
  * both, the q102 DuckDB oracle rebuilds codebook (training iterations
  * included), assignments, ADC scores and the final ranking bit-for-bit
  * (all distance sums written in explicit dim order).
  *
  * Scale shape: encoding is one codegen'd corpus pass ([[PqEncode]],
  * broadcast codebook); the scored scan carries (vid, codes=4 B) — the
  * 98%-smaller frame is the point — with the per-query top-`rerank` cut
  * through [[graft.operators.TopK]]'s k-bounded partial aggregation (no
  * corpus-wide sort); only ≤ rerank rows per query rejoin the float
  * vectors for the exact re-rank.
  */
object PqAnn {
  /** Subspace count (4 bits each in the packed int). */
  val Subs = 8
  /** Codewords per subspace (first-K ids; ≤16 to fit 4 bits). */
  val K = 16

  private def projected(vectors: DataFrame, idCol: String, vecCol: String) =
    vectors.select(col(idCol).cast("long").as("vid"), col(vecCol).as("vec"),
      VectorFns.norm(col(vecCol)).as("nrm"))

  // nulls rejected loudly: an L2 distance to a codeword has no
  // skip-consistent null semantics (zero-filling would diverge from the
  // oracle's NULL propagation) — PQ requires dense vectors
  private def elemsOf(r: Row, i: Int): IndexedSeq[Double] =
    VectorFns.collectElems(r, i, nullAsZero = false)

  /** Approximate top-k per query, same output shape as [[CosineTopK]]:
    * (query_id, neighbor_id, cosine, rank) — cosines are EXACT (computed
    * in the re-rank); the approximation is which `rerank` candidates
    * survive the compressed-domain cut.
    */
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             queryPred: Column => Column, k: Int, rerank: Int): DataFrame = {
    val v = graft.operators.OpCache.cache(projected(vectors, idCol, vecCol))

    // deterministic codebook: first-K ids' sub-vectors, driver-side
    // (bounded: K rows)
    val cbRows = v.filter(col("vid") < K).select(col("vid"), col("vec"))
      .collect().sortBy(_.getLong(0))
    require(cbRows.nonEmpty, "PQ needs at least one codebook vector (vid < K)")
    val dim = cbRows.head.getSeq[Any](1).length
    require(dim % Subs == 0, s"dim $dim must divide into $Subs subspaces")
    val subDim = dim / Subs
    val kEff = cbRows.length
    val codewords = new Array[Double](Subs * kEff * subDim)
    cbRows.zipWithIndex.foreach { case (r, c) =>
      val e = elemsOf(r, 1)
      var s = 0
      while (s < Subs) {
        var d = 0
        while (d < subDim) {
          codewords(((s * kEff) + c) * subDim + d) = e(s * subDim + d)
          d += 1
        }
        s += 1
      }
    }
    searchWith(v, codewords, kEff, subDim, dim, queryPred, k, rerank)
  }

  /** [[search]] with TRAINED codewords: per subspace, `trainIters` exact
    * Lloyd iterations ([[KMeansExact]]) over the quantized sub-vectors
    * replace the first-K convention — the codeword set tracks the actual
    * sub-vector distribution instead of whatever the first 16 ids happened
    * to contain, which is what PQ's recall@rerank lives on. Quantization
    * happens ONCE on the full vector; subspace slices commute with the
    * elementwise floor. Dequantized codewords are exact multiples of 2^-20
    * (power-of-two divide), so encode/ADC run in plain double arithmetic
    * that the q102 oracle replays bitwise, training included.
    */
  def searchTrained(vectors: DataFrame, idCol: String, vecCol: String,
                    queryPred: Column => Column, k: Int, rerank: Int,
                    trainIters: Int, dims: Int): DataFrame = {
    require(dims % Subs == 0, s"dims $dims must divide into $Subs subspaces")
    val subDim = dims / Subs
    val v = graft.operators.OpCache.cache(projected(vectors, idCol, vecCol))
    val qz = graft.operators.OpCache.cache(
      KMeansExact.quantized(v, "vid", "vec", dims))
    // one small train job per subspace over the shared cached quantized
    // corpus (k·subDim-bounded driver state each); K=16 codewords fit the
    // 4-bit packing by construction
    val perSub = (0 until Subs).map { s =>
      KMeansExact.train(
        qz.select(col("vid"),
          slice(col("qvec"), s * subDim + 1, subDim).as("qvec")),
        K, trainIters, subDim)
    }
    val kEff = perSub.head.length
    require(perSub.forall(_.length == kEff), "subspace codebook sizes diverge")
    val codewords = new Array[Double](Subs * kEff * subDim)
    var s = 0
    while (s < Subs) {
      var c = 0
      while (c < kEff) {
        val (w, _) = KMeansExact.dequantize(perSub(s)(c))
        var d = 0
        while (d < subDim) {
          codewords(((s * kEff) + c) * subDim + d) = w(d)
          d += 1
        }
        c += 1
      }
      s += 1
    }
    searchWith(v, codewords, kEff, subDim, dims, queryPred, k, rerank)
  }

  private def searchWith(v: DataFrame, codewords: Array[Double], kEff: Int,
                         subDim: Int, dim: Int, queryPred: Column => Column,
                         k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val spark = v.sparkSession
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cb = spark.sparkContext.broadcast(
      PqCodebook(codewords, Subs, kEff, subDim))

    val codes = v.withColumn("codes", ColumnBridge.column(
      PqEncode(ColumnBridge.expression(col("vec")), cb)))

    // per-query ADC lookup tables, driver-side (bounded: |Q|·Subs·kEff
    // doubles); entry (s,c) = Σ_d (q_d − cw_d)² in dim order — the same
    // accumulation the encoder and the oracle use
    val qRows = v.filter(queryPred(col("vid"))).select(col("vid"), col("vec"))
      .collect().sortBy(_.getLong(0))
    val lutRows = qRows.map { r =>
      val q = elemsOf(r, 1)
      require(q.length == dim, s"query dim ${q.length} != corpus dim $dim")
      val lut = new Array[Double](Subs * kEff)
      var s = 0
      while (s < Subs) {
        var c = 0
        while (c < kEff) {
          var dist = 0.0d
          var d = 0
          while (d < subDim) {
            val diff = q(s * subDim + d) -
              codewords(((s * kEff) + c) * subDim + d)
            dist += diff * diff
            d += 1
          }
          lut(s * kEff + c) = dist
          c += 1
        }
        s += 1
      }
      Row(r.getLong(0), lut.toSeq)
    }
    val lutDf = spark.createDataFrame(
      spark.sparkContext.parallelize(lutRows.toSeq, 1),
      StructType(Seq(StructField("query_id", LongType, nullable = false),
        StructField("lut", ArrayType(DoubleType, containsNull = false)))))

    // compressed-domain scan: 8 table lookups per (query, candidate);
    // left-associated + chain in subspace order = the oracle's explicit sum
    val adc = (0 until Subs).map { s =>
      val code = shiftright(col("codes"), 4 * s).bitwiseAND(lit(15))
      element_at(col("lut"), code + lit(s * kEff + 1))
    }.reduce(_ + _)
    val scored = codes.select(col("vid"), col("codes"))
      .join(broadcast(lutDf), col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid"), adc.as("adc"))
      // TopK ranks desc; -adc desc = adc asc. NaN adc (a NaN element that
      // slipped past the dense-vector guards) maps to +Inf first: negated
      // NaN would sort FIRST under Spark's NaN-largest desc while the
      // oracle's `adc ASC` sorts NaN last — worst-candidate, not best.
      // (Residual: a cut boundary straddling genuine +Inf and NaN rows
      // can still order differently — both are sentinel garbage.)
      .withColumn("neg_adc", negate(
        when(isnan(col("adc")), lit(Double.PositiveInfinity))
          .otherwise(col("adc"))))
    val cand = graft.operators.TopK.perGroup(scored, Seq("query_id"),
        sortCol = "neg_adc", idCol = "vid", k = rerank)
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
