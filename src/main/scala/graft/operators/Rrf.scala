package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) — the
  * standard way a hybrid retrieval stack combines a sparse (BM25, q132)
  * and a dense (embedding-cosine, q24/q25/q33) ranked list without score
  * calibration: `score(d) = Σ_legs 1/(k0 + rank_leg(d))`, missing legs
  * contributing exactly 0. Completes the retrieval surface the inverted
  * index (#96), TF-IDF (#67) and BM25 (#96b) built up: a RAG /
  * training-data pipeline retrieves with BOTH lexical and semantic legs
  * and fuses on rank, precisely because ranks are comparable where raw
  * BM25 and cosine scores are not.
  *
  * Determinism: each contribution is one IEEE division
  * `1.0 / (k0 + rank)` of exact small integers — bit-replayable on any
  * engine — and the across-legs sum is an EXPLICIT left-to-right addition
  * in caller-given leg order (legs are few and literal), never a float
  * SUM aggregate over a shuffle. Final order is (rrf DESC, doc_id ASC),
  * fully tie-broken.
  *
  * Scale shape: each leg is already a top-k list (≤ k rows per query — the
  * legs' own operators bound them: Bm25's window cut, CosineTopK's
  * k-bounded partial agg), so the fusion join touches O(|queries| · k)
  * rows total regardless of corpus size; the full-outer join keys on
  * (query_id, doc_id) and the final window sorts ≤ Σ k_leg rows per
  * query. The corpus-sized work lives entirely inside the legs, where
  * each operator's own scale path (posting pruning, LSH/IVF) applies.
  */
object Rrf {

  /** The fusion constant from the original RRF paper; large enough that
    * a rank-1 hit in one leg cannot be buried by mid-list noise in
    * another.
    */
  val K0 = 60

  /** Fuse named ranked legs. Each leg must have columns
    * (query_id, doc_id, rank); leg names must be distinct identifiers
    * (they name internal rank columns). Returns
    * (query_id, doc_id, n_legs, rrf, rank ≤ topK).
    */
  def fuse(legs: Seq[(String, DataFrame)], topK: Int, k0: Int = K0): DataFrame = {
    require(legs.nonEmpty, "need at least one leg")
    require(legs.map(_._1).distinct.size == legs.size, "leg names must be distinct")
    require(legs.forall(_._1.matches("[a-z][a-z0-9_]*")),
      "leg names become internal column names: [a-z][a-z0-9_]* only")
    require(topK > 0 && k0 > 0, "topK and k0 must be positive")
    val renamed = legs.map { case (name, df) =>
      df.select(col("query_id"), col("doc_id"),
        col("rank").as(s"__r_$name"))
    }
    val joined = renamed.reduce((a, b) =>
      a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    val matched = legs.map { case (name, _) =>
      when(col(s"__r_$name").isNotNull, 1).otherwise(0)
    }.reduceLeft[Column](_ + _)
    // explicit left-assoc addition in leg order: float + is order-sensitive
    val score = legs.map { case (name, _) =>
      coalesce(lit(1.0d) /
        (lit(k0.toDouble) + col(s"__r_$name").cast("double")), lit(0.0d))
    }.reduceLeft[Column](_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    joined
      .withColumn("n_legs", matched.cast("int"))
      .withColumn("rrf", score)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "n_legs", "rrf", "rank")
  }
}
