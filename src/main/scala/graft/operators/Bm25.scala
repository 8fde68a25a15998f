package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** BM25 ranking over the corpus's term statistics — the third leg of the
  * retrieval triad the TF-IDF head terms (#67/q54) and inverted-index
  * postings (#96/q84) already carry: score a FIXED literal query set
  * against every document and keep the top-k per query (Robertson &
  * Zaragoza 2009's Okapi weighting, the scorer a training-data/RAG
  * pipeline actually ranks with).
  *
  * Scoring variant — RATIONAL idf: `(N − df + 0.5) / (df + 0.5)`, the
  * INNER argument of Robertson's log, kept unwrapped exactly like q54's
  * ln-free `tf·N/df`: ln() is libm-dependent and breaks bitwise
  * cross-engine agreement, while this variant is a composition of exact
  * integer counts and IEEE divisions any engine replays bit-for-bit. The
  * transform is strictly monotone in df, so per-term orderings are the
  * classic ones (absolute score magnitudes differ — a documented engine
  * convention, not an approximation).
  *
  * Per-term contribution, evaluation order PINNED (the oracle mirrors
  * each parenthesis):
  * {{{
  *   idf   = (toDouble(N − df) + 0.5) / (toDouble(df) + 0.5)
  *   ratio = toDouble(dl) / avgdl
  *   denom = toDouble(tf) + k1 · ((1 − b) + b · ratio)
  *   c     = idf · ((toDouble(tf) · (k1 + 1)) / denom)
  * }}}
  * and the across-terms sum is an EXPLICIT left-to-right addition in the
  * caller-given term order (queries are literal and small), not a float
  * SUM aggregate — float addition is order-sensitive, and a shuffle-order
  * aggregate would not be deterministic, let alone replayable.
  *
  * Scale shape: tf is one (doc, term) partial-agg shuffle and df one
  * term-keyed shuffle over the tf frame (both the q54 shapes); the query
  * term set prunes tf BEFORE the per-query pivot (a term IN (...) filter
  * — at 100 TB this is the posting-list read, term-bucket-prunable like
  * every #96 consumer); the per-query score is a conditional-aggregate
  * pivot over ≤ |terms| matched rows per doc, and the final top-k is
  * [[TopK.perGroup]]'s partial aggregation — ≤ k rows per (query,
  * mapper) cross the shuffle, so a stopword-grade high-df term never
  * concentrates a corpus-sized sort on one reducer. No corpus-quadratic
  * step, no unbounded driver state.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** (query_id, doc_id, n_terms_matched, score, rank ≤ topK) for each
    * literal query; docs matching no term of a query are absent (their
    * score is identically 0).
    */
  def rank(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(Int, Seq[String])], topK: Int,
           k1: Double = K1, b: Double = B): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "need at least one query with at least one term")
    require(queries.forall(q => q._2.distinct == q._2),
      "duplicate terms within a query: each term becomes one __c_<term> " +
        "agg slot, so a repeat makes the post-agg column reference ambiguous")
    require(queries.flatMap(_._2).forall(_.matches("[a-z0-9]+")),
      "terms must match [a-z0-9]+: they name agg slot columns and are " +
        "interpolated into the oracle SQL as literals")
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol),
        split(TextFns.normalizeText(col(textCol)), " ").as("__w"))
      .filter(size(col("__w")) > 0 && length(element_at(col("__w"), 1)) > 0)
      .select(col(idCol), col("__w"), size(col("__w")).cast("long").as("__dl"))
    val terms = base.select(col(idCol), col("__dl"),
        explode(col("__w")).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"), first(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val stats = base.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") /
        count(lit(1)).cast("double")).as("__avgdl"))
    val allTerms = queries.flatMap(_._2).distinct
    val contrib = tf
      .filter(col("term").isin(allTerms: _*))
      .join(dfreq, Seq("term"))
      .join(broadcast(stats), lit(true))
      .withColumn("__c", {
        val idf = ((col("__n") - col("__df")).cast("double") + lit(0.5)) /
          (col("__df").cast("double") + lit(0.5))
        val ratio = col("__dl").cast("double") / col("__avgdl")
        val denom = col("__tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * ratio)
        idf * ((col("__tf").cast("double") * lit(k1 + 1.0)) / denom)
      })
    val perQuery = queries.map { case (qid, ts) =>
      val slots: Seq[Column] = ts.map(t =>
        max(when(col("term") === t, col("__c"))).as(s"__c_$t"))
      val matched = ts.map(t =>
        when(col(s"__c_$t").isNotNull, 1).otherwise(0))
        .reduceLeft[Column](_ + _)
      val score = ts.map(t => coalesce(col(s"__c_$t"), lit(0.0d)))
        .reduceLeft[Column](_ + _) // explicit left-assoc, term order
      contrib.filter(col("term").isin(ts: _*))
        .groupBy(col(idCol))
        .agg(slots.head, slots.tail: _*)
        .select(lit(qid).as("query_id"), col(idCol),
          matched.cast("int").as("n_terms_matched"), score.as("score"))
    }
    val scored = perQuery.reduce(_ unionByName _)
    // NOT a per-query window: partitionBy(query_id) puts every doc matching
    // >= 1 term of a query into ONE reducer and sorts it — for a high-df
    // term that is a corpus-sized single-partition sort per query. TopK's
    // partial aggregation keeps a k-sized buffer per group on the map side
    // instead, so the shuffle carries <= k rows per (query, mapper); the
    // ordering contract (score desc, id asc) matches the window formulation
    // exactly (TopKSpec asserts it, Bm25Spec asserts no WindowExec remains).
    TopK.perGroup(scored, Seq("query_id"), "score", idCol, topK)
  }
}
