package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-grain near-duplicate pairs: Levenshtein edit distance, the
  * metric that catches single-character edits, transpositions and small
  * insertions that token-level n-gram Jaccard ([[NGramJaccard]]) blurs.
  *
  * Edit distance is O(|a|·|b|) per pair, so the unblocked self-join is
  * doubly ruinous at scale (n² pairs × quadratic per pair). Candidates
  * therefore come from [[MinHashLSH.candidatePairs]] — the same banded,
  * bucket-capped blocking the rest of the dedup family rides — and the
  * exact DP runs ONLY on that near-dup-mass-bounded pair set, on narrow
  * (id, text) frames. This is blocked-verify with a different verifier:
  * MinHash proposes, Levenshtein disposes.
  */
object EditDistance {

  /** Pairs (doc_a < doc_b) within `maxDist` edits on the lowercased text.
    * Null-text docs can't be candidates (LSH drops them) and lowercase
    * matches the dedup family's normalization grain.
    */
  def nearPairs(df: DataFrame, idCol: String, textCol: String,
                maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val cand = MinHashLSH.candidatePairs(df, idCol, textCol)
      .select("doc_a", "doc_b")
    val txt = df.filter(col(textCol).isNotNull)
      .select(col(idCol), lower(col(textCol)).as("__txt"))
    cand
      .join(txt.select(col(idCol).as("doc_a"), col("__txt").as("__ta")), "doc_a")
      .join(txt.select(col(idCol).as("doc_b"), col("__txt").as("__tb")), "doc_b")
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb")).cast("int"))
      .filter(col("edit_dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
  }
}
