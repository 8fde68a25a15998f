package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Broadcast-vs-shuffle AUTO-ROUTING for the curation operators' count
  * tables ([[NgramLm]]'s unigram/bigram counts, [[NbClassifier]]'s class
  * count table): the production default is broadcast — the tables are
  * CURATED-TARGET-sized (CCNet's target is Wikipedia) next to the corpus
  * being scored — but an unusually wide target vocabulary can outgrow
  * executor memory, and until round 18 the fallback was a manual
  * `broadcastCounts = false` knob someone has to know to turn.
  *
  * This derives the default from numbers the operators ALREADY compute
  * (both pay one bounded agg over the count frame for their scaling
  * requires — vocabulary size, token total), sized against the session's
  * own `spark.sql.autoBroadcastJoinThreshold`: the same dial that governs
  * every other broadcast decision in the plan, so one config change moves
  * the whole query consistently. The explicit knob survives as an
  * override (`Some(true)`/`Some(false)`); `None` takes the estimate.
  *
  * The row-size constant is deliberately conservative (a count-table row
  * is a short token string or two plus a long; 64 bytes covers the
  * UnsafeRow + hash-relation overhead) — at the default 10 MB threshold
  * the cutover lands near 160k count rows, far under executor memory
  * either way. Routing never affects VALUES: both paths compute identical
  * joins; only the exchange strategy moves.
  */
object JoinRouting {

  /** Estimated in-memory bytes per count-table row (token string(s) +
    * long count + UnsafeRow/hash-relation overhead).
    */
  val BytesPerCountRow = 64L

  /** Broadcast iff `estRows` count-table rows fit the session's
    * autoBroadcastJoinThreshold; a disabled threshold (≤ 0) routes to
    * shuffle — the user turned broadcasts off globally.
    */
  def autoByRows(spark: SparkSession, estRows: Long): Boolean = {
    val bytes = parseThreshold(
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    bytes > 0 && estRows <= bytes / BytesPerCountRow
  }

  /** Threshold string → bytes. "-1" (the documented disable value) has
    * no byte suffix and fails byteStringAsBytes' parser — bare integers
    * (incl. negatives) are handled directly, suffixed forms ("10MB") via
    * the Spark util. LOUD on anything unparseable: `spark.conf.set`
    * validates this key itself, but a value arriving through an
    * unvalidated channel (SparkConf at submit time, a copied-in
    * properties file) must surface as the misconfiguration it is —
    * silently routing joins from a substituted 10 MB default would hide
    * it behind a plan-shape change nobody asked for.
    */
  private[graft] def parseThreshold(raw: String): Long = {
    val t = raw.trim
    try {
      if (t.matches("-?[0-9]+")) t.toLong
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(t)
    } catch {
      case e: Exception => throw new IllegalArgumentException(
        s"unparseable spark.sql.autoBroadcastJoinThreshold '$raw' — " +
          "fix the conf (e.g. '10MB' or '-1'); graft does not " +
          "substitute a default for a malformed value", e)
    }
  }

  /** The routed exchange: broadcast hint or identity (shuffle join). */
  def route(spark: SparkSession, knob: Option[Boolean],
            estRows: Long): DataFrame => DataFrame =
    if (knob.getOrElse(autoByRows(spark, estRows))) broadcast else identity
}
