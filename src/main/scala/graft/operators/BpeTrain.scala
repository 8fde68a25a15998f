package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Distributed BPE merge training (Sennrich, Haddow & Birch 2016) — the
  * tokenizer-trainer pass of an LLM data pipeline: learn the first
  * `numMerges` byte-pair merges from corpus word frequencies.
  *
  * The classic trainer's distributed shape: ONE corpus-sized pass builds
  * the word-frequency table (normalize → split → count — the q54/q84
  * shuffle), and every merge round after that runs on the DISTINCT-WORD
  * vocabulary only — at 100 TB the vocab is millions of rows where the
  * corpus is trillions, so the loop cost is decoupled from corpus size.
  * Each round = one pair-explode + integer-SUM shuffle over the vocab,
  * one 1-row argmax collect (count DESC, pair ASC — fully tie-broken),
  * and one merge-apply projection; the vocab frame is localCheckpointed
  * per round (consumed twice: pair count + merge apply — the
  * DupClusters lineage rule).
  *
  * Merge application is SYMBOL-EXACT leftmost non-overlapping greedy
  * (the reference trainer's scan): a word is an `array<string>` of
  * symbols ending in the `</w>` marker, and applying pair (l, r) is a
  * single left-to-right `aggregate` fold — merge the incoming symbol
  * into the accumulator's last element iff (last, incoming) = (l, r).
  * Because a just-merged `lr` can never equal `l` (lengths differ), the
  * fold IS the non-overlapping scan — including on runs of a repeated
  * symbol ([a,a,a,a,a] under (a,a) → [aa,aa,a], never the re-merged
  * [aaaa,a]). Bit-replayable: SQL engines fold the same lambda with
  * `list_reduce` over a delimited symbol string.
  *
  * Words are restricted to `wordPattern` (default [a-z0-9]+): symbols
  * then never collide with the `</w>` marker, a SQL literal quote, or a
  * replay delimiter, and per-character splitting is code-point-safe.
  *
  * Returns one row per learned merge: (step, pair, merged, pair_count),
  * step 1-based in learn order. Stops early (fewer rows) if the vocab
  * runs out of adjacent pairs.
  */
object BpeTrain {

  val DefaultWordPattern = "[a-z0-9]+"

  def merges(docs: DataFrame, textCol: String, numMerges: Int,
             wordPattern: String = DefaultWordPattern): DataFrame = {
    require(numMerges >= 1, "need at least one merge step")
    val spark = docs.sparkSession
    val norm = graft.functions.TextFns.normalizeText(col(textCol))
    val vocab = docs
      .filter(col(textCol).isNotNull)
      .select(explode(split(norm, " ")).as("word"))
      .filter(col("word").rlike(s"^$wordPattern$$"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
    var words = vocab
      .select(expr("concat(regexp_extract_all(word, '(.)', 1), array('</w>'))")
        .as("a"), col("f"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val best = words
        .select(explode(expr(
          "CASE WHEN size(a) >= 2 THEN transform(sequence(1, size(a)-1), " +
            "i -> concat(element_at(a, i), ' ', element_at(a, i+1))) " +
            "ELSE array() END")).as("pair"), col("f"))
        .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect().headOption // the 1-row argmax collect
      best match {
        case Some(r) =>
          val pair = r.getString(0)
          learned += ((step, pair, r.getLong(1)))
          val Array(l, rt) = pair.split(" ", 2)
          val merged = l + rt
          words = words
            .select(expr(
              s"aggregate(a, cast(array() as array<string>), (acc, x) -> " +
                s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$l' " +
                s"AND x = '$rt' " +
                s"THEN concat(slice(acc, 1, size(acc) - 1), array('$merged')) " +
                s"ELSE concat(acc, array(x)) END)").as("a"), col("f"))
            .localCheckpoint()
          step += 1
        case None => exhausted = true
      }
    }
    val rows = learned.toSeq.map { case (s, pair, cnt) =>
      Row(s, pair, pair.replace(" ", ""), cnt)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }
}
