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
  * DupClusters lineage rule), and the PRIOR round's checkpoint blocks
  * are released once the new round's materialize
  * ([[Checkpoints.releasable]]) — a realistic 30k-merge run must not pin
  * thousands of dead vocab copies.
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

  /** Symbols interpolate into SQL literals (the fold lambda) and join on
    * the `|` replay delimiter — restrict to the charset the trainer can
    * produce from [[DefaultWordPattern]]-shaped words before building
    * either.
    */
  private val SymbolCharset = "[a-z0-9</>]+"

  private def requireSafeSymbol(s: String): Unit =
    require(s.matches(SymbolCharset),
      s"merge symbol '$s' outside the safe charset $SymbolCharset — " +
        "cannot be interpolated into the fold expression")

  /** The symbol-exact leftmost non-overlapping greedy merge of pair
    * (l, r) into `merged`, as a single left-to-right `aggregate` fold
    * over symbol-array column `arrCol` (see the class scaladoc for why
    * the fold IS the non-overlapping scan). Shared by the trainer's
    * per-round apply and [[encodeVocab]]'s replay of a learned list.
    */
  private def foldSql(arrCol: String, l: String, r: String,
                      merged: String): String = {
    Seq(l, r, merged).foreach(requireSafeSymbol)
    s"aggregate($arrCol, cast(array() as array<string>), (acc, x) -> " +
      s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$l' " +
      s"AND x = '$r' " +
      s"THEN concat(slice(acc, 1, size(acc) - 1), array('$merged')) " +
      s"ELSE concat(acc, array(x)) END)"
  }

  /** The distinct-word frequency table — the ONE corpus-sized pass both
    * training and encoding ride (everything after runs at vocab grain).
    */
  private def vocabOf(docs: DataFrame, textCol: String,
                      wordPattern: String): DataFrame = {
    val norm = graft.functions.TextFns.normalizeText(col(textCol))
    docs
      .filter(col(textCol).isNotNull)
      .select(explode(split(norm, " ")).as("word"))
      .filter(col("word").rlike(s"^$wordPattern$$"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
  }

  def merges(docs: DataFrame, textCol: String, numMerges: Int,
             wordPattern: String = DefaultWordPattern): DataFrame = {
    require(numMerges >= 1, "need at least one merge step")
    val spark = docs.sparkSession
    val vocab = vocabOf(docs, textCol, wordPattern)
    var (words, releaseWords) = Checkpoints.releasable(vocab
      .select(expr("concat(regexp_extract_all(word, '(.)', 1), array('</w>'))")
        .as("a"), col("f")))
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
          val (next, releaseNext) = Checkpoints.releasable(words
            .select(expr(foldSql("a", l, rt, merged)).as("a"), col("f")))
          releaseWords() // prior round's blocks, after `next` is live
          words = next
          releaseWords = releaseNext
          step += 1
        case None => exhausted = true
      }
    }
    // the learned list is driver-side; the last vocab frame is dead too
    releaseWords()
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

  /** ENCODING — the other half of the tokenizer story: apply a learned
    * merge list to the corpus and get tokens out. The distributed shape is
    * the same vocab decoupling the trainer rides: tokenization is a pure
    * function of the WORD, so encode the distinct-word table once and the
    * corpus never pays per-occurrence fold cost — at 100 TB the vocab is
    * millions of rows against a corpus of trillions of words, and
    * downstream doc-grain token counts are a (word → n_tokens) join
    * (broadcast while the vocab fits, shuffle join past that) instead of a
    * corpus-sized re-encode.
    *
    * One projection, zero extra shuffles: symbol split + all `merges`
    * folds (in learn order — BPE application order IS the learned order)
    * collapse into a single whole-stage-codegen'd pass over the vocab
    * frame; nothing is checkpointed because, unlike training, no
    * intermediate state is consumed twice.
    *
    * `merges` is the (pair → merged) list exactly as [[merges]] learns it
    * — pass the collected (pair split on the single space) rows; symbols
    * are charset-checked before interpolating into the fold expression.
    *
    * Returns the tokenized vocabulary: (word, f, n_tokens, tokens) with
    * `tokens` the `|`-joined symbol sequence (`</w>` marker included) and
    * `f` the corpus frequency — Σ f·n_tokens over this frame is the
    * corpus token budget, group the join-back by source for the
    * per-source accounting a mixture recipe needs.
    */
  def encodeVocab(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)],
                  wordPattern: String = DefaultWordPattern): DataFrame = {
    require(merges.nonEmpty, "need at least one learned merge")
    var enc = vocabOf(docs, textCol, wordPattern)
      .withColumn("a",
        expr("concat(regexp_extract_all(word, '(.)', 1), array('</w>'))"))
    merges.foreach { case (l, r) =>
      enc = enc.withColumn("a", expr(foldSql("a", l, r, l + r)))
    }
    enc.select(col("word"), col("f"),
      size(col("a")).as("n_tokens"),
      array_join(col("a"), "|").as("tokens"))
  }

  /** Doc-grain token counts under a learned merge list — the join the
    * [[encodeVocab]] scaladoc promises: the corpus explodes to words ONCE
    * (the same normalize/split/filter as the vocab pass, so every emitted
    * word is present in the encoded vocab by construction) and joins the
    * (word → n_tokens) frame, which AQE broadcasts while the vocab fits;
    * the corpus never pays per-occurrence fold cost. One doc-keyed
    * integer-SUM shuffle after the join. Docs with a null `textCol` or no
    * `wordPattern`-shaped words have zero tokens and emit NO row — the
    * packing caller's frame is docs-with-tokens by contract.
    *
    * Returns (idCol, doc_tokens): exact BIGINT per-document token counts
    * — Σ over this frame equals Σ f·n_tokens over [[encodeVocab]]'s
    * output (the corpus token budget; spec-pinned).
    */
  def docTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)],
                     wordPattern: String = DefaultWordPattern): DataFrame = {
    val enc = encodeVocab(docs, textCol, merges, wordPattern)
      .select(col("word"), col("n_tokens"))
    val norm = graft.functions.TextFns.normalizeText(col(textCol))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(norm, " ")).as("word"))
      .filter(col("word").rlike(s"^$wordPattern$$"))
      .join(enc, "word")
      .groupBy(col(idCol))
      .agg(sum(col("n_tokens").cast("long")).as("doc_tokens"))
  }
}
