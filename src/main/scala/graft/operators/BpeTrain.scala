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

  /** The per-round adjacent-pair count frame over a (a, f) symbol-array
    * vocabulary — one explode + integer-SUM shuffle at vocab grain.
    */
  private def pairCounts(words: DataFrame): DataFrame = words
    .select(explode(expr(
      "CASE WHEN size(a) >= 2 THEN transform(sequence(1, size(a)-1), " +
        "i -> concat(element_at(a, i), ' ', element_at(a, i+1))) " +
        "ELSE array() END")).as("pair"), col("f"))
    .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))

  /** Sequential trainer core over an initial (a array<string>, f long)
    * vocabulary frame — shared by the word-grain [[merges]] and the
    * byte-grain [[byteMerges]]: per round, one pair-count shuffle, one
    * 1-row argmax collect, one merge-apply projection, checkpointed with
    * per-round block release.
    */
  private def mergesOn(initial: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "need at least one merge step")
    val spark = initial.sparkSession
    var (words, releaseWords) = Checkpoints.releasable(initial)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val best = pairCounts(words)
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

  def merges(docs: DataFrame, textCol: String, numMerges: Int,
             wordPattern: String = DefaultWordPattern): DataFrame =
    mergesOn(vocabOf(docs, textCol, wordPattern)
      .select(expr("concat(regexp_extract_all(word, '(.)', 1), array('</w>'))")
        .as("a"), col("f")), numMerges)

  /** How far past the batch the greedy selector may look: each round
    * collects the top `CandidateFactor · batchSize` pairs and selects the
    * symbol-disjoint prefix greedily. Bounds the per-round collect; a
    * round where fewer than `batchSize` disjoint pairs exist inside the
    * window simply learns fewer merges that round.
    */
  val CandidateFactor = 4

  /** BATCHED BPE training — the production answer to the sequential
    * trainer's driver-latency wall: a realistic 30k-merge run under
    * [[merges]] is 30k sequential Spark jobs with a 1-row collect each
    * (~hours of pure scheduling at any data size, because the loop is
    * driver-bound, not data-bound). The standard trick (SentencePiece,
    * tokenizers' `max_merges_per_round` lineage): per round, apply the B
    * highest-count PAIRWISE SYMBOL-DISJOINT merges at once — disjoint
    * pairs cannot overlap positionally in any word, so applying them in
    * any order yields the same vocabulary, and each selected pair's
    * occurrence count is unchanged by the others (merging (a,b) only
    * creates/destroys pairs that contain `a`, `b`, or the new symbol
    * `ab`). Round count falls from `numMerges` to `numMerges / B`-ish;
    * counts WITHIN a round are the round-start counts (the documented
    * batched-BPE approximation — BpeTrainSpec pins both the B=1 ≡
    * sequential identity and a disjoint-top-B corpus where batched ≡
    * sequential exactly).
    *
    * Greedy selection runs inside the top `CandidateFactor·batchSize`
    * window of the (cnt DESC, pair ASC) order: scan in order, select a
    * pair iff neither symbol appears in an already-selected pair this
    * round (a bounded ≤4B-row collect — same driver-state discipline as
    * the sequential 1-row argmax). All selected folds collapse into ONE
    * merge-apply projection per round (whole-stage codegen), so a round
    * costs exactly what a sequential step costs: one pair-count shuffle +
    * one bounded collect + one checkpointed projection.
    *
    * Returns one row per learned merge: (round, sel, pair, merged,
    * pair_count) — `round` 1-based, `sel` the 1-based selection order
    * within the round, `pair_count` the round-start count. Global learn
    * order is (round, sel). Stops early if a round finds no pairs.
    */
  def mergesBatched(docs: DataFrame, textCol: String, rounds: Int,
                    batchSize: Int,
                    wordPattern: String = DefaultWordPattern): DataFrame = {
    require(rounds >= 1, "need at least one round")
    require(batchSize >= 1, "need a positive batch size")
    val spark = docs.sparkSession
    val vocab = vocabOf(docs, textCol, wordPattern)
    var (words, releaseWords) = Checkpoints.releasable(vocab
      .select(expr("concat(regexp_extract_all(word, '(.)', 1), array('</w>'))")
        .as("a"), col("f")))
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val window = pairCounts(words)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(CandidateFactor * batchSize)
        .collect() // bounded: ≤ 4B candidate rows
      if (window.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val selected = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        val it = window.iterator
        while (selected.size < batchSize && it.hasNext) {
          val r = it.next()
          val pair = r.getString(0)
          val Array(l, rt) = pair.split(" ", 2)
          if (!used(l) && !used(rt)) {
            used += l; used += rt
            selected += ((pair, r.getLong(1)))
          }
        }
        selected.iterator.zipWithIndex.foreach { case ((pair, cnt), i) =>
          learned += ((round, i + 1, pair, cnt))
        }
        // all B folds in ONE projection (selection order; disjointness
        // makes the order irrelevant to the result)
        val folded = selected.foldLeft("a") { case (acc, (pair, _)) =>
          val Array(l, rt) = pair.split(" ", 2)
          foldSql(acc, l, rt, l + rt)
        }
        val (next, releaseNext) = Checkpoints.releasable(words
          .select(expr(folded).as("a"), col("f")))
        releaseWords()
        words = next
        releaseWords = releaseNext
        round += 1
      }
    }
    releaseWords()
    val rows = learned.toSeq.map { case (rd, sel, pair, cnt) =>
      Row(rd, sel, pair, pair.replace(" ", ""), cnt)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("sel", IntegerType, nullable = false),
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

  // ------------- byte-level pre-tokenized BPE (GPT-2 lineage) -------------

  /** The pinned pre-tokenizer: the public GPT-2 regex's character classes
    * (contractions, optionally-space-prefixed letter runs, digit runs,
    * punctuation runs, whitespace runs) with the trailing-whitespace
    * LOOKAHEAD arm dropped — RE2-family engines (the replay side) have no
    * lookahead, so the pattern is pinned to the common leftmost-first
    * subset both regex dialects execute identically. Every character of
    * the input lands in exactly one pre-token (the alternation is total),
    * and merges never cross pre-token boundaries — the GPT-2 contract.
    */
  val BytePreTokPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** [[BytePreTokPattern]] as a Spark SQL single-quoted literal: Spark's
    * default literal parser treats backslash as an escape (unlike
    * standard SQL), so `\p{L}` must arrive as `\\p{L}`; the leading
    * contraction quote needs `\'`.
    */
  private def preTokPatternLit: String =
    "'" + BytePreTokPattern.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Byte-level symbol alphabet: each UTF-8 byte is the 2-hex-digit
    * lowercase symbol of its value ("a" → "61", " " → "20"). Hex pairs —
    * and every concatenation of them — stay inside [[SymbolCharset]], so
    * the trainer's fold interpolation, the `|` replay delimiter, and the
    * SQL literal quoting are all safe BY CONSTRUCTION for arbitrary
    * input text (the word-grain path restricts the input instead). No
    * `</w>` marker: pre-tokens are the unit — GPT-2's space-prefix
    * convention carries the boundary inside the symbols themselves
    * (" fast" starts with "20").
    */
  private def byteSymbolsSql(strCol: String): String =
    s"regexp_extract_all(lower(hex(encode($strCol, 'UTF-8'))), '..', 0)"

  /** The distinct PRE-TOKEN frequency table — the byte-level twin of
    * [[vocabOf]] and the single corpus-sized pass of the byte path.
    */
  private def preTokVocabOf(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(explode(expr(
        s"regexp_extract_all($textCol, $preTokPatternLit, 0)")).as("pretok"))
      .groupBy(col("pretok")).agg(count(lit(1)).as("f"))

  /** Byte-level BPE training: [[BytePreTokPattern]] pre-tokenization →
    * hex-pair byte symbols → the same sequential trainer core the
    * word-grain path rides ([[mergesOn]]): per round one pair-count
    * shuffle at pre-token-vocab grain, one 1-row argmax, one checkpointed
    * merge-apply projection. Token budgets under this trainer are what
    * GPT-2/Llama-class pipelines meter — byte grain changes both the
    * alphabet (256 base symbols, no OOV) and the counts vs the
    * whitespace-word trainer.
    */
  def byteMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    mergesOn(preTokVocabOf(docs, textCol)
      .select(expr(byteSymbolsSql("pretok")).as("a"), col("f")), numMerges)

  /** Byte-level encoding under a learned merge list — [[encodeVocab]] at
    * pre-token grain: one projection collapses the byte split and every
    * fold; (pretok, f, n_tokens, tokens) with `tokens` the `|`-joined hex
    * symbols. Σ f·n_tokens is the corpus byte-level token budget.
    */
  def byteEncodeVocab(docs: DataFrame, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "need at least one learned merge")
    var enc = preTokVocabOf(docs, textCol)
      .withColumn("a", expr(byteSymbolsSql("pretok")))
    merges.foreach { case (l, r) =>
      enc = enc.withColumn("a", expr(foldSql("a", l, r, l + r)))
    }
    enc.select(col("pretok"), col("f"),
      size(col("a")).as("n_tokens"),
      array_join(col("a"), "|").as("tokens"))
  }

  /** Doc-grain BYTE-LEVEL token counts — [[docTokenCounts]] at byte grain:
    * the corpus explodes to pre-tokens once and joins the (pretok →
    * n_tokens) vocab (AQE-broadcast while it fits), one doc-keyed integer
    * SUM after. Docs with a null or empty `textCol` emit no row. Σ over
    * this frame equals Σ f·n_tokens over [[byteEncodeVocab]]
    * (spec-pinned — the budget identity at byte grain).
    */
  def byteDocTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                         merges: Seq[(String, String)]): DataFrame = {
    val enc = byteEncodeVocab(docs, textCol, merges)
      .select(col("pretok"), col("n_tokens"))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(expr(
        s"regexp_extract_all($textCol, $preTokPatternLit, 0)")).as("pretok"))
      .join(enc, "pretok")
      .groupBy(col(idCol))
      .agg(sum(col("n_tokens").cast("long")).as("doc_tokens"))
  }
}
