package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.ImageGridHash

/** One decoded sampled-luminance grid row ([[ImageHash.grids]]); stub
  * rows (undecodable payloads) carry None features.
  */
final case class ImageGridRow(doc_id: Long, width: Option[Int],
    height: Option[Int], format: String, grid: Option[Array[Int]])

/** IMAGE perceptual-hash near-duplication — the multimodal leg of the
  * dedup family (SURVEY §2 items 41b/41c): LAION-class corpora dedup
  * IMAGES before training, and lexical fingerprints see only bytes — a
  * BMP↔PNG re-encode of the same picture shares not one byte. dHash /
  * aHash (difference / average hash — the classic integer perceptual
  * hashes; pHash's DCT floats would not be bitwise cross-engine
  * replayable) over the DECODED pixels are re-encode-invariant by
  * construction, and Hamming-banded retrieval turns pairwise comparison
  * into a bucket join.
  *
  * Stage shape:
  *  1. [[grids]] — REAL decode (javax.imageio, magic-sniffed like
  *     [[BinaryPipeline.decodeFeatures]]) batched per partition, reduced
  *     to a [[ImageGridHash.GridRows]]×[[ImageGridHash.GridCols]]
  *     POINT-SAMPLED luminance grid: sample pixel
  *     (gx·w DIV GridCols, gy·h DIV GridRows), luminance = r+g+b
  *     (0..765, integer — the classic area-average downsample needs a
  *     division whose rounding an external oracle would have to chase;
  *     point sampling is exact everywhere).
  *  2. [[hashes]] — the [[graft.plans.ImageGridHash]] codegen expression
  *     folds each grid into 56-bit dHash/aHash inside whole-stage
  *     codegen.
  *  3. [[nearDupPairs]] — banded Hamming retrieval: split the dHash into
  *     `bands` contiguous bit ranges; pairs sharing ANY band key are
  *     candidates; verify popcount(xor) ≤ maxHamming. With
  *     maxHamming < bands the pigeonhole guarantees a clean band for
  *     every true pair, so retrieval is EXACT (not approximate) at the
  *     configured radius — the oracle can replay it as a plain
  *     quadratic hamming join.
  *
  * Scale shape: decode/hash are one narrow CPU pass (no shuffle beyond
  * the encode-side spread); the pair join shuffles (band, key) tuples —
  * `bands·n` rows. Candidate mass is the real dial: random un-related
  * hashes collide on a `w`-bit band with probability 2^-w, so expected
  * background candidates ≈ bands·n²/2^(56/bands)/2 — WIDE bands (few,
  * at small maxHamming) keep that subquadratic far longer than many
  * 8-bit bands would. Default maxHamming = 2 → 3 bands of ~19 bits:
  * background collisions reach the corpus size n only around
  * n ≈ 2^19·3 ≈ 1.5M per distinct-image population, and true duplicate
  * GROUPS cost group² pairs — inherent to emitting the pair relation
  * (the same contract as every other pair generator here; DupClusters
  * consumes the pairs either way). For a larger radius, raise
  * maxHamming and bands together (exactness needs maxHamming < bands)
  * and budget the narrower-band collision mass accordingly.
  */
object ImageHash {

  /** Hash width in bits (7 rows × 8 difference columns). */
  val Bits: Int = ImageGridHash.Bits

  /** Default Hamming radius / band count: 3 bands of ⌈56/3⌉ bits —
    * exact at radius 2, widest keys (fewest background collisions).
    */
  val DefaultMaxHamming = 2

  /** (idCol, width, height, format, grid) — one row per input; payloads
    * no ImageIO reader decodes carry a null grid and format 'fake/raw'
    * (the [[BinaryPipeline]] stub-labeling contract).
    */
  def grids(spark: SparkSession, df: DataFrame, idCol: String,
            blobCol: String): DataFrame = {
    import spark.implicits._
    val gc = ImageGridHash.GridCols
    val gr = ImageGridHash.GridRows
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val real = BinaryPipeline.sniff(blob).flatMap { fmt =>
          (try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob)))
          catch { case scala.util.control.NonFatal(_) => None })
            .map(img => (img, fmt))
        }
        real match {
          case Some((img, fmt)) =>
            val w = img.getWidth
            val h = img.getHeight
            val g = new Array[Int](gr * gc)
            var gy = 0
            while (gy < gr) {
              var gx = 0
              while (gx < gc) {
                val rgb = img.getRGB(gx * w / gc, gy * h / gr)
                g(gy * gc + gx) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)
                gx += 1
              }
              gy += 1
            }
            ImageGridRow(id, Some(w), Some(h), fmt, Some(g))
          case None => ImageGridRow(id, None, None, "fake/raw", None)
        }
      })
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** (idCol, width, height, format, dhash, ahash): [[grids]] folded by
    * the codegen hash expressions; null grid → null hashes.
    */
  def hashes(spark: SparkSession, df: DataFrame, idCol: String,
             blobCol: String): DataFrame = {
    val g = grids(spark, df, idCol, blobCol)
    def hash(d: Boolean) = ColumnBridge.column(
      ImageGridHash(ColumnBridge.expression(col("grid")), dhash = d))
    g.select(col(idCol), col("width"), col("height"), col("format"),
      hash(d = true).as("dhash"), hash(d = false).as("ahash"))
  }

  /** Contiguous band bit-widths for `bands` bands over [[Bits]] bits
    * (first `Bits mod bands` bands take the extra bit).
    */
  def bandWidths(bands: Int): Seq[Int] = {
    val base = Bits / bands
    val extra = Bits % bands
    (0 until bands).map(b => base + (if (b < extra) 1 else 0))
  }

  /** Exact Hamming-≤maxHamming dHash pairs via band-bucket retrieval:
    * (a_id, b_id, ham_d, ham_a), a_id < b_id, undecodable rows (null
    * hashes) excluded. Exactness: maxHamming < bands ⇒ every qualifying
    * pair shares at least one untouched band (pigeonhole), so the
    * banded candidate set is a superset of the answer and the popcount
    * filter trims it to exactly the Hamming ball.
    */
  def nearDupPairs(hashes: DataFrame, idCol: String,
                   maxHamming: Int = DefaultMaxHamming,
                   bands: Int = DefaultMaxHamming + 1): DataFrame = {
    require(bands >= 1 && bands <= Bits, s"bands in [1,$Bits], got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"banded retrieval is exact only for maxHamming < bands, " +
        s"got maxHamming=$maxHamming bands=$bands")
    val h = hashes.filter(col("dhash").isNotNull)
      .select(col(idCol).as("hid"), col("dhash"), col("ahash"))
    // candidate retrieval over (id, band, key) ONLY — the hash columns
    // must not ride the band explode, the self-join exchange, or the
    // multi-band-collision distinct (they widened those shuffles ~40%
    // until round 19); they re-join onto the deduped id pairs below,
    // where candidate volume is already subquadratic
    val ids = bandedIdPairs(h, "hid", maxHamming, bands)
    ids
      .join(h.select(col("hid").as("a_id"), col("dhash").as("a_d"),
        col("ahash").as("a_a")), Seq("a_id"))
      .join(h.select(col("hid").as("b_id"), col("dhash").as("b_d"),
        col("ahash").as("b_a")), Seq("b_id"))
      .filter(bit_count(col("a_d").bitwiseXOR(col("b_d"))) <= maxHamming)
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_d").bitwiseXOR(col("b_d"))).cast("int").as("ham_d"),
        bit_count(col("a_a").bitwiseXOR(col("b_a"))).cast("int").as("ham_a"))
  }

  /** Distinct candidate id pairs (a_id < b_id) sharing ≥ 1 band key of
    * the `hashCol`-named 56-bit hash in `h(idCol, hashCol…)` — the
    * narrow core of [[nearDupPairs]], shared with the audio leg
    * ([[AudioHash.nearDupPairs]]) and the incremental index
    * ([[ImageHashIndex]]). Input rows must already be non-null-hash.
    * The pair rows are deduped on ids BEFORE any verify: hashes are
    * functions of the ids, so multi-band collisions are the same pair.
    */
  private[multimodal] def bandedIdPairs(h: DataFrame, idCol: String,
      maxHamming: Int, bands: Int, hashCol: String = "dhash"): DataFrame = {
    val banded = bandedPostings(h, idCol, bands, hashCol)
    banded.select(col("band"), col("key"), col(idCol).as("a_id"))
      .join(banded.select(col("band"), col("key"), col(idCol).as("b_id")),
        Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** The band-bucket POSTINGS of the `hashCol`-named 56-bit hash:
    * (idCol, band, key), `bands` rows per input row — the retrieval
    * substrate [[bandedIdPairs]] self-joins and the incremental index
    * ([[ImageHashIndex]]) persists.
    */
  private[multimodal] def bandedPostings(h: DataFrame, idCol: String,
      bands: Int, hashCol: String = "dhash"): DataFrame = {
    val widths = bandWidths(bands)
    val offsets = widths.scanLeft(0)(_ + _).init
    val bandStructs = widths.indices.map { b =>
      struct(lit(b).as("band"),
        shiftright(col(hashCol), offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1)).as("key"))
    }
    h.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").cast("int").as("band"),
        col("bk.key").as("key"))
  }
}
