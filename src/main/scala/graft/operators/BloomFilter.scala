package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter semi-join reduction — the runtime-filter
  * pattern for big-fact ⋈ selective-dim joins at 100 TB: build an m-bit
  * filter from the (filtered) dim keys, pre-filter the fact BEFORE its
  * shuffle, then run the exact join, which removes the filter's false
  * positives. The join result is bit-identical to the unfiltered plan; the
  * win is that the fact rows that cannot match never enter the exchange.
  *
  * Spark has this built in (`spark.sql.optimizer.runtime.bloomFilter.*`,
  * injected by Catalyst when statistics justify it) using engine-private
  * hashing. This operator is the engine-portable, deterministic variant —
  * bit positions derive from md5 like every graft sketch ([[HllSketch]],
  * [[CountMinSketch]]), so an external system (or the DuckDB oracle) can
  * rebuild the identical filter and audit exactly which rows it admits.
  *
  * The build's `collect()` is bounded by the BITMAP (m bits, ~2 KiB–2 MiB),
  * never by data volume — same bounded-driver-state argument as
  * [[Quantiles]]' P partition offsets. The probe side ships the bitmap as
  * a Spark broadcast variable referenced from the codegen'd
  * [[graft.plans.BloomProbe]] expression, evaluated O(k) per row inside
  * whole-stage codegen with a plan that stays O(1) in m.
  */
object BloomFilter {

  /** Bitmap size for an expected build-side key count: the next power of
    * two ≥ 16 bits/key (k=3 → ~0.1–0.5% false positives). Size m from the
    * ACTUAL dim count — the build side is dim-sized, so counting it first
    * is cheap, while a FIXED m silently saturates when the dim grows: the
    * 10× scale probe measured exactly that (fill → 1, fp → 1, and the
    * "prefilter" admits everything — correct results, zero reduction).
    * Capped at 2^28 bits (32 MiB) — beyond that, ship Spark's built-in
    * runtime bloom or a semi-join instead of a literal.
    */
  def mFor(expectedKeys: Long): Int = {
    require(expectedKeys > 0, s"expectedKeys must be positive, got $expectedKeys")
    var m = 1024
    while (m < 16L * expectedKeys && m < (1 << 28)) m <<= 1
    m
  }

  /** The k bit positions of a key: md5 of "<key>:bf<i>", first 8 hex chars
    * as an integer, mod m — reproducible in any engine with md5.
    */
  def positions(key: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      conv(substring(md5(concat(key.cast("string"), lit(s":bf$i"))
        .cast("binary")), 1, 8), 16, 10).cast("long") % m
    }

  /** Build the filter from (small, pre-filtered) build-side keys: a dense
    * Boolean bitmap of m bits. Nulls never match a join anyway and are
    * excluded.
    */
  def build(df: DataFrame, keyCol: String, m: Int, k: Int): Array[Boolean] = {
    require(m > 0 && k > 0, s"bad bloom shape m=$m k=$k")
    val keys = df.filter(col(keyCol).isNotNull)
    val pos = keys
      .select(explode(array(positions(col(keyCol), m, k): _*)).as("p"))
      .distinct()
      .collect() // bounded by m distinct positions, not by input rows
    val bits = new Array[Boolean](m)
    pos.foreach(r => bits(r.getLong(0).toInt) = true)
    bits
  }

  /** Probe predicate: true iff every one of the key's k positions is set.
    * No false negatives by construction; false positives are whatever the
    * load factor admits and are eliminated by the exact join downstream.
    *
    * The `bits` array must be treated as IMMUTABLE once probed: the packed
    * broadcast is cached per array identity, so mutating the array between
    * probes would silently reuse the stale broadcast (the probe would keep
    * answering for the OLD filter). Rebuild into a fresh array instead —
    * or call [[invalidate]] first, which also releases the executor-side
    * broadcast blocks for long-lived sessions.
    *
    * Transport: the bitmap rides a Spark BROADCAST variable (packed words,
    * m/8 bytes, fetched once per executor) referenced from the codegen'd
    * [[graft.plans.BloomProbe]] expression — the plan itself stays O(1) in
    * m. An array LITERAL here (the round-8 formulation) embeds m boxed
    * Booleans in the Catalyst tree, bloating plan serialization and every
    * task closure long before the 2^28 cap bites. Null key → null → the
    * filter drops the row, as before.
    */
  def mightContain(key: Column, bits: Array[Boolean], m: Int, k: Int): Column = {
    require(bits.length == m, s"bitmap length ${bits.length} != m $m")
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(graft.plans.BloomProbe(
      GraftColumnBridge.toExpression(key.cast("string")), broadcastFor(bits), m, k))
  }

  // One broadcast per bitmap ARRAY (weak identity keys): probing the same
  // filter from several plan branches (q78's candidate-count + exact-join
  // consumers, bench re-runs over a held bits array) reuses one torrent
  // transfer instead of re-broadcasting per call. Lifecycle is Spark's
  // standard broadcast contract: when the last plan (and this weak entry)
  // drops the handle, ContextCleaner reclaims the executor blocks — the
  // same GC-tied lifetime the old plan-literal had, minus the plan bloat.
  private val bcastCache =
    new java.util.WeakHashMap[Array[Boolean],
      org.apache.spark.broadcast.Broadcast[Array[Long]]]()

  private def broadcastFor(bits: Array[Boolean]) = bcastCache.synchronized {
    val hit = bcastCache.get(bits)
    if (hit != null) hit
    else {
      val b = org.apache.spark.sql.SparkSession.active.sparkContext
        .broadcast(graft.plans.BloomProbe.pack(bits))
      bcastCache.put(bits, b)
      b
    }
  }

  /** Drop the cached broadcast for `bits` and release its executor blocks.
    * For long-lived sessions that hold a bitmap reference past its last
    * probe (the weak cache entry would otherwise pin executor memory until
    * the ARRAY is collected), or before mutating/rebuilding a filter
    * in place. Safe to call with an array that was never probed. Plans
    * still holding the broadcast keep working — destroy is deferred to
    * blocking=false semantics via unpersist, not a hard destroy.
    */
  def invalidate(bits: Array[Boolean]): Unit = bcastCache.synchronized {
    val hit = bcastCache.remove(bits)
    if (hit != null) hit.unpersist(blocking = false)
  }
}
