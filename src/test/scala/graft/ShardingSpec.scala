package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Sharding

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (1 to n).map(i => (i.toLong, s"doc $i"))
    .toDF("doc_id", "text")

  test("manifest: no rows dropped, seq dense 1..n per shard, deterministic") {
    val m = Sharding.manifest(docs(200), "doc_id", 4).cache()
    assert(m.count() == 200)
    // seq is dense per shard: max(seq) == count and distinct seq == count
    val perShard = m.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("seq")).as("mx"),
        countDistinct(col("seq")).as("d"))
      .collect()
    assert(perShard.nonEmpty)
    perShard.foreach { r =>
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
    }
    // a second run reproduces the manifest bit-for-bit (pure hash function)
    val again = Sharding.manifest(docs(200), "doc_id", 4)
    assert(m.select("doc_id", "shard", "sort_key", "seq")
      .except(again.select("doc_id", "shard", "sort_key", "seq")).isEmpty)
    m.unpersist()
  }

  test("manifest: shard and order hashes are independent (different salts)") {
    val m = Sharding.manifest(docs(500), "doc_id", 8)
    // if shard and sort_key shared a hash, sort_key mod 8 would equal shard
    val coupled = m.filter(pmod(col("sort_key"), lit(8)) === col("shard")).count()
    assert(coupled < 500, "sort_key is a deterministic function of shard — salts collapsed")
  }

  test("manifest: null id fails loudly, not silently dropped") {
    val withNull = Seq(Option(1L), Option(2L), Option.empty[Long])
      .toDF("doc_id")
    val ex = intercept[Exception] {
      Sharding.manifest(withNull, "doc_id", 4).collect()
    }
    assert(ex.getMessage != null)
  }

  test("writeShards: each shard file's physical row order equals manifest seq order") {
    val d = docs(300)
    val out = Files.createTempDirectory("graft-shards").toString
    Sharding.writeShards(d, "doc_id", 4, out)
    val m = Sharding.manifest(d, "doc_id", 4)
      .select("doc_id", "shard", "seq")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    (0 until 4).foreach { s =>
      // one directory per shard; read back preserves file row order for a
      // single small file (one split)
      val rows = spark.read.parquet(s"$out/shard=$s")
        .select("doc_id").collect().map(_.getLong(0))
      assert(rows.nonEmpty, s"shard $s is empty")
      rows.zipWithIndex.foreach { case (id, i) =>
        assert(m((s.toLong, i + 1L)) == id,
          s"shard $s position ${i + 1}: file has $id, manifest says ${m((s.toLong, i + 1L))}")
      }
    }
  }

  test("manifestOrdered: within-shard seq follows the explicit order column, id tiebreak") {
    val d = (1 to 100).map(i => (i.toLong, (100 - i).toLong % 10))
      .toDF("doc_id", "quality")
    val m = Sharding.manifestOrdered(d, "doc_id", 4, col("quality")).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq")) ->
        (r.getAs[Long]("quality"), r.getAs[Long]("doc_id"))).toMap
    assert(m.size == 100)
    m.foreach { case ((s, q), (qual, id)) =>
      if (q > 1) {
        val (prevQual, prevId) = m((s, q - 1))
        assert(prevQual < qual || (prevQual == qual && prevId < id),
          s"shard $s: seq ${q - 1}->${q} violates (quality, id) order")
      }
    }
    // shard assignment is IDENTICAL to the hash manifest's — the order
    // knob must not move rows between shards
    val hashShards = Sharding.manifest(d.select("doc_id"), "doc_id", 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val ordShards = Sharding.manifestOrdered(d, "doc_id", 4, col("quality"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(hashShards == ordShards)
  }

  test("shardStats: agrees with the manifest and detects a dropped or substituted id") {
    val d = docs(240)
    val stats = Sharding.shardStats(d, "doc_id", 4).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_key"),
          r.getAs[Long]("max_key"), r.getAs[Long]("xor_key"))).toMap
    // recompute every field from the full manifest
    val m = Sharding.manifest(d.select("doc_id"), "doc_id", 4).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("sort_key")))
    m.groupBy(_._1).foreach { case (s, rows) =>
      val keys = rows.map(_._2)
      assert(stats(s) == (keys.size.toLong, keys.min, keys.max,
        keys.reduce(_ ^ _)), s"shard $s stats drift from the manifest")
    }
    // tamper: drop one doc -> exactly its shard's n_docs and xor change
    val victim = 17L
    val vShard = m.zip(Sharding.manifest(d.select("doc_id"), "doc_id", 4)
      .collect().map(_.getAs[Long]("doc_id"))).collectFirst {
      case ((s, _), id) if id == victim => s }.get
    val tampered = Sharding.shardStats(
      d.filter(col("doc_id") =!= victim), "doc_id", 4).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("xor_key"))).toMap
    stats.foreach { case (s, (n, _, _, x)) =>
      if (s == vShard) assert(tampered(s)._1 == n - 1 && tampered(s)._2 != x,
        s"shard $s must expose the dropped id")
      else assert(tampered(s) == (n, x), s"untouched shard $s changed")
    }
  }

  test("manifest: refuses output-column collisions and bad shard counts") {
    intercept[IllegalArgumentException] {
      Sharding.manifest(docs(5).withColumn("shard", lit(1)), "doc_id", 4)
    }
    intercept[IllegalArgumentException] {
      Sharding.manifest(docs(5), "doc_id", 0)
    }
  }
}
