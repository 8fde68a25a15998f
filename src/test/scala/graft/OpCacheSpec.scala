package graft

import org.apache.spark.sql.functions._

import graft.operators.OpCache
import graft.operators.dedup.{MinHashLSH, NGramJaccard, SimHash}
import graft.operators.similarity.CosinePairs

/** Cache lifecycle contract (VERDICT r3 nit 1): operators in the
  * dedup/similarity family cache heavy intermediates; an OpCache.scoped
  * block around the call + terminal action must release every one of them.
  */
class OpCacheSpec extends SparkSpec {

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  /** Clean-slate precondition: clearCache drops SQL-cached frames, but
    * EARLIER SUITES' dead localCheckpoint blocks (DupClusters inside the
    * pipeline specs) linger until the ContextCleaner's GC pass — which
    * made this suite's `=== 0` baselines order- and timing-sensitive
    * (surfaced in round 19 when MediaCurationPipelineSpec landed a few
    * suites before this one). Suites run sequentially in the forked test
    * JVM, so the leftovers are provably dead frames — unpersist them
    * deterministically.
    */
  private def hardClear(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  private def docs = Tables.documents(spark, sf("0.001"))

  test("scoped releases every cache the dedup family creates") {
    hardClear()
    assert(cachedRddCount === 0)
    OpCache.scoped {
      // all four caching operators, with terminal actions inside the scope
      NGramJaccard.pairs(docs, "doc_id", "text", 0.8).count()
      MinHashLSH.candidatePairs(docs, "doc_id", "text").count()
      SimHash.signatures(docs, "doc_id", "text").count()
      assert(cachedRddCount > 0, "operators should have cached intermediates")
    }
    assert(cachedRddCount === 0, "scope exit must unpersist operator caches")
  }

  test("scoped releases similarity caches and survives exceptions") {
    hardClear()
    val vecs = Tables.embeddings(spark, sf("0.001"))
    intercept[RuntimeException] {
      OpCache.scoped {
        CosinePairs.banded(vecs, "vec_id", "embedding", 0.4,
          graft.queries.SimilarityQueries.Dims).count()
        assert(cachedRddCount > 0)
        throw new RuntimeException("boom")
      }
    }
    assert(cachedRddCount === 0, "caches must release on exceptional exit")
  }

  test("nested scopes release innermost caches at innermost exit") {
    hardClear()
    OpCache.scoped {
      SimHash.signatures(docs, "doc_id", "text").count()
      val outer = cachedRddCount
      assert(outer > 0)
      OpCache.scoped {
        // a DIFFERENT cached plan: Spark's CacheManager dedupes
        // plan-identical cache() calls, so reusing the docs hash frame here
        // would register zero new RDDs
        CosinePairs.banded(Tables.embeddings(spark, sf("0.001")),
          "vec_id", "embedding", 0.4, graft.queries.SimilarityQueries.Dims).count()
        assert(cachedRddCount > outer)
      }
      assert(cachedRddCount === outer, "inner scope releases only its own")
    }
    assert(cachedRddCount === 0)
  }

  test("unscoped calls still cache (session contract) and results stay correct") {
    hardClear()
    val scoped = OpCache.scoped {
      NGramJaccard.pairs(docs, "doc_id", "text", 0.8)
        .orderBy("doc_a", "doc_b").collect().toSeq
    }
    val unscoped = NGramJaccard.pairs(docs, "doc_id", "text", 0.8)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(cachedRddCount > 0, "unscoped call keeps its session-lifetime cache")
    assert(scoped === unscoped)
    spark.catalog.clearCache()
  }
}
