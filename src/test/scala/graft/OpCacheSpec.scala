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

  private def docs = Tables.documents(spark, sf("0.001"))

  test("scoped releases every cache the dedup family creates") {
    spark.catalog.clearCache()
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
    spark.catalog.clearCache()
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
    spark.catalog.clearCache()
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
    spark.catalog.clearCache()
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
