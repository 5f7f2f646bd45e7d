package graft

import org.apache.spark.storage.StorageLevel

/** Lifecycle of operator-persisted intermediates: the registry that
  * keeps one query's caches from bleeding into the next (the BENCH r2
  * q18 regression class). */
class CachesSpec extends SparkSpec {

  test("persistTracked caches; releaseAll unpersists every tracked handle") {
    val a = Caches.persistTracked(spark.range(100).toDF("x"))
    val b = Caches.persistTracked(spark.range(50).toDF("y"))
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK)
    a.count(); b.count() // materialize
    Caches.releaseAll()
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
    // idempotent: a second release (and re-release of unpersisted
    // frames, as iterative ops do) is a no-op
    Caches.releaseAll()
  }

  test("operators leave no resident cache blocks behind a releaseAll") {
    Dedup.ngramJaccardWarm(spark)
    Caches.releaseAll()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty ||
      spark.sparkContext.getPersistentRDDs.values.forall(
        _.getStorageLevel == StorageLevel.NONE))
  }

  private object Dedup {
    // run a persist-heavy op end-to-end (materializes its tracked caches)
    def ngramJaccardWarm(spark: org.apache.spark.sql.SparkSession): Unit =
      graft.ops.Dedup.ngramJaccard(spark, sf0001).count()
  }
}
