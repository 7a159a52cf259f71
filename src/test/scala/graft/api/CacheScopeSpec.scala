package graft.api

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  test("release unpersists everything registered in the scope") {
    val scope = new CacheScope
    val a = scope.persist(Seq(1, 2, 3).toDF("x"))
    val b = scope.persist(Seq(4).toDF("y"))
    a.count(); b.count()
    a.storageLevel should not be StorageLevel.NONE
    b.storageLevel should not be StorageLevel.NONE
    scope.release()
    a.storageLevel shouldBe StorageLevel.NONE
    b.storageLevel shouldBe StorageLevel.NONE
    // release is idempotent and the scope is reusable
    scope.release()
    val c = scope.persist(Seq(5).toDF("z"))
    c.count()
    c.storageLevel should not be StorageLevel.NONE
    scope.release()
    c.storageLevel shouldBe StorageLevel.NONE
  }

  test("pair-finding ops registered against a scope leave no cache behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val scope = new CacheScope
    val docs = Seq((1, "a b c d"), (2, "a b c d"), (3, "x y z w"))
      .toDF("id", "text")
    val pairs = graft.dedup.MinHash.nearDupPairs(docs, "id", "text",
      threshold = 0.9, scope = scope)
    pairs.count() shouldBe 1
    scope.release(blocking = true)
    spark.sparkContext.getPersistentRDDs.size shouldBe before
  }
}
