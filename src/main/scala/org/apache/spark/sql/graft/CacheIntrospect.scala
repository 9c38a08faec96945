package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Test-support: is the SQL plan cache (CacheManager) empty?
  *
  * Operators in this library must not leak `persist()` registrations to
  * their callers — re-read intermediates use `localCheckpoint` instead,
  * whose blocks the ContextCleaner frees on GC, while a CacheManager
  * entry is pinned until an explicit unpersist. DedupSpec asserts this
  * invariant through this helper. Lives under org.apache.spark.sql
  * because `sharedState`/`cacheManager` are `private[sql]`.
  */
object CacheIntrospect {
  def sqlCacheEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[ClassicSession].sharedState.cacheManager.isEmpty
}
