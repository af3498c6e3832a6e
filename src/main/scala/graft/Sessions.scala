package graft

import org.apache.spark.sql.SparkSession

/** Stable per-session identity for process-wide cache keys.
  *
  * `System.identityHashCode(spark)` is NOT a session identity: identity
  * hashes can be reused after a session is GC'd, so a new session allocated
  * later could alias a dead session's cache rows (r12 advisor, AnnIndex
  * quantizer cache). A weak-keyed UUID map cannot alias — the entry dies
  * with the session and a fresh session always mints a fresh id — and the
  * weak keys keep this registry from pinning stopped sessions in memory.
  */
object Sessions {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def id(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID.toString)
}
