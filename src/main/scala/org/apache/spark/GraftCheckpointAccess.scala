package org.apache.spark

/** Exact save/restore of `SparkContext.checkpointDir` (a `private[spark]`
  * var) for [[graft.ops.Components]]: the public `setCheckpointDir(path)`
  * SETS `path/<fresh UUID>`, so "restoring" through it nests one UUID level
  * per call and cannot express "unset" at all — the only way to put the
  * caller's global state back byte-for-byte is to write the var directly.
  * Scope-limited to exactly that: a getter and a setter, no other internals
  * touched.
  */
object GraftCheckpointAccess {
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
  def set(sc: SparkContext, v: Option[String]): Unit = sc.checkpointDir = v
}
