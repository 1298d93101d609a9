package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Shared machinery for the per-key unsplittable-file sinks
  * ([[GeoPackage.writeLayerFiles]], [[Shapefile.writeFeatureFiles]] — the
  * reference's per-tile vector sharding, image_segmentation.py:153-162).
  *
  * Two scale/correctness contracts live here:
  *   - distinct keys NEVER collide on the output filename ([[safeName]]);
  *   - a task buffers at most ONE key's rows at a time ([[foreachKeyRun]]):
  *     sort-within-partition + run iteration, so a partition holding many
  *     keys is streamed, not materialized as JVM objects. Per-key
  *     materialization is the floor — one unsplittable file is assembled
  *     in memory by design.
  */
private[graft] object KeyedFileSink {

  /** High-water mark of rows buffered for a single key-run — observable in
    * tests (meaningful in local mode only: one JVM).
    */
  private[graft] val maxRunRows = new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] def resetMaxRunRows(): Unit = maxRunRows.set(0)
  private val maxOp = new java.util.function.LongBinaryOperator {
    override def applyAsLong(a: Long, b: Long): Long = math.max(a, b)
  }

  /** Filesystem-safe file stem. Sanitized keys append a stable md5 suffix
    * of the RAW key, so distinct keys like "a b" and "a_b" map to distinct
    * files instead of silently last-write-wins overwriting each other.
    */
  def safeName(key: String): String = {
    val safe = key.replaceAll("[^A-Za-z0-9_.-]", "_")
    if (safe == key) safe
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      s"$safe-${md.take(8)}"
    }
  }

  /** Hash-shuffle rows by `keyCol`, sort within partitions, and stream each
    * key-run to `write(keyString, rows)` on the executors.
    */
  def foreachKeyRun(df: DataFrame, keyCol: String)(
      write: (String, Seq[Row]) => Unit): Unit = {
    import org.apache.spark.sql.functions.col
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.repartition(col(keyCol)).sortWithinPartitions(col(keyCol))
      .foreachPartition { it: Iterator[Row] =>
        var cur: String = null
        var started = false
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        def flush(): Unit = if (started) {
          maxRunRows.getAndAccumulate(buf.length.toLong, maxOp)
          write(cur, buf.toSeq)
          buf.clear()
        }
        it.foreach { r =>
          val k = String.valueOf(r.get(keyIdx))
          if (!started || k != cur) { flush(); cur = k; started = true }
          buf += r
        }
        flush()
      }
  }
}
