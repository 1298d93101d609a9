package graft

import graft.operators.Maintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact merges small files without changing the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "s")
    df.repartition(32).write.parquet(dir)
    val beforeData = spark.read.parquet(dir).orderBy("id").collect().toSeq
    val (before, after) = Maintenance.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(before == 32 && after == 1, s"$before -> $after")
    val afterData = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(afterData == beforeData)
    // the recovery marker must not survive a successful swap
    assert(!new java.io.File(dir + ".compacting").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("compact refuses a partitioned root (layout would flatten)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact3").toString + "/t"
    (1L to 100L).map(i => (i, i % 2)).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Maintenance.compact(spark, dir)
    }
    assert(e.getMessage.contains("partition"))
  }

  test("deleteByKeys removes exactly the tombstoned rows, swap marker cleaned up") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del").toString + "/t"
    (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(8).write.parquet(dir)
    val tomb = (1L to 1000L).filter(_ % 13 == 0).toDF("id")
    val (before, after) = Maintenance.deleteByKeys(spark, dir, tomb, Seq("id"))
    assert(before == 1000L && after == 924L, s"$before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 924)
    assert(back.filter(col("id") % 13 === 0).count() == 0)
    assert(!new java.io.File(dir + ".compacting").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("deleteByKeys with no matching tombstones is the identity (modulo layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del2").toString + "/t"
    (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v").write.parquet(dir)
    val (before, after) = Maintenance.deleteByKeys(
      spark, dir, Seq(5000L, 6000L).toDF("id"), Seq("id"))
    assert(before == 100L && after == 100L)
    assert(spark.read.parquet(dir).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (1L to 100L))
  }

  test("upsertByKeys replaces keyed rows, appends novel ones, cleans markers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_up").toString + "/t"
    (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v").write.parquet(dir)
    val updates = Seq((3L, 30.0), (7L, 70.0), (11L, 110.0)).toDF("id", "v")
    val (before, after, replaced) = Maintenance.upsertByKeys(spark, dir, updates, Seq("id"))
    assert((before, after, replaced) === ((10L, 11L, 2L)))
    val back = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(back === ((1L to 10L).map(i => (i, i * 1.0)).map {
      case (3L, _) => (3L, 30.0)
      case (7L, _) => (7L, 70.0)
      case other => other
    } :+ (11L, 110.0)))
    assert(!new java.io.File(dir + ".compacting").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("upsertByKeys rejects duplicate update keys and schema drift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_up2").toString + "/t"
    (1L to 5L).map(i => (i, i * 1.0)).toDF("id", "v").write.parquet(dir)
    intercept[IllegalArgumentException](Maintenance.upsertByKeys(
      spark, dir, Seq((1L, 1.0), (1L, 2.0)).toDF("id", "v"), Seq("id")))
    intercept[IllegalArgumentException](Maintenance.upsertByKeys(
      spark, dir, Seq((1L, "x")).toDF("id", "other"), Seq("id")))
    // store untouched by the failed attempts
    assert(spark.read.parquet(dir).count() === 5L)
  }

  test("recoverSwap restores a crash between the renames, is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_rec").toString
    val live = base + "/t"
    (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "v").write.parquet(live)
    // simulate: rename live -> .old happened, second rename did not
    val fsDir = new java.io.File(live)
    assert(fsDir.renameTo(new java.io.File(live + ".old")))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(live + ".compacting"), live + ".old")
    assert(Maintenance.recoverSwap(spark, live) === true)
    assert(spark.read.parquet(live).count() === 50L)
    assert(!new java.io.File(live + ".compacting").exists())
    assert(!new java.io.File(live + ".old").exists())
    assert(Maintenance.recoverSwap(spark, live) === false) // healthy now
  }

  test("recoverSwap finishes cleanup after a crash past the second rename") {
    val base = java.nio.file.Files.createTempDirectory("graft_rec2").toString
    val live = base + "/t"
    (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v").write.parquet(live)
    (1L to 10L).map(i => (i, i * 9.0)).toDF("id", "v").write.parquet(live + ".old")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(live + ".compacting"), live + ".old")
    assert(Maintenance.recoverSwap(spark, live) === true)
    assert(spark.read.parquet(live).count() === 10L)
    assert(!new java.io.File(live + ".old").exists())
    assert(!new java.io.File(live + ".compacting").exists())
  }

  test("recoverSwap finishes the announced swap after a pre-rename crash") {
    // marker + live + complete .next, no .old = crashed between marker
    // creation and the first rename; the rewrite must be APPLIED, not
    // silently discarded as post-swap debris
    val base = java.nio.file.Files.createTempDirectory("graft_rec3").toString
    val live = base + "/t"
    (1L to 10L).map(i => (i, 1.0)).toDF("id", "v").write.parquet(live)
    (1L to 7L).map(i => (i, 2.0)).toDF("id", "v").write.parquet(live + ".next")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(live + ".compacting"), live + ".old")
    assert(Maintenance.recoverSwap(spark, live) === true)
    val rows = spark.read.parquet(live).collect()
    assert(rows.length == 7 && rows.forall(_.getDouble(1) == 2.0), "rewrite not applied")
    assert(!new java.io.File(live + ".next").exists())
    assert(!new java.io.File(live + ".old").exists())
    assert(!new java.io.File(live + ".compacting").exists())
    assert(Maintenance.recoverSwap(spark, live) === false)
  }

  test("compact sizes the output from real bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    (1L to 20000L).map(i => (i, "x" * 100)).toDF("id", "s")
      .repartition(64).write.parquet(dir)
    val totalBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = totalBytes / 4
    val (_, after) = Maintenance.compact(spark, dir, targetFileBytes = target)
    // ceil(total/target) = 4 or 5 (re-encoded sizes shift slightly)
    assert(after >= 3 && after <= 6, s"got $after files")
    assert(spark.read.parquet(dir).count() == 20000)
  }
}
