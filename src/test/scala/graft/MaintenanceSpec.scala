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

  test("snapshotDiff classifies insert/delete/update and drops unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "s", "v")
    val nw = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "D", 40.0), (5L, "e", 50.0))
      .toDF("id", "s", "v")
    val d = Maintenance.snapshotDiff(old, nw, Seq("id"), Seq("s", "v"))
      .orderBy("id").collect()
    assert(d.map(r => (r.getAs[Long]("id"), r.getAs[String]("change"))).toSeq ==
      Seq((1L, "delete"), (3L, "update"), (4L, "update"), (5L, "insert")))
    // old/new sides populated correctly on an update
    val u3 = d.find(_.getAs[Long]("id") == 3L).get
    assert(u3.getAs[Double]("old_v") == 30.0 && u3.getAs[Double]("new_v") == 31.0)
  }

  test("snapshotDiff compare is null-safe: NULL→value and value→NULL are updates") {
    val old = Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("id", "s")
    val nw = Seq((1L, Option.empty[String]), (2L, Option("b")), (3L, Option("c")))
      .toDF("id", "s")
    val d = Maintenance.snapshotDiff(old, nw, Seq("id"), Seq("s"))
      .orderBy("id").collect()
    assert(d.map(r => (r.getAs[Long]("id"), r.getAs[String]("change"))).toSeq ==
      Seq((1L, "update"), (2L, "update")))
  }

  test("snapshotDiff rejects overlapping key/compare columns") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      Maintenance.snapshotDiff(df, df, Seq("id"), Seq("id", "s"))
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("rollup state merge is lossless vs from-scratch, any slicing") {
    val df = (1L to 1000L).map(i => (i % 3, (i % 7).toDouble)).toDF("g", "v")
    val full = Maintenance.rollupState(df, Seq("g"), "v")
    // three arbitrary disjoint slices, one persisted through parquet
    val s1 = Maintenance.rollupState(df.filter($"g" === 0 || $"v" < 3), Seq("g"), "v")
    val s2 = Maintenance.rollupState(df.filter($"g" =!= 0 && $"v" >= 3 && $"v" < 5), Seq("g"), "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_iv").toString + "/s3"
    Maintenance.rollupState(df.filter($"g" =!= 0 && $"v" >= 5), Seq("g"), "v")
      .write.parquet(dir)
    val merged = Maintenance.mergeRollupStates(
      Seq(s1, s2, spark.read.parquet(dir)), Seq("g"))
    val a = full.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDecimal(2).doubleValue, r.getDouble(3), r.getDouble(4))).toSeq
    val b = merged.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDecimal(2).doubleValue, r.getDouble(3), r.getDouble(4))).toSeq
    assert(a == b, s"full=$a merged=$b")
  }

  test("generational retention: archives pin snapshots, readAsOf/changesSince replay them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString + "/t"
    val v1 = (1L to 100L).map(i => (i, i * 10)).toDF("id", "v")
    v1.write.parquet(dir)
    assert(Maintenance.generations(spark, dir).isEmpty)
    assert(Maintenance.currentGeneration(spark, dir) == 1)
    // swap 1 (retained): delete ids % 10 == 0 -> archive g1 = v1
    Maintenance.deleteByKeys(spark, dir, Seq(10L, 20L, 30L).toDF("id"), Seq("id"),
      retain = true)
    assert(Maintenance.generations(spark, dir) == Seq(1))
    assert(Maintenance.currentGeneration(spark, dir) == 2)
    // swap 2 (retained): upsert a correction -> archive g2 = post-delete
    Maintenance.upsertByKeys(spark, dir,
      Seq((1L, 999L), (200L, 2000L)).toDF("id", "v"), Seq("id"), retain = true)
    assert(Maintenance.generations(spark, dir) == Seq(1, 2))
    assert(Maintenance.currentGeneration(spark, dir) == 3)
    // g1 is the untouched original
    val g1 = Maintenance.readAsOf(spark, dir, 1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(g1 == (1L to 100L).map(i => (i, i * 10)))
    // g2 is the post-delete store
    val g2 = Maintenance.readAsOf(spark, dir, 2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(g2 == (1L to 100L).filterNot(Seq(10L, 20L, 30L).contains).map(i => (i, i * 10)))
    // the live generation reads the live path
    val g3 = Maintenance.readAsOf(spark, dir, 3).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(g3.contains((1L, 999L)) && g3.contains((200L, 2000L)))
    // CDC vs the pinned original: 3 deletes, 1 update, 1 insert
    val diff = Maintenance.changesSince(spark, dir, 1, Seq("id"), Seq("v"))
      .groupBy("change").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(diff == Map("delete" -> 3L, "update" -> 1L, "insert" -> 1L), s"got $diff")
    // a generation that never existed fails loudly
    val e = intercept[IllegalArgumentException](Maintenance.readAsOf(spark, dir, 9))
    assert(e.getMessage.contains("does not exist"))
    // a DEFAULT (retain=false) swap advances the generation WITHOUT
    // archiving, so the previously-live pin now fails LOUDLY instead of
    // silently serving post-swap data (the r16 review finding)
    Maintenance.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(Maintenance.generations(spark, dir) == Seq(1, 2), "no archive creep")
    assert(Maintenance.currentGeneration(spark, dir) == 4)
    val stale = intercept[IllegalArgumentException](Maintenance.readAsOf(spark, dir, 3))
    assert(stale.getMessage.contains("was not retained"))
    // a retained compact archives the pre-compact copy under the live
    // counter (gaps in the ledger are honest: gen 3 existed, unretained)
    Maintenance.compact(spark, dir, targetFileBytes = 1L << 30, retain = true)
    assert(Maintenance.generations(spark, dir) == Seq(1, 2, 4))
    assert(Maintenance.readAsOf(spark, dir, 4).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == g3)
  }

  test("vacuumGenerations: retention keeps the newest archives, vacuumed pins fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vac").toString + "/t"
    (1L to 50L).map(i => (i, i)).toDF("id", "v").write.parquet(dir)
    // three retained swaps -> archive ledger (1, 2, 3)
    for (k <- Seq(1L, 2L, 3L))
      Maintenance.deleteByKeys(spark, dir, Seq(k).toDF("id"), Seq("id"), retain = true)
    assert(Maintenance.generations(spark, dir) == Seq(1, 2, 3))
    val g3Before = Maintenance.readAsOf(spark, dir, 3).orderBy("id").collect().toSeq
    // keep the newest 1: generations 1 and 2 deleted, in order
    assert(Maintenance.vacuumGenerations(spark, dir, keepLast = 1) == Seq(1, 2))
    assert(Maintenance.generations(spark, dir) == Seq(3))
    // the survivor still reads byte-identically; the live store untouched
    assert(Maintenance.readAsOf(spark, dir, 3).orderBy("id").collect().toSeq == g3Before)
    assert(Maintenance.currentGeneration(spark, dir) == 4)
    assert(spark.read.parquet(dir).count() == 47)
    // a vacuumed pin fails with the retention error, not wrong data
    val gone = intercept[IllegalArgumentException](Maintenance.readAsOf(spark, dir, 2))
    assert(gone.getMessage.contains("was not retained"), gone.getMessage)
    // idempotent; keepLast = 0 empties the ledger; bad budget rejects
    assert(Maintenance.vacuumGenerations(spark, dir, keepLast = 1).isEmpty)
    assert(Maintenance.vacuumGenerations(spark, dir, keepLast = 0) == Seq(3))
    assert(Maintenance.generations(spark, dir).isEmpty)
    val bad = intercept[IllegalArgumentException](
      Maintenance.vacuumGenerations(spark, dir, keepLast = -1))
    assert(bad.getMessage.contains("keepLast"))
  }

  test("vacuumGenerations pins the counter on pre-sidecar stores (no generation reuse)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vac2").toString + "/t"
    (1L to 20L).map(i => (i, i)).toDF("id", "v").write.parquet(dir)
    for (k <- Seq(1L, 2L))
      Maintenance.deleteByKeys(spark, dir, Seq(k).toDF("id"), Seq("id"), retain = true)
    assert(Maintenance.currentGeneration(spark, dir) == 3)
    // simulate a pre-counter store: drop the sidecar — liveGeneration now
    // derives max(archived)+1 = 3 from the ledger alone
    val p = new org.apache.hadoop.fs.Path(dir + ".generation")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    fs.delete(new org.apache.hadoop.fs.Path(dir + ".generation.crc"), false)
    assert(Maintenance.currentGeneration(spark, dir) == 3)
    // vacuuming everything must NOT rewind the derived counter (r16b
    // review: a rewound counter re-archives under a used number)
    assert(Maintenance.vacuumGenerations(spark, dir, keepLast = 0) == Seq(1, 2))
    assert(Maintenance.currentGeneration(spark, dir) == 3,
      "vacuum must pin the live generation before deleting the ledger")
    // and the next retained swap archives under 3, not 1
    Maintenance.deleteByKeys(spark, dir, Seq(3L).toDF("id"), Seq("id"), retain = true)
    assert(Maintenance.generations(spark, dir) == Seq(3))
    assert(Maintenance.currentGeneration(spark, dir) == 4)
  }
}
