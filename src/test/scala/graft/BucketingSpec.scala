package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-bucketed join plans without a shuffle exchange and matches the plain join") {
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", buckets = 4, keys = Seq("k"))
    Bucketing.writeBucketed(b, "bkt_b", buckets = 4, keys = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // force a non-broadcast join so co-location is what saves the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "bkt_a", "bkt_b", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join, got:\n$plan")
      // correctness: equals the plain dataframe join
      val expect = a.join(b, Seq("k")).orderBy("k").collect().map(_.toSeq).toSeq
      val got = joined.orderBy("k").collect().map(_.toSeq).toSeq
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("writeBucketed refuses to destroy a foreign dataset at the derived location") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val base = new org.apache.hadoop.fs.Path(wh)
    val loc = new org.apache.hadoop.fs.Path(base, "bkt_foreign")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant something that is clearly NOT an orphaned managed parquet table
    fs.mkdirs(new org.apache.hadoop.fs.Path(loc, "precious_subdir"))
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, "notes.txt"), true)
    out.write("do not delete".getBytes("UTF-8")); out.close()
    try {
      val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      val e = intercept[IllegalArgumentException] {
        Bucketing.writeBucketed(df, "bkt_foreign", buckets = 2, keys = Seq("k"))
      }
      assert(e.getMessage.contains("refusing to overwrite"))
      assert(fs.exists(new org.apache.hadoop.fs.Path(loc, "notes.txt")))
    } finally fs.delete(loc, true)
  }

  test("bucketed aggregation on the bucket key avoids the exchange too") {
    val a = (1 to 500).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    Bucketing.writeBucketed(a, "bkt_agg", buckets = 4, keys = Seq("k"))
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free grouped agg on bucket key, got:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
