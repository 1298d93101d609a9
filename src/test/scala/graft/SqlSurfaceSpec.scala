package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-first usage path: register the tables and run plain Spark SQL,
  * matching the DataFrame formulations (a reference user who writes SQL,
  * not Scala, gets the same engine).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sf)
    Tables.names.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) > 0, t)
    }
  }

  test("SQL formulations agree with the DataFrame queries") {
    Tables.registerAll(spark, sf)
    val sqlQ1 = spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val dfQ1 = SparkEntry.queries("s5_partitioned_sink")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlQ1 == dfQ1)
    val sqlArgmax = spark.sql(
      """SELECT l_orderkey, max_by(l_partkey, struct(l_extendedprice, l_partkey)) AS best_pk
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dfArgmax = SparkEntry.queries("a2_argmax")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlArgmax == dfArgmax)
  }

  test("custom cosine_sim composes with built-ins in SQL") {
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT a.vec_id, max(cosine_sim(a.embedding, b.embedding)) AS best
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 3 GROUP BY a.vec_id ORDER BY a.vec_id""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => math.abs(r.getDouble(1)) <= 1.0))
  }
}
