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

  test("st_bbox_intersects join is rewritten to a binned equi-join (no cartesian)") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    Tables.registerAll(spark, sf)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW sb AS
        |SELECT s_suppkey, named_struct(
        |  'xmin', CAST(s_suppkey % 97 AS DOUBLE), 'ymin', CAST(s_suppkey % 89 AS DOUBLE),
        |  'xmax', CAST(s_suppkey % 97 + 1 + s_suppkey % 5 AS DOUBLE),
        |  'ymax', CAST(s_suppkey % 89 + 1 + s_suppkey % 7 AS DOUBLE)) AS env
        |FROM supplier""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW cb AS
        |SELECT c_custkey, named_struct(
        |  'xmin', CAST(c_custkey % 97 AS DOUBLE), 'ymin', CAST(c_custkey % 89 AS DOUBLE),
        |  'xmax', CAST(c_custkey % 97 + 1 + c_custkey % 5 AS DOUBLE),
        |  'ymax', CAST(c_custkey % 89 + 1 + c_custkey % 7 AS DOUBLE)) AS env
        |FROM customer""".stripMargin)
    val q = spark.sql(
      """SELECT s_suppkey, c_custkey FROM sb JOIN cb ON st_bbox_intersects(sb.env, cb.env)
        |ORDER BY s_suppkey, c_custkey""".stripMargin)
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
      plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "spatial join must plan as the binned equi-join")
    // same pairs as the DataFrame operator (j11 formulation)
    val viaSql = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = SparkEntry.queries("j11_bbox_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
    assert(viaSql.nonEmpty)
  }

  test("SQL filter-refine: st_bbox_intersects AND st_contains_point rewrites, equals j17 (r13)") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    Tables.registerAll(spark, sf)
    // the j17 fixtures spelled in pure SQL: arrow polygons (rings + their
    // envelope) vs customer probe points; the refine predicate rides as an
    // EXTRA conjunct on the spatial join — SpatialJoinRewrite must fold it
    // into the binned equi-join's condition, never fall back to a cartesian
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW poly_sql AS
        |SELECT s_suppkey, r AS rings, named_struct(
        |    'xmin', CAST(s_suppkey % 90 AS DOUBLE),
        |    'ymin', CAST(s_suppkey % 80 AS DOUBLE),
        |    'xmax', CAST(s_suppkey % 90 AS DOUBLE) + CAST(s_suppkey % 5 + 4 AS DOUBLE),
        |    'ymax', CAST(s_suppkey % 80 AS DOUBLE) + CAST(s_suppkey % 7 + 4 AS DOUBLE)) AS env
        |FROM (SELECT s_suppkey, st_rings(concat(
        |  'POLYGON ((',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + CAST(s_suppkey % 5 + 4 AS DOUBLE) AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + CAST(s_suppkey % 5 + 4 AS DOUBLE) AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + CAST(s_suppkey % 7 + 4 AS DOUBLE) AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + CAST(s_suppkey % 5 + 4 AS DOUBLE) / 2 AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + CAST(s_suppkey % 7 + 4 AS DOUBLE) / 2 AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + CAST(s_suppkey % 7 + 4 AS DOUBLE) AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) AS STRING),
        |  '), (',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + 0.5 AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + 0.5 AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + 0.5 AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + 1.5 AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + 1.5 AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + 1.5 AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + 1.5 AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + 0.5 AS STRING), ', ',
        |    CAST(CAST(s_suppkey % 90 AS DOUBLE) + 0.5 AS STRING), ' ',
        |    CAST(CAST(s_suppkey % 80 AS DOUBLE) + 0.5 AS STRING),
        |  '))')) AS r FROM supplier)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW pts_sql AS
        |SELECT c_custkey,
        |  CAST(c_custkey % 93 AS DOUBLE) + CAST(c_custkey % 3 AS DOUBLE) * 0.5 AS px,
        |  CAST(c_custkey % 83 AS DOUBLE) + CAST(c_custkey % 7 AS DOUBLE) * 0.25 AS py
        |FROM customer""".stripMargin)
    val q = spark.sql(
      """SELECT s_suppkey, c_custkey FROM poly_sql JOIN pts_sql
        |  ON st_bbox_intersects(poly_sql.env,
        |       named_struct('xmin', px, 'ymin', py, 'xmax', px, 'ymax', py))
        | AND st_contains_point(rings, px, py)
        |ORDER BY s_suppkey, c_custkey""".stripMargin)
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
      plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "refined spatial join must still plan as the binned equi-join")
    val viaSql = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = SparkEntry.queries("j17_refine_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("st_bbox_intersects still evaluates as a plain predicate (non-join use)") {
    val got = spark.sql(
      """SELECT st_bbox_intersects(
        |  named_struct('xmin', 0.0D, 'ymin', 0.0D, 'xmax', 2.0D, 'ymax', 2.0D),
        |  named_struct('xmin', 2.0D, 'ymin', 2.0D, 'xmax', 4.0D, 'ymax', 4.0D)) AS touch,
        |  st_bbox_intersects(
        |  named_struct('xmin', 0.0D, 'ymin', 0.0D, 'xmax', 2.0D, 'ymax', 2.0D),
        |  named_struct('xmin', 2.5D, 'ymin', 0.0D, 'xmax', 4.0D, 'ymax', 2.0D)) AS apart""".stripMargin)
      .collect()(0)
    assert(got.getBoolean(0) && !got.getBoolean(1))
  }

  test("composed TextOps functions are callable from SQL and match the DataFrame surface") {
    import graft.functions.TextOps
    import org.apache.spark.sql.functions._
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_count(text) AS n, round(graft_quality(text), 6) AS q,
        |  graft_langid(text) AS lg, graft_fingerprint(text) AS fp,
        |  graft_simhash(text) AS sh, graft_rolling_fp(text) AS rf
        |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin).collect().toSeq
    val viaDf = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"),
        round(TextOps.qualityScore(col("text")), 6).as("q"),
        TextOps.langGuess(col("text")).as("lg"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.simhash16(col("text")).as("sh"),
        TextOps.rollingFingerprint(col("text")).as("rf"))
      .orderBy("doc_id").limit(50).collect().toSeq
    assert(viaSql == viaDf)
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

  test("st_rings / st_contains_point / st_rings_intersect are callable from SQL (r13)") {
    val arrow = "POLYGON ((0 0, 4 0, 4 4, 2 2, 0 4, 0 0), " +
      "(0.5 0.5, 0.5 1.5, 1.5 1.5, 1.5 0.5, 0.5 0.5))"
    val r = spark.sql(
      s"""SELECT st_contains_point(st_rings('$arrow'), 3.0d, 0.5d) AS interior,
         |  st_contains_point(st_rings('$arrow'), 1.0d, 1.0d) AS in_hole,
         |  st_contains_point(st_rings('$arrow'), 2.0d, 3.0d) AS in_notch,
         |  st_rings_intersect(st_rings('$arrow'),
         |    st_rings('POLYGON ((3 0.5, 3.5 1, 3 1.5, 2.5 1, 3 0.5))')) AS ovl,
         |  st_rings_intersect(st_rings('$arrow'),
         |    st_rings('POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))')) AS disj
         |""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    // ellipsoidal measures ride the same catalog
    val zone = spark.sql(
      "SELECT graft_ell_area('POLYGON ((10 40, 11 40, 11 41, 10 41, 10 40))') AS a, " +
        "graft_ell_perimeter('POLYGON ((10 40, 11 40, 11 41, 10 41, 10 40))') AS p").head()
    assert(zone.getDouble(0) > 9.3e9 && zone.getDouble(0) < 9.7e9) // ~0.94e10 m2
    assert(zone.getDouble(1) > 3.9e5 && zone.getDouble(1) < 4.1e5)
  }
}
