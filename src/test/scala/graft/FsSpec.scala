package graft

import org.scalatest.funsuite.AnyFunSuite

class FsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("resolveGlob expands to literal files; metachar-bearing names reject (fail closed)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.bin").toPath, Array[Byte](1))
    java.nio.file.Files.write(new java.io.File(dir, "b.bin").toPath, Array[Byte](2))
    val found = graft.operators.Fs.resolveGlob(spark, dir.getAbsolutePath + "/*.bin")
    assert(found.map(_.split('/').last).sorted == Seq("a.bin", "b.bin"))
    // no matches -> Nil, not a throw (the callers' empty-frame contract)
    assert(graft.operators.Fs.resolveGlob(spark, dir.getAbsolutePath + "/*.shp").isEmpty)
    // a resolved name spark.read would re-glob (measured: '[2020]' parses
    // as a character class and silently matches a DIFFERENT file; no
    // escaping survives Spark's own path qualification) must reject
    java.nio.file.Files.write(new java.io.File(dir, "grid[2020].bin").toPath, Array[Byte](3))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Fs.resolveGlob(spark, dir.getAbsolutePath + "/*.bin")
    }
    assert(e.getMessage.contains("glob metacharacters"), e.getMessage)
  }
}
