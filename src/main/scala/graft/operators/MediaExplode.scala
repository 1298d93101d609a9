package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StructField, StructType}

/** The one pass-through-explode scaffold every per-file codec surface
  * shares (jpegToPixels, pngToPixels, wavToSamples, tiffToBandBlocks,
  * gifToFrames, tarToFiles, …): keep every column except the payload,
  * decode each file into per-row suffixes, emit pass ++ suffix. The
  * generator shape — flatMap, zero shuffle, one task per FILE — is the
  * 100 TB contract: corpora parallelize by file, decode scales with
  * executor count, nothing touches the driver.
  */
private[operators] object MediaExplode {

  /** `rowsOf(payload)` yields each output row's SUFFIX values (matching
    * `extra`'s fields, in order); pass-through columns are prepended.
    */
  def explode(media: DataFrame, bytesCol: String, extra: Seq[StructField])(
      rowsOf: Array[Byte] => Iterator[Seq[Any]]): DataFrame = {
    val spark = media.sparkSession
    val passFields = media.schema.fields.filterNot(_.name == bytesCol)
    val clash = extra.map(_.name).toSet.intersect(passFields.map(_.name).toSet)
    require(clash.isEmpty,
      s"pass-through columns collide with emitted columns: ${clash.mkString(", ")}")
    val passIdx = passFields.map(f => media.schema.fieldIndex(f.name))
    val bytesIdx = media.schema.fieldIndex(bytesCol)
    val outSchema = StructType(passFields.toSeq ++ extra)
    val rdd = media.rdd.flatMap { r =>
      val pass = passIdx.map(r.get).toSeq
      rowsOf(r.getAs[Array[Byte]](bytesIdx)).map(sfx => Row.fromSeq(pass ++ sfx))
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
