package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Synth
import graft.functions.ImageExpressions
import graft.kernels.Imaging

/** SQL surface of the custom Catalyst expressions: registered via
  * ImageExpressions.registerAll (same factories GraftExtensions injects),
  * callable from spark.sql, results identical to the Column API / kernels. */
class FunctionsSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("decode_image / scale_max_pixels / phash64 / img_psnr work from SQL") {
    ImageExpressions.registerAll(spark)
    Synth.imageTable(spark, 12L).createOrReplaceTempView("graft_images")
    val rows = spark.sql(
      """SELECT image_id,
        |  decode_image(bytes) AS img,
        |  phash64(decode_image(bytes)) AS ph,
        |  scale_max_pixels(decode_image(bytes), 1000L).w AS sw,
        |  scale_max_pixels(decode_image(bytes), 1000L).h AS sh,
        |  img_psnr(decode_image(bytes), decode_image(bytes)) AS self_psnr
        |FROM graft_images WHERE fmt = 'png' AND image_id <> 'img_00000001'
        |ORDER BY image_id""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val i = r.getString(0).stripPrefix("img_").toLong
      val srcBytes = Synth.imageRow(42L, i).getAs[Array[Byte]](1)
      val raster = Imaging.decode(srcBytes).get
      assert(r.getLong(r.fieldIndex("ph")) == Imaging.averageHash(raster))
      val scaled = Imaging.maxPixelsScaling(raster, 1000L)
      assert(r.getInt(r.fieldIndex("sw")) == scaled.w)
      assert(r.getInt(r.fieldIndex("sh")) == scaled.h)
      assert(r.getDouble(r.fieldIndex("self_psnr")).isPosInfinity)
    }
    // corrupt bytes → NULL through SQL too
    val nulls = spark.sql(
      "SELECT decode_image(bytes) FROM graft_images WHERE image_id = 'img_00000001'")
      .collect()
    assert(nulls.length == 1 && nulls.head.isNullAt(0))
  }
}
