package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Imaging
import graft.sources.Sources

/** Non-parquet sources/sinks (SURVEY §2.1–2.2): folder scan with extension
  * filter, URL-list parsing with id munging, CSV vector dump round-trip. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("readImageFolder: binaryFile scan + extension filter (S1/F1)") {
    val dir = Files.createTempDirectory("graft_imgs")
    val r = Imaging.syntheticRaster(42L, 1L, 32, 32)
    Files.write(dir.resolve("a.png"), Imaging.encodePng(r))
    Files.write(dir.resolve("b.jpg"), Imaging.encodeJpeg(r))
    Files.write(dir.resolve("c.txt"), "not an image".getBytes)
    val got = Sources.readImageFolder(spark, dir.toString)
    val ids = got.select("image_id").as[String].collect().sorted
    assert(ids.sameElements(Array("a.png", "b.jpg")))
    // bytes decode back
    val content = got.where($"image_id" === "a.png").select("content")
      .head().getAs[Array[Byte]](0)
    assert(Imaging.decode(content).get.pixels.sameElements(r.pixels))
  }

  test("readUrlList: '[id] url' lines; bare-url lines id = last path segment (S2)") {
    val f = Files.createTempFile("urls", ".txt")
    Files.write(f, java.util.Arrays.asList(
      "img1 http://host/a.jpg",
      "http://host/path/b.jpg",
      "",
      "img3 http://host/c.jpg extra_video_field"))
    val got = Sources.readUrlList(spark, f.toString)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("img1", "http://host/a.jpg"),
      ("b.jpg", "http://host/path/b.jpg"),
      ("img3", "http://host/c.jpg")))
  }

  test("writeVectorCsv: id,v0,v1,... round-trip incl. gzip (K3/K5)") {
    val df = Seq(("a", Seq(1.0, 2.5)), ("b", Seq(-1.0, 0.0))).toDF("id", "vec")
    val out = Files.createTempDirectory("graft_csv").resolve("dump").toString
    Sources.writeVectorCsv(df, "id", "vec", out, gzip = true)
    val back = spark.read.text(out).as[String].collect().sorted
    assert(back.sameElements(Array("a,1.0,2.5", "b,-1.0,0.0")))
    // gzip actually applied
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".gz")))
  }

  test("writeMapCsv/readMapCsv: key↔value dump round-trip (K4)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_map").resolve("m").toString
    val df = Seq(("img_1", 0L), ("img_2", 1L), ("a,b", 2L), ("50%,x", 3L))
      .toDF("image_id", "iid")
    graft.sources.Sources.writeMapCsv(df, "image_id", "iid", out)
    val back = graft.sources.Sources.readMapCsv(spark, out)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // keys containing the separator (or the escape glyph itself) round-trip
    // via percent-encoding; values are covered by the first-comma split
    assert(back("img_1") == "0" && back("img_2") == "1")
    assert(back("a,b") == "2" && back("50%,x") == "3")
    assert(back.size == 4)
  }

  test("double→float cast preserves vector values to float precision (P23)") {
    import spark.implicits._
    val vs = Seq(Array(1.5, -2.25, 3.0000001), Array(0.0, 1e-30, 1e30))
    val got = vs.map(Tuple1(_)).toDF("vec")
      .select(org.apache.spark.sql.functions.col("vec")
        .cast("array<float>").as("fvec"))
      .collect().map(_.getSeq[Float](0))
    vs.zip(got).foreach { case (d, f) =>
      d.zip(f).foreach { case (dv, fv) => assert(fv == dv.toFloat) }
    }
  }
}
