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
}
