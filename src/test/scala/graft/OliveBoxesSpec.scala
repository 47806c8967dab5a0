package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.{OliveBoxes, OliveImporter}

/** Olive C8 coordinate-conversion specs: box math, image header
  * parsing, strategies, and the importer enrichment path end-to-end on
  * the GDL sample (tif strategy: 300 dpi source / 144 Olive → 25/12). */
class OliveBoxesSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("computeBox converts x1y1x2y2 to scaled xywh with banker's rounding") {
    // python round() rounds half to even: round(2.5)=2, round(3.5)=4
    assert(OliveBoxes.computeBox(0.5, Seq(5, 7, 10, 20)) == Seq(2, 4, 2, 6))
    assert(OliveBoxes.computeBox(1.0, Seq(10, 20, 30, 50)) == Seq(10, 20, 20, 30))
    assert(OliveBoxes.convertBox(Seq(10, 20, 30, 50), 2.0) == Seq(20, 40, 40, 60))
  }

  test("jpegWidth parses SOF headers; pngSize parses IHDR") {
    // minimal JPEG: SOI, APP0 stub, SOF0 (h=31, w=469), EOI
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = b(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00, // APP0 len 4
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x1F, 0x01, 0xD5, 0x01, 0x00, 0x00, 0x00,
      0xFF, 0xD9)
    assert(OliveBoxes.jpegWidth(jpeg).contains(469))
    assert(OliveBoxes.jpegWidth(b(0x00, 0x01, 0x02, 0x03)).isEmpty)
    val png = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x02, 0x00) // 256 × 512
    assert(OliveBoxes.pngSize(png).contains((256, 512)))
  }

  test("scale strategies: tif from dpi ratio, png_highest, jpg_uniq") {
    val pageXml =
      <XMD-PAGE>
        <Meta PAGE_NO="1" IMAGES_RESOLUTION="144" PAGE_WIDTH="469"/>
        <DataFiles>
          <Files TYPE="PAGE_IMG" PRESENT="1" XRESOLUTION_DPI="300"/>
        </DataFiles>
      </XMD-PAGE>
    assert(OliveBoxes.scaleFactor(pageXml, "tif", "x.tif", _ => None)
      .contains(300.0 / 144))
    // png_highest: filename resolution suffix must equal Olive's
    assert(OliveBoxes.scaleFactor(pageXml, "png_highest", "Pg001_144.png",
      _ => None).contains(1.0))
    assert(OliveBoxes.scaleFactor(pageXml, "png_highest", "Pg001_300.png",
      _ => None).isEmpty)
    assert(OliveBoxes.scaleFactor(pageXml, "png_highest", "nounderscores.png",
      _ => None).isEmpty)
    // jpg_uniq: decoded width must match PAGE_WIDTH (469 here)
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = b(0xFF, 0xD8,
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x1F, 0x01, 0xD5, 0x01, 0x00, 0x00, 0x00)
    assert(OliveBoxes.scaleFactor(pageXml, "jpg_uniq", "p1.jpg",
      _ => Some(jpeg)).contains(1.0))
    // unimplemented / unknown strategies → None (reference parity)
    assert(OliveBoxes.scaleFactor(pageXml, "png_uniq", "x.png", _ => None).isEmpty)
    assert(OliveBoxes.scaleFactor(pageXml, "jpg_highest", "x.jpg", _ => None).isEmpty)
  }

  test("GDL issue with tif image-info: cc=true and coordinates scaled 25/12") {
    val ref = OliveImporter.detectIssues(
      "/root/reference/text_preparation/data/sample_data/Olive")
      .find(_.issueId == "GDL-1900-01-02-a").get
    val plain = OliveImporter.parseIssue(ref, "C", "T")
    val enriched = OliveImporter.parseIssue(ref, "C", "T",
      imageInfo = n => Some(OliveImporter.ImageInfo("tif", s"Pg00$n.tif")),
      readImage = _ => None)
    // pages flip to cc=true with all boxes scaled by 300/144
    val p1plain = mapper.readTree(plain.pageJsons.head._2)
    val p1 = mapper.readTree(enriched.pageJsons.head._2)
    assert(!p1plain.get("cc").asBoolean && p1.get("cc").asBoolean)
    val sf = 300.0 / 144
    val c0 = p1plain.get("r").get(0).get("c")
    val c1 = p1.get("r").get(0).get("c")
    // x1y1x2y2 → scaled xywh
    val exp = OliveBoxes.computeBox(sf, (0 until 4).map(c0.get(_).asInt))
    assert((0 until 4).map(c1.get(_).asInt) == exp)
    // a token box too
    val t0 = p1plain.get("r").get(0).get("p").get(0).get("l").get(0)
      .get("t").get(0).get("c")
    val t1 = p1.get("r").get(0).get("p").get(0).get("l").get(0)
      .get("t").get(0).get("c")
    assert((0 until 4).map(t1.get(_).asInt) ==
      OliveBoxes.computeBox(sf, (0 until 4).map(t0.get(_).asInt)))
    // picture CIs become image CIs with converted coords and cc flag
    val issue = mapper.readTree(enriched.issueJson)
    val cis = (0 until issue.get("i").size).map(issue.get("i").get)
    val plainIssue = mapper.readTree(plain.issueJson)
    val plainCis = (0 until plainIssue.get("i").size).map(plainIssue.get("i").get)
    val pictures = plainCis.filter(_.get("m").get("tp").asText == "picture")
    if (pictures.nonEmpty) {
      val images = cis.filter(_.get("m").get("tp").asText == "image")
      assert(images.size == pictures.size)
      images.foreach { img =>
        assert(img.get("cc").asBoolean)
        assert(img.get("c").size == 4)
      }
    }
    // without enrichment nothing changed
    assert(plainCis.count(_.get("m").get("tp").asText == "image") == 0 ||
      pictures.isEmpty)
  }
}
