package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real, pure-JVM image codec for the multimodal operators (replaces the
  * round-5 stub for the image kind; WAV audio is real too via
  * [[AudioCodec]]; video and compressed audio stay stubbed — no codec
  * libraries in this environment, and none in the reference either: its
  * only image work is scale-factor arithmetic, olive/helpers.py:478-599,
  * covered by [[graft.parse.OliveBoxes]]).
  *
  * Decode dispatches on magic bytes, not on a caller-supplied kind
  * column, so a mislabeled or corrupt payload degrades to the stub path
  * instead of throwing mid-task — at 100 TB some payloads WILL be
  * garbage and a single bad blob must not kill a 10k-task stage.
  *
  * Everything here is row-local (called from `mapPartitions`): decode,
  * scale, and re-encode stay inside one task, no shuffle, memory bounded
  * by one decoded frame (`w*h*3` bytes).
  */
object ImageCodec {

  // javax.imageio defaults to a disk-backed stream cache; keep codec
  // work purely in-memory on executors.
  ImageIO.setUseCache(false)

  /** Deterministic synthetic dimensions for media id `id` — the oracle
    * recomputes these arithmetically in DuckDB, so a green m1 proves the
    * decoder recovered them from the actual PNG/JPEG bytes. */
  def syntheticDims(id: Long): (Int, Int) =
    ((id % 57).toInt + 8, (id % 43).toInt + 8)

  /** Integer aspect-fit of (w, h) into (tw, th): scale = min(tw/w, th/h)
    * with pure integer arithmetic (no float rounding to diverge between
    * engines). DuckDB mirror: CASE WHEN w*th >= h*tw THEN tw ELSE
    * w*th//h END etc. */
  def fitDims(w: Int, h: Int, tw: Int, th: Int): (Int, Int) =
    if (w.toLong * th >= h.toLong * tw) (tw, (h.toLong * tw / w).toInt)
    else ((w.toLong * th / h).toInt, th)

  /** Deterministic pixel fill so encoded bytes are stable run-to-run
    * (PNG losslessly round-trips them; JPEG only needs stable dims). */
  private def render(id: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (id * 31 + x * 7 + y * 13) & 0xFF
        img.setRGB(x, y, (v << 16 | ((x * 5) & 0xFF) << 8 | ((y * 3) & 0xFF)).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def write(img: BufferedImage, fmt: String): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  /** Encode a synthetic image for `id`: PNG for even ids, JPEG for odd —
    * both container formats exercised through the same decode path. */
  def encodeSynthetic(id: Long): Array[Byte] = {
    val (w, h) = syntheticDims(id)
    write(render(id, w, h), if (id % 2 == 0) "png" else "jpg")
  }

  private val PngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47)

  /** Container format from magic bytes; None when not an image we read. */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 4 && bytes.take(4).sameElements(PngMagic))
      Some("image/png")
    else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF)
      Some("image/jpeg")
    else None

  /** Single full parse of the payload: (container format, decoded
    * image) — the one `ImageIO.read` both [[decode]] and [[resize]]
    * share (an earlier cut parsed the payload twice on the resize
    * path; at a 100 TB image pass that is 2× the decode CPU, the
    * dominant cost). None for non-image or corrupt payloads. */
  def decodeImage(bytes: Array[Byte]): Option[(String, BufferedImage)] =
    sniff(bytes).flatMap { fmt =>
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) None else Some((fmt, img))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Real decode: (format, width, height) — None for non-image or
    * corrupt payloads (callers fall back to the stub path). */
  def decode(bytes: Array[Byte]): Option[(String, Int, Int)] =
    decodeImage(bytes).map { case (fmt, img) =>
      (fmt, img.getWidth, img.getHeight)
    }

  /** Per-channel pixel sums of a decoded image — the real
    * feature-extraction primitive (mean color = sum / (w·h)). One pass
    * over the raster, row-local. For the synthetic PNG corpus the
    * sums are arithmetically predictable from the render formula, so
    * the m5 oracle proves the decoder really parsed pixel data (the
    * m1/m4 trick, but for pixel CONTENT rather than dimensions). */
  def channelSums(img: BufferedImage): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        r += (rgb >> 16) & 0xFF
        g += (rgb >> 8) & 0xFF
        b += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    (r, g, b)
  }

  /** Integer ITU-R 601 luminance of one pixel: (299r + 587g + 114b) /
    * 1000, exact in integers. For greyscale pixels (r = g = b = v) the
    * weights sum to 1000, so lum == v — which is what lets the m8
    * oracle predict grid luminances of the synthetic variants from the
    * render formula alone. */
  def luminance(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
    val b = rgb & 0xFF
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** 64-bit difference hash (dHash, standard perceptual hash): sample
    * a 9×8 luminance grid at x_i = i·w/9, y_j = j·h/8 (integer
    * division — SAMPLED grid, not box-averaged, so any engine can
    * replay it with 72 pixel reads per image), set bit j·8+i when the
    * right neighbor is strictly brighter. Robust to re-encode and
    * uniform brightness shifts; a local edit perturbs only the bit
    * rows of the touched region. */
  def dHash64(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    var hash = 0L
    var j = 0
    while (j < 8) {
      val y = j * h / 8
      var prev = luminance(img.getRGB(0, y))
      var i = 0
      while (i < 8) {
        val next = luminance(img.getRGB((i + 1) * w / 9, y))
        if (next > prev) hash |= 1L << (j * 8 + i)
        prev = next
        i += 1
      }
      j += 1
    }
    hash
  }

  /** Deterministic dims for the near-dup variant family: derived from
    * the GROUP id, so all variants of a group share geometry. */
  def variantDims(gid: Long): (Int, Int) =
    ((gid % 57).toInt + 8, (gid % 43).toInt + 8)

  /** Greyscale value at (x, y) for variant `variant` of group `gid`:
    * a gid-keyed base pattern (the x·y cross term makes adjacent-pixel
    * DIFFERENCES gid-dependent, so unrelated groups hash apart) plus a
    * variant perturbation confined to the top two pixel rows — the
    * localized-edit shape dHash banding is built for: variants differ
    * only in bit rows 0-1, i.e. inside band 0 of 4. */
  def variantLum(gid: Long, variant: Long, x: Int, y: Int): Int =
    ((gid * 31 + x * 7 + y * 13 + x * y * (gid % 11) +
      (if (y < 2) variant * 37 * x else 0L)) & 0xFF).toInt

  /** Encode one member of the near-dup variant family as a REAL PNG
    * (lossless — the decoded raster must round-trip the formula). */
  def encodeSyntheticVariant(id: Long): Array[Byte] = {
    val gid = id / 9; val variant = id % 9
    val (w, h) = variantDims(gid)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = variantLum(gid, variant, x, y)
        img.setRGB(x, y, v << 16 | v << 8 | v)
        x += 1
      }
      y += 1
    }
    write(img, "png")
  }

  /** Real aspect-fit resize: one decode → Graphics2D scale → re-encode
    * PNG. Returns None when the payload isn't a decodable image or the
    * re-encode fails — degrade-to-None, never throw (one corrupt blob
    * must not fail a task). A hostile payload can decode with a
    * degenerate aspect ratio (say 1×1000) whose integer fit is 0 wide,
    * so the fit is clamped to ≥1 px before the target image exists;
    * the corpus can't hit the clamp (dims ≥8), so the m4 oracle's
    * un-clamped CASE mirror of [[fitDims]] is unaffected. */
  def resize(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] =
    decodeImage(bytes).flatMap { case (_, src) =>
      try {
        val (fw, fh) = fitDims(src.getWidth, src.getHeight, tw, th)
        val (ow, oh) = (math.max(fw, 1), math.max(fh, 1))
        val out = new BufferedImage(ow, oh, BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics()
        try g.drawImage(src, 0, 0, ow, oh, null) finally g.dispose()
        Some(write(out, "png"))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
}
