package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coordinate geometry for OCR bounding boxes (SURVEY.md §2.7 C4–C7).
  *
  * All functions are pure Column expressions over `[x, y, w, h]` int
  * arrays — codegen'd, no UDFs. Conversions mirror the reference:
  * utils.py:256-285 (xywh↔xyxy), lux/helpers.py:13-39 (resolution/254),
  * rero/classes.py:37-59 (page-width factor), swissinfo/helpers.py:118-131
  * (enclosing box).
  */
object Geometry {

  /** `[x,y,w,h]` → `[x1,y1,x2,y2]` (utils.py coords_to_xy). */
  def xywhToXyxy(c: Column): Column =
    array(element_at(c, 1), element_at(c, 2),
      element_at(c, 1) + element_at(c, 3),
      element_at(c, 2) + element_at(c, 4))

  /** `[x1,y1,x2,y2]` → `[x,y,w,h]` (utils.py coords_to_xywh). */
  def xyxyToXywh(c: Column): Column =
    array(element_at(c, 1), element_at(c, 2),
      element_at(c, 3) - element_at(c, 1),
      element_at(c, 4) - element_at(c, 2))

  /** Rescale by a rational factor with truncation toward zero — the Lux
    * resolution conversion shape (lux/helpers.py:13-39: v·(res/254)). */
  def rescale(c: Column, num: Column, denom: Column): Column =
    transform(c, v => (v.cast("double") * num / denom).cast("int"))

  /** Box area. */
  def area(c: Column): Column = element_at(c, 3) * element_at(c, 4)

  /** Enclosing bounding box of an array of `[x,y,w,h]` boxes
    * (swissinfo/helpers.py:118-131 compute_agg_coords). Null for empty. */
  def enclosingBox(boxes: Column): Column = {
    val x1 = array_min(transform(boxes, b => element_at(b, 1)))
    val y1 = array_min(transform(boxes, b => element_at(b, 2)))
    val x2 = array_max(transform(boxes, b => element_at(b, 1) + element_at(b, 3)))
    val y2 = array_max(transform(boxes, b => element_at(b, 2) + element_at(b, 4)))
    when(size(boxes) > 0, array(x1, y1, x2 - x1, y2 - y1))
  }

  /** Intersection-over-union of two `[x,y,w,h]` boxes, as double. */
  def iou(a: Column, b: Column): Column = {
    val ix1 = greatest(element_at(a, 1), element_at(b, 1))
    val iy1 = greatest(element_at(a, 2), element_at(b, 2))
    val ix2 = least(element_at(a, 1) + element_at(a, 3),
      element_at(b, 1) + element_at(b, 3))
    val iy2 = least(element_at(a, 2) + element_at(a, 4),
      element_at(b, 2) + element_at(b, 4))
    val iw = greatest(ix2 - ix1, lit(0))
    val ih = greatest(iy2 - iy1, lit(0))
    val inter = (iw * ih).cast("double")
    inter / (area(a) + area(b) - inter)
  }
}
