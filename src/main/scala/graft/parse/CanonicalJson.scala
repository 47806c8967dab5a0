package graft.parse

import graft.model.Canonical._
import graft.util.Json
import graft.util.Json._

/** Shared canonical-JSON serializers for the region/para/line/token
  * tree produced by [[Alto.parsePrintSpace]] — one definition for the
  * importers that emit the plain shape (BL, SWA, ONB, BNF-EN, KB).
  * Importers with format-specific extras (Olive style refs/glue flags,
  * Lux/RERO/BNF style galleries) keep their own variants.
  */
object CanonicalJson {

  def tokenJson(t: CToken): JValue =
    JObj(Seq("c" -> Json.ints(t.c)) ++
      t.tx.map(v => "tx" -> (JStr(v): JValue)) ++
      t.hy.map(v => "hy" -> (JBool(v): JValue)) ++
      t.nf.map(v => "nf" -> (JStr(v): JValue)))

  def regionJson(r: CRegion): JValue =
    JObj(Seq("c" -> Json.ints(r.c)) ++
      r.pOf.map(v => "pOf" -> (JStr(v): JValue)) ++
      Seq("p" -> JArr(r.p.map(pa => JObj(Seq(
        "c" -> Json.ints(pa.c),
        "l" -> JArr(pa.l.map(li => JObj(Seq(
          "c" -> Json.ints(li.c),
          "t" -> JArr(li.t.map(tokenJson))))))))))))
}
