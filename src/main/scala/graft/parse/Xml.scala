package graft.parse

import scala.xml.{Elem, XML}

import graft.util.FsWalk

/** XML loading through the Hadoop FileSystem API, so importer parse
  * stages read issue trees from whatever store holds them (local disk
  * in tests, HDFS/object stores at deployment) — the read-side
  * counterpart of [[graft.util.FsWalk]]'s listings. Encoding is
  * detected from the XML declaration exactly as with file loading. */
object Xml {
  def load(path: String): Elem = {
    val in = FsWalk.open(path)
    try XML.load(in) finally in.close()
  }
}
