package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard sink + source — the delivery format
  * large-scale training pipelines consume (one tar per shard, entries
  * iterated sequentially at read time; the WebDataset convention,
  * public). The tar layout here is POSIX ustar written with pinned
  * metadata (mode 0644, uid/gid 0, mtime 0), so a shard is a PURE
  * FUNCTION of its (name, payload) sequence — re-runs produce
  * byte-identical archives and the x13 oracle can hold the round trip
  * to content equality.
  *
  * Scale shape: the sink is ONE seeded-hash shuffle (the x2 shard
  * discipline — no rand(), retry-safe) followed by executor-local
  * streaming writes through the Hadoop FileSystem (works on HDFS/
  * object stores); each task writes the shards it owns entry by entry,
  * never materializing an archive in memory. The source is a
  * `binaryFile` scan fanned out per shard file with a row-local parse
  * — shards are sized to the read budget (the packedPayloads
  * contract), thousands of shards scan in parallel.
  */
object TarShards {

  private val Block = 512

  /** 512-byte ustar header for one entry (deterministic metadata). */
  def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 100, s"tar entry name too long: $name")
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    put(100, "0000644\u0000")               // mode
    put(108, "0000000\u0000")               // uid
    put(116, "0000000\u0000")               // gid
    put(124, f"$size%011o\u0000")           // size, octal
    put(136, "00000000000\u0000")           // mtime 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                            // typeflag: regular file
    put(257, "ustar\u000000")               // magic + version
    var sum = 0
    var i = 0
    while (i < Block) { sum += h(i) & 0xFF; i += 1 }
    put(148, f"$sum%06o\u0000 ")
    h
  }

  private def padding(size: Long): Int =
    ((Block - (size % Block)) % Block).toInt

  /** Parse a ustar archive into (name, bytes) entries. Strict: a
    * malformed header (bad magic/checksum) throws — a corrupt shard
    * must fail loudly, not truncate a training epoch silently. */
  def parse(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var p = 0
    while (p + Block <= bytes.length &&
        !(0 until Block).forall(i => bytes(p + i) == 0)) {
      val magic = new String(bytes, p + 257, 5, "UTF-8")
      require(magic == "ustar", s"bad tar magic at offset $p")
      var stored = 0
      var i = 148
      while (i < 156 && bytes(p + i) != 0 && bytes(p + i) != ' ') {
        stored = stored * 8 + (bytes(p + i) - '0'); i += 1
      }
      var sum = 0
      i = 0
      while (i < Block) {
        sum += (if (i >= 148 && i < 156) ' '.toInt
          else bytes(p + i) & 0xFF)
        i += 1
      }
      require(sum == stored, s"tar checksum mismatch at offset $p")
      var nameLen = 0
      while (nameLen < 100 && bytes(p + nameLen) != 0) nameLen += 1
      val name = new String(bytes, p, nameLen, "UTF-8")
      var size = 0L
      i = 124
      while (i < 136 && bytes(p + i) != 0 && bytes(p + i) != ' ') {
        size = size * 8 + (bytes(p + i) - '0'); i += 1
      }
      require(p + Block + size <= bytes.length,
        s"tar entry '$name' truncated")
      val data = java.util.Arrays.copyOfRange(bytes,
        p + Block, p + Block + size.toInt)
      out += ((name, data))
      p += Block + size.toInt + padding(size)
    }
    out.result()
  }

  /** Write `df`'s (`nameCol`: string, `payloadCol`: binary) rows as
    * `nShards` tar shards under `outDir` (`shard-NNNNN.tar`), sharded
    * and ordered by the seeded hash of the name (deterministic,
    * retry-safe). One shuffle; each task streams the shards it owns
    * through the Hadoop FileSystem — no archive buffering. */
  def write(df: DataFrame, nameCol: String, payloadCol: String,
      outDir: String, nShards: Int, seed: String = "tar"): Unit = {
    val h = graft.operators.Curation.seededHash(seed, col(nameCol))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(nameCol).cast("string").as("name"),
        col(payloadCol).cast("binary").as("payload"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("name"))
      .queryExecution.toRdd.mapPartitions { rows =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(outDir), conf.value)
        var cur = -1
        var out: java.io.OutputStream = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)) // end-of-archive
          out.close(); out = null
        }
        rows.foreach { r =>
          val name = r.getUTF8String(0).toString
          val payload = r.getBinary(1)
          val shard = r.getInt(3)
          if (shard != cur) {
            close(); cur = shard
            out = fs.create(new org.apache.hadoop.fs.Path(
              outDir, f"shard-$shard%05d.tar"), true)
          }
          out.write(header(name, payload.length.toLong))
          out.write(payload)
          out.write(new Array[Byte](padding(payload.length.toLong)))
        }
        close()
        Iterator.empty
      }.count(): Unit
  }

  /** Read tar shards back as (shard, name, bytes) — a `binaryFile`
    * scan (one row per shard file, fanned out across tasks) with a
    * row-local parse. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
          .map(_.group(1).toInt).getOrElse(-1)
        parse(bytes).map { case (n, b) => (shard, n, b) }
      }
      .toDF("shard", "name", "bytes")
  }
}
