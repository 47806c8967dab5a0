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

  private val ManifestName = "_MANIFEST"

  /** Write `df`'s (`nameCol`: string, `payloadCol`: binary) rows as
    * `nShards` tar shards under `outDir` (`shard-NNNNN.tar`), sharded
    * and ordered by the seeded hash of the name (deterministic,
    * retry-safe). One shuffle; each task streams the shards it owns
    * through the Hadoop FileSystem — no archive buffering.
    *
    * Commit protocol (a failed job must never leave a
    * complete-LOOKING shard set): each task streams its shards to a
    * task-attempt-scoped temp path under `_tmp/` and renames each
    * into place only after its end-of-archive blocks are written —
    * concurrent attempts of the same task (speculation, retry after a
    * lost executor) write disjoint temp files, and because a shard is
    * a pure function of its (name, payload) sequence a losing
    * attempt's rename-target-exists is benign (the bytes are
    * identical; the loser deletes its temp copy). The driver then
    * writes a `_MANIFEST` (shard file name + byte size per line)
    * ONLY after the job action completes — [[read]] REQUIRES the
    * manifest and verifies every listed shard's size, so a partial
    * write (job died mid-flight) or a torn later overwrite is an
    * error at read time, never a silently truncated epoch. */
  def write(df: DataFrame, nameCol: String, payloadCol: String,
      outDir: String, nShards: Int, seed: String = "tar"): Unit = {
    val h = graft.operators.Curation.seededHash(seed, col(nameCol))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val fsD = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), conf.value)
    val outP = new org.apache.hadoop.fs.Path(outDir)
    // overwrite semantics: a stale manifest must vanish BEFORE any
    // new shard lands (readers racing a rewrite fail loudly instead
    // of mixing epochs), and stale shards/temps go with it
    if (fsD.exists(outP)) {
      fsD.delete(new org.apache.hadoop.fs.Path(outP, ManifestName), false)
      fsD.delete(new org.apache.hadoop.fs.Path(outP, "_tmp"), true)
      fsD.globStatus(new org.apache.hadoop.fs.Path(outP, "shard-*.tar"))
        .foreach(s => fsD.delete(s.getPath, false))
    }
    df.select(col(nameCol).cast("string").as("name"),
        col(payloadCol).cast("binary").as("payload"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("name"))
      .queryExecution.toRdd.mapPartitions { rows =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(outDir), conf.value)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var cur = -1
        var out: java.io.OutputStream = null
        def tmpPath(shard: Int) = new org.apache.hadoop.fs.Path(
          outDir, f"_tmp/shard-$shard%05d.tar.$attempt")
        def finalPath(shard: Int) = new org.apache.hadoop.fs.Path(
          outDir, f"shard-$shard%05d.tar")
        def commit(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)) // end-of-archive
          out.close(); out = null
          if (!fs.rename(tmpPath(cur), finalPath(cur))) {
            // lost the rename race to a twin attempt: its bytes are
            // identical by construction, so just drop our copy
            require(fs.exists(finalPath(cur)),
              s"tar shard commit failed for shard $cur")
            fs.delete(tmpPath(cur), false)
          }
        }
        rows.foreach { r =>
          val name = r.getUTF8String(0).toString
          val payload = r.getBinary(1)
          val shard = r.getInt(3)
          if (shard != cur) {
            commit(); cur = shard
            out = fs.create(tmpPath(shard), true)
          }
          out.write(header(name, payload.length.toLong))
          out.write(payload)
          out.write(new Array[Byte](padding(payload.length.toLong)))
        }
        commit()
        Iterator.empty
      }.count(): Unit
    // all tasks committed -> publish the manifest (the read gate)
    fsD.delete(new org.apache.hadoop.fs.Path(outP, "_tmp"), true)
    val shards = fsD.globStatus(
      new org.apache.hadoop.fs.Path(outP, "shard-*.tar"))
      .map(s => s"${s.getPath.getName}\t${s.getLen}")
      .sorted
    val m = fsD.create(
      new org.apache.hadoop.fs.Path(outP, ManifestName), true)
    m.write((shards.mkString("\n") + "\n").getBytes("UTF-8"))
    m.close()
  }

  /** Read tar shards back as (shard, name, bytes) — a `binaryFile`
    * scan (one row per shard file, fanned out across tasks) with a
    * row-local parse. Requires the [[write]]-published `_MANIFEST`
    * and verifies each listed shard's byte size before scanning; a
    * directory without one is an aborted or in-flight write and is
    * refused. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(dir, ManifestName)
    require(fs.exists(mPath),
      s"$dir has no $ManifestName — aborted/in-flight tar shard " +
        "write, refusing to read a possibly-partial shard set")
    val manifest = {
      val in = fs.open(mPath)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).map { line =>
          val Array(name, size) = line.split("\t")
          name -> size.toLong
        }.toSeq
      finally in.close()
    }
    val paths = manifest.map { case (name, size) =>
      val p = new org.apache.hadoop.fs.Path(dir, name)
      require(fs.exists(p) && fs.getFileStatus(p).getLen == size,
        s"tar shard $name missing or size-mismatched vs manifest — " +
          "shard set is torn")
      p.toString
    }
    if (paths.isEmpty)
      return spark.emptyDataset[(Int, String, Array[Byte])]
        .toDF("shard", "name", "bytes")
    spark.read.format("binaryFile").load(paths: _*)
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
