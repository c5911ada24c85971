package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Deletion-vector codec and storage — the Delta protocol's row-level
  * invalidation mechanism (PROTOCOL.md "Deletion Vectors"): an add action
  * may carry a `deletionVector` descriptor naming a serialized
  * RoaringBitmapArray of 0-based ROW INDEXES that are logically deleted
  * from that parquet file. A DELETE that touches 100 rows of a 1 GB file
  * writes a few-KB bitmap instead of rewriting the gigabyte — at 100 TB
  * that is the difference between row-level deletes being routine and
  * being a table rewrite.
  *
  * Everything here follows public formats:
  *   - Z85 (ZeroMQ RFC 32) for the descriptor's UUID / inline payload
  *     encoding — delta's Base85Codec uses the Z85 character set.
  *   - The portable RoaringBitmapArray: 4-byte LE magic 1681511377,
  *     8-byte LE bitmap count, then each 32-bit roaring bitmap in the
  *     interoperable portable format (RoaringFormatSpec): cookie 12346
  *     (no run containers) or 12347 (+run bitset), descriptive headers
  *     (2-byte key, 2-byte cardinality-1), optional offsets, then
  *     array (<=4096 sorted shorts) / bitmap (1024 LE longs) / run
  *     (nbrruns x (start,length)) containers. A position's value is
  *     `bitmapIndex * 2^32 + bitmapValue`.
  *   - The on-disk DV file: 1 version byte (1), then per stored vector
  *     at its descriptor `offset`: 4-byte BIG-endian data size, the
  *     serialized bitmap data, 4-byte BIG-endian CRC-32 of the data.
  *
  * Decode runs on EXECUTORS (the positions of one file's DV never
  * transit the driver) — see DeltaLog.dvDeletedPositions.
  */
object DeletionVectors {

  /** One add action's `deletionVector` descriptor.
    * storageType: "u" = UUID-named file relative to the table root
    * (pathOrInlineDv = [randomPrefix]z85(uuid), 20 trailing chars),
    * "i" = inline (pathOrInlineDv = z85(serialized bitmap)),
    * "p" = absolute path.
    */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long) {
    /** The protocol's DV identity — what a remove action must match to
      * kill a specific (path, dv) incarnation during log replay.
      */
    def uniqueId: String =
      s"$storageType$pathOrInlineDv${offset.map(o => s"@$o").getOrElse("")}"
  }

  // -------------------------------------------------------------------
  // Z85 (ZeroMQ RFC 32): 4 binary bytes <-> 5 chars, big-endian base-85,
  // most significant character first.
  // -------------------------------------------------------------------
  private val Z85Chars: Array[Char] =
    ("0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
  private val Z85Index: Array[Int] = {
    val idx = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i }
    idx
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val block = new Array[Char](5)
      var k = 4
      while (k >= 0) { block(k) = Z85Chars((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(block)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Index(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      val base = i / 5 * 4
      while (k >= 0) { out(base + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    out
  }

  // -------------------------------------------------------------------
  // Portable RoaringBitmapArray
  // -------------------------------------------------------------------
  private val Magic = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4
  private val ArrayMaxCard = 4096

  /** Serialize sorted, distinct, non-negative positions as a portable
    * RoaringBitmapArray (magic included). Writer always emits
    * no-run-container bitmaps — every reader must accept those.
    */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    require(sorted.isEmpty || sorted.head >= 0, "negative row index")
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    val perBitmap = sorted.groupBy(p => (p >>> 32).toInt)
    val bitmapBytes = (0L until nBitmaps).map { bi =>
      serializeBitmap32(perBitmap.getOrElse(bi.toInt, Array.empty[Long])
        .map(p => (p & 0xffffffffL).toInt))
    }
    val total = 4 + 8 + bitmapBytes.map(_.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(nBitmaps)
    bitmapBytes.foreach(buf.put)
    buf.array()
  }

  /** One 32-bit roaring bitmap, portable format, values as unsigned ints. */
  private def serializeBitmap32(values: Array[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
    val n = byKey.size
    val containers = byKey.map { case (_, vs) =>
      val lows = vs.map(_ & 0xffff).sorted
      if (lows.length <= ArrayMaxCard) {
        val b = ByteBuffer.allocate(lows.length * 2).order(ByteOrder.LITTLE_ENDIAN)
        lows.foreach(v => b.putShort(v.toShort))
        b.array()
      } else {
        val words = new Array[Long](1024)
        lows.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(b.putLong)
        b.array()
      }
    }
    val headerLen = 4 + 4 + 4 * n + 4 * n // cookie, count, headers, offsets
    val buf = ByteBuffer.allocate(headerLen + containers.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(SerialCookieNoRun)
    buf.putInt(n)
    byKey.foreach { case (k, vs) =>
      buf.putShort(k.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    var off = headerLen
    containers.foreach { c => buf.putInt(off); off += c.length }
    containers.foreach(buf.put)
    buf.array()
  }

  /** Deserialize a portable RoaringBitmapArray (magic-prefixed) back to
    * sorted positions. Accepts run, array, and bitmap containers from
    * any spec-conforming writer.
    */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic (want $Magic)")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps < Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var bi = 0L
    while (bi < nBitmaps) {
      deserializeBitmap32(buf).foreach(v => out += (bi << 32) | (v & 0xffffffffL))
      bi += 1
    }
    out.result()
  }

  private def deserializeBitmap32(buf: ByteBuffer): Array[Int] = {
    val cookie = buf.getInt
    val (n, runFlags) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, Some(flags))
      } else {
        require(cookie == SerialCookieNoRun,
          s"bad roaring cookie $cookie (want $SerialCookieNoRun or $SerialCookie)")
        (buf.getInt, None)
      }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    val hasOffsets = runFlags.isEmpty || n >= NoOffsetThreshold
    if (hasOffsets) buf.position(buf.position() + 4 * n)
    val out = Array.newBuilder[Int]
    i = 0
    while (i < n) {
      val hi = keys(i) << 16
      val isRun = runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
      if (isRun) {
        val nRuns = buf.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xffff
          val len = buf.getShort & 0xffff
          var v = start
          while (v <= start + len) { out += (hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= ArrayMaxCard) {
        var c = 0
        while (c < cards(i)) { out += (hi | (buf.getShort & 0xffff)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          var word = buf.getLong
          val base = hi | (w << 6)
          while (word != 0L) {
            out += (base | java.lang.Long.numberOfTrailingZeros(word))
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
    out.result()
  }

  // -------------------------------------------------------------------
  // On-disk DV files and descriptor resolution
  // -------------------------------------------------------------------

  /** Resolve a "u"/"p" descriptor to its on-disk path. For "u" the
    * trailing 20 chars are z85(UUID) and anything before them is an
    * optional directory prefix (object stores use it to spread load
    * across key ranges); the file is `deletion_vector_<uuid>.bin`.
    */
  def dvPath(root: String, d: Descriptor): String = d.storageType match {
    case "p" => d.pathOrInlineDv
    case "u" =>
      val s = d.pathOrInlineDv
      require(s.length >= 20, s"u-storage pathOrInlineDv too short: '$s'")
      val prefix = s.dropRight(20)
      val uuidBytes = z85Decode(s.takeRight(20))
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) graft.table.Fs.resolve(root, name)
      else graft.table.Fs.resolve(graft.table.Fs.resolve(root, prefix), name)
    case other =>
      throw new IllegalArgumentException(s"storageType '$other' has no path")
  }

  /** The deleted row indexes named by `d`, verified (magic + CRC-32 +
    * declared size + declared cardinality). Pure function of descriptor
    * and filesystem — safe to call from executor tasks.
    */
  def readPositions(root: String, d: Descriptor): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        z85Decode(d.pathOrInlineDv).take(d.sizeInBytes)
      case "u" | "p" =>
        val path = dvPath(root, d)
        val all = graft.table.Fs.readBytes(path)
        require(all.nonEmpty && all(0) == 1.toByte,
          s"DV file $path: unsupported format version ${if (all.isEmpty) "<empty>" else all(0)}")
        val off = d.offset.getOrElse(1)
        val bb = ByteBuffer.wrap(all)
        bb.position(off)
        val size = bb.getInt // big-endian
        require(size == d.sizeInBytes,
          s"DV file $path: stored size $size != descriptor sizeInBytes ${d.sizeInBytes}")
        val payload = new Array[Byte](size)
        bb.get(payload)
        val storedCrc = bb.getInt
        val crc = new CRC32
        crc.update(payload)
        require(storedCrc == crc.getValue.toInt,
          s"DV file $path: checksum mismatch")
        payload
      case other =>
        throw new UnsupportedOperationException(s"DV storageType '$other' unsupported")
    }
    val positions = deserialize(data)
    require(positions.length == d.cardinality,
      s"DV cardinality mismatch: descriptor says ${d.cardinality}, bitmap has ${positions.length}")
    positions
  }

  /** Write `positions` as a fresh UUID-named DV file under `root` and
    * return its "u" descriptor. One vector per file at offset 1 — the
    * simplest protocol-legal packing; writers that batch many DVs per
    * file only change `offset`.
    */
  def writeDvFile(root: String, positions: Array[Long]): Descriptor = {
    val data = serialize(positions)
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val enc = z85Encode(bb.array())
    val crc = new CRC32
    crc.update(data)
    val out = ByteBuffer.allocate(1 + 4 + data.length + 4)
    out.put(1.toByte)
    out.putInt(data.length) // big-endian
    out.put(data)
    out.putInt(crc.getValue.toInt) // big-endian
    graft.table.Fs.write(
      graft.table.Fs.resolve(root, s"deletion_vector_$uuid.bin"), out.array())
    Descriptor("u", enc, Some(1), data.length, positions.distinct.length.toLong)
  }

  /** An inline ("i") descriptor for a small DV — the bitmap rides in the
    * log itself, no sidecar file.
    */
  def inlineDescriptor(positions: Array[Long]): Descriptor = {
    val data = serialize(positions)
    val padded =
      if (data.length % 4 == 0) data
      else data ++ new Array[Byte](4 - data.length % 4)
    Descriptor("i", z85Encode(padded), None, data.length,
      positions.distinct.length.toLong)
  }
}
