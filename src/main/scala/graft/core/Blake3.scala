package graft.core

/** BLAKE3 (hash mode only) from the public spec, full chunk/tree chaining so
  * inputs > 1 KiB hash correctly — matches the reference's `blake3::hash`
  * (reference src/hasher/mod.rs:37-47).
  */
object Blake3 {

  private val IV: Array[Int] = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19
  )
  private val PERM: Array[Int] =
    Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

  private final val ChunkStart = 1
  private final val ChunkEnd = 2
  private final val Parent = 4
  private final val Root = 8

  private final val BlockLen = 64
  private final val ChunkLen = 1024

  private def rotr(x: Int, n: Int): Int = (x >>> n) | (x << (32 - n))

  private def g(s: Array[Int], a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
    s(a) = s(a) + s(b) + mx
    s(d) = rotr(s(d) ^ s(a), 16)
    s(c) = s(c) + s(d)
    s(b) = rotr(s(b) ^ s(c), 12)
    s(a) = s(a) + s(b) + my
    s(d) = rotr(s(d) ^ s(a), 8)
    s(c) = s(c) + s(d)
    s(b) = rotr(s(b) ^ s(c), 7)
  }

  /** Core compression; returns the full 16-word state (callers take what
    * they need: first 8 words = chaining value).
    */
  private def compress(
      cv: Array[Int], block: Array[Int], counter: Long, blockLen: Int, flags: Int
  ): Array[Int] = {
    val s = new Array[Int](16)
    System.arraycopy(cv, 0, s, 0, 8)
    System.arraycopy(IV, 0, s, 8, 4)
    s(12) = counter.toInt
    s(13) = (counter >>> 32).toInt
    s(14) = blockLen
    s(15) = flags
    var m = block
    var round = 0
    while (round < 7) {
      g(s, 0, 4, 8, 12, m(0), m(1))
      g(s, 1, 5, 9, 13, m(2), m(3))
      g(s, 2, 6, 10, 14, m(4), m(5))
      g(s, 3, 7, 11, 15, m(6), m(7))
      g(s, 0, 5, 10, 15, m(8), m(9))
      g(s, 1, 6, 11, 12, m(10), m(11))
      g(s, 2, 7, 8, 13, m(12), m(13))
      g(s, 3, 4, 9, 14, m(14), m(15))
      if (round < 6) {
        val nm = new Array[Int](16)
        var i = 0
        while (i < 16) { nm(i) = m(PERM(i)); i += 1 }
        m = nm
      }
      round += 1
    }
    var i = 0
    while (i < 8) {
      s(i) ^= s(i + 8)
      s(i + 8) ^= cv(i)
      i += 1
    }
    s
  }

  private def wordsOf(bytes: Array[Byte], off: Int, len: Int): Array[Int] = {
    val w = new Array[Int](16)
    var i = 0
    while (i < len) {
      w(i / 4) |= (bytes(off + i) & 0xff) << (8 * (i % 4))
      i += 1
    }
    w
  }

  /** A pending final compression — lets the ROOT flag be applied only at the
    * very top of the tree (per spec §2.6).
    */
  private final case class Output(
      cv: Array[Int], block: Array[Int], counter: Long, blockLen: Int, flags: Int
  ) {
    def chainingValue: Array[Int] =
      compress(cv, block, counter, blockLen, flags).take(8)
    def rootBytes: Array[Byte] = {
      val s = compress(cv, block, 0L, blockLen, flags | Root)
      val out = new Array[Byte](32)
      var i = 0
      while (i < 32) {
        out(i) = ((s(i / 4) >>> (8 * (i % 4))) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  /** Compress one ≤1024-byte chunk into its pending output. */
  private def chunkOutput(input: Array[Byte], off: Int, len: Int, chunkIdx: Long): Output = {
    var cv = IV
    val nBlocks = math.max(1, (len + BlockLen - 1) / BlockLen)
    var b = 0
    var out: Output = null
    while (b < nBlocks) {
      val blockOff = b * BlockLen
      val blockLen = math.min(BlockLen, len - blockOff)
      var flags = 0
      if (b == 0) flags |= ChunkStart
      if (b == nBlocks - 1) flags |= ChunkEnd
      val words = wordsOf(input, off + blockOff, blockLen)
      if (b == nBlocks - 1) out = Output(cv, words, chunkIdx, blockLen, flags)
      else cv = compress(cv, words, chunkIdx, blockLen, flags).take(8)
      b += 1
    }
    out
  }

  /** Largest power of two strictly less than n (n ≥ 2). */
  private def leftLen(nChunks: Long): Long =
    java.lang.Long.highestOneBit(nChunks - 1)

  /** Hash the subtree spanning chunks [firstChunk, firstChunk + nChunks). */
  private def subtree(input: Array[Byte], off: Int, len: Int, firstChunk: Long): Output =
    if (len <= ChunkLen) chunkOutput(input, off, len, firstChunk)
    else {
      val nChunks = (len + ChunkLen - 1) / ChunkLen
      val leftChunks = leftLen(nChunks.toLong)
      val leftBytes = (leftChunks * ChunkLen).toInt
      val l = subtree(input, off, leftBytes, firstChunk).chainingValue
      val r = subtree(input, off + leftBytes, len - leftBytes, firstChunk + leftChunks).chainingValue
      val block = new Array[Int](16)
      System.arraycopy(l, 0, block, 0, 8)
      System.arraycopy(r, 0, block, 8, 8)
      Output(IV, block, 0L, BlockLen, Parent)
    }

  /** BLAKE3 digest (32 bytes). */
  def hash(input: Array[Byte]): Array[Byte] =
    subtree(input, 0, input.length, 0L).rootBytes
}
