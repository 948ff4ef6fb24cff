package graft.surql

/** BLAKE3 cryptographic hash (regular hashing mode, 256-bit output) —
  * a direct implementation of the public specification
  * (https://github.com/BLAKE3-team/BLAKE3-specs). Backs crypto::blake3
  * (reference fnc/crypto.rs blake3). */
object Blake3 {
  private val IV = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)
  private val MSG_PERM = Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

  private val CHUNK_START = 1
  private val CHUNK_END = 2
  private val PARENT = 4
  private val ROOT = 8

  private def rotr(x: Int, n: Int): Int = (x >>> n) | (x << (32 - n))

  private def g(st: Array[Int], a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
    st(a) = st(a) + st(b) + mx
    st(d) = rotr(st(d) ^ st(a), 16)
    st(c) = st(c) + st(d)
    st(b) = rotr(st(b) ^ st(c), 12)
    st(a) = st(a) + st(b) + my
    st(d) = rotr(st(d) ^ st(a), 8)
    st(c) = st(c) + st(d)
    st(b) = rotr(st(b) ^ st(c), 7)
  }

  /** One compression: returns the full 16-word state (first 8 = chaining). */
  private def compress(cv: Array[Int], block: Array[Int], counter: Long,
      blockLen: Int, flags: Int): Array[Int] = {
    val st = new Array[Int](16)
    System.arraycopy(cv, 0, st, 0, 8)
    System.arraycopy(IV, 0, st, 8, 4)
    st(12) = counter.toInt
    st(13) = (counter >>> 32).toInt
    st(14) = blockLen
    st(15) = flags
    var m = block
    var round = 0
    while (round < 7) {
      g(st, 0, 4, 8, 12, m(0), m(1)); g(st, 1, 5, 9, 13, m(2), m(3))
      g(st, 2, 6, 10, 14, m(4), m(5)); g(st, 3, 7, 11, 15, m(6), m(7))
      g(st, 0, 5, 10, 15, m(8), m(9)); g(st, 1, 6, 11, 12, m(10), m(11))
      g(st, 2, 7, 8, 13, m(12), m(13)); g(st, 3, 4, 9, 14, m(14), m(15))
      if (round < 6) m = MSG_PERM.map(m)
      round += 1
    }
    var i = 0
    while (i < 8) { st(i) ^= st(i + 8); st(i + 8) ^= cv(i); i += 1 }
    st
  }

  private def words(bytes: Array[Byte], off: Int, len: Int): Array[Int] = {
    val out = new Array[Int](16)
    var i = 0
    while (i < len) {
      out(i / 4) |= (bytes(off + i) & 0xff) << (8 * (i % 4))
      i += 1
    }
    out
  }

  /** Chaining value of one ≤1024-byte chunk (no ROOT flag). */
  private def chunkCv(input: Array[Byte], off: Int, len: Int, counter: Long): Array[Int] = {
    var cv = IV.clone()
    var pos = 0
    while (pos < len || pos == 0) {
      val blockLen = math.min(64, len - pos)
      var flags = 0
      if (pos == 0) flags |= CHUNK_START
      if (pos + blockLen >= len) flags |= CHUNK_END
      cv = compress(cv, words(input, off + pos, blockLen), counter, blockLen, flags)
        .take(8)
      pos += 64
      if (len == 0) return cv
    }
    cv
  }

  def hash(input: Array[Byte]): Array[Byte] = {
    val nChunks = math.max(1, (input.length + 1023) / 1024)
    if (nChunks == 1) {
      // single chunk: the chunk IS the root — rerun the last block with ROOT
      var cv = IV.clone()
      var pos = 0
      var out: Array[Int] = null
      while (out == null) {
        val blockLen = math.max(0, math.min(64, input.length - pos))
        val isLast = pos + 64 >= input.length
        var flags = 0
        if (pos == 0) flags |= CHUNK_START
        if (isLast) flags |= CHUNK_END | ROOT
        val st = compress(cv, words(input, pos, blockLen), 0, blockLen, flags)
        if (isLast) out = st.take(8) else cv = st.take(8)
        pos += 64
      }
      toBytes(out)
    } else {
      // binary tree over chunk chaining values (left subtrees are the
      // largest power-of-two number of chunks)
      def subtree(off: Int, chunks: Int, counter: Long): Array[Int] =
        if (chunks == 1)
          chunkCv(input, off, math.min(1024, input.length - off), counter)
        else {
          val left = Integer.highestOneBit(chunks - 1)
          val l = subtree(off, left, counter)
          val r = subtree(off + left * 1024, chunks - left, counter + left)
          compress(IV.clone(), l ++ r, 0, 64, PARENT).take(8)
        }
      val left = Integer.highestOneBit(nChunks - 1)
      val l = subtree(0, left, 0)
      val r = subtree(left * 1024, nChunks - left, left.toLong)
      toBytes(compress(IV.clone(), l ++ r, 0, 64, PARENT | ROOT).take(8))
    }
  }

  private def toBytes(ws: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) { out(i) = ((ws(i / 4) >>> (8 * (i % 4))) & 0xff).toByte; i += 1 }
    out
  }

  def hex(input: Array[Byte]): String =
    hash(input).map(b => f"${b & 0xff}%02x").mkString
}
