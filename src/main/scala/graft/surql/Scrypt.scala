package graft.surql

/** scrypt (RFC 7914) from the public specification: PBKDF2-HMAC-SHA256
  * (in-JDK) around the Salsa20/8-core ROMix memory-hard mixer. The
  * reference (fnc/crypto.rs:194-229, scrypt crate 0.11) speaks PHC
  * strings `$scrypt$ln=17,r=8,p=1$<salt>$<dk>` (unpadded standard B64,
  * recommended params ln=17/r=8/p=1/len=32) and bounds verification
  * cost at log_n ≤ default+2 (exponential → additive), r ≤ default×2,
  * p ≤ default×4. Pinned by the RFC 7914 §12 test vectors in
  * CryptoSpec. */
object Scrypt {

  final val DefaultLogN = 17
  final val DefaultR = 8
  final val DefaultP = 1
  final val DefaultLen = 32

  // ---- Salsa20/8 core on 16 little-endian words ------------------------

  @inline private def rotl(x: Int, n: Int): Int = (x << n) | (x >>> (32 - n))

  /** in-place: out = Salsa20/8(in ⊕ xor), all 16-word blocks. */
  private def salsaXor(in: Array[Int], inOff: Int, xor: Array[Int],
      xorOff: Int, out: Array[Int], outOff: Int, tmp: Array[Int]): Unit = {
    var i = 0
    while (i < 16) { tmp(i) = in(inOff + i) ^ xor(xorOff + i); i += 1 }
    val x = new Array[Int](16)
    System.arraycopy(tmp, 0, x, 0, 16)
    var round = 0
    while (round < 8) {
      // column round
      x(4) ^= rotl(x(0) + x(12), 7); x(8) ^= rotl(x(4) + x(0), 9)
      x(12) ^= rotl(x(8) + x(4), 13); x(0) ^= rotl(x(12) + x(8), 18)
      x(9) ^= rotl(x(5) + x(1), 7); x(13) ^= rotl(x(9) + x(5), 9)
      x(1) ^= rotl(x(13) + x(9), 13); x(5) ^= rotl(x(1) + x(13), 18)
      x(14) ^= rotl(x(10) + x(6), 7); x(2) ^= rotl(x(14) + x(10), 9)
      x(6) ^= rotl(x(2) + x(14), 13); x(10) ^= rotl(x(6) + x(2), 18)
      x(3) ^= rotl(x(15) + x(11), 7); x(7) ^= rotl(x(3) + x(15), 9)
      x(11) ^= rotl(x(7) + x(3), 13); x(15) ^= rotl(x(11) + x(7), 18)
      // row round
      x(1) ^= rotl(x(0) + x(3), 7); x(2) ^= rotl(x(1) + x(0), 9)
      x(3) ^= rotl(x(2) + x(1), 13); x(0) ^= rotl(x(3) + x(2), 18)
      x(6) ^= rotl(x(5) + x(4), 7); x(7) ^= rotl(x(6) + x(5), 9)
      x(4) ^= rotl(x(7) + x(6), 13); x(5) ^= rotl(x(4) + x(7), 18)
      x(11) ^= rotl(x(10) + x(9), 7); x(8) ^= rotl(x(11) + x(10), 9)
      x(9) ^= rotl(x(8) + x(11), 13); x(10) ^= rotl(x(9) + x(8), 18)
      x(12) ^= rotl(x(15) + x(14), 7); x(13) ^= rotl(x(12) + x(15), 9)
      x(14) ^= rotl(x(13) + x(12), 13); x(15) ^= rotl(x(14) + x(13), 18)
      round += 2
    }
    i = 0
    while (i < 16) { out(outOff + i) = x(i) + tmp(i); i += 1 }
  }

  /** BlockMix_salsa8 over 2r 16-word sub-blocks: chained Salsa of the
    * running block XOR each input sub-block, then the even/odd shuffle. */
  private def blockMix(b: Array[Int], y: Array[Int], r: Int,
      tmp: Array[Int], x: Array[Int]): Unit = {
    System.arraycopy(b, (2 * r - 1) * 16, x, 0, 16)
    var i = 0
    while (i < 2 * r) {
      salsaXor(x, 0, b, i * 16, x, 0, tmp)
      System.arraycopy(x, 0, y, i * 16, 16)
      i += 1
    }
    i = 0
    while (i < r) { // Y0,Y2,..,Y1,Y3,..
      System.arraycopy(y, (2 * i) * 16, b, i * 16, 16)
      System.arraycopy(y, (2 * i + 1) * 16, b, (r + i) * 16, 16)
      i += 1
    }
  }

  /** ROMix: N chained BlockMix snapshots, then N data-dependent
    * reads — the memory-hard core (128·r·N bytes). */
  private def roMix(b: Array[Int], n: Int, r: Int): Unit = {
    val words = 32 * r
    val v = new Array[Int](n * words)
    val y = new Array[Int](words)
    val tmp = new Array[Int](16)
    val x = new Array[Int](16)
    var i = 0
    while (i < n) {
      System.arraycopy(b, 0, v, i * words, words)
      blockMix(b, y, r, tmp, x)
      i += 1
    }
    i = 0
    while (i < n) {
      // Integerify: LE u64 of the first 8 bytes of the LAST sub-block;
      // n is a power of two so the low word mod n suffices
      val j = b((2 * r - 1) * 16) & (n - 1)
      val off = j * words
      var k = 0
      while (k < words) { b(k) ^= v(off + k); k += 1 }
      blockMix(b, y, r, tmp, x)
      i += 1
    }
  }

  private def pbkdf2Sha256(pass: Array[Byte], salt: Array[Byte],
      iters: Int, len: Int): Array[Byte] = {
    // PBEKeySpec wants chars; HMAC over raw bytes via Mac directly to
    // keep byte-exact passwords (RFC 7914 vectors are ASCII but the
    // general path must not lose non-Latin-1 bytes)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      if (pass.isEmpty) new Array[Byte](1) else pass, "HmacSHA256"))
    val out = new Array[Byte](len)
    val block = new Array[Byte](salt.length + 4)
    System.arraycopy(salt, 0, block, 0, salt.length)
    var i = 1
    var off = 0
    while (off < len) {
      block(salt.length) = (i >>> 24).toByte
      block(salt.length + 1) = (i >>> 16).toByte
      block(salt.length + 2) = (i >>> 8).toByte
      block(salt.length + 3) = i.toByte
      var u = mac.doFinal(block)
      val t = u.clone()
      var c = 1
      while (c < iters) {
        u = mac.doFinal(u)
        var k = 0
        while (k < t.length) { t(k) = (t(k) ^ u(k)).toByte; k += 1 }
        c += 1
      }
      val take = math.min(t.length, len - off)
      System.arraycopy(t, 0, out, off, take)
      off += take
      i += 1
    }
    out
  }

  /** RFC 7914 scrypt(P, S, N=2^logN, r, p, dkLen). */
  def derive(pass: Array[Byte], salt: Array[Byte], logN: Int, r: Int,
      p: Int, dkLen: Int): Array[Byte] = {
    require(logN >= 1 && logN < 32, s"scrypt log_n out of range: $logN")
    val n = 1 << logN
    val blockBytes = 128 * r
    val b = pbkdf2Sha256(pass, salt, 1, p * blockBytes)
    val words = new Array[Int](32 * r)
    var bi = 0
    while (bi < p) {
      val base = bi * blockBytes
      var w = 0
      while (w < words.length) { // LE bytes → words
        val o = base + 4 * w
        words(w) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
        w += 1
      }
      roMix(words, n, r)
      w = 0
      while (w < words.length) {
        val o = base + 4 * w
        b(o) = words(w).toByte
        b(o + 1) = (words(w) >>> 8).toByte
        b(o + 2) = (words(w) >>> 16).toByte
        b(o + 3) = (words(w) >>> 24).toByte
        w += 1
      }
      bi += 1
    }
    pbkdf2Sha256(pass, b, 1, dkLen)
  }

  // ---- PHC string layer -------------------------------------------------

  /** `$scrypt$ln=17,r=8,p=1$<salt>$<dk>` at the crate's recommended
    * params, fresh 16-byte salt. */
  def generate(password: String): String = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    val dk = derive(password.getBytes("UTF-8"), salt,
      DefaultLogN, DefaultR, DefaultP, DefaultLen)
    val b64 = java.util.Base64.getEncoder.withoutPadding
    s"$$scrypt$$ln=$DefaultLogN,r=$DefaultR,p=$DefaultP$$" +
      s"${b64.encodeToString(salt)}$$${b64.encodeToString(dk)}"
  }

  /** Verify a PHC scrypt hash under the reference's bounds
    * (fnc/crypto.rs:203-218: log_n ≤ default+2, r ≤ default×2,
    * p ≤ default×4); the output length rides along from the hash itself,
    * exactly as scrypt crate Params::try_from does. Malformed → false. */
  def verify(phc: String, password: String): Boolean = try {
    phc.split('$') match {
      case Array("", "scrypt", params, saltB64, dkB64) =>
        val kv = params.split(',').flatMap(_.split('=') match {
          case Array(k, v) => Some(k -> v); case _ => scala.None
        }).toMap
        val logN = kv.get("ln").map(_.toInt).getOrElse(DefaultLogN)
        val r = kv.get("r").map(_.toInt).getOrElse(DefaultR)
        val p = kv.get("p").map(_.toInt).getOrElse(DefaultP)
        if (logN < 1 || logN > DefaultLogN + 2 || r < 1 || r > DefaultR * 2 ||
            p < 1 || p > DefaultP * 4) return false
        val dec = java.util.Base64.getDecoder
        val salt = dec.decode(saltB64)
        val expect = dec.decode(dkB64)
        if (expect.isEmpty) return false
        java.security.MessageDigest.isEqual(
          derive(password.getBytes("UTF-8"), salt, logN, r, p, expect.length),
          expect)
      case _ => false
    }
  } catch { case _: Exception => false }
}
