package graft.surql

/** bcrypt (OpenBSD Provos–Mazières EksBlowfish password scheme), built
  * from the public specification — NOT a port of the reference's Rust.
  * The reference (fnc/crypto.rs:123-155, bcrypt crate) generates
  * `$2b$12$<salt><hash>` MCF strings at DEFAULT_COST 12, null-terminates
  * the password before truncating at 72 bytes, verifies any 2a/2b/2x/2y
  * hash with ONE computation (the crate implements no sign-extension
  * quirks), and bounds the cost ADDITIVELY (cost ≤ 12 + 4 — bcrypt cost
  * is exponential, so the allowance adds rather than multiplies).
  *
  * Blowfish itself is the 16-round Feistel network over the pi-digit
  * P/S tables in [[BlowfishPi]]; EksBlowfish is the expensive key
  * schedule: one salted expansion, then 2^cost alternating key/salt
  * expansions; the hash is "OrpheanBeholderScryDoubt" ECB-encrypted 64
  * times, first 23 of 24 bytes kept, radix-64'd in bcrypt's own
  * `./A-Za-z0-9` alphabet. Pinned by the published jBCrypt/OpenBSD test
  * vectors in CryptoSpec. */
object Bcrypt {

  final val DefaultCost = 12
  private final val MinCost = 4
  private final val MaxCost = 31

  private final val Alphabet =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val AlphaIdx: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  // ---- Blowfish core -------------------------------------------------

  private final class State {
    val p: Array[Int] = BlowfishPi.P.clone()
    val s: Array[Int] = BlowfishPi.S.clone()

    @inline private def f(x: Int): Int =
      ((s(x >>> 24) + s(256 + ((x >>> 16) & 0xff))) ^
        s(512 + ((x >>> 8) & 0xff))) + s(768 + (x & 0xff))

    /** One 64-bit block through the 16-round Feistel; returns l‖r packed
      * in a Long — no per-block allocation on the ~4M-encryption EksBlowfish
      * path (a specialized Tuple2 still allocates). */
    def encrypt(l0: Int, r0: Int): Long = {
      var l = l0; var r = r0
      var i = 0
      while (i < 16) {
        l ^= p(i)
        r ^= f(l)
        val t = l; l = r; r = t
        i += 1
      }
      val t = l; l = r; r = t
      ((l ^ p(17)).toLong << 32) | ((r ^ p(16)).toLong & 0xffffffffL)
    }

    /** ExpandKey(state, salt, key) from the bcrypt paper: XOR the cyclic
      * key stream into P, then regenerate P and S by chained encryptions
      * of the (salt-perturbed) running block. A zero-length salt is the
      * plain Blowfish key schedule used inside the 2^cost loop. */
    def expandKey(key: Array[Byte], salt: Array[Int]): Unit = {
      var off = 0
      var i = 0
      while (i < 18) {
        var w = 0
        var j = 0
        while (j < 4) {
          w = (w << 8) | (key(off) & 0xff)
          off = (off + 1) % key.length
          j += 1
        }
        p(i) ^= w
        i += 1
      }
      var l = 0; var r = 0
      var k = 0 // counts encryptions, cycles the 4 salt words
      i = 0
      while (i < 18) {
        if (salt.nonEmpty) {
          l ^= salt((2 * k) % 4); r ^= salt((2 * k + 1) % 4)
        }
        val lr = encrypt(l, r)
        l = (lr >>> 32).toInt; r = lr.toInt; k += 1
        p(i) = l; p(i + 1) = r
        i += 2
      }
      i = 0
      while (i < 1024) {
        if (salt.nonEmpty) {
          l ^= salt((2 * k) % 4); r ^= salt((2 * k + 1) % 4)
        }
        val lr = encrypt(l, r)
        l = (lr >>> 32).toInt; r = lr.toInt; k += 1
        s(i) = l; s(i + 1) = r
        i += 2
      }
    }
  }

  /** Raw EksBlowfish hash: 23 output bytes for (password+NUL truncated to
    * 72, 16-byte salt, cost). */
  def rawHash(password: Array[Byte], salt: Array[Byte], cost: Int): Array[Byte] = {
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    require(cost >= MinCost && cost <= MaxCost, s"bcrypt cost out of range: $cost")
    // the reference crate null-terminates FIRST, then truncates at 72 —
    // so a 72-byte password loses its terminator, like OpenBSD
    val key0 = new Array[Byte](password.length + 1)
    System.arraycopy(password, 0, key0, 0, password.length)
    val key = if (key0.length > 72) key0.take(72) else key0
    val saltWords = Array.tabulate(4) { i =>
      ((salt(4 * i) & 0xff) << 24) | ((salt(4 * i + 1) & 0xff) << 16) |
        ((salt(4 * i + 2) & 0xff) << 8) | (salt(4 * i + 3) & 0xff)
    }
    val st = new State
    st.expandKey(key, saltWords)
    val rounds = 1L << cost
    var n = 0L
    val noSalt = Array.empty[Int]
    while (n < rounds) {
      st.expandKey(key, noSalt)
      st.expandKey(salt, noSalt)
      n += 1
    }
    // "OrpheanBeholderScryDoubt" as three 64-bit blocks, encrypted 64x
    val ctext = Array(0x4f727068, 0x65616e42, 0x65686f6c,
      0x64657253, 0x63727944, 0x6f756274)
    var rep = 0
    while (rep < 64) {
      var b = 0
      while (b < 6) {
        val lr = st.encrypt(ctext(b), ctext(b + 1))
        ctext(b) = (lr >>> 32).toInt; ctext(b + 1) = lr.toInt
        b += 2
      }
      rep += 1
    }
    val out = new Array[Byte](24)
    var i = 0
    while (i < 6) {
      out(4 * i) = (ctext(i) >>> 24).toByte
      out(4 * i + 1) = (ctext(i) >>> 16).toByte
      out(4 * i + 2) = (ctext(i) >>> 8).toByte
      out(4 * i + 3) = ctext(i).toByte
      i += 1
    }
    out.take(23)
  }

  // ---- bcrypt radix-64 -------------------------------------------------

  def b64Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val b0 = data(i) & 0xff
      sb.append(Alphabet(b0 >> 2))
      if (i + 1 < data.length) {
        val b1 = data(i + 1) & 0xff
        sb.append(Alphabet(((b0 & 0x03) << 4) | (b1 >> 4)))
        if (i + 2 < data.length) {
          val b2 = data(i + 2) & 0xff
          sb.append(Alphabet(((b1 & 0x0f) << 2) | (b2 >> 6)))
          sb.append(Alphabet(b2 & 0x3f))
        } else sb.append(Alphabet((b1 & 0x0f) << 2))
      } else sb.append(Alphabet((b0 & 0x03) << 4))
      i += 3
    }
    sb.toString
  }

  def b64Decode(s: String, maxLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i + 1 < s.length && out.size < maxLen) {
      val c0 = AlphaIdx(s(i).toInt & 0x7f); val c1 = AlphaIdx(s(i + 1).toInt & 0x7f)
      if (c0 < 0 || c1 < 0) throw new IllegalArgumentException("bad bcrypt b64")
      out.write((c0 << 2) | (c1 >> 4))
      if (i + 2 < s.length && out.size < maxLen) {
        val c2 = AlphaIdx(s(i + 2).toInt & 0x7f)
        if (c2 < 0) throw new IllegalArgumentException("bad bcrypt b64")
        out.write(((c1 & 0x0f) << 4) | (c2 >> 2))
        if (i + 3 < s.length && out.size < maxLen) {
          val c3 = AlphaIdx(s(i + 3).toInt & 0x7f)
          if (c3 < 0) throw new IllegalArgumentException("bad bcrypt b64")
          out.write(((c2 & 0x03) << 6) | c3)
        }
      }
      i += 4
    }
    out.toByteArray
  }

  // ---- MCF string layer ------------------------------------------------

  /** `$2b$12$<22-char salt><31-char hash>` at the reference's default
    * cost, fresh random salt. */
  def generate(password: String): String = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    val h = rawHash(password.getBytes("UTF-8"), salt, DefaultCost)
    f"$$2b$$$DefaultCost%02d$$" + b64Encode(salt) + b64Encode(h)
  }

  /** Parse `$2{a,b,x,y}$NN$<22 salt><31 hash>` → (cost, salt, hash23);
    * None for anything malformed (the reference compares false, never
    * errors). */
  def parse(mcf: String): Option[(Int, Array[Byte], Array[Byte])] = {
    val m = "^\\$2[abxy]?\\$(\\d\\d?)\\$([./A-Za-z0-9]{22})([./A-Za-z0-9]{31})$"
      .r.findFirstMatchIn(mcf)
    m.flatMap { mm =>
      try {
        val cost = mm.group(1).toInt
        if (cost < MinCost || cost > MaxCost) scala.None
        else scala.Some((cost, b64Decode(mm.group(2), 16), b64Decode(mm.group(3), 23)))
      } catch { case _: Exception => scala.None }
    }
  }

  /** Verify under the reference's ADDITIVE cost bound (fnc/crypto.rs:140:
    * cost > DEFAULT_COST + 4 → too expensive → false). */
  def verify(mcf: String, password: String): Boolean = parse(mcf) match {
    case scala.Some((cost, salt, expect)) if cost <= DefaultCost + 4 =>
      java.security.MessageDigest.isEqual(
        rawHash(password.getBytes("UTF-8"), salt, cost), expect)
    case _ => false
  }
}
