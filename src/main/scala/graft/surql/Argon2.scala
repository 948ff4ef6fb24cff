package graft.surql

/** Argon2 (RFC 9106) — d, i, and id variants, versions 0x10 and 0x13 —
  * implemented from the RFC and the public phc-winner-argon2 reference
  * pseudocode, on the hand-built [[Blake2b]] core. The engine's
  * reference (fnc/crypto.rs:87-121, argon2 crate 0.5) generates
  * `$argon2id$v=19$m=19456,t=2,p=1$<salt>$<hash>` PHC strings (the
  * OWASP-recommended 19 MiB / t=2 / p=1 defaults) and verifies any
  * argon2{d,i,id} PHC hash under 4× multiplicative bounds on m, t and
  * p. Pinned by the RFC 9106 §5 test vectors (which exercise secret +
  * associated data, 4 lanes, and both address modes) in CryptoSpec. */
object Argon2 {

  final val DefaultM = 19456 // KiB
  final val DefaultT = 2
  final val DefaultP = 1
  final val DefaultLen = 32

  final val TypeD = 0
  final val TypeI = 1
  final val TypeId = 2

  private final val SyncPoints = 4
  private final val AddressesInBlock = 128

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))
  @inline private def lo32(x: Long): Long = x & 0xffffffffL

  /** The BlaMka G: Blake2b's mixer with the multiplicative twist
    * (a += b + 2·lo(a)·lo(b)) that defeats trade-off attacks. */
  private def pRound(v: Array[Long], i0: Int, i1: Int, i2: Int, i3: Int,
      i4: Int, i5: Int, i6: Int, i7: Int, i8: Int, i9: Int, i10: Int,
      i11: Int, i12: Int, i13: Int, i14: Int, i15: Int): Unit = {
    @inline def g(a: Int, b: Int, c: Int, d: Int): Unit = {
      v(a) = v(a) + v(b) + 2L * lo32(v(a)) * lo32(v(b))
      v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d) + 2L * lo32(v(c)) * lo32(v(d))
      v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + 2L * lo32(v(a)) * lo32(v(b))
      v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d) + 2L * lo32(v(c)) * lo32(v(d))
      v(b) = rotr(v(b) ^ v(c), 63)
    }
    g(i0, i4, i8, i12); g(i1, i5, i9, i13)
    g(i2, i6, i10, i14); g(i3, i7, i11, i15)
    g(i0, i5, i10, i15); g(i1, i6, i11, i12)
    g(i2, i7, i8, i13); g(i3, i4, i9, i14)
  }

  /** fill_block: next = P(prev ⊕ ref) ⊕ prev ⊕ ref (⊕ old next when
    * withXor — version 0x13 passes > 0). Blocks are 128 longs. */
  private def fillBlock(mem: Array[Long], prevOff: Int, refOff: Int,
      nextOff: Int, withXor: Boolean, r: Array[Long], tmp: Array[Long]): Unit = {
    var i = 0
    while (i < 128) {
      r(i) = mem(prevOff + i) ^ mem(refOff + i)
      tmp(i) = if (withXor) r(i) ^ mem(nextOff + i) else r(i)
      i += 1
    }
    i = 0
    while (i < 8) { // contiguous 16-word groups
      val b = 16 * i
      pRound(r, b, b + 1, b + 2, b + 3, b + 4, b + 5, b + 6, b + 7,
        b + 8, b + 9, b + 10, b + 11, b + 12, b + 13, b + 14, b + 15)
      i += 1
    }
    i = 0
    while (i < 8) { // 2-word-strided groups
      val b = 2 * i
      pRound(r, b, b + 1, b + 16, b + 17, b + 32, b + 33, b + 48, b + 49,
        b + 64, b + 65, b + 80, b + 81, b + 96, b + 97, b + 112, b + 113)
      i += 1
    }
    i = 0
    while (i < 128) { mem(nextOff + i) = tmp(i) ^ r(i); i += 1 }
  }

  private def le32(x: Int): Array[Byte] =
    Array(x.toByte, (x >>> 8).toByte, (x >>> 16).toByte, (x >>> 24).toByte)

  /** H' — the variable-length hash (RFC 9106 §3.3). */
  private def hPrime(outLen: Int, data: Array[Byte]): Array[Byte] = {
    val input = le32(outLen) ++ data
    if (outLen <= 64) Blake2b.hash(input, outLen)
    else {
      // blake2b_long: emit 32 bytes of each chained V_i, then the final
      // V_{r+1} = H^{T-32r}(V_r) whole
      val out = new Array[Byte](outLen)
      var v = Blake2b.hash(input, 64)
      System.arraycopy(v, 0, out, 0, 32)
      var off = 32
      while (outLen - off > 64) {
        v = Blake2b.hash(v, 64)
        System.arraycopy(v, 0, out, off, 32)
        off += 32
      }
      System.arraycopy(Blake2b.hash(v, outLen - off), 0, out, off, outLen - off)
      out
    }
  }

  /** index_alpha (phc-winner-argon2 ref.c / RFC 9106 §3.4.1.3): map the
    * 32-bit pseudo-random J1 into the allowed reference window. */
  private def indexAlpha(pass: Int, slice: Int, index: Int, sameLane: Boolean,
      segLen: Int, laneLen: Int, j1: Long): Int = {
    val refAreaSize: Long =
      if (pass == 0) {
        if (slice == 0) index - 1
        else if (sameLane) slice.toLong * segLen + index - 1
        else slice.toLong * segLen + (if (index == 0) -1 else 0)
      } else {
        if (sameLane) laneLen.toLong - segLen + index - 1
        else laneLen.toLong - segLen + (if (index == 0) -1 else 0)
      }
    var rel = j1
    rel = (rel * rel) >>> 32
    rel = refAreaSize - 1 - ((refAreaSize * rel) >>> 32)
    val start = if (pass != 0 && slice != SyncPoints - 1) (slice + 1) * segLen else 0
    ((start + rel) % laneLen).toInt
  }

  /** The full Argon2 function with secret (K) and associated data (X) —
    * the RFC test vectors exercise them; the PHC layer passes empty. */
  def derive(pass: Array[Byte], salt: Array[Byte], tCost: Int, mCost: Int,
      lanes: Int, tagLen: Int, atype: Int, version: Int,
      secret: Array[Byte] = Array.empty,
      ad: Array[Byte] = Array.empty): Array[Byte] = {
    require(lanes >= 1 && lanes <= 0xffffff, s"argon2 lanes: $lanes")
    require(tCost >= 1, s"argon2 passes: $tCost")
    require(mCost >= 8 * lanes, s"argon2 m_cost $mCost < 8*lanes")
    require(tagLen >= 4, s"argon2 tag length: $tagLen")

    val memBlocks = (mCost / (4 * lanes)) * (4 * lanes)
    val laneLen = memBlocks / lanes
    val segLen = laneLen / SyncPoints

    // H0 (§3.2): the parameter-and-input digest
    val h0 = {
      val buf = new java.io.ByteArrayOutputStream
      buf.write(le32(lanes)); buf.write(le32(tagLen)); buf.write(le32(mCost))
      buf.write(le32(tCost)); buf.write(le32(version)); buf.write(le32(atype))
      buf.write(le32(pass.length)); buf.write(pass)
      buf.write(le32(salt.length)); buf.write(salt)
      buf.write(le32(secret.length)); buf.write(secret)
      buf.write(le32(ad.length)); buf.write(ad)
      Blake2b.hash(buf.toByteArray, 64)
    }

    val mem = new Array[Long](memBlocks * 128)
    @inline def blockOff(lane: Int, idx: Int) = (lane * laneLen + idx) * 128

    def storeBlock(off: Int, bytes: Array[Byte]): Unit = {
      var i = 0
      while (i < 128) {
        val o = 8 * i
        mem(off + i) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24) |
          ((bytes(o + 4) & 0xffL) << 32) | ((bytes(o + 5) & 0xffL) << 40) |
          ((bytes(o + 6) & 0xffL) << 48) | ((bytes(o + 7) & 0xffL) << 56)
        i += 1
      }
    }

    var lane = 0
    while (lane < lanes) {
      storeBlock(blockOff(lane, 0), hPrime(1024, h0 ++ le32(0) ++ le32(lane)))
      storeBlock(blockOff(lane, 1), hPrime(1024, h0 ++ le32(1) ++ le32(lane)))
      lane += 1
    }

    val r = new Array[Long](128)
    val tmp = new Array[Long](128)

    var p = 0
    while (p < tCost) {
      var slice = 0
      while (slice < SyncPoints) {
        lane = 0
        while (lane < lanes) {
          val dataIndependent = atype == TypeI ||
            (atype == TypeId && p == 0 && slice < SyncPoints / 2)
          // address generation state (argon2i mode)
          val inputBlock = new Array[Long](128)
          val addrBlock = new Array[Long](128)
          if (dataIndependent) {
            inputBlock(0) = p.toLong
            inputBlock(1) = lane.toLong
            inputBlock(2) = slice.toLong
            inputBlock(3) = memBlocks.toLong
            inputBlock(4) = tCost.toLong
            inputBlock(5) = atype.toLong
          }
          def nextAddresses(): Unit = {
            inputBlock(6) += 1
            // addr = G(zero, G(zero, input)) on scratch memory
            val scratch = new Array[Long](3 * 128) // zero | in | out
            System.arraycopy(inputBlock, 0, scratch, 128, 128)
            fillBlock(scratch, 0, 128, 256, withXor = false, r, tmp)
            System.arraycopy(scratch, 256, scratch, 128, 128)
            fillBlock(scratch, 0, 128, 256, withXor = false, r, tmp)
            System.arraycopy(scratch, 256, addrBlock, 0, 128)
          }
          var startIdx = 0
          if (p == 0 && slice == 0) {
            startIdx = 2
            if (dataIndependent) nextAddresses()
          }
          var i = startIdx
          var currOff = lane * laneLen + slice * segLen + i
          var prevOff = currOff - 1
          if (currOff % laneLen == 0) prevOff = currOff + laneLen - 1
          while (i < segLen) {
            if (currOff % laneLen == 1) prevOff = currOff - 1
            val pseudoRand: Long =
              if (dataIndependent) {
                if (i % AddressesInBlock == 0) nextAddresses()
                addrBlock(i % AddressesInBlock)
              } else mem(prevOff * 128)
            var refLane = ((pseudoRand >>> 32) % lanes).toInt
            if (p == 0 && slice == 0) refLane = lane
            val refIdx = indexAlpha(p, slice, i, refLane == lane,
              segLen, laneLen, lo32(pseudoRand))
            val refOff = refLane * laneLen + refIdx
            val withXor = version != 0x10 && p > 0
            fillBlock(mem, prevOff * 128, refOff * 128, currOff * 128,
              withXor, r, tmp)
            i += 1; currOff += 1; prevOff += 1
          }
          lane += 1
        }
        slice += 1
      }
      p += 1
    }

    // finalize: XOR the last block of every lane, H' to the tag
    val c = new Array[Long](128)
    lane = 0
    while (lane < lanes) {
      val off = blockOff(lane, laneLen - 1)
      var i = 0
      while (i < 128) { c(i) ^= mem(off + i); i += 1 }
      lane += 1
    }
    val cBytes = new Array[Byte](1024)
    var i = 0
    while (i < 128) {
      var b = 0
      while (b < 8) { cBytes(8 * i + b) = (c(i) >>> (8 * b)).toByte; b += 1 }
      i += 1
    }
    hPrime(tagLen, cBytes)
  }

  // ---- PHC string layer -------------------------------------------------

  /** `$argon2id$v=19$m=19456,t=2,p=1$<salt>$<hash>`, fresh 16-byte salt —
    * the argon2 crate's default generate shape. */
  def generate(password: String): String = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    val tag = derive(password.getBytes("UTF-8"), salt, DefaultT, DefaultM,
      DefaultP, DefaultLen, TypeId, 0x13)
    val b64 = java.util.Base64.getEncoder.withoutPadding
    s"$$argon2id$$v=19$$m=$DefaultM,t=$DefaultT,p=$DefaultP$$" +
      s"${b64.encodeToString(salt)}$$${b64.encodeToString(tag)}"
  }

  /** Verify any argon2{d,i,id} PHC hash, versions 16/19, under the
    * reference's 4× bounds (fnc/crypto.rs:97-110: m ≤ 19456×4,
    * t ≤ 2×4, p ≤ 1×4). Malformed or over-cost → false, never error. */
  def verify(phc: String, password: String): Boolean = try {
    val parts = phc.split('$')
    // $argon2id$v=19$m=..,t=..,p=..$salt$hash — v= segment optional (v16 hashes may omit it)
    if (parts.length < 5 || parts(0).nonEmpty) return false
    val atype = parts(1) match {
      case "argon2d" => TypeD
      case "argon2i" => TypeI
      case "argon2id" => TypeId
      case _ => return false
    }
    var idx = 2
    var version = 0x10
    if (parts(idx).startsWith("v=")) {
      version = parts(idx).drop(2).toInt
      idx += 1
    }
    if (version != 0x10 && version != 0x13) return false
    val kv = parts(idx).split(',').flatMap(_.split('=') match {
      case Array(k, v) => Some(k -> v); case _ => scala.None
    }).toMap
    idx += 1
    if (parts.length != idx + 2) return false
    val (mo, to, po) = (kv.get("m").flatMap(_.toIntOption),
      kv.get("t").flatMap(_.toIntOption), kv.get("p").flatMap(_.toIntOption))
    if (mo.isEmpty || to.isEmpty || po.isEmpty) return false
    val (m, t, par) = (mo.get, to.get, po.get)
    if (m > DefaultM * 4 || t > DefaultT * 4 || par > DefaultP * 4) return false
    if (par < 1 || t < 1 || m < 8 * par) return false
    val dec = java.util.Base64.getDecoder
    val salt = dec.decode(parts(idx))
    val expect = dec.decode(parts(idx + 1))
    if (expect.length < 4) return false
    java.security.MessageDigest.isEqual(
      derive(password.getBytes("UTF-8"), salt, t, m, par, expect.length,
        atype, version),
      expect)
  } catch { case _: Exception => false }
}
