package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.surql.{Argon2, Bcrypt, Blake2b, Scrypt}

/** Password-hash primitives pinned against published external vectors:
  * bcrypt by the jBCrypt/OpenBSD test suite (public domain vectors that
  * every interoperating implementation reproduces). */
class CryptoSpec extends AnyFunSuite {

  // (password, full MCF hash) — published jBCrypt vectors; the salt is
  // chars 7..29 of the hash, the remainder is the 23-byte digest.
  private val bcryptVectors = Seq(
    ("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
    ("abc", "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i"),
    ("abcdefghijklmnopqrstuvwxyz",
      "$2a$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC"),
    ("~!@#$%^&*()      ~!@#$%^&*()PNBFRD",
      "$2a$06$fPIsBO8qRqkjj273rfaOI.HtSV9jLDpTbZn782DC6/t7qT67P6FfO"))

  test("bcrypt reproduces the published OpenBSD/jBCrypt vectors") {
    for ((pass, mcf) <- bcryptVectors) {
      val Some((cost, salt, expect)) = Bcrypt.parse(mcf)
      assert(cost == 6)
      val got = Bcrypt.rawHash(pass.getBytes("UTF-8"), salt, cost)
      assert(got.sameElements(expect), s"vector for '$pass'")
      assert(Bcrypt.verify(mcf, pass))
      assert(!Bcrypt.verify(mcf, pass + "x"))
    }
  }

  test("bcrypt generate/verify round-trips at the reference default cost") {
    val h = Bcrypt.generate("hunter2")
    assert(h.startsWith("$2b$12$") && h.length == 60)
    assert(Bcrypt.verify(h, "hunter2"))
    assert(!Bcrypt.verify(h, "hunter3"))
  }

  private def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString

  test("scrypt reproduces the RFC 7914 section 12 vectors") {
    assert(hex(Scrypt.derive("".getBytes, "".getBytes, 4, 1, 1, 64)) ==
      "77d6576238657b203b19ca42c18a0497f16b4844e3074ae8dfdffa3fede21442" +
      "fcd0069ded0948f8326a753a0fc81f17e8d3e0fb2e0d3628cf35e20c38d18906")
    assert(hex(Scrypt.derive("password".getBytes, "NaCl".getBytes, 10, 8, 16, 64)) ==
      "fdbabe1c9d3472007856e7190d01e9fe7c6ad7cbc8237830e77376634b373162" +
      "2eaf30d92e22a3886ff109279d9830dac727afb94a83ee6d8360cbdfa2cc0640")
    assert(hex(Scrypt.derive("pleaseletmein".getBytes, "SodiumChloride".getBytes, 14, 8, 1, 64)) ==
      "7023bdcb3afd7348461c06cd81fd38ebfda8fbba904f8e3ea9b543f6545da1f2" +
      "d5432955613f0fcf62d49705242a9af9e61e85dc0d651e40dfcf017b45575887")
  }

  test("scrypt PHC verify accepts an RFC-derived external hash, rejects over-cost") {
    // PHC encoding of RFC 7914 vector 3: params within the reference's
    // bounds (ln=14 <= 19, r=8 <= 16, p=1 <= 4), 64-byte dk rides along
    val b64 = java.util.Base64.getEncoder.withoutPadding
    val dk = Scrypt.derive("pleaseletmein".getBytes, "SodiumChloride".getBytes, 14, 8, 1, 64)
    val phc = s"$$scrypt$$ln=14,r=8,p=1$$${b64.encodeToString("SodiumChloride".getBytes)}$$${b64.encodeToString(dk)}"
    assert(Scrypt.verify(phc, "pleaseletmein"))
    assert(!Scrypt.verify(phc, "pleaseletmeout"))
    // ln=20 breaches log_n <= default+2 (= 19): too expensive, false
    assert(!Scrypt.verify(phc.replace("ln=14", "ln=20"), "pleaseletmein"))
    // p=16 breaches p <= 4 even though RFC vector 2 is a real hash
    val dk2 = Scrypt.derive("password".getBytes, "NaCl".getBytes, 10, 8, 16, 64)
    val phc2 = s"$$scrypt$$ln=10,r=8,p=16$$${b64.encodeToString("NaCl".getBytes)}$$${b64.encodeToString(dk2)}"
    assert(!Scrypt.verify(phc2, "password"))
    assert(!Scrypt.verify("not a hash", "x"))
  }

  test("blake2b reproduces the RFC 7693 appendix vector") {
    assert(hex(Blake2b.hash("abc".getBytes, 64)) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    // empty-input and sub-64 digest lengths exercise the padding path
    assert(hex(Blake2b.hash(Array.empty, 64)) ==
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
      "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce")
  }

  // RFC 9106 §5: password 0x01×32, salt 0x02×16, secret 0x03×8,
  // AD 0x04×12, t=3, m=32, p=4, tag 32, version 0x13
  private def rfc9106(atype: Int) = Argon2.derive(
    Array.fill[Byte](32)(1), Array.fill[Byte](16)(2), 3, 32, 4, 32,
    atype, 0x13, Array.fill[Byte](8)(3), Array.fill[Byte](12)(4))

  test("argon2d/i/id reproduce the RFC 9106 section 5 vectors") {
    assert(hex(rfc9106(Argon2.TypeD)) ==
      "512b391b6f1162975371d30919734294f868e3be3984f3c1a13a4db9fabe4acb")
    assert(hex(rfc9106(Argon2.TypeI)) ==
      "c814d9d1dc7f37aa13f0d77f2494bda1c8de6b016dd388d29952a4c4672b6ce8")
    assert(hex(rfc9106(Argon2.TypeId)) ==
      "0d640df58d78766c08c037a34a8b53c9d01ef0452d75b65eb52520e96b01e659")
  }

  test("argon2 PHC verify accepts matching hashes, bounds cost, round-trips") {
    // ("password", "somesalt", m=65536, t=2, p=1) must equal the vector
    // published in phc-winner-argon2's test.c — an external interop pin
    // on top of the RFC ones
    val tag = Argon2.derive("password".getBytes, "somesalt".getBytes,
      2, 65536, 1, 32, Argon2.TypeId, 0x13)
    assert(hex(tag) ==
      "09316115d5cf24ed5a15a31a3ba326e5cf32edc24702987c02b6566f61913cf7")
    val phc = "$argon2id$v=19$m=65536,t=2,p=1$c29tZXNhbHQ" +
      "$CTFhFdXPJO1aFaMaO6Mm5c8y7cJHAph8ArZWb2GRPPc"
    assert(Argon2.verify(phc, "password"))
    assert(!Argon2.verify(phc, "Password"))
    // m over 19456*4 → too expensive → false
    assert(!Argon2.verify(phc.replace("m=65536", "m=131072"), "password"))
    // t over 8 → false
    assert(!Argon2.verify(phc.replace("t=2", "t=9"), "password"))
    assert(!Argon2.verify("$argon2id$v=19$not-a-hash", "password"))
    val gen = Argon2.generate("hunter2")
    assert(gen.startsWith("$argon2id$v=19$m=19456,t=2,p=1$"))
    assert(Argon2.verify(gen, "hunter2"))
    assert(!Argon2.verify(gen, "hunter3"))
  }

  test("fn_r19_crypto driver row yields the oracle's exact booleans") {
    val row = SparkEntry.queries("fn_r19_crypto")(
      TestSpark.session, "/root/testdata/sf0.001").collect()(0)
    val expect = Map("bc_ok" -> true, "bc_no" -> false, "bc_cost" -> false,
      "bc_rt" -> true, "sc_ok" -> true, "sc_no" -> false, "sc_cost" -> false,
      "ar_ok" -> true, "ar_no" -> false, "ar_cost" -> false, "ar_rt" -> true)
    for ((k, v) <- expect)
      assert(row.getAs[Boolean](k) == v, s"key $k")
  }

  test("bcrypt cost above the additive allowance compares false") {
    // same digest re-labelled cost 17 (> 12+4): rejected before computing
    val over = bcryptVectors.head._2.replaceFirst("\\$06\\$", "\\$17\\$")
    assert(!Bcrypt.verify(over, bcryptVectors.head._1))
    // malformed strings compare false, never error
    assert(!Bcrypt.verify("not a hash", "x"))
    assert(!Bcrypt.verify("$2b$99$" + "a" * 53, "x"))
  }
}
