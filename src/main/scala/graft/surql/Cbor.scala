package graft.surql

import scala.collection.immutable.TreeMap
import scala.collection.mutable.ArrayBuffer

import graft.surql.ast.Kind

/** RFC 8949 CBOR codec for SurrealQL values (encoding::cbor::encode/decode,
  * fnc/encoding.rs). NONE is the reference's tag 6 over null; record ids,
  * durations and datetimes round-trip through their custom tags where the
  * corpus exercises them. */
object Cbor {

  def encode(v: V): Array[Byte] = {
    val out = ArrayBuffer[Byte]()
    write(out, v)
    out.toArray
  }

  private def writeHead(out: ArrayBuffer[Byte], major: Int, value: Long): Unit = {
    val m = (major << 5).toByte
    if (value < 24) out += (m | value.toByte).toByte
    else if (value < 256) { out += (m | 24).toByte; out += value.toByte }
    else if (value < 65536) {
      out += (m | 25).toByte
      out += (value >> 8).toByte; out += value.toByte
    } else if (value < 4294967296L) {
      out += (m | 26).toByte
      (3 to 0 by -1).foreach(i => out += (value >> (8 * i)).toByte)
    } else {
      out += (m | 27).toByte
      (7 to 0 by -1).foreach(i => out += (value >> (8 * i)).toByte)
    }
  }

  private def write(out: ArrayBuffer[Byte], v: V): Unit = v match {
    case VInt(i) if i >= 0 => writeHead(out, 0, i)
    case VInt(i)           => writeHead(out, 1, -1 - i)
    case VFloat(d) =>
      out += 0xFB.toByte
      val bits = java.lang.Double.doubleToLongBits(d)
      (7 to 0 by -1).foreach(i => out += (bits >> (8 * i)).toByte)
    case VDec(d) =>
      // decimals travel as tag 10 over their string form (surreal cbor)
      writeHead(out, 6, 10); write(out, VStr(Render.decStr(d)))
    case VStr(s) =>
      val bytes = s.getBytes("UTF-8")
      writeHead(out, 3, bytes.length.toLong); out ++= bytes
    case VBytes(bs) =>
      writeHead(out, 2, bs.length.toLong); out ++= bs
    case VBool(true)  => out += 0xF5.toByte
    case VBool(false) => out += 0xF4.toByte
    case VNull        => out += 0xF6.toByte
    case VNone        => writeHead(out, 6, 6); out += 0xF6.toByte
    case VArr(items) =>
      writeHead(out, 4, items.length.toLong); items.foreach(write(out, _))
    case VSet(items) =>
      // sets carry their own tag (TAG_SET 56) so the round-trip keeps
      // set-ness instead of decaying to an array (convert.rs:445; r19)
      writeHead(out, 6, 56)
      writeHead(out, 4, items.length.toLong); items.foreach(write(out, _))
    case VObj(fields) =>
      writeHead(out, 5, fields.size.toLong)
      fields.foreach { case (k, fv) => write(out, VStr(k)); write(out, fv) }
    case VDur(s, n) =>
      // COMPACT form (convert.rs:380-395): trailing zero components are
      // omitted — 0ns → [secs], zero duration → []
      writeHead(out, 6, 14)
      if (s == 0 && n == 0) writeHead(out, 4, 0)
      else if (n == 0) { writeHead(out, 4, 1); writeHead(out, 0, s) }
      else { writeHead(out, 4, 2); writeHead(out, 0, s); writeHead(out, 0, n.toLong) }
    case VDt(t) =>
      writeHead(out, 6, 12)
      writeHead(out, 4, 2); writeHead(out, 0, t.getEpochSecond); writeHead(out, 0, t.getNano.toLong)
    case VRid(tb, key) =>
      writeHead(out, 6, 8)
      writeHead(out, 4, 2); write(out, VStr(tb)); write(out, key)
    case VUuid(u) =>
      writeHead(out, 6, 37)
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putLong(u.getMostSignificantBits); bb.putLong(u.getLeastSignificantBits)
      writeHead(out, 2, 16); out ++= bb.array()
    case VTable(t) =>
      writeHead(out, 6, 7); write(out, VStr(t))
    case VFile(bucket, key) =>
      writeHead(out, 6, 55)
      writeHead(out, 4, 2); write(out, VStr(bucket)); write(out, VStr(key))
    case VRng(lo, hi) =>
      // TAG_RANGE over [bound, bound]; a bound is tag 50 (included) /
      // 51 (excluded) over the value, or null when unbounded
      def bound(b: Option[(V, Boolean)]): Unit = b match {
        case Some((bv, incl)) =>
          writeHead(out, 6, if (incl) 50 else 51); write(out, bv)
        case scala.None => out += 0xF6.toByte
      }
      writeHead(out, 6, 49)
      writeHead(out, 4, 2); bound(lo); bound(hi)
    case _ =>
      // regexes and closures have no CBOR form (convert.rs Regex arm)
      throw SqlError("Incorrect arguments for function " +
        s"encoding::cbor::encode(). Value could not be encoded into CBOR")
  }

  def decode(bytes: Array[Byte]): V = {
    val in = new Reader(bytes)
    val v = in.read()
    // one complete value, no trailing bytes — ciborium's strictness
    if (in.pos != bytes.length)
      throw SqlError("trailing bytes after CBOR value")
    v
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    private def u8(): Int = { val b = bytes(pos) & 0xFF; pos += 1; b }
    private def uint(n: Int): Long = {
      var v = 0L
      (1 to n).foreach(_ => v = (v << 8) | u8())
      v
    }
    private def head(info: Int): Long = info match {
      case i if i < 24 => i.toLong
      case 24 => uint(1)
      case 25 => uint(2)
      case 26 => uint(4)
      case 27 => uint(8)
      case other => throw SqlError(s"unsupported CBOR additional info $other")
    }

    private def readBound(): Option[(V, Boolean)] = {
      val b = u8()
      if (b == 0xF6) scala.None
      else {
        if ((b >> 5) != 6) throw SqlError("Expected a bound tag")
        val incl = head(b & 0x1F) match {
          case 50 => true
          case 51 => false
          case _  => throw SqlError("Expected a bound tag")
        }
        Some((read(), incl))
      }
    }

    private def readRange(): V = {
      val b = u8()
      if ((b >> 5) != 4 || head(b & 0x1F) != 2)
        throw SqlError("Expected a CBOR array with 2 bounds")
      VRng(readBound(), readBound())
    }

    def read(): V = {
      val b = u8()
      val major = b >> 5
      val info = b & 0x1F
      major match {
        case 0 => VInt(head(info))
        case 1 => VInt(-1 - head(info))
        case 2 =>
          val n = head(info).toInt
          val out = bytes.slice(pos, pos + n); pos += n
          VBytes(out.toVector)
        case 3 =>
          val n = head(info).toInt
          val out = new String(bytes.slice(pos, pos + n), "UTF-8"); pos += n
          VStr(out)
        case 4 =>
          val n = head(info).toInt
          VArr((0 until n).map(_ => read()).toVector)
        case 5 =>
          val n = head(info).toInt
          VObj(TreeMap((0 until n).map { _ =>
            val k = read() match { case VStr(s) => s; case other => other.renderRaw }
            k -> read()
          }: _*))
        case 6 =>
          val tag = head(info)
          // ranges decode structurally: their bounds are tag 50/51 wrappers
          // that only exist inside a range (stray ones at any other
          // position hit the unknown-tag error, like convert.rs)
          if (tag == 49) return readRange()
          val inner = read()
          (tag, inner) match {
            case (6, _) => VNone
            // spec tag 0: RFC 3339 datetime string
            case (0, VStr(s)) => Coerce.cast(Kind.KDatetime, VStr(s))
            case (7, VStr(t)) => VTable(t)
            // string-form uuid / decimal / duration spec tags
            case (9, VStr(s))  => Coerce.cast(Kind.KUuid, VStr(s))
            case (10, VStr(s)) => VDec(BigDecimal(s))
            case (13, VStr(s)) => Coerce.cast(Kind.KDuration, VStr(s))
            // record ids: [table, key] array, or the "tb:key" text form
            case (8, VArr(Vector(VStr(tb), key))) => VRid(tb, key)
            case (8, VStr(s)) => Coerce.cast(Kind.KRecord(Nil), VStr(s))
            case (12, VArr(Vector(VInt(s), VInt(n)))) =>
              VDt(java.time.Instant.ofEpochSecond(s, n))
            // durations are compact: 0-2 elements, missing → 0
            case (14, VArr(items)) if items.length <= 2 &&
                items.forall(_.isInstanceOf[VInt]) =>
              val s = items.headOption.collect { case VInt(x) => x }.getOrElse(0L)
              val n = items.lift(1).collect { case VInt(x) => x }.getOrElse(0L)
              VDur(s, n.toInt)
            case (37, VBytes(bs)) if bs.length == 16 =>
              val bb = java.nio.ByteBuffer.wrap(bs.toArray)
              VUuid(new java.util.UUID(bb.getLong, bb.getLong))
            case (55, VArr(Vector(VStr(bucket), VStr(key)))) => VFile(bucket, key)
            case (56, VArr(items)) => V.set(items)
            // the reference errors on unknown tags (convert.rs:360)
            case _ => throw SqlError(s"Encountered an unknown CBOR tag")
          }
        case 7 => info match {
          case 20 => VBool(false)
          case 21 => VBool(true)
          case 22 => VNull
          case 23 => VNone
          case 27 => VFloat(java.lang.Double.longBitsToDouble(uint(8)))
          case 26 => VFloat(java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble)
          case 25 => // IEEE 754 half — ciborium accepts them on decode
            val h = uint(2).toInt
            val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
            val exp = (h >> 10) & 0x1f
            val frac = h & 0x3ff
            VFloat(
              if (exp == 0) sign * frac * math.pow(2, -24)
              else if (exp == 31)
                (if (frac != 0) Double.NaN
                 else sign * Double.PositiveInfinity)
              else sign * (1024 + frac) * math.pow(2, exp - 25))
          case other => throw SqlError(s"unsupported CBOR simple value $other")
        }
      }
    }
  }
}
