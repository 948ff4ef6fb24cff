package graft.surql

import scala.collection.immutable.TreeMap
import scala.collection.mutable.ArrayBuffer

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
      writeHead(out, 4, items.length.toLong); items.foreach(write(out, _))
    case VObj(fields) =>
      writeHead(out, 5, fields.size.toLong)
      fields.foreach { case (k, fv) => write(out, VStr(k)); write(out, fv) }
    case VDur(s, n) =>
      writeHead(out, 6, 14)
      writeHead(out, 4, 2); writeHead(out, 0, s); writeHead(out, 0, n.toLong)
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
    case other => write(out, VStr(other.renderRaw))
  }

  def decode(bytes: Array[Byte]): V = {
    val in = new Reader(bytes)
    val v = in.read()
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
          val inner = read()
          (tag, inner) match {
            case (6, _) => VNone
            case (10, VStr(s)) => VDec(BigDecimal(s))
            case (8, VArr(Vector(VStr(tb), key))) => VRid(tb, key)
            case (12, VArr(Vector(VInt(s), VInt(n)))) =>
              VDt(java.time.Instant.ofEpochSecond(s, n))
            case (14, VArr(Vector(VInt(s), VInt(n)))) => VDur(s, n.toInt)
            case (37, VBytes(bs)) if bs.length == 16 =>
              val bb = java.nio.ByteBuffer.wrap(bs.toArray)
              VUuid(new java.util.UUID(bb.getLong, bb.getLong))
            case _ => inner
          }
        case 7 => info match {
          case 20 => VBool(false)
          case 21 => VBool(true)
          case 22 => VNull
          case 23 => VNone
          case 27 => VFloat(java.lang.Double.longBitsToDouble(uint(8)))
          case 26 => VFloat(java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble)
          case other => throw SqlError(s"unsupported CBOR simple value $other")
        }
      }
    }
  }
}
