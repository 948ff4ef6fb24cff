package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.surql._

/** time:: namespace vs fnc/time.rs (r19 sweep): from_* range validation
  * with the reference's error texts, ULID/UUID timestamp extraction
  * (RFC 9562 / ULID-spec vectors), typed max/min coercion, and the
  * group error text. */
class TimeSweepSpec extends AnyFunSuite {
  private def call(n: String, args: V*): V = Functions.apply(n, args, Env())
  private def dt(s: String): VDt = VDt(java.time.Instant.parse(s))

  test("from_secs/unix/millis/micros validate chrono's range; nanos never errors") {
    assert(call("time::from::secs", VInt(1646812877)) == dt("2022-03-09T08:01:17Z"))
    val e = intercept[SqlError](call("time::from::secs", VInt(8210266876800L)))
    assert(e.getMessage == "Incorrect arguments for function time::from_secs(). " +
      "The argument must be a number of seconds relative to January 1, 1970 0:00:00 UTC " +
      "that produces a datetime between -262143-01-01T00:00:00Z and +262142-12-31T23:59:59Z.")
    intercept[SqlError](call("time::from::unix", VInt(-8334601228801L)))
    intercept[SqlError](call("time::from::millis", VInt(Long.MaxValue)))
    assert(intercept[SqlError](call("time::from::micros", VInt(Long.MaxValue)))
      .getMessage.contains("number of microseconds"))
    // nanos: i64 nanoseconds span only ±292 years — euclidean split
    assert(call("time::from::nanos", VInt(-1)) ==
      VDt(java.time.Instant.ofEpochSecond(-1, 999999999)))
    assert(call("time::from::nanos", VInt(Long.MaxValue)).isInstanceOf[VDt])
  }

  test("from_ulid extracts the 48-bit ms timestamp (ULID spec example)") {
    assert(call("time::from::ulid", VStr("01ARZ3NDEKTSV4RRFFQ69G5FAV")) ==
      VDt(java.time.Instant.ofEpochMilli(1469922850259L)))
    val e = intercept[SqlError](call("time::from::ulid", VStr("not a ulid")))
    assert(e.getMessage == "Incorrect arguments for function time::from_ulid(). " +
      "The first argument must be a string, containing a valid ULID.")
    // first char > '7' overflows 48 bits → invalid
    intercept[SqlError](call("time::from::ulid", VStr("8ZZZZZZZZZZZZZZZZZZZZZZZZZ")))
  }

  test("from_uuid extracts v1/v6/v7 timestamps (RFC 9562 vectors)") {
    // RFC 9562 §A: all three example UUIDs carry 2022-02-22T19:22:22Z
    val ts = dt("2022-02-22T19:22:22Z")
    assert(call("time::from::uuid",
      VUuid(java.util.UUID.fromString("c232ab00-9414-11ec-b3c8-9f6bdeced846"))) == ts)
    assert(call("time::from::uuid",
      VUuid(java.util.UUID.fromString("1ec9414c-232a-6b00-b3c8-9f6bdeced846"))) == ts)
    assert(call("time::from::uuid",
      VUuid(java.util.UUID.fromString("017f22e2-79b0-7cc3-98c4-dc0c0c07398f"))) == ts)
    // v4 carries no timestamp
    val e = intercept[SqlError](call("time::from::uuid",
      VUuid(java.util.UUID.fromString("0191f946-936f-4223-bef5-aebbcc1039ba"))))
    assert(e.getMessage.endsWith("The first argument must be a v1, v6 or v7 UUID."))
  }

  test("max/min coerce elements to datetimes; group error text") {
    val (a, b) = (dt("2021-01-01T00:00:00Z"), dt("2022-01-01T00:00:00Z"))
    assert(call("time::max", VArr(Vector(a, b))) == b)
    assert(call("time::min", VArr(Vector(b, a))) == a)
    assert(call("time::max", VArr(Vector())) == VNone)
    intercept[SqlError](call("time::max", VArr(Vector(a, VStr("x")))))
    val e = intercept[SqlError](call("time::group", a, VStr("decade")))
    assert(e.getMessage == "Incorrect arguments for function time::group(). " +
      "The second argument must be a string, and can be one of 'year', 'month', 'day', 'hour', 'minute', or 'second'.")
  }
}
