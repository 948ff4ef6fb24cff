package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UrlParse

/** WHATWG URL parser vs an independently-generated oracle: the vectors
  * below were produced by the Node.js `URL` class (a second, unrelated
  * implementation of the SAME WHATWG URL Standard the reference's `url`
  * crate 2.5 implements), mapped onto the rust-url accessor model the
  * reference exposes through `parse::url::*` (fnc/parse.rs):
  * host/domain answer null for EMPTY hosts, `domain` is null for IP
  * hosts, `port` is port_or_known_default, query/fragment distinguish
  * empty-present ("http://a/?" → "") from absent (null), and a parse
  * failure (bad port, bad IPv4, forbidden host chars) nulls EVERY
  * accessor. Regenerate with scripts/gen_url_vectors.js. */
class UrlParseSpec extends AnyFunSuite {

  /** err-only overload = the oracle rejected the URL outright. */
  private case class V(in: String, scheme: String = null, host: String = null,
      domain: String = null, port: Long = -1L, path: String = null,
      query: String = null, fragment: String = null)

  private val vectors = Seq(
    V("http://www.google.com", "http", "www.google.com", "www.google.com", 80L, "/", null, null),
    V("http://www.google.com/", "http", "www.google.com", "www.google.com", 80L, "/", null, null),
    V("http://example.com/a/b?x=1&y=2#frag", "http", "example.com", "example.com", 80L, "/a/b", "x=1&y=2", "frag"),
    V("https://shop.example.com/parts/42?brand=Brand12", "https", "shop.example.com", "shop.example.com", 443L, "/parts/42", "brand=Brand12", null),
    V("http://sub.domain.example.org/deep/path/file.html", "http", "sub.domain.example.org", "sub.domain.example.org", 80L, "/deep/path/file.html", null, null),
    V("HTTP://EXAMPLE.com/Path", "http", "example.com", "example.com", 80L, "/Path", null, null),
    V("HtTpS://A.B.C/", "https", "a.b.c", "a.b.c", 443L, "/", null, null),
    V("http://a.com:80/", "http", "a.com", "a.com", 80L, "/", null, null),
    V("https://a.com:443/", "https", "a.com", "a.com", 443L, "/", null, null),
    V("ftp://a.com:21/", "ftp", "a.com", "a.com", 21L, "/", null, null),
    V("ws://a.com:80/x", "ws", "a.com", "a.com", 80L, "/x", null, null),
    V("wss://a.com:443/x", "wss", "a.com", "a.com", 443L, "/x", null, null),
    V("http://a.com:8080/", "http", "a.com", "a.com", 8080L, "/", null, null),
    V("https://a.com:80/", "https", "a.com", "a.com", 80L, "/", null, null),
    V("ftp://h/dir/f.txt", "ftp", "h", "h", 21L, "/dir/f.txt", null, null),
    V("http://a:0/x", "http", "a", "a", 0L, "/x", null, null),
    V("http://a:65535/", "http", "a", "a", 65535L, "/", null, null),
    V("http://a:/x", "http", "a", "a", 80L, "/x", null, null),
    V("foo://a:0/x", "foo", "a", "a", 0L, "/x", null, null),
    V("foo://host:21/", "foo", "host", "host", 21L, "/", null, null),
    V("http://user@host.com/", "http", "host.com", "host.com", 80L, "/", null, null),
    V("http://user:pw@host.com:99/p?q=1#f", "http", "host.com", "host.com", 99L, "/p", "q=1", "f"),
    V("http://a@b@c.com/x", "http", "c.com", "c.com", 80L, "/x", null, null),
    V("http://127.0.0.1/x", "http", "127.0.0.1", null, 80L, "/x", null, null),
    V("http://0x7f.1/", "http", "127.0.0.1", null, 80L, "/", null, null),
    V("http://1.2.3.4./", "http", "1.2.3.4", null, 80L, "/", null, null),
    V("http://2130706433/", "http", "127.0.0.1", null, 80L, "/", null, null),
    V("http://0300.0250.0.01/", "http", "192.168.0.1", null, 80L, "/", null, null),
    V("http://[::1]:99/x", "http", "[::1]", null, 99L, "/x", null, null),
    V("http://[1:0:0:0:0:0:0:1]/", "http", "[1::1]", null, 80L, "/", null, null),
    V("http://[2001:db8::8:800:200c:417a]/", "http", "[2001:db8::8:800:200c:417a]", null, 80L, "/", null, null),
    V("http://[::ffff:1.2.3.4]/", "http", "[::ffff:102:304]", null, 80L, "/", null, null),
    V("http://[0:1:0:0:0:0:0:0]/", "http", "[0:1::]", null, 80L, "/", null, null),
    V("http://[::]/", "http", "[::]", null, 80L, "/", null, null),
    V("http://[1:2:3:4:5:6:7:8]/", "http", "[1:2:3:4:5:6:7:8]", null, 80L, "/", null, null),
    V("http://b\u00fccher.de/", "http", "xn--bcher-kva.de", "xn--bcher-kva.de", 80L, "/", null, null),
    V("https://\u4f8b\u3048.jp/", "https", "xn--r8jz45g.jp", "xn--r8jz45g.jp", 443L, "/", null, null),
    V("http://\u00df.de/", "http", "xn--zca.de", "xn--zca.de", 80L, "/", null, null),
    V("http://\u2167.com/", "http", "viii.com", "viii.com", 80L, "/", null, null),
    V("http://xn--bcher-kva.de/", "http", "xn--bcher-kva.de", "xn--bcher-kva.de", 80L, "/", null, null),
    V("http://%65xample.com/", "http", "example.com", "example.com", 80L, "/", null, null),
    V("http://STRASSE.de/", "http", "strasse.de", "strasse.de", 80L, "/", null, null),
    V("http://a/b/../c/./d", "http", "a", "a", 80L, "/c/d", null, null),
    V("http://a\\b\\c/d", "http", "a", "a", 80L, "/b/c/d", null, null),
    V("http://a/b/..", "http", "a", "a", 80L, "/", null, null),
    V("http://a/..", "http", "a", "a", 80L, "/", null, null),
    V("http://a/b/%2e", "http", "a", "a", 80L, "/b/", null, null),
    V("http://a/%2e%2E/b", "http", "a", "a", 80L, "/b", null, null),
    V("http://a/p a/q", "http", "a", "a", 80L, "/p%20a/q", null, null),
    V("http://a/%41%zz/x", "http", "a", "a", 80L, "/%41%zz/x", null, null),
    V("http://a/{b}|c^", "http", "a", "a", 80L, "/%7Bb%7D|c^", null, null),
    V("http://a/p?q{}|'x", "http", "a", "a", 80L, "/p", "q{}|%27x", null),
    V("https://a/p?it's", "https", "a", "a", 443L, "/p", "it%27s", null),
    V("http://a#f{}`|", "http", "a", "a", 80L, "/", null, "f{}%60|"),
    V("http://a/?", "http", "a", "a", 80L, "/", "", null),
    V("http://a?", "http", "a", "a", 80L, "/", "", null),
    V("http://a#", "http", "a", "a", 80L, "/", null, ""),
    V("http://a/?#", "http", "a", "a", 80L, "/", "", ""),
    V("http://a/?#f", "http", "a", "a", 80L, "/", "", "f"),
    V("http://a/?q#", "http", "a", "a", 80L, "/", "q", ""),
    V("foo://h/p?", "foo", "h", "h", -1L, "/p", "", null),
    V("foo://HostName/Path", "foo", "HostName", "HostName", -1L, "/Path", null, null),
    V("foo://%41b/", "foo", "%41b", "%41b", -1L, "/", null, null),
    V("foo://a%2Fb/", "foo", "a%2Fb", "a%2Fb", -1L, "/", null, null),
    V("foo://ab%/", "foo", "ab%", "ab%", -1L, "/", null, null),
    V("foo:opaque path?q#f", "foo", null, null, -1L, "opaque path", "q", "f"),
    V("mailto:john@example.com", "mailto", null, null, -1L, "john@example.com", null, null),
    V("data:text/plain,hi there", "data", null, null, -1L, "text/plain,hi there", null, null),
    V("urn:isbn:123 456", "urn", null, null, -1L, "isbn:123 456", null, null),
    V("foo:/bar", "foo", null, null, -1L, "/bar", null, null),
    V("foo://", "foo", null, null, -1L, "", null, null),
    V("foo:///p", "foo", null, null, -1L, "/p", null, null),
    V("foo://h:9999/p", "foo", "h", "h", 9999L, "/p", null, null),
    V("file:///tmp/x", "file", null, null, -1L, "/tmp/x", null, null),
    V("file://host/x", "file", "host", "host", -1L, "/x", null, null),
    V("file://localhost/x", "file", null, null, -1L, "/x", null, null),
    V("file:x", "file", null, null, -1L, "/x", null, null),
    V("file:/x", "file", null, null, -1L, "/x", null, null),
    V("file:////x", "file", null, null, -1L, "//x", null, null),
    V("file://c:/x", "file", null, null, -1L, "/c:/x", null, null),
    V("file:c:/x", "file", null, null, -1L, "/c:/x", null, null),
    V("file:///p?q#f", "file", null, null, -1L, "/p", "q", "f"),
    V("  http://trim.me/  ", "http", "trim.me", "trim.me", 80L, "/", null, null),
    V("http://a.com/x\ty\nz", "http", "a.com", "a.com", 80L, "/xyz", null, null),
    V("http://STRASSE.de/", "http", "strasse.de", "strasse.de", 80L, "/", null, null),
    V("https://\u1e9e.de/", "https", "ss.de", "ss.de", 443L, "/", null, null),
    V("http://\u03b1\u03a3.gr/", "http", "xn--mxa0b.gr", "xn--mxa0b.gr", 80L, "/", null, null),
    V("http://a\u3002b.c/", "http", "a.b.c", "a.b.c", 80L, "/", null, null),
    V("http://\uff11\uff12\uff13.com/", "http", "123.com", "123.com", 80L, "/", null, null),
    V("http://xn--a.com/"),
    V("http://xn--.com/"),
    V("http://xn--ls8h.la/", "http", "xn--ls8h.la", "xn--ls8h.la", 80L, "/", null, null),
    V("http://caf\u00e9.fr/", "http", "xn--caf-dma.fr", "xn--caf-dma.fr", 80L, "/", null, null),
    V("https://\u00c5A.se/", "https", "xn--a-1fa.se", "xn--a-1fa.se", 443L, "/", null, null),
    V("http://\u0131.com/", "http", "xn--cfa.com", "xn--cfa.com", 80L, "/", null, null),
    V("http://\u2168.com/", "http", "ix.com", "ix.com", 80L, "/", null, null),
    V("foo://127.0.0.1/", "foo", "127.0.0.1", "127.0.0.1", -1L, "/", null, null),
    V("foo://1.2.3.4:9/x", "foo", "1.2.3.4", "1.2.3.4", 9L, "/x", null, null),
    V("http://a:99999/x"),
    V("www.google.com"),
    V("foo://a\\b/c"),
    V("http://a b/"),
    V("http://a%20b/"),
    V("foo://a b/"),
    V("http://ex ample.com/"),
    V("http://1.2.3.4.5/"),
    V("http://256.1.1.1/"),
    V("http://a.0x100/"),
    V("http://08.1.1.1/"),
    V("http://[::1/"),
    V("http://[zz]/"),
    V("http://"),
    V("http:"),
    V(""),
    V("notaurl"),
    V("1http://a/"),
    V("http://[1:2:3:4:5:6:7:8:9]/"),
    V("http://a..b/", "http", "a..b", "a..b", 80L, "/", null, null),
    V("http://a.0xg/", "http", "a.0xg", "a.0xg", 80L, "/", null, null),
    V("http://ab%gg.com/"),
    V("http://xn--99999999.com/"))

  private def part(u: String, w: String): String = {
    val r = UrlParse.part(UTF8String.fromString(u), UTF8String.fromString(w))
    if (r == null) null else r.toString
  }

  test("node-oracle vectors: every accessor agrees") {
    vectors.foreach { v =>
      assert(part(v.in, "scheme") == v.scheme, s"scheme of ${v.in}")
      assert(part(v.in, "host") == v.host, s"host of ${v.in}")
      assert(part(v.in, "domain") == v.domain, s"domain of ${v.in}")
      assert(UrlParse.port(UTF8String.fromString(v.in)) == v.port, s"port of ${v.in}")
      assert(part(v.in, "path") == v.path, s"path of ${v.in}")
      assert(part(v.in, "query") == v.query, s"query of ${v.in}")
      assert(part(v.in, "fragment") == v.fragment, s"fragment of ${v.in}")
    }
  }

  test("reference's own unit vectors (fnc/parse.rs tests)") {
    assert(UrlParse.port(UTF8String.fromString("http://www.google.com:80")) == 80L)
    assert(UrlParse.port(UTF8String.fromString("http://www.google.com:8080")) == 8080L)
    assert(UrlParse.port(UTF8String.fromString("http://www.google.com")) == 80L)
    assert(UrlParse.port(UTF8String.fromString("www.google.com")) == -1L)
  }

  test("parse::email — addr-crate accessor semantics") {
    import UrlParse.parseEmail
    assert(parseEmail("john.doe@example.com") == Some(("john.doe", "example.com")))
    assert(parseEmail("user+tag@mail.example.org") == Some(("user+tag", "mail.example.org")))
    // IDN host kept AS WRITTEN (addr keeps the input form; no punycoding)
    assert(parseEmail("u@b\u00fccher.de") == Some(("u", "b\u00fccher.de")))
    // bracketed literals go through std IpAddr::from_str: bare forms
    // parse (IPv6 renders as Rust Display), the RFC 5321 IPv6: tag does
    // NOT (golden parse/email/host.surql pins NONE for the tagged form)
    assert(parseEmail("u@[127.0.0.1]") == Some(("u", "127.0.0.1")))
    assert(parseEmail("u@[0:0:0:0:0:0:0:1]") == Some(("u", "::1")))
    assert(parseEmail("u@[::ffff:1.2.3.4]") == Some(("u", "::ffff:1.2.3.4")))
    assert(parseEmail("u@[IPv6:0:0:0:0:0:0:0:1]").isEmpty)
    assert(parseEmail("u@[127.0.00.1]").isEmpty) // std rejects leading zeros
    // quoted local part allowed, written form kept
    assert(parseEmail("\"john doe\"@example.com") == Some(("\"john doe\"", "example.com")))
    // invalid → None (reference: parse error → Value::None)
    assert(parseEmail("not-an-email").isEmpty)
    assert(parseEmail("a@").isEmpty)
    assert(parseEmail("@b.com").isEmpty)
    assert(parseEmail("a..b@example.com").isEmpty)
    assert(parseEmail(".a@example.com").isEmpty)
    assert(parseEmail("a b@example.com").isEmpty)
    assert(parseEmail("u@-bad-.com").isEmpty)
    assert(parseEmail("u@[999.1.1.1]").isEmpty)
    assert(parseEmail("u@[zz:yy]").isEmpty)
  }
}
