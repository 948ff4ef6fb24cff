package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ammonia

/** The ammonia-subset HTML sanitizer behind `string::html::sanitize`
  * (reference: fnc/string.rs:388 `ammonia::clean`, ammonia 4.1 defaults)
  * and the `clean_text` escape behind `::encode`. Anchors: the
  * reference's OWN unit vectors (fnc/string.rs tests html_encode /
  * html_sanitize) and the golden encode.surql, then ammonia's documented
  * default-config behaviors (allowlist, clean-content tags, unwrapping,
  * attribute and URL-scheme filtering, link_rel injection, comment
  * stripping, html5ever serialization). */
class AmmoniaSpec extends AnyFunSuite {

  test("reference unit vectors") {
    // fnc/string.rs html_encode test
    assert(Ammonia.cleanText("<div>Hello world!</div>") ==
      "&lt;div&gt;Hello&#32;world!&lt;&#47;div&gt;")
    assert(Ammonia.cleanText("SurrealDB") == "SurrealDB")
    // golden language/functions/string/html/encode.surql
    assert(Ammonia.cleanText("<#!DOCTYPE HTML><div onclick=\"foo()\">Hello world!</div>") ==
      "&lt;#!DOCTYPE&#32;HTML&gt;&lt;div&#32;onclick&#61;&quot;foo()&quot;&gt;Hello&#32;world!&lt;&#47;div&gt;")
    // fnc/string.rs html_sanitize test — THE r20 divergence: div is an
    // allowed tag and must survive; script drops element AND content
    assert(Ammonia.clean("<div>Hello world!</div>") == "<div>Hello world!</div>")
    assert(Ammonia.clean("XSS<script>attack</script>") == "XSS")
  }

  test("allowlist: disallowed tags unwrap, clean-content tags drop text") {
    assert(Ammonia.clean("<form><b>keep</b></form>") == "<b>keep</b>")
    assert(Ammonia.clean("<style>p{color:red}</style>ok") == "ok")
    assert(Ammonia.clean("<video>inner</video>") == "inner")
    // unclosed allowed tag closes at EOF (html5ever tree repair)
    assert(Ammonia.clean("<div>open") == "<div>open</div>")
    // end tag with no open tag is ignored
    assert(Ammonia.clean("close</div>ed") == "closeed")
  }

  test("attribute filtering + link_rel") {
    assert(Ammonia.clean("""<div onclick="x()" title="t">a</div>""") ==
      """<div title="t">a</div>""")
    assert(Ammonia.clean("""<a href="/rel">x</a>""") ==
      """<a href="/rel" rel="noopener noreferrer">x</a>""")
    assert(Ammonia.clean("""<a href="https://e.com/">x</a>""") ==
      """<a href="https://e.com/" rel="noopener noreferrer">x</a>""")
    // javascript: scheme not in the default set → href removed, a kept
    assert(Ammonia.clean("""<a href="javascript:alert(1)">x</a>""") ==
      """<a rel="noopener noreferrer">x</a>""")
    // a user-supplied rel is replaced by the configured one
    assert(Ammonia.clean("""<a rel="opener">x</a>""") ==
      """<a rel="noopener noreferrer">x</a>""")
    assert(Ammonia.clean("""<img src="x.png" alt="a" onerror="p()">""") ==
      """<img src="x.png" alt="a">""")
  }

  test("comments, doctype, bogus markup drop; text escapes on the way out") {
    assert(Ammonia.clean("a<!-- hidden -->b") == "ab")
    assert(Ammonia.clean("<!DOCTYPE html>x") == "x")
    assert(Ammonia.clean("1 < 2 & 3 > 2") == "1 &lt; 2 &amp; 3 &gt; 2")
    // decoded entities re-encode per the html5ever serializer
    assert(Ammonia.clean("&lt;b&gt;no&lt;/b&gt;") == "&lt;b&gt;no&lt;/b&gt;")
    assert(Ammonia.clean("&unknown; stays") == "&amp;unknown; stays")
  }

  test("structure: void elements, implied end tags, raw text") {
    assert(Ammonia.clean("a<br>b") == "a<br>b")
    assert(Ammonia.clean("<ul><li>1<li>2</ul>") == "<ul><li>1</li><li>2</li></ul>")
    assert(Ammonia.clean("<p>a<p>b") == "<p>a</p><p>b</p>")
    // script content does not open tags ("</scr" + "ipt>" tricks aside)
    assert(Ammonia.clean("<script><div>not-a-div</div></script>z") == "z")
    // textarea is RCDATA: not allowed → unwrapped to its decoded text
    assert(Ammonia.clean("<textarea>&amp; &lt;raw&gt;</textarea>") ==
      "&amp; &lt;raw&gt;")
  }
}
