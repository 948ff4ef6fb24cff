const cases = [
 // plain
 "http://www.google.com", "http://www.google.com/", "http://example.com/a/b?x=1&y=2#frag",
 "https://shop.example.com/parts/42?brand=Brand12", "http://sub.domain.example.org/deep/path/file.html",
 // case + defaults
 "HTTP://EXAMPLE.com/Path", "HtTpS://A.B.C/", "http://a.com:80/", "https://a.com:443/", "ftp://a.com:21/",
 "ws://a.com:80/x", "wss://a.com:443/x", "http://a.com:8080/", "https://a.com:80/", "ftp://h/dir/f.txt",
 // ports
 "http://a:0/x", "http://a:65535/", "http://a:/x", "foo://a:0/x", "foo://host:21/",
 // userinfo
 "http://user@host.com/", "http://user:pw@host.com:99/p?q=1#f", "http://a@b@c.com/x",
 // ipv4
 "http://127.0.0.1/x", "http://0x7f.1/", "http://1.2.3.4./", "http://2130706433/", "http://0300.0250.0.01/",
 // ipv6
 "http://[::1]:99/x", "http://[1:0:0:0:0:0:0:1]/", "http://[2001:db8::8:800:200c:417a]/", "http://[::ffff:1.2.3.4]/",
 "http://[0:1:0:0:0:0:0:0]/", "http://[::]/", "http://[1:2:3:4:5:6:7:8]/",
 // idna
 "http://bücher.de/", "https://例え.jp/", "http://ß.de/", "http://Ⅷ.com/", "http://xn--bcher-kva.de/",
 "http://%65xample.com/", "http://STRASSE.de/",
 // paths
 "http://a/b/../c/./d", "http://a\\b\\c/d", "http://a/b/..", "http://a/..", "http://a/b/%2e", "http://a/%2e%2E/b",
 "http://a/p a/q", "http://a/%41%zz/x", "http://a/{b}|c^", "http://a/p?q{}|'x", "https://a/p?it's", "http://a#f{}`|",
 // query/fragment presence
 "http://a/?", "http://a?", "http://a#", "http://a/?#", "http://a/?#f", "http://a/?q#", "foo://h/p?",
 // non-special
 "foo://HostName/Path", "foo://%41b/", "foo://a%2Fb/", "foo://ab%/", "foo:opaque path?q#f", "mailto:john@example.com",
 "data:text/plain,hi there", "urn:isbn:123 456", "foo:/bar", "foo://", "foo:///p", "foo://h:9999/p",
 // file
 "file:///tmp/x", "file://host/x", "file://localhost/x", "file:x", "file:/x", "file:////x", "file://c:/x", "file:c:/x",
 "file:///p?q#f",
 // whitespace trim
 "  http://trim.me/  ", "http://a.com/x\ty\nz",
 // idna hard cases (r20 fuzz catches: xn-- validity, full casefold, label separators)
 "http://STRASSE.de/", "https://\u1e9e.de/", "http://\u03b1\u03a3.gr/", "http://a\u3002b.c/", "http://\uff11\uff12\uff13.com/",
 "http://xn--a.com/", "http://xn--.com/", "http://xn--ls8h.la/", "http://caf\u00e9.fr/", "https://\u00c5A.se/",
 "http://\u0131.com/", "http://\u2168.com/", "foo://127.0.0.1/", "foo://1.2.3.4:9/x",
 // errors
 "http://a:99999/x", "www.google.com", "foo://a\\b/c", "http://a b/", "http://a%20b/", "foo://a b/",
 "http://ex ample.com/", "http://1.2.3.4.5/", "http://256.1.1.1/", "http://a.0x100/", "http://08.1.1.1/",
 "http://[::1/", "http://[zz]/", "http://", "http:", "", "notaurl", "1http://a/", "http://[1:2:3:4:5:6:7:8:9]/",
 "http://a..b/", "http://a.0xg/", "http://ab%gg.com/", "http://xn--99999999.com/"
];
const special = {"http:":"80","https:":"443","ws:":"80","wss:":"443","ftp:":"21"};
const out = [];
for (const c of cases) {
  try {
    const u = new URL(c);
    const beforeHash = u.href.split("#")[0];
    const q = u.search !== "" ? u.search.slice(1) : (beforeHash.endsWith("?") ? "" : null);
    const f = u.hash !== "" ? u.hash.slice(1) : (u.href.endsWith("#") ? "" : null);
    const host = u.hostname === "" ? null : u.hostname;
    const isSpecial = special[u.protocol] !== undefined || u.protocol === "file:";
    // IPv4 parsing only happens for special schemes; a dotted-quad host of
    // a non-special scheme is an OPAQUE host, which rust-url stores as
    // Host::Domain - so domain() answers it
    const isIp = host !== null && (host.startsWith("[") || (isSpecial && /^\d+\.\d+\.\d+\.\d+$/.test(host)));
    const explicit = u.port === "" ? null : parseInt(u.port);
    const dflt = special[u.protocol] ? parseInt(special[u.protocol]) : null;
    out.push({in:c, scheme:u.protocol.slice(0,-1), host, domain: (host !== null && !isIp) ? host : null,
      port: explicit !== null ? explicit : dflt, path:u.pathname, query:q, fragment:f});
  } catch(e) { out.push({in:c, err:true}); }
}
console.log(JSON.stringify(out, null, 0));
