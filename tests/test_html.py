"""Tests for the normative HTML->text pass (O6, FIXTURES.md §3.2) and link
extraction."""

from aspseek_ray.functions.html import (extract_text, extract_links,
                                        extract_text_and_links)


def test_basic_blocks_and_inline():
    html = b"<html><head><title>Ti</title></head><body><p>a <b>bold</b> c</p><div>d</div></body></html>"
    assert extract_text(html) == "Ti\na bold c\nd"


def test_script_style_comment_removed():
    html = (
        b"<p>keep</p><script type='x'>var a = '<p>no</p>';</script>"
        b"<style>p { color: red }</style><!-- <p>gone</p> --><p>also</p>"
    )
    assert extract_text(html) == "keep\nalso"


def test_script_case_insensitive_nongreedy():
    html = b"<SCRIPT>one</SCRIPT>mid<script>two</script >end"
    assert extract_text(html) == "midend"


def test_entities():
    assert extract_text(b"<p>a &amp; b &lt;c&gt; &quot;d&quot;</p>") == 'a & b <c> "d"'
    assert extract_text(b"<p>x&nbsp;y</p>") == "x y"
    assert extract_text(b"<p>&#65;&#x42;</p>") == "AB"
    # unknown entities pass through verbatim
    assert extract_text(b"<p>&bogus; &copy2;</p>") == "&bogus; &copy2;"


def test_whitespace_collapse():
    html = b"<p>  a\t\tb  </p>\n\n<p>c</p>"
    assert extract_text(html) == "a b\nc"


def test_utf8_replace():
    assert extract_text(b"<p>caf\xc3\xa9 \xff</p>") == "café �"


def test_str_input_equals_bytes_input():
    h = "<p>héllo</p>"
    assert extract_text(h) == extract_text(h.encode("utf-8"))


def test_extract_links_order_and_base():
    html = (
        b"<html><head><base href='http://b.example/dir/'></head><body>"
        b"<a href='p1.html'>one</a> <a href=\"/abs.html\">two</a>"
        b"<a href=http://o.example/x>three</a>"
        b"<area href='a.html'><frame src='f.html'>"
        b"<a href='mailto:x@y'>m</a><a href='#frag'>f</a></body></html>"
    )
    base, hrefs = extract_links(html)
    assert base == "http://b.example/dir/"
    assert hrefs == ["p1.html", "/abs.html", "http://o.example/x", "a.html", "f.html", "mailto:x@y", "#frag"]


def test_links_not_taken_from_script():
    html = b"<script>document.write('<a href=\"/no\">x</a>')</script><a href='/yes'>y</a>"
    _, hrefs = extract_links(html)
    assert hrefs == ["/yes"]


def test_href_entity_decode():
    _, hrefs = extract_links(b"<a href='/p?a=1&amp;b=2'>x</a>")
    assert hrefs == ["/p?a=1&b=2"]


def test_fused_pass_matches_separate_passes():
    cases = [
        b"<html><head><title>Ti</title><base href='http://b.example/d/'>"
        b"</head><body><p>a <b>bold</b> c &amp; more</p>"
        b"<script>var x = '<a href=\"/no\">x</a>';</script>"
        b"<a href='p1.html'>one</a><area href='a.html'>"
        b"<frame src='f.html'><div>tail \xc3\xa9 \xff</div></body></html>",
        b"",
        b"plain text no tags",
        "<p>str input &lt;ok&gt;</p><a href='/s'>s</a>",
    ]
    for html in cases:
        text, base, hrefs = extract_text_and_links(html)
        assert text == extract_text(html)
        assert (base, hrefs) == extract_links(html)
