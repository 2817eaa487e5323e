"""Property + example tests for O1 canonicalization (SURVEY §5.4)."""

import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from aspseek_ray.functions.url import canonicalize, host_of


CASES = [
    # lowercase scheme+host
    ("HTTP://Host001.Example/Path", "http://host001.example/Path"),
    # strip fragment
    ("http://h.example/p#frag", "http://h.example/p"),
    ("http://h.example/p#", "http://h.example/p"),
    # default ports stripped, non-default kept
    ("http://h.example:80/p", "http://h.example/p"),
    ("https://h.example:443/p", "https://h.example/p"),
    ("http://h.example:8080/p", "http://h.example:8080/p"),
    ("https://h.example:80/p", "https://h.example:80/p"),
    # empty path -> /
    ("http://h.example", "http://h.example/"),
    ("http://h.example?a=1", "http://h.example/?a=1"),
    # dot segments
    ("http://h.example/a/b/../c", "http://h.example/a/c"),
    ("http://h.example/a/./b", "http://h.example/a/b"),
    ("http://h.example/../a", "http://h.example/a"),
    ("http://h.example/a/b/..", "http://h.example/a/"),
    # query param sort by (key, value), duplicates kept
    ("http://h.example/p?b=2&a=1", "http://h.example/p?a=1&b=2"),
    ("http://h.example/p?a=2&a=1&b=0", "http://h.example/p?a=1&a=2&b=0"),
    ("http://h.example/p?b&a=1", "http://h.example/p?a=1&b"),
    # non-http(s) rejected
    ("mailto:x@y.z", None),
    ("javascript:void(0)", None),
    ("ftp://h.example/f", None),
    ("", None),
]


@pytest.mark.parametrize("url,expected", CASES)
def test_examples(url, expected):
    assert canonicalize(url) == expected


RELATIVE_CASES = [
    ("p3.html", "http://h.example/d1/p1.html", "http://h.example/d1/p3.html"),
    ("../d2/", "http://h.example/d1/p1.html", "http://h.example/d2/"),
    ("/d2/p1.html", "http://h.example/d1/p1.html", "http://h.example/d2/p1.html"),
    ("#frag", "http://h.example/d1/p1.html", "http://h.example/d1/p1.html"),
    ("", "http://h.example/d1/p1.html", "http://h.example/d1/p1.html"),
    ("http://other.example/x", "http://h.example/", "http://other.example/x"),
    ("//other.example/x", "https://h.example/", "https://other.example/x"),
]


@pytest.mark.parametrize("url,base,expected", RELATIVE_CASES)
def test_relative_resolution(url, base, expected):
    assert canonicalize(url, base) == expected


def test_host_of():
    assert host_of("http://host001.example:8080/p") == "host001.example"


def test_idempotent_examples():
    for url, expected in CASES:
        if expected is not None:
            assert canonicalize(expected) == expected


if HAVE_HYP:
    _hosts = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,6}){1,2}", fullmatch=True)
    _paths = st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,4}/?", fullmatch=True)
    _querys = st.from_regex(r"([a-z]{1,3}=[a-z0-9]{0,3}&){0,3}[a-z]{1,3}=[a-z0-9]{0,3}", fullmatch=True)

    @given(host=_hosts, path=_paths, query=_querys,
           scheme=st.sampled_from(["http", "https", "HTTP"]),
           frag=st.sampled_from(["", "#x", "#"]))
    @settings(max_examples=200, deadline=None)
    def test_idempotence_property(host, path, query, scheme, frag):
        url = f"{scheme}://{host}{path}?{query}{frag}"
        c = canonicalize(url)
        assert c is not None
        assert canonicalize(c) == c
        assert "#" not in c

    @given(host=_hosts, path=_paths)
    @settings(max_examples=100, deadline=None)
    def test_fragment_port_invariance(host, path):
        base = canonicalize(f"http://{host}{path}")
        assert canonicalize(f"http://{host}:80{path}#zzz") == base


def test_host_of_arrow_matches_scalar_examples():
    import pyarrow as pa

    from aspseek_ray.functions.url import host_of, host_of_arrow

    urls = [
        "http://a.example/",
        "https://B.EXAMPLE:8443/p?q=1",
        "http://h:80/",
        "http://user:pw@h.example/p",          # userinfo -> fallback
        "http://[::1]:8080/p",                 # IPv6 -> fallback
        "not-a-url",                           # no scheme -> fallback
        "http:///rootless",                    # empty authority
        "ftp://files.example/x",
        "http://ho st/odd",
        "",
    ]
    got = host_of_arrow(pa.array(urls, pa.string())).to_pylist()
    assert got == [host_of(u) for u in urls]


if HAVE_HYP:
    @given(host=_hosts, path=_paths,
           scheme=st.sampled_from(["http", "https", "HTTP"]),
           port=st.sampled_from(["", ":80", ":8080"]))
    @settings(max_examples=200, deadline=None)
    def test_host_of_arrow_property(host, path, scheme, port):
        import pyarrow as pa

        from aspseek_ray.functions.url import host_of, host_of_arrow

        url = f"{scheme}://{host}{port}{path}"
        got = host_of_arrow(pa.array([url], pa.string())).to_pylist()
        assert got == [host_of(url)]
