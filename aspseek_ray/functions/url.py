"""URL canonicalization (SURVEY.md O1; reference: src/url.cpp URL class —
parse/absolute/normalize). Normative spec: FIXTURES.md §3.3.

Rules (the conformance contract):
  * resolve relative references against ``base`` per RFC 3986
    (honoring ``<base href>`` — the caller passes the effective base);
  * lowercase scheme and host;
  * strip ``#fragment``;
  * strip default ports 80 (http) / 443 (https);
  * collapse ``.`` / ``..`` path segments;
  * empty path -> ``/``;
  * sort query parameters by (key, value) — raw ``&``-separated components
    compared as (text-before-first-'=', text-after) — keeping duplicates
    (north_rule extension over the reference, adopted as spec);
  * non-http(s) schemes (mailto:, javascript:, ftp:, …) -> ``None``.

This is THE most correctness-critical single function (SURVEY §2.2 O1);
property-tested in tests/test_url.py (idempotence, invariances).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

__all__ = ["canonicalize", "host_of", "host_of_arrow", "canonicalize_many"]

_ALLOWED_SCHEMES = ("http", "https")
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments over an absolute path."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # preserve trailing slash semantics of '.'/'..' final segments
    if path.endswith(("/.", "/..")) or path.endswith("/"):
        if not output or output[-1] != "":
            output.append("")
    if output and output[0] != "":
        output.insert(0, "")
    return "/".join(output) or "/"


def _sort_query(query: str) -> str:
    if not query:
        return ""
    parts = query.split("&")
    keyed = []
    for p in parts:
        eq = p.find("=")
        if eq < 0:
            keyed.append((p, "", p))
        else:
            keyed.append((p[:eq], p[eq + 1 :], p))
    keyed.sort(key=lambda kv: (kv[0], kv[1]))
    return "&".join(p for _, _, p in keyed)


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Canonical form of ``url`` (resolved against ``base`` if relative),
    or ``None`` if the result is not an http(s) URL."""
    if url is None:
        return None
    url = url.strip()
    if not url and not base:
        return None
    if base:
        url = urljoin(base, url)  # empty reference resolves to base (RFC 3986)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in _ALLOWED_SCHEMES:
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = _remove_dot_segments(parts.path) if parts.path else "/"
    query = _sort_query(parts.query)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def host_of(url: str) -> str:
    """Lowercased hostname (no port/userinfo) of an already-canonical URL."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def host_of_arrow(urls):
    """Vectorized host_of over an Arrow string array: one RE2
    extract_regex sweep pulls the authority, one regex strips the port,
    one utf8_lower — all Arrow C++ kernels. Rows the fast path can't
    mirror bitwise against urlsplit (userinfo '@', IPv6 '[', or no
    '://' at all) fall back to the scalar host_of individually; in the
    crawl's canonical-URL streams that set is empty, so the loop never
    runs. Elementwise-equal to host_of (property-tested)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if len(urls) == 0:
        return pa.array([], pa.string())
    m = pc.extract_regex(urls, r"^[^:/?#]+://(?P<auth>[^/?#]*)")
    auth = pc.struct_field(m, "auth")
    host = pc.utf8_lower(pc.replace_substring_regex(auth, r":.*$", ""))
    odd = pc.fill_null(
        pc.or_(pc.is_null(host), pc.match_substring_regex(auth, r"[@\[]")),
        True)
    if pc.any(odd).as_py():
        vals = host.to_pylist()
        for i in np.flatnonzero(np.asarray(odd)):
            u = urls[int(i)].as_py()
            vals[int(i)] = host_of(u) if u is not None else ""
        return pa.array(vals, pa.string())
    return host.cast(pa.string()) if host.type != pa.string() else host


def canonicalize_many(urls: list[str], base: str | None = None) -> list[str | None]:
    """Bulk wrapper (list-comprehension over the C-heavy stdlib parser; used
    inside map_batches where each element is a short string)."""
    if base is None:
        return [canonicalize(u) for u in urls]
    return [canonicalize(u, base) for u in urls]
