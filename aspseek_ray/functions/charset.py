"""Charset detection / recode + MIME gate (SURVEY.md O5/O7; reference:
src/charsets.cpp / src/ucharset.cpp charset tables + the Content-Type
checks in src/content.cpp, and the Mime external-converter hook, O9).

The reference recodes every input charset to its internal 2-byte Unicode
using shipped tables; here Python's codec machinery plays the table role.
Detection precedence (reference behavior: header wins over meta):

  1. charset= parameter of the Content-Type header,
  2. BOM sniff (utf-8-sig / utf-16 le/be),
  3. <meta charset=...> or <meta http-equiv=content-type ...> in the first
     ``_SNIFF_BYTES`` bytes (ASCII-compatible scan),
  4. content-based n-gram guess (functions/charguess.py — the reference's
     ``.lm`` CharsetGuesser role) for bodies with high bytes that are NOT
     valid UTF-8,
  5. fallback: utf-8.

Decoding always uses errors="replace" — a bad byte must never kill an
indexing pass (reference: bad sequences map to the replacement char).
"""

from __future__ import annotations

import codecs
import re
from collections.abc import Callable

__all__ = [
    "detect_charset",
    "decode_html",
    "mime_allowed",
    "register_extractor",
    "convert_to_text",
]

_SNIFF_BYTES = 2048

_CT_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I)

# charset aliases the codecs module doesn't know under their web names
# (incl. the legacy CJK labels the reference ships tables for — the
# recode itself is the stdlib codec, SURVEY O7 etc/charsets/ role)
_ALIASES = {
    "windows-1251": "cp1251",
    "windows-1252": "cp1252",
    "win-1251": "cp1251",
    "x-sjis": "shift_jis",
    "unicode": "utf-16",
    # Japanese
    "x-euc-jp": "euc_jp",
    "shift-jis-2004": "shift_jis_2004",
    # Korean: the WHATWG encoding standard maps euc-kr family labels to
    # the windows superset cp949
    "ks_c_5601-1987": "cp949",
    "ksc5601": "cp949",
    "x-windows-949": "cp949",
    # Chinese
    "gb_2312-80": "gb2312",
    "x-gbk": "gbk",
    "big-5": "big5",
    "cn-big5": "big5",
}


def _normalize(name: str) -> str | None:
    name = _ALIASES.get(name.strip().lower(), name.strip().lower())
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def detect_charset(content_type: str | None, html: bytes | None) -> str:
    """Charset for a fetched body per the precedence above. Always returns
    a codec name Python can decode with (unknown labels fall back to
    utf-8, mirroring the reference's default-charset config)."""
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            cs = _normalize(m.group(1))
            if cs:
                return cs
    if html:
        if html.startswith(codecs.BOM_UTF8):
            return "utf-8-sig"
        if html.startswith(codecs.BOM_UTF16_LE) or html.startswith(
                codecs.BOM_UTF16_BE):
            return "utf-16"
        m = _META_CHARSET_RE.search(html[:_SNIFF_BYTES])
        if m:
            cs = _normalize(m.group(1).decode("ascii", "replace"))
            if cs:
                return cs
        # unlabeled body: a clean strict-UTF-8 window stays utf-8 (and a
        # pure-ASCII window trivially so — byte-stable for utf-8 corpora);
        # otherwise ask the n-gram charset guesser
        window = html[:_SNIFF_BYTES]
        try:
            window.decode("utf-8", errors="strict")
        except UnicodeDecodeError as e:
            if e.start >= len(window) - 3 and len(html) > len(window):
                return "utf-8"   # multi-byte seq cut by the sniff window
            from aspseek_ray.functions.charguess import guess_charset

            cs = guess_charset(html)
            if cs:
                return _normalize(cs) or "utf-8"
    return "utf-8"


def decode_html(html: bytes | str, content_type: str | None = None) -> str:
    """Decode a fetched body to str using the detected charset
    (errors='replace' — never raises). The O7 recode seam: pipelines that
    receive non-UTF-8 bodies call this before the normative extractor."""
    if isinstance(html, str):
        return html
    return html.decode(detect_charset(content_type, html), errors="replace")


# ----------------------------------------------------------------- MIME gate
_INDEXABLE = frozenset({"text/html", "text/plain"})
_EXTRACTORS: dict[str, Callable[[bytes], str]] = {}


def register_extractor(content_type: str,
                       fn: Callable[[bytes], str]) -> None:
    """O9 external-converter hook (reference `Mime <from> <to> "cmd"`):
    registers a python callable converting a non-HTML body to text; the
    MIME gate then admits that type."""
    _EXTRACTORS[content_type.lower()] = fn


def mime_allowed(content_type: str | None) -> bool:
    """O5 MIME gate: index text/html, text/plain, and any type with a
    registered converter; everything else is fetch-only."""
    if not content_type:
        return True  # reference treats missing Content-Type as HTML
    base = content_type.split(";", 1)[0].strip().lower()
    return base in _INDEXABLE or base in _EXTRACTORS


def convert_to_text(content_type: str, body: bytes) -> str | None:
    """Run the registered converter for ``content_type`` (None if there is
    none and the type is not natively indexable)."""
    base = content_type.split(";", 1)[0].strip().lower()
    fn = _EXTRACTORS.get(base)
    if fn is not None:
        return fn(body)
    if base in _INDEXABLE:
        return decode_html(body, content_type)
    return None
