"""Content-based charset guessing for unlabeled bodies (SURVEY.md O7's
second half; reference: the ``.lm`` language-map files consumed by
src/charsets.cpp's CharsetGuesser — ASPseek guesses the charset of pages
that carry no header/BOM/meta label by comparing byte n-gram statistics
against per-(language, charset) profiles shipped with the engine).

Method: rank-order n-gram profiles with the out-of-place distance
(Cavnar & Trenkle, "N-Gram-Based Text Categorization", SDAIR 1994 — the
same public method behind ispell/text-cat ``.lm`` files). Profiles here
are BYTE n-grams (n = 1..2) restricted to n-grams containing at least one
high byte (>= 0x80): the ASCII range is shared by every 8-bit charset and
would only dilute the signal, while the high-byte distribution is exactly
what distinguishes cp1251 from koi8-r from latin-1.

The training corpus is a small embedded sample per language (public
common-phrase text written for this module), encoded into each candidate
charset at import time — the ``.lm`` role without shipping binary files.

``guess_charset`` is a FALLBACK: callers (functions/charset.py) only
invoke it when header/BOM/meta detection failed AND the body is not valid
UTF-8 (a strict-UTF-8 body stays utf-8 — UTF-8 is self-synchronizing, so
a clean decode is near-proof; this also keeps pure-ASCII corpora
byte-stable)."""

from __future__ import annotations

from functools import lru_cache

__all__ = ["guess_charset", "candidate_charsets"]

_PROFILE_LEN = 300     # top-N n-grams kept per profile (C&T use 300)
_MIN_HIGH = 4          # need at least this many high bytes to guess
# Abstain when the best candidate's out-of-place distance exceeds this
# fraction of the worst case (len(doc_profile) * max_oop).  Measured:
# in-profile encodings score <= 0.23, foreign ones (shift_jis / gbk /
# euc-jp / binary) >= 0.84 — so 0.5 keeps unknown encodings on the
# caller's safe utf-8+replace fallback instead of a confident mislabel.
_MAX_DIST_FRAC = 0.5

# Embedded per-language samples (common-phrase text; each is encoded into
# the charsets that language is historically served in).  Russian text
# exercises the cp1251/koi8-r/cp866 split the reference cares most about;
# French/German cover the latin-1/cp1252 family.
_SAMPLES: dict[str, str] = {
    "ru": (
        "Съешь же ещё этих мягких французских булок, да выпей чаю. "
        "В чащах юга жил бы цитрус? Да, но фальшивый экземпляр! "
        "Широкая электрификация южных губерний даст мощный толчок "
        "подъёму сельского хозяйства. Мы поговорим о том, как новости "
        "и статьи появляются на страницах газет и журналов каждый день, "
        "почему люди читают книги и пишут письма друг другу."
    ),
    "fr": (
        "Portez ce vieux whisky au juge blond qui fume. Voici le résumé "
        "général de la journée : les élèves étudient à l'école, près de "
        "la fenêtre, pendant que le maître écrit au tableau. L'été "
        "dernier, nous étions allés à la montagne chercher de l'air "
        "frais et de l'eau très pure."
    ),
    "de": (
        "Zwölf Boxkämpfer jagen Viktor quer über den großen Sylter "
        "Deich. Falsches Üben von Xylophonmusik quält jeden größeren "
        "Zwerg. Die Straße führt über die Brücke zum schönen alten "
        "Schloß, wo früher die Könige wohnten und ihre Gäste empfingen."
    ),
}

# (language, charset) pairs to build profiles for.  A guess returns the
# CHARSET (the decode decision); the language is informational.
_CANDIDATES: tuple[tuple[str, str], ...] = (
    ("ru", "cp1251"),
    ("ru", "koi8-r"),
    ("ru", "cp866"),
    ("ru", "iso8859-5"),
    ("fr", "latin-1"),
    ("de", "latin-1"),
)


def candidate_charsets() -> tuple[str, ...]:
    return tuple(sorted({cs for _, cs in _CANDIDATES}))


def _profile(data: bytes, limit: int = _PROFILE_LEN) -> dict[bytes, int]:
    """Rank-order profile of high-byte 1- and 2-grams: ngram -> rank."""
    counts: dict[bytes, int] = {}
    n = len(data)
    for i in range(n):
        b = data[i]
        if b >= 0x80:
            g1 = data[i:i + 1]
            counts[g1] = counts.get(g1, 0) + 1
        if i + 1 < n and (b >= 0x80 or data[i + 1] >= 0x80):
            g2 = data[i:i + 2]
            counts[g2] = counts.get(g2, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    return {g: r for r, (g, _) in enumerate(top)}


@lru_cache(maxsize=1)
def _trained() -> list[tuple[str, str, dict[bytes, int]]]:
    out = []
    for lang, cs in _CANDIDATES:
        data = _SAMPLES[lang].encode(cs, errors="ignore")
        out.append((lang, cs, _profile(data)))
    return out


def guess_charset(body: bytes, sniff: int = 4096) -> str | None:
    """Best-matching 8-bit charset for an unlabeled non-UTF-8 body, or
    None when the body has too few high bytes to judge (caller keeps its
    default).  Deterministic: ties break by candidate order."""
    window = body[:sniff]
    n_high = sum(1 for b in window if b >= 0x80)
    if n_high < _MIN_HIGH:
        return None
    doc = _profile(window)
    max_oop = _PROFILE_LEN          # out-of-place penalty for a miss
    best_cs, best_d = None, None
    for _lang, cs, prof in _trained():
        d = 0
        for g, r in doc.items():
            pr = prof.get(g)
            d += abs(r - pr) if pr is not None else max_oop
        if best_d is None or d < best_d:
            best_cs, best_d = cs, d
    if best_d > _MAX_DIST_FRAC * len(doc) * max_oop:
        return None     # nothing close: unknown encoding, don't guess
    return best_cs
