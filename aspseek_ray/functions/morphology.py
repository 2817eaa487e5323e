"""Morphology (SURVEY.md O13; reference: src/spell.cpp / src/affix.cpp —
ispell affix dictionaries reduce words to base forms at index time and
expand query terms at search time).

No ispell dictionaries exist in this sandbox, so the reduction rule is the
public Porter stemming algorithm (Porter, "An algorithm for suffix
stripping", Program 14(3), 1980) — a self-contained, deterministic
English suffix stripper that plays the same role: index-side stem
normalization + query-side form matching. The ispell seam remains:
``register_reducer`` swaps in a dictionary-backed reducer when
dictionaries are available.

Implementation note: this is a faithful compact Porter (steps 1a–5b)
written against the published algorithm description, not a port of any
particular implementation.
"""

from __future__ import annotations

from collections.abc import Callable

__all__ = ["porter_stem", "stem", "register_reducer"]

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem_: str) -> int:
    """Porter's m: number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    prev_v = False
    for i in range(len(stem_)):
        v = not _is_cons(stem_, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem_: str) -> bool:
    return any(not _is_cons(stem_, i) for i in range(len(stem_)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def _replace(w: str, suf: str, rep: str, min_m: int) -> str | None:
    if not w.endswith(suf):
        return None
    stem_ = w[: len(w) - len(suf)]
    if _measure(stem_) > min_m - 1:
        return stem_ + rep
    return w  # suffix matched but condition failed: stop this step


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif ((w.endswith("ed") and _has_vowel(w[:-2]))
          or (w.endswith("ing") and _has_vowel(w[:-3]))):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            w = _replace(w, suf, rep, 1) or w
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            w = _replace(w, suf, rep, 1) or w
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem_ = w[: len(w) - len(suf)]
            if suf == "ion":
                pass
            if _measure(stem_) > 1:
                w = stem_
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
            stem_ = w[:-3]
            if _measure(stem_) > 1:
                w = stem_
    # step 5a
    if w.endswith("e"):
        stem_ = w[:-1]
        m = _measure(stem_)
        if m > 1 or (m == 1 and not _cvc(stem_)):
            w = stem_
    # step 5b
    if _ends_double_cons(w) and w.endswith("l") and _measure(w) > 1:
        w = w[:-1]
    return w


_reducer: Callable[[str], str] = porter_stem


def register_reducer(fn: Callable[[str], str]) -> None:
    """The ispell seam: replace the stemmer with a dictionary-backed
    reducer (reference: LoadIspell + affix expansion)."""
    global _reducer
    _reducer = fn


def stem(word: str) -> str:
    return _reducer(word)
