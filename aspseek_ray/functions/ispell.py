"""Ispell affix-dictionary morphology (SURVEY.md O13's dictionary half;
reference: src/spell.cpp + src/affix.cpp — ASPseek loads ispell affix
and dictionary files per language and reduces every indexed/query word to
its dictionary root, falling back to the word itself when unknown).

This module implements the PUBLIC ispell affix-file format (Gorin's
ispell, documented in ispell(4)/aspell docs — the format itself is the
spec; no reference code involved):

    prefixes                         # section headers
    suffixes
    flag *S:                         # '*' = may combine with prefixes
        [^AEIOUY] Y   >   -Y,IES     # condition > -strip,append
        [SXZH]        >   ES         # condition > append
        .             >   'S         # '.' matches anything

and dictionary lines ``root/FLAGS`` (or a bare ``root``).  Conditions are
a sequence of character classes matched against the END of the root for
suffixes and the START for prefixes; ``-strip,append`` removes ``strip``
from the root before appending.

The engine builds the full surface-form -> root expansion ONCE (the
ispell hash-file role) and reduces by lookup.  At 100-TB crawl scale the
expanded map is still dictionary-sized (a few hundred thousand entries,
tens of MB) — broadcast it with ray.put once and look up inside
map_batches, exactly like the robots/redirect dim tables.  Plug the
reducer into the O13 seam with
``morphology.register_reducer(IspellReducer.from_files(...))``.

No dictionaries ship in this sandbox; tests exercise the machinery with a
small fixture dictionary written in the ispell format.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

__all__ = ["AffixRule", "parse_affix_file", "parse_dict_file",
           "expand_root", "IspellReducer"]

_FLAG_RE = re.compile(r"flag\s+(\*?)(\S+)\s*:\s*$", re.I)
_RULE_RE = re.compile(r"^(?P<cond>\S+(?:\s+\S+)*?)\s*>\s*"
                      r"(?:-(?P<strip>[A-Za-z']+)\s*,\s*)?"
                      r"(?P<append>[A-Za-z']+|-)\s*$")
_CLASS_RE = re.compile(r"\[\^?[^\]]*\]|[A-Za-z'.]")


@dataclass(frozen=True)
class AffixRule:
    flag: str
    kind: str                 # "prefix" | "suffix"
    cross: bool               # '*' flag: prefix x suffix composition ok
    classes: tuple[str, ...]  # condition char classes, in word order
    strip: str
    append: str

    def matches(self, root: str) -> bool:
        n = len(self.classes)
        if len(root) < n:
            return False
        part = root[-n:] if self.kind == "suffix" else root[:n]
        for ch, cl in zip(part, self.classes):
            if not _class_match(ch, cl):
                return False
        return True

    def apply(self, root: str) -> str | None:
        if not self.matches(root):
            return None
        if self.kind == "suffix":
            if self.strip:
                if not root.endswith(self.strip):
                    return None
                root = root[: len(root) - len(self.strip)]
            return root + self.append
        if self.strip:
            if not root.startswith(self.strip):
                return None
            root = root[len(self.strip):]
        return self.append + root


def _class_match(ch: str, cl: str) -> bool:
    if cl == ".":
        return True
    if len(cl) == 1:
        return ch == cl
    body = cl[1:-1]
    neg = body.startswith("^")
    if neg:
        body = body[1:]
    return (ch in body) != neg


def parse_affix_file(text: str) -> list[AffixRule]:
    """Parse ispell affix-file text into rules.  Lowercases everything
    (the engine tokenizer is lowercase); ignores blank/comment lines and
    the header directives other than prefixes/suffixes/flag."""
    rules: list[AffixRule] = []
    kind: str | None = None
    flag: str | None = None
    cross = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        low = line.lower()
        if low == "prefixes":
            kind, flag = "prefix", None
            continue
        if low == "suffixes":
            kind, flag = "suffix", None
            continue
        m = _FLAG_RE.match(low)
        if m:
            if kind is None:
                raise ValueError("flag before prefixes/suffixes section")
            cross = bool(m.group(1))
            flag = m.group(2).upper()
            continue
        m = _RULE_RE.match(line)
        if m and kind and flag:
            classes = tuple(c.lower() for c in
                            _CLASS_RE.findall(m.group("cond")))
            append = m.group("append")
            rules.append(AffixRule(
                flag=flag, kind=kind, cross=cross, classes=classes,
                strip=(m.group("strip") or "").lower(),
                append=("" if append == "-" else append.lower())))
    return rules


def parse_dict_file(text: str) -> list[tuple[str, str]]:
    """Dictionary lines ``root/FLAGS`` -> [(root, flags)]."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        root, _, flags = line.partition("/")
        out.append((root.strip().lower(), flags.strip().upper()))
    return out


def expand_root(root: str, flags: str,
                rules: list[AffixRule]) -> set[str]:
    """All surface forms of ``root`` under its flags: the root itself,
    each applicable single affix, and prefix+suffix compositions where
    both flags are cross-marked (*) — ispell's affix composition rule."""
    forms = {root}
    pref, suff = [], []
    for r in rules:
        if r.flag not in flags:
            continue
        f = r.apply(root)
        if f is not None:
            forms.add(f)
            (pref if r.kind == "prefix" else suff).append((r, f))
    for pr, _ in pref:
        if not pr.cross:
            continue
        for sr, sf in suff:
            if sr.cross:
                f = pr.apply(sf)
                if f is not None:
                    forms.add(f)
    return forms


class IspellReducer:
    """form -> root lookup reducer (the LoadIspell role).  Unknown words
    reduce to themselves.  Ambiguous forms (two roots expand to the same
    surface) resolve to the lexicographically smallest root —
    deterministic, pinned here."""

    def __init__(self, form_to_root: dict[str, str]):
        self._map = form_to_root

    @classmethod
    def from_strings(cls, affix_text: str, dict_text: str) -> "IspellReducer":
        rules = parse_affix_file(affix_text)
        mapping: dict[str, str] = {}
        for root, flags in parse_dict_file(dict_text):
            for form in expand_root(root, flags, rules):
                prev = mapping.get(form)
                if prev is None or root < prev:
                    mapping[form] = root
        return cls(mapping)

    @classmethod
    def from_files(cls, affix_path: str | Path,
                   dict_path: str | Path) -> "IspellReducer":
        return cls.from_strings(Path(affix_path).read_text(),
                                Path(dict_path).read_text())

    def __call__(self, word: str) -> str:
        w = word.lower()
        return self._map.get(w, w)

    def __len__(self) -> int:
        return len(self._map)
