"""Ispell affix-dictionary morphology (functions/ispell.py): format
parsing, expansion semantics, reduction, and the O13 seam."""

import pytest

from aspseek_ray.functions.ispell import (
    AffixRule, IspellReducer, expand_root, parse_affix_file, parse_dict_file,
)

AFF = """
# english-ish demo affix file (ispell format)
prefixes
flag *U:
    .           >   UN          # undo, unscanned

suffixes
flag *S:
    [^AEIOUY] Y >   -Y,IES      # city -> cities
    [AEIOU] Y   >   S           # day -> days
    [SXZH]      >   ES          # box -> boxes
    [^SXZHY]    >   S           # dog -> dogs
flag *D:
    E           >   D           # love -> loved
    [^EY]       >   ED          # scan -> scaned (ispell, not english!)
    [^AEIOU] Y  >   -Y,IED      # try -> tried
flag G:
    E           >   -E,ING      # love -> loving
    [^E]        >   ING         # scan -> scaning
"""

DIC = """
city/S
day/S
box/S
dog/S
love/DG
scan/UDG
try/D
plain
"""


def test_parse_affix_file():
    rules = parse_affix_file(AFF)
    kinds = {(r.flag, r.kind) for r in rules}
    assert ("U", "prefix") in kinds
    assert ("S", "suffix") in kinds
    assert len([r for r in rules if r.flag == "S"]) == 4
    # classes tokenize into per-position char classes
    r = next(r for r in rules if r.flag == "S" and r.strip == "y")
    assert r.classes == ("[^aeiouy]", "y")
    assert r.append == "ies"


def test_parse_dict_file():
    entries = parse_dict_file(DIC)
    assert ("city", "S") in entries
    assert ("plain", "") in entries
    assert ("scan", "UDG") in entries


@pytest.mark.parametrize("root,flags,expected", [
    ("city", "S", {"city", "cities"}),
    ("day", "S", {"day", "days"}),
    ("box", "S", {"box", "boxes"}),
    ("dog", "S", {"dog", "dogs"}),
    ("love", "DG", {"love", "loved", "loving"}),
    ("try", "D", {"try", "tried"}),
    ("plain", "", {"plain"}),
])
def test_expand_root(root, flags, expected):
    rules = parse_affix_file(AFF)
    assert expand_root(root, flags, rules) == expected


def test_cross_product_prefix_suffix():
    rules = parse_affix_file(AFF)
    forms = expand_root("scan", "UDG", rules)
    # U and D are both cross (*) -> unscaned; G is not cross -> no unscaning
    assert {"scan", "unscan", "scaned", "unscaned", "scaning"} <= forms
    assert "unscaning" not in forms


def test_reducer_lookup_and_fallback():
    red = IspellReducer.from_strings(AFF, DIC)
    assert red("cities") == "city"
    assert red("Boxes") == "box"          # case-insensitive
    assert red("tried") == "try"
    assert red("unscaned") == "scan"
    assert red("plain") == "plain"
    assert red("unknownword") == "unknownword"


def test_ambiguous_form_resolves_to_smallest_root():
    aff = "suffixes\nflag A:\n    . > S\n"
    dic = "zebra/A\nzebras\n"   # 'zebras' is a root AND an expansion
    red = IspellReducer.from_strings(aff, dic)
    assert red("zebras") == "zebra"


def test_register_reducer_seam():
    from aspseek_ray.functions import morphology

    red = IspellReducer.from_strings(AFF, DIC)
    morphology.register_reducer(red)
    try:
        assert morphology.stem("cities") == "city"
        assert morphology.stem("loving") == "love"
    finally:
        morphology.register_reducer(morphology.porter_stem)
    assert morphology.stem("cities") == "citi"   # porter restored


def test_rule_condition_edges():
    r = AffixRule(flag="X", kind="suffix", cross=False,
                  classes=("[^aeiouy]", "y"), strip="y", append="ies")
    assert r.apply("city") == "cities"
    assert r.apply("day") is None      # 'a' fails [^aeiouy]
    assert r.apply("y") is None        # shorter than the condition


def test_driver_demo_dictionary_matches_oracle_form_list():
    """__ray_entry__'s ispell_search oracle hand-lists the expansion of
    'scan'; the engine's expansion must produce exactly that set, and the
    query word 'scanned' must reduce to the root."""
    import __ray_entry__ as em

    rules = parse_affix_file(em._ISPELL_AFF)
    red = IspellReducer.from_strings(em._ISPELL_AFF, em._ISPELL_DIC)
    assert red("scanned") == "scan"
    assert expand_root("scan", "SDG", rules) == {
        "scan", "scans", "scanned", "scanning"}
    assert expand_root("query", "S", rules) == {"query", "queries"}
    assert expand_root("window", "S", rules) == {"window", "windows"}


def test_duplicate_roots_merge_flags(ray_session):
    """Duplicate dictionary roots with different flag sets ('scan/S' +
    'scan/DG') are legal ispell: ispell_search must expand the UNION of
    their forms, agreeing with IspellReducer.from_strings."""
    import __ray_entry__ as em
    from aspseek_ray.pipelines.search import ispell_search

    split_dic = "scan/S\nscan/DG\n"
    got = ispell_search("/root/testdata/sf0.001", "scanned",
                        em._ISPELL_AFF, split_dic)["doc_id"].to_pylist()
    merged_dic = "scan/SDG\n"
    want = ispell_search("/root/testdata/sf0.001", "scanned",
                         em._ISPELL_AFF, merged_dic)["doc_id"].to_pylist()
    assert got == want and got


def test_ispell_search_reduces_unseen_form(ray_session):
    """Full-scan equivalence at sf0.001: searching the corpus-absent form
    'scanned' must return exactly the docs containing any surface form of
    its root (here: the 'scan' docs)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as em
    from aspseek_ray.functions.text import tokenize
    from aspseek_ray.pipelines.search import ispell_search

    sf = "/root/testdata/sf0.001"
    got = ispell_search(sf, "scanned", em._ISPELL_AFF,
                        em._ISPELL_DIC)["doc_id"].to_pylist()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    forms = {"scan", "scans", "scanned", "scanning"}
    want = sorted(d for d, t in zip(docs["doc_id"].to_pylist(),
                                    docs["text"].to_pylist())
                  if forms & set(tokenize(t)))
    assert got == want and got
