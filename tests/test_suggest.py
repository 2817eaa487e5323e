"""Spell suggest (SymSpell delete-neighborhood + exact verify): the _lev1
predicate against a reference DP Levenshtein over random word pairs, and
the end-to-end sidecar lookup on the fixture vocabulary."""

from __future__ import annotations

import itertools
import random

SF = "/root/testdata/sf0.001"


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev1_matches_reference_dp():
    from aspseek_ray.pipelines.search import _lev1

    rng = random.Random(7)
    alpha = "abc"          # tiny alphabet -> dense near-miss coverage
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 5)))
             for _ in range(60)]
    for a, b in itertools.product(words, repeat=2):
        assert _lev1(a, b) == (_lev_ref(a, b) <= 1), (a, b)


def test_delete_neighborhood_is_complete():
    """Any pair within distance 1 shares a deletion key — the SymSpell
    property the partition pruning relies on."""
    from aspseek_ray.pipelines.search import _lev1

    def keys(w):
        return {w} | {w[:i] + w[i + 1:] for i in range(len(w))}

    rng = random.Random(11)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(80)]
    for a, b in itertools.product(words, repeat=2):
        if _lev1(a, b):
            assert keys(a) & keys(b), (a, b)


def test_spell_suggest_end_to_end(ray_session):
    from aspseek_ray.pipelines import search

    t = search.spell_suggest(SF, "sow").to_pandas()
    assert set(t["word"]) == {"slow", "row"}
    # ranked by df desc
    assert list(t["df"]) == sorted(t["df"], reverse=True)
    # exact hit includes the word itself
    t2 = search.spell_suggest(SF, "scan").to_pandas()
    assert "scan" in set(t2["word"])
    # no candidates -> empty, not an error
    assert search.spell_suggest(SF, "zzzzzzq").num_rows == 0


def test_prefix_search_expansion(ray_session):
    """sca* == OR over every vocab word starting with 'sca'; unmatched
    prefix is empty; single-word expansion equals the plain term query."""
    from aspseek_ray.pipelines import search

    got = search.prefix_search(SF, "sca")
    direct = search.boolean_or_search(SF, ("scan",))
    assert got.equals(direct)      # fixture vocab: only 'scan' maches sca*
    assert search.prefix_search(SF, "zzz").num_rows == 0
    # multi-word expansion: 's' hits scan/slow/small/sort/spark/stream...
    s_all = search.prefix_search(SF, "s")
    assert s_all.num_rows > got.num_rows


def test_qparser_wildcard(ray_session):
    """Grammar-level wildcards: Prefix parses, expands against the vocab,
    evaluates identically on driver and distributed plans, and the
    streaming matches() evaluator agrees without any expansion."""
    from aspseek_ray.functions.text import tokenize
    from aspseek_ray.pipelines import qparser, search

    ast = qparser.parse_query("sca* slow")
    assert any(isinstance(c, qparser.Prefix) for c in ast.children)
    a = qparser.search_query(SF, "sca* slow")
    d = qparser.search_query(SF, "sca* slow", driver_max_posting_rows=0)
    assert a.equals(d) and a.num_rows > 0
    # equivalent expansion by hand (fixture vocab: sca* -> scan only)
    manual = qparser.search_query(SF, "scan slow")
    assert a.equals(manual)
    # negated wildcard: -sca* excludes scan docs
    neg = qparser.search_query(SF, "slow -sca*")
    both = set(a["doc_id"].to_pylist())
    slow = set(qparser.search_query(SF, "slow")["doc_id"].to_pylist())
    assert set(neg["doc_id"].to_pylist()) == slow - both
    # streaming evaluator handles Prefix natively
    toks = tokenize("a scanner is slow")
    assert qparser.matches(qparser.parse_query("scann* slow"),
                           toks, set(toks))


def test_qparser_suffix_wildcard(ray_session):
    """Leading-star wildcards: *ow expands to slow/row/window in the fixture
    vocab, both plans agree, and streaming matches() evaluates natively."""
    from aspseek_ray.functions.text import tokenize
    from aspseek_ray.pipelines import qparser

    a = qparser.search_query(SF, "*ow scan")
    d = qparser.search_query(SF, "*ow scan", driver_max_posting_rows=0)
    assert a.equals(d) and a.num_rows > 0
    manual = qparser.search_query(SF, "(slow OR row OR window) scan")
    assert a.equals(manual)
    toks = tokenize("the yellow scan")
    assert qparser.matches(qparser.parse_query("*low scan"),
                           toks, set(toks))
    assert not qparser.matches(qparser.parse_query("*zz scan"),
                               toks, set(toks))
