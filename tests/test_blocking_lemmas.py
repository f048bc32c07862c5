"""Property-based tests of the two blocking LEMMAS the engine's scale
paths rest on, stated in pure Python so hypothesis can hammer the math
itself (the Spark implementations are separately end-to-end-tested on
seeded random corpora in test_llm_dedup.py / test_skew.py):

1. Symmetric-delete completeness (q118, joins.py): any two strings at
   Levenshtein distance <= 1 share at least one key in
   {identity} ∪ {all single-character deletions}.
2. Triangle-salt coverage (q106, similarity.py::salted_day_dots): for
   any bucket assignment (gu, gv) in [0, B)^2, the replicated key sets
   {(min(g,j), max(g,j)) : j in [0,B)} intersect in keys satisfying the
   residual predicate (lo, hi) == (min(gu,gv), max(gu,gv)) EXACTLY once
   — so every pair is counted once and only once.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _lev(s: str, t: str) -> int:
    if len(s) < len(t):
        s, t = t, s
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


def _symdel_keys(s: str) -> set[str]:
    # mirror of q118's key expression: the identity plus every
    # single-character deletion (joins.py: concat(array(name), deletions))
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


@settings(max_examples=500, deadline=None)
@given(
    s=st.text(alphabet="abc", min_size=0, max_size=8),
    edit=st.sampled_from(["sub", "ins", "del", "none"]),
    pos=st.integers(min_value=0, max_value=8),
    ch=st.sampled_from("abc"),
)
def test_symmetric_delete_blocking_is_complete(s, edit, pos, ch):
    """Construct t within distance 1 of s by an explicit edit; the key
    sets MUST intersect. (The in-docstring proof in joins.py, checked
    over the whole edit space rather than argued.)"""
    if edit == "sub" and s:
        p = pos % len(s)
        t = s[:p] + ch + s[p + 1 :]
    elif edit == "ins":
        p = pos % (len(s) + 1)
        t = s[:p] + ch + s[p:]
    elif edit == "del" and s:
        p = pos % len(s)
        t = s[:p] + s[p + 1 :]
    else:
        t = s
    assert _lev(s, t) <= 1
    assert _symdel_keys(s) & _symdel_keys(t), (s, t)


@settings(max_examples=500, deadline=None)
@given(
    s=st.text(alphabet="ab", min_size=0, max_size=6),
    t=st.text(alphabet="ab", min_size=0, max_size=6),
)
def test_symmetric_delete_blocking_never_misses_close_pairs(s, t):
    """Converse sweep: ANY pair the verifier would accept (dist <= 1)
    must share a key — no constructed-edit blind spots."""
    if _lev(s, t) <= 1:
        assert _symdel_keys(s) & _symdel_keys(t), (s, t)


@settings(max_examples=500, deadline=None)
@given(
    b=st.integers(min_value=1, max_value=16),
    gu=st.integers(min_value=0, max_value=15),
    gv=st.integers(min_value=0, max_value=15),
)
def test_triangle_salt_counts_every_pair_exactly_once(b, gu, gv):
    """Each row is replicated to keys {(min(g,j), max(g,j)) : j < B};
    a pair meets under a shared key AND survives the residual predicate
    (least(ga,gb), greatest(ga,gb)) == (lo, hi) EXACTLY once — the
    exactness half of salted_day_dots' docstring, checked over the whole
    (B, gu, gv) space including the g == j diagonal."""
    gu, gv = gu % b, gv % b
    keys_u = {(min(gu, j), max(gu, j)) for j in range(b)}
    keys_v = {(min(gv, j), max(gv, j)) for j in range(b)}
    surviving = [
        k
        for k in keys_u & keys_v
        if k == (min(gu, gv), max(gu, gv))
    ]
    assert len(surviving) == 1, (b, gu, gv, sorted(keys_u & keys_v))
