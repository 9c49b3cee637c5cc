"""Hypothesis property tests for the distance-metric kernels (SURVEY §5).

These exercise the batch numpy kernels and per-pair reference kernels
directly (the Spark wrappers are thin Arrow shims over exactly these
functions), so hundreds of generated cases run without JVM round-trips.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from polars_ds_extension_spark.functions.string_ import (
    _codes_batch, _dleven, _dleven_batch, _jaro, _jw, _lcs_batch,
    _lcs_subseq_len, _osa, _osa_batch,
)

TEXT = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=300),
               max_size=24)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_osa_dleven_bounds_and_symmetry(a, b):
    osa, dl = _osa(a, b), _dleven(a, b)
    lev = _lev_ref(a, b)
    # identity / symmetry / bounds: dl <= osa <= lev <= max(len)
    assert _osa(a, a) == 0 and _dleven(a, a) == 0
    assert _osa(b, a) == osa and _dleven(b, a) == dl
    assert dl <= osa <= lev <= max(len(a), len(b))
    # distances differ from lev only when a transposition helps
    assert lev - osa <= max(len(a), len(b))


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT, TEXT)
def test_dleven_triangle(a, b, c):
    # Damerau-Levenshtein (unrestricted) is a metric
    assert _dleven(a, c) <= _dleven(a, b) + _dleven(b, c)


@settings(max_examples=150, deadline=None)
@given(TEXT, TEXT)
def test_jaro_jw_ranges(a, b):
    j, jw = _jaro(a, b), _jw(a, b)
    assert 0.0 <= j <= 1.0 and 0.0 <= jw <= 1.0
    assert _jaro(a, a) == (1.0 if a else 1.0)
    assert abs(_jaro(b, a) - j) < 1e-12
    # winkler only boosts: jw >= j when above threshold, equal otherwise
    assert jw + 1e-12 >= j


@settings(max_examples=150, deadline=None)
@given(TEXT, TEXT)
def test_lcs_subseq_properties(a, b):
    l = _lcs_subseq_len(a, b)
    assert 0 <= l <= min(len(a), len(b))
    assert _lcs_subseq_len(b, a) == l
    assert _lcs_subseq_len(a, a) == len(a)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=16))
def test_batch_kernels_match_scalar(pairs):
    """The vectorized batch kernels equal the per-pair reference kernels
    on every generated pair — the contract the Arrow UDFs rely on."""
    A, la = _codes_batch([p[0] for p in pairs])
    B2, lb = _codes_batch([p[1] for p in pairs])
    osa = _osa_batch(A, la, B2, lb)
    dl = _dleven_batch(A, la, B2, lb)
    lcs = _lcs_batch(A, la, B2, lb)
    for i, (x, y) in enumerate(pairs):
        assert osa[i] == _osa(x, y)
        assert dl[i] == _dleven(x, y)
        assert lcs[i] == _lcs_subseq_len(x, y)
