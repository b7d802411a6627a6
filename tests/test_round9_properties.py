"""Property tests for the round-9 primitives — pure-Python (no Spark
session), so Hypothesis can run hundreds of cases cheaply.

- WAV codec: encode→decode is the identity for ARBITRARY PCM payloads
  (dtypes, channel counts, rates, info-chunk lengths), not just the
  fixtures the example tests pin.
- Prefix-filtering lemma (the correctness core of dedup_jaccard_ppjoin):
  for random token sets with Jaccard ≥ t, the rarest-first prefixes of
  length n − ceil(t·n) + 1 always intersect.
- HLL estimate arithmetic: the register → estimate chain is monotone
  in the harmonic sum and the linear-counting table is consistent with
  its defining formula.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from codegraph_spark.operators.wav_stdlib import decode_wav, encode_wav


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(0, 300),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 11025, 16000, 22050, 44100]),
    bits=st.sampled_from([8, 16]),
    info=st.one_of(st.none(), st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=9,
    )),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, bits, info, seed):
    rng = np.random.default_rng(seed)
    if bits == 8:
        s = rng.integers(0, 256, size=(n, ch), dtype=np.uint8)
    else:
        s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    payload = encode_wav(s, rate, info=info)
    grate, gch, gbits, frames = decode_wav(payload)
    assert (grate, gch, gbits) == (rate, ch, bits)
    assert frames.shape == (n, ch)
    assert np.array_equal(frames, s)
    # RIFF size field covers the whole stream (word-aligned)
    assert len(payload) % 2 == 0


@settings(max_examples=300, deadline=None)
@given(
    universe=st.integers(8, 60),
    data=st.data(),
)
def test_prefix_filtering_lemma(universe, data):
    """If Jaccard(x, y) >= 0.5 then the rarest-first prefixes of length
    n - ceil(n/2) + 1 = floor(n/2) + 1 share a token — the lemma
    dedup_jaccard_ppjoin's completeness rests on. Token order is any
    COMMON total order; rarity is a permutation of the universe here."""
    toks = list(range(universe))
    x = data.draw(st.sets(st.sampled_from(toks), min_size=2))
    y = data.draw(st.sets(st.sampled_from(toks), min_size=2))
    inter = len(x & y)
    union = len(x | y)
    if inter * 2 < union:  # Jaccard < 0.5: lemma says nothing
        return
    order = data.draw(st.permutations(toks))
    rank = {t: i for i, t in enumerate(order)}
    px = sorted(x, key=lambda t: rank[t])[: len(x) // 2 + 1]
    py = sorted(y, key=lambda t: rank[t])[: len(y) // 2 + 1]
    assert set(px) & set(py), (sorted(x), sorted(y), order)


def test_hll_linear_counting_table_matches_formula():
    from codegraph_spark.queries.events import _HLL_LC, _HLL_M

    assert len(_HLL_LC) == _HLL_M
    for v in range(1, _HLL_M + 1):
        assert _HLL_LC[v - 1] == int(round(_HLL_M * math.log(_HLL_M / v)))
    # monotone: more zero registers -> smaller estimate
    assert all(a >= b for a, b in zip(_HLL_LC, _HLL_LC[1:]))


def test_hll_constant_matches_alpha_formula():
    from codegraph_spark.queries.events import _HLL_C, _HLL_M

    alpha = 0.7213 / (1 + 1.079 / _HLL_M)
    assert _HLL_C == alpha * _HLL_M * _HLL_M * 2.0**55
