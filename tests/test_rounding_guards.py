"""Machine-checked rounding-boundary guards (ADVICE r12 items 1-2).

Two oracles compare ROUNDED doubles across engines whose libm /
rounding modes may differ (numpy & Spark round-half-even vs DuckDB
round-half-away; different float summation orders):

* q247_audio_tone_detect — the tone synthesis rounds ``800*sin(.)``
  per sample, and the emitted margin rounds ``10^4 * 10*log10(p1/p2)``.
* q475_bloom_sizing_advisor — ``theory_bp`` rounds
  ``10^4 * (1 - e^(-kn/m))^k`` computed independently in both engines.

Both are safe ONLY because no value sits near a rounding boundary.
Previously that safety was asserted in docstrings; these tests measure
it over the full fixed input domains so a numpy/libm/data regeneration
that pushes a value toward a boundary fails loudly instead of silently
flipping an oracle bit. Measured slack (2026-08): q247 tone samples
>= 3.3e-2 from .5, q247 margins >= 1.06e-3 from their boundary, q475
theory values >= 3.9e-3 across sf0.001/sf0.01/sf0.1.
"""

import math
import os

import duckdb
import numpy as np
import pytest

# --- q247: the exact synthesis constants from queries/multimodal.py ------
_SR = 8000.0
_N_SAMP = 256
_TONE_BINS = 8
_TONE_BASE = 400.0
_TONE_STEP = 100.0
_DOC_DOMAIN = 200  # doc_id < 200, pure function of doc_id


def _tone_powers(doc_id: int) -> np.ndarray:
    t = np.arange(_N_SAMP, dtype=np.float64)
    freq = _TONE_BASE + _TONE_STEP * (doc_id % _TONE_BINS)
    i = np.arange(_N_SAMP, dtype=np.int64)
    noise = (doc_id * 7 + i * 13) % 64 - 32
    tone = np.round(800.0 * np.sin(2 * np.pi * freq * t / _SR)).astype(
        np.int64
    )
    x = (tone + noise).astype(np.float64)
    powers = []
    for k in range(_TONE_BINS):
        w = 2 * np.pi * (_TONE_BASE + _TONE_STEP * k) / _SR
        c = (x * np.cos(w * t)).sum()
        s = (x * np.sin(w * t)).sum()
        powers.append(c * c + s * s)
    return np.array(powers)


def _dist_from_half(v: np.ndarray) -> np.ndarray:
    """Distance of each value from the nearest x.5 rounding boundary."""
    return np.abs(np.abs(v - np.floor(v)) - 0.5)


def test_q247_tone_samples_clear_of_half_integers():
    # The per-sample round(800*sin(.)) must agree between numpy
    # (half-even) and DuckDB (half-away): no sample may sit near .5.
    t = np.arange(_N_SAMP, dtype=np.float64)
    worst = 1.0
    for doc_id in range(_DOC_DOMAIN):
        freq = _TONE_BASE + _TONE_STEP * (doc_id % _TONE_BINS)
        vals = 800.0 * np.sin(2 * np.pi * freq * t / _SR)
        worst = min(worst, float(_dist_from_half(vals).min()))
    # measured 3.39e-2; one order of slack below
    assert worst >= 3e-3, f"tone sample within {worst} of a .5 boundary"


def test_q247_margins_clear_of_rounding_boundary():
    # The emitted margin rounds 10^4 * 10*log10(p_top/p_second); both
    # engines sum the DFT in different orders, so every margin must sit
    # clear of its integer-rounding boundary (docstring claims >= ~1e-3).
    worst = math.inf
    for doc_id in range(_DOC_DOMAIN):
        powers = _tone_powers(doc_id)
        order = np.argsort(-powers)
        ratio_db = 10.0 * np.log10(
            powers[order[0]] / max(powers[order[1]], 1e-12)
        )
        v = 10000.0 * ratio_db
        worst = min(worst, float(_dist_from_half(np.array([v]))[0]))
    # measured 1.07e-3 over the 200-doc domain
    assert worst >= 1e-3, f"margin within {worst} of a rounding boundary"


# --- q475: theory_bp = round(10^4 * (1 - e^(-kn/m))^k) --------------------
_BFS_GRID = ((4096, 2), (4096, 4), (16384, 2), (16384, 4), (65536, 2), (65536, 4))
_BENCH_MOD = 97

_N_INS_SQL = """
    WITH d AS (SELECT doc_id, lower(trim(text)) AS t
               FROM '{path}' WHERE doc_id % {mod} = 0),
    toks AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS toks FROM d),
    g AS (SELECT DISTINCT
            unnest(list_transform(generate_series(1, len(toks) - 2),
              i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
            AS gram
          FROM toks)
    SELECT count(*) FROM g
"""


@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_q475_theory_bp_clear_of_rounding_boundary(sf_dir):
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):  # pragma: no cover - env guard
        pytest.skip(f"{path} missing")
    con = duckdb.connect()
    n = con.execute(_N_INS_SQL.format(path=path, mod=_BENCH_MOD)).fetchone()[0]
    assert n > 0
    for m, k in _BFS_GRID:
        v = 10000.0 * math.pow(1.0 - math.exp(-k * n / m), k)
        d = abs(abs(v - math.floor(v)) - 0.5)
        # measured minimum 3.97e-3 (sf0.001, m=4096 k=2); a libm
        # difference is ~1e-12 relative, so 1e-3 slack is conclusive
        assert d >= 1e-3, (
            f"theory_bp={v} (m={m}, k={k}, n={n}) within {d} of boundary"
        )
