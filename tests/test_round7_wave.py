"""Round-7 wave: winnowing fingerprints (q417), content-defined
chunking (q418), Fellegi-Sunter EM step (q419).

Each query gets (a) an oracle-differential check at sf0.001 via the
driver's exact compare path, and (b) a semantic property test on a
constructed corpus exercising the published guarantee through the
PRODUCTION query (a temp-dir documents.parquet, not a re-implementation).
"""

from __future__ import annotations

import pandas as pd
import pytest
# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow


from ooh_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


def run(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].fn(spark, sf_dir)


@pytest.mark.parametrize(
    "name",
    [
        "q417_winnowing_fingerprints",
        "q418_cdc_chunk_dedup",
        "q419_fs_em_step",
    ],
)
def test_round7_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def _docs_dir(tmp_path, rows):
    """Write a minimal documents.parquet a query can load as sf_dir."""
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    (tmp_path / "d").mkdir(exist_ok=True)
    df.to_parquet(tmp_path / "d" / "documents.parquet", index=False)
    return str(tmp_path / "d")


def test_q417_winnowing_guarantee(spark, tmp_path):
    # Schleimer et al. theorem 1: any shared substring of length
    # >= k + w - 1 (= 11 here) yields at least one SHARED fingerprint.
    # Two documents with a planted 40-char common passage and otherwise
    # disjoint alphabets must collide; a third, fully disjoint doc
    # must not inherit their fingerprints.
    common = "the quick brown fox jumps over lazy dogs"
    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaa " + common + " bbbbbbbbbbbbbbbbbbbb",
         "en", "s1", 0),
        (2, "cccccccccccccccccccc " + common + " dddddddddddddddddddd",
         "en", "s1", 0),
        (3, "eeeeeeeeeeeeeeeeeeee ffffffffffffffffffff gggggggggggggggg",
         "en", "s2", 0),
    ]
    out = {
        r["source"]: r
        for r in run(spark, "q417_winnowing_fingerprints", _docs_dir(tmp_path, rows))
        .collect()
    }
    # the planted passage forces cross-doc fingerprints in s1
    assert out["s1"].xdoc_fps > 0
    # per-doc distinct sets sum to n_fps; distinct <= n_fps
    for r in out.values():
        assert r.distinct_fps <= r.n_fps
    # the disjoint doc shares nothing with anyone
    assert out["s2"].xdoc_fps == 0


def test_q418_cdc_shift_resistance(spark, tmp_path):
    # THE content-defined-chunking property (LBFS): prepending one char
    # shifts every byte offset, yet all chunks after the first boundary
    # are byte-identical, so the census still sees the duplication.
    # Fixed-width chunking would share nothing.
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
        "omega one two three four five six seven eight nine ten "
        "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    )
    rows = [
        (1, base, "en", "s1", 0),
        (2, "X" + base, "en", "s1", 0),
    ]
    r = (
        run(spark, "q418_cdc_chunk_dedup", _docs_dir(tmp_path, rows))
        .collect()[0]
    )
    # duplicated chunk mass despite the offset shift
    assert r.n_chunks > r.distinct_chunks, r
    assert r.dup_bp > 0, r
    # sanity: both docs chunked
    assert r.n_docs == 2 and r.n_chunks >= 4


def test_q418_degenerate_docs(spark, tmp_path):
    # empty text -> zero chunks (no crash, no phantom row); short text
    # (< window k) -> exactly one whole-doc chunk via the sentinel pair
    rows = [
        (1, "", "en", "s1", 0),
        (2, "tiny", "en", "s2", 0),
    ]
    out = {
        r["source"]: r
        for r in run(spark, "q418_cdc_chunk_dedup", _docs_dir(tmp_path, rows))
        .collect()
    }
    assert "s1" not in out  # empty doc contributes no chunks
    assert out["s2"].n_chunks == 1


def test_q419_em_step_moves_toward_separation(spark):
    rows = run(spark, "q419_fs_em_step").collect()
    assert {r.field for r in rows} == {"nation", "sign"}
    for r in rows:
        # E-step posterior concentrates matches on agreeing patterns:
        # after one M-step the match class must agree MORE than the
        # non-match class on every field, and probabilities stay in (0,1)
        assert 0 < r.u_e6 < r.m_e6 < 1_000_000, r
        assert 0 < r.p_e6 < 1_000_000, r
    # p is a global parameter — identical across field rows
    assert len({r.p_e6 for r in rows}) == 1
