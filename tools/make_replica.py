"""Build an N-x replicated corpus for scale sweeps (SCALE.md ritual).

Replicates the documents (and embeddings) tables of a base sf dir with
consistent id offsets — byte-identical text per copy, distinct ids —
the fixture pathology the dedup funnel is specified to absorb. Also
writes a `_dedup` variant (min-id per exact text), the q162
funnel-input corpus the near-dup family is specified to run on at
scale.

Usage: python tools/make_replica.py N OUT_DIR [BASE_DIR]
  e.g. python tools/make_replica.py 10 /tmp/sf1x10 /root/testdata/sf0.1
Writes OUT_DIR/{documents,embeddings}.parquet and
OUT_DIR_dedup/documents.parquet.
"""
from __future__ import annotations

import sys

import duckdb


def main() -> int:
    n = int(sys.argv[1])
    out = sys.argv[2].rstrip("/")
    base = (sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1").rstrip("/")
    con = duckdb.connect()
    import os

    os.makedirs(out, exist_ok=True)
    os.makedirs(out + "_dedup", exist_ok=True)
    con.execute(
        f"""
        COPY (
          SELECT doc_id + c.i * (SELECT max(doc_id) + 1
                                 FROM read_parquet('{base}/documents.parquet'))
                   AS doc_id,
                 text, lang, source, n_chars
          FROM read_parquet('{base}/documents.parquet'),
               (SELECT unnest(generate_series(0, {n - 1})) AS i) c
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT vec_id + c.i * (SELECT max(vec_id) + 1
                                 FROM read_parquet('{base}/embeddings.parquet'))
                   AS vec_id,
                 embedding, label
          FROM read_parquet('{base}/embeddings.parquet'),
               (SELECT unnest(generate_series(0, {n - 1})) AS i) c
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    # lineitem replica (VERDICT r10 item 5: gives the lineitem-backed
    # graph family q191b/q436 their 10x curve points). Offsetting BOTH
    # l_orderkey and l_partkey makes each copy a DISJOINT co-purchase
    # graph — pure linear scale-up, the same replica semantics as
    # documents (distinct ids, identical content) — rather than
    # densifying the original graph's part nodes with n-fold wedges.
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + c.i * (SELECT max(l_orderkey) + 1
                                     FROM read_parquet('{base}/lineitem.parquet'))
                   AS l_orderkey,
                 l_partkey + c.i * (SELECT max(l_partkey) + 1
                                    FROM read_parquet('{base}/lineitem.parquet'))
                   AS l_partkey,
                 * EXCLUDE (l_orderkey, l_partkey)
          FROM read_parquet('{base}/lineitem.parquet'),
               (SELECT unnest(generate_series(0, {n - 1})) AS i) c
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{out}/documents.parquet')
          WHERE doc_id IN (SELECT min(doc_id)
                           FROM read_parquet('{out}/documents.parquet')
                           GROUP BY text)
        ) TO '{out}_dedup/documents.parquet' (FORMAT PARQUET)
        """
    )
    for d in (out, out + "_dedup"):
        r = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/documents.parquet')"
        ).fetchone()[0]
        print(d, "documents:", r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
