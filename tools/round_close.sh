#!/usr/bin/env bash
# Round-close verification ritual (SCALE.md "verification footprint").
# Run from /root/repo on a QUIET box (no other Spark), in this order —
# the timed steps come first so contention never pollutes them.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== 1. bench (timed — run first, quiet box) =="
python bench.py || exit 1

echo "== 1b. bench noise guard (VERDICT r12 item 4: auto re-run if >15% above prev round) =="
python tools/bench_noise_guard.py

echo "== 2. full pytest =="
python -m pytest tests/ -q || exit 1

echo "== 3. full-registry oracle differential, sf0.001 then sf0.01 =="
python tools/check_oracle.py /root/testdata/sf0.001 || exit 1
python tools/check_oracle.py /root/testdata/sf0.01 || exit 1

echo "== 4. strict dtype gate over all oracles =="
python tools/check_oracle.py /root/testdata/sf0.001 --strict flagship_doc_scan || exit 1

echo "== 5. full-registry 5x sweep (longest; stall-capped) =="
# The sweep target corpus does not survive /tmp wipes between rounds —
# build it if absent (r11 lesson: 49 spurious ERRORs from a missing
# /tmp/sf0.5 before this guard existed).
[ -f /tmp/sf0.5/region.parquet ] || python tools/make_full_replica.py 5 /tmp/sf0.5 || exit 1
rm -f /tmp/check5x_full_results.txt /tmp/check5x_full.log
# check_scale_sweep.py exits 1 on any FAIL/ERROR (TIMEOUT stall-caps
# carry SCALE.md dispositions and do not gate) — ADVICE r10.
python tools/check_scale_sweep.py || exit 1

echo "== 6. dedup/ANN family curves (needs tools/make_replica.py corpora) =="
echo "   python tools/make_replica.py 5 /tmp/sf1x5 && python tools/make_replica.py 10 /tmp/sf1x10"
echo "   python tools/sweep_dedup_family.py 3"
echo "   python tools/sweep_ann_family.py"
echo "Record results + dispositions in SCALE.md; commit artifacts."
