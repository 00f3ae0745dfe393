"""Full-registry 5x sweep with stall detection: runs check_oracle on
/tmp/sf0.5 for every registered query, restarting past any query that
stalls >7 min (recorded as TIMEOUT)."""
import os, re, subprocess, sys, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as m  # noqa: E402

ALL = list(m.queries())
SKIP = {
    # documented quadratic boundary (SCALE.md r8)
    "q379_sparse_cosine_pairs",
    # documented Σdeg² wall, measured twice (647s at 5x, r9+r10);
    # q191b_link_prediction_capped is the registered scale path and
    # IS in the sweep (SCALE.md r10)
    "q191_link_prediction",
    # documented O(n^2) exact-kNN baseline (587.7s quiet-box at 5x,
    # r10 — always past the 420s cap); q334b_mutual_nn_funnel is the
    # registered machine-checked scale path and IS in the sweep,
    # green at 5x (SCALE.md r11)
    "q334_mutual_nn_pairs",
}
LOG = "/tmp/check5x_full.log"
RES = "/tmp/check5x_full_results.txt"
STALL = 420

done = set()
if os.path.exists(RES):
    for line in open(RES):
        parts = line.split()
        if len(parts) == 2:
            done.add(parts[1])

while True:
    todo = [q for q in ALL if q not in done and q not in SKIP]
    if not todo:
        break
    lf = open(LOG, "w")
    p = subprocess.Popen(
        ["python", "tools/check_oracle.py", "/tmp/sf0.5"] + todo,
        stdout=lf, stderr=subprocess.STDOUT, cwd="/root/repo",
    )
    last_size, last_t, stuck = 0, time.time(), False
    while p.poll() is None:
        time.sleep(10)
        size = os.path.getsize(LOG)
        if size != last_size:
            last_size, last_t = size, time.time()
        elif time.time() - last_t > STALL:
            p.kill()
            p.wait()
            stuck = True
            break
    lf.close()
    txt = open(LOG).read()
    comp = re.findall(r"(OK|FAIL|ROWS-ONLY)\s+(\S+):", txt)
    with open(RES, "a") as rf:
        for st, name in comp:
            if name not in done:
                done.add(name)
                rf.write(f"{st} {name}\n")
        missing = [q for q in todo if q not in done]
        if stuck:
            if missing:
                done.add(missing[0])
                rf.write(f"TIMEOUT {missing[0]}\n")
        elif missing:
            # Non-stuck exit with unreported queries: check_oracle
            # crashed mid-list. Record the query it died on as ERROR,
            # then re-enter the loop to retry the rest — otherwise the
            # SUMMARY silently under-counts (ADVICE r8).
            done.add(missing[0])
            rf.write(f"ERROR {missing[0]}\n")
    if not stuck and not missing:
        break

n = {"OK": 0, "FAIL": 0, "ROWS-ONLY": 0, "TIMEOUT": 0, "ERROR": 0}
for line in open(RES):
    st = line.split()[0]
    n[st] = n.get(st, 0) + 1
print("SUMMARY", n)
# Gate (ADVICE r10): FAIL/ERROR must fail the round-close ritual like
# every other step. TIMEOUT (stall-cap) entries do NOT gate — each
# carries a measured disposition in SCALE.md (q334/q194/q423 class);
# a FAIL is a correctness drift and an ERROR is a crashed compare.
if n["FAIL"] or n["ERROR"]:
    sys.exit(1)
