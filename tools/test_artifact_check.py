#!/usr/bin/env python3
"""Fixture tests for artifact_check.heavy_breach_fingerprint (VERDICT r10 #2).

The r10 driver breach (cpu_share 0.57/0.60, gc 4.3 s, zero spill against a
33 s excess) was mislabeled "JVM memory stall" by the old gc-only
fingerprint. Each fixture below is shaped like a real observed breach
class; the test asserts the ordered diagnosis names the right culprit.

Run: python3 tools/test_artifact_check.py   (exit 0 = all pass)
"""
import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "artifact_check_mod",
    os.path.join(os.path.dirname(__file__), "artifact_check.py"))
# artifact_check runs its checks at import time against sys.argv[1] (the
# repo root); point it at the real repo so import doesn't fail, then use
# only the pure fingerprint function.
sys.argv = [sys.argv[0], os.path.join(os.path.dirname(__file__), "..")]
mod = importlib.util.module_from_spec(spec)
try:
    spec.loader.exec_module(mod)
except SystemExit:
    pass  # the import-time gate may exit non-zero mid-round; irrelevant here
fp = mod.heavy_breach_fingerprint


def bench(total, budget, gc, spill_each, shares, secs):
    names = list(secs)
    return {
        "heavy_total": total, "heavy_budget_sec": budget,
        "heavy_gc_total": gc,
        "heavy_spill_bytes": {n: spill_each for n in names},
        "heavy_cpu_share": dict(zip(names, shares)),
        "heavy": secs,
    }


failures = []


def check(name, got, want_substr):
    if want_substr not in got:
        failures.append(f"{name}: expected '{want_substr}' in '{got}'")


# 1. The r10 driver breach, verbatim shape: 91.2 s vs 90 s, gc 4.3 s,
#    zero spill, the two big entries at cpu_share 0.57/0.60. The old
#    fingerprint called this a JVM stall; it is a host stall.
r10 = bench(91.2, 90.0, 4.3, 0,
            [0.572, 0.602, 0.832, 0.882],
            {"pipeline_curate": 35.7, "dedup_components": 28.8,
             "ngram_jaccard": 5.1, "sql_neardup": 1.5})
check("r10-shape", fp(r10), "host stall")

# 2. The r9 driver breach shape: 94.2 s vs 90 s, same host-stall class
#    (cpu_share 0.46-0.60 on the slow entries, gc small vs excess).
r9 = bench(94.2, 90.0, 3.9, 0,
           [0.46, 0.60, 0.85],
           {"pipeline_curate": 40.5, "dedup_components": 23.5,
            "ngram_jaccard": 5.0})
check("r9-shape", fp(r9), "host stall")

# 3. A genuine JVM memory stall: gc eats most of the excess.
jvm = bench(110.0, 90.0, 14.0, 0,
            [0.95, 0.93], {"a": 60.0, "b": 50.0})
check("gc-dominated", fp(jvm), "JVM memory stall")

# 4. Spill-driven stall: any shuffle spill inside the tier is memory
#    pressure regardless of gc (spill is checked first).
sp = bench(100.0, 90.0, 1.0, 1 << 30,
           [0.95, 0.93], {"a": 55.0, "b": 45.0})
check("spill-dominated", fp(sp), "JVM memory stall")

# 5. Plan regression: healthy JVM (flat gc, no spill), healthy host
#    (cpu_share ~= 1) — the time went into real compute, i.e. the plan.
plan = bench(120.0, 90.0, 2.0, 0,
             [0.97, 0.95, 0.96], {"a": 70.0, "b": 30.0, "c": 20.0})
check("plan-regression", fp(plan), "plan regression")

# 6. Observability absent (pre-r10 artifact): no attribution, no crash.
#    Equality, not substring — "" is a substring of everything, so a
#    substring check here could never fail (r11 review pass).
got6 = fp({"heavy_total": 95.0, "heavy_budget_sec": 90.0})
if got6 != "":
    failures.append(f"no-columns: expected '', got '{got6}'")

# 6b. Partially observable: gc present (and unalarming) but no
#     cpu_share/secs — must return "" rather than crash formatting a
#     None mean share (found by the r11 review pass).
got6b = fp({"heavy_total": 95.0, "heavy_budget_sec": 90.0,
            "heavy_gc_total": 2.0})
if got6b != "":
    failures.append(f"partial-columns: expected '', got '{got6b}'")

# 6c. Spill present but gc column absent: the spill branch fires alone
#     and must not crash formatting a missing gc total (r11 review
#     pass — f"{None:.1f}" raises TypeError). Spill must be MATERIAL
#     (>= SPILL_MATERIAL_BYTES) for the branch to fire at all.
check("spill-no-gc",
      fp({"heavy_total": 95.0, "heavy_budget_sec": 90.0,
          "heavy_spill_bytes": {"a": 1 << 30}}),
      "JVM memory stall")

# 6d. ADVICE r11: a genuinely host-stalled run (cpu_share 0.55/0.60)
#     with INCIDENTAL spill (1 MiB on one entry, far below the material
#     threshold) must read as a host stall — the old spill>0 test
#     misattributed it as self-inflicted and blocked normalization.
tiny = bench(100.0, 90.0, 2.0, 0,
             [0.55, 0.60], {"a": 60.0, "b": 40.0})
tiny["heavy_spill_bytes"] = {"a": 1 << 20, "b": 0}
check("tiny-spill-host-stall", fp(tiny), "host stall")

# 7. Weighting matters: many fast healthy entries must not wash out the
#    slow descheduled ones — the mean is time-weighted.
wt = bench(100.0, 90.0, 2.0, 0,
           [0.55, 0.98, 0.98, 0.98, 0.98],
           {"slow": 70.0, "f1": 2.0, "f2": 2.0, "f3": 2.0, "f4": 2.0})
check("time-weighted", fp(wt), "host stall")

# 8. End-to-end normalization policy (r11 review pass): run the whole
#    checker against a doctored repo root. A breach the fingerprint
#    attributes to the PLAN must fail even when heavy_host_factor > 1
#    would bring it under budget (self-inflicted regressions are never
#    normalized away); the identical numbers attributed to a HOST
#    stall must normalize and pass.
import json
import shutil
import subprocess
import tempfile

repo = os.path.join(os.path.dirname(__file__), "..")
for label, shares, want_rc in (("plan-not-normalized", [0.97, 0.95], 1),
                               ("host-stall-normalized", [0.55, 0.60], 0)):
    tmp = tempfile.mkdtemp()
    try:
        for f in ("BENCH_stress.json", "bench_all.json"):
            shutil.copy(os.path.join(repo, f), os.path.join(tmp, f))
        doct = json.load(open(os.path.join(repo, "bench.json")))
        doct.update(bench(95.0, 90.0, 1.0, 0, shares,
                          {"a": 60.0, "b": 35.0}))
        doct["heavy_host_factor"] = 1.12  # 95/1.12 = 84.8 < 90
        json.dump(doct, open(os.path.join(tmp, "bench.json"), "w"))
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "artifact_check.py"),
             tmp],
            capture_output=True, text=True)
        if r.returncode != want_rc:
            failures.append(
                f"{label}: expected exit {want_rc}, got {r.returncode} "
                f"({r.stdout.strip().splitlines()[-1] if r.stdout else ''})")
    finally:
        shutil.rmtree(tmp)

# 8b. r17 closeout gates, end-to-end: (i) a heavy_host_factor outside
#     the measured idle envelope (child pre bracket ≳ 2.9 s ⇒ factor
#     > 1.5) and (ii) within-tier post/pre bracket drift past 2.2×
#     must each fail BY NAME. Both doctor the committed canonical
#     bench.json, so the fixtures also pin that the real artifact sits
#     inside both gates.
for label, patch, want in (
        ("child-factor-contended", {"heavy_host_factor": 1.8},
         "heavy_host_factor"),
        ("mid-tier-drift", {"heavy_parallel_pre": 1.4,
                            "heavy_parallel_post": 3.5}, "drift")):
    tmp = tempfile.mkdtemp()
    try:
        for f in ("BENCH_stress.json", "bench_all.json"):
            shutil.copy(os.path.join(repo, f), os.path.join(tmp, f))
        doct = json.load(open(os.path.join(repo, "bench.json")))
        doct.update(patch)
        json.dump(doct, open(os.path.join(tmp, "bench.json"), "w"))
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "artifact_check.py"),
             tmp],
            capture_output=True, text=True)
        if r.returncode == 0:
            failures.append(f"{label}: doctored artifact passed the check")
        elif want not in r.stdout:
            failures.append(
                f"{label}: failure output does not name '{want}':\n"
                f"{r.stdout}")
    finally:
        shutil.rmtree(tmp)

# 9. Stress-freshness gate (VERDICT r12 #2): a BENCH_stress.json whose
#    sweep predates a stress-armed registry row must fail BY NAME —
#    the silent-staleness class the bench_all newest-row pin already
#    stops. Doctor the committed artifact by deleting one armed row.
tmp = tempfile.mkdtemp()
try:
    for f in ("bench.json", "bench_all.json"):
        shutil.copy(os.path.join(repo, f), os.path.join(tmp, f))
    stale = json.load(open(os.path.join(repo, "BENCH_stress.json")))
    stale.get("queries", {}).pop("graph_components_nnd", None)
    # drop the recorded knn_* round series too — a pre-r13 sweep has
    # neither, and both absences must be named
    stale["cc_rounds"] = {k: v for k, v in stale.get("cc_rounds", {}).items()
                          if not k.startswith("knn_")}
    json.dump(stale, open(os.path.join(tmp, "BENCH_stress.json"), "w"))
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "artifact_check.py"), tmp],
        capture_output=True, text=True)
    if r.returncode == 0:
        failures.append("stale-stress: doctored artifact passed the check")
    else:
        for want in ("graph_components_nnd", "knn_*"):
            if want not in r.stdout:
                failures.append(
                    f"stale-stress: failure output does not name '{want}':\n"
                    f"{r.stdout}")
finally:
    shutil.rmtree(tmp)

# 10. Single-point allowlist (VERDICT r13 #5): a row truncated to ONE
#     valid scale point must fail BY NAME unless it is in
#     SINGLE_POINT_OK — a partial/killed sweep must not read as scale
#     coverage. Doctor the committed artifact by dropping all but one
#     point of a multi-point row; the allowlisted graph_components_knn
#     (still single-point in the same artifact) must NOT be named.
tmp = tempfile.mkdtemp()
try:
    for f in ("bench.json", "bench_all.json"):
        shutil.copy(os.path.join(repo, f), os.path.join(tmp, f))
    doct = json.load(open(os.path.join(repo, "BENCH_stress.json")))
    pr = doct["queries"]["graph_pagerank"]
    for k in [k for k in pr if k.startswith("s") and k != "s1"]:
        del pr[k]
    json.dump(doct, open(os.path.join(tmp, "BENCH_stress.json"), "w"))
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "artifact_check.py"), tmp],
        capture_output=True, text=True)
    if r.returncode == 0:
        failures.append("single-point: doctored artifact passed the check")
    else:
        if "graph_pagerank' carries a single valid scale point" not in r.stdout:
            failures.append(
                "single-point: failure output does not name the truncated "
                f"row:\n{r.stdout}")
        if "graph_components_knn' carries a single" in r.stdout:
            failures.append(
                "single-point: the allowlisted anchor row was flagged — "
                "SINGLE_POINT_OK is not consulted")
finally:
    shutil.rmtree(tmp)

if failures:
    print("FINGERPRINT FIXTURES FAILED:")
    for f in failures:
        print(f"  - {f}")
    sys.exit(1)
print("fingerprint fixtures: all pass")
