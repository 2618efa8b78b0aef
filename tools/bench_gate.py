#!/usr/bin/env python3
"""Bench regression gate: compare two bench artifacts and label each wall
regression REAL (cpu/shuffle moved with it) or ENVIRONMENTAL (identical
work profile, different host conditions — the round-3/4 driver-outlier
pattern, where a loaded host doubled wall times while per-query shuffle
bytes and cpu stayed flat).

usage: bench_gate.py OLD.json NEW.json [--wall-thresh 1.3] [--attr-band 0.3]
                     [--same-build] [--require-sha HEX]
       bench_gate.py --audit ARTIFACT.json [--srsw-thresh 2.5]

Build provenance (r11): Bench stamps every artifact with the git SHA it
was built from plus a dirty flag for uncommitted build inputs. The gate
prints both sides' fingerprints; --same-build refuses (exit 2) unless
both artifacts carry the SAME sha (use for idle-vs-loaded adjudication
of one build — the round-9 stale-row class this exists to catch);
--require-sha=HEX refuses unless NEW's recorded sha prefix-matches HEX
(pin the artifact to the commit you think you measured). Unstamped
(pre-r11) artifacts always warn.

--audit runs single-artifact invariants: any query whose shuffle-read
exceeds --srsw-thresh x its shuffle-write is flagged as a
branch-recompute suspect (a heavy subplan re-executed per aggregate
branch -- the graph_modularity round-8 finding, where the co-line
self-join ran once per derived aggregate and sr measured 4x sw; a
plain self-join's reused exchange reads at most ~2x its write).

Accepts either the full one-line Bench output (BENCH_FULL.json) or a
driver BENCH_r{N}.json wrapper (the embedded line is recovered from its
captured tail when the head survived truncation).

exit 0: no REAL regressions; exit 1: at least one; exit 2: unusable input.
"""
import json
import re
import sys


def load_artifact(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver wrapper: the bench line lives in the captured output tail
    tail = d.get("tail", "")
    m = re.search(r'\{"metric":.*?"sf":"[^"]*"\}', tail)
    if m:
        return json.loads(m.group(0))
    print(f"error: {path} holds no parseable bench line "
          "(driver tail truncated its head) — compare the committed "
          "BENCH_FULL.json artifacts instead", file=sys.stderr)
    sys.exit(2)


def ratio(new, old):
    return new / old if old > 0 else float("inf")


def audit(path, srsw_thresh):
    """Single-artifact invariants; exit 1 on any violation."""
    d = load_artifact(path)
    bad = []
    for q, m in sorted(d.get("metrics", {}).items()):
        if not isinstance(m, dict):
            continue
        sr, sw = m.get("sr_mb", 0) or 0, m.get("sw_mb", 0) or 0
        # sub-MB exchanges are broadcast/metadata frames — ratio is noise
        if sw >= 1.0 and sr / sw > srsw_thresh:
            bad.append((sr / sw, q, sr, sw))
    for r, q, sr, sw in sorted(bad, reverse=True):
        print(f"RECOMPUTE-SUSPECT {q}: shuffle-read {sr:.0f} MB is "
              f"x{r:.1f} its write {sw:.0f} MB — a heavy subplan likely "
              "re-executes per branch (collapse into one aggregation)")
    errs = d.get("errors") or {}
    for q, e in sorted(errs.items()):
        print(f"ERRORED {q}: {e}")
    n = len(d.get("queries", {}))
    if bad or errs:
        print(f"== audit: {len(bad)} recompute suspect(s), "
              f"{len(errs)} error(s) over {n} queries ==")
        sys.exit(1)
    print(f"== audit clean: {n} queries, no recompute suspects, "
          "no errors ==")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]

    def as_float(s):
        try:
            return float(s)
        except ValueError:
            return None
    opts = {a.split("=")[0]: as_float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a
            if as_float(a.split("=")[1]) is not None}
    if "--audit" in sys.argv[1:]:
        if len(args) != 1:
            print(__doc__)
            sys.exit(2)
        audit(args[0], opts.get("--srsw-thresh", 2.5))
        return
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    wall_thresh = opts.get("--wall-thresh", 1.3)
    band = opts.get("--attr-band", 0.3)

    old, new = load_artifact(args[0]), load_artifact(args[1])

    def fp(d):
        sha = d.get("git_sha")
        if not sha:
            return "UNSTAMPED (pre-r11 artifact: rows unverifiable)"
        return sha[:10] + ("+dirty" if d.get("git_dirty") else "")
    print(f"build: {fp(old)} -> {fp(new)}")
    if "--same-build" in sys.argv[1:]:
        osha, nsha = old.get("git_sha"), new.get("git_sha")
        if not osha or not nsha or osha != nsha:
            print("error: --same-build requires both artifacts stamped "
                  f"with the SAME sha (got {fp(old)} vs {fp(new)}) — "
                  "these rows are from different builds and cannot "
                  "adjudicate host conditions", file=sys.stderr)
            sys.exit(2)
    req = [a.split("=", 1)[1] for a in sys.argv[1:]
           if a.startswith("--require-sha=")]
    if req:
        nsha = new.get("git_sha") or ""
        if not nsha.startswith(req[0]):
            print(f"error: NEW artifact is stamped {fp(new)}, not the "
                  f"required {req[0]} — it measures a different build",
                  file=sys.stderr)
            sys.exit(2)
    oq, nq = old["queries"], new["queries"]
    om, nm = old.get("metrics", {}), new.get("metrics", {})
    oload, nload = old.get("loadavg"), new.get("loadavg")

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    real, environmental, improved = [], [], []

    for name in sorted(set(oq) & set(nq)):
        ow, nw = oq[name], nq[name]
        if ow < 0 or nw < 0:
            real.append((name, ow, nw, "errored run (wall = -1)"))
            continue
        if ow < 0.05 and nw < 0.05:
            continue  # sub-50ms noise floor
        r = ratio(nw, ow)
        if r <= wall_thresh:
            if r < 1 / wall_thresh and ow >= 0.5:
                improved.append((name, ow, nw, r))
            continue
        omx, nmx = om.get(name), nm.get(name)
        if not omx or not nmx:
            real.append((name, ow, nw,
                         f"wall x{r:.2f}, unattributable (missing metrics)"))
            continue
        cpu_r = ratio(nmx.get("cpu", 0), omx.get("cpu", 0)) \
            if omx.get("cpu", 0) >= 0.5 else 1.0  # sub-0.5s cpu: noise
        sw_r = ratio(nmx.get("sw_mb", 0), omx.get("sw_mb", 0)) \
            if omx.get("sw_mb", 0) >= 0.5 else 1.0
        profile_flat = abs(cpu_r - 1) <= band and abs(sw_r - 1) <= band
        # intra-run rep spread: when one run's own reps of the SAME plan
        # span >=3x wall, the median is hostage to host contention and no
        # cross-run wall (or cpu — cycle counts inflate under cache/SMT
        # pressure) comparison is attributable. Verified empirically: an
        # idle-host rerun of the identical commit produced rep walls
        # spanning 7.1s..133s on the banded self-join family with
        # byte-identical shuffle.
        def spread(mx):
            walls = [w for w in mx.get("walls", []) if w > 0]
            return (max(walls) / min(walls)) if len(walls) >= 2 else 1.0

        def min_wall(mx, fallback):
            # Bench emits wall_min for multi-rep queries; older artifacts
            # carry only the walls array; single-rep queries fall back to
            # their one (median == only) wall
            if mx.get("wall_min", 0) > 0:
                return mx["wall_min"]
            walls = [w for w in mx.get("walls", []) if w > 0]
            return min(walls) if walls else fallback
        noisy = max(spread(omx), spread(nmx))
        detail = (f"wall x{r:.2f} ({ow:.2f}s -> {nw:.2f}s), "
                  f"cpu x{cpu_r:.2f}, shuffle-write x{sw_r:.2f}, "
                  f"loadavg {oload} -> {nload}")
        if profile_flat:
            environmental.append((name, ow, nw, detail))
        elif abs(sw_r - 1) <= band and noisy >= 3.0:
            # the median is hostage to contention, but a >=3x spread must
            # not auto-excuse a genuine cpu-bound regression (which also
            # leaves shuffle flat): re-adjudicate on the min-of-reps wall,
            # the least-contended observation of the same plan on each
            # side. Only if even the best-case rep stays inside the
            # threshold is the regression environmental.
            r_min = ratio(min_wall(nmx, nw), min_wall(omx, ow))
            if r_min <= wall_thresh:
                environmental.append((name, ow, nw,
                    f"{detail}; rep spread x{noisy:.1f} with flat shuffle, "
                    f"min-rep x{r_min:.2f} within threshold — "
                    "contention-dominated median"))
            else:
                real.append((name, ow, nw,
                    f"{detail}; rep spread x{noisy:.1f} but min-rep "
                    f"x{r_min:.2f} STILL exceeds the threshold — the "
                    "slowdown outruns the noise (confirm on an idle host)"))
        else:
            real.append((name, ow, nw, detail))

    tot_o = sum(v for v in oq.values() if v >= 0)
    tot_n = sum(v for v in nq.values() if v >= 0)
    print(f"total wall: {tot_o:.1f}s ({len(oq)} queries) -> "
          f"{tot_n:.1f}s ({len(nq)} queries)")
    if added:
        print(f"added: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    for name, _, _, d in environmental:
        print(f"ENVIRONMENTAL {name}: {d}")
    for name, ow, nw, r in improved:
        print(f"improved {name}: {ow:.2f}s -> {nw:.2f}s (x{r:.2f})")
    for name, _, _, d in real:
        print(f"REAL {name}: {d}")
    if real:
        print(f"== {len(real)} real regression(s) ==")
        sys.exit(1)
    print("== no real regressions ==")


if __name__ == "__main__":
    main()
