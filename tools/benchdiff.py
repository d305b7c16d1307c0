#!/usr/bin/env python3
"""Calibration-normalized comparison of two bench artifacts.

Usage: python3 tools/benchdiff.py <old> <new> [--threshold 1.5]

Accepts either artifact shape:
  * bench_results.json — the full JSON graft.Bench writes (has
    "queries" / "queries_max" / "calib_*" at top level);
  * BENCH_rN.json — the driver's capture ({n, rc, sf, tail, parsed}).
    The per-query map is recovered from the stdout tail; the tail is
    bounded, so the map may be PARTIAL (head-truncated) — recovered
    pairs are compared and the cut is reported, never papered over.

Normalization (PERF.md "Environment caveat"): this host's throttle
cuts parallel CPU bandwidth while single-core speed stays flat, so
each run's all-cores calibration reading (calib_nt_*) inflates by the
same factor its query times do. Per run we take
    factor = mean(calib_nt) / mean(calib_1t)
and report time / factor beside the raw number. A clean host reads
factor ≈ 1; a mildly loaded one ~1.2–1.3; a throttled one 5–10×.
Rounds before r6 carry no calibration fields — their numbers print
raw with a loud [no-calib] marker, because no after-the-fact
normalization is honest for them.

Delta attribution (r8): each artifact carries a corpus fingerprint
("data_fp", md5 over parquet name|size|mtime). Equal fingerprints +
clean calibration + >threshold ratio = CODE-shaped delta (gates).
Different fingerprints = DATA-shaped (the driver regenerated
testdata; flagged loudly, never gates). High calibration factor =
HOST-shaped (normalized away before the ratio).

Exit status: 0 if no per-query regression exceeds the threshold,
1 if any does (so CI-ish loops can gate on it). Data-shifted runs
always exit 0.
"""
import argparse
import json
import re
import sys


def _parse_queries_blob(text, key):
    """Extract the {"name":sec,...} map following `"key":{` in a stdout
    tail. Returns (dict, partial) — partial=True when the map's head was
    cut off by the tail window and only a suffix of pairs is present."""
    marker = f'"{key}":{{'
    i = text.find(marker)
    if i >= 0:
        j = text.index("}", i)
        blob = text[i + len(marker) - 1 : j + 1]
        return json.loads(blob), False
    # head-truncated: the tail starts mid-map. Recover "name":float pairs
    # up to the first closing brace (the end of the queries map), then
    # only if they look like query timings (q_* keys). The value must
    # contain a '.' — Scala emits Double times as "0.42"/"12.0" but
    # sweep positions as bare ints ("157"), so a tail that begins inside
    # the r10+ "sweep_pos" map recovers NOTHING rather than harvesting
    # dimensionless positions as seconds and gating on garbage.
    head = text.split("}", 1)[0]
    pairs = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"(q_[A-Za-z0-9_]+)":([0-9]+\.[0-9eE+-]+)', head)
    )
    return pairs, True


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:  # bench_results.json
        meta = d
        queries, partial = d["queries"], False
    elif "tail" in d:  # driver BENCH_rN.json
        meta = d.get("parsed") or {}
        queries, partial = _parse_queries_blob(d["tail"], "queries")
    else:
        sys.exit(f"{path}: neither bench_results.json nor BENCH_rN.json shape")
    calib = None
    if "calib_nt_before_sec" in meta:
        # r7+ runs add a mid-sweep reading; include it when present
        pts = ["before", "after"] + (["mid"] if "calib_nt_mid_sec" in meta else [])
        nt = sum(meta[f"calib_nt_{p}_sec"] for p in pts) / len(pts)
        st = sum(meta[f"calib_1t_{p}_sec"] for p in pts) / len(pts)
        calib = nt / st if st > 0 else None
    # r10+: forward-sweep position per query + the self-labeled suspect
    # list, so load-vs-position correlation is checkable from artifacts
    if "queries" in d:
        sweep_pos = d.get("sweep_pos") or {}
        suspects = d.get("suspect_load") or []
    else:
        # exact-marker only: the head-truncation fallback would scrape
        # query TIMES as "positions" from pre-r10 artifacts that lack
        # the field at all
        tail = d.get("tail", "")
        if '"sweep_pos":{' in tail:
            try:
                sweep_pos, _ = _parse_queries_blob(tail, "sweep_pos")
                sweep_pos = {k: int(v) for k, v in sweep_pos.items()}
            except Exception:
                sweep_pos = {}
        else:
            sweep_pos = {}
        m = re.search(r'"suspect_load":\[([^\]]*)\]', d.get("tail", ""))
        suspects = re.findall(r'"(q_[A-Za-z0-9_]+)"', m.group(1)) if m else []
    return {
        "path": path,
        "data_fp": meta.get("data_fp"),
        "total": meta.get("value"),
        "n_queries": meta.get("n_queries"),
        "n_errors": meta.get("n_errors"),
        "queries": queries,
        "partial": partial,
        "factor": calib,
        "sweep_pos": sweep_pos,
        "suspects": suspects,
    }


def fmt_run(r):
    tag = f"{r['path']}: total {r['total']:.1f}s raw, {r['n_queries']} queries, {r['n_errors']} errors"
    if r["factor"] is None:
        return tag + "  [no-calib: pre-r6 artifact, raw numbers only]"
    return (
        tag
        + f", calib factor {r['factor']:.2f}"
        + f" -> {r['total'] / r['factor']:.1f}s normalized"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    a, b = load(args.old), load(args.new)
    print(fmt_run(a))
    print(fmt_run(b))
    for r in (a, b):
        if r["partial"]:
            print(
                f"note: {r['path']} tail was head-truncated — only "
                f"{len(r['queries'])} of {r['n_queries']} per-query times recovered"
            )

    # r8+: artifacts carry a corpus fingerprint (md5 over parquet
    # name|size|mtime). Different fingerprints mean the driver
    # regenerated testdata between the runs — per-query deltas are then
    # DATA-shaped, not code regressions, and must not gate.
    data_shifted = (
        a["data_fp"] is not None
        and b["data_fp"] is not None
        and a["data_fp"] != b["data_fp"]
    )
    if data_shifted:
        print(
            f"DATA-SHIFTED: corpus fingerprints differ "
            f"({a['data_fp']} -> {b['data_fp']}) — deltas below reflect "
            f"regenerated testdata, not code; not gating on them"
        )
    elif a["data_fp"] is None or b["data_fp"] is None:
        print("note: no corpus fingerprint in one or both artifacts (pre-r8) — "
              "data shifts are invisible here")

    fa = a["factor"] or 1.0
    fb = b["factor"] or 1.0
    shared = sorted(set(a["queries"]) & set(b["queries"]))
    only_a = sorted(set(a["queries"]) - set(b["queries"]))
    only_b = sorted(set(b["queries"]) - set(a["queries"]))
    if only_a:
        print(f"removed in new ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"added in new ({len(only_b)}): {', '.join(only_b)}")

    rows = []
    for q in shared:
        va, vb = a["queries"][q] / fa, b["queries"][q] / fb
        # sub-100ms pairs are pure dispatch noise at any ratio
        ratio = vb / va if va > 0 else float("inf")
        rows.append((q, va, vb, ratio))
    rows.sort(key=lambda r: -r[3])

    regressions = [
        r for r in rows if r[3] > args.threshold and max(r[1], r[2]) >= 0.1
    ]
    improved = [r for r in rows if r[3] < 1 / args.threshold and r[1] >= 0.1]
    print(f"\nshared queries: {len(shared)}; normalized deltas over {args.threshold}x:")
    if not regressions:
        print("  (none)")
    tag = " [data-shifted]" if data_shifted else ""

    def pos_tag(run, q):
        p = run["sweep_pos"].get(q)
        if p is None or not run["n_queries"]:
            return ""
        return f" [sweep pos {p}/{run['n_queries'] - 1}]"

    for q, va, vb, ratio in regressions:
        print(f"  REGRESSED {q}: {va:.2f}s -> {vb:.2f}s ({ratio:.1f}x){tag}{pos_tag(b, q)}")

    # r10: suspect-load vs sweep-position correlation — the r9 verdict
    # noted all three suspect-flagged queries sat late in the sweep;
    # with positions in the artifact that reading is mechanical
    for run in (a, b):
        if run["suspects"] and run["sweep_pos"] and run["n_queries"]:
            locs = [
                (q, run["sweep_pos"].get(q))
                for q in run["suspects"]
                if run["sweep_pos"].get(q) is not None
            ]
            if locs:
                half = (run["n_queries"] - 1) / 2.0
                late = sum(1 for _, p in locs if p > half)
                print(
                    f"suspect-load positions in {run['path']}: "
                    + ", ".join(f"{q}@{p}/{run['n_queries'] - 1}" for q, p in locs)
                    + f"  ({late}/{len(locs)} in the late half)"
                )
    if improved:
        print(f"improved by >{args.threshold}x: {len(improved)}")
        for q, va, vb, ratio in improved[-5:]:
            print(f"  improved {q}: {va:.2f}s -> {vb:.2f}s ({ratio:.2f}x)")
    tot_a = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(
        f"shared-query normalized totals: {tot_a:.1f}s -> {tot_b:.1f}s "
        f"({tot_b / tot_a:.2f}x)"
    )
    sys.exit(1 if regressions and not data_shifted else 0)


if __name__ == "__main__":
    main()
