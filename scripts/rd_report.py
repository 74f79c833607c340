"""Summarize a campaign's results/ tree into an RD table + BD-rate.

    python scripts/rd_report.py /root/campaign

Reads the q*.json files cli.evaluate wrote under results/ (one directory
per run: intra/, dmc_<lambda>/, dmc_fast_<lambda>/), prints a markdown
RD table, and computes BD-rate between the base-DMC curve and (a) the
all-intra curve and (b) the fast-variant point set when present
(machinery proof over this framework's own runs; the reference protocol
is the same evaluator loop — /root/reference/dmc/test.py:106-241).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

# `python scripts/rd_report.py` puts scripts/ (not the repo root) on
# sys.path; add the root so the bdrate import works from anywhere.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_points(results_dir: Path):
    """(bpp, psnr) dataset-average per quality file, skipping warnings."""
    pts = []
    for qf in sorted(results_dir.glob("q*.json")):
        # the evaluator appends (re-runs add records); keep the last
        # record per video so repeated evals don't double-count
        by_video = {}
        for r in json.loads(qf.read_text()):
            if "bpp" in r and "psnr" in r:
                by_video[r.get("video", len(by_video))] = r
        recs = list(by_video.values())
        if not recs:
            continue
        bpp = sum(r["bpp"] for r in recs) / len(recs)
        psnr = sum(r["psnr"] for r in recs) / len(recs)
        pts.append((qf.stem, bpp, psnr))
    return pts


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/campaign")
    # accept either a campaign work dir or its results/ dir directly
    results = work / "results" if (work / "results").is_dir() else work
    runs = {}
    for d in sorted(results.iterdir()):
        if d.is_dir():
            pts = load_points(d)
            if pts:
                runs[d.name] = pts

    # Merge cached TPU measurements whose live results trees were lost
    # to VM resets (same protocol/corpus — provenance inside the file).
    # A live directory of the same name always wins.
    cached_runs = (Path(__file__).resolve().parent.parent
                   / "probes" / "dmc_mf5i_cached_points.json")
    if cached_runs.exists():
        live = set(runs)
        restored = []
        for p in json.loads(cached_runs.read_text())["points"]:
            if p["run"] not in live:
                runs.setdefault(p["run"], []).append(
                    (p["q"], p["bpp"], p["psnr"]))
                restored.append(p["run"])
        if restored:
            print(f"[cache] merged {len(restored)} r4-measured points "
                  f"with no live results dir: {', '.join(restored)}")

    print("| run | quality | bpp | psnr (dB) |")
    print("|---|---|---|---|")
    for name, pts in runs.items():
        for q, bpp, psnr in pts:
            print(f"| {name} | {q} | {bpp:.4f} | {psnr:.2f} |")

    # RD curves across lambda runs: one (bpp, psnr) point per lambda.
    # Result-dir naming: <family>_<lambda>[_gop<G>][_cpu<F>] where family
    # is dmc / dmc_fast and optional training-variant tags (_mf5 = the
    # max-frames-5 drift fine-tune, scripts/campaign3.sh). Curves are
    # grouped per (family, protocol suffix) so BD-rate only ever compares
    # runs evaluated under the same GOP/frame-count/backend protocol.
    import re

    name_re = re.compile(
        r"^(?P<family>(?:dmc|dvc|dcvc)(?:_fast\d*)?(?:_mf\d+[a-z]?)?)"
        r"_(?P<lam>[0-9.]+)"
        r"(?P<proto>(?:_gop\d+)?(?:_(?:cpu|tpu|f)\d+)?)$")
    curves: dict = {}
    for name, ps in runs.items():
        m = name_re.match(name)
        if not m:
            continue
        key = (m.group("family"), m.group("proto").lstrip("_") or "tpu96")
        for _q, bpp, psnr in ps:
            curves.setdefault(key, []).append(
                (float(m.group("lam")), bpp, psnr))

    def pareto(bpps, psnrs, label=""):
        """Keep the Pareto front: BD-rate is defined on monotone RD
        curves, so strictly-dominated points (another point has <= bpp
        AND >= psnr) are excluded — the standard practice. Dropped
        points are PRINTED, never silently eaten: a dominated point is
        itself a finding (e.g. the 8192 GOP-32 drift inversion)."""
        pts = sorted(zip(bpps, psnrs))
        front = []
        for b, p in pts:  # ascending bpp: keep only if psnr beats every
            if front and p <= front[-1][1]:  # cheaper point's psnr
                print(f"  [pareto] {label}: dropped dominated point "
                      f"(bpp={b:.4f}, psnr={p:.2f})")
                continue
            front.append((b, p))
        return [b for b, _ in front], [p for _, p in front]

    def rp(key):
        pts = sorted(curves.get(key, []))
        return pareto([p[1] for p in pts], [p[2] for p in pts],
                      label="_".join(key))

    from deepvideocodec_tpu.eval.bdrate import bd_rate

    def report(label, anchor_key, test_key):
        ar, ap = rp(anchor_key)
        tr, tp = rp(test_key)
        if len(ar) < 2 or len(tr) < 2:
            return
        try:
            print(f"BD-rate({label}, {anchor_key[1]}): "
                  f"{bd_rate(ar, ap, tr, tp):+.1f}%")
        except ValueError as e:
            print(f"BD-rate({label}, {anchor_key[1]}): n/a ({e})")

    protos = sorted({k[1] for k in curves})
    families = sorted({k[0] for k in curves})
    print()
    # all-intra anchor: union of (a) the committed cache of the r4d TPU
    # measurement (probes/intra_r4d_anchor.json — /root/campaign/results
    # dies with every VM reset) and (b) every live results/intra_* run,
    # merged per quality with LIVE points overriding cached ones (same
    # GOP-1 96-frame seed-0 protocol throughout; r5 adds q2/q3 to
    # extend the anchor band downward so it overlaps the DMC curves).
    anchor: dict = {}
    cached = (Path(__file__).resolve().parent.parent
              / "probes" / "intra_anchor_cache.json")
    if cached.exists():
        doc = json.loads(cached.read_text())
        anchor.update(
            (p["q"], (p["q"], p["bpp"], p["psnr"])) for p in doc["points"])
    live_qs: set = set()
    for name in sorted(runs):
        if name.startswith("intra"):
            for q, bpp, psnr in runs[name]:
                anchor[q] = (q, bpp, psnr)
                live_qs.add(q)
    intra = sorted(anchor.values()) or None
    if intra and cached.exists():
        print(f"[anchor] {len(intra)} intra points "
              f"({len(intra) - len(live_qs)} cached, "
              f"live: {sorted(live_qs) or 'none'})")
    # Two anchor bands, reported side by side (docs/RD.md r5 "q2 budget
    # wrinkle"): the FULL band unions every trained intra point — the
    # strictest comparison, but its low-q rungs (q2/q3, r5) carry more
    # training budget than the r4d rule (budgets equalize marginal
    # returns, rising with q) grants them; the R4D band is the
    # budget-documented q4-q6 ladder alone.
    anchor_bands = []
    if intra and len(intra) >= 2:
        anchor_bands.append(("all-intra", intra))
    r4d_only = [p for p in (intra or []) if p[0] in ("q4", "q5", "q6")]
    if len(r4d_only) >= 2 and len(r4d_only) != len(intra or []):
        anchor_bands.append(("all-intra[r4d-band]", r4d_only))
    for proto in protos:
        base = ("dmc", proto)
        # every family vs the all-intra anchor (the reference's own
        # headline comparison: P-frame coding gain over the I-codec)
        for aname, apts in anchor_bands:
            ir, ip = pareto([p[1] for p in apts],
                            [p[2] for p in apts], label=aname)
            for fam in families:
                fr, fp = rp((fam, proto))
                if len(fr) < 2:
                    continue
                try:
                    print(f"BD-rate({fam} vs {aname}, {proto}): "
                          f"{bd_rate(ir, ip, fr, fp):+.1f}%")
                except ValueError as e:
                    print(f"BD-rate({fam} vs {aname}, {proto}): "
                          f"n/a ({e})")
        report("fast vs base", base, ("dmc_fast", proto))
        report("mf5 vs base", base, ("dmc_mf5", proto))
        report("fast_mf5 vs fast", ("dmc_fast", proto),
               ("dmc_fast_mf5", proto))


if __name__ == "__main__":
    main()
