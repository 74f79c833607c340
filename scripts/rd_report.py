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


def load_points(results_dir: Path):
    """(bpp, psnr) dataset-average per quality file, skipping warnings."""
    pts = []
    for qf in sorted(results_dir.glob("q*.json")):
        recs = [r for r in json.loads(qf.read_text())
                if "bpp" in r and "psnr" in r]
        if not recs:
            continue
        bpp = sum(r["bpp"] for r in recs) / len(recs)
        psnr = sum(r["psnr"] for r in recs) / len(recs)
        pts.append((qf.stem, bpp, psnr))
    return pts


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/campaign")
    results = work / "results"
    runs = {}
    for d in sorted(results.iterdir()):
        if d.is_dir():
            pts = load_points(d)
            if pts:
                runs[d.name] = pts

    print("| run | quality | bpp | psnr (dB) |")
    print("|---|---|---|---|")
    for name, pts in runs.items():
        for q, bpp, psnr in pts:
            print(f"| {name} | {q} | {bpp:.4f} | {psnr:.2f} |")

    # RD curves across lambda runs: one (bpp, psnr) point per lambda.
    def curve(prefix):
        pts = []
        for name, ps in runs.items():
            if name.startswith(prefix) and name[len(prefix):].replace(
                    ".", "").isdigit():
                lam = float(name[len(prefix):])
                for _q, bpp, psnr in ps:
                    pts.append((lam, bpp, psnr))
        pts.sort()
        return [p[1] for p in pts], [p[2] for p in pts]

    base_r, base_p = curve("dmc_")
    fast_r, fast_p = curve("dmc_fast_")
    intra = runs.get("intra")
    from deepvideocodec_tpu.eval.bdrate import bd_rate

    if len(base_r) >= 2 and intra and len(intra) >= 2:
        ir = [p[1] for p in intra]
        ip = [p[2] for p in intra]
        try:
            print(f"\nBD-rate(DMC vs all-intra): "
                  f"{bd_rate(ir, ip, base_r, base_p):+.1f}%")
        except ValueError as e:
            print(f"\nBD-rate(DMC vs all-intra): n/a ({e})")
    if len(base_r) >= 2 and len(fast_r) >= 2:
        print(f"BD-rate(fast vs base): "
              f"{bd_rate(base_r, base_p, fast_r, fast_p):+.1f}%")


if __name__ == "__main__":
    main()
