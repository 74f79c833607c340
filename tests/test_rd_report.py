"""Regression tests for scripts/rd_report.py — the BD-rate reporting
logic is load-bearing for the campaign's headline numbers.

Covers (against a synthetic results tree):
- cached-point merge: committed anchor/curve caches fill in for results
  directories lost to VM resets, and LIVE directories always win;
- the two anchor bands (full vs r4d q4-q6) reported side by side
  (docs/RD.md r5 'q2 budget wrinkle');
- Pareto exclusions are printed, never silently eaten.

Runs the script as a subprocess exactly as the campaigns do.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _write(tree: Path, run: str, q: str, pts):
    d = tree / "results" / run
    d.mkdir(parents=True, exist_ok=True)
    recs = [{"video": f"s{i}", "bpp": b, "psnr": p}
            for i, (b, p) in enumerate(pts)]
    (d / f"{q}.json").write_text(json.dumps(recs))


def _run(tree: Path) -> str:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "rd_report.py"), str(tree)],
        capture_output=True, text=True, env={"JAX_PLATFORMS": "cpu",
                                             "PATH": "/usr/bin:/bin"})
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_cached_curve_merge_and_live_override(tmp_path):
    # live dirs for two lambdas; the committed cache should fill the
    # other mf5i points and never shadow a live dir of the same name
    _write(tmp_path, "dmc_mf5i_512_gop8_f96", "q6", [(0.9, 10.0)])
    _write(tmp_path, "dmc_mf5i_32768_gop8_f96", "q6", [(0.52, 28.0)])
    txt = _run(tmp_path)
    assert "[cache] merged" in txt
    # live 512 point (0.9/10.0) wins over the cached 0.1977/23.80
    assert "| dmc_mf5i_512_gop8_f96 | q6 | 0.9000 | 10.00 |" in txt
    # cached 2048/8192 restored
    assert "dmc_mf5i_2048_gop8_f96" in txt
    assert "dmc_mf5i_8192_gop8_f96" in txt


def test_anchor_bands_and_pareto_prints(tmp_path):
    # a live q3 point plus the cached q2-q6 ladder -> both bands print;
    # a dominated curve point must be announced, not dropped silently
    _write(tmp_path, "intra_live", "q3", [(0.24, 23.4)])
    _write(tmp_path, "dmc_mf5i_512_gop8_f96", "q6", [(0.20, 23.8)])
    _write(tmp_path, "dmc_mf5i_2048_gop8_f96", "q6", [(0.32, 25.2)])
    # dominated: more rate, less psnr than the 2048 point
    _write(tmp_path, "dmc_mf5i_8192_gop8_f96", "q6", [(0.41, 24.0)])
    _write(tmp_path, "dmc_mf5i_32768_gop8_f96", "q6", [(0.52, 28.0)])
    txt = _run(tmp_path)
    assert "live: ['q3']" in txt
    assert "BD-rate(dmc_mf5i vs all-intra, gop8_f96):" in txt
    assert "BD-rate(dmc_mf5i vs all-intra[r4d-band], gop8_f96):" in txt
    assert "[pareto] dmc_mf5i_gop8_f96: dropped dominated point" in txt


def test_no_intra_results_uses_cache_only(tmp_path):
    _write(tmp_path, "dmc_mf5i_512_gop8_f96", "q6", [(0.20, 23.8)])
    _write(tmp_path, "dmc_mf5i_32768_gop8_f96", "q6", [(0.52, 28.0)])
    txt = _run(tmp_path)
    # all five cached rungs, no live ones
    assert "5 intra points (5 cached, live: none)" in txt
