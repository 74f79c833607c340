"""The bench.py CPU-fallback path must emit valid scoreboard JSON.

Round 4's scoreboard was lost to an untested crash on exactly this path
(BENCH_r04.json rc=1: a function-local ``import sys`` at the old
bench.py:210 shadowed the module import used by the relay-failure
diagnostic print). This test runs bench.py end to end in a subprocess
with BENCH_FORCE_CPU_FALLBACK=1 (which short-circuits the relay
preflight into the relay-down branch) on a tiny CPU protocol and
asserts a parseable driver record — rc=0 and one JSON line with
metric/value/unit/vs_baseline — no matter what the TPU relay is doing.

Protocol being protected: the driver's round-end ``python bench.py``
capture (reference wall-clock shape: /root/reference/dmc/test.py:236-239).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_cpu_fallback_emits_driver_json():
    env = dict(os.environ)
    env.update({
        "BENCH_FORCE_CPU_FALLBACK": "1",
        "BENCH_SIZE": "64x64",
        "BENCH_FRAMES": "2",
        "BENCH_STREAMS": "1",
        "JAX_COMPILATION_CACHE_DIR": str(REPO / ".jax_cache"),
        # -O0: compile time dominates on the 1-core host (conftest.py).
        "XLA_FLAGS": "--xla_backend_optimization_level=0",
    })
    # The forced-fallback branch itself sets jax_platforms=cpu inside
    # bench.py; leaving JAX_PLATFORMS unset here exercises that switch
    # the same way a real relay-down driver run would.
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO),
        env=env,
    )
    assert r.returncode == 0, (
        f"bench.py fallback path crashed (rc={r.returncode})\n"
        f"stderr tail:\n{r.stderr[-2000:]}")
    # The driver parses the LAST stdout line as the scoreboard record.
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr tail:\n{r.stderr[-2000:]}"
    rec = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, f"missing {key!r} in {rec}"
    assert rec["value"] > 0
    assert rec["platform"] == "cpu-fallback"
    assert "last_measured_tpu" in rec
    # The diagnostic that crashed r4 must have been printed, not raised.
    assert "forced CPU fallback" in r.stderr
