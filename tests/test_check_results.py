"""scripts/check_results.py is the campaign chains' completeness guard
(ADVICE r4 medium: existence-only guards skipped killed-mid-run partial
results forever). Pin its contract: unique-video counting, warning-
record exclusion, --clean deletion of partials."""

import json
import subprocess
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "check_results.py"


def run(path, expect=4, clean=False):
    cmd = [sys.executable, str(SCRIPT), str(path), "--expect", str(expect)]
    if clean:
        cmd.append("--clean")
    return subprocess.run(cmd, capture_output=True, text=True).returncode


def rec(video, **kw):
    return {"video": video, "bpp": 0.5, "psnr": 30.0, **kw}


def test_complete_passes(tmp_path):
    f = tmp_path / "q6.json"
    f.write_text(json.dumps([rec(f"s{i}") for i in range(4)]))
    assert run(f) == 0
    assert f.exists()


def test_partial_fails_and_clean_deletes(tmp_path):
    f = tmp_path / "q6.json"
    f.write_text(json.dumps([rec("s0"), rec("s1")]))
    assert run(f) == 1
    assert f.exists()            # without --clean the file stays
    assert run(f, clean=True) == 1
    assert not f.exists()        # --clean deletes for a fresh re-run


def test_duplicate_videos_are_one_record(tmp_path):
    # append-semantics re-runs can duplicate a video's record; four
    # copies of one sequence are still a partial dataset point
    f = tmp_path / "q6.json"
    f.write_text(json.dumps([rec("s0")] * 4))
    assert run(f) == 1


def test_warning_records_do_not_count(tmp_path):
    f = tmp_path / "q6.json"
    recs = [{"warning": "untrained_random_init", "quality": 6}]
    recs += [rec(f"s{i}") for i in range(3)]
    f.write_text(json.dumps(recs))
    assert run(f) == 1
    recs += [rec("s3")]
    f.write_text(json.dumps(recs))
    assert run(f) == 0


def test_unparsable_cleaned(tmp_path):
    f = tmp_path / "q6.json"
    f.write_text("[{truncated")
    assert run(f, clean=True) == 1
    assert not f.exists()


def test_missing_fails(tmp_path):
    assert run(tmp_path / "nope.json") == 1
