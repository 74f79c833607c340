#!/usr/bin/env python3
"""Exit 0 iff a results q*.json holds >= N complete sequence records.

Campaign-chain guard helper. `cli.evaluate` appends ONE record per
sequence (eval/evaluator.py:append_result), so an eval killed mid-run
leaves a partial-but-existing file; an existence-only `[ -f q6.json ]`
guard then skips it forever and rd_report silently averages fewer
sequences as a full dataset point (ADVICE r4, medium). Campaign scripts
call this instead:

    python scripts/check_results.py results/<tag>/q6.json --expect 4 --clean

Exit 0: file exists and has >= --expect non-warning records (complete).
Exit 1: missing / unparsable / partial. With --clean, a partial or
unparsable file is deleted so the caller's re-run starts fresh instead
of appending duplicates onto the partial list.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("results_json", type=Path)
    ap.add_argument("--expect", type=int, default=4,
                    help="required number of sequence records "
                         "(eval corpus size; default 4)")
    ap.add_argument("--clean", action="store_true",
                    help="delete the file when incomplete/unparsable")
    args = ap.parse_args()

    p = args.results_json
    if not p.is_file():
        return 1
    try:
        records = json.loads(p.read_text())
        # count UNIQUE videos: append-semantics re-runs can duplicate a
        # sequence's record, and N duplicates of one video are still a
        # partial result, not a complete dataset point
        good = {r.get("video", i) for i, r in enumerate(records)
                if isinstance(r, dict) and not r.get("warning")
                and "bpp" in r}
    except (json.JSONDecodeError, TypeError, AttributeError):
        good = None
    if good is not None and len(good) >= args.expect:
        return 0
    n = "unparsable" if good is None else f"{len(good)}/{args.expect}"
    if args.clean:
        p.unlink()
        print(f"check_results: {p} partial ({n}) — deleted for re-run",
              file=sys.stderr)
    else:
        print(f"check_results: {p} partial ({n})", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
