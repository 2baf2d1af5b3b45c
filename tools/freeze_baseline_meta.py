#!/usr/bin/env python3
"""Stamp tools/baseline_meta.json at round-close freeze time.

Run IMMEDIATELY AFTER tools/record_isolated_baseline.sh, before
committing the freeze. Records:
  commit             — HEAD (the binary the baseline was measured at);
                       src_unchanged_since_freeze scopes git ranges
                       from here
  frozen_at_epoch    — wall clock of the freeze
  testdata_fingerprint — {basename(sf_dir): {file: sha256}} content
                       hashes of every parquet in each given data dir;
                       post_adjudicate.testdata_regenerated_since_freeze
                       compares CONTENT (ADVICE r19: mtimes change on
                       copy/touch without a data change and must not
                       open the probe-clamp waiver)

Usage: python3 tools/freeze_baseline_meta.py [sf_dir ...]
       (default: /root/testdata/sf0.1)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import post_adjudicate as pa  # noqa: E402


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    try:
        with open(pa.BASE_META) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        meta = {}
    meta["commit"] = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=pa.REPO, check=True).stdout.strip()
    meta["frozen_at_epoch"] = int(time.time())
    fps = meta.get("testdata_fingerprint") or {}
    for d in dirs:
        fp = pa.testdata_fingerprint(d)
        if fp is None:
            print(f"WARN: no parquet under {d}; skipped", file=sys.stderr)
            continue
        fps[os.path.basename(os.path.normpath(d))] = fp
    meta["testdata_fingerprint"] = fps
    with open(pa.BASE_META, "w") as f:
        json.dump(meta, f, indent=2)
        f.write("\n")
    print(f"stamped {pa.BASE_META}: commit {meta['commit'][:9]}, "
          f"fingerprinted {sorted(fps)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
