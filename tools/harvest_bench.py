#!/usr/bin/env python
"""Harvest bench JSON lines from hardware-battery logs into a tracked
artifact (VERDICT r3 next #4: measurements as artifacts, not prose).

Scans battery logs for ``{"metric": ...}`` lines, attaches the command
that produced each one (the preceding ``### HH:MM:SS cmd`` marker) plus
the log's date header, and writes a JSON array. Later runs of the same
(metric, config, batch, cmd) replace earlier ones.

Usage:
    python tools/harvest_bench.py OUT.json LOG [LOG ...]
    python tools/harvest_bench.py docs/bench_r4.json /tmp/hw_r4_phase*.log
"""

import json
import re
import sys


def harvest(paths):
    rows = {}
    order = []
    for path in paths:
        cmd, date = None, None
        try:
            lines = open(path, errors="replace").read().splitlines()
        except OSError as e:
            print(f"skip {path}: {e}", file=sys.stderr)
            continue
        for line in lines:
            m = re.match(r"=== .*?(\w{3} \w{3} +\d+ [\d:]+ \w+ \d{4})", line)
            if m:
                date = m.group(1)
                continue
            m = re.match(r"### [\d:]+ (.+)", line)
            if m and not m.group(1).startswith("exit="):
                cmd = m.group(1)
                continue
            if line.startswith('{"metric"'):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                rec["cmd"] = cmd
                if date:
                    rec["date"] = date
                key = (rec["metric"], rec.get("config"), rec.get("batch"),
                       cmd)
                if key not in rows:
                    order.append(key)
                rows[key] = rec
    return [rows[k] for k in order]


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, logs = sys.argv[1], sys.argv[2:]
    recs = harvest(logs)
    with open(out, "w") as f:
        json.dump(recs, f, indent=1)
        f.write("\n")
    print(f"{out}: {len(recs)} records from {len(logs)} logs")
