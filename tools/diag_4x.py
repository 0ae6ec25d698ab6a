"""One-off diagnostic: CPU profile during 4x concurrent pinned builds."""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")
from tools.scaling_probe import BUILD_SNIPPET, CpuSampler, run_concurrent

cands = sorted(glob.glob("/tmp/scaling_probe_*/pages"), key=os.path.getmtime)
pages = cands[-1]
pins = ["0-7", "8-15", "16-23", "24-31"]
pairs = [
    (
        BUILD_SNIPPET.format(
            repo="/root/repo", cores=8, pages=pages, out=f"/tmp/idx_diag{i}"
        ),
        p,
    )
    for i, p in enumerate(pins)
]
s = CpuSampler(0.5)
s.start()
wall, per = run_concurrent(pairs)
cpu = s.stop()
print(json.dumps({"walls": [r["seconds"] for r in per], "cpu_during_4x": cpu}))
