"""Assemble EVAL_SCALE_R5.json from the run_scale_r5.sh logs."""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

runs = []
for log in sorted(glob.glob(os.path.join(REPO, "EVAL_SCALE_R5_*.log"))):
    last = None
    with open(log) as f:
        for line in f:
            if line.startswith("{") and '"scale_run"' in line:
                last = json.loads(line)
    if last is not None:
        last["log"] = os.path.basename(log)
        runs.append(last)

out = {
    "round": 5,
    "world": "interior pillar-ring loop course (aperiodic v10 texture, "
             "mip-filtered rendering), 1241x376, 2000 features, radius 55",
    "runs": runs,
}
with open(os.path.join(REPO, "EVAL_SCALE_R5.json"), "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote EVAL_SCALE_R5.json with {len(runs)} runs")
for r in runs:
    print(f"  {r['log']}: fps={r['fps']} ate={r['ate_rmse_m']} "
          f"loops={r['loops_closed']}/{r.get('loops_rejected', 0)}rej")
