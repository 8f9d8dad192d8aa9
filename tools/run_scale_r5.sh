#!/bin/bash
# Round-5 scale evidence: the loop-on/loop-off pairs (loop closing must
# never hurt) at 700 frames.  Runs SEQUENTIALLY on the TPU (never two
# TPU processes).  Writes EVAL_SCALE_R5_*.log; tools/collect_scale_r5.py
# assembles EVAL_SCALE_R5.json from the final JSON line of each log.
# Optional: FRAMES=2000 LAPS=2.2 for the KITTI-00-scale single run.
set -x
cd "$(dirname "$0")/.."
F=${FRAMES:-700}
timeout 2700 python tools/eval_scale.py --frames $F --laps 1.15 --radius 55 \
    --scene interior --window 0 > EVAL_SCALE_R5_115_LOOP.log 2>&1
timeout 2700 python tools/eval_scale.py --frames $F --laps 1.15 --radius 55 \
    --scene interior --window 0 --no-loop > EVAL_SCALE_R5_115_NOLOOP.log 2>&1
timeout 2700 python tools/eval_scale.py --frames $F --laps 2.3 --radius 55 \
    --scene interior --window 0 > EVAL_SCALE_R5_23_LOOP.log 2>&1
timeout 2700 python tools/eval_scale.py --frames $F --laps 2.3 --radius 55 \
    --scene interior --window 0 --no-loop > EVAL_SCALE_R5_23_NOLOOP.log 2>&1
echo DONE
