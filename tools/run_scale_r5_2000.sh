#!/bin/bash
# KITTI-00-scale burn-in (VERDICT r4 item 3): 2000 frames, 6.6 laps of
# the radius-55 interior course (~2280 m track, 5 revisit events), full
# pipelined System, loop-on and loop-off.  World streams from the
# device-rendered cache (tools/prerender.py --backend jax --frames 2000
# --laps 6.6 first).  Sequential on the TPU.
set -x
cd "$(dirname "$0")/.."
RB="--render-backend jax"
timeout 5400 python tools/eval_scale.py --frames 2000 --laps 6.6 --radius 55 \
    --scene interior --window 0 $RB > EVAL_SCALE_R5_2000_LOOP.log 2>&1
timeout 5400 python tools/eval_scale.py --frames 2000 --laps 6.6 --radius 55 \
    --scene interior --window 0 --no-loop $RB > EVAL_SCALE_R5_2000_NOLOOP.log 2>&1
echo DONE
