#!/bin/bash
# Round-5 (second half) scale evidence re-runs: loop-on/loop-off pairs at
# 700 frames on the device-rendered (jax-backend) worlds, streaming from
# the pre-rendered cache (tools/prerender.py --backend jax).  Runs
# SEQUENTIALLY on the TPU.  The first 115 loop-on pass doubles as the
# compile-cache warmer; it is re-run afterwards for the steady-state
# number that lands in EVAL_SCALE_R5_115_LOOP.log.
set -x
cd "$(dirname "$0")/.."
F=${FRAMES:-700}
RB="--render-backend jax"
timeout 2700 python tools/eval_scale.py --frames $F --laps 1.15 --radius 55 \
    --scene interior --window 0 $RB > EVAL_SCALE_R5_115_LOOP_warmup.log 2>&1
timeout 2700 python tools/eval_scale.py --frames $F --laps 1.15 --radius 55 \
    --scene interior --window 0 --no-loop $RB > EVAL_SCALE_R5_115_NOLOOP.log 2>&1
timeout 2700 python tools/eval_scale.py --frames $F --laps 1.15 --radius 55 \
    --scene interior --window 0 $RB > EVAL_SCALE_R5_115_LOOP.log 2>&1
timeout 2700 python tools/eval_scale.py --frames $F --laps 2.3 --radius 55 \
    --scene interior --window 0 $RB > EVAL_SCALE_R5_23_LOOP.log 2>&1
timeout 2700 python tools/eval_scale.py --frames $F --laps 2.3 --radius 55 \
    --scene interior --window 0 --no-loop $RB > EVAL_SCALE_R5_23_NOLOOP.log 2>&1
echo DONE
