#!/bin/bash
# Round-5 single-chip training sweep (VERDICT r4 items 2 + 7):
#   (a) fused lean-optimizer update (Pallas; UA2_LEAN_FUSED auto->on) at 8L
#   (b) selective remat: checkpoint K of 8 backbone layers within 15.75 GiB
# One run at a time; each prints its JSON line to the log. OOMs are clean
# AOT errors (per-allocation dumps in the .err files).
set -u
cd /root/repo
LOG=/tmp/train_sweep_r5
mkdir -p $LOG
COMMON="--backbone-layers 8 --batch 8 --seq 512 --audio-capacity 256 --optimizer adamw_lean"

run() {
  name=$1; shift
  echo "=== $name: $*" >> $LOG/sweep.log
  timeout 2400 python scripts/bench_train.py $COMMON "$@" \
      > $LOG/$name.json 2> $LOG/$name.err
  echo "exit=$? $(cat $LOG/$name.json 2>/dev/null | tail -1)" >> $LOG/sweep.log
}

# (a) fused-vs-xla lean update at real depth, full remat
run 8L_fused_full
echo "=== 8L_xla_full (UA2_LEAN_FUSED=0)" >> $LOG/sweep.log
UA2_LEAN_FUSED=0 timeout 2400 python scripts/bench_train.py $COMMON \
    > $LOG/8L_xla_full.json 2> $LOG/8L_xla_full.err
echo "exit=$? $(tail -1 $LOG/8L_xla_full.json 2>/dev/null)" >> $LOG/sweep.log

# (b) selective remat: store activations in 8-K layers; try the small
# stacks unrematted too (their activations are comparatively tiny)
run 8L_fused_remat6 --remat-backbone 6
run 8L_fused_remat7 --remat-backbone 7
run 8L_fused_remat6_nosmall --remat-backbone 6 --no-remat-small
run 8L_fused_nosmall --no-remat-small
echo DONE >> $LOG/sweep.log
