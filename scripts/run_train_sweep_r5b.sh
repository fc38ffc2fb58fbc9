#!/bin/bash
# Round-5 sweep follow-up: the two matched-pair configs the first sweep
# lacks — (a) fused at FULL remat (first attempt hit a 2400 s timeout,
# almost certainly a transient tunnel wedge from the first-ever Mosaic
# compile batch of the restructured kernel: the identical kernel compiled
# and ran fine in the remat6/7 runs minutes later), and (b) the XLA lean
# path at remat6 so the fused-vs-xla delta is isolated at the best remat
# point too.
set -u
cd /root/repo
LOG=/tmp/train_sweep_r5
mkdir -p $LOG
COMMON="--backbone-layers 8 --batch 8 --seq 512 --audio-capacity 256 --optimizer adamw_lean"

echo "=== 8L_fused_full_retry" >> $LOG/sweep.log
timeout 3000 python scripts/bench_train.py $COMMON \
    > $LOG/8L_fused_full_retry.json 2> $LOG/8L_fused_full_retry.err
echo "exit=$? $(tail -1 $LOG/8L_fused_full_retry.json 2>/dev/null)" >> $LOG/sweep.log

echo "=== 8L_xla_remat6 (UA2_LEAN_FUSED=0)" >> $LOG/sweep.log
UA2_LEAN_FUSED=0 timeout 2400 python scripts/bench_train.py $COMMON --remat-backbone 6 \
    > $LOG/8L_xla_remat6.json 2> $LOG/8L_xla_remat6.err
echo "exit=$? $(tail -1 $LOG/8L_xla_remat6.json 2>/dev/null)" >> $LOG/sweep.log
echo DONE_B >> $LOG/sweep.log
