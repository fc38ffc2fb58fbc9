#!/bin/bash
# Round-5 measurement queue (runs after the training sweeps release the
# TPU): post-fix serving-latency ladder A/B (VERDICT item 3) and the
# streaming-TTS TTFA measurement (item 4). Decision-free runs; docs are
# written from the JSON after review.
set -u
cd /root/repo
LOG=/tmp/measure_r5
mkdir -p $LOG

echo "=== serving_latency ladder=off $(date -u +%H:%M:%S)" >> $LOG/queue.log
timeout 3600 python scripts/bench_serving_latency.py --ladder off \
    > $LOG/lat_off.json 2> $LOG/lat_off.err
echo "exit=$? off" >> $LOG/queue.log

echo "=== serving_latency ladder=auto $(date -u +%H:%M:%S)" >> $LOG/queue.log
timeout 3600 python scripts/bench_serving_latency.py --ladder auto \
    > $LOG/lat_auto.json 2> $LOG/lat_auto.err
echo "exit=$? auto" >> $LOG/queue.log

echo "=== stream_tts ttfa $(date -u +%H:%M:%S)" >> $LOG/queue.log
timeout 2400 python scripts/bench_stream_tts.py \
    > $LOG/stream_tts.json 2> $LOG/stream_tts.err
echo "exit=$? stream_tts" >> $LOG/queue.log
echo DONE_MEASURE >> $LOG/queue.log
