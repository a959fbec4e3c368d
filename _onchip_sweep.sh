#!/bin/bash
# On-chip measurement sweep after the round-3 continuation optimizations.
# Serialized (single-core host): one heavy job at a time.
set -x
cd /root/repo
LOG=/tmp/sweep.log
: > $LOG

# 1. headline bench (fused sseg + patch loop + DCN weight fuse)
timeout 2400 python bench.py >> $LOG 2>&1

# 2. postproc fused: quarter-fcn vs full-fcn delta
timeout 1800 python _prof.py fused >> $LOG 2>&1

# 3. DCN sweeps: default vs rowfuse, sub 16, rblk 8
timeout 1200 python _prof.py dcn >> $LOG 2>&1
DCN_ROWFUSE=1 timeout 1200 python _prof.py dcn >> $LOG 2>&1
DCN_SUB=16 timeout 1200 python _prof.py dcn >> $LOG 2>&1
DCN_RBLK=8 timeout 1200 python _prof.py dcn >> $LOG 2>&1
DCN_HALO=2 timeout 1200 python _prof.py dcn >> $LOG 2>&1

# 4. retriever ablation (decoder slot-attention kernel vs XLA einsum)
BENCH_RETRIEVER=pallas timeout 2400 python bench.py >> $LOG 2>&1

# 5. Swin-L headline (shares postproc/DCN/sseg gains; round-2 was 5.4)
timeout 2400 python bench.py swinl_fpn_slotvps >> $LOG 2>&1

# 6. DCN backward: pallas custom-vjp vs XLA autodiff at training shapes
timeout 1800 python _prof.py dcnbwd >> $LOG 2>&1

# 7. full train step at the 800x1600 crop, per dcn impl
TRAIN_DCN=jax timeout 2400 python _prof.py train >> $LOG 2>&1
TRAIN_DCN=pallas timeout 2400 python _prof.py train >> $LOG 2>&1

# 8. op-level XLA profiler trace of 2 steady-state steps (for the DCN
# MXU-utilization and decoder breakdown questions — round-4 leads)
rm -rf /tmp/bench_trace
BENCH_TRACE=/tmp/bench_trace timeout 2400 python bench.py >> $LOG 2>&1

echo SWEEP_DONE >> $LOG
