#!/bin/bash
# Round-3 TPU measurement session — run when the axon relay recovers.
# Order matters: the driver-visible bench capture first (VERDICT r2
# item 1), then the new measurements.  Each step logs to /tmp.
set -x
cd /root/repo

# 1. the headline capture (structured failure output if still down)
timeout 3600 python -u bench.py > /tmp/bench_r3.log 2>&1
tail -2 /tmp/bench_r3.log

# 2. large-alphabet grouped engine vs measured C++ rows
timeout 7200 python -u tools/bench_grouped.py --write \
    > /tmp/bench_grouped.log 2>&1
tail -20 /tmp/bench_grouped.log

# 3. BlockCodec D=1 vs unblocked (VERDICT r2 item 3)
timeout 3600 python -u tools/bench_block_d1.py > /tmp/bench_d1.log 2>&1
tail -8 /tmp/bench_d1.log

# 4. rank-prefix row-pass matmul A/B (VERDICT r2 item 7), same-process
timeout 3600 python -u tools/ab_rowmm.py > /tmp/ab_rowmm.log 2>&1
tail -4 /tmp/ab_rowmm.log

# 5. full method grid refresh (only if time permits / relay stable)
timeout 7200 python -u tools/full_bench.py > /tmp/full_bench_r3.log 2>&1
tail -12 /tmp/full_bench_r3.log

# 6. S sweep probe: placement G now VMEM-caps, so S=8192 stages —
#    check whether the decode optimum moved past S=4096
timeout 3600 python -u tools/ab_rowmm.py --lanes 8192 > /tmp/ab_s8192.log 2>&1
tail -4 /tmp/ab_s8192.log

# 7. vbyte terminator-prefix row pass A/B (ANS_TPU_VB_ROWMM) + the
#    cursor-total reduce (always on); flip the default if >1.02x
timeout 3600 python -u tools/ab_vb_rowmm.py > /tmp/ab_vb_rowmm.log 2>&1
tail -4 /tmp/ab_vb_rowmm.log
