#!/bin/bash
# Round-13 close sequence: run SEQUENTIALLY on an otherwise-idle machine.
# Each step appends to /tmp/close13.log; stops on first failure.
set -e
cd /root/repo
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a /tmp/close13.log; }

log "1/10 full-registry oracle drive at sf0.01"
OUT=/root/repo/CORRECTNESS_local_full.json timeout 5400 python scripts/drive_contract.py >> /tmp/close13.log 2>&1

log "2/10 full-registry oracle drive at sf0.1"
SF=0.1 OUT=/root/repo/CORRECTNESS_local_sf01.json timeout 7200 python scripts/drive_contract.py >> /tmp/close13.log 2>&1

log "3/10 sf1 heavy-family drive (regenerating scaledata/sf1 if absent)"
[ -d /root/repo/scaledata/sf1 ] || python scripts/gen_scale_data.py /root/repo/scaledata/sf1 10 >> /tmp/close13.log 2>&1
HEAVY=$(python -c "
import sys, importlib.util
spec = importlib.util.spec_from_file_location('rcc', 'scripts/round_close_check.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
print(','.join(sorted(m.heavy_names())))")
SF=1 SF_DIR=/root/repo/scaledata/sf1 OUT=/root/repo/CORRECTNESS_local_sf1_heavy.json ONLY="$HEAVY" \
  timeout 14400 python scripts/drive_contract.py >> /tmp/close13.log 2>&1

log "4/10 rotation sample drive"
timeout 3600 python scripts/drive_rotation.py >> /tmp/close13.log 2>&1

log "5/10 rotation ledger update"
python scripts/update_rotation_ledger.py >> /tmp/close13.log 2>&1

log "6/10 headline bench (BENCH_local_r13.json + sidecar)"
SPARK_GRAFT_BENCH_SIDECAR=/root/repo/BENCH_local_r13_sidecar.json \
  python bench.py --repeat 3 > /root/repo/BENCH_local_r13.json 2>>/tmp/close13.log

log "7/10 sf1 headline bench (VERDICT r12 item 10: the channel where the engine parallelises)"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf1 \
  SPARK_GRAFT_BENCH_SIDECAR=/root/repo/BENCH_local_r13_sf1_sidecar.json \
  python bench.py --repeat 2 > /root/repo/BENCH_local_r13_sf1.json 2>>/tmp/close13.log

log "8/10 8-core headline bench (the driver's scaling channel)"
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_SIDECAR=/root/repo/BENCH_local_r13_c8_sidecar.json \
  python bench.py --repeat 2 > /root/repo/BENCH_local_r13_c8.json 2>>/tmp/close13.log

log "9/10 full suite run"
timeout 7200 python scripts/run_suite.py >> /tmp/close13.log 2>&1

log "10/10 round-close check"
python scripts/round_close_check.py | tee -a /tmp/close13.log

log "CLOSE SEQUENCE COMPLETE"
