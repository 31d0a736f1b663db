#!/bin/bash
# Round-12 close sequence: run SEQUENTIALLY on an otherwise-idle machine.
# Each step appends to /tmp/close12.log; stops on first failure.
set -e
cd /root/repo
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a /tmp/close12.log; }

log "1/8 full-registry oracle drive at sf0.01"
OUT=/root/repo/CORRECTNESS_local_full.json timeout 5400 python scripts/drive_contract.py >> /tmp/close12.log 2>&1

log "2/8 full-registry oracle drive at sf0.1"
SF=0.1 OUT=/root/repo/CORRECTNESS_local_sf01.json timeout 7200 python scripts/drive_contract.py >> /tmp/close12.log 2>&1

log "3/8 sf1 heavy-family drive"
HEAVY=$(python -c "
import sys, importlib.util
spec = importlib.util.spec_from_file_location('rcc', 'scripts/round_close_check.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
print(','.join(sorted(m.heavy_names())))")
SF=1 SF_DIR=/root/repo/scaledata/sf1 OUT=/root/repo/CORRECTNESS_local_sf1_heavy.json ONLY="$HEAVY" \
  timeout 14400 python scripts/drive_contract.py >> /tmp/close12.log 2>&1

log "4/8 rotation sample drive"
timeout 3600 python scripts/drive_rotation.py >> /tmp/close12.log 2>&1

log "5/8 rotation ledger update"
python scripts/update_rotation_ledger.py >> /tmp/close12.log 2>&1

log "6/8 headline bench (BENCH_local_r12.json)"
python bench.py --repeat 3 > /root/repo/BENCH_local_r12.json 2>>/tmp/close12.log

log "7/8 full suite run"
timeout 7200 python scripts/run_suite.py >> /tmp/close12.log 2>&1

log "8/8 round-close check"
python scripts/round_close_check.py | tee -a /tmp/close12.log

log "CLOSE SEQUENCE COMPLETE"
