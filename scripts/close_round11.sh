#!/bin/bash
# Round-11 close sequence: run SEQUENTIALLY on an otherwise-idle machine.
# Each step appends to /tmp/close11.log; stops on first failure.
set -e
cd /root/repo
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a /tmp/close11.log; }

log "1/7 full-registry oracle drive at sf0.01"
OUT=/root/repo/CORRECTNESS_local_full.json timeout 5400 python scripts/drive_contract.py >> /tmp/close11.log 2>&1

log "2/7 full-registry oracle drive at sf0.1"
SF=0.1 OUT=/root/repo/CORRECTNESS_local_sf01.json timeout 7200 python scripts/drive_contract.py >> /tmp/close11.log 2>&1

log "3/7 rotation sample drive"
timeout 3600 python scripts/drive_rotation.py >> /tmp/close11.log 2>&1

log "4/7 rotation ledger update"
python scripts/update_rotation_ledger.py >> /tmp/close11.log 2>&1

log "5/7 headline bench (BENCH_local_r11.json)"
python bench.py --repeat 3 > /root/repo/BENCH_local_r11.json 2>>/tmp/close11.log

log "6/7 full suite run"
timeout 7200 python scripts/run_suite.py >> /tmp/close11.log 2>&1

log "7/7 round-close check"
python scripts/round_close_check.py | tee -a /tmp/close11.log

log "CLOSE SEQUENCE COMPLETE"
