#!/bin/bash
# r9 four-SF self-correctness sweeps at HEAD (run in tmux; ~2-3h total).
# Populates .oracle_cache on the way, so r10+ sweeps go nearly oracle-free.
set -x
cd /root/repo
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python scripts/self_correctness.py CORRECTNESS_SELF_r09.json \
  > sweep_r09_sf001.log 2>&1
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 python scripts/self_correctness.py CORRECTNESS_SELF_SF01_r09.json \
  > sweep_r09_sf01.log 2>&1
SPARK_GRAFT_TEST_SF_DIR=/root/repo/.localdata/sf1 python scripts/self_correctness.py CORRECTNESS_SELF_SF1_r09.json \
  > sweep_r09_sf1.log 2>&1
SPARK_GRAFT_TEST_SF_DIR=/root/repo/.localdata/sf10 python scripts/self_correctness.py CORRECTNESS_SELF_SF10_r09.json \
  > sweep_r09_sf10.log 2>&1
echo "ALL SWEEPS DONE" > sweep_r09_done.marker
tail -2 sweep_r09_sf001.log sweep_r09_sf01.log sweep_r09_sf1.log sweep_r09_sf10.log
