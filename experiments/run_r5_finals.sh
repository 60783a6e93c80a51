#!/bin/bash
# Round-5 final measurement pipeline (run on an attached TPU).
# Each stage appends to /tmp/r5_finals.log; stages are independent so a
# pool outage mid-run loses only the current stage.
set -x
cd /root/repo
LOG=/tmp/r5_finals.log
echo "=== r5 finals $(date) ===" >> $LOG

# 1. headline bench (default config)
timeout 2400 python bench.py >> $LOG 2>&1

# 2. per-stage profile -> PROFILE.md
timeout 2400 python experiments/profile_stages.py >> $LOG 2>&1

# 3. on-TPU test tier
timeout 3600 python -m pytest tests_tpu/ -q >> $LOG 2>&1

# 4. corpus parity -> PARITY_CORPUS.md
timeout 7200 python bench_corpus.py --engines native,tpu >> $LOG 2>&1

# 5. PNG parity -> PARITY_PNG.md
timeout 7200 python bench_png.py >> $LOG 2>&1

# 6. scale run -> SCALE.md (reference yardstick included)
timeout 10800 python bench_scale.py --mb 100 --ref >> $LOG 2>&1

echo "=== r5 finals done $(date) ===" >> $LOG
