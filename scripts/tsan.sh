#!/usr/bin/env bash
# Race-detection stage (SURVEY.md section 5): build the native packet queue
# under ThreadSanitizer and hammer it with concurrent producers/consumers
# and overflow churn.  Exits nonzero on any reported race.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O1 -std=c++17 -fPIC -fsanitize=thread -g -shared -pthread \
    -o native/libpskq_tsan.so native/pskq.cpp
LD_PRELOAD="$(g++ -print-file-name=libtsan.so.2)" TSAN_OPTIONS="exitcode=66" \
    python scripts/tsan_hammer.py
echo "TSAN OK"
