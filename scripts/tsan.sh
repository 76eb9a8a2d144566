#!/usr/bin/env bash
# Race-detection stage (SURVEY.md section 5): build the native packet queue
# under ThreadSanitizer and hammer it with concurrent producers/consumers
# and overflow churn.  Exits nonzero on any reported race.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O1 -std=c++17 -fPIC -fsanitize=thread -g -shared -pthread \
    -o native/libpskq_tsan.so native/pskq.cpp
g++ -O1 -std=c++17 -fPIC -fsanitize=thread -g -shared -pthread \
    -o native/libpskbank_tsan.so native/pskbank.cpp
TSAN_LIB=""
for so in libtsan.so.2 libtsan.so.1 libtsan.so.0 libtsan.so; do
  p="$(g++ -print-file-name="$so")"
  if [ "$p" != "$so" ] && [ -e "$p" ]; then TSAN_LIB="$p"; break; fi
done
[ -n "$TSAN_LIB" ] || { echo "no libtsan runtime found" >&2; exit 1; }
LD_PRELOAD="$TSAN_LIB" TSAN_OPTIONS="exitcode=66" \
    python scripts/tsan_hammer.py
echo "TSAN OK"
