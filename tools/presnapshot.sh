#!/bin/sh
# Pre-snapshot guard (VERDICT r03 'Next round' #7): the round-3 NTZ break
# shipped in an end-of-round snapshot commit that no full-suite run
# followed. Run this before ANY end-of-round (or sources/streaming/
# session-touching) commit and paste the summary line into the commit
# message, so every snapshot records the suite state it shipped with.
set -e
cd "$(dirname "$0")/.."
out=$(python -m pytest tests/ -q 2>&1 | tail -1)
echo "pytest: $out"
