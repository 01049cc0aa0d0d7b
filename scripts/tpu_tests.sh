#!/bin/bash
# On-chip kernel regression suite (tests_tpu/) — run with the real TPU
# backend. Keep TPU jobs sequential: don't run while a training job is live.
cd "$(dirname "$0")/.." || exit 1
exec timeout "${1:-1200}" python -m pytest tests_tpu -q --no-header
