#!/usr/bin/env bash
# Watcher: wait for the round-3 training chain to finish, then train the
# TartanVO-family nets on the TPU (chip otherwise idles between sessions).
# Safe to re-run: skips nets whose checkpoints already exist.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

CHAIN_LOG=results/train_chain_r3.log
for _ in $(seq 1 720); do          # up to 12 h
    grep -q "chain done" "$CHAIN_LOG" 2>/dev/null && break
    pgrep -f "train_chain_r3.sh" > /dev/null 2>&1 || break   # chain died
    sleep 60
done

echo "=== $(date -u +%FT%TZ) tartanvo trainers starting"
if [ ! -f model/TartanVO_flow.npz ]; then
    timeout 7200 python scripts/train_tartanvo.py --mode flow --steps 3000 \
        2>&1 | tail -20
fi
if [ ! -f model/TartanVO_stereo.npz ]; then
    timeout 7200 python scripts/train_tartanvo.py --mode stereo --steps 3000 \
        2>&1 | tail -20
fi
if [ ! -f model/TartanVO_flowcov.npz ] && [ -f model/TartanVO_flow.npz ]; then
    timeout 5400 python scripts/train_tartanvo.py --mode flowcov --steps 1500 \
        --restore model/TartanVO_flow.npz 2>&1 | tail -20
fi
echo "=== $(date -u +%FT%TZ) tartanvo trainers done"
