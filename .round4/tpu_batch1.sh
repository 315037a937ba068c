#!/bin/bash
# Round-4 TPU measurement batch 1: marginal A/B + streamed production.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== bisect_marginal (structured vs generic) $(date) ==="
HYGEIA_ABLATIONS=full,generic,window8,window16,window32 python tools/bisect_marginal.py 2>&1
echo "=== stream_bench $(date) ==="
HYGEIA_STREAM_CONFIGS=8x16384 python tools/stream_bench.py 2>&1
echo "=== done $(date) ==="
