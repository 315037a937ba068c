#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== bisect_marginal post-barrier $(date) ==="
HYGEIA_ABLATIONS=full,window8,window16,window32 python tools/bisect_marginal.py 2>&1
echo "=== done $(date) ==="
