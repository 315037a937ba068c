#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== bisect_pallas $(date) ==="
timeout 2400 python tools/bisect_pallas.py 2>&1
echo "=== production_pipeline warm (reuses sim fixture) $(date) ==="
HYGEIA_PROD_DIR=/tmp/hygeia_prod_r4 python tools/production_pipeline.py 2>&1
echo "=== done $(date) ==="
