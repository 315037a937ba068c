#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== bisect_pallas take2 $(date) ==="
timeout 2400 python tools/bisect_pallas.py 2>&1 | grep -v "^  \|^    " | tail -40
echo "=== mesh_onchip take2 (cached programs) $(date) ==="
timeout 2400 python tools/mesh_onchip.py 2>&1 | tail -10
echo "=== single_group_production take2 (no 24MB constant) $(date) ==="
timeout 3000 python tools/single_group_production.py 2>&1 | tail -10
echo "=== done $(date) ==="
