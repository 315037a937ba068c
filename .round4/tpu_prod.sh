#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== pallas smoke $(date) ==="
timeout 600 python /root/repo/.round4/pallas_smoke.py 2>&1
echo "=== production_pipeline T=400k, 2 seeds $(date) ==="
HYGEIA_PROD_DIR=/tmp/hygeia_prod_r4 python tools/production_pipeline.py 2>&1
echo "=== single_group_production T=1e6 $(date) ==="
python tools/single_group_production.py 2>&1
echo "=== mesh_onchip $(date) ==="
python tools/mesh_onchip.py 2>&1
echo "=== done $(date) ==="
