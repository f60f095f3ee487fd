#!/bin/bash
# Round-5 on-TPU measurement campaign (VERDICT r4 items 1-4 + the new
# integrate_slab lever). Serialized: ONE TPU process at a time (gotcha 3),
# one FRESH process per variant (gotcha 12). Run from /root/repo:
#   nohup bash tools/tpu/run_campaign5.sh > .data/tpu_logs5/campaign.log 2>&1 &
cd /root/repo || exit 1
mkdir -p .data/tpu_logs5

run() { # run NAME CMD... (stdin script fed separately via $SCRIPT)
  local name=$1; shift
  echo "=== $name start $(date +%T)"
  timeout 3600 "$@" > ".data/tpu_logs5/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T)"
}

# 1. Headline bench + the new fresh-input companion figure.
run bench python bench.py

# 2. Dense tracked-step A/B: the 30 FPS push (VERDICT item 2).
#    Baseline scale-1 slab, then the track_scale x slab x every grid.
RST_TRACK_SCALE=1 RST_INTEGRATE_SLAB=96 \
  run ts_s1_slab96 python - < tools/tpu/tsdf_track_scale.py
RST_TRACK_SCALE=2 RST_INTEGRATE_SLAB=96 \
  run ts_s2_slab96 python - < tools/tpu/tsdf_track_scale.py
RST_TRACK_SCALE=4 RST_INTEGRATE_SLAB=96 \
  run ts_s4_slab96 python - < tools/tpu/tsdf_track_scale.py
RST_TRACK_SCALE=2 RST_INTEGRATE_EVERY=2 \
  run ts_s2_e2 python - < tools/tpu/tsdf_track_scale.py
RST_TRACK_SCALE=4 RST_INTEGRATE_SLAB=96 RST_INTEGRATE_EVERY=2 \
  run ts_s4_slab96_e2 python - < tools/tpu/tsdf_track_scale.py

# 3. Per-frame SLAM p90 with pipelined keyframe booking (VERDICT item 3).
run slam_pf python - pf < tools/tpu/slam_defer_tpu.py

# 4. 500-frame submap corridor at HEAD's stack (VERDICT item 1).
run submap_head python - < tools/tpu/submap_tpu.py
RST_TRACK_SCALE=2 RST_INTEGRATE_SLAB=96 \
  run submap_s2_slab96 python - < tools/tpu/submap_tpu.py

# 5. 20-submap atlas optimization with the occupancy mid-gate (item 4).
run atlas20 python - < tools/tpu/atlas20_tpu.py

# 6. Dense serving re-measure (VERDICT item 1b).
run serve_tsdf_batched python - < tools/tpu/serve_tpu_tsdf_batched.py

echo "=== campaign complete $(date +%T)"
