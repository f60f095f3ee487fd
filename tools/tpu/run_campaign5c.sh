#!/bin/bash
# Round-5 campaign, wave 3: isolate the integrate_slab lever.
#  - near-field slab A/B (the regime where the frustum AABB fits S^3;
#    on synth640 the 4.0 m scene fills the volume and the slab is an
#    honest no-op -- measured wave 2)
#  - submap corridor with track_scale=2 ONLY (isolates slab96's share
#    of the 255 -> 90.2 ms/frame corridor win)
# Run AFTER run_campaign5b.sh completes. From /root/repo:
#   nohup bash tools/tpu/run_campaign5c.sh > .data/tpu_logs5/campaign5c.log 2>&1 &
cd /root/repo || exit 1
mkdir -p .data/tpu_logs5

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T)"
  timeout 3600 "$@" > ".data/tpu_logs5/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T)"
}

RST_INTEGRATE_SLAB=0 RST_TRACK_SCALE=1 \
  run slab_ab_s1_off python - < tools/tpu/tsdf_slab_ab.py
RST_INTEGRATE_SLAB=96 RST_TRACK_SCALE=1 \
  run slab_ab_s1_on python - < tools/tpu/tsdf_slab_ab.py
RST_INTEGRATE_SLAB=0 RST_TRACK_SCALE=4 \
  run slab_ab_s4_off python - < tools/tpu/tsdf_slab_ab.py
RST_INTEGRATE_SLAB=96 RST_TRACK_SCALE=4 \
  run slab_ab_s4_on python - < tools/tpu/tsdf_slab_ab.py

RST_TRACK_SCALE=2 run submap_s2_only python - < tools/tpu/submap_tpu.py

# The 30 FPS push with the production u16 ingestion (half the upload
# bytes of the f32 wave-2 runs) + deeper integrate decimation.
RST_U16=1 RST_TRACK_SCALE=4 RST_INTEGRATE_EVERY=2 \
  run ts_u16_s4_e2 python - < tools/tpu/tsdf_track_scale.py
RST_U16=1 RST_TRACK_SCALE=4 RST_INTEGRATE_EVERY=4 \
  run ts_u16_s4_e4 python - < tools/tpu/tsdf_track_scale.py

# Per-frame SLAM again with the spike profile printed (which frames
# carry the 135 ms p90 tail).
run slam_pf2 python - pf < tools/tpu/slam_defer_tpu.py

echo "=== campaign5c complete $(date +%T)"
