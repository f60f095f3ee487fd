#!/bin/bash
# Serialized on-TPU measurement campaign: the axon tunnel admits ONE
# process at a time (CLAUDE.md gotcha 3), so every stage runs to
# completion before the next starts. Logs under .data/tpu_logs/.
#
#   bash tools/tpu/run_campaign.sh wave1   # registration/serving paths
#   bash tools/tpu/run_campaign.sh wave2   # dense (TSDF) paths
cd /root/repo || exit 1
mkdir -p .data/tpu_logs

run() {
  local name=$1; shift
  echo "=== $name start $(date -u +%F' '%T)" >> .data/tpu_logs/campaign.log
  "$@" > ".data/tpu_logs/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%F' '%T)" >> .data/tpu_logs/campaign.log
}

case "${1:-wave1}" in
  wave1)
    run bench        python bench.py
    run slam_window  python - < tools/tpu/slam_tpu_window.py
    run streams_win  python - < tools/tpu/streams_tpu_window.py
    run serve_batch  python - < tools/tpu/serve_tpu_batched.py
    run serve_window python - < tools/tpu/serve_tpu_window.py
    run tpu_gated    env RST_TPU_TESTS=1 python -m pytest tests/test_tpu_gated.py -q --no-header
    ;;
  wave2)
    run tsdf_timing  python - < tools/tpu/tsdf_tpu_timing.py
    run serve_tsdf   python - < tools/tpu/serve_tpu_tsdf_batched.py
    run submap500    python - < tools/tpu/submap_tpu.py
    ;;
  *)
    echo "unknown wave: $1" >&2; exit 2 ;;
esac
echo "=== campaign ${1:-wave1} done $(date -u +%F' '%T)" >> .data/tpu_logs/campaign.log
