"""TPU-gated tests (VERDICT r2 #9): run ONLY when explicitly enabled with
RST_TPU_TESTS=1 (the conftest forces this pytest session onto CPU, and the
axon TPU tunnel admits one process at a time -- CLAUDE.md gotchas 1/3), so
the on-device checks run in a SUBPROCESS with a clean environment.

Coverage: real-Mosaic parity of the Pallas level kernel against the XLA
composition (a lowering drift would otherwise only surface as a bench
accuracy regression, not a CI failure).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RST_TPU_TESTS", "") != "1",
    reason="TPU-gated; set RST_TPU_TESTS=1 (needs exclusive tunnel access)",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_KERNEL_PARITY = r"""
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected accelerator, got {dev}"

from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.kernels import level_kernel
from realsensetracker_tpu.ops import pyramid

intr = camera.TUM_FR1
depth = synthetic.render_depth(
    intr, jnp.eye(4, dtype=jnp.float32), synthetic.default_scene(seed=3)
)
levels_xla, _ = pyramid.build_pyramid(depth, intr, 1, use_kernel=False)
ref = np.asarray(levels_xla[0].packed)
got = np.asarray(level_kernel.build_level_packed(depth, intr))
# Real-Mosaic lowering vs XLA composition: identical math, both f32.
np.testing.assert_allclose(got, ref, atol=2e-5)
# Validity pattern must agree EXACTLY (n=0 encodes invalid).
np.testing.assert_array_equal(
    (np.abs(got[:3]).sum(0) > 0), (np.abs(ref[:3]).sum(0) > 0)
)
print("TPU_KERNEL_PARITY_OK", dev.platform)
"""


def _run_on_tpu(code: str) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        # Strip the CPU-forcing the conftest applied to THIS process.
        # PYTHONPATH must be PRESERVED: the accelerator backend registers
        # via a sitecustomize module that PYTHONPATH points at (overwriting
        # it, e.g. with /root/repo, is what breaks registration -- gotcha 9;
        # the repo itself is put on sys.path by cwd instead).
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    # The conftest OVERWROTE the container's JAX_PLATFORMS, so stripping it
    # is not enough -- request the accelerator platform explicitly
    # (overridable for other deployments).
    env["JAX_PLATFORMS"] = os.environ.get("RST_TPU_PLATFORM", "axon")
    # stdin-script so cwd (/root/repo) lands on sys.path (gotcha 9).
    return subprocess.run(
        [sys.executable, "-"],
        input=code,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )


class TestOnDeviceKernelParity:
    def test_level_kernel_matches_xla_on_device(self):
        proc = _run_on_tpu(_KERNEL_PARITY)
        if proc.returncode != 0 and "Backend" in proc.stderr:
            pytest.skip(f"TPU backend unavailable: {proc.stderr[-300:]}")
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
        assert "TPU_KERNEL_PARITY_OK" in proc.stdout


_SLAM_SMOKE = r"""
import json
import numpy as np
import jax

dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected accelerator, got {dev}"

from realsensetracker_tpu.data import tum
import io, contextlib
root = tum.synthesize_tum_sequence("/tmp/tum_tpu_smoke", num_frames=12,
                                   width=160, height=120, seed=3)
from realsensetracker_tpu.cli import rs_replay
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    rc = rs_replay.main(["--tum", root, "--method", "slam", "--json", "--ate"])
assert rc == 0
out = buf.getvalue()
recs = [json.loads(l) for l in out.splitlines() if l.startswith("{") and "frame" in l]
assert len(recs) == 12, len(recs)
assert all(r["success"] for r in recs), out
ate_line = [l for l in out.splitlines() if l.startswith("ATE:")]
assert ate_line, out
ate = json.loads(ate_line[0][4:])
assert np.isfinite(ate["rmse"]) and ate["rmse"] < 0.05, ate
print("TPU_SLAM_SMOKE_OK", ate["rmse"])
"""


class TestOnDeviceSlamSmoke:
    def test_slam_pipeline_runs_on_device(self):
        """VERDICT r2 #1: the full SLAM pipeline (VO + loop closure +
        pose graph) must run on the live accelerator, not just the CPU
        mesh. Small resolution to bound relay compile time."""
        proc = _run_on_tpu(_SLAM_SMOKE)
        if proc.returncode != 0 and "Backend" in proc.stderr:
            pytest.skip(f"TPU backend unavailable: {proc.stderr[-300:]}")
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
        assert "TPU_SLAM_SMOKE_OK" in proc.stdout
