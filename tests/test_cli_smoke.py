"""Smoke tests for the CLIs not covered elsewhere (rs_tracker, rs_benchmark)
and for utils/debug helpers.

The reference has no tests at all (SURVEY.md §4); these assert the installed
command surface stays runnable end to end at tiny shapes.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest


class TestTrackerCli:
    def test_projective_demo_runs(self, capsys):
        from realsensetracker_tpu.cli import rs_tracker

        rc = rs_tracker.main(["--frames", "3", "--method", "projective",
                              "--width", "80", "--height", "60"])
        assert rc == 0
        out = capsys.readouterr().out
        # Reference pose print format (rs_tracker.cpp:28-31): q | t.
        assert out.count("q=(") == 3 and "| t=(" in out
        assert "[ok]" in out

    def test_gicp_demo_runs(self, capsys):
        from realsensetracker_tpu.cli import rs_tracker

        rc = rs_tracker.main(["--frames", "2", "--method", "gicp",
                              "--width", "64", "--height", "48",
                              "--voxel-size", "0.2"])
        assert rc == 0
        assert capsys.readouterr().out.count("frame") == 2


class TestBenchmarkCli:
    def _run(self, capsys, argv):
        from realsensetracker_tpu.cli import rs_benchmark

        rc = rs_benchmark.main(argv)
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out)

    def test_projective_pipeline(self, capsys):
        rec = self._run(capsys, [
            "--batch", "2", "--iters", "2", "--width", "80", "--height", "60",
            "--samples", "256", "--level-iters", "2,2",
        ])
        assert rec["pipeline"] == "projective-icp"
        assert rec["pairs_per_sec_per_chip"] > 0

    def test_projective_chunked(self, capsys):
        rec = self._run(capsys, [
            "--batch", "4", "--iters", "1", "--width", "80", "--height", "60",
            "--samples", "256", "--level-iters", "2,2", "--chunk", "2",
        ])
        assert rec["pairs_per_sec_per_chip"] > 0

    def test_slam_window_pipeline(self, capsys):
        rec = self._run(capsys, [
            "--pipeline", "slam-window", "--batch", "8", "--window", "2",
            "--width", "80", "--height", "60",
        ])
        assert rec["pipeline"] == "slam-window" and rec["window"] == 2
        assert rec["frames_per_sec_per_chip"] > 0
        assert rec["keyframes"] >= 1

    def test_tsdf_window_pipeline(self, capsys):
        rec = self._run(capsys, [
            "--pipeline", "tsdf-window", "--batch", "6", "--window", "2",
            "--width", "80", "--height", "60",
        ])
        assert rec["pipeline"] == "tsdf-window" and rec["window"] == 2
        assert rec["frames_per_sec_per_chip"] > 0
        assert rec["volume"] == "128^3"

    def test_profile_writes_trace(self, capsys, tmp_path):
        trace_dir = str(tmp_path / "trace")
        rec = self._run(capsys, [
            "--batch", "2", "--iters", "1", "--width", "80", "--height", "60",
            "--samples", "256", "--level-iters", "2", "--profile", trace_dir,
        ])
        assert rec["pairs_per_sec_per_chip"] > 0
        assert (tmp_path / "trace" / "plugins" / "profile").is_dir()

    def test_unknown_pipeline_rejected(self, capsys):
        from realsensetracker_tpu.cli import rs_benchmark

        with pytest.raises(SystemExit):
            rs_benchmark.main(["--pipeline", "nope"])


class TestDebugUtils:
    def test_debug_nans_scope_restores(self):
        import jax

        from realsensetracker_tpu.utils import debug

        prev = jax.config.jax_debug_nans
        with debug.debug_nans(True):
            assert jax.config.jax_debug_nans is True
            with pytest.raises(FloatingPointError):
                jnp.log(jnp.float32(-1.0)).block_until_ready()
        assert jax.config.jax_debug_nans == prev

    def test_check_finite_passthrough(self):
        from realsensetracker_tpu.utils import debug

        x = jnp.arange(4.0)
        y = debug.check_finite(x, "x")
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_count_nonfinite(self):
        from realsensetracker_tpu.utils import debug

        tree = {"a": jnp.array([1.0, jnp.nan, jnp.inf]),
                "b": jnp.arange(3),  # int leaf: skipped
                "c": (jnp.zeros(2),)}
        counts = debug.count_nonfinite(tree)
        assert sum(v for k, v in counts.items() if "a" in k) == 2
        assert all(v == 0 for k, v in counts.items() if "c" in k)
