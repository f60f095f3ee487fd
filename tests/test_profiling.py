"""Tests for utils/profiling.py (UTimer / StageTimes / device_trace).

The reference's timing is cho::util::UTimer stopwatches (align_icp.cpp:81-93);
this covers the analog plus the stage aggregator's materialization fence.
"""

import time

import jax.numpy as jnp

from realsensetracker_tpu.utils.profiling import StageTimes, UTimer


class TestUTimer:
    def test_elapsed_microseconds(self):
        t = UTimer()
        time.sleep(0.01)
        us = t.stop_and_get_elapsed_time()
        assert us >= 9_000  # at least ~9 ms in microseconds

    def test_restart(self):
        t = UTimer(start=False)
        t.start()
        assert t.stop_and_get_elapsed_time() < 1e6


class TestStageTimes:
    def test_aggregates_counts_and_means(self):
        st = StageTimes()
        for _ in range(3):
            with st.stage("a"):
                time.sleep(0.002)
        st.add("b", 0.5)
        rep = st.report()
        assert rep["a"]["count"] == 3
        assert rep["a"]["mean_ms"] >= 1.5
        assert rep["b"]["total_ms"] == 500.0

    def test_stage_materializes_device_outputs(self):
        st = StageTimes()
        with st.stage("matmul") as out:
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            out.append(x)
        # A pytree (tuple/dict) holder entry also materializes.
        with st.stage("tree") as out:
            out.append({"y": jnp.arange(8), "z": (jnp.zeros(3),)})
        rep = st.report()
        assert rep["matmul"]["count"] == 1 and rep["tree"]["count"] == 1
