"""Kill-mid-run resume (SURVEY §7.2.8): a stage that dies partway leaves NO
valid checkpoint; rerunning completes cleanly and atomically."""

from __future__ import annotations

import os

import pytest
import ray.data as rd

from modlyn_ray import synth
from modlyn_ray.state import checkpoint as ckpt


def test_mid_run_crash_then_resume(tmp_path):
    d = synth.ensure_profile(synth.TINY)
    out_dir = str(tmp_path / "stage_crash")
    calls = []

    class Boom(RuntimeError):
        pass

    def build_crashing():
        calls.append("crash")
        ds = rd.read_parquet(f"{d}/sequences")

        def die(batch):
            raise Boom("simulated mid-run failure")

        return ds.map_batches(die, batch_format="pyarrow")

    with pytest.raises(Exception):
        ckpt.run_stage(out_dir, "crashy", build_crashing)
    # no completed checkpoint may exist; only the tmp dir may remain
    assert not ckpt.is_complete(out_dir)
    assert not os.path.exists(os.path.join(out_dir, "data"))

    def build_ok():
        calls.append("ok")
        return rd.read_parquet(f"{d}/sequences")

    ds = ckpt.run_stage(out_dir, "crashy", build_ok)
    assert ds.count() == 64
    assert ckpt.is_complete(out_dir)
    assert calls == ["crash", "ok"]

    # a third run resumes without rebuilding
    ckpt.run_stage(out_dir, "crashy", build_ok)
    assert calls == ["crash", "ok"]
