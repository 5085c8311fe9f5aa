"""Bucket-granular resume: only missing partitions are recomputed."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from modlyn_ray import synth
from modlyn_ray.state.checkpoint import completed_partitions, run_stage_partitioned
from modlyn_ray.stages.temporal import add_bucket_column

N_BUCKETS = 4


def _build(d):
    def build_for(missing: list):
        ds = add_bucket_column(rd.read_parquet(f"{d}/sequences"), n_buckets=N_BUCKETS)
        mset = pa.array(sorted(missing))
        return ds.map_batches(
            lambda b: b.filter(pc.is_in(b["bucket"], value_set=mset)),
            batch_format="pyarrow",
        )

    return build_for


def test_partitioned_resume(tmp_path):
    d = synth.ensure_profile(synth.TINY)
    out = str(tmp_path / "stage")
    calls: list[list] = []

    def build(missing):
        calls.append(sorted(missing))
        return _build(d)(missing)

    all_parts = list(range(N_BUCKETS))
    ds = run_stage_partitioned(out, "bucketed", build, all_parts, token_checksum=True)
    assert ds.count() == 64
    assert calls == [all_parts]
    assert completed_partitions(out, "bucket") == set(all_parts)

    # simulate losing two partitions mid-run
    shutil.rmtree(f"{out}/bucket=1")
    shutil.rmtree(f"{out}/bucket=3")
    ds2 = run_stage_partitioned(out, "bucketed", build, all_parts, token_checksum=True)
    assert ds2.count() == 64
    assert calls[-1] == [1, 3]  # ONLY the missing buckets were rebuilt

    # fully complete -> no rebuild at all
    ds3 = run_stage_partitioned(out, "bucketed", build, all_parts)
    assert ds3.count() == 64
    assert len(calls) == 2

    # token byte-identity across the partitioned layout
    from modlyn_ray.schema import tokens_checksum

    cat = pa.concat_tables(
        list(ds3.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    ).drop_columns(["bucket"])
    assert tokens_checksum(cat) == tokens_checksum(synth.make_sequences(synth.TINY))
