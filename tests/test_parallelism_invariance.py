"""Results must be identical across Ray parallelism levels (FIXTURES §4.4):
run the flagship + statistics pipelines in FRESH processes at 1 and 8 CPUs
and compare value checksums."""

from __future__ import annotations

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, sys, hashlib
import numpy as np
import ray, ray.data as rd
ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False
from modlyn_ray import synth
from modlyn_ray.pipelines.flagship import pit_features
from modlyn_ray.stages.count_stats import count_stats
from modlyn_ray.schema import tokens_checksum
import pyarrow as pa

d = synth.ensure_profile(synth.TINY)
out = pit_features(rd.read_parquet(f"{d}/sequences"), rd.read_parquet(f"{d}/doc_attrs.parquet"),
                   n_buckets=4, detect_skew=(ncpu > 1))
cat = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
pdf = cat.drop_columns(["tokens"]).to_pandas().sort_values("seq_no").reset_index(drop=True)
pit_sig = hashlib.sha1(pdf.round(9).to_csv(index=False).encode()).hexdigest()

cs = count_stats(rd.read_parquet(f"{d}/sequences")).to_pandas()
cs = cs.sort_values(["source", "token_id"]).reset_index(drop=True)
cs_sig = hashlib.sha1(cs.round(9).to_csv(index=False).encode()).hexdigest()

print(json.dumps({"pit": pit_sig, "cs": cs_sig, "tok": tokens_checksum(cat), "rows": len(pdf)}))
ray.shutdown()
"""


def _run(ncpu: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(ncpu)],
        capture_output=True,
        text=True,
        check=True,
        env=env,
        cwd="/tmp",
        timeout=300,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_identical_across_parallelism():
    r1 = _run(1)
    r8 = _run(8)
    assert r1 == r8, (r1, r8)
    assert r1["rows"] == 64
