"""Per-stage checkpointing with lineage manifests (north-rule resumability).

The reference has no checkpoint/resume (SURVEY.md §4); the engine adds it at
stage granularity with per-partition lineage:

- every stage output is a directory of Parquet part files written ATOMICALLY
  (write to ``<dir>.tmp`` then rename) plus a ``_manifest.json`` recording:
  stage name, row count, wall time, input fragment description, per-file row
  counts, optional token checksum, and the config that produced it
- ``run_stage`` skips recompute when a valid manifest exists (resume =
  validate manifest, ``read_parquet`` the finished output)
- the token checksum gives end-to-end byte-identity lineage across stages
  without re-reading both sides (schema.tokens_checksum is order-insensitive)

At 100 TB scale the same layout shards by bucket/key-range (one directory
per partition written by its own task); stage-granular atomic rename is the
single-node expression of that contract.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import pyarrow.parquet as pq

from ray.data import Dataset

MANIFEST = "_manifest.json"


def _collect_file_stats(data_dir: str) -> list[dict]:
    out = []
    for root, _dirs, files in os.walk(data_dir):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                md = pq.read_metadata(p)
                out.append(
                    {
                        "path": os.path.relpath(p, data_dir),
                        "rows": md.num_rows,
                        "bytes": os.path.getsize(p),
                    }
                )
    return out


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def is_complete(out_dir: str) -> bool:
    """A stage is complete iff its manifest exists and every file it lists is
    present with the recorded size (cheap validation, no data re-read)."""
    mp = manifest_path(out_dir)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
        for fs in m["files"]:
            p = os.path.join(out_dir, "data", fs["path"])
            if not os.path.exists(p) or os.path.getsize(p) != fs["bytes"]:
                return False
        return True
    except (json.JSONDecodeError, KeyError, OSError):
        return False


def run_stage(
    out_dir: str,
    stage_name: str,
    build: Callable[[], Dataset],
    config: dict | None = None,
    inputs: list[str] | None = None,
    token_checksum: bool = False,
    partition_cols: list[str] | None = None,
) -> Dataset:
    """Execute (or resume) one checkpointed stage.

    If ``out_dir`` holds a valid manifest the build fn is NOT called and the
    finished Parquet is read back (idempotent resume). Otherwise the stage
    runs, writes to a temp dir, atomically renames, and records lineage.
    """
    import ray.data as rd

    from modlyn_ray.schema import tokens_checksum

    data_dir = os.path.join(out_dir, "data")
    if is_complete(out_dir):
        return rd.read_parquet(data_dir)

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)

    t0 = time.perf_counter()
    ds = build()
    if partition_cols:
        # hive-partitioned layout: one directory per key value — the unit of
        # per-partition lineage/resume at cluster scale
        ds.write_parquet(os.path.join(tmp, "data"), partition_cols=partition_cols)
    else:
        ds.write_parquet(os.path.join(tmp, "data"))
    wall = time.perf_counter() - t0

    files = _collect_file_stats(os.path.join(tmp, "data"))
    rows = sum(f["rows"] for f in files)
    checksum = None
    if token_checksum:
        checksum = 0
        for frag in files:
            t = pq.read_table(os.path.join(tmp, "data", frag["path"]), columns=["tokens"])
            checksum = (checksum + tokens_checksum(t)) % (1 << 61)
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(
            {
                "stage": stage_name,
                "rows": rows,
                "wall_sec": round(wall, 4),
                "files": files,
                "inputs": inputs or [],
                "config": config or {},
                "tokens_checksum": checksum,
                "created_unix": time.time(),
            },
            f,
            indent=2,
        )
    os.rename(tmp, out_dir)
    return rd.read_parquet(data_dir)


def read_manifest(out_dir: str) -> dict:
    with open(manifest_path(out_dir)) as f:
        return json.load(f)
