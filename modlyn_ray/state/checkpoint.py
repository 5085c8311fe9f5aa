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


def _json_norm(x) -> str:
    """Canonical JSON encoding for config/inputs equality (tuples->lists,
    key order pinned) — what the manifest stores and what we compare."""
    return json.dumps(x, sort_keys=True, default=str)


def is_complete(
    out_dir: str, config: dict | None = None, inputs: list[str] | None = None
) -> bool:
    """A stage is complete iff its manifest exists, every file it lists is
    present with the recorded size (cheap validation, no data re-read),
    AND — when the caller passes ``config``/``inputs`` — the recorded
    values match. A re-run with different parameters (e.g. different
    bucket count or train steps) therefore invalidates the checkpoint
    instead of silently returning stale output (ADVICE r1)."""
    mp = manifest_path(out_dir)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
        if config is not None and _json_norm(m.get("config", {})) != _json_norm(config):
            return False
        if inputs is not None and _json_norm(m.get("inputs", [])) != _json_norm(inputs):
            return False
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
    # config/inputs omitted (None) => resume without parameter validation;
    # passing them compares against the manifest and invalidates on change
    if is_complete(out_dir, config=config, inputs=inputs):
        return rd.read_parquet(data_dir)

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
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
    # the previous checkpoint survives until the replacement is fully
    # built: a build/write failure above leaves the old output intact
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return rd.read_parquet(data_dir)


def read_manifest(out_dir: str) -> dict:
    with open(manifest_path(out_dir)) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# per-partition (bucket-granular) resume
# ---------------------------------------------------------------------------
def _part_dir(out_dir: str, partition_col: str, value) -> str:
    return os.path.join(out_dir, f"{partition_col}={value}")


def completed_partitions(out_dir: str, partition_col: str, config: dict | None = None) -> set:
    """Partition values whose directory holds a valid manifest (matching
    ``config`` when given — a config change invalidates every partition)."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    prefix = f"{partition_col}="
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and is_complete(os.path.join(out_dir, name), config=config):
            try:
                done.add(int(name[len(prefix):]))
            except ValueError:
                done.add(name[len(prefix):])
    return done


def run_stage_partitioned(
    out_dir: str,
    stage_name: str,
    build_for_partitions,
    all_partitions: list,
    partition_col: str = "bucket",
    config: dict | None = None,
    token_checksum: bool = False,
):
    """Bucket-granular checkpointed stage: recompute ONLY missing partitions.

    ``build_for_partitions(missing: list) -> Dataset`` must return a
    Dataset containing ``partition_col`` restricted to those partitions
    (typically: bucketize the input and filter to the missing bucket set —
    upstream reads prune before the shuffle). Each partition is written to
    its own atomically-renamed directory with its own lineage manifest, so
    a mid-run kill loses at most the in-flight partitions. Returns a
    Dataset over the complete output.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    import ray.data as rd

    from modlyn_ray.schema import tokens_checksum as _tok_ck

    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir, partition_col, config=config)
    # compare by string rendering: hive dir names are strings, so an
    # int-coerced ``done`` would never match string-typed partition values
    done_s = {str(d) for d in done}
    missing = [p for p in all_partitions if str(p) not in done_s]
    if missing:
        ds = build_for_partitions(missing)
        t0 = time.perf_counter()
        tmp = os.path.join(out_dir, "_inflight.tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp, partition_cols=[partition_col])
        wall = time.perf_counter() - t0
        prefix = f"{partition_col}="
        for name in sorted(os.listdir(tmp)):
            if not name.startswith(prefix):
                continue
            src = os.path.join(tmp, name)
            files = _collect_file_stats(src)
            checksum = None
            if token_checksum:
                checksum = 0
                for fr in files:
                    t = _pq.read_table(os.path.join(src, fr["path"]), columns=["tokens"])
                    checksum = (checksum + _tok_ck(t)) % (1 << 61)
            # per-partition manifest uses the same layout as run_stage but
            # with data files directly under the partition dir
            os.makedirs(os.path.join(src, "data"), exist_ok=True)
            for fr in files:
                os.rename(
                    os.path.join(src, fr["path"]),
                    os.path.join(src, "data", fr["path"].replace(os.sep, "_")),
                )
            files = _collect_file_stats(os.path.join(src, "data"))
            with open(os.path.join(src, MANIFEST), "w") as f:
                json.dump(
                    {
                        "stage": stage_name,
                        "partition": name,
                        "rows": sum(fr["rows"] for fr in files),
                        # wall time of the whole missing-partition batch —
                        # partitions are built in ONE Ray job; divide by
                        # batch_partitions for a per-partition estimate
                        "wall_sec": round(wall, 4),
                        "batch_partitions": len(missing),
                        "files": files,
                        "config": config or {},
                        "tokens_checksum": checksum,
                        "created_unix": time.time(),
                    },
                    f,
                )
            dst = os.path.join(out_dir, name)
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        # partitions that produced ZERO rows leave no hive directory —
        # record them as complete (empty data dir + manifest) or they stay
        # "missing" forever and every later call re-runs the whole build
        still_missing = completed_partitions(out_dir, partition_col, config=config)
        still_missing = {str(d) for d in still_missing}
        for p in missing:
            if str(p) in still_missing:
                continue
            pdir = os.path.join(out_dir, f"{partition_col}={p}")
            os.makedirs(os.path.join(pdir, "data"), exist_ok=True)
            with open(os.path.join(pdir, MANIFEST), "w") as f:
                json.dump(
                    {
                        "stage": stage_name,
                        "partition": f"{partition_col}={p}",
                        "rows": 0,
                        "wall_sec": round(wall, 4),
                        "batch_partitions": len(missing),
                        "files": [],
                        "config": config or {},
                        "tokens_checksum": 0 if token_checksum else None,
                        "created_unix": time.time(),
                    },
                    f,
                )
    data_files = []
    for n in sorted(os.listdir(out_dir)):
        if n.startswith(f"{partition_col}="):
            dd = os.path.join(out_dir, n, "data")
            data_files.extend(
                os.path.join(dd, f) for f in sorted(os.listdir(dd)) if f.endswith(".parquet")
            )
    return rd.read_parquet(data_files)
