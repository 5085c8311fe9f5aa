"""CLI job-entrypoint smoke: each command runs standalone in a fresh
process (the ray-job-submit execution shape) and resumes idempotently."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _run(args: list[str], timeout=240) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["RAY_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [sys.executable, "-m", "modlyn_ray.cli", *args],
        capture_output=True,
        text=True,
        check=True,
        env=env,
        cwd="/tmp",
        timeout=timeout,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_cli_pipelines(tmp_path):
    r = _run(["synth", "--profile", "tiny"])
    data = r["dir"]

    r = _run(["pit", "--input", f"{data}/sequences", "--attrs", f"{data}/doc_attrs.parquet",
              "--out", str(tmp_path / "pit"), "--buckets", "4"])
    assert r["rows"] == 64 and r["wall_sec"] > 0

    r2 = _run(["pit", "--input", f"{data}/sequences", "--attrs", f"{data}/doc_attrs.parquet",
               "--out", str(tmp_path / "pit"), "--buckets", "4"])
    assert r2["rows"] == 64  # resumed from manifest (fast path)

    r = _run(["stats", "--input", f"{data}/sequences", "--out", str(tmp_path / "stats")])
    assert r["rows"] > 0

    r = _run(["logreg", "--input", f"{data}/sequences", "--out", str(tmp_path / "lr"),
              "--vocab", "8", "--steps", "10", "--batch", "16", "--plots"])
    assert r["rows"] == 3 * 8  # classes x vocab tall weights
    from modlyn_ray.stages.codecs import decode_png

    art = tmp_path / "lr" / "artifacts"
    for png in ("losses.png", "classification_report.png"):
        img = decode_png((art / png).read_bytes())
        assert img.ndim == 3 and img.shape[2] == 3
