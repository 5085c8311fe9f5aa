"""normalize_text: Arrow-kernel normalization vs a pure-Python reference."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from modlyn_ray.stages.normalize import normalize_text


def _ref(t: str) -> str:
    # ASCII \s to match RE2 (Arrow) and DuckDB regexp semantics — unicode
    # whitespace like NBSP is deliberately NOT collapsed by any of the three
    return re.sub(r"\s+", " ", t.lower(), flags=re.ASCII).strip(" ")


def test_normalize_matches_python_reference(ray_session):
    rng = np.random.default_rng(5)
    pieces = ["Hello", "WORLD", "MiXeD", "tab\there", "nl\nthere", "  pad  ", ""]
    texts = [
        "  ".join(pieces[i] for i in rng.integers(0, len(pieces), 5)) + "\t \n"
        for _ in range(500)
    ]
    texts += ["", "   ", "A B", "already clean"]  # NBSP is NOT \s in RE2 or SQL
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    out = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert list(out["text_norm"]) == [_ref(t) for t in texts]
    assert list(out["text"]) == texts  # original column untouched
