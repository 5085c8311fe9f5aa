"""Reader registry with alias normalization (SURVEY §2.10 X1).

Mirrors the reference's pluggable ``dataset_type`` backend surface
(/root/reference/modlyn/models/_simple_logreg_model.py:116-120,141-150 and
the alias map tested at tests/test_dataset_type_alias.py:54,62-63): a string
key selects the reader, loose aliases normalize to canonical names, and
read kwargs pass through (X2).

Canonical readers:
- "parquet"  — files or shard directories (the zarr-shard-store analog,
  /root/reference/docs/quickstart.ipynb:97-108); supports ``columns``
  projection pushdown (M8) and pyarrow filter expressions.
- "memory"   — an in-memory pyarrow Table / pandas DataFrame (the
  ``artifact.load()`` in-memory path, quickstart:113-117).
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyarrow as pa

from ray.data import Dataset

# alias → canonical. Includes the reference's EXACT alias table
# (_simple_logreg_model.py:141-150, incl. the "arrayloaders-dasd" typo
# alias tested at tests/test_dataset_type_alias.py:54,62-63): its
# "dask-arrayloader" out-of-core backend maps to our sharded-parquet
# reader, its "in-memory" backend to the memory reader.
ALIASES = {
    "parquet": "parquet",
    "pq": "parquet",
    "dir": "parquet",
    "shards": "parquet",
    "lazy": "parquet",
    "dask": "parquet",
    "arrayloaders-dask": "parquet",
    "arrayloaders-dasd": "parquet",  # reference's common-typo alias
    "dask-arrayloader": "parquet",
    "dask_arrayloader": "parquet",
    "memory": "memory",
    "in-memory": "memory",
    "in_memory": "memory",
    "inmemory": "memory",
}


def normalize_reader(name: str) -> str:
    key = name.strip().lower()
    if key not in ALIASES:
        raise ValueError(
            f"unknown dataset type {name!r}; known: {sorted(set(ALIASES))}"
        )
    return ALIASES[key]


def _read_parquet(source, **kwargs) -> Dataset:
    import ray.data as rd

    return rd.read_parquet(source, **kwargs)


def _read_memory(source, columns=None, **kwargs) -> Dataset:
    import pandas as pd

    import ray.data as rd

    if kwargs:
        # the registry's X2 contract is uniform kwargs pass-through:
        # silently ignoring them here made behavior schema-dependent
        raise TypeError(
            f"memory reader supports only columns=; got {sorted(kwargs)}"
        )
    if isinstance(source, pa.Table):
        ds = rd.from_arrow(source)
    elif isinstance(source, pd.DataFrame):
        ds = rd.from_pandas(source)
    else:
        raise TypeError(
            f"memory reader expects a pyarrow Table or pandas DataFrame, got {type(source)}"
        )
    return ds.select_columns(list(columns)) if columns is not None else ds


READERS: dict[str, Callable[..., Dataset]] = {
    "parquet": _read_parquet,
    "memory": _read_memory,
}


def load(source, dataset_type: str = "parquet", **kwargs) -> Dataset:
    """Load a Dataset through the registry; kwargs pass through (X2)."""
    return READERS[normalize_reader(dataset_type)](source, **kwargs)


def sniff_layout(path: str) -> str:
    """Store-layout probe (S4 analog): 'sharded' for a directory of parquet
    files, 'single' for one file."""
    if os.path.isdir(path):
        return "sharded"
    return "single"
