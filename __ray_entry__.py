"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship point-in-time pipeline on sf0.001 documents
(tokenized into the engine's sequences contract). ``queries()`` exposes one
callable per implemented operator family from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (non-expressible ones — iterative SGD, crc32 token
ids, PIT flagship — are rows-only by design and covered by golden tests
in tests/).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> tokenize
    (sequences contract) -> windowed point-in-time features per source
    timeline."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from modlyn_ray.pipelines.flagship import pit_features
    from modlyn_ray.stages.text import tokenize

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    seqs = tokenize(docs, vocab=1024)

    def to_contract(b: pa.Table) -> pa.Table:
        # entity = source stream; event time derived deterministically from
        # doc_id so windows are meaningful at smoke scale
        n = len(b)
        ts = pc.add(
            pa.scalar(1_700_000_000_000_000),
            pc.multiply(b["doc_id"].cast(pa.int64()), pa.scalar(60_000_000)),
        ).cast(pa.timestamp("us"))
        return pa.table(
            {
                "doc_id": b["source"],
                "tokens": b["tokens"],
                "n_tok": b["n_tok"],
                "source": b["source"],
                "ingest_ts": ts,
                "seq_no": b["doc_id"].cast(pa.int64()),
            }
        )

    contract = seqs.map_batches(to_contract, batch_format="pyarrow", zero_copy_batch=True)
    return pit_features(contract, doc_attrs=None, n_buckets=8, detect_skew=False)


def queries() -> dict[str, Callable[[str], Any]]:
    from modlyn_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from modlyn_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
