"""modlyn_ray — a Ray-Data-native point-in-time feature-engineering engine.

A from-scratch re-expression of the capabilities of laminlabs/modlyn
(reference: /root/reference — the SimpleLogReg feature-selection loop,
count-matrix statistics, top-k Jaccard comparison) as an idiomatic Ray Data
pipeline over Parquet tables of pre-tokenized sequences, extended with the
temporal operators (as-of join, lag/lead, backfill, sessionization) and the
large-scale training-data ops (dedup, similarity search, text analysis) a
100 TB corpus pipeline needs.

Data contract (BASELINE.json input_hint):
    sequences(doc_id: string, tokens: list<int32>, n_tok: int32,
              source: string, ingest_ts: timestamp[us], seq_no: int64)

All hot paths are ``map_batches(batch_format="pyarrow", zero_copy_batch=True)``
with vectorized pyarrow.compute / numpy kernels; stateful stages are actor
pools; every shuffle has an explicit key (see SURVEY.md §7.3).
"""

__version__ = "0.1.0"

from modlyn_ray import schema  # noqa: F401
