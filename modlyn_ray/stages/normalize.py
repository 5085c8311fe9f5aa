"""Text normalization — the canonical pre-dedup cleanup step of a
training-data pipeline (lowercase, collapse whitespace runs, trim).

Runs entirely on Arrow C kernels inside ``map_batches`` (``utf8_lower`` →
``replace_substring_regex`` → ``utf8_trim_whitespace``): zero-copy in, one
new column out, no Python per row. Matches ANSI SQL verbatim:

    trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))

so the q28 driver query carries a full value-level DuckDB oracle.

Reference analog: none (modlyn consumes pre-tokenized matrices); engine
extension for the 100 TB text suite, same family as stages/text.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def normalize_batch(batch: pa.Table, text_col: str = "text", out_col: str = "text_norm") -> pa.Table:
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # utf8_trim(characters=" ") mirrors SQL trim() exactly (ASCII space
    # only); utf8_trim_whitespace would also strip unicode whitespace like
    # NBSP, which RE2's ASCII \s+ collapse leaves alone — and so does SQL
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(col), pattern=r"\s+", replacement=" "),
        characters=" ",
    )
    return batch.append_column(out_col, norm).replace_schema_metadata(None)


def normalize_text(ds: Dataset, text_col: str = "text", out_col: str = "text_norm") -> Dataset:
    """Append ``out_col`` = lowercased, whitespace-collapsed, trimmed text."""
    return ds.map_batches(
        lambda b: normalize_batch(b, text_col, out_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
