"""Text analysis over document tables: tokenize, token stats, quality,
language-ID, fingerprints.

Large-scale training-data ops beyond the reference's operator set (the
reference consumes pre-tokenized matrices; these stages produce them from
raw text). All hot paths are vectorized: pyarrow.compute string kernels for
split/length, numpy for the ratio math; the LangId stage is an actor-pool
class (stopword tables built once per actor — SURVEY guide pattern).

Determinism contract: tokenization is a single-space split (mirrors the
DuckDB oracle ``string_split(text, ' ')`` exactly, including empty tokens
from repeated spaces); token ids for the sequences contract are
crc32(word) % vocab (process-stable), or — with ``id_scheme="md5"`` —
``md5_number_lower(word) % vocab``, bit-identical to DuckDB's
``md5_number_lower`` (= little-endian int of md5-digest bytes [8:16]), so
token ids are fully reproducible inside an ANSI-SQL oracle.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

# a tiny multilingual stopword table for the n-gram/stopword language
# heuristic; deliberately small and fixed so the SQL oracle can mirror it
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "les", "et", "de"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
}
LANG_ORDER = ("de", "en", "es", "fr")  # tie-break: lexicographic


def split_words(batch: pa.Table, text_col: str = "text") -> pa.ListArray:
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.split_pattern(col, " ")


def _word_id(word: str, vocab: int, scheme: str) -> int:
    if scheme == "md5":
        # == DuckDB md5_number_lower(word) % vocab (bytes [8:16], little-endian)
        return int.from_bytes(hashlib.md5(word.encode()).digest()[8:16], "little") % vocab
    return zlib.crc32(word.encode()) % vocab


def tokenize(
    ds: Dataset,
    text_col: str = "text",
    vocab: int | None = None,
    id_scheme: str = "crc32",
) -> Dataset:
    """Add ``words`` (list<string>) + ``n_words``; with ``vocab`` also add
    ``tokens`` (list<int32>) + ``n_tok`` — producing the engine's sequences
    contract from raw text. ``id_scheme``: "crc32" (default) or "md5"
    (SQL-oracle-reproducible, see module docstring). The id map is built per
    batch over UNIQUE words only (dictionary-encode first), so the Python
    hash calls are O(distinct words), never O(tokens)."""

    def fn(batch: pa.Table) -> pa.Table:
        words = split_words(batch, text_col)
        out = batch.append_column("words", words)
        out = out.append_column("n_words", pc.list_value_length(words).cast(pa.int32()))
        if vocab is not None:
            flat = words.flatten()
            # dictionary_encode already yields exactly the distinct words:
            # map the dictionary directly (no separate pc.unique pass + lut)
            dic = flat.dictionary_encode()
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            mapped = np.array(
                [_word_id(u, vocab, id_scheme) for u in dic.dictionary.to_pylist()],
                dtype=np.int32,
            )
            offsets = words.offsets
            toks = pa.ListArray.from_arrays(offsets, pa.array(mapped[codes]))
            out = out.append_column("tokens", toks)
            out = out.append_column("n_tok", pc.list_value_length(toks).cast(pa.int32()))
        # drop inherited pandas schema metadata: it makes pa.Schema
        # unhashable inside Ray's block-schema dedup ("Failed to hash the
        # schemas" warning on every task)
        return out.replace_schema_metadata(None)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def word_stats(
    ds: Dataset, group_col: str = "source", text_col: str = "text", min_count: int = 1
) -> Dataset:
    """Per-(group, word) occurrence count + document frequency — the string
    analog of count_stats partials: per-batch pre-aggregation, ONE groupby
    over (group, word) partials."""

    def partial(batch: pa.Table) -> pa.Table:
        words = split_words(batch, text_col)
        n = len(batch)
        flat = words.flatten()
        offs = words.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        lens = np.diff(offs)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        gdic = gcol.dictionary_encode()
        # null group values: fill indices with a sentinel slot appended to
        # the dictionary (a NaN-cast index would wrap to garbage and index
        # gnames out of bounds); rendered 'None' like _as_string_array
        g_idx = gdic.indices.fill_null(len(gdic.dictionary)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        wdic = flat.dictionary_encode()
        wcodes = wdic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nw = len(wdic.dictionary)
        # (row, word) counts -> (group, word) occ + df
        key_rw = row_idx * nw + wcodes
        uniq_rw, c_rw = np.unique(key_rw, return_counts=True)
        row_of = uniq_rw // nw
        word_of = uniq_rw % nw
        grp_of = g_idx[row_of]
        key_gw = grp_of * nw + word_of
        uniq_gw, inv = np.unique(key_gw, return_inverse=True)
        occ = np.bincount(inv, weights=c_rw.astype(np.float64))
        df = np.bincount(inv)
        gnames = np.asarray(
            [str(x) for x in gdic.dictionary.to_pylist()] + ["None"], dtype=object
        )
        wnames = np.asarray([str(x) for x in wdic.dictionary.to_pylist()], dtype=object)
        return pa.table(
            {
                group_col: pa.array(gnames[(uniq_gw // nw)].tolist(), type=pa.string()),
                "word": pa.array(wnames[(uniq_gw % nw)].tolist(), type=pa.string()),
                "occ": pa.array(occ),
                "df": pa.array(df.astype(np.float64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "word"])
        .aggregate(Sum("occ", alias_name="occ_f"), Sum("df", alias_name="df_f"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                group_col: batch[group_col],
                "word": batch["word"],
                "occ": batch["occ_f"].cast(pa.int64()),
                "df": batch["df_f"].cast(pa.int64()),
            }
        )
        if min_count > 1:
            t = t.filter(pc.greater_equal(t["occ"], min_count))
        return t

    return agg.map_batches(finish, batch_format="pyarrow")


def tfidf_terms(ds: Dataset, text_col: str = "text", n_docs: int | None = None) -> Dataset:
    """Corpus-level TF-IDF per word: occ (total term frequency), df
    (document frequency), ``tfidf = occ * ln(n_docs / df)``.

    Built on the ``word_stats`` partial-aggregation path (one shuffle over
    per-batch (word, occ, df) partials); ``n_docs`` is a cheap count if not
    supplied. Callers rank by (tfidf desc, word asc) for deterministic
    top-k — see q26 in pipelines/queries.py for the SQL-oracled query.
    """
    if n_docs is None:
        n_docs = ds.count()
    stats = word_stats(
        ds.map_batches(
            lambda b: b.append_column(
                "__g", pa.array(np.zeros(len(b), dtype=np.int8))
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        ),
        group_col="__g",
        text_col=text_col,
    )

    def score(b: pa.Table) -> pa.Table:
        occ = b["occ"].to_numpy()
        df = b["df"].to_numpy()
        tfidf = occ * np.log(float(n_docs) / df)
        return pa.table(
            {"word": b["word"], "occ": b["occ"], "df": b["df"], "tfidf": pa.array(tfidf)}
        )

    return stats.map_batches(score, batch_format="pyarrow")


# BPE-ish pre-tokenizer split: letter runs | digit runs | punctuation runs
# (the GPT-2 pre-tokenizer family's shape without its lookbehind, which RE2
# does not support — RE2 is what BOTH Arrow's count_substring_regex and
# DuckDB's regexp_extract_all compile, so engine and oracle agree exactly).
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_counts(
    ds: Dataset, text_col: str = "text", pattern: str = BPE_SPLIT_PATTERN
) -> Dataset:
    """Per-doc token counting under a BPE-ish pre-tokenizer regex:
    ``n_tokens`` (non-overlapping matches of ``pattern``) and
    ``chars_per_token`` — a cheap proxy for BPE fertility used to rank
    corpora before running a real tokenizer. One vectorized RE2 kernel
    (``pc.count_substring_regex``) per batch; no per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # fill_null(0): a null count would NaN-cast to INT64_MIN and
        # corrupt every downstream sum — null text counts as 0 tokens
        n_tok = (
            pc.fill_null(pc.count_substring_regex(text, pattern), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_chars = pc.fill_null(pc.utf8_length(text), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        cpt = np.divide(n_chars, n_tok, out=np.zeros(len(batch)), where=n_tok > 0)
        return (
            batch.append_column("n_tokens", pa.array(n_tok))
            .append_column("chars_per_token", pa.array(cpt))
            .replace_schema_metadata(None)
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(ds: Dataset, text_col: str = "text") -> Dataset:
    """Per-doc quality signals: n_words, n_chars, avg word length, stopword
    ratio, distinct-word ratio — all vectorized arrow/numpy."""
    stop = set(LANG_MARKERS["en"])

    def fn(batch: pa.Table) -> pa.Table:
        words = split_words(batch, text_col)
        n = len(batch)
        flat = words.flatten()
        offs = words.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        lens = np.diff(offs)
        n_words = lens.astype(np.int64)
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = pc.fill_null(pc.utf8_length(text), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
        pad = np.zeros(len(wlen) + 1)
        np.cumsum(wlen, out=pad[1:])
        sum_wlen = pad[offs[1:]] - pad[offs[:-1]]
        avg_word_len = np.divide(
            sum_wlen, n_words, out=np.zeros(n), where=n_words > 0
        )
        is_stop = pc.is_in(flat, value_set=pa.array(sorted(stop))).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        pad2 = np.zeros(len(is_stop) + 1)
        np.cumsum(is_stop, out=pad2[1:])
        stop_cnt = pad2[offs[1:]] - pad2[offs[:-1]]
        stop_ratio = np.divide(stop_cnt, n_words, out=np.zeros(n), where=n_words > 0)
        # distinct-word ratio per row
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        nw = max(len(dic.dictionary), 1)
        distinct = np.zeros(n, dtype=np.int64)
        ukeys = np.unique(row_idx * nw + codes)
        np.add.at(distinct, ukeys // nw, 1)
        distinct_ratio = np.divide(
            distinct.astype(np.float64), n_words, out=np.zeros(n), where=n_words > 0
        )
        return (
            batch.append_column("n_words", pa.array(n_words))
            .append_column("avg_word_len", pa.array(avg_word_len))
            .append_column("stop_ratio", pa.array(stop_ratio))
            .append_column("distinct_ratio", pa.array(distinct_ratio))
            .replace_schema_metadata(None)
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class LangId:
    """Actor-pool language-ID: stopword marker tables compiled once per
    actor (__init__), scored per batch (__call__) — SURVEY §2.3 pattern."""

    def __init__(self):
        self.markers = {
            lang: pa.array(sorted(ws)) for lang, ws in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = split_words(batch)
        n = len(batch)
        flat = words.flatten()
        offs = words.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        scores = np.zeros((n, len(LANG_ORDER)), dtype=np.int64)
        for j, lang in enumerate(LANG_ORDER):
            hit = pc.is_in(flat, value_set=self.markers[lang]).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            pad = np.zeros(len(hit) + 1, dtype=np.int64)
            np.cumsum(hit, out=pad[1:])
            scores[:, j] = pad[offs[1:]] - pad[offs[:-1]]
        best = scores.argmax(axis=1)  # ties -> first in LANG_ORDER (lexicographic)
        none = scores.max(axis=1) == 0
        langs = np.asarray(LANG_ORDER, dtype=object)[best]
        langs[none] = "und"
        return batch.append_column(
            "lang_pred", pa.array(langs.tolist(), type=pa.string())
        ).replace_schema_metadata(None)


def lang_id(ds: Dataset, concurrency: int = 2, batch_size: int = 4096) -> Dataset:
    from modlyn_ray.util import pool_bounds

    concurrency = pool_bounds(concurrency)
    return ds.map_batches(
        LangId,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


class Fingerprinter:
    """Actor-pool content fingerprinting — no per-row Python in the hot path.

    - ``md5``: hex digest of the text bytes, computed by DuckDB's vectorized
      C md5() kernel over the whole Arrow batch (connection opened once per
      actor in ``__init__``; output matches hashlib/DuckDB exactly).
    - ``rolling_hash``: 64-bit FNV-style polynomial fold over the word
      sequence, h = (h * P) ^ crc32(word). crc32 is evaluated once per
      DISTINCT word (dictionary-encode first), then the fold runs as numpy
      ops vectorized ACROSS ROWS with one iteration per word POSITION
      (loop length = max words in a doc, not number of rows)."""

    FNV_OFFSET = np.uint64(14695981039346656037)
    FNV_PRIME = np.uint64(1099511628211)

    def __init__(self, text_col: str = "text"):
        import duckdb

        self.text_col = text_col
        self.con = duckdb.connect()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        tbl = pa.table({"t": batch[self.text_col]})
        md5s = (
            self.con.execute("SELECT md5(t) AS h FROM tbl").arrow().column("h")
        )

        words = split_words(batch, self.text_col)
        flat = words.flatten()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        crc_of_unique = np.array(
            [zlib.crc32(w.encode()) for w in dic.dictionary.to_pylist()],
            dtype=np.uint64,
        )
        c = crc_of_unique[codes] if len(codes) else np.array([], dtype=np.uint64)

        h = np.full(n, self.FNV_OFFSET, dtype=np.uint64)
        idx0 = offs[:-1]
        max_len = int(lens.max()) if n else 0
        with np.errstate(over="ignore"):
            for k in range(max_len):
                active = lens > k
                h[active] = (h[active] * self.FNV_PRIME) ^ c[idx0[active] + k]
        return (
            batch.append_column("md5", md5s)
            .append_column("rolling_hash", pa.array(h.view(np.int64)))
            .replace_schema_metadata(None)
        )


def fingerprint(
    ds: Dataset, text_col: str = "text", concurrency: int = 2, batch_size: int = 4096
) -> Dataset:
    """Content fingerprint per doc: md5 hex (exactly DuckDB's md5()) + a
    64-bit rolling polynomial word hash for shingling-style dedup."""
    from modlyn_ray.util import pool_bounds

    return ds.map_batches(
        Fingerprinter,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_bounds(concurrency),
        zero_copy_batch=True,
    )


def regex_redact(
    ds,
    pattern: str,
    replacement: str = "<T>",
    text_col: str = "text",
    out_col: str = "redacted",
    count_col: str = "n_hits",
):
    """PII-scrub-shaped transform: RE2 regex redaction + per-doc hit count.

    Fully vectorized (``pc.replace_substring_regex`` /
    ``pc.count_substring_regex`` — Arrow's RE2 C++ kernels, the same
    dialect DuckDB's regexp_replace uses, so the q29 oracle matches
    byte-for-byte). Stateless map_batches stage: streams at any scale.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def redact(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        red = pc.replace_substring_regex(t, pattern=pattern, replacement=replacement)
        cnt = pc.cast(pc.count_substring_regex(t, pattern=pattern), pa.int64())
        return batch.append_column(out_col, red).append_column(count_col, cnt)

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)
