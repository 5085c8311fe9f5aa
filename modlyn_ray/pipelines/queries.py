"""Driver-facing query suite: one entry per implemented operator family
(SURVEY.md §2), each over the /root/testdata parquet tables, with a
matching ANSI-SQL oracle (DuckDB) where SQL can express the semantics.

Column names are identical between the Ray pipeline and the SQL oracle
(the driver hash-compares values after sorting columns by name). Float
aggregates are rounded identically on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from modlyn_ray.stages.temporal import asof_join, windowize

SESSION_GAP_30M_US = 30 * 60 * 1_000_000


def _round(arr: np.ndarray, nd: int) -> np.ndarray:
    return np.round(arr.astype(np.float64), nd)


# ===========================================================================
# relational core (SURVEY §2.5 aggregations, §2.2 filters, §2.4 joins)
# ===========================================================================
def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped grouped aggregate over lineitem (A2/A3/A6 analogs).
    Partial per-batch pre-aggregation -> tiny groupby, one shuffle."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        disc_price = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = b.append_column("disc_price", disc_price)
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    agg["avg_qty"] = _round(agg["sum_qty"] / agg["count_order"], 6)
    agg["avg_price"] = _round(agg["sum_base_price"] / agg["count_order"], 6)
    for c in ["sum_qty", "sum_base_price", "sum_disc_price"]:
        agg[c] = _round(agg[c], 2)
    agg["count_order"] = agg["count_order"].astype(np.int64)
    return agg


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*)::BIGINT AS count_order,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       round(sum(l_extendedprice) / count(*), 6) AS avg_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q02_top_parts_per_brand(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k (K1 analog): 3 priciest parts per brand,
    deterministic ties by p_partkey."""
    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_partkey", "p_retailprice"]
    )

    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_retailprice", "p_partkey"], ascending=[False, True]).head(3)
        g = g.reset_index(drop=True)
        g["rn"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby("p_brand").map_groups(top, batch_format="pandas").to_pandas()


Q02_SQL = """
SELECT p_brand, p_partkey, p_retailprice,
       row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)::BIGINT AS rn
FROM part QUALIFY rn <= 3
"""


def q03_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Broadcast dimension join (J2/J3 pattern): orders -> customer ->
    nation, dims shipped once via driver lookup dicts, fact table streams."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust_to_nation = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    nation_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def join_partial(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy()
        nk = np.array([cust_to_nation[c] for c in ck], dtype=np.int64)
        names = np.array([nation_name[k] for k in nk], dtype=object)
        df = pd.DataFrame({"n_name": names, "revenue": b["o_totalprice"].to_numpy()})
        return pa.Table.from_pandas(
            df.groupby("n_name", as_index=False)["revenue"].sum(), preserve_index=False
        )

    agg = (
        orders.map_batches(join_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    agg["revenue"] = _round(agg["revenue"], 2)
    return agg


Q03_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q04_rare_class_filter(sf_dir: str) -> pd.DataFrame:
    """Rare-class filter (M5, quickstart:142-144): keep sources with > 25
    docs via a broadcast semi-join, then count survivors per source."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    counts = ds.groupby("source").aggregate(Count(alias_name="n_docs")).to_pandas()
    keep = set(counts[counts["n_docs"] > 25]["source"])
    kept = counts[counts["source"].isin(keep)].copy()
    kept["n_docs"] = kept["n_docs"].astype(np.int64)
    return kept.reset_index(drop=True)


Q04_SQL = """
SELECT source, count(*)::BIGINT AS n_docs FROM documents
GROUP BY source HAVING count(*) > 25
"""


def q05_distinct_parts(sf_dir: str) -> pd.DataFrame:
    """Distinct-count per group (A1 analog) via per-batch dedup partials ->
    groupby over (flag, partkey) -> count."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_partkey"]
    )

    def dedup_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        ds.map_batches(dedup_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_partkey"])
        .aggregate(Count(alias_name="_n"))
    )
    out = pairs.groupby("l_returnflag").aggregate(Count(alias_name="n_parts")).to_pandas()
    out["n_parts"] = out["n_parts"].astype(np.int64)
    return out


Q05_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey)::BIGINT AS n_parts
FROM lineitem GROUP BY l_returnflag
"""


def q06_union(sf_dir: str) -> pd.DataFrame:
    """Dataset union (U-ops): customers + suppliers into one ledger,
    aggregated per kind."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_acctbal"]).map_batches(
        lambda b: pa.table(
            {"kind": pa.array(["customer"] * len(b)), "acctbal": b["c_acctbal"]}
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_acctbal"]).map_batches(
        lambda b: pa.table(
            {"kind": pa.array(["supplier"] * len(b)), "acctbal": b["s_acctbal"]}
        ),
        batch_format="pyarrow",
    )
    out = (
        cust.union(supp)
        .groupby("kind")
        .aggregate(Count(alias_name="n"), Sum("acctbal", alias_name="total_bal"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    out["total_bal"] = _round(out["total_bal"], 2)
    return out


Q06_SQL = """
WITH ledger AS (
  SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier)
SELECT kind, count(*)::BIGINT AS n, round(sum(acctbal), 2) AS total_bal
FROM ledger GROUP BY kind
"""


def q07_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global sort + limit (K2/K3): top 10 orders by totalprice,
    deterministic ties by o_orderkey."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    out = (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    return out


Q07_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ===========================================================================
# temporal (SURVEY §2.9 W1-W4 over the events stream)
# ===========================================================================
def _events(sf_dir: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def q10_lag_lead(sf_dir: str) -> pd.DataFrame:
    """W2: per-user lag/lead of value ordered by (ts, event_id)."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = windowize(
        ds,
        lag_cols=["value"],
        lead_cols=["value"],
        lag_steps=2,
        sessionize=False,
        by="user_id",
        ts_col="ts",
        tie_col="event_id",
        n_buckets=32,
    ).to_pandas()
    out = out[["event_id", "lag1_value", "lag2_value", "lead1_value"]].rename(
        columns={"lag1_value": "lag_value", "lag2_value": "lag2_value", "lead1_value": "lead_value"}
    )
    return out


Q10_SQL = """
SELECT event_id, lag(value) OVER w AS lag_value, lag(value, 2) OVER w AS lag2_value,
       lead(value) OVER w AS lead_value
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q11_sessionize(sf_dir: str) -> pd.DataFrame:
    """W4: 0-based session index per user, gap > 30 min splits."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    out = windowize(
        ds,
        sessionize=True,
        session_gap_us=SESSION_GAP_30M_US,
        session_on_source_change=False,
        by="user_id",
        ts_col="ts",
        tie_col="event_id",
        n_buckets=32,
    ).to_pandas()
    out["session_id"] = out["session_id"].astype(np.int64)
    return out[["event_id", "session_id"]]


Q11_SQL = """
SELECT event_id,
       (sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_id
FROM (SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
"""


def q12_backfill(sf_dir: str) -> pd.DataFrame:
    """W3: forward-fill the last purchase value per user timeline."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def sparse(b: pa.Table) -> pa.Table:
        mask = pc.equal(b["event_type"], "purchase")
        pv = pc.if_else(mask, b["value"], pa.scalar(None, pa.float64()))
        return b.append_column("purchase_value", pv)

    out = windowize(
        ds.map_batches(sparse, batch_format="pyarrow", zero_copy_batch=True),
        backfill_cols=["purchase_value"],
        sessionize=False,
        by="user_id",
        ts_col="ts",
        tie_col="event_id",
        n_buckets=32,
    ).to_pandas()
    return out[["event_id", "purchase_value_ffill"]]


Q12_SQL = """
SELECT event_id,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
           AS purchase_value_ffill
FROM events
"""


def q13_asof_join(sf_dir: str) -> pd.DataFrame:
    """W1/J4: for each click, the latest purchase value at or before it,
    per user. Right side deduped to max value per (user, ts) so ties are
    deterministic on both sides."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]
    )
    purch = ev.filter(expr="event_type == 'purchase'")

    def dedupe_right(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "ts"], as_index=False)["value"].max()

    purch_d = purch.groupby("user_id").map_groups(dedupe_right, batch_format="pandas")
    out = asof_join(
        clicks,
        purch_d,
        value_cols=["value"],
        by="user_id",
        ts_col="ts",
        suffix="_asof",
        n_buckets=32,
    ).to_pandas()
    out = out[["event_id", "value_asof", "matched_asof_ts"]].rename(
        columns={"value_asof": "purchase_value", "matched_asof_ts": "purchase_ts"}
    )
    return out


Q13_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
purch AS (
  SELECT user_id, ts, max(value) AS value FROM events
  WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT clicks.event_id, purch.value AS purchase_value, purch.ts AS purchase_ts
FROM clicks ASOF LEFT JOIN purch
  ON clicks.user_id = purch.user_id AND clicks.ts >= purch.ts
"""


def q14_hourly_agg(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate: count + sum(value) per (event_type, hour)."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def add_hour(b: pa.Table) -> pa.Table:
        return b.append_column("hour", pc.floor_temporal(b["ts"], unit="hour"))

    agg = (
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    agg["n_events"] = agg["n_events"].astype(np.int64)
    agg["sum_value"] = _round(agg["sum_value"], 4)
    return agg


Q14_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, hour
"""


def q15_rolling_window(sf_dir: str) -> pd.DataFrame:
    """Trailing 30-minute time-range aggregate per user (SQL RANGE
    PRECEDING semantics, equal-ts peers included)."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = windowize(
        ds,
        rolling_cols=["value"],
        rolling_window_us=SESSION_GAP_30M_US,
        sessionize=False,
        by="user_id",
        ts_col="ts",
        tie_col="event_id",
        n_buckets=32,
    ).to_pandas()
    out["roll_sum_value"] = _round(out["roll_sum_value"], 6)
    out["roll_cnt_value"] = out["roll_cnt_value"].astype(np.int64)
    return out[["event_id", "roll_sum_value", "roll_cnt_value"]]


Q15_SQL = """
SELECT event_id, round(sum(value) OVER w, 6) AS roll_sum_value,
       count(value) OVER w::BIGINT AS roll_cnt_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
"""


# ===========================================================================
# text / dedup (documents)
# ===========================================================================
def q20_word_stats(sf_dir: str) -> pd.DataFrame:
    from modlyn_ray.stages.text import word_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text", "doc_id"])
    return word_stats(ds, group_col="source").to_pandas()


Q20_SQL = """
WITH ex AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT source, word, count(*)::BIGINT AS occ, count(DISTINCT doc_id)::BIGINT AS df
FROM ex GROUP BY source, word
"""


def q21_quality(sf_dir: str) -> pd.DataFrame:
    from modlyn_ray.stages.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = quality_scores(ds).to_pandas()
    out["n_words"] = out["n_words"].astype(np.int64)
    for c in ["avg_word_len", "stop_ratio", "distinct_ratio"]:
        out[c] = _round(out[c], 6)
    return out[["doc_id", "n_words", "avg_word_len", "stop_ratio", "distinct_ratio"]]


Q21_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, len(ws)::BIGINT AS n_words,
  round(list_aggregate(list_transform(ws, x -> length(x)), 'sum')::DOUBLE / len(ws), 6) AS avg_word_len,
  round(len(list_filter(ws, x -> x IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE / len(ws), 6) AS stop_ratio,
  round(len(list_distinct(ws))::DOUBLE / len(ws), 6) AS distinct_ratio
FROM w
"""


def q22_exact_dedup(sf_dir: str) -> pd.DataFrame:
    from modlyn_ray.stages.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds, col="text", id_col="doc_id").to_pandas()
    out["dup_count"] = out["dup_count"].astype(np.int64)
    return out[["doc_id", "dup_count"]]


Q22_SQL = """
SELECT doc_id, count(*) OVER (PARTITION BY text)::BIGINT AS dup_count
FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


def q23_lang_id(sf_dir: str) -> pd.DataFrame:
    from modlyn_ray.stages.text import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id(ds).select_columns(["doc_id", "lang_pred"]).to_pandas()


Q23_SQL = """
WITH c AS (
  SELECT doc_id,
    len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS c_de,
    len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to'))) AS c_en,
    len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','es'))) AS c_es,
    len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','de'))) AS c_fr
  FROM documents)
SELECT doc_id,
  CASE WHEN c_de = 0 AND c_en = 0 AND c_es = 0 AND c_fr = 0 THEN 'und'
       WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
       WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
       WHEN c_es >= c_fr THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM c
"""


def q24_fingerprint(sf_dir: str) -> pd.DataFrame:
    from modlyn_ray.stages.text import fingerprint

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return fingerprint(ds).select_columns(["doc_id", "md5"]).to_pandas()


Q24_SQL = "SELECT doc_id, md5(text) AS md5 FROM documents"


# ===========================================================================
# embeddings: similarity search
# ===========================================================================
def q30_ann_topk(sf_dir: str) -> pd.DataFrame:
    from modlyn_ray.stages.ann import knn_brute, make_queries

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = make_queries(ds, 10)
    top = knn_brute(ds, q, k=5)
    top["cosine"] = _round(top["cosine"], 6)
    top["rank"] = top["rank"].astype(np.int64)
    top["query_id"] = top["query_id"].astype(np.int64)
    top["neighbor_id"] = top["neighbor_id"].astype(np.int64)
    return top[["query_id", "neighbor_id", "cosine", "rank"]]


Q30_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rank
FROM scored QUALIFY rank <= 5
"""


def q31_embedding_dedup(sf_dir: str) -> pd.DataFrame:
    """Cosine near-dup pairs among the first 500 vectors (exact mode so the
    SQL oracle is tractable)."""
    from modlyn_ray.stages.dedup import embedding_dedup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sub = ds.filter(expr="vec_id < 500")
    out = embedding_dedup(sub, threshold=0.5, exact=True).to_pandas()
    out["cosine"] = _round(out["cosine"], 6)
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    return out[["a", "b", "cosine"]]


Q31_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 500 AND b.vec_id < 500
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5
"""


# ===========================================================================
# sequences-core pipelines (synthetic input_hint table; non-SQL-expressible
# parts run as rows-only checks)
# ===========================================================================
def _synth_small():
    from modlyn_ray import synth

    d = synth.ensure_profile(synth.SMALL)
    return d


def q40_count_stats(sf_dir: str) -> pd.DataFrame:
    """Count-matrix statistics (A7) over documents-derived token sequences:
    per-(source, token_id) count/df with crc32 token ids (vocab 4096)."""
    from modlyn_ray.stages.text import tokenize
    from modlyn_ray.stages.count_stats import count_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    seqs = tokenize(docs, vocab=4096).select_columns(["tokens", "n_tok", "source"])
    out = count_stats(seqs).to_pandas()
    out = out[["source", "token_id", "count", "df"]].copy()
    out["token_id"] = out["token_id"].astype(np.int64)
    out["count"] = out["count"].astype(np.int64)
    out["df"] = out["df"].astype(np.int64)
    return out


# crc32 token ids are reproduced in SQL via a word->id lookup is not
# expressible portably; instead the oracle checks the aggregate on the WORD
# level and maps to ids via the same crc32 in a temp macro — DuckDB lacks
# crc32, so this query is checked on (source, word)-level counts projected
# through the engine's own id map. Rows-only fallback: see oracle_sql().


def q41_wilcoxon(sf_dir: str) -> pd.DataFrame:
    """Wilcoxon rank-sum z-scores per (class, token) over the synthetic
    sequences table — the scanpy rank_genes_groups(method='wilcoxon')
    analog (A8). Rank statistics over implicit count vectors are not
    ANSI-SQL-expressible at reasonable cost -> rows-only; numeric parity is
    enforced by tests/test_rank_stats.py against a dense rank oracle."""
    from modlyn_ray.stages.rank_stats import wilcoxon_scores

    d = _synth_small()
    return wilcoxon_scores(rd.read_parquet(f"{d}/sequences")).to_pandas()


def q50_logreg_weights(sf_dir: str) -> pd.DataFrame:
    """SimpleLogReg-equivalent tall weights over the deterministic synthetic
    sequences table (golden-path trainer). Non-SQL-expressible (iterative
    SGD) — rows-only driver check; numeric parity is covered by
    tests/test_logreg.py against the numpy oracle."""
    from modlyn_ray import synth
    from modlyn_ray.stages.logreg import LogRegConfig, fit_logreg

    d = _synth_small()
    ds = rd.read_parquet(f"{d}/sequences")
    model = fit_logreg(
        ds, LogRegConfig(vocab=synth.SMALL.vocab, batch_size=256, max_steps=50)
    )
    return model.weights_tall().to_pandas()


def q51_jaccard_eval(sf_dir: str) -> pd.DataFrame:
    """CompareScores tidy output across logreg and count-stat methods over
    the synthetic table (rows-only; semantics covered by tests/test_eval.py)."""
    from modlyn_ray import synth
    from modlyn_ray.eval.jaccard import compute_jaccard_comparison
    from modlyn_ray.stages.count_stats import count_stats
    from modlyn_ray.stages.logreg import LogRegConfig, fit_logreg

    d = _synth_small()
    ds = rd.read_parquet(f"{d}/sequences")
    model = fit_logreg(
        ds, LogRegConfig(vocab=synth.SMALL.vocab, batch_size=256, max_steps=50)
    )
    tall_lr = (
        model.weights_tall()
        .select(["class", "token_id", "weight", "method"])
        .rename_columns(["class", "token_id", "score", "method"])
    )
    cs = count_stats(ds)
    tall_cs = cs.map_batches(
        lambda b: pa.table(
            {
                "class": b["source"],
                "token_id": b["token_id"],
                "score": b["f_score"],
                "method": pa.array(["count_f"] * len(b)),
            }
        ),
        batch_format="pyarrow",
    )
    return compute_jaccard_comparison([tall_lr, tall_cs], n_top_values=[25, 50, 100, 200])


def q52_pit_features(sf_dir: str) -> pd.DataFrame:
    """Flagship point-in-time features over the synthetic sequences +
    doc_attrs (rows-only; parity covered by tests/test_pipeline.py)."""
    from modlyn_ray.pipelines.flagship import pit_features

    d = _synth_small()
    out = pit_features(
        rd.read_parquet(f"{d}/sequences"),
        rd.read_parquet(f"{d}/doc_attrs.parquet"),
        n_buckets=32,
    )
    return out.drop_columns(["tokens"]).to_pandas()


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_top_parts_per_brand": q02_top_parts_per_brand,
    "q03_revenue_by_nation": q03_revenue_by_nation,
    "q04_rare_class_filter": q04_rare_class_filter,
    "q05_distinct_parts": q05_distinct_parts,
    "q06_union": q06_union,
    "q07_top_orders": q07_top_orders,
    "q10_lag_lead": q10_lag_lead,
    "q11_sessionize": q11_sessionize,
    "q12_backfill": q12_backfill,
    "q13_asof_join": q13_asof_join,
    "q14_hourly_agg": q14_hourly_agg,
    "q15_rolling_window": q15_rolling_window,
    "q20_word_stats": q20_word_stats,
    "q21_quality": q21_quality,
    "q22_exact_dedup": q22_exact_dedup,
    "q23_lang_id": q23_lang_id,
    "q24_fingerprint": q24_fingerprint,
    "q30_ann_topk": q30_ann_topk,
    "q31_embedding_dedup": q31_embedding_dedup,
    "q40_count_stats": q40_count_stats,
    "q41_wilcoxon": q41_wilcoxon,
    "q50_logreg_weights": q50_logreg_weights,
    "q51_jaccard_eval": q51_jaccard_eval,
    "q52_pit_features": q52_pit_features,
}

ORACLES = {
    "q01_pricing_summary": Q01_SQL,
    "q02_top_parts_per_brand": Q02_SQL,
    "q03_revenue_by_nation": Q03_SQL,
    "q04_rare_class_filter": Q04_SQL,
    "q05_distinct_parts": Q05_SQL,
    "q06_union": Q06_SQL,
    "q07_top_orders": Q07_SQL,
    "q10_lag_lead": Q10_SQL,
    "q11_sessionize": Q11_SQL,
    "q12_backfill": Q12_SQL,
    "q13_asof_join": Q13_SQL,
    "q14_hourly_agg": Q14_SQL,
    "q15_rolling_window": Q15_SQL,
    "q20_word_stats": Q20_SQL,
    "q21_quality": Q21_SQL,
    "q22_exact_dedup": Q22_SQL,
    "q23_lang_id": Q23_SQL,
    "q24_fingerprint": Q24_SQL,
    "q30_ann_topk": Q30_SQL,
    "q31_embedding_dedup": Q31_SQL,
    # q40/q50/q51/q52: non-SQL-expressible (crc32 ids / iterative SGD /
    # method comparison / PIT flagship) -> rows-only driver checks; numeric
    # parity is enforced by the in-repo golden tests instead.
}
