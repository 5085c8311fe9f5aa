"""Property test: asof_kernel vs brute-force scan on random timelines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from modlyn_ray.stages.temporal import asof_kernel


@st.composite
def _sides(draw):
    nl = draw(st.integers(1, 40))
    nr = draw(st.integers(0, 40))
    ldocs = draw(st.lists(st.integers(0, 5), min_size=nl, max_size=nl))
    lts = draw(st.lists(st.integers(0, 30), min_size=nl, max_size=nl))
    rdocs = draw(st.lists(st.integers(0, 5), min_size=nr, max_size=nr))
    rts = draw(st.lists(st.integers(0, 30), min_size=nr, max_size=nr))
    strict = draw(st.booleans())
    return ldocs, lts, rdocs, rts, strict


@given(_sides())
@settings(max_examples=40, deadline=None)
def test_asof_kernel_matches_bruteforce(data):
    ldocs, lts, rdocs, rts, strict = data
    nl, nr = len(ldocs), len(rdocs)
    ltbl = pa.table(
        {
            "doc_id": pa.array([f"d{d}" for d in ldocs]),
            "ingest_ts": pa.array(np.asarray(lts, dtype=np.int64), type=pa.timestamp("us")),
            "row": pa.array(np.arange(nl, dtype=np.int64)),
        }
    )
    rvals = np.arange(nr, dtype=np.float64) + 100.0
    rtbl = pa.table(
        {
            "doc_id": pa.array([f"d{d}" for d in rdocs]),
            "ingest_ts": pa.array(np.asarray(rts, dtype=np.int64), type=pa.timestamp("us")),
            "attr_val": pa.array(rvals),
        }
    )
    out = asof_kernel(
        ltbl,
        rtbl,
        by="doc_id",
        ts_col="ingest_ts",
        value_cols=["attr_val"],
        vtypes={"attr_val": pa.float64()},
        suffix="_asof",
        strict=strict,
    ).to_pandas()
    out = out.sort_values("row").reset_index(drop=True)

    # brute force: latest admissible right row; ties on ts -> greatest value
    for i in range(nl):
        d, t = ldocs[i], lts[i]
        adm = [
            (rts[j], rvals[j])
            for j in range(nr)
            if rdocs[j] == d and (rts[j] < t if strict else rts[j] <= t)
        ]
        if not adm:
            assert pd.isna(out.loc[i, "attr_val_asof"]), (i, out.loc[i])
        else:
            best_ts = max(a[0] for a in adm)
            best_val = max(v for ts_, v in adm if ts_ == best_ts)
            assert out.loc[i, "attr_val_asof"] == best_val, (i, adm, out.loc[i])
            assert out.loc[i, "matched_asof_ts"].value // 1000 == best_ts  # ns -> us
