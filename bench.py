#!/usr/bin/env python
"""Benchmark harness: headline feature-vector throughput + per-query times.

Plain run (one JSON line on stdout):
    python bench.py                # $GRAFT_SF_DIR (default /root/testdata/sf0.1),
                                   # $RAY_GRAFT_CPUS (default 32)
Scaling evidence (north rule: N vs 4N):
    python bench.py --scaling      # >=5 interleaved WINDOWS (one pass over
                                   # the levels + same-window calibration
                                   # kernels each); reports the MEDIAN
                                   # per-window raw ratio + the full
                                   # distribution over the 32M-row corpus
    # knobs: GRAFT_SCALING_PROFILE=scale32, GRAFT_SCALING_LEVELS=8,32,
    # GRAFT_SCALING_WINDOWS=5, GRAFT_SCALING_ROUNDS=2 (timed rounds per
    # level invocation)
Dedup timing row:
    python bench.py --dedup-bench  # minhash_lsh_dedup over the 100k-doc corpus
Exchange A/B (same-session interleaved):
    python bench.py --pit-ab       # pit_features tokens-emitted vs
                                   # emit_tokens=False (tokens never shuffled)
Token-ops timing rows:
    python bench.py --tokenops-bench  # pack_concat (shuffle/broadcast x
                                      # tokens/counts) + token-content dedup
                                      # over the 2M-row BENCH corpus
Fullbatch-trainer timing row:
    python bench.py --logreg-bench    # fit_logreg_fullbatch over the 8M-row
                                      # SCALE corpus, GRAFT_LOGREG_STEPS=4
Streaming sessionizer timing row:
    python bench.py --streaming-bench  # process_ordered_stream actor path,
                                       # GRAFT_STREAM_ROWS=8000000
Compact-encoding A/B (same-session interleaved):
    python bench.py --exchange-ab  # round-5 compact hi/lo exchange encoding
                                   # vs legacy int64, both emit_tokens variants
Shuffle block-size lever: GRAFT_TARGET_BLOCK_MB=N sets
DataContext.target_max_block_size for A/B at the 32-CPU level.
Shuffle strategy: GRAFT_SHUFFLE=push (default) | pull | hash — push-based
sort shuffle measured 35% faster at 32 CPUs, ~equal at 8 (see BASELINE.md).

Headline = the flagship point-in-time feature pipeline (windowize + as-of +
prefix accumulators) over the deterministic synthetic sequences corpus
(BENCH profile: 2M rows / 32k vocab / 32 shards, cached under /tmp), plus
count-stats scoring — the north-star "feature-vector throughput" surface,
reported in sequences/sec and tokens/sec.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _init_ray_ctx(num_cpus: int | None = None) -> int:
    """Shared ray.init + DataContext setup for every runner, so token-ops /
    logreg / dedup timing rows are measured under the SAME shuffle strategy
    and block sizing as the headline rows.

    - Push-based sort shuffle by default: measured A/B on the 32M-row
      corpus (pinned, interleaved, same session) — 56.6s vs 86.4s at
      32 CPUs (-35%), ~equal at 8 CPUs (131 vs 141) — the map-side merge
      pays off exactly where the bucket exchange hurts: high fan-out.
      GRAFT_SHUFFLE=pull|hash restores the other strategies for A/B runs.
    - read_op_min_num_blocks: Ray's default (200) splits reads into ~9k-row
      blocks regardless of data size; fewer, larger blocks cut scheduling
      overhead and give the pre-aggregation kernels full batches.
    - GRAFT_TARGET_BLOCK_MB (judge r4 item 3): target_max_block_size lever
      for the sort-shuffle exchange; unset keeps Ray's 128 MB default.
    """
    if num_cpus is None:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    _strat = os.environ.get("GRAFT_SHUFFLE", "push")
    if _strat != "pull":
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = (
            ShuffleStrategy.HASH_SHUFFLE
            if _strat == "hash"
            else ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        )
    ctx.enable_progress_bars = False
    ctx.read_op_min_num_blocks = max(64, num_cpus * 2)
    _blk = os.environ.get("GRAFT_TARGET_BLOCK_MB")
    if _blk:
        ctx.target_max_block_size = int(_blk) * 1024 * 1024
    return num_cpus


def run_benchmark() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    num_cpus = _init_ray_ctx()
    import ray
    import ray.data as rd

    from modlyn_ray import synth
    from modlyn_ray.pipelines.flagship import pit_features
    from modlyn_ray.stages.count_stats import count_stats

    profile = synth.PROFILES[os.environ.get("GRAFT_PROFILE", "bench")]
    bench_dir = synth.ensure_profile(profile)
    seq_path = f"{bench_dir}/sequences"
    attr_path = f"{bench_dir}/doc_attrs.parquet"

    # GRAFT_PIT_EMIT_TOKENS=0 benchmarks the feature-store variant: tokens
    # never ride the exchange (row_mix shipped pre-computed instead) and are
    # absent from the output — all other feature columns byte-identical
    # (tests/test_round4_fixes.py). Default 1 = the full token-passthrough
    # contract.
    emit_tokens = os.environ.get("GRAFT_PIT_EMIT_TOKENS", "1") != "0"

    def make_pit():
        # narrow_tokens: every synth profile draws tokens over vocab<=32768,
        # so when tokens are emitted the dominant shuffle column rides the
        # exchange as list<int16> (safe cast — raises loudly if the contract
        # were ever violated)
        return pit_features(
            rd.read_parquet(seq_path),
            rd.read_parquet(attr_path),
            n_buckets=max(32, num_cpus * 2),
            narrow_tokens=emit_tokens,
            emit_tokens=emit_tokens,
        )

    # warm-up: page cache AND the Ray worker pool (first execution at high
    # num_cpus pays tens of seconds of worker spawn that is not steady-state
    # throughput). One untimed pass of each pipeline, then the timed runs.
    rd.read_parquet(seq_path).count()
    make_pit().count()
    count_stats(
        rd.read_parquet(seq_path, columns=["source", "tokens"])
    ).count()

    n_rows = profile.n_rows
    # total token count (cheap metadata-level aggregate)
    n_tokens = int(
        rd.read_parquet(seq_path, columns=["n_tok"]).sum("n_tok")
    )

    # the sandbox is a shared virtualized box with 3-5x timing noise across
    # runs; INTERLEAVE >=3 rounds of each phase (a load spike then cannot
    # sink a whole phase) and report the best (peak sustained throughput),
    # with a burn-kernel calibration reading from the same window so the
    # ambient load is visible in the recorded JSON
    # 5 rounds: measured round sequences on this box still descend at round
    # 4 (e.g. 21.0 -> 11.6 -> 11.8 -> 10.7) — a 5th sample costs ~20s and
    # reliably reaches the steady-state window the best-of reports
    n_rounds = int(os.environ.get("GRAFT_BENCH_ROUNDS", "5"))
    t_pit, t_stats = float("inf"), float("inf")
    pit_all, stats_all = [], []
    stats_rows = 0
    for _round in range(n_rounds):
        t0 = time.perf_counter()
        feats = make_pit()
        out_rows = feats.count()
        pit_all.append(round(time.perf_counter() - t0, 3))
        t_pit = min(t_pit, pit_all[-1])
        assert out_rows == n_rows, (out_rows, n_rows)

        t0 = time.perf_counter()
        # columns= prunes at the parquet reader (Ray has no projection
        # pushdown; see count_stats docstring)
        stats_rows = count_stats(
            rd.read_parquet(seq_path, columns=["source", "tokens"])
        ).count()
        stats_all.append(round(time.perf_counter() - t0, 3))
        t_stats = min(t_stats, stats_all[-1])

    headline = t_pit + t_stats
    # ambient-load calibration from THIS window (8-proc CPU-burn tasks/sec;
    # compare across BENCH_r{N}.json files to spot noisy recordings)
    hw_burn = round(_hw_throughput(8, _burn), 3)

    # per-query timings over the sf dir (the driver-facing operator suite);
    # GRAFT_SKIP_QUERIES=1 measures the headline alone (scaling calibration)
    from modlyn_ray.pipelines.queries import QUERIES

    if os.environ.get("GRAFT_SKIP_QUERIES") == "1":
        result = {
            "metric": "feature-vector throughput (headline only)",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {},
            "sf": sf_dir.rstrip("/").split("/")[-1],
            "num_cpus": num_cpus,
            "pit_sec": round(t_pit, 3),
            "count_stats_sec": round(t_stats, 3),
            "pit_rounds": pit_all,
            "count_stats_rounds": stats_all,
            "pit_emit_tokens": emit_tokens,
            "hw_burn_tasks_per_sec": hw_burn,
            "sequences_per_sec": round(n_rows / headline, 1),
            "tokens_per_sec": round(n_tokens / headline, 1),
        }
        ray.shutdown()
        return result

    bench_queries = [
        "q01_pricing_summary",
        "q10_lag_lead",
        "q35_streaming_sessionize",
        "q48_set_ops",
        "q13_asof_join",
        "q20_word_stats",
        "q22_exact_dedup",
        "q30_ann_topk",
        "q40_count_stats",
    ]
    qtimes: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.perf_counter()
        res = QUERIES[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "end-to-end feature-vector throughput (pit_features + count_stats over "
        f"{n_rows} synthetic tokenized sequences) + operator suite over {sf_dir}",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "num_cpus": num_cpus,
        "pit_sec": round(t_pit, 3),
        "count_stats_sec": round(t_stats, 3),
        "pit_rounds": pit_all,
        "count_stats_rounds": stats_all,
        "pit_emit_tokens": emit_tokens,
        "hw_burn_tasks_per_sec": hw_burn,
        "sequences_per_sec": round(n_rows / headline, 1),
        "tokens_per_sec": round(n_tokens / headline, 1),
        "n_tokens": n_tokens,
        "stats_rows": stats_rows,
    }
    ray.shutdown()
    return result


def _burn(_):
    x = 0
    for i in range(20_000_000):
        x += i
    return x


def _copy(_):
    """Memory-bandwidth-bound task: stream-copy 1.6 GB through RAM."""
    import numpy as np

    a = np.ones(25_000_000)  # 200 MB
    for _i in range(8):
        b = a.copy()
    return float(b[0])


def _hw_throughput(procs: int, fn=_burn) -> float:
    """Multiprocessing throughput (tasks/sec) for a calibration kernel —
    what THIS box physically delivers at a given parallelism. ``_burn`` is
    CPU-bound (scales with cores until the host oversubscribes); ``_copy``
    is memory-bandwidth-bound (stops scaling when the shared bus
    saturates — the regime a shuffle lives in; extra cluster NODES bring
    their own bandwidth, one virtualized box does not).

    Pinned to CPUs 0..procs-1 (children inherit the affinity), matching
    the pinned pipeline levels: an "N-CPU cluster" means N CPUs TOTAL."""
    import multiprocessing as mp
    import time as _t

    old = None
    if hasattr(os, "sched_setaffinity"):
        try:
            old = os.sched_getaffinity(0)
            os.sched_setaffinity(0, set(range(procs)))
        except OSError:
            old = None
    try:
        t0 = _t.perf_counter()
        with mp.Pool(procs) as p:
            p.map(fn, range(procs))
        return procs / (_t.perf_counter() - t0)
    finally:
        if old is not None:
            os.sched_setaffinity(0, old)


def run_scaling() -> dict:
    """North-rule two-cluster-size evidence: the same job in fresh
    processes at N and 4N CPUs over the same input.

    Two measurement pairs:
      - 8 -> 32 (the full-box pair)
      - 4 -> 16 (below the box's bandwidth-saturation knee)
    plus hardware calibration at both pairs with a CPU-bound burn kernel
    AND a memory-bandwidth-bound copy kernel. The pipeline is a mix of
    compute (vectorized kernels) and one bucket shuffle (bandwidth-bound),
    so its single-box ceiling sits between the two calibrations; the
    hardware-normalized efficiency divides the pipeline's speedup by the
    box's own speedup on the same resource mix (see BASELINE.md).
    """

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SKIP_QUERIES="1",
            GRAFT_PROFILE=os.environ.get("GRAFT_SCALING_PROFILE", "scale32"),
            # 2 timed rounds per level invocation (best-of): the window
            # protocol gets its robustness from the MEDIAN across windows,
            # not from many rounds inside one window — and shorter
            # invocations keep a window inside one ambient-load regime
            GRAFT_BENCH_ROUNDS=os.environ.get("GRAFT_SCALING_ROUNDS", "2"),
        )
        # PIN the whole process tree (Ray workers, object store, Arrow
        # threads) to exactly ncpu CPUs: without this an "8-CPU" level's
        # threads spread over all 32 vCPUs — borrowed cores and full
        # memory bus inflate low-level throughput and depress measured
        # efficiency. An N-node cluster gives a job N CPUs TOTAL; the pin
        # is what makes the two-level comparison honest.
        import shutil as _sh

        cmd = [sys.executable, os.path.abspath(__file__)]
        if _sh.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}", *cmd]
        out = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # the shared virtualized box shows multi-x load swings across ~10-min
    # windows, so a single pair is a window lottery. Measurement unit is a
    # WINDOW: one interleaved pass over the levels PLUS calibration-kernel
    # readings taken in the same pass. The recorded statistic is the MEDIAN
    # per-window ratio across >= GRAFT_SCALING_WINDOWS windows (default 5),
    # with the full distribution in the JSON — a distribution, not a best
    # pair. The scaling corpus is the 32M-row SCALE32 profile by default:
    # a ~10s job is dominated by fixed orchestration costs that don't
    # shrink with CPUs; ratios only mean something once the job amortizes
    # them (the regime the 100 TB target lives in).
    base_levels = tuple(
        int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "8,32").split(",")
    )
    n_windows = int(
        os.environ.get(
            "GRAFT_SCALING_WINDOWS", os.environ.get("GRAFT_SCALING_REPEATS", "5")
        )
    )
    pair_bases = [n for n in sorted(set(base_levels)) if 4 * n in base_levels]
    if not pair_bases:
        raise SystemExit(f"GRAFT_SCALING_LEVELS={base_levels} contains no N,4N pair")

    def blend(burn, copy):
        # the timed headline is roughly half vectorized compute, half
        # shuffle (BASELINE.md); the blended hardware ceiling is the
        # harmonic combination of the two kernels' speedups at equal shares
        return 2.0 / (1.0 / burn + 1.0 / copy)

    windows: list[dict] = []
    best: dict[int, dict] = {}
    for w in range(n_windows):
        sec: dict[int, float] = {}
        phase: dict[int, dict] = {}
        burn_t: dict[int, float] = {}
        copy_t: dict[int, float] = {}
        for n in base_levels:
            r = one(n)
            sec[n] = r["value"]
            phase[n] = {"pit": r.get("pit_sec"), "stats": r.get("count_stats_sec")}
            if n not in best or r["value"] < best[n]["value"]:
                best[n] = r
            # calibration sampled adjacent to the level it calibrates
            burn_t[n] = _hw_throughput(n, _burn)
            copy_t[n] = _hw_throughput(n, _copy)
        wrec: dict = {
            "sec": {str(n): round(sec[n], 3) for n in sec},
            "phase_sec": {str(n): phase[n] for n in phase},
            "raw_eff": {},
            "phase_raw_eff": {},
            "hw_burn_speedup": {},
            "hw_copy_speedup": {},
            "hw_normalized_eff": {},
        }
        for lo in pair_bases:
            hi = 4 * lo
            tag = f"{lo}_{hi}"
            sp = sec[lo] / sec[hi]
            wrec["raw_eff"][tag] = round(sp / 4.0, 3)
            # per-phase decomposition: which phase is the scaling residual
            wrec["phase_raw_eff"][tag] = {
                ph: round(phase[lo][ph] / phase[hi][ph] / 4.0, 3)
                for ph in ("pit", "stats")
                if phase[lo].get(ph) and phase[hi].get(ph)
            }
            bsp = burn_t[hi] / burn_t[lo]
            csp = copy_t[hi] / copy_t[lo]
            wrec["hw_burn_speedup"][tag] = round(bsp, 3)
            wrec["hw_copy_speedup"][tag] = round(csp, 3)
            # normalization is only meaningful when the box actually sped
            # the calibration kernels up with more procs; an inverted
            # ceiling (copy speedup < 1: co-tenant stole the bus) would
            # produce a nonsense ratio > 1 — report null for that window
            wrec["hw_normalized_eff"][tag] = (
                round(sp / blend(bsp, csp), 3) if bsp > 1.0 and csp > 1.0 else None
            )
        windows.append(wrec)
        print(json.dumps({"window": w, **wrec}), file=sys.stderr)

    def median(xs):
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else round((xs[m - 1] + xs[m]) / 2.0, 4)

    med_eff, med_norm, med_phase, dist = {}, {}, {}, {}
    for lo in pair_bases:
        tag = f"{lo}_{4 * lo}"
        vals = [w["raw_eff"][tag] for w in windows]
        dist[tag] = vals
        med_eff[tag] = median(vals)
        med_phase[tag] = {
            ph: median(pvals)
            for ph in ("pit", "stats")
            if (pvals := [w["phase_raw_eff"][tag][ph] for w in windows if ph in w["phase_raw_eff"].get(tag, {})])
        }
        norms = [w["hw_normalized_eff"][tag] for w in windows if w["hw_normalized_eff"][tag]]
        med_norm[tag] = median(norms) if norms else None
    # headline = the LARGEST measured pair's MEDIAN (never the best window)
    lo = pair_bases[-1]
    hi = 4 * lo
    return {
        "metric": f"scaling efficiency, median over {n_windows} interleaved windows "
        f"(throughput at {hi} CPUs / 4x throughput at {lo} CPUs)",
        "value": med_eff[f"{lo}_{hi}"],
        "unit": "ratio",
        "profile": os.environ.get("GRAFT_SCALING_PROFILE", "scale32"),
        "median_raw_efficiency": med_eff,
        "median_phase_raw_efficiency": med_phase,
        "raw_efficiency_per_window": dist,
        "median_hw_normalized_efficiency": med_norm,
        "windows": windows,
        "best_sec": {str(n): best[n]["value"] for n in best},
        "best_seq_per_sec": {str(n): best[n]["sequences_per_sec"] for n in best},
        "note": "single virtualized box: a 4x-node cluster adds memory bandwidth "
        "and NICs with each node; this box shares one bus across all workers — "
        "the copy-kernel speedup is the shuffle stage's physical ceiling here. "
        "Per-window calibration kernels expose each window's ambient load. "
        "See BASELINE.md for the full calibration discussion.",
    }


def run_pit_ab() -> dict:
    """Same-session interleaved A/B: pit_features with tokens emitted
    (narrow int16 exchange) vs emit_tokens=False (tokens never shuffled;
    row_mix shipped pre-computed). The same-window pairwise comparison is
    the only controlled measurement on this shared box (BASELINE.md)."""
    num_cpus = _init_ray_ctx()
    import ray
    import ray.data as rd

    from modlyn_ray import synth
    from modlyn_ray.pipelines.flagship import pit_features

    profile = synth.PROFILES[os.environ.get("GRAFT_PROFILE", "bench")]
    d = synth.ensure_profile(profile)
    seq, attr = f"{d}/sequences", f"{d}/doc_attrs.parquet"
    nb = max(32, num_cpus * 2)

    def run(emit: bool) -> float:
        t0 = time.perf_counter()
        n = pit_features(
            rd.read_parquet(seq), rd.read_parquet(attr), n_buckets=nb,
            narrow_tokens=emit, emit_tokens=emit,
        ).count()
        assert n == profile.n_rows
        return round(time.perf_counter() - t0, 3)

    run(True)  # warm page cache + worker pool
    cycles = []
    for _ in range(int(os.environ.get("GRAFT_BENCH_ROUNDS", "3"))):
        with_tok = run(True)
        without = run(False)
        cycles.append(
            {"emit_tokens_sec": with_tok, "no_tokens_sec": without,
             "speedup": round(with_tok / without, 3)}
        )
    result = {
        "metric": "pit_features exchange A/B: tokens emitted (int16) vs emit_tokens=False",
        "value": min(c["no_tokens_sec"] for c in cycles),
        "unit": "sec",
        "cycles": cycles,
        "num_cpus": num_cpus,
        "n_rows": profile.n_rows,
        "hw_burn_tasks_per_sec": round(_hw_throughput(8, _burn), 3),
    }
    ray.shutdown()
    return result


def run_exchange_ab() -> dict:
    """Same-session interleaved A/B: the round-5 compact hi/lo exchange
    encoding (flagship.py module comment) vs the legacy int64-wide
    encoding, at both emit_tokens variants. Same-window pairwise cycles —
    the only controlled comparison on this shared box (BASELINE.md)."""
    num_cpus = _init_ray_ctx()
    import ray
    import ray.data as rd

    from modlyn_ray import synth
    from modlyn_ray.pipelines.flagship import pit_features

    profile = synth.PROFILES[os.environ.get("GRAFT_PROFILE", "bench")]
    d = synth.ensure_profile(profile)
    seq, attr = f"{d}/sequences", f"{d}/doc_attrs.parquet"
    nb = max(32, num_cpus * 2)

    def run(emit: bool, compact: bool) -> float:
        t0 = time.perf_counter()
        n = pit_features(
            rd.read_parquet(seq), rd.read_parquet(attr), n_buckets=nb,
            narrow_tokens=emit, emit_tokens=emit, compact_exchange=compact,
        ).count()
        assert n == profile.n_rows
        return round(time.perf_counter() - t0, 3)

    run(False, True)  # warm page cache + worker pool
    cycles = []
    for _ in range(int(os.environ.get("GRAFT_BENCH_ROUNDS", "3"))):
        rec = {}
        for emit in (False, True):
            legacy = run(emit, False)
            compact = run(emit, True)
            tag = "tokens" if emit else "tokenfree"
            rec[f"{tag}_legacy_sec"] = legacy
            rec[f"{tag}_compact_sec"] = compact
            rec[f"{tag}_speedup"] = round(legacy / compact, 3)
        rec["hw_burn_tasks_per_sec"] = round(_hw_throughput(8, _burn), 3)
        cycles.append(rec)
    result = {
        "metric": "pit_features exchange A/B: compact hi/lo encoding vs legacy int64",
        "value": min(c["tokenfree_compact_sec"] for c in cycles),
        "unit": "sec",
        "cycles": cycles,
        "num_cpus": num_cpus,
        "n_rows": profile.n_rows,
    }
    ray.shutdown()
    return result


def run_streaming_bench() -> dict:
    """Timing row for the streaming sessionizer actor path
    (stages/streaming.py process_ordered_stream): an ordered synthetic
    event log fed in drops through the hash-partitioned actor pool —
    per-key state carries across drops, throughput in rows/sec."""
    import numpy as np
    import pyarrow as pa

    num_cpus = _init_ray_ctx()
    import ray

    from modlyn_ray.stages.streaming import process_ordered_stream

    rng = np.random.default_rng(17)
    n_rows = int(os.environ.get("GRAFT_STREAM_ROWS", "8000000"))
    n_keys = 20_000
    batch_rows = 250_000
    ts_all = np.cumsum(rng.integers(1, 2_000_000, n_rows))
    keys_all = rng.integers(0, n_keys, n_rows)
    src_all = rng.integers(0, 4, n_rows)
    key_strs = np.array([f"u{k:05d}" for k in range(n_keys)])
    src_strs = np.array(["s0", "s1", "s2", "s3"])
    batches = []
    for i in range(0, n_rows, batch_rows):
        k, t, s = keys_all[i : i + batch_rows], ts_all[i : i + batch_rows], src_all[i : i + batch_rows]
        # ordered-log contract: rows key-contiguous and ts-ordered within a
        # drop (ts is globally increasing, so per-key order is preserved
        # across drops too)
        o = np.lexsort((t, k))
        batches.append(
            pa.table(
                {
                    "doc_id": pa.array(key_strs[k[o]]),
                    "ingest_ts": pa.array(t[o].astype("datetime64[us]")),
                    "source": pa.array(src_strs[s[o]]),
                }
            )
        )
    n_actors = max(4, num_cpus // 2)
    # warmup pass (actor spawn) on the first drop only
    process_ordered_stream(batches[:1], n_actors=n_actors)
    rounds = []
    for _ in range(int(os.environ.get("GRAFT_BENCH_ROUNDS", "3"))):
        t0 = time.perf_counter()
        out, _states = process_ordered_stream(batches, n_actors=n_actors)
        rounds.append(round(time.perf_counter() - t0, 3))
        assert len(out) == n_rows
    best = min(rounds)
    result = {
        "metric": f"streaming sessionizer throughput ({n_rows} rows, "
        f"{len(batches)} drops, {n_keys} keys, {n_actors} actors)",
        "value": best,
        "unit": "sec",
        "rounds": rounds,
        "rows_per_sec": round(n_rows / best, 1),
        "num_cpus": num_cpus,
        "hw_burn_tasks_per_sec": round(_hw_throughput(8, _burn), 3),
    }
    ray.shutdown()
    return result


def run_dedup_bench() -> dict:
    """Timing row for MinHash+LSH dedup on the 10^5-doc corpus (the same
    deterministic construction as tests/test_dedup_scale.py: 99,700 random
    8-word docs + 100 planted families of 3 near-identical variants).
    Measures the fully distributed path — banding, bucketed candidate
    pairs, vectorized exact-Jaccard verify, min-label propagation."""
    import numpy as np
    import pyarrow as pa

    num_cpus = _init_ray_ctx()
    import ray
    import ray.data as rd

    from modlyn_ray.stages.dedup import minhash_lsh_dedup

    rng = np.random.default_rng(42)
    n_unique, n_families = 99_700, 100
    texts = [
        " ".join(f"w{v}" for v in row)
        for row in rng.integers(0, 50_000, (n_unique, 8))
    ]
    for f in range(n_families):
        base = [f"f{f}_{v}" for v in rng.integers(0, 1000, 20)]
        for v in range(3):
            texts.append(" ".join(base[:-1] + [f"var{v}"]))
    n_docs = len(texts)
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n_docs, dtype=np.int64)), "text": pa.array(texts)}
    )

    n_buckets = max(32, num_cpus * 2)
    minhash_lsh_dedup(rd.from_arrow(tbl).repartition(num_cpus), n_buckets=n_buckets).count()  # warmup
    rounds = []
    for _ in range(int(os.environ.get("GRAFT_BENCH_ROUNDS", "3"))):
        t0 = time.perf_counter()
        out_rows = minhash_lsh_dedup(
            rd.from_arrow(tbl).repartition(num_cpus), n_buckets=n_buckets
        ).count()
        rounds.append(round(time.perf_counter() - t0, 3))
        assert out_rows == n_docs, (out_rows, n_docs)
    best = min(rounds)
    result = {
        "metric": f"minhash_lsh_dedup wall time ({n_docs} docs, {n_families} planted near-dup families)",
        "value": best,
        "unit": "sec",
        "rounds": rounds,
        "docs_per_sec": round(n_docs / best, 1),
        "num_cpus": num_cpus,
        "hw_burn_tasks_per_sec": round(_hw_throughput(8, _burn), 3),
    }
    ray.shutdown()
    return result


def run_tokenops_bench() -> dict:
    """Timing rows for the token-restructuring family over the 2M-row BENCH
    sequences corpus: pack_concat (GPT-style concat-and-cut, both offset
    attach paths x both emit_tokens variants — exposing what the packing
    exchange actually ships) and dedup_by_token_content (content-hash
    bucketed exact dedup)."""
    num_cpus = _init_ray_ctx()
    import ray
    import ray.data as rd
    from modlyn_ray import synth
    from modlyn_ray.stages.tokenops import dedup_by_token_content, pack_concat

    profile = synth.PROFILES[os.environ.get("GRAFT_PROFILE", "bench")]
    bench_dir = synth.ensure_profile(profile)
    seq_path = f"{bench_dir}/sequences"
    n_rows = profile.n_rows
    n_tokens = int(rd.read_parquet(seq_path, columns=["n_tok"]).sum("n_tok"))
    C = int(os.environ.get("GRAFT_PACK_CONTEXT", "2048"))
    n_buckets = max(32, num_cpus * 2)
    n_rounds = int(os.environ.get("GRAFT_BENCH_ROUNDS", "3"))

    def read():
        return rd.read_parquet(seq_path)

    # seq_no is the globally unique int64 row id in every synth profile —
    # the right packing key (doc_id repeats across a doc's sequences)
    def pack(via: str, emit: bool, packed: bool = True):
        return pack_concat(
            read(), C, group_col="source", key_col="seq_no",
            emit_tokens=emit, n_buckets=n_buckets, offsets_via=via,
            packed_keys=packed,
        )

    # variants interleaved per round (same-window pairwise, the only
    # controlled comparison on this shared box): the stringkey variant is
    # the packed-int64-vs-string-composite join-key A/B on the shuffle
    # attach — semantics identical (tests/test_tokenops.py)
    variants = [
        ("pack_concat_shuffle_tokens", "shuffle", True, True),
        ("pack_concat_shuffle_counts", "shuffle", False, True),
        ("pack_concat_shuffle_stringkey_counts", "shuffle", False, False),
        ("pack_concat_broadcast_tokens", "broadcast", True, True),
        ("pack_concat_broadcast_counts", "broadcast", False, True),
    ]
    results: dict[str, dict] = {}
    pack(os.environ.get("GRAFT_PACK_WARM_VIA", "shuffle"), True).count()  # warmup
    per: dict[str, list] = {name: [] for name, *_ in variants}
    out_packs: dict[str, int] = {}
    for _ in range(n_rounds):
        for name, via, emit, packed in variants:
            t0 = time.perf_counter()
            out_packs[name] = pack(via, emit, packed).count()
            per[name].append(round(time.perf_counter() - t0, 3))
    for name, *_ in variants:
        best = min(per[name])
        results[name] = {
            "sec": best,
            "rounds": per[name],
            "out_packs": out_packs[name],
            "seqs_per_sec": round(n_rows / best, 1),
            "tokens_per_sec": round(n_tokens / best, 1),
        }

    dedup_rounds = []
    kept = 0
    dedup_by_token_content(read(), n_buckets=n_buckets).count()  # warmup
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        kept = dedup_by_token_content(read(), n_buckets=n_buckets).count()
        dedup_rounds.append(round(time.perf_counter() - t0, 3))
    best = min(dedup_rounds)
    results["dedup_by_token_content"] = {
        "sec": best,
        "rounds": dedup_rounds,
        "rows_kept": kept,
        "seqs_per_sec": round(n_rows / best, 1),
        "tokens_per_sec": round(n_tokens / best, 1),
    }

    out = {
        "metric": f"token-ops wall time ({profile.name}: {n_rows} seqs, "
        f"{n_tokens} tokens, context_len={C})",
        "value": results["pack_concat_shuffle_tokens"]["sec"],
        "unit": "sec",
        "results": results,
        "num_cpus": num_cpus,
        "hw_burn_tasks_per_sec": round(_hw_throughput(8, _burn), 3),
    }
    ray.shutdown()
    return out


def run_logreg_bench() -> dict:
    """Timing row for the scale-path trainer (fit_logreg_fullbatch):
    synchronous full-gradient Adam over the 8M-row SCALE corpus — per-step
    sparse gradient partials in map_batches against ray.put-broadcast
    weights, tree-reduced. Reports per-step wall time and row-visits/sec
    (rows x steps / total)."""
    num_cpus = _init_ray_ctx()
    import ray
    import ray.data as rd
    from modlyn_ray import synth
    from modlyn_ray.stages.logreg import LogRegConfig, fit_logreg_fullbatch

    profile = synth.PROFILES[os.environ.get("GRAFT_PROFILE", "scale")]
    bench_dir = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{bench_dir}/sequences")
    n_rows = profile.n_rows
    steps = int(os.environ.get("GRAFT_LOGREG_STEPS", "4"))
    cfg = LogRegConfig(vocab=profile.vocab)

    fit_logreg_fullbatch(ds, cfg, steps=1)  # warmup (workers + materialize)
    rounds = []
    for _ in range(int(os.environ.get("GRAFT_BENCH_ROUNDS", "3"))):
        t0 = time.perf_counter()
        model = fit_logreg_fullbatch(ds, cfg, steps=steps)
        rounds.append(round(time.perf_counter() - t0, 3))
        assert model.W.shape[1] == profile.vocab
    best = min(rounds)
    result = {
        "metric": f"fullbatch logreg wall time ({profile.name}: {n_rows} rows, "
        f"vocab {profile.vocab}, {steps} steps)",
        "value": best,
        "unit": "sec",
        "rounds": rounds,
        "sec_per_step": round(best / steps, 3),
        "row_visits_per_sec": round(n_rows * steps / best, 1),
        "num_cpus": num_cpus,
        "hw_burn_tasks_per_sec": round(_hw_throughput(8, _burn), 3),
    }
    ray.shutdown()
    return result



if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--dedup-bench" in sys.argv:
        print(json.dumps(run_dedup_bench()))
    elif "--pit-ab" in sys.argv:
        print(json.dumps(run_pit_ab()))
    elif "--tokenops-bench" in sys.argv:
        print(json.dumps(run_tokenops_bench()))
    elif "--logreg-bench" in sys.argv:
        print(json.dumps(run_logreg_bench()))
    elif "--streaming-bench" in sys.argv:
        print(json.dumps(run_streaming_bench()))
    elif "--exchange-ab" in sys.argv:
        print(json.dumps(run_exchange_ab()))
    else:
        print(json.dumps(run_benchmark()))
