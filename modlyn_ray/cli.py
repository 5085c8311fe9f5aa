"""Job entrypoint: `ray job submit -- python -m modlyn_ray.cli <cmd> ...`.

The north rule requires pipelines launched via ``ray job submit`` on a
fixed-size cluster; inside a submitted job ``ray.init(address="auto")``
attaches to that cluster. Standalone (this sandbox) it starts a local
session. Every command writes checkpointed, manifest-backed output via
``state.checkpoint.run_stage`` so a resubmitted job resumes instead of
recomputing.

Commands:
    pit        --input DIR --attrs FILE --out DIR [--buckets N]
    stats      --input DIR --out DIR
    wilcoxon   --input DIR --out DIR
    logreg     --input DIR --out DIR [--vocab V --steps S --batch B]
    dedup      --input DIR --out DIR [--method exact|minhash|simhash|embedding]
    synth      --profile tiny|small|bench [--out DIR]

Example (cluster):
    ray job submit --working-dir . -- python -m modlyn_ray.cli pit \
        --input s3://corpus/sequences --attrs s3://corpus/attrs.parquet \
        --out s3://features/pit
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True, "logging_level": "ERROR"}
        if addr in ("local", ""):
            ncpu = os.environ.get("RAY_GRAFT_CPUS")
            ray.init(address="local", num_cpus=int(ncpu) if ncpu else None, **kwargs)
        else:
            ray.init(address=addr, **kwargs)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="modlyn_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("pit", help="point-in-time feature pipeline")
    sp.add_argument("--input", required=True)
    sp.add_argument("--attrs")
    sp.add_argument("--out", required=True)
    sp.add_argument("--buckets", type=int, default=64)

    ss = sub.add_parser("stats", help="per-(class, token) count statistics")
    ss.add_argument("--input", required=True)
    ss.add_argument("--out", required=True)

    sw = sub.add_parser("wilcoxon", help="Wilcoxon rank-sum scores")
    sw.add_argument("--input", required=True)
    sw.add_argument("--out", required=True)

    sl = sub.add_parser("logreg", help="train the SimpleLogReg-equivalent")
    sl.add_argument("--input", required=True)
    sl.add_argument("--out", required=True)
    sl.add_argument("--vocab", type=int)
    sl.add_argument("--steps", type=int, default=50)
    sl.add_argument("--batch", type=int, default=256)
    sl.add_argument(
        "--plots",
        action="store_true",
        help="also render losses.png + classification_report.png (headless "
        "rasterizer, modlyn_ray.plotting) next to the parquet artifacts",
    )

    sd = sub.add_parser("dedup", help="deduplicate a document table")
    sd.add_argument("--input", required=True)
    sd.add_argument("--out", required=True)
    sd.add_argument(
        "--method", default="exact", choices=["exact", "minhash", "simhash", "embedding"]
    )
    sd.add_argument("--text-col", default="text")
    sd.add_argument("--id-col", default="doc_id")
    sd.add_argument("--threshold", type=float, default=0.8)

    sy = sub.add_parser("synth", help="generate a synthetic corpus profile")
    sy.add_argument(
        "--profile",
        default="small",
        choices=["tiny", "small", "bench", "scale", "scale32"],
    )
    sy.add_argument("--out")

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from modlyn_ray import synth

        prof = synth.PROFILES[args.profile]
        out = synth.write_profile(prof, args.out) if args.out else synth.ensure_profile(prof)
        print(json.dumps({"cmd": "synth", "profile": args.profile, "dir": out}))
        return 0

    _ensure_ray()
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from modlyn_ray.state.checkpoint import read_manifest, run_stage

    if args.cmd == "pit":
        from modlyn_ray.pipelines.flagship import pit_features

        ds = run_stage(
            args.out,
            "pit_features",
            lambda: pit_features(
                rd.read_parquet(args.input),
                rd.read_parquet(args.attrs) if args.attrs else None,
                n_buckets=args.buckets,
            ),
            config={"input": args.input, "attrs": args.attrs, "buckets": args.buckets},
            inputs=[args.input] + ([args.attrs] if args.attrs else []),
            token_checksum=True,
        )
    elif args.cmd == "stats":
        from modlyn_ray.stages.count_stats import count_stats

        ds = run_stage(
            args.out,
            "count_stats",
            lambda: count_stats(
                rd.read_parquet(args.input, columns=["source", "tokens"])
            ),
            config={"input": args.input},
            inputs=[args.input],
        )
    elif args.cmd == "wilcoxon":
        from modlyn_ray.stages.rank_stats import wilcoxon_scores

        def build():
            import ray.data as rd2

            return rd2.from_arrow(wilcoxon_scores(rd.read_parquet(args.input)))

        ds = run_stage(args.out, "wilcoxon", build, config={"input": args.input}, inputs=[args.input])
    elif args.cmd == "logreg":
        from modlyn_ray.api import SimpleLogReg

        trained: list = []  # the fitted facade, for the artifact sinks below

        def build():
            import ray.data as rd2

            model = SimpleLogReg(args.input, vocab=args.vocab)
            model.fit(max_steps=args.steps, batch_size=args.batch)
            trained.append(model)
            return rd2.from_arrow(model.get_weights_tall())

        ds = run_stage(
            args.out,
            "logreg_weights",
            build,
            config={"input": args.input, "steps": args.steps, "batch": args.batch},
            inputs=[args.input],
        )
        # S7 data products (loss curve + sorted scores-heatmap pivot) land
        # next to the weights — skipped when run_stage resumed from a
        # finished manifest (build never ran; the artifacts already exist)
        if trained:
            art = os.path.join(args.out, "artifacts")
            trained[0].write_artifacts(art)
            if args.plots:
                trained[0].plot_losses(path=os.path.join(art, "losses.png"))
                trained[0].plot_classification_report(
                    path=os.path.join(art, "classification_report.png")
                )
        elif args.plots:
            # resumed from a finished manifest: build never ran, but the
            # PNGs may not exist (the original run may have skipped
            # --plots). The loss curve re-renders from the persisted
            # artifact parquet; the classification report needs a live
            # evaluate() pass, so say so instead of silently doing nothing.
            from modlyn_ray.plotting import render_losses_from_artifacts

            art = os.path.join(args.out, "artifacts")
            render_losses_from_artifacts(art, os.path.join(art, "losses.png"))
            print(
                "logreg: resumed from checkpoint — rendered losses.png from "
                "artifacts; classification_report.png needs a training run "
                "(delete the output dir or change config to re-train)",
                file=sys.stderr,
            )
    elif args.cmd == "dedup":
        from modlyn_ray.stages import dedup as dd

        def build():
            ds_in = rd.read_parquet(args.input)
            if args.method == "exact":
                return dd.exact_dedup(ds_in, col=args.text_col, id_col=args.id_col)
            if args.method == "minhash":
                return dd.minhash_lsh_dedup(
                    ds_in, text_col=args.text_col, id_col=args.id_col,
                    jaccard_threshold=args.threshold,
                )
            if args.method == "simhash":
                return dd.simhash_dedup(ds_in, text_col=args.text_col, id_col=args.id_col)
            return dd.embedding_dedup(ds_in, threshold=args.threshold)

        ds = run_stage(
            args.out,
            f"dedup_{args.method}",
            build,
            config={"input": args.input, "method": args.method, "threshold": args.threshold},
            inputs=[args.input],
        )
    else:  # pragma: no cover
        raise SystemExit(2)

    man = read_manifest(args.out)
    print(json.dumps({"cmd": args.cmd, "out": args.out, "rows": man["rows"], "wall_sec": man["wall_sec"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
