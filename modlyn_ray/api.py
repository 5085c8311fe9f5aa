"""Reference-shaped facade: the modlyn user-facing API re-expressed on Ray.

A user of the reference drives two classes
(/root/reference/modlyn/__init__.py): ``SimpleLogReg`` (construct on data,
``fit()``, ``get_weights()`` → wide classes×features frame with
``attrs["method_name"]``) and ``CompareScores`` (list of such frames →
``compute_jaccard_comparison()`` tidy results). This module provides the
same surface over a ``ray.data.Dataset`` of tokenized sequences:

    model = SimpleLogReg(ds, label_column="source", vocab=512)
    model.fit(max_epochs=4, dataset_type="parquet")     # aliases accepted
    weights = model.get_weights()                       # wide pandas frame
    cmp = CompareScores([weights, other], n_top_values=[25, 50])
    results = cmp.compute_jaccard_comparison()

Differences from the reference (deliberate, documented):
- plot methods render PNG bytes via the in-repo headless rasterizer
  (:mod:`modlyn_ray.plotting`) instead of matplotlib figures (SURVEY
  §2.1 S7; the sandbox has no matplotlib) — same series/grouping/shared
  color scale, and the underlying tables still persist via
  ``write_artifacts``
- ``plot_classification_report``'s eval-side LabelEncoder REFIT
  (_simple_logreg_model.py:235-236) is not reproduced; evaluation reuses
  the train encoder (SURVEY §7.4.6) via ``classification_metrics()``
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset

from modlyn_ray.sources.readers import load, normalize_reader
from modlyn_ray.stages.logreg import (
    LogRegConfig,
    LogRegModel,
    classification_metrics,
    confusion_matrix,
    fit_logreg,
    fit_logreg_fullbatch,
    predict,
)


class SimpleLogReg:
    """Softmax-regression feature selector over tokenized sequences.

    Mirrors the reference constructor surface
    (/root/reference/modlyn/models/_simple_logreg_model.py:31-47): data +
    label column + lr/weight_decay; dims inferred from the data (vocab) and
    labels (n_classes)."""

    def __init__(
        self,
        data: Dataset | str,
        label_column: str = "source",
        vocab: int | None = None,
        lr: float = 1e-2,
        weight_decay: float = 1e-2,
        log1p: bool = False,
    ):
        self.ds = load(data) if isinstance(data, str) else data
        self.label_column = label_column
        if vocab is None:
            # infer n_vars from the data like adata.n_vars (:44)
            import pyarrow.compute as pc

            vocab = (
                self.ds.map_batches(
                    lambda b: {"m": [pc.max(b["tokens"].combine_chunks().flatten()).as_py() or 0]},
                    batch_format="pyarrow",
                ).max("m")
                + 1
            )
        self.config = LogRegConfig(
            vocab=int(vocab), lr=lr, weight_decay=weight_decay, log1p=log1p
        )
        self.model: LogRegModel | None = None

    def fit(
        self,
        max_epochs: int = 4,
        max_steps: int = 3000,
        batch_size: int = 256,
        dataset_type: str = "parquet",
        strategy: str = "golden",
        val_fraction: float = 0.0,
        val_data: Dataset | None = None,
        **_kwargs,
    ) -> "SimpleLogReg":
        """Train. ``dataset_type`` aliases are normalized exactly like the
        reference's backend aliases (_simple_logreg_model.py:141-150; the
        behavior tested at tests/test_dataset_type_alias.py:54,62-63).
        ``strategy``: 'golden' = deterministic minibatch schedule;
        'fullbatch' = synchronous cluster-wide full-gradient steps.
        Validation (the reference datamodule's train/val loaders +
        per-epoch val loss/F1, _simple_logreg_datamodule.py:174-200,
        _simple_logreg_model.py:88-103): pass ``val_data`` explicitly or
        ``val_fraction`` for a deterministic hash split; per-epoch metrics
        land in ``self.model.val_history``. The label encoder is fit on
        the TRAIN side only."""
        # normalized backend recorded like the reference's
        # model.datamodule.dataset_type (test_dataset_type_alias.py:62-63)
        self.dataset_type = normalize_reader(dataset_type)
        self.config.max_epochs = max_epochs
        self.config.max_steps = max_steps
        self.config.batch_size = batch_size
        ds = self._relabeled(self.ds)
        val_ds = self._relabeled(val_data) if val_data is not None else None
        if val_ds is None and val_fraction > 0:
            from modlyn_ray.stages.logreg import split_train_val

            ds, val_ds = split_train_val(ds, val_fraction)
        if strategy == "fullbatch":
            self.model = fit_logreg_fullbatch(ds, self.config, steps=max_steps)
            if val_ds is not None:
                # the fullbatch trainer has no per-epoch val loop; run ONE
                # frozen-weight eval pass so the split-off rows still buy
                # metrics instead of being silently discarded
                from modlyn_ray.stages.logreg import eval_pass

                self.model.val_history.append(
                    {
                        "epoch": self.config.max_epochs,
                        "step": max_steps,
                        **eval_pass(
                            val_ds, self.model.W, self.model.b,
                            self.model.classes, self.config.log1p,
                        ),
                    }
                )
        else:
            self.model = fit_logreg(ds, self.config, val_ds=val_ds)
        return self

    def get_weights(self) -> pd.DataFrame:
        """Wide (classes x features) frame with attrs['method_name'] —
        byte-for-byte the reference's result shape
        (_simple_logreg_model.py:170-192)."""
        if self.model is None:
            raise RuntimeError("call fit() first")
        return self.model.weights_wide()

    def get_weights_tall(self):
        if self.model is None:
            raise RuntimeError("call fit() first")
        return self.model.weights_tall()

    def _relabeled(self, ds: Dataset) -> Dataset:
        """Normalize ``label_column`` to the engine's canonical 'source'
        column. A pre-existing unrelated 'source' column is dropped first
        (renaming over it would create duplicate column names)."""
        if self.label_column == "source":
            return ds

        def fix(b, c=self.label_column):
            if "source" in b.column_names:
                b = b.drop_columns(["source"])
            return b.rename_columns(
                [("source" if n == c else n) for n in b.column_names]
            )

        return ds.map_batches(fix, batch_format="pyarrow")

    def write_artifacts(self, out_dir: str) -> dict:
        """Persist the training data products as Parquet (the S7 sink
        surface — the data behind the reference's figures, emitted as
        tables instead of matplotlib output):

        - ``losses.parquet`` (step, loss) — the plot_losses training curve
          (_simple_logreg_model.py:194-223)
        - ``val_history.parquet`` — per-epoch validation loss/accuracy/F1
          (the plot's right panel), written only when fit() ran with a
          val set
        - ``scores_heatmap.parquet`` — the plot_heatmaps pivot
          (/root/reference/modlyn/eval/_jaccard.py:145-172): the wide
          classes×features frame with BOTH axes sorted (K2), class as the
          first column. Suited to the reference's vocab scale; at huge
          vocab use get_weights_tall() instead.
        """
        import os

        if self.model is None:
            raise RuntimeError("call fit() first")
        os.makedirs(out_dir, exist_ok=True)
        paths = {
            "losses": os.path.join(out_dir, "losses.parquet"),
            "scores_heatmap": os.path.join(out_dir, "scores_heatmap.parquet"),
        }
        pd.DataFrame(
            {
                "step": range(len(self.model.losses)),
                "loss": self.model.losses,
            }
        ).to_parquet(paths["losses"], index=False)
        if self.model.val_history:
            paths["val_history"] = os.path.join(out_dir, "val_history.parquet")
            pd.DataFrame(self.model.val_history).to_parquet(
                paths["val_history"], index=False
            )
        wide = self.model.weights_wide().sort_index().sort_index(axis=1)
        wide.columns = [str(c) for c in wide.columns]
        wide.reset_index(names="class").to_parquet(
            paths["scores_heatmap"], index=False
        )
        return paths

    def plot_losses(self, path: str | None = None, **kw) -> bytes:
        """Two-panel train/val loss figure as PNG bytes — the reference's
        plot_losses (_simple_logreg_model.py:194-223) rendered headless."""
        if self.model is None:
            raise RuntimeError("call fit() first")
        from modlyn_ray import plotting

        vh = self.model.val_history or []
        return plotting.plot_losses(
            list(range(len(self.model.losses))),
            self.model.losses,
            [h["step"] for h in vh],
            [h["val_loss"] for h in vh],
            path=path,
            **kw,
        )

    def plot_classification_report(
        self, ds: Dataset | None = None, path: str | None = None, **kw
    ) -> bytes:
        """Per-class Recall/Precision/F1 + random-baseline bars as PNG
        bytes (_simple_logreg_model.py:225-275; metrics from the train
        encoder via evaluate(), never a refit)."""
        from modlyn_ray import plotting

        m = self.evaluate(ds)
        classes = self.model.classes
        per = m["per_class"]
        return plotting.plot_classification_report(
            classes,
            [per[c]["recall"] for c in classes],
            [per[c]["precision"] for c in classes],
            [per[c]["f1"] for c in classes],
            label_column=self.label_column,
            path=path,
            **kw,
        )

    def evaluate(self, ds: Dataset | None = None) -> dict:
        """Accuracy / macro + weighted F1 / per-class P-R-F1 on a dataset
        (train encoder reused — never refit). Works with any
        ``label_column`` — the same rename applied at fit() time is applied
        here (ADVICE r1: evaluate() used to crash when label_column !=
        'source')."""
        if self.model is None:
            raise RuntimeError("call fit() first")
        scored = predict(self._relabeled(ds if ds is not None else self.ds), self.model)
        cm = confusion_matrix(scored, self.model.classes)
        return classification_metrics(cm, self.model.classes)


class CompareScores:
    """Reference eval surface (/root/reference/modlyn/eval/_jaccard.py:9-23):
    wide frames in, tidy Jaccard comparison out."""

    def __init__(self, dataframes: list[pd.DataFrame], n_top_values: list[int] | None = None):
        if n_top_values is None:
            n_top_values = [25, 50, 100, 200]  # _jaccard.py:19-20
        self.dataframes = dataframes
        self.n_top_values = n_top_values
        self.results_df: pd.DataFrame | None = None

    def compute_jaccard_comparison(self) -> pd.DataFrame:
        from modlyn_ray import oracle

        names = [df.attrs["method_name"] for df in self.dataframes]
        if len(set(names)) != len(names):
            # a dict would silently keep only the LAST frame per name and
            # the pairwise comparison would quietly vanish
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(
                f"CompareScores: duplicate method_name(s) {dupes} — set a "
                "distinct df.attrs['method_name'] per frame"
            )
        frames = {df.attrs["method_name"]: df for df in self.dataframes}
        self.results_df = oracle.jaccard_comparison(frames, self.n_top_values)
        return self.results_df

    def jaccard_grouped_means(self) -> pd.DataFrame:
        """The data product behind the reference's plot_jaccard_comparison
        (/root/reference/modlyn/eval/_jaccard.py:92-96): mean jaccard per
        (n_top, method_pair), pairs as columns. The engine emits the table
        instead of the matplotlib figure (SURVEY §2.1 S7)."""
        if self.results_df is None:
            self.compute_jaccard_comparison()
        return (
            self.results_df.groupby(["n_top", "method_pair"])["jaccard"]
            .mean()
            .unstack()
        )

    def write_artifacts(self, out_dir: str) -> dict:
        """Persist the eval data products as Parquet (the S7 sink surface):
        ``results.parquet`` (tidy frame) + ``grouped_means.parquet``
        (plot_jaccard_comparison table, n_top as a column)."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        if self.results_df is None:
            self.compute_jaccard_comparison()
        paths = {
            "results": os.path.join(out_dir, "results.parquet"),
            "grouped_means": os.path.join(out_dir, "grouped_means.parquet"),
        }
        self.results_df.to_parquet(paths["results"], index=False)
        self.jaccard_grouped_means().reset_index().to_parquet(
            paths["grouped_means"], index=False
        )
        return paths

    def plot_jaccard_comparison(self, path: str | None = None, **kw) -> bytes:
        """Grouped mean-Jaccard bars by (n_top, method_pair) as PNG bytes
        (_jaccard.py:84-143 rendered headless)."""
        from modlyn_ray import plotting

        if self.results_df is None:
            self.compute_jaccard_comparison()
        return plotting.plot_jaccard_comparison(self.results_df, path=path, **kw)

    def plot_heatmaps(self, path: str | None = None, **kw) -> bytes:
        """Side-by-side viridis heatmaps on a shared color scale as PNG
        bytes (_jaccard.py:145-172 rendered headless)."""
        from modlyn_ray import plotting

        return plotting.plot_heatmaps(self.dataframes, path=path, **kw)

    def compute_jaccard_comparison_distributed(self) -> pd.DataFrame:
        """Same semantics over tall Datasets (for vocab sizes where wide
        frames don't fit a driver)."""
        import numpy as np
        import pyarrow as pa

        from modlyn_ray.eval.jaccard import compute_jaccard_comparison

        talls = []
        for df in self.dataframes:
            long = df.reset_index(names="class").melt(
                id_vars="class", var_name="token_id", value_name="score"
            )
            long["token_id"] = long["token_id"].astype(np.int32)
            long["method"] = df.attrs["method_name"]
            talls.append(pa.Table.from_pandas(long, preserve_index=False))
        self.results_df = compute_jaccard_comparison(talls, self.n_top_values)
        return self.results_df
