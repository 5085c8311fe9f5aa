"""Headless figure rendering for the reference's four plot surfaces.

The reference renders matplotlib figures (S7):

- ``plot_losses``            /root/reference/modlyn/models/_simple_logreg_model.py:194-223
- ``plot_classification_report``  _simple_logreg_model.py:225-275
- ``plot_jaccard_comparison``     /root/reference/modlyn/eval/_jaccard.py:84-143
- ``plot_heatmaps``               _jaccard.py:145-172

This sandbox has no matplotlib/PIL, so the engine ships its own tiny
rasterizer: numpy RGB canvas + Bresenham lines + a 5x7 bitmap font,
encoded with the in-repo stdlib PNG writer
(:func:`modlyn_ray.stages.codecs.encode_png`).  The goal is parity of
INFORMATION (same series, same grouping, same shared color scale), not
pixel-parity with matplotlib; every figure's underlying table also
persists as Parquet via the ``write_artifacts`` sinks, which remain the
canonical data products.

Rendering is deterministic: same inputs -> byte-identical PNG.
"""

from __future__ import annotations

import numpy as np

from modlyn_ray.stages.codecs import encode_png

# ---------------------------------------------------------------- font

# 5x7 bitmap glyphs; each glyph is 7 rows of 5-bit masks (MSB = left).
_GLYPHS: dict[str, tuple[int, ...]] = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    " ": (0, 0, 0, 0, 0, 0, 0),
    ".": (0, 0, 0, 0, 0, 0x0C, 0x0C),
    "-": (0, 0, 0, 0x1F, 0, 0, 0),
    "_": (0, 0, 0, 0, 0, 0, 0x1F),
    ":": (0, 0x0C, 0x0C, 0, 0x0C, 0x0C, 0),
    "%": (0x19, 0x19, 0x02, 0x04, 0x08, 0x13, 0x13),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
    ",": (0, 0, 0, 0, 0x0C, 0x04, 0x08),
    "=": (0, 0, 0x1F, 0, 0x1F, 0, 0),
    "?": (0x0E, 0x11, 0x01, 0x02, 0x04, 0, 0x04),
}

# sampled stops of the public-domain viridis colormap (16 of the 256
# entries of the published table), lerped between stops at render time
_VIRIDIS = np.array(
    [
        (68, 1, 84), (72, 26, 108), (71, 47, 125), (65, 68, 135),
        (57, 86, 140), (49, 104, 142), (42, 120, 142), (35, 136, 142),
        (31, 152, 139), (34, 168, 132), (53, 183, 121), (84, 197, 104),
        (122, 209, 81), (165, 219, 54), (210, 226, 27), (253, 231, 37),
    ],
    dtype=np.float64,
)

# series colors follow the reference's choices where it states them
# ('b-' train / 'r-' val); bar palettes use matplotlib's default cycle
BLUE = (31, 119, 180)
RED = (214, 39, 40)
PALETTE = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207),
]
_GRID = (224, 224, 224)
_AXIS = (60, 60, 60)
_TEXT = (20, 20, 20)


def viridis(v: np.ndarray) -> np.ndarray:
    """Map values in [0, 1] -> uint8 RGB via the sampled viridis stops."""
    v = np.clip(np.nan_to_num(np.asarray(v, dtype=np.float64), nan=0.0), 0.0, 1.0)
    pos = v * (len(_VIRIDIS) - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, len(_VIRIDIS) - 1)
    frac = (pos - lo)[..., None]
    rgb = _VIRIDIS[lo] * (1.0 - frac) + _VIRIDIS[hi] * frac
    return np.round(rgb).astype(np.uint8)


class Canvas:
    """Minimal RGB raster canvas (white background)."""

    def __init__(self, width: int, height: int):
        self.w = int(width)
        self.h = int(height)
        self.img = np.full((self.h, self.w, 3), 255, dtype=np.uint8)

    # -- primitives ----------------------------------------------------
    def fill_rect(self, x0: int, y0: int, x1: int, y1: int, color) -> None:
        x0, x1 = sorted((int(x0), int(x1)))
        y0, y1 = sorted((int(y0), int(y1)))
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, self.w - 1), min(y1, self.h - 1)
        if x0 > x1 or y0 > y1:
            return
        self.img[y0 : y1 + 1, x0 : x1 + 1] = color

    def line(self, x0: float, y0: float, x1: float, y1: float, color) -> None:
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.round(np.linspace(x0, x1, n)).astype(np.int64)
        ys = np.round(np.linspace(y0, y1, n)).astype(np.int64)
        ok = (xs >= 0) & (xs < self.w) & (ys >= 0) & (ys < self.h)
        self.img[ys[ok], xs[ok]] = color

    def polyline(self, xs, ys, color) -> None:
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        for i in range(len(xs) - 1):
            self.line(xs[i], ys[i], xs[i + 1], ys[i + 1], color)

    def text(self, x: int, y: int, s: str, color=_TEXT, scale: int = 1) -> None:
        """Top-left anchored 5x7 text; lowercase is uppercased; unknown
        glyphs render as '?'."""
        cx = int(x)
        for ch in str(s).upper():
            rows = _GLYPHS.get(ch, _GLYPHS["?"])
            for ry, mask in enumerate(rows):
                for rx in range(5):
                    if mask & (1 << (4 - rx)):
                        self.fill_rect(
                            cx + rx * scale,
                            int(y) + ry * scale,
                            cx + rx * scale + scale - 1,
                            int(y) + ry * scale + scale - 1,
                            color,
                        )
            cx += 6 * scale

    def text_w(self, s: str, scale: int = 1) -> int:
        return 6 * scale * len(str(s))

    def blit(self, x: int, y: int, block: np.ndarray) -> None:
        h, w = block.shape[:2]
        self.img[int(y) : int(y) + h, int(x) : int(x) + w] = block

    def to_png(self) -> bytes:
        return encode_png(self.img)


def _fmt(v: float) -> str:
    if not np.isfinite(v):
        return "NAN"
    a = abs(v)
    if a != 0 and (a >= 1e5 or a < 1e-3):
        return f"{v:.1e}"
    if a >= 100 or float(v).is_integer():
        return f"{v:.0f}"
    if a >= 1:
        return f"{v:.2f}"
    return f"{v:.3f}"


def _nice_ticks(lo: float, hi: float, n: int = 5) -> np.ndarray:
    if not np.isfinite(lo) or not np.isfinite(hi):
        lo, hi = 0.0, 1.0
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(n, 1)
    mag = 10.0 ** np.floor(np.log10(raw))
    step = next(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    t0 = np.ceil(lo / step) * step
    return np.arange(t0, hi + step * 0.5, step)


class _Axes:
    """A framed plot region with linear data->pixel mapping and ticks."""

    def __init__(self, cv: Canvas, px0, py0, px1, py1, xlim, ylim):
        self.cv = cv
        self.px0, self.py0, self.px1, self.py1 = px0, py0, px1, py1
        self.xlo, self.xhi = xlim
        self.ylo, self.yhi = ylim
        if self.xhi <= self.xlo:
            self.xhi = self.xlo + 1.0
        if self.yhi <= self.ylo:
            self.yhi = self.ylo + 1.0

    def xpix(self, x):
        return self.px0 + (np.asarray(x, dtype=np.float64) - self.xlo) / (
            self.xhi - self.xlo
        ) * (self.px1 - self.px0)

    def ypix(self, y):
        return self.py1 - (np.asarray(y, dtype=np.float64) - self.ylo) / (
            self.yhi - self.ylo
        ) * (self.py1 - self.py0)

    def frame(self, grid_y: bool = True, yticks=None):
        cv = self.cv
        if yticks is None:
            yticks = _nice_ticks(self.ylo, self.yhi)
        for t in yticks:
            if not (self.ylo <= t <= self.yhi):
                continue
            py = int(self.ypix(t))
            if grid_y:
                cv.line(self.px0 + 1, py, self.px1 - 1, py, _GRID)
            lbl = _fmt(float(t))
            cv.text(self.px0 - cv.text_w(lbl) - 4, py - 3, lbl, _AXIS)
        cv.line(self.px0, self.py0, self.px0, self.py1, _AXIS)
        cv.line(self.px0, self.py1, self.px1, self.py1, _AXIS)
        cv.line(self.px1, self.py0, self.px1, self.py1, _AXIS)
        cv.line(self.px0, self.py0, self.px1, self.py0, _AXIS)

    def xticks(self, values, labels=None):
        cv = self.cv
        labels = [_fmt(float(v)) for v in values] if labels is None else labels
        for v, lbl in zip(values, labels):
            px = int(self.xpix(v))
            cv.line(px, self.py1, px, self.py1 + 3, _AXIS)
            cv.text(px - cv.text_w(lbl) // 2, self.py1 + 6, str(lbl), _AXIS)


def _panel(cv, px0, py0, px1, py1, xs, ys, color, title, xlabel, ylabel):
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    ylo, yhi = float(ys.min()), float(ys.max())
    pad = (yhi - ylo) * 0.05 or max(abs(yhi), 1.0) * 0.05
    ax = _Axes(
        cv, px0, py0, px1, py1,
        (float(xs.min()), float(xs.max())),
        (ylo - pad, yhi + pad),
    )
    ax.frame()
    ax.xticks(_nice_ticks(ax.xlo, ax.xhi, 5)[:: 1])
    cv.polyline(ax.xpix(xs), ax.ypix(ys), color)
    cv.text((px0 + px1) // 2 - cv.text_w(title) // 2, py0 - 14, title)
    cv.text((px0 + px1) // 2 - cv.text_w(xlabel) // 2, py1 + 18, xlabel, _AXIS)
    cv.text(px0 - 40, py0 - 14, ylabel, _AXIS)


def plot_losses(
    train_steps,
    train_losses,
    val_steps=None,
    val_losses=None,
    *,
    path: str | None = None,
    size: tuple[int, int] = (960, 380),
) -> bytes:
    """Two-panel loss figure (train blue, validation red) mirroring the
    reference's plot_losses (_simple_logreg_model.py:194-223)."""
    w, h = size
    cv = Canvas(w, h)
    has_val = val_losses is not None and len(val_losses) > 0
    mid = w // 2
    _panel(
        cv, 70, 40, (mid - 30) if has_val else (w - 30), h - 50,
        train_steps, train_losses, BLUE,
        "TRAINING LOSS OVER STEPS", "TRAINING STEPS", "LOSS",
    )
    if has_val:
        _panel(
            cv, mid + 55, 40, w - 30, h - 50,
            val_steps, val_losses, RED,
            "VALIDATION LOSS OVER STEPS", "VALIDATION STEPS", "LOSS",
        )
    png = cv.to_png()
    if path:
        with open(path, "wb") as f:
            f.write(png)
    return png


def _grouped_bars(
    cv: Canvas,
    px0, py0, px1, py1,
    group_labels: list[str],
    series: dict[str, list[float]],
    *,
    ymax: float | None = None,
    value_labels: bool = False,
    xlabel: str = "",
    ylabel: str = "",
    title: str = "",
):
    n_groups = len(group_labels)
    n_series = max(len(series), 1)
    vals = np.array([v for vs in series.values() for v in vs], dtype=np.float64)
    top = float(np.nanmax(vals)) if vals.size else 1.0
    if ymax is None:
        ymax = top * 1.15 or 1.0
    ax = _Axes(cv, px0, py0, px1, py1, (0.0, float(n_groups)), (0.0, ymax))
    ax.frame()
    slot = (px1 - px0) / max(n_groups, 1)
    bar_w = max(int(slot * 0.8 / n_series), 2)
    for si, (name, vs) in enumerate(series.items()):
        color = PALETTE[si % len(PALETTE)]
        for gi, v in enumerate(vs):
            if v is None or not np.isfinite(v):
                continue
            gx = px0 + slot * gi + slot * 0.1 + si * bar_w
            ytop = int(ax.ypix(v))
            cv.fill_rect(int(gx), ytop, int(gx) + bar_w - 1, py1 - 1, color)
            if value_labels:
                lbl = f"{v:.2f}"
                cv.text(
                    int(gx + bar_w / 2) - cv.text_w(lbl) // 2,
                    max(ytop - 10, py0 + 1),
                    lbl,
                    _TEXT,
                )
    for gi, lbl in enumerate(group_labels):
        px = int(px0 + slot * gi + slot / 2)
        s = str(lbl)[:12]
        cv.text(px - cv.text_w(s) // 2, py1 + 6, s, _AXIS)
    # legend, one row per series on the right margin
    ly = py0
    for si, name in enumerate(series):
        color = PALETTE[si % len(PALETTE)]
        cv.fill_rect(px1 + 8, ly, px1 + 20, ly + 8, color)
        cv.text(px1 + 24, ly, str(name)[:22], _TEXT)
        ly += 14
    cv.text((px0 + px1) // 2 - cv.text_w(title) // 2, py0 - 16, title)
    cv.text((px0 + px1) // 2 - cv.text_w(xlabel) // 2, py1 + 18, xlabel, _AXIS)
    cv.text(px0 - 50, py0 - 16, ylabel, _AXIS)


def plot_classification_report(
    class_names,
    recalls,
    precisions,
    f1s,
    *,
    label_column: str = "source",
    path: str | None = None,
    size: tuple[int, int] = (900, 420),
) -> bytes:
    """Grouped per-class Recall/Precision/F1 bars + the 1/n random
    baseline, mirroring _simple_logreg_model.py:252-275."""
    n = len(class_names)
    series = {
        "RECALL": list(map(float, recalls)),
        "PRECISION": list(map(float, precisions)),
        "F1 SCORE": list(map(float, f1s)),
        "RANDOM BASELINE": [1.0 / max(n, 1)] * n,
    }
    w, h = size
    cv = Canvas(w, h)
    _grouped_bars(
        cv, 80, 46, w - 170, h - 60,
        [str(c) for c in class_names], series,
        ymax=1.05, xlabel=label_column.upper(), ylabel="SCORE",
        title=f"PERFORMANCE BY {label_column.upper()}",
    )
    png = cv.to_png()
    if path:
        with open(path, "wb") as f:
            f.write(png)
    return png


def plot_jaccard_comparison(
    results_df,
    *,
    path: str | None = None,
    size: tuple[int, int] = (980, 420),
) -> bytes:
    """Grouped mean-Jaccard bars by (n_top, method_pair) with value labels,
    mirroring _jaccard.py:84-143 (tidy frame in, one bar group per n_top)."""
    bar_data = (
        results_df.groupby(["n_top", "method_pair"])["jaccard"].mean().unstack()
    )
    n_tops = sorted(results_df["n_top"].unique())
    series = {
        str(pair): [float(bar_data.loc[nt, pair]) for nt in n_tops]
        for pair in bar_data.columns
    }
    w, h = size
    cv = Canvas(w, h)
    _grouped_bars(
        cv, 80, 46, w - 210, h - 60,
        [str(nt) for nt in n_tops], series,
        ymax=max(1.05, float(results_df["jaccard"].max()) * 1.15),
        value_labels=True,
        xlabel="NUMBER OF TOP FEATURES (N_TOP)", ylabel="JACCARD INDEX",
        title="JACCARD INDEX VS TOP-N FEATURES",
    )
    png = cv.to_png()
    if path:
        with open(path, "wb") as f:
            f.write(png)
    return png


def plot_heatmaps(
    dataframes,
    *,
    path: str | None = None,
    cell: int = 0,
    max_panel: int = 360,
) -> bytes:
    """Side-by-side viridis heatmaps of wide (classes x features) frames on
    a SHARED color scale with a colorbar, mirroring _jaccard.py:145-172
    (axes sorted, global vmin/vmax, one panel per method)."""
    dfs = [df.sort_index().sort_index(axis=1) for df in dataframes]
    names = [df.attrs.get("method_name", f"method{i}") for i, df in enumerate(dfs)]
    vmin = min(float(df.min().min()) for df in dfs)
    vmax = max(float(df.max().max()) for df in dfs)
    span = (vmax - vmin) or 1.0

    rendered = []
    for df in dfs:
        a = df.to_numpy(dtype=np.float64)
        norm = (a - vmin) / span
        rgb = viridis(norm)
        if cell <= 0:
            c = max(1, min(max_panel // max(a.shape[0], 1), max_panel // max(a.shape[1], 1)))
        else:
            c = cell
        rendered.append(np.repeat(np.repeat(rgb, c, axis=0), c, axis=1))

    # row labels (class names) when the cells are tall enough to align with
    row_labels = [str(i)[:8] for i in dfs[0].index]
    cell_h = rendered[0].shape[0] // max(len(dfs[0].index), 1)
    label_w = (max(6 * len(s) for s in row_labels) + 8) if cell_h >= 8 else 0

    gap, top, bottom, left = 24, 40, 16, 16 + label_w
    cbar_w = 70
    ph = max(r.shape[0] for r in rendered)
    w = left + sum(r.shape[1] + gap for r in rendered) + cbar_w + 40
    h = top + ph + bottom
    cv = Canvas(w, h)
    if label_w:
        for ri, s in enumerate(row_labels):
            cv.text(16, top + ri * cell_h + cell_h // 2 - 3, s, _AXIS)
    x = left
    for r, name in zip(rendered, names):
        cv.blit(x, top, r)
        cv.text(x + r.shape[1] // 2 - cv.text_w(str(name)[:20]) // 2, top - 14, str(name)[:20])
        x += r.shape[1] + gap
    # shared colorbar: vmax at the top, vmin at the bottom
    strip = viridis(np.linspace(1.0, 0.0, ph))[:, None, :]
    cv.blit(x, top, np.repeat(strip, 14, axis=1))
    cv.text(x + 18, top, _fmt(vmax), _AXIS)
    cv.text(x + 18, top + ph - 7, _fmt(vmin), _AXIS)
    png = cv.to_png()
    if path:
        with open(path, "wb") as f:
            f.write(png)
    return png


def render_losses_from_artifacts(art_dir: str, path: str) -> bytes:
    """Re-render the losses figure from the persisted S7 artifact parquet
    (losses.parquet + optional val_history.parquet) — the resume path for
    ``cli logreg --plots`` when the training stage did not re-run."""
    import os

    import pandas as pd

    losses = pd.read_parquet(os.path.join(art_dir, "losses.parquet"))
    vh_path = os.path.join(art_dir, "val_history.parquet")
    vs, vl = None, None
    if os.path.exists(vh_path):
        vh = pd.read_parquet(vh_path)
        if "val_loss" in vh.columns:
            vs, vl = vh["step"].tolist(), vh["val_loss"].tolist()
    return plot_losses(
        losses["step"].tolist(), losses["loss"].tolist(), vs, vl, path=path
    )
