"""Metric-CSV post-processing and comparison plots (reference: graphs.py —
C20 in SURVEY.md §2): rolling mean/std of per-lambda metric curves, ROC CSV
assembly/downsampling, and dice comparison figures.

CLI: ``python -m anoddpm_tpu.graphs <csv...> [--window N] [--out DIR]``.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Sequence

import numpy as np
import pandas as pd


def rolling_mean_std(csv_path: str, window: int = 8,
                     out_path: str = None) -> pd.DataFrame:
    """Per-lambda rolling mean/std of a metric CSV
    (graphs.py:25-57 `conv_csv_2_mu_std`)."""
    df = pd.read_csv(csv_path)
    numeric = df.select_dtypes("number")
    out = pd.DataFrame(index=df.index)
    for col in numeric.columns:
        out[f"{col}_mu"] = numeric[col].rolling(window, min_periods=1).mean()
        out[f"{col}_std"] = numeric[col].rolling(window, min_periods=1).std().fillna(0)
    if out_path:
        out.to_csv(out_path, index=False)
    return out


def reduce_quality(fpr: np.ndarray, tpr: np.ndarray,
                   max_points: int = 200) -> tuple:
    """Downsample an ROC curve to <= max_points while keeping endpoints
    (graphs.py:189-233)."""
    n = len(fpr)
    if n <= max_points:
        return fpr, tpr
    idx = np.unique(np.r_[0, np.linspace(0, n - 1, max_points).astype(int),
                          n - 1])
    return fpr[idx], tpr[idx]


def make_roc_csv(curves: dict, out_path: str, max_points: int = 200) -> None:
    """Assemble named ROC curves into one CSV (graphs.py:60-97): columns
    <name>_fpr, <name>_tpr per method."""
    cols = {}
    longest = 0
    reduced = {}
    for name, (fpr, tpr) in curves.items():
        f, t = reduce_quality(np.asarray(fpr), np.asarray(tpr), max_points)
        reduced[name] = (f, t)
        longest = max(longest, len(f))
    for name, (f, t) in reduced.items():
        pad = longest - len(f)
        cols[f"{name}_fpr"] = np.r_[f, np.full(pad, np.nan)]
        cols[f"{name}_tpr"] = np.r_[t, np.full(pad, np.nan)]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pd.DataFrame(cols).to_csv(out_path, index=False)


def graph_dice_comparison(csvs: Sequence[str], labels: Sequence[str],
                          out_path: str, column: str = "dice",
                          window: int = 8) -> None:
    """Dice-vs-lambda comparison plot across experiments
    (graphs.py:100-186)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure(dpi=150)
    for path, label in zip(csvs, labels):
        df = pd.read_csv(path)
        if column not in df.columns:
            continue
        mu = df[column].rolling(window, min_periods=1).mean()
        std = df[column].rolling(window, min_periods=1).std().fillna(0)
        x = df["t"] if "t" in df.columns else np.arange(len(df))
        plt.plot(x, mu, label=label)
        plt.fill_between(x, mu - std, mu + std, alpha=0.2)
    plt.xlabel("$\\lambda$")
    plt.ylabel(column)
    plt.legend()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.savefig(out_path, bbox_inches="tight")
    plt.close("all")


def main(argv: List[str] = None):
    p = argparse.ArgumentParser()
    p.add_argument("csvs", nargs="+")
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--out", default="final-outputs")
    p.add_argument("--column", default="dice")
    ns = p.parse_args(argv)
    os.makedirs(ns.out, exist_ok=True)
    for path in ns.csvs:
        stem = os.path.splitext(os.path.basename(path))[0]
        rolling_mean_std(path, ns.window,
                         os.path.join(ns.out, f"{stem}-mu-std.csv"))
    graph_dice_comparison(ns.csvs, [os.path.basename(c) for c in ns.csvs],
                          os.path.join(ns.out, "dice-comparison.png"),
                          column=ns.column, window=ns.window)


if __name__ == "__main__":
    main()
