"""Offline loss/LR curve plotting from the chart JSON dumps
(reference visualize.py over *_chart_params.json)."""

from __future__ import annotations

import argparse
import os

from ..utils import load_json


def moving_average(numbers, window_size: int = 150):
    out = []
    for i in range(len(numbers) - window_size + 1):
        out.append(sum(numbers[i:i + window_size]) / window_size)
    return out


def cli():
    parser = argparse.ArgumentParser(description="plot training curves")
    parser.add_argument("-j", "--json", required=True, help="chart params json")
    parser.add_argument("-o", "--output", default="curves.png")
    parser.add_argument("-w", "--window", type=int, default=150)
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = load_json(args.json)
    fig, axes = plt.subplots(1, len(data), figsize=(6 * len(data), 4))
    if len(data) == 1:
        axes = [axes]
    for ax, (key, series) in zip(axes, data.items()):
        smooth = moving_average(series, min(args.window, max(len(series) // 2, 1)))
        ax.plot(series, alpha=0.3, label=key)
        ax.plot(range(len(series) - len(smooth), len(series)), smooth,
                label=f"{key} (smoothed)")
        ax.set_title(key)
        ax.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=100)
    print(f"saved {args.output}")


if __name__ == "__main__":
    cli()
