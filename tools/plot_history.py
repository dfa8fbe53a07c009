"""Plot learning curves from a run dir's history.jsonl -> curves.png.

Usage: python tools/plot_history.py <run_dir> [metric ...]

Defaults to reward_a_mean + reward_p_mean. One panel per metric family so
scales never share an axis (no dual-axis charts); series colors follow the
fixed categorical slot order of a CVD-validated palette; 2px lines,
recessive grid, text in neutral ink.
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Validated categorical slots (light surface), fixed assignment order.
SLOTS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
INK = "#3d3d3a"
MUTED = "#8a897f"


def main():
    run_dir = sys.argv[1]
    metrics = sys.argv[2:] or ["reward_a_mean", "reward_p_mean"]
    rows = []
    with open(os.path.join(run_dir, "history.jsonl")) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    rows.sort(key=lambda r: r["iteration"])
    it = [r["iteration"] for r in rows]

    present = [m for m in metrics if any(m in r for r in rows)]
    fig, axes = plt.subplots(
        1, len(present), figsize=(5.4 * len(present), 3.4), squeeze=False
    )
    for ax, (i, m) in zip(axes[0], enumerate(present)):
        ys = [r.get(m) for r in rows]
        ax.plot(it, ys, color=SLOTS[i % len(SLOTS)], linewidth=2)
        ax.set_title(m, color=INK, fontsize=11)
        ax.set_xlabel("iteration", color=MUTED, fontsize=9)
        ax.grid(True, color="#e8e6dc", linewidth=0.75)
        ax.tick_params(colors=MUTED, labelsize=8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(MUTED)
    fig.suptitle(os.path.basename(os.path.abspath(run_dir)), color=INK, fontsize=12)
    fig.tight_layout()
    out = os.path.join(run_dir, "curves.png")
    fig.savefig(out, dpi=110)
    print(out)


if __name__ == "__main__":
    main()
