"""Visualization: world-map rendering and dense-log breakdowns.

Capabilities of the reference's tutorials/utils/plotting.py:13-444 (plot_map,
plot_env_state, trade/build charts, dense-log breakdown) for the TPU engine's
EnvState / dense logs. Matplotlib only; all inputs are host numpy.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    import matplotlib.pyplot as plt
    from matplotlib import colors as mcolors

    HAVE_MPL = True
except ModuleNotFoundError:  # headless-safe
    plt = None
    HAVE_MPL = False

from ai_economist_tpu.core import world as W
from ai_economist_tpu.core.entities import landmark_registry, resource_registry


def _entity_color(name: str):
    if resource_registry.has(name):
        return resource_registry.get(name).color
    if landmark_registry.has(name):
        return landmark_registry.get(name).color
    return (0.5, 0.5, 0.5)


def render_world_rgb(env, state) -> np.ndarray:
    """[H, W, 3] float RGB image of the map + agents (plot_map analog)."""
    spec = env.world
    H, Wd = spec.height, spec.width
    img = np.ones((H, Wd, 3))
    for k in spec.map_keys:
        m = np.asarray(state.maps[k])
        col = np.asarray(_entity_color(k))
        mask = m > 0
        img[mask] = 0.35 * img[mask] + 0.65 * col
    loc = np.asarray(state.loc)
    agent_colors = plt.cm.tab10(np.linspace(0, 1, spec.n_agents))[:, :3] \
        if HAVE_MPL else np.tile([[1, 0, 0]], (spec.n_agents, 1))
    for i, (r, c) in enumerate(loc):
        if r >= 0:
            img[r, c] = agent_colors[i]
    return img


def plot_env_state(env, state, ax=None):
    """Render the current world state (plot_env_state analog)."""
    assert HAVE_MPL, "matplotlib unavailable"
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(render_world_rgb(env, state))
    ax.set_xticks([])
    ax.set_yticks([])
    ax.set_title(f"t = {int(state.t)}")
    return ax


def render_log_state_rgb(dense_log: Dict, t: int) -> np.ndarray:
    """[H, W, 3] RGB image from a dense-log world snapshot at viable step t
    (plot_log_state analog, tutorials/utils/plotting.py:101-120)."""
    world = dense_log["world"][t]
    assert world, f"no world snapshot at t={t}"
    keys = [k for k in world if not k.endswith("__owner")]
    H = len(world[keys[0]])
    Wd = len(world[keys[0]][0])
    img = np.ones((H, Wd, 3))
    for k in keys:
        m = np.asarray(world[k])
        col = np.asarray(_entity_color(k))
        mask = m > 0
        img[mask] = 0.35 * img[mask] + 0.65 * col
    states = dense_log["states"][min(t, len(dense_log["states"]) - 1)]
    n_agents = sum(1 for k in states if k.isdigit())
    colors = plt.cm.tab10(np.linspace(0, 1, n_agents))[:, :3] \
        if HAVE_MPL else np.tile([[1, 0, 0]], (n_agents, 1))
    for i in range(n_agents):
        r, c = states[str(i)]["loc"]
        if r >= 0:
            img[int(r), int(c)] = colors[i]
    return img


def plot_log_state(dense_log: Dict, t: int, ax=None):
    assert HAVE_MPL, "matplotlib unavailable"
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(render_log_state_rgb(dense_log, t))
    ax.set_xticks([])
    ax.set_yticks([])
    return ax


def _viable_ts(dense_log):
    return [i for i, w in enumerate(dense_log["world"]) if w]


def vis_world_array(dense_logs, ts, axes=None):
    """Grid of world snapshots: rows = episodes, cols = timesteps
    (tutorials/utils/plotting.py:139-174)."""
    assert HAVE_MPL, "matplotlib unavailable"
    if isinstance(dense_logs, dict):
        dense_logs = [dense_logs]
    if isinstance(ts, (int, float)):
        ts = [int(ts)]
    fig = None
    if axes is None:
        fig, axes = plt.subplots(
            len(dense_logs), len(ts),
            figsize=(min(3.2 * len(ts), 16), 3 * len(dense_logs)),
            squeeze=False,
        )
    for ei, log in enumerate(dense_logs):
        for ti, t in enumerate(ts):
            plot_log_state(log, t, ax=axes[ei][ti])
    for ax, t in zip(axes[0], ts):
        ax.set_title(f"T = {t}")
    return fig


def vis_world_range(dense_logs, t0=0, tN=None, N=5, axes=None):
    """N snapshots spanning [t0, tN], snapped to viable (logged) steps
    (tutorials/utils/plotting.py:176-194)."""
    logs = [dense_logs] if isinstance(dense_logs, dict) else list(dense_logs)
    viable = np.array(_viable_ts(logs[0]))
    assert viable.size, "dense log contains no world snapshots"
    if tN is None:
        tN = int(viable[-1])
    targets = np.linspace(t0, max(tN, t0 + 1), N).astype(int)
    ts = sorted({int(viable[np.argmin(np.abs(tt - viable))]) for tt in targets})
    return vis_world_array(logs, ts, axes=axes)


def vis_builds(dense_logs, ax=None):
    """Cumulative builds per episode (tutorials/utils/plotting.py:197-212)."""
    assert HAVE_MPL, "matplotlib unavailable"
    logs = [dense_logs] if isinstance(dense_logs, dict) else list(dense_logs)
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(16, 3))
    for ep, log in enumerate(logs):
        ax.plot(np.cumsum([len(b) for b in log["Build"]]), label=f"Ep {ep}")
    ax.legend()
    ax.grid(True)
    ax.set_ylim(bottom=0)
    return ax


# ----------------------------------------------------------------------
# Income report strings (tutorials/utils/plotting.py:214-268)
# ----------------------------------------------------------------------
def _trade_str(c_trades, resource, agent, income=True):
    side, key = ("seller", "income") if income else ("buyer", "cost")
    # A resource with zero executed trades has no key in c_trades.
    p = [x[key] for x in c_trades.get(resource, []) if x[side] == agent]
    if p:
        return "{:6.2f} (n={:3d})".format(np.mean(p), len(p))
    return " " * 3 + "~" * 8 + " " * 3


def _build_str(all_builds, agent):
    p = [x["income"] for x in all_builds if x["builder"] == agent]
    if p:
        return "{:6.2f} (n={:3d})".format(np.mean(p), len(p))
    return " " * 3 + "~" * 8 + " " * 3


def report(c_trades, all_builds, n_agents, resources=("Wood", "Stone")) -> str:
    """Text income/cost table per agent (plotting.py:257-268); returns the
    string instead of printing."""
    lines = ["_" * 15 + ":_" + "_|_".join(
        f" Agent {i:2d} ____" for i in range(n_agents))]
    if c_trades is not None:
        for income in (False, True):
            for r in resources:
                head = "{} ({})".format("Income" if income else "Cost", r)
                row = " | ".join(
                    _trade_str(c_trades, r, i, income) for i in range(n_agents))
                lines.append(f"{head:<15}: {row}")
    row = " | ".join(_build_str(all_builds, i) for i in range(n_agents))
    lines.append(f"{'Income (Build)':<15}: {row}")
    return "\n".join(lines)


def collate_events(dense_log: Dict):
    """Flatten Build/Trade event streams with timestamps
    (plotting.py:285-310). Returns (all_builds, c_trades|None)."""
    all_builds = []
    for t, builds in enumerate(dense_log.get("Build", [])):
        for b in builds:
            all_builds.append({"t": t, **b})
    c_trades = None
    if "Trade" in dense_log:
        c_trades = {}
        for t, trades in enumerate(dense_log["Trade"]):
            for tr in trades:
                rec = {"t": t, "t_ask": t - tr["ask_lifetime"],
                       "t_bid": t - tr["bid_lifetime"], **tr}
                c_trades.setdefault(tr["commodity"], []).append(rec)
    return all_builds, c_trades


def breakdown(dense_log: Dict, env=None):
    """Full dense-log breakdown (tutorials/utils/plotting.py:271-444):
    world-range snapshots, endowment/labor trajectories, movement traces,
    per-agent trade charts, and income/endowment summaries.

    Returns ((fig0, fig1, fig2), incomes, endows, c_trades, all_builds) like
    the reference. Figures are None when their inputs are missing (e.g. no
    world snapshots)."""
    assert HAVE_MPL, "matplotlib unavailable"
    states = dense_log["states"]
    T = len(states)
    n = sum(1 for k in states[0] if k.isdigit())

    fig0 = vis_world_range(dense_log) if _viable_ts(dense_log) else None

    all_builds, c_trades = collate_events(dense_log)
    incomes = {}
    if c_trades is not None:
        for r in sorted(c_trades):
            incomes[f"Sell {r}"] = [
                sum(x["income"] for x in c_trades[r] if x["seller"] == i)
                for i in range(n)]
            incomes[f"Buy {r}"] = [
                sum(-x["price"] for x in c_trades[r] if x["buyer"] == i)
                for i in range(n)]
    incomes["Build"] = [
        sum(b["income"] for b in all_builds if b["builder"] == i)
        for i in range(n)]
    incomes["Total"] = np.stack([np.asarray(v) for v in incomes.values()]).sum(
        axis=0).tolist()

    endows = [
        int(states[-1][str(i)]["inventory"].get("Coin", 0)
            + states[-1][str(i)]["escrow"].get("Coin", 0))
        for i in range(n)]

    # fig1: per-resource endowment + labor trajectories (plotting.py:358-384)
    cmap = plt.get_cmap("jet", n)
    rs = [r for r in ("Wood", "Stone", "Coin")
          if r in states[0]["0"]["inventory"]]
    fig1, axes = plt.subplots(1, len(rs) + 1, figsize=(16, 4))
    for r, ax in zip(rs, axes):
        for i in range(n):
            ax.plot([s[str(i)]["inventory"][r] + s[str(i)]["escrow"][r]
                     for s in states], label=i, color=cmap(i))
        ax.set_title(r)
        ax.legend()
        ax.grid(True)
    for i in range(n):
        axes[-1].plot([s[str(i)]["endogenous"].get("Labor", 0) for s in states],
                      label=i, color=cmap(i))
    axes[-1].set_title("Labor")
    axes[-1].grid(True)

    # fig2: movement traces + per-agent trade event charts (plotting.py:386-436)
    n_small = min(4, n)
    trading = c_trades is not None
    fig2, axes2 = plt.subplots(2 if trading else 1, n_small,
                               figsize=(16, 8 if trading else 4),
                               squeeze=False)
    for i in range(n_small):
        ax = axes2[0][i]
        rows = np.array([s[str(i)]["loc"][0] for s in states]) * -1
        cols = np.array([s[str(i)]["loc"][1] for s in states])
        ax.plot(cols[::20], rows[::20])
        ax.plot(cols[0], rows[0], "r*", markersize=15)
        ax.plot(cols[-1], rows[-1], "g*", markersize=15)
        ax.set_title(f"Agent {i}")
    if trading:
        for i in range(n_small):
            ax = axes2[1][i]
            for r in sorted(c_trades):
                col = _entity_color(r)
                sells = [(s["t"], s["income"]) for s in c_trades[r]
                         if s["seller"] == i]
                buys = [(s["t"], -s["cost"]) for s in c_trades[r]
                        if s["buyer"] == i]
                for evs in (sells, buys):
                    if evs:
                        ts, prices = (np.array(x) for x in zip(*evs))
                        ax.plot(np.stack([ts, ts]),
                                np.stack([np.zeros_like(prices), prices]),
                                color=col)
                        ax.plot(ts, prices, ".", color=col, markersize=12)
            ax.plot([-20, T + 19], [0, 0], "w-")
            ax.set_xlim([-20, T + 19])
            ax.grid(True)
            ax.set_facecolor([0.3, 0.3, 0.3])

    return (fig0, fig1, fig2), incomes, endows, c_trades, all_builds
