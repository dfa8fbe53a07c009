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


def breakdown(dense_log: Dict, env=None):
    """Summary figure from a dense log: coin/labor trajectories + rewards
    (tutorials/utils/plotting.py:271-444 analog)."""
    assert HAVE_MPL, "matplotlib unavailable"
    states = dense_log["states"]
    rewards = dense_log["rewards"]
    T = len(states)
    agent_ids = [k for k in states[0].keys()]
    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    for aid in agent_ids:
        coin = [states[t][aid]["inventory"].get("Coin", 0)
                + states[t][aid]["escrow"].get("Coin", 0) for t in range(T)]
        axes[0].plot(coin, label=aid)
        labor = [states[t][aid]["endogenous"].get("Labor", 0) for t in range(T)]
        axes[1].plot(labor, label=aid)
        rew = np.cumsum([rewards[t].get(aid, 0.0) for t in range(T)])
        axes[2].plot(rew, label=aid)
    for ax, title in zip(axes, ["Coin endowment", "Labor", "Cumulative reward"]):
        ax.set_title(title)
        ax.set_xlabel("timestep")
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    return fig
