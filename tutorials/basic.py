"""Executable walkthrough: build, step, visualize, log, and train.

The runnable counterpart of the reference's tutorial notebooks
(tutorials/economic_simulation_basic.ipynb,
 tutorials/multi_agent_training_with_rllib.md): every section below is a
small, self-contained demonstration of the public API, and the whole file
runs end-to-end on CPU in a couple of minutes:

    python tutorials/basic.py [output_dir]

Sections
  1. build a gather-trade-build economy from a component spec
  2. reset and inspect the observation/mask structure
  3. step an episode with masked random actions
  4. render the world map to a PNG
  5. collect a dense log on device and break it down (figures + report)
  6. train two-level PPO for a few hundred iterations and plot the curve
  7. record an episode replay and play it back bit-identically

Environment knobs (for CI): TUTORIAL_ITERS overrides the number of
training iterations (default 200).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")

import jax

if os.environ.get("TUTORIAL_FORCE_CPU"):
    # For CI: the site hook on some boxes forces a TPU platform from
    # PYTHONPATH, so the shell-level JAX_PLATFORMS is not enough.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import ai_economist_tpu as aet

OUT = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else os.path.abspath(
    os.path.join(os.path.dirname(__file__), "basic_out"))
os.makedirs(OUT, exist_ok=True)
ITERS = int(os.environ.get("TUTORIAL_ITERS", "200"))


# ---------------------------------------------------------------------------
# 1. Build an economy.
#
# An env is a scenario (the world's passive dynamics + rewards) plus a list
# of components applied in order each step (reference base_env.py:929-1032).
# This is the gather-trade-build economy: move & collect resources, build
# houses for coin, trade through a continuous double auction, pay periodic
# bracketed taxes.
# ---------------------------------------------------------------------------
env = aet.make_env_instance(
    "uniform/simple_wood_and_stone",
    components=[
        ("Build", {"payment": 10}),
        ("ContinuousDoubleAuction", {"max_num_orders": 5}),
        ("Gather", {}),
        ("PeriodicBracketTax", {"period": 25}),
    ],
    n_agents=4,
    world_size=[15, 15],
    episode_length=50,
)
print(f"[1] built {env.scenario_name!r}: {env.n_agents} agents, "
      f"{env.world.height}x{env.world.width} world, "
      f"{env.agent_action_space.total_actions} flat agent actions, "
      f"{env.planner_action_space.n_subspaces} planner action subspaces")

# ---------------------------------------------------------------------------
# 2. Reset and inspect observations.
#
# reset_fresh(key) -> (state, obs). `state` is the full simulation pytree
# (everything lives in arrays; nothing is hidden in Python objects), and
# `obs` has one branch per policy: "a" (all mobile agents, leading axis
# n_agents) and "p" (the planner). Masks are part of the observation.
# ---------------------------------------------------------------------------
state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
print("[2] agent obs:", {k: tuple(v.shape) for k, v in obs["a"].items()})
print("    planner obs:", {k: tuple(v.shape) for k, v in obs["p"].items()})

# ---------------------------------------------------------------------------
# 3. Step an episode with masked random actions.
#
# Illegal actions are masked out of the categorical; action 0 is always the
# NO-OP. The whole step is one jitted function of (state, actions).
# ---------------------------------------------------------------------------
step = jax.jit(env.step)


def random_actions(key, obs):
    ka, kp = jax.random.split(key)
    logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
    acts = {"a": jax.random.categorical(ka, logits, axis=-1).astype(jnp.int32)}
    pl = env.planner_action_space
    if pl.n_subspaces:
        plog = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
        outs, off = [], 0
        for d in pl.action_dims:
            outs.append(jax.random.categorical(kp, plog[..., off:off + d], -1))
            off += d
        acts["p"] = jnp.stack(outs, axis=-1).astype(jnp.int32)
    return acts


key = jax.random.PRNGKey(1)
ep_rew = np.zeros(env.n_agents)
for t in range(env.episode_length):
    key, k = jax.random.split(key)
    state, obs, rew, done, _ = step(state, random_actions(k, obs))
    ep_rew += np.asarray(rew["a"])
assert bool(done)
print(f"[3] episode done; per-agent return under random actions: "
      f"{np.round(ep_rew, 2)}")

# ---------------------------------------------------------------------------
# 4. Render the world.
# ---------------------------------------------------------------------------
from ai_economist_tpu.utils import plotting

fig = plotting.plot_env_state(env, state)
path_map = os.path.join(OUT, "world.png")
fig.figure.savefig(path_map, dpi=90, bbox_inches="tight")
print(f"[4] world map rendered -> {path_map}")

# ---------------------------------------------------------------------------
# 5. Dense log + breakdown.
#
# DenseLogger records fixed-shape per-step snapshots inside a lax.scan (so
# logging is jit-compatible); decode() turns the stacked records into the
# reference's dense-log dict, which the plotting helpers consume
# (reference base_env.py:763-814, tutorials/utils/plotting.py).
# ---------------------------------------------------------------------------
from ai_economist_tpu.utils.logs import DenseLogger, save_episode_log

logger = DenseLogger(env, world_log_every=10)


def logged_episode(key):
    k0, key = jax.random.split(key)
    state, obs = env.reset_fresh(k0)

    def step_fn(carry, k):
        state, obs = carry
        acts = random_actions(k, obs)
        nstate, nobs, rew, done, _ = env.step(state, acts)
        return (nstate, nobs), logger.record(nstate, acts, rew)

    keys = jax.random.split(key, env.episode_length)
    _, recs = jax.lax.scan(step_fn, (state, obs), keys)
    return recs


recs = jax.jit(logged_episode)(jax.random.PRNGKey(2))
dense = logger.decode(jax.tree.map(np.asarray, recs))
save_episode_log(dense, os.path.join(OUT, "episode_log.lz4"))
figs, incomes, endows, c_trades, all_builds = plotting.breakdown(dense, env)
for i, f in enumerate(figs):
    if f is not None:
        f.savefig(os.path.join(OUT, f"breakdown_{i}.png"), dpi=80,
                  bbox_inches="tight")
print("[5] dense log ->", os.path.join(OUT, "episode_log.lz4"))
print(plotting.report(c_trades, all_builds, env.n_agents))
print("    final coin endowments:", endows)

# ---------------------------------------------------------------------------
# 6. Train.
#
# TwoLevelTrainer runs rollout + GAE + PPO epochs for both policies inside
# one jitted train_iteration, with env replicas vmapped (the RLlib
# two-policy PPO analog, tutorials/rllib/training_script.py:48-122). A few
# hundred iterations on CPU is enough to see returns move; real runs use
# training/run.py with a YAML config (training/configs/).
# ---------------------------------------------------------------------------
from ai_economist_tpu.training.ppo import PPOConfig
from ai_economist_tpu.training.trainer import TwoLevelTrainer

trainer = TwoLevelTrainer(
    env,
    num_envs=8,
    cfg=PPOConfig(rollout_len=10, epochs=1, lr=3e-4, entropy_coef=0.05),
    model=("mlp", "linear"),
    train_planner=False,
)
print(f"[6] training {ITERS} iterations (8 envs x rollout 10, MLP agents)…")
curve = []
ts, history = trainer.train(
    jax.random.PRNGKey(3), ITERS, log_every=max(1, ITERS // 20),
    callback=lambda it, m: curve.append((it, m["reward_a_mean"])),
)
xs, ys = zip(*curve)
import matplotlib.pyplot as plt

f, ax = plt.subplots(figsize=(6, 3.5))
ax.plot(xs, ys)
ax.set_xlabel("iteration")
ax.set_ylabel("mean agent rollout reward")
ax.set_title("tutorial training curve")
f.savefig(os.path.join(OUT, "training_curve.png"), dpi=90,
          bbox_inches="tight")
print(f"    reward {ys[0]:.3f} -> {ys[-1]:.3f}; curve -> "
      f"{os.path.join(OUT, 'training_curve.png')}")

# ---------------------------------------------------------------------------
# 7. Episode replay.
#
# BatchedEnv steps replicas in lockstep; with record=True the (reset key,
# action stream) pair is logged, which re-creates the trajectory
# bit-identically (the reference's seed-state replay, base_env.py:454-471).
# ---------------------------------------------------------------------------
from ai_economist_tpu.adapters.batched import BatchedEnv

batch = BatchedEnv(env, 4, auto_reset="fresh")
states, bobs = batch.reset(jax.random.PRNGKey(4), record=True)
rews = []
for t in range(10):
    key, k = jax.random.split(key)
    states, bobs, rew, done, _ = batch.step(states, random_actions(k, bobs))
    rews.append(np.asarray(rew["a"]))
replay_path = batch.save_replay(os.path.join(OUT, "replay.lz4"))
for t, (s, o, rew, d, _) in enumerate(batch.playback(replay_path)):
    np.testing.assert_array_equal(rews[t], np.asarray(rew["a"]))
print(f"[7] replay round-trip bit-identical over 10 steps -> {replay_path}")

print("\nDone. Artifacts in", OUT)
