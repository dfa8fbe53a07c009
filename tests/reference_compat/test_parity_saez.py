"""Trajectory parity vs the real reference engine: the SAEZ tax model.

The most intricate machinery in the reference — the adaptive optimal-tax
formula (reference redistribution.py:437-823): income/marginal-rate buffer,
warmup random rates, masked OLS elasticity regression, binned g(z)/A(z)
welfare/Pareto statistics, nan-gap interpolation of marginal rates, and
bracketization. This suite drives both engines through the full lifecycle —
warmup (random rates, injected via DrawRecorder's tagged np.random.uniform
patch), buffer fill, and >=4 post-warmup formula periods — asserting at every
step: world/agent state, rewards, bracket rates, ring-buffer contents/counts,
reached_min_samples, and the elasticity estimates (elas_t/elas_tm1/log_z0).
"""

import jax
import numpy as np
import pytest

import ai_economist_tpu as aet
from tests.reference_compat import refbridge

N_AGENTS = 4
PERIOD = 8
BUFFER_SIZE = 24  # 6 tax periods x 4 agents fills it -> warmup ends at t=49
STEPS = 90
SEED = 51


def _build_envs():
    foundation = refbridge.get_foundation()
    common = dict(
        n_agents=N_AGENTS,
        world_size=[15, 15],
        episode_length=200,
        multi_action_mode_agents=False,
        multi_action_mode_planner=True,
        flatten_observations=True,
        flatten_masks=True,
    )
    scen = dict(starting_agent_coin=8)
    tax_kwargs = dict(tax_model="saez", period=PERIOD)
    ref_env = foundation.make_env_instance(
        scenario_name="uniform/simple_wood_and_stone",
        components=[
            {"Gather": {}},
            {"Build": {}},
            {"PeriodicBracketTax": dict(tax_kwargs)},
        ],
        **common,
        **scen,
    )
    # The reference hardcodes _buffer_size=500 (redistribution.py:277); shrink
    # it so the warmup -> formula transition happens within the test horizon.
    ref_env.get_component("PeriodicBracketTax")._buffer_size = BUFFER_SIZE
    tpu_env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Gather", {}),
            ("Build", {}),
            ("PeriodicBracketTax",
             dict(tax_kwargs, saez_buffer_size=BUFFER_SIZE)),
        ],
        **common,
        **scen,
    )
    return ref_env, tpu_env


def _chronological_buffer(cs, buffer_size):
    """TPU ring buffer -> [count, 2] in insertion order (oldest first)."""
    count = int(cs["buf_count"])
    pos = int(cs["buf_pos"])
    buf = np.asarray(cs["buf"])
    idx = (pos - count + np.arange(count)) % buffer_size
    return buf[idx]


def _assert_saez_matches(ref_tax, cs, t):
    np.testing.assert_allclose(
        np.asarray(cs["curr_bracket_tax_rates"]),
        np.asarray(ref_tax.curr_bracket_tax_rates, np.float32),
        atol=2e-4,
        err_msg=f"saez bracket rates diverged at t={t}",
    )
    assert bool(cs["reached_min_samples"]) == bool(ref_tax._reached_min_samples), (
        f"reached_min_samples diverged at t={t}"
    )
    ref_buf = np.array(ref_tax._local_saez_buffer, np.float32).reshape(-1, 2)
    tpu_buf = _chronological_buffer(cs, BUFFER_SIZE)
    assert tpu_buf.shape[0] == ref_buf.shape[0], (
        f"buffer count diverged at t={t}: {tpu_buf.shape[0]} vs {ref_buf.shape[0]}"
    )
    if ref_buf.size:
        np.testing.assert_allclose(
            tpu_buf, ref_buf, atol=2e-4,
            err_msg=f"saez buffer contents diverged at t={t}",
        )
    assert int(cs["additions_this_episode"]) == int(
        ref_tax._additions_this_episode
    ), f"additions_this_episode diverged at t={t}"
    for tpu_k, ref_k in (
        ("elas_t", "elas_t"),
        ("elas_tm1", "elas_tm1"),
        ("log_z0_t", "log_z0_t"),
        ("log_z0_tm1", "log_z0_tm1"),
    ):
        np.testing.assert_allclose(
            float(cs[tpu_k]), float(getattr(ref_tax, ref_k)), atol=5e-4,
            err_msg=f"{tpu_k} diverged at t={t}",
        )
    np.testing.assert_allclose(
        np.asarray(cs["running_avg_tax_rates"]),
        np.asarray(ref_tax.running_avg_tax_rates, np.float32),
        atol=2e-4,
        err_msg=f"running_avg_tax_rates diverged at t={t}",
    )


@pytest.mark.slow
def test_parity_saez_full_lifecycle():
    ref_env, tpu_env = _build_envs()
    np.random.seed(SEED)
    ref_obs = ref_env.reset()

    # Seed build materials so period incomes are non-trivial; refresh the tax
    # baseline to the mutated endowments (redistribution.py:1109-1139).
    for i in range(N_AGENTS):
        agent = ref_env.get_agent(str(i))
        agent.state["inventory"]["Wood"] = 8
        agent.state["inventory"]["Stone"] = 8
    ref_tax = ref_env.get_component("PeriodicBracketTax")
    ref_tax.last_coin = [
        float(ref_env.get_agent(str(i)).total_endowment("Coin"))
        for i in range(N_AGENTS)
    ]
    ref_obs = ref_env._generate_observations(
        flatten_observations=True, flatten_masks=True
    )

    state = refbridge.extract_state(ref_env, tpu_env, jax.random.PRNGKey(SEED))
    refbridge.assert_state_matches(ref_env, tpu_env, state, t=-1)

    gather = ref_env.get_component("Gather")
    n_brackets = tpu_env.get_component("PeriodicBracketTax").n_brackets
    step = jax.jit(tpu_env.step)
    action_rng = np.random.default_rng(SEED + 1)

    formula_periods = 0
    with refbridge.DrawRecorder(SEED + 2) as rec:
        for t in range(STEPS):
            ref_actions, tpu_actions = refbridge.sample_masked_actions(
                ref_obs, N_AGENTS, action_rng, tpu_env.planner_action_space
            )
            rec.begin_step()
            ref_obs, ref_rew, _done, _info = ref_env.step(ref_actions)
            records = rec.end_step()

            draws = {
                "Gather": refbridge.build_gather_draws(
                    records, gather.gathers[-1], tpu_env, gather_perm_index=0
                ),
                "scenario": refbridge.build_regrow_draws(records),
                "PeriodicBracketTax": refbridge.build_saez_draws(
                    records, n_brackets
                ),
            }
            state, tpu_obs, tpu_rew, _tpu_done, _ = step(state, tpu_actions, draws)

            refbridge.assert_state_matches(ref_env, tpu_env, state, t)
            refbridge.assert_rewards_match(ref_rew, tpu_rew, N_AGENTS, t)
            refbridge.assert_obs_matches(ref_obs, tpu_obs, N_AGENTS, t)
            _assert_saez_matches(ref_tax, state.comp["PeriodicBracketTax"], t)
            if ref_tax._reached_min_samples and ref_tax.tax_cycle_pos == 2:
                formula_periods += 1  # a day-1 formula evaluation just ran

    assert ref_tax._reached_min_samples, "warmup never completed"
    assert formula_periods >= 4, f"only {formula_periods} formula periods"
    total = float(state.comp["PeriodicBracketTax"]["total_collected_taxes"])
    assert abs(total - float(ref_tax.total_collected_taxes)) < 1e-2
    assert ref_tax.total_collected_taxes > 0
