"""Trajectory parity vs the ACTUAL reference engine: Gather + Build.

Runs the real salesforce/ai-economist BaseEnvironment (CPU, object-oriented)
and the TPU engine side by side from an identical post-reset state, driving
both with the same masked-valid random actions and injecting the reference's
recorded RNG draws into the TPU step (see refbridge.py). Asserts bit-exact
agreement of maps, ownership, agent locations, inventories, labor, action
masks, and rewards at every timestep.

This is the correctness oracle SURVEY §7.1 / BASELINE.md demand — it converts
"the TPU component matches my reading of the reference" into a checked fact
against the reference itself (reference base_env.py:929-1032 is the loop
being mirrored).
"""

import jax
import numpy as np
import pytest

import ai_economist_tpu as aet
from tests.reference_compat import refbridge


def _make_pair(skill_dist, seed, episode_length=40):
    foundation = refbridge.get_foundation()
    common = dict(
        n_agents=4,
        world_size=[15, 15],
        episode_length=episode_length,
        multi_action_mode_agents=False,
        multi_action_mode_planner=True,
        flatten_observations=True,
        flatten_masks=True,
    )
    components = [
        ("Gather", dict(skill_dist=skill_dist)),
        ("Build", dict(skill_dist=skill_dist, payment_max_skill_multiplier=3)),
    ]
    ref_env = foundation.make_env_instance(
        scenario_name="uniform/simple_wood_and_stone",
        components=[{n: dict(k)} for n, k in components],
        **common,
    )
    tpu_env = aet.make_env_instance(
        "uniform/simple_wood_and_stone", components=components, **common
    )
    np.random.seed(seed)
    ref_obs = ref_env.reset()
    return ref_env, tpu_env, ref_obs


def _run_parity(skill_dist, seed, steps=30):
    ref_env, tpu_env, ref_obs = _make_pair(skill_dist, seed)
    n = tpu_env.n_agents
    state = refbridge.extract_state(ref_env, tpu_env, jax.random.PRNGKey(seed))
    refbridge.assert_state_matches(ref_env, tpu_env, state, t=-1)

    gather = ref_env.get_component("Gather")
    step = jax.jit(tpu_env.step)
    action_rng = np.random.default_rng(seed + 1)

    with refbridge.DrawRecorder(seed + 2) as rec:
        for t in range(steps):
            ref_actions, tpu_actions = refbridge.sample_masked_actions(
                ref_obs, n, action_rng, tpu_env.planner_action_space
            )
            rec.begin_step()
            ref_obs, ref_rew, _done, _info = ref_env.step(ref_actions)
            records = rec.end_step()

            draws = {
                # Config order: Gather consumes the 1st permutation, Build the
                # 2nd (outcome-invariant — builds cannot conflict spatially).
                "Gather": refbridge.build_gather_draws(
                    records, gather.gathers[-1], tpu_env, gather_perm_index=0
                ),
                "scenario": refbridge.build_regrow_draws(records),
            }
            state, tpu_obs, tpu_rew, _tpu_done, _ = step(state, tpu_actions, draws)

            refbridge.assert_state_matches(ref_env, tpu_env, state, t)
            refbridge.assert_rewards_match(ref_rew, tpu_rew, n, t)
            refbridge.assert_obs_matches(ref_obs, tpu_obs, n, t)
            # Next-step action masks agree bit for bit.
            ref_masks = np.stack(
                [np.asarray(ref_obs[str(i)]["action_mask"]).ravel() for i in range(n)]
            )
            np.testing.assert_array_equal(
                np.asarray(tpu_obs["a"]["action_mask"]), ref_masks,
                err_msg=f"agent action masks diverged at t={t}",
            )


def test_parity_gather_build_no_skill():
    _run_parity("none", seed=7)


def test_parity_gather_build_pareto_skills():
    """Pareto skills make bonus_gather_prob > 0, exercising the per-gather
    rand() injection path and skill-scaled build payments."""
    _run_parity("pareto", seed=11)


@pytest.mark.slow
def test_parity_gather_build_long_multiseed():
    for seed in (3, 19, 42):
        _run_parity("pareto", seed=seed, steps=40)
