"""Trajectory parity vs the real reference engine: COVID-19 & economy.

The reference's CPU covid path is fully deterministic (no np.random anywhere
in covid19_env.py / covid19_components.py), so parity needs no RNG
injection: same actions => same trajectory. This is the analog of the
reference's own CPU<->GPU consistency oracle
(tests/run_covid19_cpu_gpu_consistency_checks.py:37-101), with the reference
CPU engine on one side and the TPU engine on the other, on the REAL shipped
fitted artifacts
(ai_economist/datasets/covid19_datasets/data_and_fitted_params/).

Covers: fitted-model stepping (SIR/unemployment/economy/rewards), stringency
cooldown masks, subsidy intervals, vaccination delivery, and both real-world
replay modes (use_real_world_policies / use_real_world_data).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ai_economist_tpu as aet
from tests.reference_compat import refbridge

DATA_DIR = (
    "/root/reference/ai_economist/datasets/covid19_datasets/"
    "data_and_fitted_params"
)

N_STATES = 51


def get_covid_foundation():
    """Reference foundation with the covid RSA activation gate disabled.

    The gate (reference foundation/utils.py:46-123, called at
    covid19_env.py:114) is a distribution control, not simulation behavior
    (SURVEY.md 7.4); it would block on stdin here.
    """
    foundation = refbridge.get_foundation()
    import sys

    ref_cov = sys.modules["ai_economist.foundation.scenarios.covid19.covid19_env"]
    ref_cov.verify_activation_code = lambda: None
    return foundation


def _make_pair(episode_length=60, components_kwargs=None, **scen_kwargs):
    foundation = get_covid_foundation()
    ck = components_kwargs or {}
    comps = [
        ("ControlUSStateOpenCloseStatus",
         {"action_cooldown_period": 28,
          **ck.get("ControlUSStateOpenCloseStatus", {})}),
        ("FederalGovernmentSubsidy",
         {"num_subsidy_levels": 20, "subsidy_interval": 90,
          "max_annual_subsidy_per_person": 20000,
          **ck.get("FederalGovernmentSubsidy", {})}),
        ("VaccinationCampaign",
         {"daily_vaccines_per_million_people": 3000, "delivery_interval": 1,
          "vaccine_delivery_start_date": "2021-01-12",
          **ck.get("VaccinationCampaign", {})}),
    ]
    common = dict(
        n_agents=N_STATES,
        world_size=[1, 1],
        episode_length=episode_length,
        multi_action_mode_agents=False,
        multi_action_mode_planner=False,
        flatten_observations=True,
        flatten_masks=True,
        collate_agent_step_and_reset_data=True,  # required by the ref covid env
    )
    ref_env = foundation.make_env_instance(
        scenario_name="CovidAndEconomySimulation",
        components=[{n: dict(k)} for n, k in comps],
        path_to_data_and_fitted_params=DATA_DIR,
        **common,
        **scen_kwargs,
    )
    tpu_env = aet.make_env_instance(
        "CovidAndEconomySimulation",
        components=comps,
        path_to_data_and_fitted_params=DATA_DIR,
        n_agents=N_STATES,
        world_size=[1, 1],
        episode_length=episode_length,
        multi_action_mode_planner=False,
        **scen_kwargs,
    )
    return ref_env, tpu_env


def _ref_series(ref_env, key, t):
    return np.asarray(ref_env.world.global_state[key][t], np.float64)


def _assert_step_matches(ref_env, tpu_state, t, rtol=2e-4):
    scen = tpu_state.scen
    pairs = [
        ("Susceptible", scen["S"]),
        ("Infected", scen["I"]),
        ("Recovered", scen["R"]),
        ("Deaths", scen["D"]),
        ("Vaccinated", scen["V"]),
        ("Unemployed", scen["U"]),
        ("Postsubsidy Productivity", scen["postsubsidy_productivity"]),
        ("Subsidy", scen["subsidy"]),
    ]
    for key, ours in pairs:
        ref = _ref_series(ref_env, key, t)
        got = np.asarray(ours, np.float64)
        # atol=5.0 (people / dollars): float32 rounding accumulates to a
        # few units on populations of millions; relative error only blows up
        # when the series itself approaches zero.
        np.testing.assert_allclose(
            got, ref, rtol=rtol, atol=5.0,
            err_msg=f"{key} diverged at t={t}",
        )
    ref_str = _ref_series(ref_env, "Stringency Level", t)
    np.testing.assert_allclose(
        np.asarray(scen["hist"][-1], np.float64), ref_str,
        err_msg=f"Stringency diverged at t={t}",
    )


def _ref_prefixed_obs(ref_env):
    """Reference raw obs with engine prefixes: {'a'|'p': {key: array}}.

    Mirrors base_env.py:644-675 naming ("world-" for scenario fields,
    "<Component>-" for component fields, plus "time").
    """
    out = {"a": {}, "p": {}}
    for idx, o in ref_env.generate_observations().items():
        out[idx].update({f"world-{k}": np.asarray(v) for k, v in o.items()})
    for comp in ref_env._components:
        for idx, o in comp.obs().items():
            out[idx].update(
                {f"{comp.name}-{k}": np.asarray(v) for k, v in o.items()}
            )
    tval = ref_env.world.timestep / ref_env.episode_length
    out["a"]["time"] = np.full((N_STATES,), tval)
    out["p"]["time"] = np.array([tval])
    return out


def _assert_obs_matches_covid(ref_env, tpu_env, state, tpu_obs, t,
                              rtol=2e-4, atol=1e-4):
    """Observation-content parity for the covid env (collated layout).

    The reference runs covid in collated mode (collate_agent_step_and_reset
    _data=True): raw "a" entries carry the agent axis LAST ([k, N]), and
    2-D collated arrays stay un-flattened in its packager; the TPU engine is
    agent-first and flattens per-agent 1-D payloads into "flat". Content
    parity is therefore asserted at two levels:
      1. raw key-level: every prefixed obs key agrees (transposed where the
         reference is [k, N]; the planner's agent_state as [6, N] raveled);
      2. packaged level: the TPU "flat" vectors equal the concat of the
         REFERENCE's values in the TPU packager's sorted-key order — i.e.
         the policies consume identical numbers, arranged as documented.
    """
    ref = _ref_prefixed_obs(ref_env)
    scen_obs = tpu_env.scenario.obs(state)
    tpu_raw = {"a": {f"world-{k}": np.asarray(v) for k, v in scen_obs["a"].items()},
               "p": {f"world-{k}": np.asarray(v) for k, v in scen_obs["p"].items()}}
    for comp in tpu_env.components:
        co = comp.obs(state)
        for idx in ("a", "p"):
            tpu_raw[idx].update(
                {f"{comp.name}-{k}": np.asarray(v) for k, v in co.get(idx, {}).items()}
            )
    tpu_raw["a"]["time"] = np.asarray(tpu_obs["a"]["time"])
    tpu_raw["p"]["time"] = np.asarray(tpu_obs["p"]["time"])

    # --- 1. raw key-level parity ---
    for idx in ("a", "p"):
        assert set(ref[idx]) == set(tpu_raw[idx]), (
            f"obs key sets diverged for '{idx}' at t={t}: "
            f"{set(ref[idx]) ^ set(tpu_raw[idx])}"
        )
        for k, rv in ref[idx].items():
            tv = tpu_raw[idx][k]
            if idx == "a" and rv.ndim == 2 and k != "world-agent_index":
                rv = rv.T  # reference collated [k, N] -> agent-first [N, k]
            if idx == "p" and rv.ndim == 2:
                rv = rv.reshape(-1)  # planner agent_state [6, N] raveled
            np.testing.assert_allclose(
                tv, rv.reshape(tv.shape), rtol=rtol, atol=atol,
                err_msg=f"raw obs '{idx}/{k}' diverged at t={t}",
            )

    # --- 2. packaged flat built from REFERENCE values in TPU key order ---
    from ai_economist_tpu.core.obs import flat_keys

    a_keys = flat_keys({k: jnp.asarray(v) for k, v in tpu_raw["a"].items()},
                       batch_ndim=1)
    parts = []
    for k in a_keys:
        rv = ref["a"][k]
        if rv.ndim == 2 and k != "world-agent_index":
            rv = rv.T
        parts.append(rv.reshape(N_STATES, -1) if rv.ndim == 2
                     else rv.reshape(N_STATES, 1))
    np.testing.assert_allclose(
        np.asarray(tpu_obs["a"]["flat"]),
        np.concatenate(parts, axis=1).astype(np.float32),
        rtol=rtol, atol=atol,
        err_msg=f"packaged agent flat obs diverged at t={t}",
    )
    p_keys = flat_keys({k: jnp.asarray(v) for k, v in tpu_raw["p"].items()},
                       batch_ndim=0)
    parts = [ref["p"][k].reshape(-1) for k in p_keys]
    np.testing.assert_allclose(
        np.asarray(tpu_obs["p"]["flat"]),
        np.concatenate(parts).astype(np.float32),
        rtol=rtol, atol=atol,
        err_msg=f"packaged planner flat obs diverged at t={t}",
    )


def _run_parity(episode_length, steps, scen_kwargs=None, seed=0,
                components_kwargs=None, check_masks=True, rtol=2e-4,
                respect_masks=True):
    ref_env, tpu_env = _make_pair(
        episode_length=episode_length,
        components_kwargs=components_kwargs,
        **(scen_kwargs or {}),
    )
    ref_obs = ref_env.reset()
    state, obs = jax.jit(tpu_env.reset_fresh)(jax.random.PRNGKey(seed))
    _assert_step_matches(ref_env, state, 0, rtol=rtol)

    step = jax.jit(tpu_env.step)
    rng = np.random.default_rng(seed + 1)
    rew_ref_sum = np.zeros(N_STATES)
    rew_tpu_sum = np.zeros(N_STATES)
    rew_p_ref = rew_p_tpu = 0.0

    for t in range(1, steps + 1):
        # Collated reference masks are [1 + n_actions, n_agents].
        ref_a_masks = np.asarray(ref_obs["a"]["action_mask"])
        if check_masks:
            np.testing.assert_array_equal(
                np.asarray(obs["a"]["action_mask"]),
                ref_a_masks.T,
                err_msg=f"agent masks diverged at t={t}",
            )
            np.testing.assert_array_equal(
                np.asarray(obs["p"]["action_mask"]),
                np.asarray(ref_obs["p"]["action_mask"]).ravel(),
                err_msg=f"planner mask diverged at t={t}",
            )

        # Uniform-random actions, identical for both engines. By default
        # restricted to mask-valid actions; respect_masks=False samples the
        # raw action space to prove off-mask behavior also agrees (the
        # reference applies any nonzero action even during cooldown,
        # covid19_components.py:190-199 — so must we).
        ref_actions = {}
        a_flat = np.zeros((N_STATES,), np.int32)
        for i in range(N_STATES):
            mask = ref_a_masks[:, i]
            if respect_masks:
                a = int(rng.choice(np.flatnonzero(mask > 0)))
            else:
                a = int(rng.integers(mask.shape[0]))
            ref_actions[str(i)] = a
            a_flat[i] = a
        pmask = np.asarray(ref_obs["p"]["action_mask"]).ravel()
        if respect_masks:
            p_act = int(rng.choice(np.flatnonzero(pmask > 0)))
        else:
            p_act = int(rng.integers(pmask.shape[0]))
        ref_actions["p"] = p_act

        ref_obs, ref_rew, _, _ = ref_env.step(ref_actions)
        state, obs, rew, done, _ = step(
            state,
            {"a": jnp.asarray(a_flat), "p": jnp.asarray(p_act, jnp.int32)},
        )
        _assert_step_matches(ref_env, state, t, rtol=rtol)
        if t <= 3 or t % 10 == 0:  # obs content: every step early, then decimated
            _assert_obs_matches_covid(ref_env, tpu_env, state, obs, t, rtol=rtol)

        rew_ref_sum += np.asarray(ref_rew["a"], np.float64)
        rew_tpu_sum += np.asarray(rew["a"], np.float64)
        rew_p_ref += float(ref_rew["p"])
        rew_p_tpu += float(rew["p"])

    np.testing.assert_allclose(rew_tpu_sum, rew_ref_sum, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(rew_p_tpu, rew_p_ref, rtol=5e-3, atol=5e-4)


def test_covid_parity_fitted_model():
    """51 real states, fitted SIR/unemployment/economy, random masked
    actions, 40 steps: full state-trajectory + mask + reward parity."""
    _run_parity(episode_length=60, steps=40)


def test_covid_parity_unmasked_actions():
    """Off-mask robustness: raw uniform actions (masks ignored) still give
    trajectory parity — the stringency cooldown and subsidy decision gates
    behave identically under illegal actions in both engines."""
    _run_parity(episode_length=45, steps=30, seed=9, respect_masks=False)


def test_covid_parity_subsidy_and_vaccines():
    """Short subsidy interval + immediate vaccination exercise the planner
    decision points and the vaccine delivery path within a short episode."""
    _run_parity(
        episode_length=50, steps=35, seed=3,
        components_kwargs={
            "FederalGovernmentSubsidy": {"subsidy_interval": 10},
            "VaccinationCampaign":
                {"vaccine_delivery_start_date": "2020-04-01"},
        },
    )


def test_covid_parity_real_world_policies():
    """Replay mode: actions come from the recorded real-world policy /
    subsidy series (reference covid19_components.py:181-186, 396-420)."""
    _run_parity(
        episode_length=60, steps=40, seed=5,
        scen_kwargs={"use_real_world_policies": True},
        check_masks=False,  # replay mode unmasks everything in both engines
    )


@pytest.mark.slow
def test_covid_parity_real_world_data():
    """Full replay: both SIR states and policies come from the recorded
    real-world series (covid19_env.py:726-760)."""
    _run_parity(
        episode_length=60, steps=40, seed=7,
        scen_kwargs={"use_real_world_data": True,
                     "use_real_world_policies": True},
        check_masks=False,
    )


@pytest.mark.slow
def test_covid_parity_full_episode_540():
    """The reference's flagship GPU benchmark config: 51 states + planner,
    episode length 540 (run_configs/covid_and_economy_environment.yaml:41-44).
    Parity over the full horizon, including the real vaccination start date
    (2021-01-12, day 296)."""
    _run_parity(episode_length=540, steps=540, seed=11, check_masks=False)
