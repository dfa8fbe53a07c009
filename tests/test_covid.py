"""COVID-19 scenario tests: SIR conservation, unemployment model,
stringency cooldown, subsidy rollout, vaccination, rewards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet

N_STATES = 6  # small synthetic version for fast tests


def make_env(episode_length=40, **scen_kwargs):
    return aet.make_env_instance(
        "CovidAndEconomySimulation",
        components=[
            ("ControlUSStateOpenCloseStatus", {"action_cooldown_period": 5}),
            ("FederalGovernmentSubsidy", {"subsidy_interval": 10,
                                          "num_subsidy_levels": 20}),
            ("VaccinationCampaign", {"delivery_interval": 1}),
        ],
        n_agents=N_STATES,
        world_size=[1, 1],
        episode_length=episode_length,
        multi_action_mode_planner=False,
        **scen_kwargs,
    )


@pytest.fixture(scope="module")
def env():
    return make_env()


@pytest.fixture(scope="module")
def reset_out(env):
    return jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))


def test_action_spaces(env):
    assert env.agent_action_space.total_actions == 1 + 10  # stringency levels
    # single-action-mode planner: 1 + 20 subsidy levels
    assert env.planner_action_space.total_actions == 21


def test_reset_initializes_from_data(env, reset_out):
    state, obs = reset_out
    scen = state.scen
    pop = np.asarray(env.scenario.pop)
    S = np.asarray(scen["S"])
    assert (S > 0).all() and (S <= pop).all()
    assert obs["a"]["flat"].shape[0] == N_STATES
    # agent obs includes one-hot index + 6 SIR features + productivity etc.
    assert np.isfinite(np.asarray(obs["a"]["flat"])).all()
    assert np.isfinite(np.asarray(obs["p"]["flat"])).all()


def test_sir_population_conservation(env, reset_out):
    state, obs = reset_out
    scen = state.scen
    total0 = np.asarray(scen["S"] + scen["I"] + scen["R"])
    step = jax.jit(env.step)
    for t in range(5):
        state, obs, rew, done, _ = step(
            state,
            {"a": jnp.zeros(N_STATES, jnp.int32), "p": jnp.zeros((), jnp.int32)},
        )
    scen = state.scen
    total1 = np.asarray(scen["S"] + scen["I"] + scen["R"])
    # S+I+R is conserved by the SIR step (dI = -dS - dR).
    np.testing.assert_allclose(total0, total1, rtol=1e-5)
    assert (np.asarray(scen["D"]) >= 0).all()
    assert np.isfinite(np.asarray(rew["a"])).all()
    assert np.isfinite(float(rew["p"]))


def test_stringency_cooldown(env, reset_out):
    state, obs = reset_out
    step = jax.jit(env.step)
    # All agents pick stringency level 7 at t=1.
    state1, obs1, *_ = step(
        state, {"a": jnp.full((N_STATES,), 7, jnp.int32),
                "p": jnp.zeros((), jnp.int32)}
    )
    np.testing.assert_allclose(np.asarray(state1.scen["hist"][-1]), 7.0)
    # Cooldown: masks now all zero for 5 steps.
    am = np.asarray(obs1["a"]["action_mask"])
    assert am[:, 1:].sum() == 0
    # A new action during cooldown is masked; a no-op keeps the level.
    state2, obs2, *_ = step(
        state1, {"a": jnp.zeros((N_STATES,), jnp.int32),
                 "p": jnp.zeros((), jnp.int32)}
    )
    np.testing.assert_allclose(np.asarray(state2.scen["hist"][-1]), 7.0)


def test_subsidy_rollout(env, reset_out):
    state, obs = reset_out
    step = jax.jit(env.step)
    # Planner takes max subsidy (action 20) at t=1 ((t-1)%10==0).
    state, obs, *_ = step(
        state, {"a": jnp.zeros(N_STATES, jnp.int32),
                "p": jnp.full((), 20, jnp.int32)}
    )
    cs = state.comp["FederalGovernmentSubsidy"]
    assert float(cs["current_subsidy_level"]) == 20.0
    expected_daily = np.asarray(
        env.get_component("FederalGovernmentSubsidy").max_daily_subsidy_per_state
    )
    np.testing.assert_allclose(np.asarray(state.scen["subsidy"]), expected_daily,
                               rtol=1e-5)
    # Level persists through the interval even with noop actions.
    state, obs, *_ = step(
        state, {"a": jnp.zeros(N_STATES, jnp.int32), "p": jnp.zeros((), jnp.int32)}
    )
    cs = state.comp["FederalGovernmentSubsidy"]
    assert float(cs["current_subsidy_level"]) == 20.0
    # Subsidy raises postsubsidy productivity above raw productivity.
    assert (
        np.asarray(state.scen["postsubsidy_productivity"])
        > np.asarray(env.scenario.economy_step(
            state.scen["I"], state.scen["D"], state.scen["U"]))
    ).all()


def test_vaccination_reduces_susceptible():
    env = make_env(episode_length=10)
    # Make vaccines available immediately
    vc = env.get_component("VaccinationCampaign")
    vc.t_delivery_begins = 0
    vc._t_first_delivery = 0
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
    S0 = np.asarray(state.scen["S"]).sum()
    step = jax.jit(env.step)
    for _ in range(3):
        state, *_ = step(
            state, {"a": jnp.zeros(N_STATES, jnp.int32), "p": jnp.zeros((), jnp.int32)}
        )
    assert np.asarray(state.scen["V"]).sum() > 0
    assert np.asarray(state.scen["S"]).sum() < S0


def test_full_episode_and_metrics(env):
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(2)
    for t in range(40):
        key, ka, kp = jax.random.split(key, 3)
        la = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
        lp = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
        acts = {
            "a": jax.random.categorical(ka, la, axis=-1),
            "p": jax.random.categorical(kp, lp),
        }
        state, obs, rew, done, _ = step(state, acts)
    assert bool(done)
    m = jax.jit(env.metrics)(state)
    assert np.isfinite(float(m["usa/deaths (thousands)"]))
    assert float(m["usa/total_productivity (trillion $)"]) > 0
    assert np.isfinite(float(m["usa/health_index_at_end_of_episode"]))


def test_real_world_policy_replay():
    env = make_env(episode_length=20, use_real_world_policies=True)
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for t in range(5):
        # External actions are ignored in replay mode.
        state, obs, rew, done, _ = step(
            state, {"a": jnp.full((N_STATES,), 3, jnp.int32),
                    "p": jnp.zeros((), jnp.int32)}
        )
    # Stringency followed the recorded real-world policy, not the action "3".
    expected = np.asarray(
        env.scenario.rw_policy[env.scenario.start_date_index + 4]
    )
    np.testing.assert_allclose(np.asarray(state.scen["hist"][-1]), expected)
