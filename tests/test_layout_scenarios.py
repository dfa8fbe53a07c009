"""LayoutFromFile / SplitLayout / Quadrant / MultiZone scenario tests."""

import jax
import jax.numpy as jnp
import numpy as np

import ai_economist_tpu as aet


def test_layout_from_file_fixed_map():
    env = aet.make_env_instance(
        "layout_from_file/simple_wood_and_stone",
        components=[("Build", {"skill_dist": "pareto"}), ("Gather", {})],
        n_agents=4,
        world_size=[25, 25],
        episode_length=20,
        env_layout_file="quadrant_25x25_20each_30clump.txt",
    )
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
    assert float(state.maps["Wood"].sum()) == 20.0
    assert float(state.maps["Stone"].sum()) == 20.0
    assert float(state.maps["Water"].sum()) > 0
    # Source blocks mirror the fixed layout
    np.testing.assert_array_equal(
        np.asarray(state.maps["Wood"]), np.asarray(state.maps["WoodSourceBlock"])
    )
    # Two resets give identical layout (fixed map) but (generally) different
    # agent placement.
    state2, _ = jax.jit(env.reset_fresh)(jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(state.maps["Wood"]), np.asarray(state2.maps["Wood"])
    )
    # Agents never placed on water
    water = np.asarray(state.maps["Water"])
    for r, c in np.asarray(state.loc):
        assert water[r, c] == 0


def test_fixed_four_skill_and_loc():
    env = aet.make_env_instance(
        "layout_from_file/simple_wood_and_stone",
        components=[
            ("Build", {"skill_dist": "pareto", "payment_max_skill_multiplier": 3}),
            ("Gather", {}),
        ],
        n_agents=4,
        world_size=[25, 25],
        episode_length=20,
        env_layout_file="quadrant_25x25_20each_30clump_no_water.txt",
        fixed_four_skill_and_loc=True,
    )
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
    locs = set(map(tuple, np.asarray(state.loc).tolist()))
    assert locs == {(0, 24), (24, 0), (0, 0), (24, 24)}
    pay = np.sort(np.asarray(state.agent_fields["build_payment"]))
    expected = np.asarray(
        env.scenario._avg_ranked_skill
    )
    np.testing.assert_allclose(pay, np.sort(expected), rtol=1e-5)


def test_split_layout_regions():
    env = aet.make_env_instance(
        "split_layout/simple_wood_and_stone",
        components=[("Build", {"skill_dist": "pareto"}), ("Gather", {})],
        n_agents=4,
        world_size=[14, 14],
        episode_length=20,
        env_layout_file="top_wood_bottom_stone_14x14.txt",
        skill_rank_of_top_agents=[0],
    )
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
    water_line = env.scenario._water_line
    assert float(state.maps["Water"][water_line].sum()) == 14.0
    locs = np.asarray(state.loc)
    pay = np.asarray(state.agent_fields["build_payment"])
    # Exactly one agent in the top region — the highest paid one.
    top_agents = locs[:, 0] < water_line
    assert top_agents.sum() == 1
    assert pay[top_agents][0] == pay.max()


def test_quadrant_and_multizone_reset():
    for name, kwargs in [
        ("quadrant/simple_wood_and_stone", {}),
        ("multi_zone/simple_wood_and_stone", {"num_partitions_row": 4,
                                              "num_partitions_col": 4,
                                              "num_wood_zones": 3,
                                              "num_stone_zones": 3,
                                              "num_wood_and_stone_zones": 2}),
    ]:
        env = aet.make_env_instance(
            name,
            components=[("Build", {}), ("Gather", {})],
            n_agents=4,
            world_size=[24, 24],
            episode_length=10,
            **kwargs,
        )
        state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
        assert float(state.maps["Wood"].sum()) > 0, name
        assert float(state.maps["Stone"].sum()) > 0, name
        if name.startswith("quadrant"):
            # Water cross present; no resources on water
            water = np.asarray(state.maps["Water"])
            assert water.sum() > 0
            assert (np.asarray(state.maps["Wood"])[water > 0] == 0).all()
        # One step runs
        state, obs, rew, done, _ = jax.jit(env.step)(
            state, {"a": jnp.zeros(4, jnp.int32)}
        )
        assert np.isfinite(np.asarray(rew["a"])).all()
