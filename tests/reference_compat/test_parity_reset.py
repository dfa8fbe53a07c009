"""Reset-time parity vs the real reference engine.

The trajectory parity suites copy the reference's post-reset state
(refbridge.extract_state), so the repo's own reset paths were previously
unvalidated. This suite closes that: exact map equality for file-based
layouts (both engines load the REFERENCE's shipped map files), deterministic
skill/location tables for fixed_four_skill_and_loc, and many-seed
statistical parity (source-tile counts, placement moments, skill-sample
moments) for the rejection-sampled Uniform reset
(reference dynamic_layout.py:313-392, layout_from_file.py:169-247).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet
from tests.reference_compat import refbridge

REF_MAP_DIR = (
    "/root/reference/ai_economist/foundation/scenarios/simple_wood_and_stone/"
    "map_txt"
)

COMMON = dict(
    n_agents=4,
    world_size=[25, 25],
    episode_length=50,
    multi_action_mode_agents=False,
    multi_action_mode_planner=True,
    flatten_observations=True,
    flatten_masks=True,
)
GB_COMPONENTS = [
    ("Gather", dict(skill_dist="pareto")),
    ("Build", dict(skill_dist="pareto", payment_max_skill_multiplier=3)),
]


def _pair(scenario, ref_scenario=None, components=GB_COMPONENTS,
          common=None, env_layout_file=None, **scen_kwargs):
    foundation = refbridge.get_foundation()
    common = dict(common or COMMON)
    ref_kwargs = dict(scen_kwargs)
    tpu_kwargs = dict(scen_kwargs)
    if env_layout_file is not None:
        # The reference resolves layout files against ITS OWN map_txt dir
        # (layout_from_file.py:96-99); the TPU engine accepts abs paths.
        ref_kwargs["env_layout_file"] = os.path.basename(env_layout_file)
        tpu_kwargs["env_layout_file"] = env_layout_file
    ref_env = foundation.make_env_instance(
        scenario_name=ref_scenario or scenario,
        components=[{n: dict(k)} for n, k in components],
        **common,
        **ref_kwargs,
    )
    tpu_env = aet.make_env_instance(
        scenario, components=components, **common, **tpu_kwargs
    )
    return ref_env, tpu_env


def _map(env_or_state, key, tpu=False):
    if tpu:
        return np.asarray(env_or_state.maps[key])
    return np.asarray(env_or_state.world.maps.get(key), np.float32)


# ---------------------------------------------------------------------------
# Exact parity: file-based layouts
# ---------------------------------------------------------------------------


def test_layout_from_file_exact_map_parity():
    """Same reference-shipped map file -> bit-identical starting maps
    (reference layout_from_file.py:96-112, 249-286)."""
    f = os.path.join(REF_MAP_DIR, "quadrant_25x25_20each_30clump.txt")
    ref_env, tpu_env = _pair(
        "layout_from_file/simple_wood_and_stone",
        env_layout_file=f,
    )
    np.random.seed(5)
    ref_env.reset()
    state, _ = jax.jit(tpu_env.reset_fresh)(jax.random.PRNGKey(5))
    for k in ("Wood", "Stone", "Water", "WoodSourceBlock", "StoneSourceBlock"):
        np.testing.assert_array_equal(
            _map(state, k, tpu=True), _map(ref_env, k),
            err_msg=f"starting map '{k}' diverged",
        )


def test_split_layout_exact_map_parity():
    """SplitLayout adds a full water row splitting the map
    (reference layout_from_file.py:653-801); maps must agree exactly and
    both engines must place agents off the water row."""
    f = os.path.join(REF_MAP_DIR, "top_wood_bottom_stone_14x14.txt")
    common = dict(COMMON, world_size=[14, 14])
    ref_env, tpu_env = _pair(
        "split_layout/simple_wood_and_stone",
        components=GB_COMPONENTS,
        common=common,
        env_layout_file=f,
    )
    np.random.seed(7)
    ref_env.reset()
    state, _ = jax.jit(tpu_env.reset_fresh)(jax.random.PRNGKey(7))
    for k in ("Wood", "Stone", "Water", "WoodSourceBlock", "StoneSourceBlock"):
        np.testing.assert_array_equal(
            _map(state, k, tpu=True), _map(ref_env, k),
            err_msg=f"starting map '{k}' diverged",
        )
    water_rows = np.flatnonzero(_map(state, "Water", tpu=True).sum(axis=1)
                                == common["world_size"][1])
    assert water_rows.size >= 1
    locs = np.asarray(state.loc)
    assert not np.isin(locs[:, 0], water_rows).any()


def test_fixed_four_skill_and_loc_tables():
    """fixed_four mode: the (corner location, rank-averaged skill) table is
    deterministic under the reference's fixed seed
    (layout_from_file.py:169-247); the per-reset assignment is a random
    permutation of it. Compare the table as a set and the rank pairing."""
    f = os.path.join(REF_MAP_DIR, "quadrant_25x25_20each_30clump.txt")
    ref_env, tpu_env = _pair(
        "layout_from_file/simple_wood_and_stone",
        env_layout_file=f,
        fixed_four_skill_and_loc=True,
    )
    np.random.seed(11)
    ref_env.reset()
    ref_scn = ref_env._scenario if hasattr(ref_env, "_scenario") else ref_env
    ref_locs = [tuple(map(int, rc)) for rc in ref_scn._ranked_locs]
    ref_skills = np.asarray(ref_scn._avg_ranked_skill, np.float64)

    state, _ = jax.jit(tpu_env.reset_fresh)(jax.random.PRNGKey(11))
    locs = np.asarray(state.loc)
    pays = np.asarray(state.agent_fields["build_payment"], np.float64)

    # Each agent occupies one of the reference's ranked corner locations with
    # exactly the matching ranked skill.
    used = set()
    for i in range(COMMON["n_agents"]):
        loc = (int(locs[i, 0]), int(locs[i, 1]))
        assert loc in ref_locs, f"agent {i} at {loc} not a ranked location"
        rank = ref_locs.index(loc)
        assert rank not in used, "two agents share a ranked slot"
        used.add(rank)
        np.testing.assert_allclose(
            pays[i], ref_skills[rank], rtol=2e-3,
            err_msg=f"skill at rank {rank}",
        )
    # And the reference's own reset agrees with its table too.
    for agent in ref_env.world.agents:
        loc = tuple(map(int, agent.loc))
        rank = ref_locs.index(loc)
        np.testing.assert_allclose(
            float(agent.state["build_payment"]), ref_skills[rank], rtol=1e-6
        )


# ---------------------------------------------------------------------------
# Statistical parity: rejection-sampled Uniform resets
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_uniform_reset_statistical_parity():
    """Many-seed comparison of the Uniform scenario's reset distributions:
    per-resource source-block counts and starting coverage
    (dynamic_layout.py:313-392), agent-placement moments (:420-431), and
    Gather/Build skill-sample moments (move.py:193-210, build.py:224-254)."""
    N = 150
    ref_env, tpu_env = _pair("uniform/simple_wood_and_stone")

    ref_stats = {k: [] for k in ("wood_src", "stone_src", "wood", "stone",
                                 "loc_r", "loc_c", "gather_skill", "build_pay")}
    np.random.seed(3)
    for _ in range(N):
        ref_env.reset()
        ref_stats["wood_src"].append(_map(ref_env, "WoodSourceBlock").sum())
        ref_stats["stone_src"].append(_map(ref_env, "StoneSourceBlock").sum())
        ref_stats["wood"].append((_map(ref_env, "Wood") > 0).sum())
        ref_stats["stone"].append((_map(ref_env, "Stone") > 0).sum())
        for a in ref_env.world.agents:
            ref_stats["loc_r"].append(a.loc[0])
            ref_stats["loc_c"].append(a.loc[1])
            ref_stats["gather_skill"].append(a.state["bonus_gather_prob"])
            ref_stats["build_pay"].append(a.state["build_payment"])

    reset_b = jax.jit(jax.vmap(tpu_env.reset_fresh))
    states, _ = reset_b(jax.random.split(jax.random.PRNGKey(3), N))
    tpu_stats = {
        "wood_src": np.asarray(states.maps["WoodSourceBlock"]).sum((1, 2)),
        "stone_src": np.asarray(states.maps["StoneSourceBlock"]).sum((1, 2)),
        "wood": (np.asarray(states.maps["Wood"]) > 0).sum((1, 2)),
        "stone": (np.asarray(states.maps["Stone"]) > 0).sum((1, 2)),
        "loc_r": np.asarray(states.loc[..., 0]).ravel(),
        "loc_c": np.asarray(states.loc[..., 1]).ravel(),
        "gather_skill": np.asarray(
            states.agent_fields["bonus_gather_prob"]).ravel(),
        "build_pay": np.asarray(states.agent_fields["build_payment"]).ravel(),
    }

    for k in ref_stats:
        r = np.asarray(ref_stats[k], np.float64)
        t = np.asarray(tpu_stats[k], np.float64)
        # Two-sample z-test on means at ~4 sigma, plus a loose std check.
        se = np.sqrt(r.var() / r.size + t.var() / t.size)
        assert abs(r.mean() - t.mean()) < 4.0 * se + 1e-6, (
            f"{k}: ref mean {r.mean():.3f} vs tpu {t.mean():.3f} (se {se:.3f})"
        )
        if r.std() > 1e-9:
            ratio = t.std() / r.std()
            assert 0.7 < ratio < 1.4, (
                f"{k}: std ratio {ratio:.2f} (ref {r.std():.3f}, tpu {t.std():.3f})"
            )


def test_quadrant_water_cross_exact_parity():
    """The Quadrant scenario's water cross is deterministic given world size
    (dynamic_layout.py:941-993): both engines must lay the identical Water
    map, with the same passage openings."""
    ref_env, tpu_env = _pair("quadrant/simple_wood_and_stone")
    np.random.seed(13)
    ref_env.reset()
    state, _ = jax.jit(tpu_env.reset_fresh)(jax.random.PRNGKey(13))
    np.testing.assert_array_equal(
        _map(state, "Water", tpu=True), _map(ref_env, "Water"),
        err_msg="Quadrant water cross diverged",
    )


@pytest.mark.slow
def test_quadrant_multizone_reset_statistical_parity():
    """Source placement statistics for the Quadrant (wood-left / stone-top
    gradients, dynamic_layout.py:994-1021) and MultiZone (kron-expanded zone
    partitions, :705-872) resets."""
    N = 100
    for scenario in ("quadrant/simple_wood_and_stone",
                     "multi_zone/simple_wood_and_stone"):
        ref_env, tpu_env = _pair(scenario)
        ref = {"wood_src": [], "stone_src": [], "wood_col": [], "stone_row": []}
        np.random.seed(17)
        H, Wd = COMMON["world_size"]
        cols = np.arange(Wd)[None, :]
        rows = np.arange(H)[:, None]
        for _ in range(N):
            ref_env.reset()
            ws = _map(ref_env, "WoodSourceBlock")
            ss = _map(ref_env, "StoneSourceBlock")
            ref["wood_src"].append(ws.sum())
            ref["stone_src"].append(ss.sum())
            # Centroid along the gradient axes: wood left, stone top.
            ref["wood_col"].append((ws * cols).sum() / max(ws.sum(), 1))
            ref["stone_row"].append((ss * rows).sum() / max(ss.sum(), 1))

        states, _ = jax.jit(jax.vmap(tpu_env.reset_fresh))(
            jax.random.split(jax.random.PRNGKey(17), N)
        )
        ws = np.asarray(states.maps["WoodSourceBlock"])
        ss = np.asarray(states.maps["StoneSourceBlock"])
        tpu = {
            "wood_src": ws.sum((1, 2)),
            "stone_src": ss.sum((1, 2)),
            "wood_col": (ws * cols[None]).sum((1, 2))
                        / np.maximum(ws.sum((1, 2)), 1),
            "stone_row": (ss * rows[None]).sum((1, 2))
                         / np.maximum(ss.sum((1, 2)), 1),
        }
        for k in ref:
            r = np.asarray(ref[k], np.float64)
            t = np.asarray(tpu[k], np.float64)
            se = np.sqrt(r.var() / r.size + t.var() / t.size)
            assert abs(r.mean() - t.mean()) < 4.0 * se + 1e-6, (
                f"{scenario} {k}: ref {r.mean():.3f} vs tpu {t.mean():.3f} "
                f"(se {se:.3f})"
            )
