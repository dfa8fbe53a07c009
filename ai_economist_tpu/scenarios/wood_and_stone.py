"""simple_wood_and_stone scenarios: Uniform, MultiZone, Quadrant.

TPU-native rewrite of ai_economist/foundation/scenarios/simple_wood_and_stone/
dynamic_layout.py:16-1021. Procedural layout generation (rejection-sampled
source maps with clump-growing convolutions), stochastic kernel regrowth,
egocentric/full spatial observations, isoelastic utility rewards, and three
planner social-welfare functions — all as pure jittable functions of EnvState.

Design notes (TPU-first):
  * Rejection loops become bounded `lax.while_loop`s (they converge in 1-2
    tries at reference-default coverages).
  * The regrowth "convolve health with a regen kernel" (dynamic_layout.py:
    433-471) maps onto `lax.conv_general_dilated`; the common halfwidth-0
    case short-circuits to a pointwise multiply.
  * Agent placement samples uniformly over currently-valid tiles via
    categorical sampling — the same distribution as the reference's
    rejection loop (dynamic_layout.py:420-431) without unbounded retries.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core import world as W
from ai_economist_tpu.core.scenario import Scenario, scenario_registry
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.ops import windows
from ai_economist_tpu.scenarios.utils import rewards, social_metrics


def _conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2-D 'same' convolution of a single [H, W] map with a [k, k] kernel."""
    return jax.lax.conv_general_dilated(
        x[None, None].astype(jnp.float32),
        kernel[None, None].astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
    )[0, 0]


@scenario_registry.add
class Uniform(Scenario):
    name = "uniform/simple_wood_and_stone"
    agent_subclasses = ["BasicMobileAgent", "BasicPlanner"]
    required_entities = ["Wood", "Stone"]

    def __init__(
        self,
        spec,
        components,
        env,
        planner_gets_spatial_info=True,
        full_observability=False,
        mobile_agent_observation_range=5,
        starting_wood_coverage=0.025,
        wood_regen_halfwidth=0,
        wood_regen_weight=0.01,
        wood_max_health=1,
        starting_stone_coverage=0.025,
        stone_regen_halfwidth=0,
        stone_regen_weight=0.01,
        stone_max_health=1,
        wood_clumpiness=0.35,
        stone_clumpiness=0.5,
        gradient_steepness=8,
        checker_source_blocks=False,
        starting_agent_coin=0,
        isoelastic_eta=0.23,
        energy_cost=0.21,
        energy_warmup_constant=0,
        energy_warmup_method="decay",
        planner_reward_type="coin_eq_times_productivity",
        mixing_weight_gini_vs_coin=0.0,
    ):
        super().__init__(spec, components, env)
        self._planner_gets_spatial_info = bool(planner_gets_spatial_info)
        self._full_observability = bool(full_observability)
        self._obs_range = int(mobile_agent_observation_range)
        # Egocentric-window extractor: per-env dynamic slices single-env,
        # the envs-on-lanes Pallas kernel under vmap (ops/windows.py).
        # byte_ok: the kernel byte-packs 4 channels per int32 lane, which
        # requires every map value to fit [0, 127] — healths are integers
        # capped at max_health (regen adds whole units), idx channels are
        # +2-encoded agent indices, the pad channel is 1. Configs outside
        # that range get the unpacked (any-value) kernel instead of the
        # silent wrap ADVICE r3 flagged.
        byte_ok = (
            max(int(wood_max_health), int(stone_max_health), 1) <= 127
            and spec.n_agents + 2 <= 127
        )
        self._windows_op = windows.make_windows_op(
            spec.n_agents, self._obs_range, spec.height, spec.width,
            byte_ok=byte_ok,
        )
        # Under the same guarantee, every value of the spatial observations
        # ("world-map"/"world-idx_map") is an integer in [0, 127]: trainers
        # may store rollout map obs as uint8 (4x less HBM for the BPTT
        # batch) and cast back losslessly at the policy input.
        self.obs_maps_are_bytes = byte_ok

        H, Wd = spec.height, spec.width
        if starting_wood_coverage >= 1:
            starting_wood_coverage /= H * Wd
        if starting_stone_coverage >= 1:
            starting_stone_coverage /= H * Wd
        assert (starting_wood_coverage + starting_stone_coverage) < 0.5

        self._checker_source_blocks = bool(checker_source_blocks)
        c, r = np.meshgrid(np.arange(Wd) % 2, np.arange(H) % 2)
        self._checker_mask = jnp.asarray((r + c) == 1)
        m = 2 if self._checker_source_blocks else 1

        self.layout_specs = {
            "Wood": dict(
                starting_coverage=float(starting_wood_coverage) * m,
                regen_halfwidth=int(wood_regen_halfwidth),
                regen_weight=float(wood_regen_weight),
                max_health=int(wood_max_health),
            ),
            "Stone": dict(
                starting_coverage=float(starting_stone_coverage) * m,
                regen_halfwidth=int(stone_regen_halfwidth),
                regen_weight=float(stone_regen_weight),
                max_health=int(stone_max_health),
            ),
        }
        self.clumpiness = {
            "Wood": float(wood_clumpiness),
            "Stone": float(stone_clumpiness),
        }
        self.gradient_steepness = float(gradient_steepness)
        assert self.gradient_steepness >= 1.0

        self.starting_agent_coin = float(starting_agent_coin)
        self.isoelastic_eta = float(isoelastic_eta)
        self.energy_cost = float(energy_cost)
        self.energy_warmup_method = energy_warmup_method.lower()
        assert self.energy_warmup_method in ("decay", "auto")
        self.energy_warmup_constant = float(energy_warmup_constant)
        self.planner_reward_type = str(planner_reward_type).lower()
        self.mixing_weight_gini_vs_coin = float(mixing_weight_gini_vs_coin)

        # Static source probability maps (deterministic for Uniform/Quadrant;
        # MultiZone overrides with per-reset randomized maps).
        self._static_prob_maps = self.make_source_prob_maps()

    # ------------------------------------------------------------------
    def make_source_prob_maps(self) -> Dict[str, jnp.ndarray]:
        """Top/bottom gradient prob maps (dynamic_layout.py:289-308)."""
        H, Wd = self.spec.height, self.spec.width
        grad = (
            np.arange(H, dtype=np.float64)[:, None].repeat(Wd, axis=1)
            ** self.gradient_steepness
        )
        grad = grad / grad.mean()
        wood_cov = self.layout_specs["Wood"]["starting_coverage"]
        return {
            "Wood": jnp.asarray(grad * wood_cov, jnp.float32),
            "Stone": jnp.asarray(grad[::-1] * wood_cov, jnp.float32),
        }

    def source_prob_maps(self, state: EnvState, key) -> Dict[str, jnp.ndarray]:
        return self._static_prob_maps

    # ------------------------------------------------------------------
    # reset
    # ------------------------------------------------------------------
    def _sample_resource_layout(self, key, source_prob, coverage, clumpiness, empty):
        """One resource's rejection-sampled source layout
        (dynamic_layout.py:333-365)."""
        clump = 1.0 - np.clip(clumpiness, 0.0, 0.99)
        prob = source_prob * 0.1 * clump
        k_tmp, k_grow = jax.random.split(key)
        tmp0 = jax.random.uniform(k_tmp, prob.shape)
        maybe0 = (tmp0 < prob) & empty

        # Phase 1: scale the threshold field down until coverage*clump is met.
        def cond1(c):
            tmp, maybe, i = c
            return (jnp.mean(maybe.astype(jnp.float32)) < coverage * clump) & (i < 200)

        def body1(c):
            tmp, _maybe, i = c
            tmp = tmp * 0.9
            return tmp, (tmp < prob) & empty, i + 1

        _, maybe, _ = jax.lax.while_loop(cond1, body1, (tmp0, maybe0, 0))

        # Phase 2: grow clumps with random binary kernels until target
        # coverage is met (bounded; converges in a couple of iterations).
        def cond2(c):
            maybe, _k, i = c
            return (jnp.mean(maybe.astype(jnp.float32)) < coverage) & (i < 30)

        def body2(c):
            maybe, k, i = c
            k, k_kern, k_noise = jax.random.split(k, 3)
            kernel = (jax.random.normal(k_kern, (7, 7)) > 0).astype(jnp.float32)
            field = (
                maybe.astype(jnp.float32)
                + 0.2 * jax.random.normal(k_noise, maybe.shape)
                - 0.25
            )
            grown = _conv2d_same(field, kernel) > 0
            return (grown | maybe) & empty, k, i + 1

        maybe, _, _ = jax.lax.while_loop(cond2, body2, (maybe, k_grow, 0))
        return maybe

    def reset_layout(self, state: EnvState, key) -> EnvState:
        """Rejection-sample wood/stone source layouts within coverage bounds
        (dynamic_layout.py:313-392)."""
        spec = self.spec
        hw = (spec.height, spec.width)
        key, k_probs = jax.random.split(key)
        prob_maps = self.source_prob_maps(state, k_probs)
        cov_w = self.layout_specs["Wood"]["starting_coverage"]
        cov_s = self.layout_specs["Stone"]["starting_coverage"]

        def attempt(key):
            kw, ks = jax.random.split(key)
            empty = jnp.ones(hw, jnp.bool_)
            wood = self._sample_resource_layout(
                kw, prob_maps["Wood"], cov_w, self.clumpiness["Wood"], empty
            )
            stone = self._sample_resource_layout(
                ks, prob_maps["Stone"], cov_s, self.clumpiness["Stone"], empty & ~wood
            )
            def happy(m, cov):
                q = jnp.mean(m.astype(jnp.float32)) / cov
                return (q >= 1.0 / 1.4) & (q <= 1.4)
            return wood, stone, happy(wood, cov_w) & happy(stone, cov_s)

        def cond(c):
            _w, _s, ok, _k, i = c
            return (~ok) & (i < 100)

        def body(c):
            _w, _s, _ok, k, i = c
            k, ka = jax.random.split(k)
            w, s, ok = attempt(ka)
            return w, s, ok, k, i + 1

        zeros = jnp.zeros(hw, jnp.bool_)
        wood, stone, _, _, _ = jax.lax.while_loop(
            cond, body, (zeros, zeros, jnp.array(False), key, 0)
        )

        if self._checker_source_blocks:
            wood = wood & self._checker_mask
            stone = stone & self._checker_mask

        maps = spec.init_maps()
        maps["Wood"] = wood.astype(jnp.float32)
        maps["WoodSourceBlock"] = wood.astype(jnp.float32)
        maps["Stone"] = stone.astype(jnp.float32)
        maps["StoneSourceBlock"] = stone.astype(jnp.float32)
        return state.replace(maps=maps)

    def reset_agent_states(self, state: EnvState, key) -> EnvState:
        """Clear inventories, grant starting coin, and place agents uniformly
        over accessible unoccupied tiles (dynamic_layout.py:394-431)."""
        spec = self.spec
        n = spec.n_agents
        inv = jnp.zeros_like(state.inventory)
        inv = inv.at[:, spec.res_idx("Coin")].set(self.starting_agent_coin)
        state = state.replace(
            inventory=inv,
            escrow=jnp.zeros_like(state.escrow),
            endogenous=jnp.zeros_like(state.endogenous),
            p_inventory=jnp.zeros_like(state.p_inventory),
            p_escrow=jnp.zeros_like(state.p_escrow),
            loc=-jnp.ones((n, 2), jnp.int32),
        )
        access = W.accessibility(spec, state)  # [N, H, W]
        k_perm, k_place = jax.random.split(key)
        order = jax.random.permutation(k_perm, n)
        place_keys = jax.random.split(k_place, n)

        def body(carry, i):
            loc, occ = carry
            valid = access[i] & ~occ
            logits = jnp.where(valid.reshape(-1), 0.0, -jnp.inf)
            flat = jax.random.categorical(place_keys[i], logits)
            r, c = flat // spec.width, flat % spec.width
            loc = loc.at[i, 0].set(r.astype(jnp.int32)).at[i, 1].set(
                c.astype(jnp.int32)
            )
            occ = occ.at[r, c].set(True)
            return (loc, occ), None

        occ0 = jnp.zeros((spec.height, spec.width), jnp.bool_)
        (loc, _), _ = jax.lax.scan(body, (state.loc, occ0), order)
        return state.replace(loc=loc)

    def init_scen_state(self):
        n = self.n_agents
        return {
            "curr_metric_a": jnp.zeros((n,), jnp.float32),
            "curr_metric_p": jnp.zeros((), jnp.float32),
            "auto_warmup_integrator": jnp.zeros((), jnp.int32),
        }

    def additional_reset(self, state: EnvState, key) -> EnvState:
        m_a, m_p = self._optimization_metrics(state)
        scen = dict(state.scen)
        scen["curr_metric_a"] = m_a
        scen["curr_metric_p"] = m_p
        return state.replace(scen=scen)

    # ------------------------------------------------------------------
    # dynamics
    # ------------------------------------------------------------------
    def step(self, state: EnvState, key, draws=None) -> EnvState:
        """Stochastic resource regrowth (dynamic_layout.py:433-471).

        `draws` (parity injection): {"regrow": [2, H, W] float32} — the uniform
        fields the reference draws as np.random.rand(H, W) for Wood then Stone
        (dynamic_layout.py:445-471).
        """
        spec = self.spec
        maps = dict(state.maps)
        empty = W.empty_map(spec, state)
        keys = jax.random.split(key, 2)
        for idx, (kk, res) in enumerate(zip(keys, ("Wood", "Stone"))):
            cfg = self.layout_specs[res]
            d = 1 + 2 * cfg["regen_halfwidth"]
            res_map = maps[res]
            src = maps[f"{res}SourceBlock"]
            spawnable = ((empty | (res_map > 0) | (src > 0)) & (src > 0))
            health = jnp.maximum(res_map, src)
            if d == 1:
                regen_prob = cfg["regen_weight"] * health
            else:
                kernel = jnp.full((d, d), cfg["regen_weight"] / (d * d))
                regen_prob = _conv2d_same(health, kernel)
            if draws is not None:
                uniforms = jnp.asarray(draws["regrow"][idx], jnp.float32)
            else:
                uniforms = jax.random.uniform(kk, res_map.shape)
            respawn = (uniforms < regen_prob) & spawnable
            maps[res] = jnp.minimum(
                res_map + respawn.astype(jnp.float32), float(cfg["max_health"])
            )
        return state.replace(maps=maps)

    # ------------------------------------------------------------------
    # observation / reward
    # ------------------------------------------------------------------
    def energy_weight(self, state: EnvState) -> jnp.ndarray:
        """Energy-cost annealing progress (dynamic_layout.py:218-236)."""
        if self.energy_warmup_constant <= 0.0:
            return jnp.ones(())
        if self.energy_warmup_method == "decay":
            prog = state.completions.astype(jnp.float32)
        else:
            prog = state.scen["auto_warmup_integrator"].astype(jnp.float32)
        return 1.0 - jnp.exp(-prog / self.energy_warmup_constant)

    def _optimization_metrics(self, state: EnvState):
        spec = self.spec
        coin = state.total_endowment(spec.res_idx("Coin"))
        labor = state.endogenous[:, spec.endo_idx("Labor")]
        m_a = rewards.isoelastic_coin_minus_labor(
            coin, labor, self.isoelastic_eta,
            self.energy_weight(state) * self.energy_cost,
        )
        if self.planner_reward_type == "coin_eq_times_productivity":
            m_p = rewards.coin_eq_times_productivity(
                coin, 1.0 - self.mixing_weight_gini_vs_coin
            )
        elif self.planner_reward_type == "inv_income_weighted_coin_endowments":
            m_p = rewards.inv_income_weighted_coin_endowments(coin)
        elif self.planner_reward_type == "inv_income_weighted_utility":
            m_p = rewards.inv_income_weighted_utility(coin, m_a)
        else:
            raise NotImplementedError(self.planner_reward_type)
        return m_a.astype(jnp.float32), m_p.astype(jnp.float32)

    def _idx_maps(self, state: EnvState) -> jnp.ndarray:
        """Owner + agent-location index maps, +2-encoded with 0 = none
        (dynamic_layout.py:497-501)."""
        spec = self.spec
        own = W.owner_state(spec, state)
        lm = W.loc_map(spec, state.loc)
        idx_maps = jnp.concatenate([own, lm[None]], axis=0) + 2
        return jnp.where(idx_maps == 1, 0, idx_maps).astype(jnp.float32)

    def obs(self, state: EnvState):
        spec = self.spec
        H, Wd = spec.height, spec.width
        curr_map = W.map_state(spec, state)  # [C, H, W]
        idx_maps = self._idx_maps(state)  # [P+1, H, W]

        loc_row = state.loc[:, 0].astype(jnp.float32) / H
        loc_col = state.loc[:, 1].astype(jnp.float32) / Wd
        inv_scaled = {
            f"inventory-{r}": state.inventory[:, spec.res_idx(r)] * self.inv_scale
            for r in spec.resources
        }

        p_obs = {
            f"inventory-{r}": state.p_inventory[spec.res_idx(r)] * self.inv_scale
            for r in spec.resources
        }
        if self._planner_gets_spatial_info:
            p_obs["map"] = curr_map
            p_obs["idx_map"] = idx_maps

        a_obs: Dict[str, jnp.ndarray] = dict(inv_scaled)
        pa_obs: Dict[str, jnp.ndarray] = {}
        agent_ids = jnp.arange(spec.n_agents, dtype=jnp.float32)

        if self._full_observability:
            my_idx = jnp.broadcast_to(idx_maps, (spec.n_agents,) + idx_maps.shape)
            me = agent_ids[:, None, None, None] + 2
            my_idx = jnp.where(my_idx == me, 1.0, my_idx)
            a_obs["map"] = jnp.broadcast_to(
                curr_map, (spec.n_agents,) + curr_map.shape
            )
            a_obs["idx_map"] = my_idx
        else:
            w = self._obs_range
            # Pad with an extra all-ones channel marking in-bounds area
            # (dynamic_layout.py:541-546).
            ones_ch = jnp.ones((1, H, Wd), jnp.float32)
            # Egocentric windows through the envs-on-lanes op
            # (ops/windows.py): single-env this is N dynamic slices; under
            # the training vmap it lowers to a Pallas kernel with the env
            # batch on the lane dimension, replacing round 3's one-hot
            # einsum pair (4096 tiny [44x35]x[35x315] matmuls,
            # occupancy-bound at ~6.4 ms/step — PROFILE_r03.json). Map and
            # idx channels share one stacked extraction so the map block is
            # read once per step.
            nc = curr_map.shape[0] + 1  # map channels + ones channel
            padded = jnp.pad(
                jnp.concatenate([curr_map, ones_ch, idx_maps], axis=0),
                ((0, 0), (w, w), (w, w)),
            )
            vis = self._windows_op(padded, state.loc)  # [N, M, K, K]
            vis_map = vis[:, :nc]
            vis_idx = vis[:, nc:]
            me = agent_ids[:, None, None, None] + 2
            vis_idx = jnp.where(vis_idx == me, 1.0, vis_idx)
            a_obs["map"] = vis_map
            a_obs["idx_map"] = vis_idx
            a_obs["loc-row"] = loc_row
            a_obs["loc-col"] = loc_col
            pa_obs = dict(inv_scaled)
            if self._planner_gets_spatial_info:
                pa_obs["loc-row"] = loc_row
                pa_obs["loc-col"] = loc_col

        return {"a": a_obs, "p": p_obs, "pa": pa_obs}

    def reward(self, state: EnvState):
        """Marginal-utility rewards (dynamic_layout.py:580-620)."""
        prev_a = state.scen["curr_metric_a"]
        prev_p = state.scen["curr_metric_p"]
        m_a, m_p = self._optimization_metrics(state)
        rew_a = m_a - prev_a
        rew_p = m_p - prev_p
        integ = state.scen["auto_warmup_integrator"] + (
            jnp.mean(rew_a) > 0
        ).astype(jnp.int32)
        scen = dict(state.scen)
        scen.update(
            curr_metric_a=m_a, curr_metric_p=m_p, auto_warmup_integrator=integ
        )
        return state.replace(scen=scen), {"a": rew_a, "p": rew_p}

    # ------------------------------------------------------------------
    def metrics(self, state: EnvState):
        """Social metrics / endowments / labor annealing
        (dynamic_layout.py:647-702)."""
        spec = self.spec
        coin = state.total_endowment(spec.res_idx("Coin"))
        util = state.scen["curr_metric_a"]
        out = {
            "social/productivity": social_metrics.get_productivity(coin),
            "social/equality": social_metrics.get_equality(coin),
            "social_welfare/coin_eq_times_productivity":
                rewards.coin_eq_times_productivity(coin, 1.0),
            "social_welfare/inv_income_weighted_coin_endow":
                rewards.inv_income_weighted_coin_endowments(coin),
            "social_welfare/inv_income_weighted_utility":
                rewards.inv_income_weighted_utility(coin, util),
        }
        for i in range(spec.n_agents):
            for r in spec.resources:
                out[f"endow/{i}/{r}"] = state.total_endowment(spec.res_idx(r))[i]
            for e in spec.endogenous:
                out[f"endogenous/{i}/{e}"] = state.endogenous[i, spec.endo_idx(e)]
            out[f"util/{i}"] = util[i]
        for r in spec.resources:
            out[f"endow/p/{r}"] = state.p_inventory[spec.res_idx(r)]
        out[f"util/p"] = state.scen["curr_metric_p"]
        out["labor/weighted_cost"] = self.energy_cost * self.energy_weight(state)
        out["labor/warmup_integrator"] = state.scen["auto_warmup_integrator"]
        return out


@scenario_registry.add
class MultiZone(Uniform):
    """Zoned wood/stone layout (dynamic_layout.py:705-872)."""

    name = "multi_zone/simple_wood_and_stone"

    def __init__(
        self,
        spec,
        components,
        env,
        num_partitions_row=8,
        num_partitions_col=8,
        num_wood_zones=6,
        num_stone_zones=6,
        num_wood_and_stone_zones=4,
        **kwargs,
    ):
        self.num_partitions_row = int(num_partitions_row)
        self.num_partitions_col = int(num_partitions_col)
        self.zone_counts = (
            int(num_wood_zones),
            int(num_stone_zones),
            int(num_wood_and_stone_zones),
        )
        super().__init__(spec, components, env, **kwargs)

    def source_prob_maps(self, state: EnvState, key):
        """Randomly shuffle zone assignments per reset
        (dynamic_layout.py:778-864)."""
        H, Wd = self.spec.height, self.spec.width
        pr, pc = self.num_partitions_row, self.num_partitions_col
        n_regions = pr * pc
        n_wood, n_stone, n_both = self.zone_counts
        n_zones = n_wood + n_stone + n_both
        assert n_regions >= n_zones

        zone_ids = jnp.concatenate(
            [
                jnp.zeros((n_wood,), jnp.int32),
                jnp.ones((n_stone,), jnp.int32),
                jnp.full((n_both,), 2, jnp.int32),
                jnp.full((n_regions - n_zones,), -1, jnp.int32),
            ]
        )
        zone_ids = jax.random.permutation(key, zone_ids).reshape(pr, pc)

        psr = -(-H // pr)
        psc = -(-Wd // pc)

        def expand(mask):
            big = jnp.kron(mask.astype(jnp.float32), jnp.ones((psr, psc)))
            big = big[:H, :Wd]
            return big / jnp.maximum(big.mean(), 1e-9)

        wood_prob = expand((zone_ids == 0) | (zone_ids == 2))
        stone_prob = expand((zone_ids == 1) | (zone_ids == 2))
        cov = self.layout_specs["Wood"]["starting_coverage"]
        return {"Wood": wood_prob * cov, "Stone": stone_prob * cov}


@scenario_registry.add
class Quadrant(Uniform):
    """Water cross divides the map into quadrants; wood left, stone top
    (dynamic_layout.py:875-1021)."""

    name = "quadrant/simple_wood_and_stone"
    required_entities = ["Wood", "Stone", "Water"]

    def __init__(self, spec, components, env, **kwargs):
        super().__init__(spec, components, env, **kwargs)
        H, Wd = spec.height, spec.width
        o0, o1 = 0.2, 0.35
        rN = (0.5 + np.arange(H)) / H
        cN = (0.5 + np.arange(Wd)) / Wd
        rSeg = ((rN < o0) | (rN > o1)) & ((rN < 1 - o1) | (rN > 1 - o0))
        cSeg = ((cN < o0) | (cN > o1)) & ((cN < 1 - o1) | (cN > 1 - o0))
        water = np.zeros((H, Wd))
        water[:, H // 2] = rSeg
        water[Wd // 2, :] = cSeg
        self._water = jnp.asarray(water, jnp.float32)

        probs = {}
        for k, v in self._static_prob_maps.items():
            v = v * (1.0 - self._water)
            probs[k] = v / jnp.sum(v)
        self._static_prob_maps = probs

    def make_source_prob_maps(self):
        H, Wd = self.spec.height, self.spec.width
        g = self.gradient_steepness / 2
        w_grad = (np.arange(H, dtype=np.float64)[:, None].repeat(Wd, axis=1) ** g)[
            ::-1
        ]
        s_grad = (np.arange(Wd, dtype=np.float64)[None].repeat(H, axis=0) ** g)[
            :, ::-1
        ]
        tot = s_grad + w_grad
        s_grad, w_grad = tot * s_grad, tot * w_grad
        return {
            "Stone": jnp.asarray(s_grad / s_grad.sum(), jnp.float32),
            "Wood": jnp.asarray(w_grad / w_grad.sum(), jnp.float32),
        }

    def reset_layout(self, state: EnvState, key) -> EnvState:
        state = super().reset_layout(state, key)
        H, Wd = self.spec.height, self.spec.width
        maps = dict(state.maps)
        water_line = self._water > 0
        for k in list(maps.keys()):
            if k.endswith("__owner"):
                maps[k] = jnp.where(water_line, -1, maps[k])
            elif k != "Water":
                maps[k] = jnp.where(water_line, 0.0, maps[k])
        maps["Water"] = self._water
        return state.replace(maps=maps)
