"""TpuEnv: environment construction and the jitted reset/step pipeline.

TPU-native engine with the capabilities of the reference BaseEnvironment
(ai_economist/foundation/base/base_env.py:178-1032). Construction wires
scenario + components statically (entity registration, action layouts, state
template); `reset` and `step` are pure functions of EnvState designed to be
`jax.jit`-compiled once and `jax.vmap`-batched over thousands of env replicas.

Pipeline parity with the reference `step` (base_env.py:929-1032):
  decode actions -> t += 1 -> component steps in config order -> scenario step
  -> observations -> rewards -> done.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ai_economist_tpu.core.component import component_registry
from ai_economist_tpu.core.entities import (
    endogenous_registry,
    landmark_registry,
    resource_registry,
)
from ai_economist_tpu.core.obs import package_obs
from ai_economist_tpu.core.scenario import scenario_registry
from ai_economist_tpu.core.spaces import ActionLayout, build_layouts
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.core.world import WorldSpec


class TpuEnv:
    """One environment build: static config + pure reset/step functions.

    Args mirror the reference constructor (base_env.py:118-166); scenario
    kwargs are forwarded to the scenario class.
    """

    def __init__(
        self,
        scenario_name: str,
        *,
        components: Sequence,
        n_agents: int,
        world_size: Sequence[int],
        episode_length: int = 1000,
        multi_action_mode_agents: bool = False,
        multi_action_mode_planner: bool = True,
        flatten_observations: bool = True,
        flatten_masks: bool = True,
        allow_observation_scaling: bool = True,
        seed: Optional[int] = None,
        **scenario_kwargs,
    ):
        scenario_cls = scenario_registry.get(scenario_name)
        assert n_agents >= 2, "need at least 2 mobile agents"
        self.scenario_name = scenario_name
        self.n_agents = int(n_agents)
        self.episode_length = int(episode_length)
        self.multi_action_mode_agents = bool(multi_action_mode_agents)
        self.multi_action_mode_planner = bool(multi_action_mode_planner)
        self._flatten_observations = bool(flatten_observations)
        self._flatten_masks = bool(flatten_masks)
        self._allow_observation_scaling = bool(allow_observation_scaling)
        self.inv_scale = 0.01 if allow_observation_scaling else 1.0
        self.seed = 42 if seed is None else int(seed)

        # --- entity registration (base_env.py:289-314) ---
        entities = {"resources": {"Coin"}, "landmarks": set(), "endogenous": {"Labor"}}

        def register(names):
            for e in names:
                if resource_registry.has(e):
                    entities["resources"].add(e)
                elif landmark_registry.has(e):
                    entities["landmarks"].add(e)
                elif endogenous_registry.has(e):
                    entities["endogenous"].add(e)
                else:
                    raise KeyError(f"Unknown entity: {e}")

        register(scenario_cls.required_entities)

        comp_specs = []
        for comp_spec in components:
            if isinstance(comp_spec, dict):
                assert len(comp_spec) == 1
                (comp_name, comp_kwargs), = comp_spec.items()
            else:
                comp_name, comp_kwargs = comp_spec
            cls = component_registry.get(comp_name)
            register(cls.required_entities)
            comp_specs.append((cls, comp_kwargs))

        self.world = WorldSpec.build(
            world_size,
            n_agents,
            sorted(entities["resources"]),
            sorted(entities["landmarks"]),
            sorted(entities["endogenous"]),
        )

        # --- component instantiation (config order preserved) ---
        self.components = []
        self._components_dict = {}
        for cls, kwargs in comp_specs:
            comp = cls(
                self.world,
                self.episode_length,
                inventory_scale=self.inv_scale,
                **kwargs,
            )
            self.components.append(comp)
            self._components_dict[comp.name] = comp
            self._components_dict[comp.short] = comp

        # --- action layouts ---
        self.layouts: Dict[str, ActionLayout] = build_layouts(
            self.components, self.multi_action_mode_agents, self.multi_action_mode_planner
        )

        # --- per-agent fields registered by components ---
        self._agent_field_defaults: Dict[str, float] = {}
        for comp in self.components:
            for k, v in comp.agent_fields("BasicMobileAgent").items():
                self._agent_field_defaults[k] = float(v)

        # --- scenario ---
        self.scenario = scenario_cls(self.world, self.components, self, **scenario_kwargs)

        # Saez external-rates component, if any (see maybe_saez_refresh).
        self._saez_external_comp = next(
            (c for c in self.components
             if getattr(c, "tax_model", None) == "saez"
             and getattr(c, "rates_external", False)),
            None,
        )

    # ------------------------------------------------------------------
    # properties
    # ------------------------------------------------------------------
    @property
    def resources(self):
        return list(self.world.resources)

    @property
    def landmarks(self):
        return list(self.world.landmarks)

    @property
    def endogenous(self):
        return list(self.world.endogenous)

    @property
    def agent_action_space(self) -> ActionLayout:
        return self.layouts["BasicMobileAgent"]

    @property
    def planner_action_space(self) -> ActionLayout:
        return self.layouts["BasicPlanner"]

    def get_component(self, name: str):
        return self._components_dict[name]

    # ------------------------------------------------------------------
    # state lifecycle
    # ------------------------------------------------------------------
    def init_state(self, key) -> EnvState:
        """Fresh state with zeroed persistent fields (pre-first-reset)."""
        spec = self.world
        n, r, e = spec.n_agents, spec.n_resources, len(spec.endogenous)
        state = EnvState(
            t=jnp.zeros((), jnp.int32),
            key=key,
            completions=jnp.zeros((), jnp.int32),
            maps=spec.init_maps(),
            loc=-jnp.ones((n, 2), jnp.int32),
            inventory=jnp.zeros((n, r), jnp.float32),
            escrow=jnp.zeros((n, r), jnp.float32),
            endogenous=jnp.zeros((n, e), jnp.float32),
            agent_fields={
                k: jnp.full((n,), v, jnp.float32)
                for k, v in self._agent_field_defaults.items()
            },
            p_inventory=jnp.zeros((r,), jnp.float32),
            p_escrow=jnp.zeros((r,), jnp.float32),
            comp={c.name: c.init_state() for c in self.components},
            scen=self.scenario.init_scen_state(),
        )
        return state

    def reset(self, state: EnvState, key=None) -> Tuple[EnvState, Dict]:
        """Episode reset preserving persistent cross-episode state.

        Mirrors base_env.py:852-927: layout reset, agent-state reset,
        component resets (with agent-field re-defaults), scenario extras.
        """
        if key is None:
            key, use = jax.random.split(state.key)
        else:
            key, use = jax.random.split(key)
        k_layout, k_agents, k_extra, *k_comps = jax.random.split(
            use, 3 + len(self.components)
        )
        spec = self.world
        # Clear spatial + agent state (fresh maps; inventories cleared by the
        # scenario's reset_agent_states).
        state = state.replace(
            t=jnp.zeros((), jnp.int32),
            key=key,
            maps=spec.init_maps(),
            loc=-jnp.ones((spec.n_agents, 2), jnp.int32),
            agent_fields={
                k: jnp.full((spec.n_agents,), v, jnp.float32)
                for k, v in self._agent_field_defaults.items()
            },
        )
        state = self.scenario.reset_layout(state, k_layout)
        state = self.scenario.reset_agent_states(state, k_agents)
        for comp, kc in zip(self.components, k_comps):
            state = comp.reset(state, kc)
        state = self.scenario.additional_reset(state, k_extra)
        return state, self.observations(state)

    def reset_fresh(self, key) -> Tuple[EnvState, Dict]:
        return self.reset(self.init_state(key))

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------
    def step(
        self,
        state: EnvState,
        actions: Dict[str, jnp.ndarray],
        draws: Optional[Dict[str, Any]] = None,
    ) -> Tuple[EnvState, Dict, Dict, jnp.ndarray, Dict]:
        """One env timestep. actions = {"a": ..., "p": ...}.

        "a": [N] int32 (single-action mode) or [N, S_a] (multi mode).
        "p": [S_p] int32 (multi mode, default) or scalar (single mode).
        Returns (state, obs, rew, done, info).

        `draws` (optional) injects explicit random draws in place of the
        key-derived ones — the RNG-injection mode used by the reference-parity
        harness (tests/reference_compat/): a dict keyed by component name plus
        "scenario", each value a component-specific pytree of recorded draws
        (see each component's `step` docstring). The reference records the
        equivalent numpy draws via its replay-log mechanism
        (reference base_env.py:454-471); injecting them here yields bit-exact
        trajectory parity despite the threefry-vs-MT19937 generator mismatch.
        """
        a_dec = self.layouts["BasicMobileAgent"].decode(
            jnp.asarray(actions.get("a", jnp.zeros((self.n_agents,), jnp.int32)))
        )
        p_layout = self.layouts["BasicPlanner"]
        if p_layout.n_subspaces > 0:
            default_p = jnp.zeros(
                (p_layout.n_subspaces,) if p_layout.multi_action_mode else (),
                jnp.int32,
            )
            p_dec = p_layout.decode(jnp.asarray(actions.get("p", default_p)))
        else:
            p_dec = {}

        key, k_scen, *k_comps = jax.random.split(state.key, 2 + len(self.components))
        state = state.replace(t=state.t + 1, key=key)

        for comp, kc in zip(self.components, k_comps):
            sub_a = {n: a_dec[n] for n in a_dec if n.split(".")[0] == comp.name}
            sub_p = {n: p_dec[n] for n in p_dec if n.split(".")[0] == comp.name}
            if draws is not None and comp.name in draws:
                state = comp.step(state, sub_a, sub_p, kc, draws=draws[comp.name])
            else:
                state = comp.step(state, sub_a, sub_p, kc)

        if draws is not None and "scenario" in draws:
            state = self.scenario.step(state, k_scen, draws=draws["scenario"])
        else:
            state = self.scenario.step(state, k_scen)

        obs = self.observations(state)
        state, rew = self.scenario.reward(state)
        done = state.t >= self.episode_length
        state = state.replace(
            completions=state.completions + done.astype(jnp.int32)
        )
        return state, obs, rew, done, {}

    # ------------------------------------------------------------------
    # batch-level hooks
    # ------------------------------------------------------------------
    def maybe_saez_refresh(self, states: EnvState) -> EnvState:
        """Apply the hoisted day-1 saez rates update to a BATCHED state.

        Identity unless a PeriodicBracketTax component was built with
        saez_rates_external=True. The batch runners (adapters/batched.py
        auto_reset_step) call this before the vmapped step; the scalar
        lax.cond is a real branch here — outside any vmap — so the saez
        formula (histograms + OLS over the R*S global buffer) runs only on
        steps where some replica enters a new tax period, not every step.
        In lockstep training the period boundary is env-invariant, matching
        the reference's once-per-period rate set (redistribution.py:952-961
        + tutorials/rllib/utils/remote.py:56-73)."""
        comp = self._saez_external_comp
        if comp is None:
            return states
        cycle = states.comp[comp.name]["tax_cycle_pos"]
        return jax.lax.cond(
            (cycle == 1).any(),
            comp.batch_rates_refresh,
            lambda s: s,
            states,
        )

    # ------------------------------------------------------------------
    # observations / masks
    # ------------------------------------------------------------------
    def observations(self, state: EnvState) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Assemble + package obs for "a" (collated mobiles) and "p" (planner).

        Key naming parity: scenario fields get a "world-" prefix, component
        fields a "<Component>-" prefix, plus "time" (base_env.py:644-675).
        """
        time_scale = self.episode_length if self._allow_observation_scaling else 1.0
        t_obs = state.t.astype(jnp.float32) / time_scale

        scen_obs = self.scenario.obs(state)
        a_obs = {f"world-{k}": v for k, v in scen_obs.get("a", {}).items()}
        p_obs = {f"world-{k}": v for k, v in scen_obs.get("p", {}).items()}
        pa_obs = {f"world-{k}": v for k, v in scen_obs.get("pa", {}).items()}
        a_obs["time"] = jnp.full((self.n_agents,), t_obs)
        p_obs["time"] = t_obs[None]

        for comp in self.components:
            co = comp.obs(state)
            a_obs.update({f"{comp.name}-{k}": v for k, v in co.get("a", {}).items()})
            p_obs.update({f"{comp.name}-{k}": v for k, v in co.get("p", {}).items()})
            pa_obs.update({f"{comp.name}-{k}": v for k, v in co.get("pa", {}).items()})

        if self._flatten_observations:
            a_out = package_obs(a_obs, batch_ndim=1)
            p_out = package_obs(p_obs, batch_ndim=0)
            if pa_obs:
                pa_out = package_obs(pa_obs, batch_ndim=1)
                # Reference folds each agent's flat sub-obs into the planner
                # obs as "p<idx>" (base_env.py:694-698); collated: [N, F].
                p_out["pa"] = pa_out["flat"]
        else:
            a_out, p_out = dict(a_obs), dict(p_obs)
            if pa_obs:
                p_out["pa"] = pa_obs

        a_mask, p_mask = self.action_masks(state)
        a_out["action_mask"] = a_mask
        p_out["action_mask"] = p_mask
        return {"a": a_out, "p": p_out}

    def action_masks(self, state: EnvState):
        """Flat [N, A_a] and [A_p] float32 masks (base_env.py:706-756)."""
        a_masks: Dict[str, jnp.ndarray] = {}
        p_masks: Dict[str, jnp.ndarray] = {}
        for comp in self.components:
            m = comp.masks(state)
            a_masks.update(m.get("a", {}))
            p_masks.update(m.get("p", {}))
        la, lp = self.layouts["BasicMobileAgent"], self.layouts["BasicPlanner"]
        if la.n_subspaces:
            a_flat = la.flatten_masks(a_masks)
        else:
            a_flat = jnp.ones((self.n_agents, 1), jnp.float32)
        if lp.n_subspaces:
            p_flat = lp.flatten_masks(p_masks)
        else:
            p_flat = jnp.ones((1,), jnp.float32)
        return a_flat, p_flat

    # ------------------------------------------------------------------
    # metrics
    # ------------------------------------------------------------------
    def metrics(self, state: EnvState) -> Dict[str, jnp.ndarray]:
        """Scenario + component metrics, "<shorthand>/<key>"-prefixed
        (base_env.py:421-432)."""
        out = dict(self.scenario.metrics(state) or {})
        for comp in self.components:
            for k, v in (comp.metrics(state) or {}).items():
                out[f"{comp.short}/{k}"] = v
        return out


def make_env_instance(scenario_name: str, **kwargs) -> TpuEnv:
    """Public constructor (reference foundation/__init__.py:16-18 analog)."""
    return TpuEnv(scenario_name, **kwargs)
