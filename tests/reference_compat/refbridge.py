"""Bridge to the actual reference implementation (/root/reference).

This module lets the test suite run the REAL salesforce/ai-economist engine
side by side with the TPU engine and assert bit-exact trajectory parity:

  1. `get_foundation()` imports the reference package with three module stubs
     (`lz4`, `Crypto`, `GPUtil`) which the reference only uses for episode-log
     IO, its RSA activation gate, and GPU detection — none of which affect
     simulation semantics.
  2. `DrawRecorder` patches the reference's step-time RNG call sites
     (World.get_random_order_agents — reference world.py:417-422, move.rand —
     reference move.py:8+138, np.random.rand — reference
     dynamic_layout.py:459) so draws come from a private RandomState and are
     recorded, tagged by semantic site.
  3. `extract_state` converts a freshly-reset reference env into a TPU
     EnvState (maps, owners, agent locs/inventories/skills), sidestepping
     reset-time RNG parity entirely.
  4. `build_gather_draws` / `build_regrow_draws` repackage the recorded draws
     into the `draws=` injection pytrees consumed by TpuEnv.step.
  5. `assert_state_matches` compares full world/agent state between engines.

The reference itself exposes this record/replay idea as its replay-log
mechanism (reference base_env.py:454-471, :896, :980-982); we record the
semantic draws instead of raw MT19937 seed states because the TPU engine uses
threefry keys.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_FOUNDATION = None


def get_foundation():
    """Import the reference foundation package (cached), stubbing lz4/Crypto/
    GPUtil which are unavailable here and irrelevant to simulation parity."""
    global _FOUNDATION
    if _FOUNDATION is not None:
        return _FOUNDATION

    if "lz4" not in sys.modules:
        lz4 = types.ModuleType("lz4")
        lz4.frame = types.ModuleType("lz4.frame")
        lz4.frame.compress = lambda b, **k: b
        lz4.frame.decompress = lambda b, **k: b
        sys.modules["lz4"] = lz4
        sys.modules["lz4.frame"] = lz4.frame
    if "Crypto" not in sys.modules:
        crypto = types.ModuleType("Crypto")
        sys.modules["Crypto"] = crypto
        for sub in (
            "Crypto.Cipher", "Crypto.PublicKey", "Crypto.Signature", "Crypto.Hash",
            "Crypto.Cipher.PKCS1_OAEP", "Crypto.PublicKey.RSA",
            "Crypto.Signature.pkcs1_15", "Crypto.Hash.SHA256",
        ):
            sys.modules[sub] = types.ModuleType(sub)
    if "GPUtil" not in sys.modules:
        gputil = types.ModuleType("GPUtil")
        gputil.getGPUs = lambda *a, **k: []
        gputil.getAvailable = lambda *a, **k: []
        sys.modules["GPUtil"] = gputil

    # The reference predates numpy 1.24: restore the removed scalar aliases
    # it uses (np.int in layout_from_file.py:211-213, np.float/np.bool
    # elsewhere). Test-process-only compat shim, like the lz4/Crypto stubs.
    for alias, builtin in (("int", int), ("float", float), ("bool", bool),
                           ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ai_economist import foundation  # noqa: PLC0415

    _FOUNDATION = foundation
    return foundation


class DrawRecorder:
    """Patch the reference's step-time RNG call sites; record every draw.

    All patched sites draw from a private RandomState so the recorded stream
    is reproducible and independent of global numpy state. Use as a context
    manager; call `begin_step()` before each reference env.step and
    `end_step()` after to collect that step's draws:

      {"perms": [perm per get_random_order_agents call, in call order],
       "move_rands": [one float per reference gather event, in event order],
       "rand_fields": [np.random.rand(*shape) results, in call order]}
    """

    def __init__(self, seed: int = 1234):
        self.rs = np.random.RandomState(seed)
        self._perms = []
        self._move_rands = []
        self._rand_fields = []
        self._uniform_fields = []

    # --- patched call sites -------------------------------------------------
    def _move_rand(self):
        v = float(self.rs.rand())
        self._move_rands.append(v)
        return v

    def _np_rand(self, *shape):
        """np.random.rand patched globally; draws are TAGGED by the calling
        function's name so new call sites can't silently confuse consumers
        (e.g. 'scenario_step' = regrowth fields, dynamic_layout.py:461)."""
        v = self.rs.rand(*shape)
        caller = sys._getframe(1).f_code.co_name
        self._rand_fields.append((caller, np.array(v, copy=True)))
        return v

    def _np_uniform(self, low=0.0, high=1.0, size=None):
        """np.random.uniform, tagged by caller — used by the Saez warmup
        random rates (reference redistribution.py:452-456)."""
        v = self.rs.uniform(low, high, size)
        caller = sys._getframe(1).f_code.co_name
        self._uniform_fields.append((caller, np.array(v, copy=True)))
        return v

    def __enter__(self):
        get_foundation()  # ensures the reference modules are imported
        ref_move = sys.modules["ai_economist.foundation.components.move"]
        ref_world = sys.modules["ai_economist.foundation.base.world"]

        self._ref_move = ref_move
        self._ref_world = ref_world
        self._orig_move_rand = ref_move.rand
        ref_move.rand = self._move_rand

        rec = self
        self._orig_order = ref_world.World.get_random_order_agents

        def get_random_order_agents(world_self):
            perm = rec.rs.permutation(world_self.n_agents)
            rec._perms.append(np.array(perm, copy=True))
            agents = world_self.agents
            return [agents[i] for i in perm]

        ref_world.World.get_random_order_agents = get_random_order_agents

        self._orig_np_rand = np.random.rand
        np.random.rand = self._np_rand
        self._orig_np_uniform = np.random.uniform
        np.random.uniform = self._np_uniform
        return self

    def __exit__(self, *exc):
        self._ref_move.rand = self._orig_move_rand
        self._ref_world.World.get_random_order_agents = self._orig_order
        np.random.rand = self._orig_np_rand
        np.random.uniform = self._orig_np_uniform
        return False

    def begin_step(self):
        self._perms.clear()
        self._move_rands.clear()
        self._rand_fields.clear()
        self._uniform_fields.clear()

    def end_step(self):
        return {
            "perms": list(self._perms),
            "move_rands": list(self._move_rands),
            "rand_fields": list(self._rand_fields),
            "uniform_fields": list(self._uniform_fields),
        }


# ---------------------------------------------------------------------------
# State / action conversion
# ---------------------------------------------------------------------------


def extract_state(ref_env, tpu_env, key):
    """Build a TPU EnvState mirroring the reference env's current state.

    Maps, owners, agent locations/inventories/escrow/endogenous and all
    component-registered agent fields are copied; component private state is
    taken fresh from init (valid immediately after a reference reset).
    """
    import jax.numpy as jnp

    spec = tpu_env.world
    state = tpu_env.init_state(key)

    maps = dict(state.maps)
    for k in spec.map_keys:
        maps[k] = jnp.asarray(np.asarray(ref_env.world.maps.get(k)), jnp.float32)
    for p in spec.private:
        maps[f"{p}__owner"] = jnp.asarray(
            np.asarray(ref_env.world.maps.get(p, owner=True)), jnp.int32
        )

    n = spec.n_agents
    agents = [ref_env.get_agent(str(i)) for i in range(n)]
    loc = np.array([a.loc for a in agents], np.int32)
    inventory = np.zeros((n, spec.n_resources), np.float32)
    escrow = np.zeros((n, spec.n_resources), np.float32)
    for j, r in enumerate(spec.resources):
        inventory[:, j] = [a.state["inventory"][r] for a in agents]
        escrow[:, j] = [a.state["escrow"][r] for a in agents]
    endogenous = np.zeros((n, len(spec.endogenous)), np.float32)
    for j, e in enumerate(spec.endogenous):
        endogenous[:, j] = [a.state["endogenous"][e] for a in agents]

    agent_fields = dict(state.agent_fields)
    for fname in agent_fields:
        agent_fields[fname] = jnp.asarray(
            np.array([a.state[fname] for a in agents], np.float32)
        )

    planner = ref_env.world.planner
    p_inventory = np.array(
        [planner.state["inventory"].get(r, 0.0) for r in spec.resources], np.float32
    )
    p_escrow = np.array(
        [planner.state["escrow"].get(r, 0.0) for r in spec.resources], np.float32
    )

    state = state.replace(
        maps=maps,
        loc=jnp.asarray(loc),
        inventory=jnp.asarray(inventory),
        escrow=jnp.asarray(escrow),
        endogenous=jnp.asarray(endogenous),
        p_inventory=jnp.asarray(p_inventory),
        p_escrow=jnp.asarray(p_escrow),
    )
    # Run component resets so state-dependent private state initializes from
    # the injected inventories (e.g. PeriodicBracketTax.last_coin = current
    # endowment, reference redistribution.py:1109-1139) — then re-apply the
    # reference's sampled agent fields, which component resets resample.
    for comp in tpu_env.components:
        state = comp.reset(state, key)
    state = state.replace(agent_fields=agent_fields)
    # Initialize scenario reward trackers from the injected state, as the
    # reference does at the end of its reset (dynamic_layout.py:564-593).
    state = tpu_env.scenario.additional_reset(state, key)
    return state


def sample_masked_actions(ref_obs, n_agents, rng, planner_layout=None,
                          agent_layout=None):
    """Uniform random VALID actions from the reference's flattened masks.

    Returns (ref_actions, tpu_actions): the dict the reference step consumes
    and the {"a", "p"} arrays the TPU step consumes, encoding-identical
    (base_agent.py:407-438). Pass `agent_layout` with multi_action_mode set
    for multi-action mobiles: each agent then submits one sub-action per
    subspace (ref: a list; TPU: a [n_agents, n_subspaces] array), sampled
    per-subspace from that subspace's mask slice (incl. its NO-OP bit).
    """
    ref_actions = {}
    agents_multi = agent_layout is not None and agent_layout.multi_action_mode
    if agents_multi:
        a_flat = np.zeros((n_agents, agent_layout.n_subspaces), np.int32)
    else:
        a_flat = np.zeros((n_agents,), np.int32)
    for i in range(n_agents):
        mask = np.asarray(ref_obs[str(i)]["action_mask"]).ravel()
        if agents_multi:
            acts, off = [], 0
            for d in agent_layout.action_dims:
                sub = mask[off:off + d]
                valid = np.flatnonzero(sub > 0)
                acts.append(int(rng.choice(valid)))
                off += d
            assert off == mask.size
            ref_actions[str(i)] = acts
            a_flat[i] = acts
        else:
            valid = np.flatnonzero(mask > 0)
            a = int(rng.choice(valid))
            ref_actions[str(i)] = a
            a_flat[i] = a

    tpu_actions = {"a": a_flat}
    if planner_layout is not None and planner_layout.n_subspaces > 0:
        mask = np.asarray(ref_obs["p"]["action_mask"]).ravel()
        dims = planner_layout.action_dims  # (n+1) per subspace in multi mode
        p_acts, off = [], 0
        for d in dims:
            sub = mask[off:off + d]
            valid = np.flatnonzero(sub > 0)
            p_acts.append(int(rng.choice(valid)))
            off += d
        assert off == mask.size
        ref_actions["p"] = p_acts
        tpu_actions["p"] = np.array(p_acts, np.int32)
    return ref_actions, tpu_actions


def build_gather_draws(records, gather_events, tpu_env, gather_perm_index=0):
    """Repackage one step's recorded reference draws for the Gather component.

    gather_events: the reference Gather dense log for this step
    (move.py:144-151) — exactly one move.rand draw per event, in order.
    """
    spec = tpu_env.world
    n, colls = spec.n_agents, spec.collectibles
    order = records["perms"][gather_perm_index].astype(np.int32)
    bonus = np.ones((n, len(colls)), np.float32)
    move_rands = records["move_rands"]
    assert len(move_rands) == len(gather_events), (
        f"{len(move_rands)} rand() draws vs {len(gather_events)} gather events"
    )
    for v, ev in zip(move_rands, gather_events):
        bonus[int(ev["agent"]), colls.index(ev["resource"])] = v
    return {"order": order, "bonus": bonus}


def build_regrow_draws(records):
    """[2, H, W] uniforms in the reference's draw order: Wood then Stone
    (dynamic_layout.py:445-471). Filters on the 'scenario_step' caller tag."""
    fields = [a for tag, a in records["rand_fields"] if tag == "scenario_step"]
    assert len(fields) == 2, f"expected 2 regrowth fields, got {len(fields)}"
    return {"regrow": np.stack(fields).astype(np.float32)}


def build_saez_draws(records, n_brackets):
    """Saez warmup random-rate injection for this step: the [B] uniform the
    reference drew in compute_and_set_new_period_rates_from_saez_formula
    (redistribution.py:452-456), or zeros when the formula path ran (the
    injected value is unused there)."""
    fields = [
        a for tag, a in records["uniform_fields"]
        if tag == "compute_and_set_new_period_rates_from_saez_formula"
    ]
    assert len(fields) <= 1, f"expected <=1 saez uniform draw, got {len(fields)}"
    if fields:
        assert fields[0].shape == (n_brackets,)
        return {"saez_rates": fields[0].astype(np.float32)}
    return {"saez_rates": np.zeros((n_brackets,), np.float32)}


# ---------------------------------------------------------------------------
# Comparison
# ---------------------------------------------------------------------------


def assert_state_matches(ref_env, tpu_env, state, t, atol=1e-4):
    """Assert full world + agent state agreement between the two engines."""
    spec = tpu_env.world
    for k in spec.map_keys:
        np.testing.assert_allclose(
            np.asarray(state.maps[k]),
            np.asarray(ref_env.world.maps.get(k), dtype=np.float32),
            atol=atol,
            err_msg=f"map '{k}' diverged at t={t}",
        )
    for p in spec.private:
        np.testing.assert_array_equal(
            np.asarray(state.maps[f"{p}__owner"]),
            np.asarray(ref_env.world.maps.get(p, owner=True), dtype=np.int32),
            err_msg=f"owner map '{p}' diverged at t={t}",
        )

    n = spec.n_agents
    agents = [ref_env.get_agent(str(i)) for i in range(n)]
    np.testing.assert_array_equal(
        np.asarray(state.loc),
        np.array([a.loc for a in agents], np.int32),
        err_msg=f"agent locations diverged at t={t}",
    )
    for j, r in enumerate(spec.resources):
        np.testing.assert_allclose(
            np.asarray(state.inventory[:, j]),
            np.array([a.state["inventory"][r] for a in agents], np.float32),
            atol=atol,
            err_msg=f"inventory '{r}' diverged at t={t}",
        )
        np.testing.assert_allclose(
            np.asarray(state.escrow[:, j]),
            np.array([a.state["escrow"][r] for a in agents], np.float32),
            atol=atol,
            err_msg=f"escrow '{r}' diverged at t={t}",
        )
    for j, e in enumerate(spec.endogenous):
        np.testing.assert_allclose(
            np.asarray(state.endogenous[:, j]),
            np.array([a.state["endogenous"][e] for a in agents], np.float32),
            atol=atol,
            err_msg=f"endogenous '{e}' diverged at t={t}",
        )


def assert_obs_matches(ref_obs, tpu_obs, n_agents, t, atol=1e-4):
    """Assert observation-content parity between the engines.

    Compares, bit-for-bit up to float32 atol:
      * each agent's packaged "flat" vector (sorted-key concat — reference
        base_env.py:562-612 vs core/obs.py:24-48), catching any key naming,
        ordering, or value drift in what the policies actually consume;
      * every kept (multi-dim / put_in_both) tensor: world-map, world-idx_map,
        time, ...;
      * the planner's "flat", kept tensors, and per-agent "p<idx>" sub-obs
        (folded as the collated [N, F] "pa" tensor, base_env.py:694-698).
    Also asserts neither side carries obs tensors the other lacks.
    """
    # --- mobile agents (reference: one dict per agent idx; TPU: collated) ---
    tpu_a = tpu_obs["a"]
    for i in range(n_agents):
        ro = ref_obs[str(i)]
        for k, v in ro.items():
            if k == "action_mask":
                continue  # asserted separately (flattened) by every suite
            assert k in tpu_a, f"agent obs tensor '{k}' missing on TPU side (t={t})"
            ref_v = np.asarray(v, np.float32)
            tpu_v = np.asarray(tpu_a[k][i], np.float32)
            np.testing.assert_allclose(
                tpu_v, ref_v.reshape(tpu_v.shape), atol=atol,
                err_msg=f"agent {i} obs '{k}' diverged at t={t}",
            )
        extra = set(tpu_a) - set(ro) - {"action_mask"}
        assert not extra, f"TPU-only agent obs tensors {extra} (t={t})"

    # --- planner ---
    rp = ref_obs["p"]
    tpu_p = tpu_obs["p"]
    pa_keys = set()
    for k, v in rp.items():
        if k == "action_mask":
            continue
        ref_v = np.asarray(v, np.float32)
        if k[:1] == "p" and k[1:].isdigit():
            assert "pa" in tpu_p, f"planner per-agent obs missing on TPU side (t={t})"
            tpu_v = np.asarray(tpu_p["pa"][int(k[1:])], np.float32)
            pa_keys.add(k)
        else:
            assert k in tpu_p, f"planner obs tensor '{k}' missing on TPU side (t={t})"
            tpu_v = np.asarray(tpu_p[k], np.float32)
        np.testing.assert_allclose(
            tpu_v, ref_v.reshape(tpu_v.shape), atol=atol,
            err_msg=f"planner obs '{k}' diverged at t={t}",
        )
    extra = set(tpu_p) - set(rp) - {"action_mask", "pa"}
    assert not extra, f"TPU-only planner obs tensors {extra} (t={t})"
    if "pa" in tpu_p:
        assert len(pa_keys) == n_agents, (
            f"reference planner has {len(pa_keys)} p<idx> sub-obs, "
            f"TPU 'pa' implies {n_agents} (t={t})"
        )


def assert_rewards_match(ref_rew, tpu_rew, n_agents, t, atol=1e-4):
    ref_a = np.array([ref_rew[str(i)] for i in range(n_agents)], np.float32)
    np.testing.assert_allclose(
        np.asarray(tpu_rew["a"]), ref_a, atol=atol,
        err_msg=f"agent rewards diverged at t={t}",
    )
    np.testing.assert_allclose(
        np.asarray(tpu_rew["p"]), np.float32(ref_rew["p"]), atol=atol,
        err_msg=f"planner reward diverged at t={t}",
    )
