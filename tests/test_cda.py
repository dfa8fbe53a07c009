"""ContinuousDoubleAuction tests: matching oracle fuzz + market invariants.

The oracle re-implements the documented matching semantics of the reference
(continuous_double_auction.py:231-350) in plain Python and fuzz-compares the
TPU kernel's trade sequence and surviving books against it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet
from ai_economist_tpu.components.cda import ContinuousDoubleAuction


def oracle_match(bid_list, ask_list, n_agents):
    """Reference-semantics matching: price-time priority, earlier-order price,
    no self-trade, per-buyer possible flags with restarts."""
    bids = sorted(bid_list, key=lambda b: (b["price"], b["lifetime"]), reverse=True)
    asks = sorted(ask_list, key=lambda a: (a["price"], -a["lifetime"]))
    possible = [True] * n_agents
    keep = True
    trades = []
    while any(possible) and keep:
        ib = ia = 0
        while True:
            if ib >= len(bids):
                keep = False
                break
            if not possible[bids[ib]["buyer"]]:
                ib += 1
            elif ia >= len(asks):
                possible[bids[ib]["buyer"]] = False
                break
            elif asks[ia]["seller"] == bids[ib]["buyer"]:
                ia += 1
            elif bids[ib]["price"] < asks[ia]["price"]:
                possible[bids[ib]["buyer"]] = False
                break
            else:
                b = bids.pop(ib)
                a = asks.pop(ia)
                price = a["price"] if b["lifetime"] <= a["lifetime"] else b["price"]
                trades.append((b["buyer"], a["seller"], price))
                break
    return trades, bids, asks


def make_component(n_agents=4, max_orders=3):
    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("ContinuousDoubleAuction", {"max_num_orders": max_orders}),
            ("Gather", {}),
        ],
        n_agents=n_agents,
        world_size=[15, 15],
        episode_length=50,
    )
    return env, env.get_component("ContinuousDoubleAuction")


@pytest.fixture(scope="module")
def setup():
    return make_component()


def run_kernel_match(comp, bid_orders, ask_orders):
    N, M = comp.n_agents, comp.M
    bp = np.zeros((N, M), np.int32)
    bl = np.zeros((N, M), np.int32)
    ba = np.zeros((N, M), bool)
    ap = np.zeros((N, M), np.int32)
    al = np.zeros((N, M), np.int32)
    aa = np.zeros((N, M), bool)
    slot_b = [0] * N
    slot_a = [0] * N
    for o in bid_orders:
        i = o["buyer"]
        bp[i, slot_b[i]], bl[i, slot_b[i]], ba[i, slot_b[i]] = (
            o["price"], o["lifetime"], True,
        )
        slot_b[i] += 1
    for o in ask_orders:
        i = o["seller"]
        ap[i, slot_a[i]], al[i, slot_a[i]], aa[i, slot_a[i]] = (
            o["price"], o["lifetime"], True,
        )
        slot_a[i] += 1
    out = jax.jit(comp._match)(
        jnp.asarray(bp), jnp.asarray(bl), jnp.asarray(ba),
        jnp.asarray(ap), jnp.asarray(al), jnp.asarray(aa),
    )
    (b_act, a_act, t_buyer, t_seller, t_price, _t_bidp, _t_askp,
     _t_bidl, _t_askl, t_count) = map(np.asarray, out)
    n = int(t_count)
    trades = list(zip(t_buyer[:n].tolist(), t_seller[:n].tolist(), t_price[:n].tolist()))
    return trades, b_act, a_act


def test_match_simple_cross(setup):
    _, comp = setup
    # Buyer 0 bids 5; seller 1 asks 3 (older ask) -> trade at ask price 3.
    trades, *_ = run_kernel_match(
        comp,
        [dict(buyer=0, price=5, lifetime=0)],
        [dict(seller=1, price=3, lifetime=2)],
    )
    assert trades == [(0, 1, 3)]


def test_match_bid_price_when_bid_older(setup):
    _, comp = setup
    trades, *_ = run_kernel_match(
        comp,
        [dict(buyer=0, price=5, lifetime=4)],
        [dict(seller=1, price=3, lifetime=1)],
    )
    assert trades == [(0, 1, 5)]


def test_no_self_trade(setup):
    _, comp = setup
    trades, *_ = run_kernel_match(
        comp,
        [dict(buyer=0, price=5, lifetime=0)],
        [dict(seller=0, price=3, lifetime=2)],
    )
    assert trades == []


def test_no_cross_no_trade(setup):
    _, comp = setup
    trades, *_ = run_kernel_match(
        comp,
        [dict(buyer=0, price=2, lifetime=0)],
        [dict(seller=1, price=7, lifetime=0)],
    )
    assert trades == []


def test_match_fuzz_vs_oracle(setup):
    _, comp = setup
    rng = np.random.default_rng(0)
    N, M = comp.n_agents, comp.M
    for trial in range(40):
        bid_orders, ask_orders = [], []
        # Distinct (price, lifetime) pairs per side avoid tie-order ambiguity
        # in the oracle list representation.
        used_b, used_a = set(), set()
        for i in range(N):
            for _ in range(rng.integers(0, M + 1)):
                p, l = int(rng.integers(0, 11)), int(rng.integers(0, 6))
                if (p, l) not in used_b:
                    used_b.add((p, l))
                    bid_orders.append(dict(buyer=i, price=p, lifetime=l))
            for _ in range(rng.integers(0, M + 1)):
                p, l = int(rng.integers(0, 11)), int(rng.integers(0, 6))
                if (p, l) not in used_a:
                    used_a.add((p, l))
                    ask_orders.append(dict(seller=i, price=p, lifetime=l))
        got, b_act, a_act = run_kernel_match(comp, bid_orders, ask_orders)
        want, rem_bids, rem_asks = oracle_match(bid_orders, ask_orders, N)
        assert got == want, f"trial {trial}: {got} != {want}"
        # Surviving order counts agree.
        assert b_act.sum() == len(rem_bids), f"trial {trial} bids"
        assert a_act.sum() == len(rem_asks), f"trial {trial} asks"


def test_cda_episode_invariants(setup):
    env, comp = setup
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
    coin_i = env.world.res_idx("Coin")
    # Seed agents with coin + goods so trading actually happens.
    inv = state.inventory.at[:, coin_i].set(20.0)
    inv = inv.at[:, env.world.res_idx("Wood")].set(3.0)
    inv = inv.at[:, env.world.res_idx("Stone")].set(3.0)
    state = state.replace(inventory=inv)
    total_coin0 = float(
        state.inventory[:, coin_i].sum() + state.escrow[:, coin_i].sum()
    )

    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    saw_trade = False
    for t in range(30):
        key, k = jax.random.split(key)
        logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
        acts = jax.random.categorical(k, logits, axis=-1)
        state, obs, rew, done, _ = step(state, {"a": acts})
        esc = np.asarray(state.escrow)
        assert (esc >= -1e-5).all(), f"escrow negative at t={t}: {esc}"
        cs = state.comp["ContinuousDoubleAuction"]
        n_orders = np.asarray(cs["n_orders"])
        assert (n_orders >= 0).all() and (n_orders <= comp.max_num_orders).all()
        # Books and histograms stay consistent.
        for ci in range(len(comp.commodities)):
            assert np.isclose(
                np.asarray(cs["bid_hist"][ci]).sum(),
                np.asarray(cs["bids"]["active"][ci]).sum(),
            )
            assert np.isclose(
                np.asarray(cs["ask_hist"][ci]).sum(),
                np.asarray(cs["asks"]["active"][ci]).sum(),
            )
        if int(cs["n_trades"]) > 0:
            saw_trade = True
    # Coin is conserved through trading (no Build component payments at play
    # beyond initial grant; gather adds no coin).
    total_coin1 = float(
        state.inventory[:, coin_i].sum() + state.escrow[:, coin_i].sum()
    )
    assert abs(total_coin0 - total_coin1) < 1e-3
    assert saw_trade, "expected at least one executed trade in 30 random steps"
