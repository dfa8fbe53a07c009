"""ContinuousDoubleAuction: escrow-backed commodity order books on device.

TPU-native rewrite of the reference CDA component
(ai_economist/foundation/components/continuous_double_auction.py:16-679).

Order books become fixed-capacity arrays: per commodity, each agent owns
`max_num_orders` bid slots and as many ask slots ([N, M] price/lifetime/
active arrays). Since the reference caps an agent's combined bids+asks per
commodity at M (continuous_double_auction.py:154-163), a free slot always
exists on a side whenever the combined count permits a new order.

Matching reproduces the reference state machine exactly
(continuous_double_auction.py:231-350): bids sorted by (price desc, lifetime
desc), asks by (price asc, lifetime desc), trade at the *earlier* order's
price, no self-trade, per-buyer possible-match flags with inner-loop restarts
after each trade. We flatten the nested loops into one bounded
`lax.while_loop` whose eight transitions mirror the reference's branch order;
"removed" orders become skip-transitions over inactive slots, which is
behaviorally identical to the reference's list pops. Tie-breaking uses agent
index ascending — the stable-sort insertion order the reference produces
(agents iterate in index order when creating orders,
continuous_double_auction.py:449-485).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ai_economist_tpu.core.component import Component, component_registry
from ai_economist_tpu.core.entities import resource_registry
from ai_economist_tpu.core.state import EnvState


@component_registry.add
class ContinuousDoubleAuction(Component):
    name = "ContinuousDoubleAuction"
    shorthand = "Trade"
    component_type = "Trade"
    required_entities = ["Coin", "Labor"]
    agent_subclasses = ["BasicMobileAgent"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        max_bid_ask=10,
        order_labor=0.25,
        order_duration=50,
        max_num_orders=None,
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.max_bid_ask = int(max_bid_ask)
        assert self.max_bid_ask >= 1
        self.price_floor = 0
        self.price_ceiling = int(max_bid_ask)
        self.order_duration = int(order_duration)
        assert self.order_duration >= 1
        self.max_num_orders = int(max_num_orders or self.order_duration)
        assert self.max_num_orders >= 1
        self.order_labor = max(float(order_labor), 0.0)
        self.commodities = [
            r for r in spec.resources if resource_registry.get(r).collectible
        ]
        self.n_prices = 1 + self.price_ceiling - self.price_floor  # P
        self.M = self.max_num_orders
        self.K = self.n_agents * self.M  # flattened book capacity per side

    # ------------------------------------------------------------------
    def n_actions(self, agent_cls_name):
        if agent_cls_name == "BasicMobileAgent":
            out = []
            for c in self.commodities:
                out.append((f"Buy_{c}", 1 + self.max_bid_ask))
                out.append((f"Sell_{c}", 1 + self.max_bid_ask))
            return out
        return None

    def init_state(self):
        C, N, M, P = len(self.commodities), self.n_agents, self.M, self.n_prices
        book = lambda: {
            "price": jnp.zeros((C, N, M), jnp.int32),
            "lifetime": jnp.zeros((C, N, M), jnp.int32),
            "active": jnp.zeros((C, N, M), jnp.bool_),
        }
        return {
            "bids": book(),
            "asks": book(),
            "n_orders": jnp.zeros((C, N), jnp.int32),
            "price_history": jnp.zeros((C, N, P), jnp.float32),
            "bid_hist": jnp.zeros((C, N, P), jnp.float32),
            "ask_hist": jnp.zeros((C, N, P), jnp.float32),
            # episode metric accumulators
            "sell_n": jnp.zeros((C, N), jnp.int32),
            "sell_price_sum": jnp.zeros((C, N), jnp.float32),
            "buy_n": jnp.zeros((C, N), jnp.int32),
            "buy_price_sum": jnp.zeros((C, N), jnp.float32),
            "n_trades": jnp.zeros((), jnp.int32),
            # current-step trade events (dense log, cda.py:293-323)
            "ev_buyer": jnp.zeros((C, self.K), jnp.int32),
            "ev_seller": jnp.zeros((C, self.K), jnp.int32),
            "ev_price": jnp.zeros((C, self.K), jnp.int32),
            "ev_bid": jnp.zeros((C, self.K), jnp.int32),
            "ev_ask": jnp.zeros((C, self.K), jnp.int32),
            "ev_bid_life": jnp.zeros((C, self.K), jnp.int32),
            "ev_ask_life": jnp.zeros((C, self.K), jnp.int32),
            "ev_count": jnp.zeros((C,), jnp.int32),
        }

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------
    def step(self, state: EnvState, a_actions, p_actions, key) -> EnvState:
        spec = self.spec
        cs = state.comp[self.name]
        coin_i = spec.res_idx("Coin")
        lab_i = spec.endo_idx("Labor")
        N, M, K, P = self.n_agents, self.M, self.K, self.n_prices

        inv, esc, endo = state.inventory, state.escrow, state.endogenous
        bids, asks = dict(cs["bids"]), dict(cs["asks"])
        b_price, b_life, b_act = bids["price"], bids["lifetime"], bids["active"]
        a_price, a_life, a_act = asks["price"], asks["lifetime"], asks["active"]
        n_orders = cs["n_orders"]
        price_history = cs["price_history"] * 0.995  # decay (cda.py:451)
        bid_hist, ask_hist = cs["bid_hist"], cs["ask_hist"]
        sell_n, sell_ps = cs["sell_n"], cs["sell_price_sum"]
        buy_n, buy_ps = cs["buy_n"], cs["buy_price_sum"]
        n_trades = cs["n_trades"]

        agent_ids = jnp.arange(N, dtype=jnp.int32)
        res_cols = jnp.array(
            [spec.res_idx(c) for c in self.commodities], jnp.int32
        )

        # Phase ordering parity (cda.py:439-489): the reference creates orders
        # for ALL commodities first, then matches, then expires — coin freed
        # by one commodity's trades must NOT fund another commodity's bids in
        # the same step. Creation stays a (cheap, static) per-commodity loop
        # to preserve the per-agent bid-then-ask escrow sequence; matching is
        # vmapped over the commodity axis so the sequential match rounds of
        # the books run in parallel.
        # Order creation is scatter-free: the per-agent "first free slot"
        # write becomes a one-hot slot mask merged elementwise (the channel
        # index ci is static, so .at[ci] is a cheap static-slice update).
        for ci, c in enumerate(self.commodities):
            c_res = spec.res_idx(c)

            # ----- create bids (cda.py:168-198) -----
            act_b = a_actions[f"{self.name}.Buy_{c}"]  # [N] 0..P
            want = act_b > 0
            price = jnp.maximum(act_b - 1, 0)
            can = (n_orders[ci] < self.max_num_orders) & (
                inv[:, coin_i] >= price.astype(jnp.float32)
            )
            do = want & can
            free = jnp.argmin(b_act[ci], axis=1)  # first inactive slot per agent
            slot = jax.nn.one_hot(free, M) * do[:, None]  # [N, M]
            slot_b = slot > 0.5
            b_price = b_price.at[ci].set(
                jnp.where(slot_b, price[:, None], b_price[ci])
            )
            b_life = b_life.at[ci].set(jnp.where(slot_b, 0, b_life[ci]))
            b_act = b_act.at[ci].set(b_act[ci] | slot_b)
            df = do.astype(jnp.float32)
            bid_hist = bid_hist.at[ci].add(
                jax.nn.one_hot(price, P) * df[:, None]
            )
            n_orders = n_orders.at[ci].add(do.astype(jnp.int32))
            inv = inv.at[:, coin_i].add(-df * price)
            esc = esc.at[:, coin_i].add(df * price)
            endo = endo.at[:, lab_i].add(df * self.order_labor)

            # ----- create asks (cda.py:200-229) -----
            act_a = a_actions[f"{self.name}.Sell_{c}"]
            want = act_a > 0
            aprice = jnp.maximum(act_a - 1, 0)
            can = (n_orders[ci] < self.max_num_orders) & (inv[:, c_res] > 0)
            do = want & can
            free = jnp.argmin(a_act[ci], axis=1)
            slot = jax.nn.one_hot(free, M) * do[:, None]
            slot_b = slot > 0.5
            a_price = a_price.at[ci].set(
                jnp.where(slot_b, aprice[:, None], a_price[ci])
            )
            a_life = a_life.at[ci].set(jnp.where(slot_b, 0, a_life[ci]))
            a_act = a_act.at[ci].set(a_act[ci] | slot_b)
            df = do.astype(jnp.float32)
            ask_hist = ask_hist.at[ci].add(
                jax.nn.one_hot(aprice, P) * df[:, None]
            )
            n_orders = n_orders.at[ci].add(do.astype(jnp.int32))
            inv = inv.at[:, c_res].add(-df)
            esc = esc.at[:, c_res].add(df)
            endo = endo.at[:, lab_i].add(df * self.order_labor)

        # ----- match all commodities (cda.py:231-350) -----
        (
            b_act,
            a_act,
            t_buyer,
            t_seller,
            t_price,
            t_bidp,
            t_askp,
            t_bidl,
            t_askl,
            t_count,
        ) = jax.vmap(self._match)(b_price, b_life, b_act, a_price, a_life, a_act)

        # Settlement + bookkeeping for all commodities as one-hot
        # contractions — zero scatters (each TPU scatter costs ~0.5-2 ms at
        # 4096-env batch; these einsums over [C, K, N] fuse for free).
        # Semantics identical to the reference's per-trade mutations
        # (cda.py:313-343): addition is order-independent.
        C = len(self.commodities)
        R = spec.n_resources
        Pn = self.n_prices
        valid = jnp.arange(K)[None, :] < t_count[:, None]  # [C, K]
        vf = valid.astype(jnp.float32)
        tpf = t_price.astype(jnp.float32)
        buyer_oh = jax.nn.one_hot(t_buyer, N) * vf[..., None]   # [C, K, N]
        seller_oh = jax.nn.one_hot(t_seller, N) * vf[..., None]
        col_oh = jax.nn.one_hot(res_cols, R)                    # [C, R]
        coin_oh = jax.nn.one_hot(coin_i, R)                     # [R]

        buys = buyer_oh.sum(axis=1)       # [C, N] trades bought
        sells = seller_oh.sum(axis=1)     # [C, N] trades sold
        paid_out = jnp.einsum("ckn,ck->n", seller_oh, tpf)        # coin to sellers
        excess = jnp.einsum("ckn,ck->n", buyer_oh,
                            (t_bidp - t_price).astype(jnp.float32))
        prepaid = jnp.einsum("ckn,ck->n", buyer_oh,
                             t_bidp.astype(jnp.float32))

        # Inventory (cda.py:330-343): buyer +1 unit, seller +price coin,
        # buyer +excess (bid - price) coin. Escrow: seller -1 unit,
        # buyer -bid coin (the full pre-payment).
        inv = inv + buys.T @ col_oh + (paid_out + excess)[:, None] * coin_oh
        esc = esc - sells.T @ col_oh - prepaid[:, None] * coin_oh

        # Histograms + price history (cda.py:313-325)
        bid_hist = bid_hist - jnp.einsum(
            "ckn,ckp->cnp", buyer_oh, jax.nn.one_hot(t_bidp, Pn))
        ask_hist = ask_hist - jnp.einsum(
            "ckn,ckp->cnp", seller_oh, jax.nn.one_hot(t_askp, Pn))
        price_history = price_history + jnp.einsum(
            "ckn,ckp->cnp", seller_oh, jax.nn.one_hot(t_price, Pn))
        n_orders = n_orders - (buys + sells).astype(jnp.int32)
        # Metrics
        sell_n = sell_n + sells.astype(jnp.int32)
        sell_ps = sell_ps + jnp.einsum("ckn,ck->cn", seller_oh, tpf)
        buy_n = buy_n + buys.astype(jnp.int32)
        buy_ps = buy_ps + jnp.einsum("ckn,ck->cn", buyer_oh, tpf)
        n_trades = n_trades + t_count.sum()

        # ----- expire, all commodities at once (cda.py:352-406) -----
        b_life = b_life + b_act.astype(jnp.int32)
        a_life = a_life + a_act.astype(jnp.int32)
        b_exp = b_act & (b_life > self.order_duration)
        a_exp = a_act & (a_life > self.order_duration)
        # refund bids: escrowed coin back to inventory
        refund = (b_exp.astype(jnp.float32) * b_price).sum(axis=(0, 2))  # [N]
        esc = esc.at[:, coin_i].add(-refund)
        inv = inv.at[:, coin_i].add(refund)
        # refund asks: escrowed unit back to inventory
        unit = a_exp.astype(jnp.float32).sum(axis=2)  # [C, N]
        esc = esc.at[:, res_cols].add(-unit.T)
        inv = inv.at[:, res_cols].add(unit.T)
        # histogram/order-count bookkeeping
        bid_hist = bid_hist - (
            jax.nn.one_hot(b_price, P) * b_exp[..., None]
        ).sum(axis=2)
        ask_hist = ask_hist - (
            jax.nn.one_hot(a_price, P) * a_exp[..., None]
        ).sum(axis=2)
        n_orders = n_orders - (
            b_exp.sum(axis=2) + a_exp.sum(axis=2)
        ).astype(jnp.int32)
        b_act = b_act & ~b_exp
        a_act = a_act & ~a_exp

        comp = {
            **state.comp,
            self.name: {
                "bids": {"price": b_price, "lifetime": b_life, "active": b_act},
                "asks": {"price": a_price, "lifetime": a_life, "active": a_act},
                "n_orders": n_orders,
                "price_history": price_history,
                "bid_hist": bid_hist,
                "ask_hist": ask_hist,
                "sell_n": sell_n,
                "sell_price_sum": sell_ps,
                "buy_n": buy_n,
                "buy_price_sum": buy_ps,
                "n_trades": n_trades,
                "ev_buyer": t_buyer,
                "ev_seller": t_seller,
                "ev_price": t_price,
                "ev_bid": t_bidp,
                "ev_ask": t_askp,
                "ev_bid_life": t_bidl,
                "ev_ask_life": t_askl,
                "ev_count": t_count,
            },
        }
        return state.replace(inventory=inv, escrow=esc, endogenous=endo, comp=comp)

    # ------------------------------------------------------------------
    def _match(self, b_price, b_life, b_act, a_price, a_life, a_act,
               trips=None, unroll=2):
        """One commodity's matching pass. Inputs are [N, M]; returns updated
        active masks plus trade records (arrays of capacity K).

        trips/unroll control the round loop (default: the K+N worst case);
        exposed for profiling experiments only — correctness requires the
        default trip count."""
        N, M, K = self.n_agents, self.M, self.K
        L = self.order_duration + 2  # lifetime never exceeds duration + 1

        bp, bl, ba = (x.reshape(K) for x in (b_price, b_life, b_act))
        ap, al, aa = (x.reshape(K) for x in (a_price, a_life, a_act))
        owner = jnp.repeat(jnp.arange(N, dtype=jnp.int32), M)

        # Sort keys reproducing reference ordering + stable tie-break.
        big = (self.n_prices + 1) * L * N * 2
        kb = ((self.n_prices - bp) * L + (L - 1 - bl)) * N + owner
        kb = jnp.where(ba, kb, big)
        ka = (ap * L + (L - 1 - al)) * N + owner
        ka = jnp.where(aa, ka, big)

        # Counting-rank permutation instead of argsort: XLA's TPU sort costs
        # ~2 ms per call at 4096-env batch while the O(K^2) comparison matrix
        # (K=N*M, tiny) fuses into the surrounding elementwise work for free.
        # Stable: ties broken by slot index, identical to stable argsort.
        from ai_economist_tpu.ops import permutation_matrix, rank_small, take_by_rank

        # Permutation matrices: Pb[slot, pos]; sorted = slot-axis contraction.
        Pb = permutation_matrix(rank_small(kb))
        Pa = permutation_matrix(rank_small(ka))
        permute = take_by_rank

        sbp = permute(Pb, bp).astype(jnp.int32)
        sbl = permute(Pb, bl).astype(jnp.int32)
        sba = permute(Pb, ba) > 0.5
        sbo = permute(Pb, owner).astype(jnp.int32)
        sap = permute(Pa, ap).astype(jnp.int32)
        sal = permute(Pa, al).astype(jnp.int32)
        saa = permute(Pa, aa) > 0.5
        sao = permute(Pa, owner).astype(jnp.int32)

        Z = jnp.zeros((K,), jnp.int32)
        init = dict(
            possible=jnp.ones((N,), jnp.bool_),
            b_active=sba,
            a_active=saa,
            t_count=jnp.zeros((), jnp.int32),
            t_buyer=Z, t_seller=Z, t_price=Z, t_bidp=Z, t_askp=Z,
            t_bidl=Z, t_askl=Z,
        )

        iota_k = jnp.arange(K, dtype=jnp.int32)
        iota_n = jnp.arange(N, dtype=jnp.int32)
        # One-hot owner matrix: possible-buyer lookups without dynamic
        # gathers (batched dynamic gather/scatter inside a vmapped loop
        # faults the TPU backend at large batch, and masked reductions over
        # K (tiny) vectorize onto the VPU anyway).
        bid_owner_oh = sbo[:, None] == iota_n[None, :]  # [K, N]

        # The reference's nested scan-with-restarts (cda.py:260-346)
        # collapses to at most K+N *rounds*: after every restart, the scan
        # deterministically reaches the FIRST eligible bid (active, buyer
        # still possible) and then the FIRST eligible ask (active, not
        # self-trade) — the skip cases are just eligibility filters. Asks
        # are price-ascending, so if that first eligible ask doesn't cross,
        # none will: the buyer is killed — otherwise they trade. Each round
        # therefore performs exactly one trade (≤ K) or one kill (≤ N), and
        # a round with no eligible bid is a no-op, so a fixed-trip fori_loop
        # of K+N fully-vectorized rounds reproduces the sequential machine.
        # (A while_loop with an any-eligible-bid early exit was measured
        # SLOWER under the 4096-env vmap: every env waits for the batch
        # maximum and the loop loses unrolling.)

        def round_fn(s):
            bid_elig = s["b_active"] & (bid_owner_oh & s["possible"]).any(-1)
            has_bid = bid_elig.any()
            b_first = jnp.argmax(bid_elig)  # first True (priority order)
            selb = iota_k == b_first
            buyer = jnp.sum(jnp.where(selb, sbo, 0))
            sbp_i = jnp.sum(jnp.where(selb, sbp, 0))
            sbl_i = jnp.sum(jnp.where(selb, sbl, 0))

            ask_elig = s["a_active"] & (sao != buyer)
            has_ask = ask_elig.any()
            a_first = jnp.argmax(ask_elig)
            sela = iota_k == a_first
            seller = jnp.sum(jnp.where(sela, sao, 0))
            sap_i = jnp.sum(jnp.where(sela, sap, 0))
            sal_i = jnp.sum(jnp.where(sela, sal, 0))

            is_trade = has_bid & has_ask & (sbp_i >= sap_i)
            is_kill = has_bid & ~is_trade

            tc = s["t_count"]
            selt = (iota_k == jnp.minimum(tc, K - 1)) & is_trade
            # Trade at the earlier order's price (cda.py:310-316).
            price = jnp.where(sbl_i <= sal_i, sap_i, sbp_i)

            def put(arr, val):
                return jnp.where(selt, val, arr)

            return {
                "possible": s["possible"] & ~((iota_n == buyer) & is_kill),
                "b_active": s["b_active"] & ~(selb & is_trade),
                "a_active": s["a_active"] & ~(sela & is_trade),
                "t_buyer": put(s["t_buyer"], buyer),
                "t_seller": put(s["t_seller"], seller),
                "t_price": put(s["t_price"], price),
                "t_bidp": put(s["t_bidp"], sbp_i),
                "t_askp": put(s["t_askp"], sap_i),
                "t_bidl": put(s["t_bidl"], sbl_i),
                "t_askl": put(s["t_askl"], sal_i),
                "t_count": tc + is_trade,
            }

        trips = (K + N) if trips is None else int(trips)
        out = jax.lax.fori_loop(
            0, trips, lambda _, s: round_fn(s), init, unroll=unroll
        )

        # Inverse permutation back to [N, M] slot layout (pos -> slot
        # contraction of the same one-hot matrices; no scatter needed).
        b_act_new = jnp.einsum(
            "sp,p->s", Pb, out["b_active"].astype(jnp.float32)) > 0.5
        a_act_new = jnp.einsum(
            "sp,p->s", Pa, out["a_active"].astype(jnp.float32)) > 0.5
        return (
            b_act_new.reshape(N, M),
            a_act_new.reshape(N, M),
            out["t_buyer"],
            out["t_seller"],
            out["t_price"],
            out["t_bidp"],
            out["t_askp"],
            out["t_bidl"],
            out["t_askl"],
            out["t_count"],
        )

    # ------------------------------------------------------------------
    # obs / masks / metrics
    # ------------------------------------------------------------------
    def obs(self, state: EnvState):
        cs = state.comp[self.name]
        prices = jnp.arange(self.price_floor, self.price_ceiling + 1, dtype=jnp.float32)
        a_obs, p_obs = {}, {}
        for ci, c in enumerate(self.commodities):
            net_ph = cs["price_history"][ci].sum(axis=0)  # [P]
            market_rate = prices.dot(net_ph) / jnp.maximum(0.001, net_ph.sum())
            scaled_ph = net_ph * self.inv_scale
            full_asks = cs["ask_hist"][ci].sum(axis=0)
            full_bids = cs["bid_hist"][ci].sum(axis=0)
            p_obs[f"market_rate-{c}"] = market_rate
            p_obs[f"price_history-{c}"] = scaled_ph
            p_obs[f"full_asks-{c}"] = full_asks
            p_obs[f"full_bids-{c}"] = full_bids
            n = self.n_agents
            a_obs[f"market_rate-{c}"] = jnp.full((n,), market_rate)
            a_obs[f"price_history-{c}"] = jnp.broadcast_to(scaled_ph, (n,) + scaled_ph.shape)
            a_obs[f"available_asks-{c}"] = full_asks[None] - cs["ask_hist"][ci]
            a_obs[f"available_bids-{c}"] = full_bids[None] - cs["bid_hist"][ci]
            a_obs[f"my_asks-{c}"] = cs["ask_hist"][ci]
            a_obs[f"my_bids-{c}"] = cs["bid_hist"][ci]
        return {"a": a_obs, "p": p_obs}

    def masks(self, state: EnvState):
        cs = state.comp[self.name]
        spec = self.spec
        coin = state.inventory[:, spec.res_idx("Coin")]
        can_pay = (
            jnp.arange(self.max_bid_ask + 1, dtype=jnp.float32)[None] <= coin[:, None]
        ).astype(jnp.float32)
        out = {}
        for ci, c in enumerate(self.commodities):
            under_limit = cs["n_orders"][ci] < self.max_num_orders
            can_ask = under_limit & (state.inventory[:, spec.res_idx(c)] > 0)
            out[f"{self.name}.Sell_{c}"] = (
                can_ask[:, None] * jnp.ones((1, self.n_prices))
            ).astype(jnp.float32)
            out[f"{self.name}.Buy_{c}"] = under_limit[:, None] * can_pay
        return {"a": out}

    def dense_log_record(self, state: EnvState):
        cs = state.comp[self.name]
        return {k: cs[k] for k in (
            "ev_buyer", "ev_seller", "ev_price", "ev_bid", "ev_ask",
            "ev_bid_life", "ev_ask_life", "ev_count")}

    def decode_dense_log(self, stacked):
        """[T] list of trade-dict lists in the reference's executed_trades
        layout (cda.py:293-323: commodity/buyer/bid/bid_lifetime/seller/ask/
        ask_lifetime/price/cost/income)."""
        import numpy as np

        s = {k: np.asarray(v) for k, v in stacked.items()}
        T = s["ev_count"].shape[0]
        out = []
        for t in range(T):
            evs = []
            for ci, c in enumerate(self.commodities):
                for j in range(int(s["ev_count"][t, ci])):
                    price = int(s["ev_price"][t, ci, j])
                    evs.append({
                        "commodity": c,
                        "buyer": int(s["ev_buyer"][t, ci, j]),
                        "bid": int(s["ev_bid"][t, ci, j]),
                        "bid_lifetime": int(s["ev_bid_life"][t, ci, j]),
                        "seller": int(s["ev_seller"][t, ci, j]),
                        "ask": int(s["ev_ask"][t, ci, j]),
                        "ask_lifetime": int(s["ev_ask_life"][t, ci, j]),
                        "price": price, "cost": price, "income": price,
                    })
            out.append(evs)
        return out

    def metrics(self, state: EnvState):
        cs = state.comp[self.name]
        out = {}
        for ci, c in enumerate(self.commodities):
            for i in range(self.n_agents):
                sn = cs["sell_n"][ci, i]
                bn = cs["buy_n"][ci, i]
                out[f"{i}/Sell{c}/n_sales"] = sn
                out[f"{i}/Sell{c}/price"] = cs["sell_price_sum"][ci, i] / jnp.maximum(1, sn)
                out[f"{i}/Buy{c}/n_sales"] = bn
                out[f"{i}/Buy{c}/price"] = cs["buy_price_sum"][ci, i] / jnp.maximum(1, bn)
        out["n_trades"] = cs["n_trades"]
        return out
