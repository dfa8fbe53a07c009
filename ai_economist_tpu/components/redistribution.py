"""WealthRedistribution and PeriodicBracketTax (incl. the Saez model).

TPU-native rewrite of ai_economist/foundation/components/redistribution.py:
  * WealthRedistribution (redistribution.py:22-75): passive coin equalizer.
  * PeriodicBracketTax (redistribution.py:78-1202): periodic bracketed income
    tax + lump-sum redistribution with four tax models — planner-controlled
    ("model_wrapper"), adaptive-optimal "saez", fixed US-federal 2018 rates,
    and "fixed-bracket-rates" — plus tax-rate annealing curricula.

Saez machinery (redistribution.py:437-823) is re-expressed as fixed-shape
array math: the income/marginal-rate buffer is a ring buffer; the elasticity
OLS is a masked closed-form 2x2 solve; binned g(z)/A(z) use histogram +
reversed cumsums; the nan-gap interpolation of marginal rates uses
cummax/cummin index scans instead of a Python loop. The cross-replica
"global buffer" (redistribution.py:514-550), which the reference syncs over
Ray RPC (tutorials/rllib/utils/remote.py:56-73), here syncs with an
all-gather over the env batch axis (see parallel/saez.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.components.utils import annealed_tax_limit, annealed_tax_mask
from ai_economist_tpu.core.component import Component, component_registry
from ai_economist_tpu.core.state import EnvState

US_FEDERAL_RATES_2018 = (0.1, 0.12, 0.22, 0.24, 0.32, 0.35, 0.37)
US_FEDERAL_CUTOFFS = (0.0, 9700.0, 39475.0, 84200.0, 160725.0, 204100.0, 510300.0)


@component_registry.add
class WealthRedistribution(Component):
    """Equalize mobile agents' coin each step, keeping escrow intact
    (redistribution.py:46-65)."""

    name = "WealthRedistribution"
    required_entities = ["Coin"]
    agent_subclasses = ["BasicMobileAgent"]

    def n_actions(self, agent_cls_name):
        return None

    def step(self, state: EnvState, a_actions, p_actions, key) -> EnvState:
        coin_i = self.spec.res_idx("Coin")
        ic = state.inventory[:, coin_i]
        ec = state.escrow[:, coin_i]
        target = (ic + ec).sum() / self.n_agents
        inv = state.inventory.at[:, coin_i].set(target - ec)
        return state.replace(inventory=inv)


@component_registry.add
class PeriodicBracketTax(Component):
    name = "PeriodicBracketTax"
    shorthand = "PeriodicTax"
    component_type = "PeriodicTax"
    required_entities = ["Coin"]
    agent_subclasses = ["BasicMobileAgent", "BasicPlanner"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        disable_taxes=False,
        tax_model="model_wrapper",
        period=100,
        rate_min=0.0,
        rate_max=1.0,
        rate_disc=0.05,
        n_brackets=5,
        top_bracket_cutoff=100,
        usd_scaling=1000.0,
        bracket_spacing="us-federal",
        fixed_bracket_rates=None,
        pareto_weight_type="inverse_income",
        saez_fixed_elas=None,
        tax_annealing_schedule=None,
        saez_buffer_size=500,
        saez_global_replicas=0,
        saez_rates_external=False,
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.disable_taxes = bool(disable_taxes)
        self.tax_model = tax_model
        # External-rates mode: the per-step saez day-1 update is skipped and
        # the batch runner applies `batch_rates_refresh` between steps under
        # a scalar lax.cond instead (core/env.py maybe_saez_refresh). Under
        # vmap a lax.cond degenerates to a both-branch select, so the in-step
        # formula (histograms + OLS over the whole R*S global buffer) would
        # be paid EVERY step in EVERY replica; hoisted to batch level it runs
        # once per tax period, like the reference's once-per-period call
        # (redistribution.py:952-961).
        self.rates_external = bool(saez_rates_external)
        assert self.tax_model in (
            "model_wrapper",
            "us-federal-single-filer-2018-scaled",
            "saez",
            "fixed-bracket-rates",
        )
        self.period = int(period)
        assert self.period > 0
        self.rate_min = 0.0 if self.disable_taxes else float(rate_min)
        self.rate_max = 0.0 if self.disable_taxes else float(rate_max)
        assert 0 <= self.rate_min <= self.rate_max <= 1.0
        self.rate_disc = float(rate_disc)

        self.use_discretized_rates = self.tax_model == "model_wrapper"
        if self.use_discretized_rates:
            rates = np.arange(self.rate_min, self.rate_max + self.rate_disc, self.rate_disc)
            rates = rates[rates <= self.rate_max]
            assert len(rates) > 1 or self.disable_taxes
            self.disc_rates = jnp.asarray(rates, jnp.float32)
            self.n_disc_rates = len(rates)
        else:
            self.disc_rates = None
            self.n_disc_rates = 0

        # --- brackets (redistribution.py:199-243) ---
        self.n_brackets = int(n_brackets)
        self.top_bracket_cutoff = float(top_bracket_cutoff)
        self.usd_scale = float(usd_scaling)
        self.bracket_spacing = bracket_spacing.lower()
        if self.bracket_spacing == "linear":
            cutoffs = np.linspace(0, self.top_bracket_cutoff, self.n_brackets)
        elif self.bracket_spacing == "log":
            b0_max = self.top_bracket_cutoff / (2 ** (self.n_brackets - 2))
            cutoffs = np.concatenate(
                [[0], 2 ** np.linspace(np.log2(b0_max),
                                       np.log2(self.top_bracket_cutoff),
                                       self.n_brackets - 1)]
            )
        elif self.bracket_spacing == "us-federal":
            cutoffs = np.array(US_FEDERAL_CUTOFFS) / self.usd_scale
            self.n_brackets = len(cutoffs)
            self.top_bracket_cutoff = float(cutoffs[-1])
        else:
            raise NotImplementedError(self.bracket_spacing)
        assert cutoffs[0] == 0
        self.bracket_cutoffs = jnp.asarray(cutoffs, jnp.float32)
        self._np_cutoffs = cutoffs
        edges = np.concatenate([cutoffs, [np.inf]])
        self.bracket_edges = jnp.asarray(edges, jnp.float32)
        self.bracket_sizes = jnp.asarray(edges[1:] - edges[:-1], jnp.float32)

        if self.tax_model == "us-federal-single-filer-2018-scaled":
            assert self.bracket_spacing == "us-federal"
        if self.tax_model == "fixed-bracket-rates":
            assert fixed_bracket_rates is not None
            assert len(fixed_bracket_rates) == self.n_brackets
            self.fixed_bracket_rates = jnp.asarray(fixed_bracket_rates, jnp.float32)
        else:
            self.fixed_bracket_rates = None

        self.pareto_weight_type = pareto_weight_type
        self._saez_fixed_elas = (
            None if saez_fixed_elas is None else float(saez_fixed_elas)
        )
        self.buffer_size = int(saez_buffer_size)
        self.global_replicas = int(saez_global_replicas)
        self.global_capacity = self.buffer_size * max(self.global_replicas, 0)

        self._n_bins = 100
        top = float(cutoffs[-1])
        bin_edges = np.linspace(0, top, self._n_bins + 1)
        self.saez_bin_edges = jnp.asarray(bin_edges, jnp.float32)
        self.saez_bin_sizes = jnp.asarray(
            np.concatenate([bin_edges[1:] - bin_edges[:-1], [np.inf]]), jnp.float32
        )

        self.tax_annealing_schedule = tax_annealing_schedule
        if tax_annealing_schedule is not None:
            self._annealing_warmup = tax_annealing_schedule[0]
            self._annealing_slope = tax_annealing_schedule[1]
        else:
            self._annealing_warmup = None
            self._annealing_slope = None

    # ------------------------------------------------------------------
    def n_actions(self, agent_cls_name):
        if agent_cls_name == "BasicPlanner":
            if self.tax_model == "model_wrapper" and not self.disable_taxes:
                return [
                    (f"TaxIndexBracket_{int(r):03d}", self.n_disc_rates)
                    for r in self._np_cutoffs
                ]
        return 0

    def init_state(self):
        N, B = self.n_agents, self.n_brackets
        st = {
            "curr_rate_indices": jnp.zeros((B,), jnp.int32),
            "curr_bracket_tax_rates": jnp.zeros((B,), jnp.float32),
            "running_avg_tax_rates": jnp.zeros((B,), jnp.float32),
            "tax_cycle_pos": jnp.ones((), jnp.int32),
            "last_coin": jnp.zeros((N,), jnp.float32),
            "last_income": jnp.zeros((N,), jnp.float32),
            "last_marginal_rate": jnp.zeros((N,), jnp.float32),
            "last_effective_tax_rate": jnp.zeros((N,), jnp.float32),
            # current-step tax event (dense log, redistribution.py:853-915)
            "ev_enacted": jnp.zeros((), jnp.bool_),
            "ev_tax_paid": jnp.zeros((N,), jnp.float32),
            "ev_lump_sum": jnp.zeros(()),
            "ev_schedule": jnp.zeros((B,), jnp.float32),
            "elas_t": jnp.asarray(0.5),
            "elas_tm1": jnp.asarray(0.5),
            "log_z0_t": jnp.asarray(0.0),
            "log_z0_tm1": jnp.asarray(0.0),
            "total_collected_taxes": jnp.zeros(()),
            "occupancy": jnp.zeros((B,), jnp.float32),
            "schedule_sum": jnp.zeros((B,), jnp.float32),
            "schedule_n": jnp.zeros((), jnp.int32),
            "etr_sum": jnp.zeros(()),
            "etr_n": jnp.zeros((), jnp.int32),
            # Saez local ring buffer
            "buf": jnp.zeros((self.buffer_size, 2), jnp.float32),
            "buf_pos": jnp.zeros((), jnp.int32),
            "buf_count": jnp.zeros((), jnp.int32),
            "additions_this_episode": jnp.zeros((), jnp.int32),
            "reached_min_samples": jnp.zeros((), jnp.bool_),
        }
        if self.global_capacity > 0:
            st["global_buf"] = jnp.zeros((self.global_capacity, 2), jnp.float32)
            st["global_count"] = jnp.zeros((), jnp.int32)
        return st

    def reset(self, state: EnvState, key) -> EnvState:
        """Episode reset preserving the Saez buffer / running averages
        (redistribution.py:1109-1139)."""
        cs = dict(state.comp[self.name])
        N, B = self.n_agents, self.n_brackets
        coin_i = self.spec.res_idx("Coin")
        cs.update(
            curr_rate_indices=jnp.zeros((B,), jnp.int32),
            tax_cycle_pos=jnp.ones((), jnp.int32),
            last_coin=state.total_endowment(coin_i),
            last_income=jnp.zeros((N,), jnp.float32),
            last_marginal_rate=jnp.zeros((N,), jnp.float32),
            last_effective_tax_rate=jnp.zeros((N,), jnp.float32),
            total_collected_taxes=jnp.zeros(()),
            occupancy=jnp.zeros((B,), jnp.float32),
            schedule_sum=jnp.zeros((B,), jnp.float32),
            schedule_n=jnp.zeros((), jnp.int32),
            etr_sum=jnp.zeros(()),
            etr_n=jnp.zeros((), jnp.int32),
        )
        if self.tax_model == "saez":
            cs["curr_bracket_tax_rates"] = cs["running_avg_tax_rates"]
        return state.replace(comp={**state.comp, self.name: cs})

    # ------------------------------------------------------------------
    # rate helpers
    # ------------------------------------------------------------------
    def curr_rate_max(self, state: EnvState):
        if self.tax_annealing_schedule is None:
            return jnp.asarray(self.rate_max)
        return annealed_tax_limit(
            state.completions.astype(jnp.float32),
            self._annealing_warmup,
            self._annealing_slope,
            self.rate_max,
        )

    def curr_marginal_rates(self, state: EnvState, cs) -> jnp.ndarray:
        """[B] current marginal bracket rates (redistribution.py:396-417)."""
        rmax = self.curr_rate_max(state)
        if self.use_discretized_rates:
            return self.disc_rates[cs["curr_rate_indices"]]
        if self.tax_model == "us-federal-single-filer-2018-scaled":
            return jnp.minimum(jnp.asarray(US_FEDERAL_RATES_2018), rmax)
        if self.tax_model == "saez":
            return jnp.minimum(cs["curr_bracket_tax_rates"], rmax)
        if self.tax_model == "fixed-bracket-rates":
            return jnp.minimum(self.fixed_bracket_rates, rmax)
        raise NotImplementedError

    def marginal_rate(self, rates, income):
        """Marginal rate at income level(s) (redistribution.py:837-844)."""
        income = jnp.asarray(income)
        meets = income[..., None] >= self.bracket_edges[:-1]
        under = income[..., None] < self.bracket_edges[1:]
        idx = jnp.argmax(meets & under, axis=-1)
        return jnp.where(income < 0, 0.0, rates[idx])

    def income_bin_index(self, income):
        income = jnp.asarray(income)
        meets = income[..., None] >= self.bracket_edges[:-1]
        under = income[..., None] < self.bracket_edges[1:]
        idx = jnp.argmax(meets & under, axis=-1)
        return jnp.where(income < 0, 0, idx)

    def taxes_due(self, rates, income):
        """Total tax due at income (redistribution.py:846-851)."""
        past = jnp.maximum(0.0, jnp.asarray(income)[..., None] - self.bracket_cutoffs)
        bin_income = jnp.minimum(self.bracket_sizes, past)
        return (rates * bin_income).sum(-1)

    # ------------------------------------------------------------------
    # Saez formula (redistribution.py:437-823)
    # ------------------------------------------------------------------
    def _buffer_contents(self, cs):
        """(data [Btot, 2], mask [Btot]) — the effective Saez buffer
        (redistribution.py:514-525)."""
        buf, count = cs["buf"], cs["buf_count"]
        slots = jnp.arange(self.buffer_size)
        local_mask = slots < count
        if self.global_capacity == 0:
            return buf, local_mask
        gbuf, gcount = cs["global_buf"], cs["global_count"]
        gmask = jnp.arange(self.global_capacity) < gcount
        # When a global buffer exists, local contributes only entries added
        # this episode (the rest are already folded into the global buffer).
        dist = jnp.mod(cs["buf_pos"] - 1 - slots, self.buffer_size)
        recent = dist < jnp.minimum(cs["additions_this_episode"], count)
        use_local = jnp.where(gcount > 0, recent, local_mask)
        return (
            jnp.concatenate([gbuf, buf], axis=0),
            jnp.concatenate([gmask, use_local]),
        )

    def _estimate_elasticity(self, data, mask, elas_tm1, log_z0_tm1):
        """Masked OLS of log z on log(1-tau) (redistribution.py:552-601)."""
        z, tau = data[:, 0], data[:, 1]
        valid = mask & (z > 0) & (tau < 1)
        n = valid.sum().astype(jnp.float32)
        w = valid.astype(jnp.float32)
        tau_mean = (w * tau).sum() / jnp.maximum(n, 1.0)
        tau_std = jnp.sqrt(
            jnp.maximum((w * (tau - tau_mean) ** 2).sum() / jnp.maximum(n, 1.0), 0.0)
        )
        x = jnp.log(jnp.maximum(1.0 - tau, 1e-9))
        y = jnp.log(jnp.maximum(z, 1e-9))
        sx, sy = (w * x).sum(), (w * y).sum()
        sxx, sxy = (w * x * x).sum(), (w * x * y).sum()
        det = n * sxx - sx * sx
        elas = (n * sxy - sx * sy) / jnp.where(det == 0, 1.0, det)
        log_z0 = (sy - elas * sx) / jnp.maximum(n, 1.0)
        instant = jnp.maximum(elas, 0.0)
        elas_t = 0.02 * instant + 0.98 * elas_tm1
        ok = (n >= 10) & (tau_std >= 1e-6)
        return (
            jnp.where(ok, elas_t, elas_tm1),
            jnp.where(ok, log_z0, log_z0_tm1),
        )

    def _pareto(self, z):
        if self.pareto_weight_type == "uniform":
            return jnp.ones_like(z)
        if self.pareto_weight_type == "inverse_income":
            return 1.0 / jnp.maximum(1.0, z)
        raise NotImplementedError(self.pareto_weight_type)

    def _binned_gz_az(self, incomes, mask):
        """Binned welfare weights g(z) and Pareto params A(z)
        (redistribution.py:603-753)."""
        lefts = self.saez_bin_edges  # [nb+1]
        nb = self._n_bins
        z = jnp.where(mask, incomes, jnp.nan)
        below = mask & (incomes < lefts[0])
        above = mask & (incomes > lefts[-1])
        in_range = mask & ~below & ~above
        # histogram with right-inclusive last bin (np.histogram semantics)
        bin_idx = jnp.clip(
            jnp.searchsorted(lefts, incomes, side="right") - 1, 0, nb - 1
        )
        counts = jnp.zeros((nb,)).at[bin_idx].add(in_range.astype(jnp.float32))
        n_below = below.sum().astype(jnp.float32)
        n_above = above.sum().astype(jnp.float32)
        n_total = counts.sum() + n_below + n_above

        pz = jnp.concatenate([counts, n_above[None]]) / jnp.maximum(n_total, 1.0)
        p_below = n_below / jnp.maximum(n_total, 1.0)
        cum_pz = jnp.clip(p_below + jnp.cumsum(pz), 0.0, 1.0)

        mids = 0.5 * (lefts[:-1] + lefts[1:])  # [nb]
        pw_below = jnp.where(below, self._pareto(jnp.maximum(incomes, 0.0)), 0.0).sum()
        pw_above = jnp.where(above, self._pareto(incomes), 0.0).sum()
        pw_bins = counts * self._pareto(mids)
        norm = pw_bins.sum() + pw_below + pw_above + 1e-9
        density = jnp.concatenate([pw_bins, pw_above[None]]) / norm
        cum_density_geq = jnp.cumsum(density[::-1])[::-1]
        cum_prob_geq = jnp.cumsum(pz[::-1])[::-1]
        gz = cum_density_geq / (cum_prob_geq + 1e-9)  # [nb+1]
        gz = jnp.concatenate([0.5 * (gz[:-1] + gz[1:])[:nb], gz[-1:]])

        # A(z)
        p_geq_z = 1.0 - cum_pz + 0.5 * pz
        widths = lefts[1:] - lefts[:-1]
        az_bins = (mids * pz[:nb] / (jnp.clip(p_geq_z[:nb], 0.0, 1.0) + 1e-9)) / widths
        az_bins = jnp.where(pz[:nb] == 0, jnp.nan, az_bins)
        avg_above = jnp.where(above, incomes, 0.0).sum() / jnp.maximum(n_above, 1.0)
        az_above = jnp.where(
            n_above > 0, avg_above / (avg_above - lefts[-1] + 1e-9), 0.0
        )
        az = jnp.concatenate([az_bins, az_above[None]])
        return gz, az

    @staticmethod
    def _interpolate_nan_gaps(taus):
        """Linear in-fill of nan runs (redistribution.py:763-791). Leading
        gaps interpolate from 0.0; trailing gaps hold the last real value."""
        n = taus.shape[0]
        idx = jnp.arange(n)
        valid = ~jnp.isnan(taus)
        prev_idx = jax.lax.cummax(jnp.where(valid, idx, -1))
        next_idx = jax.lax.cummin(jnp.where(valid, idx, n)[::-1])[::-1]
        tf = jnp.where(valid, taus, 0.0)
        prev_val = jnp.where(prev_idx >= 0, tf[jnp.clip(prev_idx, 0)], 0.0)
        has_next = next_idx < n
        next_val = jnp.where(has_next, tf[jnp.clip(next_idx, 0, n - 1)], prev_val)
        denom = jnp.maximum(next_idx - prev_idx, 1)
        frac = (idx - prev_idx).astype(jnp.float32) / denom.astype(jnp.float32)
        interp = prev_val + (next_val - prev_val) * jnp.where(has_next, frac, 0.0)
        return jnp.where(valid, taus, interp)

    def _bracketize(self, bin_rates):
        """Average binned marginal rates into bracket rates
        (redistribution.py:793-823)."""
        def taxes_to(income):
            past = jnp.maximum(0.0, income - self.saez_bin_edges)
            bin_income = jnp.minimum(self.saez_bin_sizes, past)
            return jnp.maximum(0.0, (bin_rates * bin_income).sum())

        taxes_due = jax.vmap(taxes_to)(self.bracket_cutoffs[1:])
        burdens = jnp.diff(jnp.concatenate([jnp.zeros((1,)), taxes_due]))
        avg = burdens / self.bracket_sizes[: self.n_brackets - 1]
        return jnp.concatenate([avg, bin_rates[-1:]])

    def _saez_rates(self, state: EnvState, cs, key, draws=None):
        """Compute a new period's bracket rates from the Saez formula, or
        random rates during buffer warmup (redistribution.py:437-510).

        draws: optional {"saez_rates": [B]} — recorded reference warmup
        uniforms injected by the parity harness in place of the key-derived
        draw (reference redistribution.py:452-456)."""
        data, mask = self._buffer_contents(cs)
        n_samples = mask.sum()
        reached = cs["reached_min_samples"] | (n_samples >= self.buffer_size)

        def random_rates(_):
            if draws is not None:
                r = jnp.asarray(draws["saez_rates"], jnp.float32)
            else:
                r = jax.random.uniform(
                    key,
                    (self.n_brackets,),
                    minval=self.rate_min,
                    maxval=self.curr_rate_max(state),
                )
            return (
                r,
                cs["elas_t"], cs["elas_tm1"],
                cs["log_z0_t"], cs["log_z0_tm1"],
                cs["running_avg_tax_rates"],
            )

        def formula(_):
            elas_tm1 = cs["elas_t"]
            log_z0_tm1 = cs["log_z0_t"]
            elas_t, log_z0_t = self._estimate_elasticity(
                data, mask, elas_tm1, log_z0_tm1
            )
            elas_use = (
                jnp.asarray(self._saez_fixed_elas)
                if self._saez_fixed_elas is not None
                else elas_t
            )
            gz, az = self._binned_gz_az(data[:, 0], mask)
            taus = (1.0 - gz) / (1.0 - gz + az * elas_use + 1e-9)
            taus = self._interpolate_nan_gaps(taus)
            rates = jnp.clip(
                self._bracketize(taus), self.rate_min, self.curr_rate_max(state)
            )
            running = cs["running_avg_tax_rates"] * 0.99 + rates * 0.01
            return rates, elas_t, elas_tm1, log_z0_t, log_z0_tm1, running

        outs = jax.lax.cond(reached, formula, random_rates, None)
        rates, elas_t, elas_tm1, log_z0_t, log_z0_tm1, running = outs
        return dict(
            curr_bracket_tax_rates=rates,
            elas_t=elas_t,
            elas_tm1=elas_tm1,
            log_z0_t=log_z0_t,
            log_z0_tm1=log_z0_tm1,
            running_avg_tax_rates=running,
            reached_min_samples=reached,
        )

    def batch_rates_refresh(self, states: EnvState) -> EnvState:
        """Day-1 saez rates update at BATCH level (leading env axis).

        The external-rates counterpart of the in-step update: applied by the
        batch runners between env steps, under a scalar lax.cond that only
        fires when some replica is entering a new tax period
        (core/env.py maybe_saez_refresh), so the formula cost is paid once
        per period instead of every step. Semantically identical to the
        in-step update: at entry the batched state already carries the
        post-step timestep/completions the in-step formula would see, and
        rates only change where tax_cycle_pos == 1. Warmup random rates draw
        from a stream folded off the per-env state key (disjoint from the
        step stream), so warmup draws differ bit-wise from internal mode but
        share the distribution — the formula regime is bit-identical
        (test_tax.py::test_saez_external_rates_matches_internal)."""

        def one(state, key):
            cs = dict(state.comp[self.name])
            upd = self._saez_rates(state, cs, key)
            cyc = cs["tax_cycle_pos"]
            for k, v in upd.items():
                cs[k] = jnp.where(cyc == 1, v, cs[k])
            comp = dict(state.comp)
            comp[self.name] = cs
            return state.replace(comp=comp)

        keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5AE2))(states.key)
        return jax.vmap(one)(states, keys)

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------
    def step(self, state: EnvState, a_actions, p_actions, key, draws=None) -> EnvState:
        cs = dict(state.comp[self.name])
        coin_i = self.spec.res_idx("Coin")
        cycle = cs["tax_cycle_pos"]

        # --- day 1: set new period rates (redistribution.py:952-961) ---
        if self.tax_model == "model_wrapper" and not self.disable_taxes:
            new_idx = cs["curr_rate_indices"]
            for bi, r in enumerate(self._np_cutoffs):
                act = p_actions[f"{self.name}.TaxIndexBracket_{int(r):03d}"]
                new_idx = new_idx.at[bi].set(
                    jnp.where(act > 0, act - 1, new_idx[bi])
                )
            cs["curr_rate_indices"] = jnp.where(
                cycle == 1, new_idx, cs["curr_rate_indices"]
            )
        elif self.tax_model == "saez" and not self.rates_external:
            saez_updates = self._saez_rates(state, cs, key, draws=draws)
            for k, v in saez_updates.items():
                cs[k] = jnp.where(cycle == 1, v, cs[k])

        rates = self.curr_marginal_rates(state, cs)

        # --- last day: enact taxes (redistribution.py:853-915, 963-966) ---
        is_tax_day = cycle >= self.period
        endow = state.total_endowment(coin_i)
        income = endow - cs["last_coin"]
        tax_due = self.taxes_due(rates, income)
        effective = jnp.minimum(state.inventory[:, coin_i], tax_due)
        marginal = self.marginal_rate(rates, income)
        etr = effective / jnp.maximum(1e-6, income)
        net_revenue = effective.sum()
        lump = net_revenue / self.n_agents

        pay = jnp.where(is_tax_day, effective, 0.0)
        receive = jnp.where(is_tax_day, lump, 0.0)
        inv = state.inventory.at[:, coin_i].add(receive - pay)
        new_endow = inv[:, coin_i] + state.escrow[:, coin_i]

        w = is_tax_day
        cs["ev_enacted"] = w
        cs["ev_tax_paid"] = pay
        cs["ev_lump_sum"] = receive
        cs["ev_schedule"] = rates
        cs["last_income"] = jnp.where(w, income, cs["last_income"])
        cs["last_marginal_rate"] = jnp.where(w, marginal, cs["last_marginal_rate"])
        cs["last_effective_tax_rate"] = jnp.where(w, etr, cs["last_effective_tax_rate"])
        cs["last_coin"] = jnp.where(w, new_endow, cs["last_coin"])
        cs["total_collected_taxes"] = cs["total_collected_taxes"] + jnp.where(
            w, net_revenue, 0.0
        )
        cs["occupancy"] = cs["occupancy"].at[self.income_bin_index(income)].add(
            jnp.where(w, 1.0, 0.0)
        )
        cs["schedule_sum"] = cs["schedule_sum"] + jnp.where(w, rates, 0.0)
        cs["schedule_n"] = cs["schedule_n"] + w.astype(jnp.int32)
        cs["etr_sum"] = cs["etr_sum"] + jnp.where(w, etr.sum(), 0.0)
        cs["etr_n"] = cs["etr_n"] + jnp.where(w, self.n_agents, 0)

        # Fold tax-day info into the Saez ring buffer (redistribution.py:535-544)
        if self.tax_model == "saez":
            slots = jnp.mod(
                cs["buf_pos"] + jnp.arange(self.n_agents), self.buffer_size
            )
            entry = jnp.stack([income, marginal], axis=1)
            buf = cs["buf"].at[slots].set(
                jnp.where(w, entry, cs["buf"][slots])
            )
            cs["buf"] = buf
            adv = jnp.where(w, self.n_agents, 0)
            cs["buf_pos"] = jnp.mod(cs["buf_pos"] + adv, self.buffer_size)
            cs["buf_count"] = jnp.minimum(cs["buf_count"] + adv, self.buffer_size)
            cs["additions_this_episode"] = cs["additions_this_episode"] + adv

        cs["tax_cycle_pos"] = jnp.where(is_tax_day, 1, cycle + 1)
        return state.replace(
            inventory=inv, comp={**state.comp, self.name: cs}
        )

    # ------------------------------------------------------------------
    # obs / masks / metrics
    # ------------------------------------------------------------------
    def obs(self, state: EnvState):
        cs = state.comp[self.name]
        coin_i = self.spec.res_idx("Coin")
        cycle = cs["tax_cycle_pos"]
        is_tax_day = (cycle >= self.period).astype(jnp.float32)
        is_first_day = (cycle == 1).astype(jnp.float32)
        tax_phase = cycle.astype(jnp.float32) / self.period
        rates = self.curr_marginal_rates(state, cs)
        last_income_obs = cs["last_income"] / self.period
        # Sort-free: jnp.sort costs ~2 ms/call on TPU in the per-step path.
        from ai_economist_tpu.ops import sort_small

        sorted_income = sort_small(last_income_obs)
        curr_marginal = self.marginal_rate(
            rates, state.total_endowment(coin_i) - cs["last_coin"]
        )
        n = self.n_agents
        common = dict(
            is_tax_day=is_tax_day,
            is_first_day=is_first_day,
            tax_phase=tax_phase,
        )
        p_obs = dict(common, last_incomes=sorted_income, curr_rates=rates)
        a_obs = {
            "is_tax_day": jnp.full((n,), is_tax_day),
            "is_first_day": jnp.full((n,), is_first_day),
            "tax_phase": jnp.full((n,), tax_phase),
            "last_incomes": jnp.broadcast_to(sorted_income, (n, n)),
            "curr_rates": jnp.broadcast_to(rates, (n,) + rates.shape),
            "marginal_rate": curr_marginal,
        }
        pa_obs = {
            "last_income": last_income_obs,
            "last_marginal_rate": cs["last_marginal_rate"],
            "curr_marginal_rate": curr_marginal,
        }
        return {"a": a_obs, "p": p_obs, "pa": pa_obs}

    def masks(self, state: EnvState):
        """Planner tax actions only on period day 1, with optional annealing
        (redistribution.py:1025-1104)."""
        if self.disable_taxes or self.tax_model != "model_wrapper":
            return {}
        cs = state.comp[self.name]
        on_day = cs["tax_cycle_pos"] == 1
        if self.tax_annealing_schedule is not None:
            base = annealed_tax_mask(
                state.completions.astype(jnp.float32),
                self._annealing_warmup,
                self._annealing_slope,
                self.disc_rates,
            )
        else:
            base = jnp.ones((self.n_disc_rates,), jnp.float32)
        mask = jnp.where(on_day, base, jnp.zeros_like(base))
        return {
            "p": {
                f"{self.name}.TaxIndexBracket_{int(r):03d}": mask
                for r in self._np_cutoffs
            }
        }

    def dense_log_record(self, state: EnvState):
        cs = state.comp[self.name]
        return {
            "enacted": cs["ev_enacted"],
            "schedule": cs["ev_schedule"],
            "income": cs["last_income"],
            "tax_paid": cs["ev_tax_paid"],
            "marginal_rate": cs["last_marginal_rate"],
            "effective_rate": cs["last_effective_tax_rate"],
            "lump_sum": cs["ev_lump_sum"],
        }

    def decode_dense_log(self, stacked):
        """[T] tax-event list: empty except on period-end steps, which carry
        the schedule + per-agent income/tax/lump-sum dicts
        (reference redistribution.py:853-915, 1188-1202). None when taxes
        are disabled, matching the reference's get_dense_log."""
        import numpy as np

        if self.disable_taxes:
            return None
        s = {k: np.asarray(v) for k, v in stacked.items()}
        cutoffs = np.asarray(self._np_cutoffs, np.float64)
        out = []
        for t in range(s["enacted"].shape[0]):
            if not bool(s["enacted"][t]):
                out.append([])
                continue
            entry = {"schedule": s["schedule"][t].tolist(),
                     "cutoffs": cutoffs.tolist()}
            for i in range(self.n_agents):
                entry[str(i)] = {
                    "income": float(s["income"][t, i]),
                    "tax_paid": float(s["tax_paid"][t, i]),
                    "marginal_rate": float(s["marginal_rate"][t, i]),
                    "effective_rate": float(s["effective_rate"][t, i]),
                    "lump_sum": float(s["lump_sum"][t]),
                }
            out.append(entry)
        return out

    def metrics(self, state: EnvState):
        cs = state.comp[self.name]
        out = {}
        n_sched = jnp.maximum(cs["schedule_n"], 1).astype(jnp.float32)
        n_occ = jnp.maximum(cs["occupancy"].sum(), 1.0)
        for bi, r in enumerate(self._np_cutoffs):
            k = f"{int(r):03d}"
            out[f"avg_bracket_rate/{k}"] = cs["schedule_sum"][bi] / n_sched
            out[f"bracket_occupancy/{k}"] = cs["occupancy"][bi] / n_occ
        if not self.disable_taxes:
            out["avg_effective_tax_rate"] = cs["etr_sum"] / jnp.maximum(
                cs["etr_n"].astype(jnp.float32), 1.0
            )
            out["total_collected_taxes"] = cs["total_collected_taxes"]
            if self.tax_model == "saez":
                out["saez/estimated_elasticity"] = cs["elas_tm1"]
        return out
