"""Micro-bench of CDA sub-phases + matcher unroll variants."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import ai_economist_tpu as aet
from ai_economist_tpu.adapters.batched import BatchedEnv

NUM_ENVS = 4096
env = aet.make_env_instance(
    "uniform/simple_wood_and_stone",
    components=[("Build", {"skill_dist": "pareto", "payment_max_skill_multiplier": 3}),
                ("ContinuousDoubleAuction", {"max_num_orders": 5}),
                ("Gather", {"skill_dist": "pareto"}),
                ("PeriodicBracketTax", {"period": 100})],
    n_agents=4, world_size=[25, 25], episode_length=1000,
)
batch = BatchedEnv(env, NUM_ENVS, auto_reset=True)
key = jax.random.PRNGKey(0)
states, obs = batch.reset(key)

cda = env.get_component("ContinuousDoubleAuction")

# Seed books with random content so matching does real work.
k = jax.random.PRNGKey(1)
cs = states.comp[cda.name]
C, N, M = len(cda.commodities), cda.n_agents, cda.M
ks = jax.random.split(k, 6)
bids = {"price": jax.random.randint(ks[0], (NUM_ENVS, C, N, M), 0, 11),
        "lifetime": jax.random.randint(ks[1], (NUM_ENVS, C, N, M), 0, 40),
        "active": jax.random.bernoulli(ks[2], 0.6, (NUM_ENVS, C, N, M))}
asks = {"price": jax.random.randint(ks[3], (NUM_ENVS, C, N, M), 0, 11),
        "lifetime": jax.random.randint(ks[4], (NUM_ENVS, C, N, M), 0, 40),
        "active": jax.random.bernoulli(ks[5], 0.6, (NUM_ENVS, C, N, M))}

def timeit(fn, *a, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

res = {}

def match_only(bids, asks):
    def one(bp, bl, ba, ap, al, aa):
        return jax.vmap(cda._match)(bp, bl, ba, ap, al, aa)
    return jax.vmap(one)(bids["price"], bids["lifetime"], bids["active"],
                         asks["price"], asks["lifetime"], asks["active"])

res["match_only_ms"] = timeit(jax.jit(match_only), bids, asks)

# Variant: different unrolls
import ai_economist_tpu.components.cda as cda_mod

orig_match = cda.__class__._match
src_unrolls = {}
for unroll in (1, 4, 8, 24):
    def make(unroll):
        def _match_u(self, b_price, b_life, b_act, a_price, a_life, a_act,
                     _orig=orig_match):
            import types
            # monkeypatch fori_loop unroll via closure: re-run original with
            # jax.lax.fori_loop patched
            real_fori = jax.lax.fori_loop
            def fori(lo, hi, body, init, unroll=None):
                return real_fori(lo, hi, body, init, unroll=make.u)
            jax.lax.fori_loop = fori
            try:
                return _orig(self, b_price, b_life, b_act, a_price, a_life, a_act)
            finally:
                jax.lax.fori_loop = real_fori
        return _match_u
    make.u = unroll
    cda.__class__._match = make(unroll)
    try:
        res[f"match_unroll{unroll}_ms"] = timeit(jax.jit(match_only), bids, asks)
    except Exception as e:
        res[f"match_unroll{unroll}_ms"] = f"ERR {e}"
    cda.__class__._match = orig_match

print(json.dumps(res, indent=1, default=str))
