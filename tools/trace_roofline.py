"""Measured roofline via a jax.profiler device trace (VERDICT r4 item 5).

`PROFILE_r0N.json`'s cost-analysis rooflines count LOGICAL bytes (XLA's
`cost_analysis()` double-counts fan-out reuse and omits custom calls), so
hbm_frac > 1 there means "heavy reuse", not utilization. This tool captures
an actual device trace of each phase (its own `jax.profiler.trace` window,
so every device event in the capture belongs to that phase), and reports

  * measured per-iteration DEVICE time (sum of XLA-op event durations on
    the device plane / iterations) — the time the chip was actually
    executing, separating dispatch/tunnel gaps from compute;
  * the top-k kernels by device time, with their share;
  * per-op stats the TPU runtime attaches (bytes accessed, occupancy,
    memory bw, ...) when present, next to the cost-analysis estimate.

Phases: the fused bench env step (bench.py workload) and/or one PPO
train_iteration (profile_train.py workload).

Usage:
  python tools/trace_roofline.py --mode bench --num-envs 4096
  python tools/trace_roofline.py --mode train --num-envs 2048
Prints one JSON object; does not overwrite anything.

Parsing uses tensorflow's xplane proto when available (public package,
optional dependency: the tool degrades to wall-clock-only with a note).
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def _load_xspaces(logdir):
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2"):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except Exception:  # pragma: no cover - TF is optional
            continue
    if xplane_pb2 is None:
        return None, ("xplane proto unavailable (tensorflow not installed): "
                      "measured block omitted")
    spaces = []
    for path in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                          recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    if not spaces:
        return None, "no .xplane.pb produced by the trace"
    return spaces, None


def _stat_value(stat, meta):
    for field in ("int64_value", "uint64_value", "double_value"):
        if stat.HasField(field):
            return getattr(stat, field)
    if stat.HasField("str_value"):
        return stat.str_value
    if stat.HasField("bytes_value"):
        return "<bytes>"
    if stat.HasField("ref_value"):
        return meta.get(stat.ref_value, stat.ref_value)
    return None


def summarize_device_plane(spaces, iterations):
    """Device-time aggregation over the TPU device plane.

    Three disjoint views of one capture:
    * device_time_ms_per_iter — the "XLA Modules" line (one event per
      executed program): the chip's actual busy time. The "XLA Ops" line
      NESTS while-loop bodies (a while event's children appear again as
      their own events), so summing it double-counts.
    * top_ops — leaf events from "XLA Ops", excluding container ops
      (while/call/conditional, and the jit_* module-level events) and DMA
      copy-start/copy-done pairs.
    * dma_ms_per_iter — the copy-start/copy-done events: under the axon
      tunnel these are host<->device transfers (profiling forces output
      syncs), NOT part of the compiled step; reported separately so they
      cannot be mistaken for compute.
    """
    import re as _re

    per_op = {}
    plane_names = []
    modules_ps = 0
    dma_ps = 0
    leaf_ps = 0
    for xs in spaces:
        for plane in xs.planes:
            name = plane.name
            if not name.startswith("/device:TPU"):
                continue
            plane_names.append(name)
            emeta = {i: m for i, m in plane.event_metadata.items()}
            smeta = {i: m.name for i, m in plane.stat_metadata.items()}
            for line in plane.lines:
                lname = line.name or f"line{line.id}"
                if lname == "XLA Modules":
                    modules_ps += sum(e.duration_ps for e in line.events)
                if lname != "XLA Ops":
                    continue
                for ev in line.events:
                    md = emeta.get(ev.metadata_id)
                    op = md.name if md is not None else f"op{ev.metadata_id}"
                    tok = _re.match(r"%?([a-zA-Z0-9_.-]+)", op)
                    tok = tok.group(1) if tok else op
                    if tok.startswith(("copy-start", "copy-done")):
                        dma_ps += ev.duration_ps
                        continue
                    if (tok.startswith(("while", "call", "conditional"))
                            or op.startswith("jit_")):
                        continue
                    rec = per_op.setdefault(
                        op, {"ps": 0, "count": 0, "stats": {}})
                    rec["ps"] += ev.duration_ps
                    rec["count"] += 1
                    leaf_ps += ev.duration_ps
                    for st in ev.stats:
                        sname = smeta.get(st.metadata_id, str(st.metadata_id))
                        val = _stat_value(st, smeta)
                        if isinstance(val, (int, float)):
                            rec["stats"][sname] = rec["stats"].get(sname, 0) + val
    if not plane_names or modules_ps == 0:
        return None
    top = sorted(per_op.items(), key=lambda kv: -kv[1]["ps"])[:12]
    out = {
        "device_planes": sorted(set(plane_names)),
        "device_time_ms_per_iter": modules_ps / 1e9 / iterations,
        "leaf_op_ms_per_iter": leaf_ps / 1e9 / iterations,
        "dma_ms_per_iter": dma_ps / 1e9 / iterations,
        "top_ops": [
            {
                "op": op if len(op) <= 160 else op[:120] + "..." + op[-37:],
                "device_ms_per_iter": rec["ps"] / 1e9 / iterations,
                "share_of_device_time": rec["ps"] / modules_ps,
                "count_per_iter": rec["count"] / iterations,
            }
            for op, rec in top
        ],
    }
    # Per-op byte counters, when the runtime attaches them (it does not on
    # this tunnel: bytes stay a cost-analysis estimate, stated as such).
    byte_keys = {k for rec in per_op.values() for k in rec["stats"]
                 if "byte" in k.lower()}
    if byte_keys:
        total_bytes = sum(rec["stats"].get(k, 0)
                          for rec in per_op.values() for k in byte_keys)
        out["measured_bytes_per_iter"] = total_bytes / iterations
        out["measured_hbm_frac"] = (
            (total_bytes / iterations)
            / (out["device_time_ms_per_iter"] / 1e3) / 1e9 / V5E_HBM_GBPS)
    return out


def cost_analysis(fn, *args):
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def trace_phase(label, fn, args_thread, iterations, results):
    """Time fn for `iterations` reps inside its own trace window.

    args_thread: (initial_args, advance) — advance(out, args) -> next args,
    so state threads through reps (defeats any identical-arg caching)."""
    init_args, advance = args_thread
    out = fn(*init_args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    cur = advance(out, init_args)
    logdir = tempfile.mkdtemp(prefix=f"trace_{label}_")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(iterations):
            out = fn(*cur)
            cur = advance(out, cur)
        jax.block_until_ready(jax.tree.leaves(out)[0])
    wall = (time.perf_counter() - t0) / iterations
    entry = {"wall_ms_per_iter": wall * 1e3, "iterations": iterations}
    spaces, err = _load_xspaces(logdir)
    if err:
        entry["measured_note"] = err
    else:
        meas = summarize_device_plane(spaces, iterations)
        if meas is None:
            entry["measured_note"] = ("trace contains no device-plane op "
                                      "events (profiler unsupported on this "
                                      "backend/tunnel)")
        else:
            entry["measured"] = meas
            entry["dispatch_gap_ms_per_iter"] = (
                entry["wall_ms_per_iter"]
                - meas["device_time_ms_per_iter"])
    flops, byts = cost_analysis(fn, *init_args)
    if flops is not None:
        entry["cost_analysis"] = {
            "gflops": flops / 1e9,
            "gbytes_logical": byts / 1e9,
        }
        base = entry.get("measured", {}).get("device_time_ms_per_iter",
                                             entry["wall_ms_per_iter"])
        entry["cost_analysis"]["hbm_frac_vs_device_time"] = (
            byts / (base / 1e3) / 1e9) / V5E_HBM_GBPS
    results[label] = entry


def bench_phase(num_envs, steps, results):
    import ai_economist_tpu as aet
    from ai_economist_tpu.adapters.batched import BatchedEnv

    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Build", {"skill_dist": "pareto",
                       "payment_max_skill_multiplier": 3}),
            ("ContinuousDoubleAuction", {"max_num_orders": 5}),
            ("Gather", {"skill_dist": "pareto"}),
            ("PeriodicBracketTax", {"period": 100}),
        ],
        n_agents=4, world_size=[25, 25], episode_length=1000,
    )
    batch = BatchedEnv(env, num_envs, auto_reset=True)
    states, obs = batch.reset(jax.random.PRNGKey(0))
    p_layout = env.planner_action_space

    @jax.jit
    def fused(states, obs, key):
        ka, kp, key = jax.random.split(key, 3)
        logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
        acts = {"a": jax.random.categorical(ka, logits, axis=-1)}
        if p_layout.n_subspaces > 0:
            plogits = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
            outs, off = [], 0
            for dim in p_layout.action_dims:
                outs.append(jax.random.categorical(
                    kp, plogits[..., off:off + dim], -1))
                off += dim
            acts["p"] = jnp.stack(outs, axis=-1)
        s, o, r, d, _ = batch.step(states, acts)
        return s, o, key

    def advance(out, cur):
        s, o, key = out
        return (s, o, key)

    trace_phase("bench_full_step", fused,
                ((states, obs, jax.random.PRNGKey(1)), advance),
                steps, results)
    results["bench_full_step"]["num_envs"] = num_envs
    dev_ms = results["bench_full_step"].get("measured", {}).get(
        "device_time_ms_per_iter")
    if dev_ms:
        results["bench_full_step"]["env_steps_per_s_device_time"] = (
            num_envs / (dev_ms / 1e3))


def train_phase(num_envs, iters, results, config):
    import yaml
    from ai_economist_tpu.training import run as R

    with open(config) as f:
        cfg = yaml.safe_load(f)
    cfg.setdefault("trainer", {})["num_envs"] = num_envs
    trainer = R.build_trainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    jax.block_until_ready(ts.env_states.t)

    def one_iter(ts):
        nts, _ = trainer.train_iteration(ts, 0.025, 0.025)
        return nts

    trace_phase("train_iteration", one_iter,
                ((ts,), lambda out, cur: (out,)), iters, results)
    B, T = trainer.num_envs, trainer.cfg.rollout_len
    results["train_iteration"]["num_envs"] = B
    results["train_iteration"]["env_steps_per_iter"] = B * T
    dev_ms = results["train_iteration"].get("measured", {}).get(
        "device_time_ms_per_iter")
    if dev_ms:
        results["train_iteration"]["train_env_steps_per_s_device_time"] = (
            B * T / (dev_ms / 1e3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["bench", "train", "both"],
                    default="both")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--train-envs", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train-iters", type=int, default=4)
    ap.add_argument("--config",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "ai_economist_tpu", "training",
                                         "configs", "phase1.yaml"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the ambient axon plugin "
                         "overrides the JAX_PLATFORMS env var, so this must "
                         "go through jax.config)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results = {"backend": jax.default_backend()}
    if args.mode in ("bench", "both"):
        bench_phase(args.num_envs, args.iters, results)
    if args.mode in ("train", "both"):
        train_phase(args.train_envs, args.train_iters, results, args.config)
    results["notes"] = {
        "method": "each phase traced in its own jax.profiler window, so all "
                  "device-plane events in a capture belong to that phase. "
                  "device_time_ms_per_iter sums XLA-op event durations on "
                  "the device plane (measured execution, excludes host "
                  "dispatch gaps); wall - device = dispatch/tunnel gap.",
        "roofline": "cost_analysis gbytes are LOGICAL (fan-out reuse "
                    "double-counted, custom calls omitted); when the "
                    "runtime attaches measured byte counters they appear "
                    "under measured.*",
    }

    def rnd(x):
        if isinstance(x, float):
            return round(x, 4)
        if isinstance(x, dict):
            return {k: rnd(v) for k, v in x.items()}
        if isinstance(x, list):
            return [rnd(v) for v in x]
        return x

    print(json.dumps(rnd(results), indent=1))


if __name__ == "__main__":
    main()
