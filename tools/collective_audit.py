"""Collective-traffic audit of the distributed train step.

Answers the round-3 verdict's question about the (host, env) mesh design:
WHAT crosses the host (DCN) axis per training iteration, and how many
bytes? Gloo-over-loopback wall-clock on a 2-core box bounds nothing, but
the compiled SPMD program is the ground truth for traffic: this tool
compiles the full two-level PPO train step over a simulated 2-host x
4-device mesh (virtual CPU devices; GSPMD emits the same collectives it
would on a pod), parses every collective op out of the optimized HLO, and
classifies it as crossing the host axis (replica groups spanning both mesh
rows) or staying within hosts (ICI).

Run under: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
Writes COLLECTIVES_r04.json next to the repo root when --out is given.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

# Shape part is non-greedy up to the op keyword: tuple shapes may contain
# /*index=N*/ comments. "-done" ops alias their "-start" and are skipped.
COLLECTIVE_RE = re.compile(
    r"= (.+?) "
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(", re.IGNORECASE)
SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|f8|s64|s32|s16|s8|u64|u32|u16|u8|pred)"
                      r"\[([0-9,]*)\]")
GROUPS_RE = re.compile(r"replica_groups=(\{\{[^}]*\}(?:,\{[^}]*\})*\}|\[[0-9,]+\]<=\[[0-9,]+\](?:T\([0-9,]+\))?)")
PERMUTE_RE = re.compile(r"source_target_pairs=\{([^}]*)\}")


def shape_bytes(shape_str):
    total = 0
    for dt, dims in SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_groups(text, n_devices):
    """Replica groups -> list of device-id lists. Handles explicit and iota
    forms ([G,S]<=[dims]T(perm))."""
    if text.startswith("{"):
        return [[int(x) for x in g.split(",") if x.strip() != ""]
                for g in re.findall(r"\{([0-9, ]*)\}", text[1:-1])]
    m = re.match(r"\[([0-9,]+)\]<=\[([0-9,]+)\](?:T\(([0-9,]+)\))?", text)
    if not m:
        return None
    import numpy as np
    out_dims = [int(x) for x in m.group(1).split(",")]
    in_dims = [int(x) for x in m.group(2).split(",")]
    ids = np.arange(int(np.prod(in_dims))).reshape(in_dims)
    if m.group(3):
        perm = [int(x) for x in m.group(3).split(",")]
        ids = ids.transpose(perm)
    return ids.reshape(out_dims).tolist()


def crosses_host(groups, per_host):
    if groups is None:
        return None
    for g in groups:
        if len({d // per_host for d in g}) > 1:
            return True
    return False


def audit_hlo(hlo, n_devices=8, per_host=4):
    entries = []
    for line in hlo.splitlines():
        if "-done(" in line:
            continue
        m = COLLECTIVE_RE.search(line)
        if not m:
            continue
        shape_str, op = m.groups()
        byts = shape_bytes(shape_str)
        gm = GROUPS_RE.search(line)
        if op.lower() == "collective-permute":
            pm = PERMUTE_RE.search(line)
            pairs = []
            if pm:
                nums = [int(x) for x in re.findall(r"\d+", pm.group(1))]
                pairs = list(zip(nums[::2], nums[1::2]))
            cross = any(s // per_host != t // per_host for s, t in pairs) \
                if pairs else None
            groups_txt = pm.group(0) if pm else ""
        else:
            groups = parse_groups(gm.group(1), n_devices) if gm else None
            # Empty replica_groups {} = one group of ALL devices.
            if groups is not None and (not groups or groups == [[]]):
                groups = [list(range(n_devices))]
            cross = crosses_host(groups, per_host)
            groups_txt = gm.group(1) if gm else ""
        entries.append(dict(op=op.lower(), bytes=byts,
                            replica_groups=groups_txt, cross_host=cross))
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--num-envs", type=int, default=32)
    ap.add_argument("--config", default="phase1.yaml",
                    help="config under training/configs/ (or absolute path)")
    ap.add_argument("--saez", action="store_true",
                    help="swap the tax component to tax_model=saez and also "
                         "audit the cross-replica buffer sync program")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # Beat the ambient axon platform plugin (site hook re-exports it);
        # config wins over the env var even after jax import.
        jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
        "run under JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
        "device_count=8")
    import numpy as np
    from jax.sharding import Mesh

    from ai_economist_tpu.parallel import distributed as dist
    from ai_economist_tpu.training import run as R
    import yaml

    cfg_path = args.config if os.path.isabs(args.config) else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ai_economist_tpu/training/configs", args.config)
    cfg = yaml.safe_load(open(cfg_path))
    cfg["trainer"]["num_envs"] = args.num_envs
    if args.saez:
        comps = []
        for spec in cfg["env"]["components"]:
            (name, kw), = spec.items() if isinstance(spec, dict) else [spec]
            kw = dict(kw)
            if name == "PeriodicBracketTax":
                kw.update(tax_model="saez", disable_taxes=False)
                kw.pop("tax_annealing_schedule", None)
            comps.append({name: kw})
        cfg["env"]["components"] = comps
        cfg["trainer"]["train_planner"] = False
    trainer = R.build_trainer(cfg)

    # Simulated 2-host x 4-device mesh: one process, but the HOST axis is a
    # real mesh axis, so GSPMD partitions exactly as it would across DCN.
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), (dist.HOST_AXIS, "env"))
    ts = dist.init_trainer_distributed(trainer, jax.random.PRNGKey(0), mesh)

    fn = jax.jit(lambda ts: trainer.train_iteration(ts, 0.025, 0.1))
    hlo = fn.lower(ts).compile().as_text()
    entries = audit_hlo(hlo)
    saez_entries = []
    if args.saez:
        from ai_economist_tpu.parallel.saez import sync_saez_buffers

        sync_hlo = jax.jit(sync_saez_buffers).lower(
            ts.env_states).compile().as_text()
        saez_entries = audit_hlo(sync_hlo)

    def tot(pred):
        return sum(e["bytes"] for e in entries if pred(e))

    summary = {
        "mesh": "2 hosts x 4 devices (simulated; GSPMD partitioning is "
                "identical to a real 2-host pod)",
        "config": os.path.basename(cfg_path) + (" (saez)" if args.saez else ""),
        "num_envs": args.num_envs,
        "n_collectives": len(entries),
        "cross_host_bytes_per_iteration": tot(lambda e: e["cross_host"] is True),
        "within_host_bytes_per_iteration": tot(lambda e: e["cross_host"] is False),
        "unclassified_bytes": tot(lambda e: e["cross_host"] is None),
        "by_op": {},
        "note": (
            "cross-host traffic is the DCN bill of the (host, env) mesh "
            "design: with env data sharded over (host, env) and params "
            "replicated, only gradient/metric all-reduces and the saez "
            "buffer all-gather should span hosts; env state never moves. "
            "Bytes are per optimized-HLO op occurrence per iteration "
            "(loops inside the program execute their body's collectives "
            "per trip; minibatch loops are unrolled in this jit so each "
            "occurrence is counted)."
        ),
        "collectives": entries,
    }
    if args.saez:
        summary["saez_sync_cross_host_bytes"] = sum(
            e["bytes"] for e in saez_entries if e["cross_host"] is True)
        summary["saez_sync_collectives"] = saez_entries
    for e in entries:
        k = f"{e['op']}{'_cross_host' if e['cross_host'] else ''}"
        d = summary["by_op"].setdefault(k, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += e["bytes"]

    out = json.dumps(summary, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out[:4000])


if __name__ == "__main__":
    main()
