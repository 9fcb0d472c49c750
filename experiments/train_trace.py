#!/usr/bin/env python
"""On-chip profiler-trace attribution of the train step (VERDICT r4 #4).

The r3 segment timings were self-inconsistent (the "3 D updates = 35.4 ms
@bs128" figure implies >peak FLOP rates for the ndf=64 PatchGANs, which are
~6.2 GFLOP/sample each — HALF the whole ngf=16 two-stage generator). This
captures a real jax.profiler trace of the compiled train step, aggregates
device-op durations by the train_step named scopes (g_forward / d{1,2,3}
_update / g_head / g_backward / g_opt / sn_update — models/pix2pix.py), and
prints the trace-derived attribution table.

Also measures the gan_head_preupdate variant (G-head GAN terms against
PRE-update Ds so XLA CSEs the D(fake) forwards out of the G head) against
the default, plus an in-jit ablation: the same train_step with the G-head
GAN terms removed entirely (bounds what the G-head D chains really cost
inside one compilation, fusion context preserved).

    python -u experiments/train_trace.py [--batch_sizes 16,128] [--steps 6]
        [--out /tmp/train_trace] [--no_trace]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

SCOPES = (
    "g_forward", "d1_update", "d2_update", "d3_update",
    "g_head", "g_backward", "g_opt", "sn_update",
)


def classify(text):
    for s in SCOPES:
        if s in text:
            return s
    return "other"


def hlo_opname_map(hlo_text):
    """Instruction name -> op_name metadata from compiled HLO text, e.g.
    'convolution.97' -> 'jit(train_step)/d1_update/...'. Trace event names
    are HLO instruction names; this recovers the named scopes XLA stored
    in each instruction's metadata."""
    m = {}
    for line in hlo_text.splitlines():
        mo = re.search(r"%?([\w.-]+)\s*=.*op_name=\"([^\"]+)\"", line)
        if mo:
            m[mo.group(1)] = mo.group(2)
    return m


def parse_perfetto(path, name_map=None):
    """Aggregate device-track event durations by train_step scope.

    Returns ({scope: total_us}, {op label: total_us}, n_hlo_events)."""
    name_map = name_map or {}
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # map pid -> process name to find device tracks (TPU/device, not host)
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_pids = {
        p for p, n in pid_name.items()
        if re.search(r"TPU|device|/device|XLA", n, re.I) and "host" not in n.lower()
    }
    by_scope = collections.Counter()
    by_op = collections.Counter()
    n = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        meta = name_map.get(name, "")
        if name_map and not meta and name not in name_map:
            # not an HLO instruction of train_step (host/profiler overhead
            # event) — keep device-op attribution clean
            continue
        text = " ".join([name, meta] + [str(v) for v in args.values()])
        by_scope[classify(text)] += e["dur"]
        by_op[f"{name} [{meta.split('/')[-1][:40]}]" if meta else name] += e["dur"]
        n += 1
    return by_scope, by_op, n


def hlo_stats_via_tbp(logdir):
    """Fallback/cross-check: tensorboard_plugin_profile hlo_stats over the
    captured xplane (gives per-HLO self time with op_name metadata)."""
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # noqa: BLE001
        return None, f"tbp unavailable: {e!r}"
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        return None, "no xplane.pb captured"
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "hlo_stats", {})
    except Exception as e:  # noqa: BLE001
        return None, f"hlo_stats failed: {e!r}"
    return data, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_sizes", default="16,128")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--out", default="/tmp/train_trace")
    ap.add_argument("--no_trace", action="store_true",
                    help="skip profiler capture; wall-time comparisons only")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing the parser)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    from healthivert_tpu.data.synthetic import SyntheticDataset
    from healthivert_tpu.models.pix2pix import Pix2PixConfig, init_state, train_step

    on_tpu = jax.default_backend() == "tpu"
    lr = jnp.float32(2e-4)

    def wall_ms(cfg, bs, iters=10):
        state = init_state(jax.random.PRNGKey(0), cfg, batch_size=bs)
        import types

        opt = types.SimpleNamespace(batch_size=bs, seed=1,
                                    crop_size=args.image_size)
        ds = SyntheticDataset(opt, batch_size=bs, n_volumes=2)
        batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        # train_step donates the state — keep rebinding the returned one
        state, losses = train_step(state, dict(batch), lr, cfg)  # compile
        float(losses["G_maskL1"])  # value fetch = the only reliable barrier
        best = 1e18
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, losses = train_step(state, dict(batch), lr, cfg)
            float(losses["G_maskL1"])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3, state, batch

    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        base_cfg = Pix2PixConfig(ngf=args.ngf, image_size=args.image_size,
                                 compute_dtype="bfloat16",
                                 pallas_attention=on_tpu)
        pre_cfg = Pix2PixConfig(ngf=args.ngf, image_size=args.image_size,
                                compute_dtype="bfloat16",
                                pallas_attention=on_tpu, gan_head_preupdate=True)
        t_base, state, batch = wall_ms(base_cfg, bs)
        t_pre, _, _ = wall_ms(pre_cfg, bs)
        print(f"== batch {bs}: default {t_base:.1f} ms ({bs / t_base * 1e3:.1f} sl/s)"
              f"  gan_head_preupdate {t_pre:.1f} ms ({bs / t_pre * 1e3:.1f} sl/s)"
              f"  -> {t_base / t_pre:.3f}x", flush=True)

        if args.no_trace:
            continue
        logdir = os.path.join(args.out, f"bs{bs}")
        os.makedirs(logdir, exist_ok=True)
        try:
            hlo = train_step.lower(state, dict(batch), lr, base_cfg).compile()
            name_map = hlo_opname_map(hlo.as_text())
            print(f"  hlo metadata map: {len(name_map)} instructions")
        except Exception as e:  # noqa: BLE001 — attribution degrades, run continues
            name_map = {}
            print(f"  hlo map unavailable: {e!r}")
        s = state
        with jax.profiler.trace(logdir, create_perfetto_trace=True):
            for _ in range(args.steps):
                s, losses = train_step(s, dict(batch), lr, base_cfg)
            float(losses["G_maskL1"])
        perfettos = glob.glob(
            os.path.join(logdir, "**", "*perfetto*"), recursive=True)
        if perfettos:
            by_scope, by_op, n = parse_perfetto(perfettos[0], name_map)
            total = sum(by_scope.values())
            print(f"  perfetto: {n} device events, {total / 1e3 / args.steps:.1f} "
                  f"ms/step attributed")
            for sc, us in by_scope.most_common():
                print(f"    {sc:<12} {us / 1e3 / args.steps:8.2f} ms/step "
                      f"({us / max(total, 1) * 100:5.1f}%)")
            top = by_op.most_common(15)
            print("  top ops:")
            for name, us in top:
                print(f"    {us / 1e3 / args.steps:8.2f} ms/step  {name[:90]}")
        else:
            print("  no perfetto trace emitted", flush=True)
            data, err = hlo_stats_via_tbp(logdir)
            if err:
                print(f"  hlo_stats: {err}")
            else:
                outp = os.path.join(logdir, "hlo_stats.json")
                with open(outp, "w") as f:
                    f.write(data if isinstance(data, str) else json.dumps(data))
                print(f"  hlo_stats written -> {outp}")


if __name__ == "__main__":
    main()
