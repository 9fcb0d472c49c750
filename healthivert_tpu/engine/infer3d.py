"""Iterative two-stage 3D synthesis: heal neighbors, then the target vertebra.

Algorithm parity with /root/reference/eval_3d_sagittal_twostage.py:136-241,
restructured for TPU (SURVEY.md §3.2): the reference runs THREE batch-1
torch forwards per slice inside a Python z-loop; here each of the three
passes (upper neighbor, lower neighbor on pass-1 output, target on the
twice-healed context) runs as ONE batched jitted forward over all slices of
the vertebra's central 4/5 z-range. Host numpy handles the per-slice band
geometry between passes (it depends on the evolving label state).

Reference-bug note (documented deviation): in the reference the target-
vertebra synthesis call sits inside the 'lower neighbor missing' else-branch
(eval_3d_sagittal_twostage.py:219-225), so slices whose lower neighbor
exists reuse a stale `output` from a previous slice. Here the target pass
always runs — the behavior the algorithm describes.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from healthivert_tpu.data.sampler import remove_small_cc
from healthivert_tpu.models.pix2pix import Pix2PixConfig

MAXHEIGHT = 40


# rows of x_stage2/fine_seg the reassembly can ever read: x_upper >= x1 - 20
# and x_bottom <= x1 + max(MAXHEIGHT, height) (pred height is
# sigmoid*MAXHEIGHT, the centering shift is at most
# (MAXHEIGHT - height) // 2). A 64-row window starting 20 rows above the
# vertebra top covers every height <= 44; taller vertebrae (the reference
# keeps height = x2 - x1 even past MAXHEIGHT) bump the pass's window to the
# next 32-row bucket (_run_pass) — caught by the run_model oracle
# (tests/test_infer3d_oracle.py, the 52-row case).
WINDOW = 64


def _band_inputs(ct, cam, x1, x2, min_x, max_x):
    """Device twin of the reference's band geometry (eval_3d:56-82): the
    40-row mask band plus the context/CAM rows shifted to abut it. All from
    raw u8 slices + four scalars, so the host never ships full f32 planes."""
    h = ct.shape[0]
    r = jnp.arange(h, dtype=jnp.int32)[:, None]  # (H, 1)
    src = jnp.where(r < min_x, r + x1 - min_x, x2 + r - max_x)
    valid = (r < min_x) | ((r >= max_x) & (src < h))
    src_c = jnp.clip(src, 0, h - 1)

    def gather(img):
        idx = jnp.broadcast_to(src_c, img.shape)
        return jnp.where(valid, jnp.take_along_axis(img, idx, axis=0), 0)

    mask = ((r >= min_x) & (r <= max_x)) & jnp.ones_like(ct, bool)  # inclusive end (:75)
    return gather(ct), mask.astype(jnp.uint8), gather(cam)


def _make_gen(cfg: Pix2PixConfig, use_bf16, use_pallas):
    from healthivert_tpu.models.generator import Generator

    if cfg.compute_dtype == "int8":
        gdtype = "int8"  # post-training-quantized convs (SNConv sentinel)
    else:
        # explicit, not None: dtype=None follows x.dtype, and attention /
        # ratio-plane f32 leaks then promote downstream convs to f32
        # (code-review r3 finding — this path silently ran f32 convs)
        gdtype = jnp.bfloat16 if use_bf16 else None
    return Generator(cnum=cfg.ngf, use_pallas_attention=use_pallas, dtype=gdtype)


def _prep_inputs(ct_u8, cam_stack, zidx, x1, x2, min_x, max_x, use_bf16):
    # inputs arrive as RAW u8 slices + band scalars; the context/mask/CAM
    # planes are built ON DEVICE (_band_inputs) and normalized there: the
    # tunneled host->device link runs at ~MB/s, so shipping two u8 planes
    # instead of three f32 ones cuts the per-pass upload ~6x (VERDICT r1
    # weak #6 / experiments/infer3d_prof.py)
    cam_sl = cam_stack[zidx]  # (B, H, W) gathered on device; stack ships once
    ctx_u8, mask_u8, camsh_u8 = jax.vmap(_band_inputs)(
        ct_u8, cam_sl, x1, x2, min_x, max_x
    )
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    context = ctx_u8[..., None].astype(dt) / 255.0 * 2.0 - 1.0
    mask = mask_u8[..., None].astype(dt)
    cam = camsh_u8[..., None].astype(dt) / 255.0
    return context, mask, cam


@functools.partial(jax.jit, static_argnames=("cfg", "use_bf16", "use_pallas"))
def _calibrate_fwd(g_params, g_sn, ct_u8, cam_stack, zidx, x1, x2, min_x,
                   max_x, ratio, cfg: Pix2PixConfig, use_bf16=True,
                   use_pallas=False):
    """One calibration dispatch: run the int8 generator over prepped pass
    inputs with the "calib" collection mutable and return the per-conv
    activation-absmax tree (see models.pix2pix.calib_to_quant)."""
    gen = _make_gen(cfg, use_bf16, use_pallas)
    context, mask, cam = _prep_inputs(
        ct_u8, cam_stack, zidx, x1, x2, min_x, max_x, use_bf16
    )
    _, mut = gen.apply(
        {"params": g_params, "sn": g_sn}, context, mask, 1.0 - cam, ratio,
        mutable=["calib"],
    )
    return mut["calib"]


def _forward_impl(g_params, g_sn, ct_u8, cam_stack, zidx, x1, x2, min_x, max_x,
                  ratio, w0, g_quant=None, cfg: Pix2PixConfig = None,
                  use_bf16=True, use_pallas=False, win=WINDOW):
    gen = _make_gen(cfg, use_bf16, use_pallas)
    context, mask, cam = _prep_inputs(
        ct_u8, cam_stack, zidx, x1, x2, min_x, max_x, use_bf16
    )
    variables = {"params": g_params, "sn": g_sn}
    if g_quant is not None:
        variables["quant"] = g_quant
    out = gen.apply(variables, context, mask, 1.0 - cam, ratio)
    # quantize on device: the reassembly maps CT through (x+1)*127.5 into a
    # uint8-range volume anyway, and seg is binary — and only the WINDOW rows
    # starting at per-sample w0 are ever pasted back, so crop before the
    # device->host hop (u8 + crop = ~16x less D2H than f32 full slices)
    fake_u8 = jnp.round((out.x_stage2.astype(jnp.float32) + 1.0) * 127.5).astype(jnp.uint8)
    seg_u8 = (out.fine_seg > 0.5).astype(jnp.uint8)
    win = min(win, fake_u8.shape[1])  # small volumes: window = whole slice
    crop = jax.vmap(
        lambda img, r0: jax.lax.dynamic_slice_in_dim(img, r0, win, axis=0)
    )
    return crop(fake_u8, w0), crop(seg_u8, w0), out.pred2_h.astype(jnp.float32) * MAXHEIGHT


@functools.partial(
    jax.jit, static_argnames=("cfg", "use_bf16", "use_pallas", "win", "mesh")
)
def _forward(g_params, g_sn, ct_u8, cam_stack, zidx, x1, x2, min_x, max_x, ratio, w0,
             g_quant=None, cfg: Pix2PixConfig = None, use_bf16=True,
             use_pallas=False, win=WINDOW, mesh=None):
    """Batched synthesis forward; with `mesh`, the slice batch is sharded
    over the 'data' axis via shard_map (SURVEY.md §2.4: the z-slice dim is
    this pipeline's sequence axis — the TPU-native answer to the reference's
    serial slice loop, /root/reference/eval_3d_sagittal_twostage.py:201-234).

    shard_map rather than bare GSPMD annotations because every op here is
    per-sample (so batch sharding is exact) and the Pallas attention kernel
    has no SPMD partitioning rule — inside shard_map it simply runs on each
    shard's local batch."""
    impl = functools.partial(
        _forward_impl, cfg=cfg, use_bf16=use_bf16, use_pallas=use_pallas, win=win
    )
    if mesh is None:
        return impl(g_params, g_sn, ct_u8, cam_stack, zidx, x1, x2, min_x,
                    max_x, ratio, w0, g_quant)
    from jax.sharding import PartitionSpec as P

    rep, b = P(), P("data")
    return jax.shard_map(
        impl, mesh=mesh,
        in_specs=(rep, rep, b, rep, b, b, b, b, b, b, b, rep),
        out_specs=(b, b, b),
        check_vma=False,
    )(g_params, g_sn, ct_u8, cam_stack, zidx, x1, x2, min_x, max_x, ratio, w0,
      g_quant)


def _slice_geometry(label_sl: np.ndarray, ct_sl: np.ndarray, vert_id: int):
    """Band geometry scalars for one slice (eval_3d_sagittal_twostage.py:46-98).
    Returns None if the vertebra is absent after CC cleanup. The actual
    context/mask/CAM planes are built on DEVICE from these scalars
    (_band_inputs); only the raw u8 CT slice ships."""
    vert = (label_sl == vert_id).astype(np.float64)
    vert = remove_small_cc(vert, 50)
    coords = np.argwhere(vert)
    if coords.size == 0:
        return None
    rows = coords[:, 0]
    x1, x2 = int(rows.min()), int(rows.max())
    width = label_sl.shape[0]
    height = x2 - x1
    if height > MAXHEIGHT:
        x_mean = int(rows.mean())
        x1 = x_mean - 20
        x2 = x1 + 40
    mask_x = (x1 + x2) // 2
    if mask_x <= MAXHEIGHT // 2:
        min_x = 0
    elif width - mask_x <= MAXHEIGHT / 2:
        min_x = width - MAXHEIGHT
    else:
        min_x = mask_x - MAXHEIGHT // 2
    max_x = min_x + MAXHEIGHT

    ct_u8 = ct_sl.astype(np.uint8)  # once; reused by _reassemble via geo

    # geo["w0"] (device-output crop origin) is assigned by _run_pass once the
    # pass's window size is known (taller-than-MAXHEIGHT vertebrae widen it)
    return dict(x1=x1, x2=x2, height=height, min_x=min_x, max_x=max_x,
                ct_u8=ct_u8, width=width)


def _reassemble(geo, x_stage2_win, fine_seg_win, pred_h, ct_sl, label_sl, vert_id):
    """SHRM paste-back on host (eval_3d:103-130). Returns (ct_new, label_new,
    height). x_stage2_win / fine_seg_win are the device outputs cropped to
    WINDOW rows starting at geo['w0'] (full-slice rows r map to r - w0)."""
    x1, x2, height, w0 = geo["x1"], geo["x2"], geo["height"], geo["w0"]
    h = ct_sl.shape[0]
    ph = math.ceil(pred_h)
    if ph < height:
        ph = height
    hd = ph - height
    x_upper = x1 - hd // 2
    x_bottom = x_upper + ph

    fake = np.zeros_like(ct_sl, np.float64)
    # x_stage2 arrives already mapped to uint8 CT range on device
    if x_bottom > x_upper >= 0:
        fake[x_upper:x_bottom] = x_stage2_win[x_upper - w0 : x_bottom - w0]
    ori = geo["ct_u8"].astype(np.float64)
    fake[:x_upper] = ((ori[hd // 2 : x1] / 255.0 * 2 - 1) + 1) * 127.5
    tail = ori[x2 : x2 + h - x_bottom]
    fake[x_bottom : x_bottom + tail.shape[0]] = tail

    seg = np.zeros_like(label_sl, np.float64)
    if x_bottom > x_upper >= 0:
        seg[x_upper:x_bottom] = fine_seg_win[x_upper - w0 : x_bottom - w0] * vert_id
    seg[:x_upper] = label_sl[hd // 2 : x1]
    stail = label_sl[x2 : x2 + h - x_bottom]
    seg[x_bottom : x_bottom + stail.shape[0]] = stail
    return fake, seg, height


def _chunk_arrays(jobs, ratios, job_zidx, i0, batch_size,
                  keys=("x1", "x2", "min_x", "max_x", "w0")):
    """Stack one dispatch's worth of job arrays (padded by repetition).
    Calibration runs before _run_pass assigns "w0", so it passes a keys
    tuple without it."""
    chunk = jobs[i0 : i0 + batch_size]
    pad = batch_size - len(chunk)
    rep = lambda key: [j[key] for j in chunk] + [chunk[-1][key]] * pad
    ct = np.stack(rep("ct_u8"))
    rat = np.array(list(ratios[i0 : i0 + len(chunk)]) + [0.0] * pad, np.float32)
    zidx = np.array(
        list(job_zidx[i0 : i0 + len(chunk)])
        + [job_zidx[i0 + len(chunk) - 1]] * pad, np.int32
    )
    ints = {k: jnp.asarray(np.array(rep(k), np.int32)) for k in keys}
    return chunk, ct, rat, zidx, ints


def _run_pass(g_params, g_sn, cfg, jobs, ratios, cam_stack, job_zidx,
              batch_size=32, use_bf16=True, use_pallas=None, mesh=None,
              g_quant=None):
    """Batched forward over a list of geometry jobs; returns per-job outputs.
    cam_stack is a device-resident (NZ, H, W) u8 array (uploaded once per
    vertebra); job_zidx maps each job to its stack row. With `mesh`, each
    dispatch's slice batch is sharded across the mesh's 'data' axis."""
    if use_pallas is None:
        # the fused kernel is TPU-only (interpret mode is for tests)
        use_pallas = jax.default_backend() == "tpu"
    if not jobs:
        return []
    if mesh is not None:
        n_data = mesh.shape.get("data", 1)
        batch_size = -(-batch_size // n_data) * n_data  # shardable chunks
    # window bucket for this pass: covers x1-20 .. x1+max(MAXHEIGHT, height)
    # for the tallest job (32-row buckets bound recompiles)
    need = 20 + max(MAXHEIGHT, max(j["height"] for j in jobs))
    win = max(WINDOW, -(-need // 32) * 32)
    for j in jobs:
        j["w0"] = min(max(j["x1"] - 20, 0), max(j["width"] - win, 0))
    n = len(jobs)
    outs = []
    for i0 in range(0, n, batch_size):
        chunk, ct, rat, zidx, ints = _chunk_arrays(
            jobs, ratios, job_zidx, i0, batch_size
        )
        x2_, seg, ph = _forward(
            g_params, g_sn, jnp.asarray(ct), cam_stack, jnp.asarray(zidx),
            ints["x1"], ints["x2"], ints["min_x"], ints["max_x"],
            jnp.asarray(rat), ints["w0"], g_quant, cfg, use_bf16, use_pallas,
            win, mesh=mesh,
        )
        x2_, seg, ph = np.asarray(x2_), np.asarray(seg), np.asarray(ph)
        for k in range(len(chunk)):
            outs.append((x2_[k, :, :, 0], seg[k, :, :, 0], float(ph[k])))
    return outs


def _get_slice(vol, z, axis):
    return vol[:, :, z] if axis == 2 else vol[:, z, :]


def _cam_bucket(n: int) -> int:
    """Pad the device CAM stack's row count to a small set of bucket sizes so
    patients with different total slice counts share _forward compilations.
    16-multiples (16/32/48/64) for single-vertebra calls, then 64-multiples
    (the padding is uploaded through the ~10 MB/s tunnel, so power-of-2
    buckets measurably hurt multi-vertebra calls)."""
    if n <= 64:
        return max(16, -(-n // 16) * 16)
    return -(-n // 64) * 64


@jax.jit
def _params_reduce(tree):
    """Sum and sum-of-squares over every leaf, as two scalars (one dispatch;
    a full-tree device_get would crawl through the ~MB/s tunnel)."""
    tot = jnp.float32(0)
    sq = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(tree):
        xf = jnp.asarray(leaf).astype(jnp.float32)
        tot = tot + jnp.sum(xf)
        sq = sq + jnp.sum(xf * xf)
    return tot, sq


def _quant_meta(g_params):
    """Content fingerprint tying a persisted quant tree to its weights: a
    host hash of the tree structure (paths/shapes/dtypes) plus the two
    device-reduced scalars. The scalars are compared with a relative
    tolerance, not hashed — cross-backend reduction order may differ in the
    last ulp, while retrained weights differ by orders of magnitude."""
    import hashlib

    from healthivert_tpu.models.pix2pix import INT8_CALIB_PERCENTILE

    h = hashlib.blake2b(digest_size=16)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_params):
        h.update(str(path).encode())
        h.update(str(jnp.shape(leaf)).encode())
        h.update(str(jnp.asarray(leaf).dtype).encode())
    tot, sq = _params_reduce(g_params)
    return {
        "struct": h.hexdigest(),
        "sum": float(tot),
        "sq": float(sq),
        "percentile": float(INT8_CALIB_PERCENTILE),
    }


def _load_quant_store(path, g_params):
    """Restore a persisted quant tree, or None (-> recalibrate) when the file
    is unreadable, predates fingerprinting, or was calibrated for different
    weights / a different percentile (e.g. the checkpoint was retrained under
    the same --name — silently reusing the old scales would be a quality
    regression with no warning)."""
    import warnings

    from flax import serialization

    try:
        with open(path, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
    except Exception as e:  # truncated/corrupt write, foreign format
        warnings.warn(f"int8 quant store {path} unreadable ({e!r}); "
                      "recalibrating")
        return None
    if not (isinstance(blob, dict) and "meta" in blob and "quant" in blob):
        warnings.warn(f"int8 quant store {path} has no weight fingerprint "
                      "(pre-r5 format); recalibrating")
        return None
    meta, want = blob["meta"], _quant_meta(g_params)
    ok = (
        str(meta.get("struct")) == want["struct"]
        and float(meta.get("percentile", -1)) == want["percentile"]
        and np.isclose(float(meta.get("sum", np.inf)), want["sum"],
                       rtol=1e-4, atol=1e-6)
        and np.isclose(float(meta.get("sq", np.inf)), want["sq"],
                       rtol=1e-4, atol=1e-6)
    )
    if not ok:
        warnings.warn(
            f"int8 quant store {path} was calibrated for different weights "
            "or percentile; recalibrating (the store will be rewritten)")
        return None
    return blob["quant"]


def _save_quant_store(path, g_quant, g_params):
    """Persist the calibrated tree with its weight fingerprint, atomically
    (temp file + os.replace) so an interrupted write can't poison later
    runs with a truncated msgpack."""
    from flax import serialization

    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    blob = {"meta": _quant_meta(g_params),
            "quant": jax.device_get(g_quant)}
    tmp = os.path.join(d, f".{os.path.basename(path)}.tmp.{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))
    os.replace(tmp, path)


def synthesize_volumes(
    g_params,
    g_sn,
    cfg: Pix2PixConfig,
    volumes,
    batch_size: int = 32,
    use_bf16: bool = True,
    axis: int = 2,
    mesh=None,
    quant=None,
    quant_store=None,
):
    """Batched multi-vertebra synthesis: the three passes are shared across
    ALL volumes (vertebrae are independent — SURVEY.md §3.2), so a whole
    spine's worth of slices rides each device dispatch instead of 6 small
    dispatches per vertebra (the tunneled chip's fixed per-dispatch cost
    dominates per-vertebra latency; experiments/infer3d_prof.py).

    volumes: sequence of (ct_vol, label_vol, vert_id, cam_vol-or-None), all
    sharing the same slice shape along `axis`. Returns a list of
    (ct_fake, label_fake) pairs in input order.

    quant (cfg.compute_dtype == "int8" only): None -> per-sample dynamic
    activation scales; "auto" -> calibrate static per-tensor scales from
    this call's own first pass-1 batch (one extra dispatch; removes the
    per-conv dynamic-scale HBM sweeps that made int8 slower than bf16 in
    BENCH_r03); or a precomputed tree from models.pix2pix.calibrate_int8 /
    calib_to_quant for deterministic cross-call parity.

    quant_store (with quant="auto"): path to a msgpack file persisting the
    calibrated tree. If it exists the tree is LOADED (no calibration
    dispatch) — making int8 outputs reproducible across calls regardless of
    batch grouping / --slice_batch / volume partitioning (the auto mode's
    scales otherwise depend on what shares the first chunk); if missing,
    the freshly calibrated tree is saved there for every later call."""
    preps = []
    all_cams = []
    row_off = 0
    for ct_vol, label_vol, vert_id, cam_vol in volumes:
        cam_vol = cam_vol if cam_vol is not None else np.zeros_like(ct_vol, np.float32)
        vert = label_vol == vert_id
        other_axes = (0, 1) if axis == 2 else (0, 2)
        zs = np.nonzero(vert.any(axis=other_axes))[0]
        if zs.size == 0:
            preps.append(None)
            continue
        z0, z1 = int(zs.min()), int(zs.max())
        range_length = z1 - z0 + 1
        new_len = int(range_length * 4 / 5)
        nz0 = z0 + (range_length - new_len) // 2
        nz1 = nz0 + new_len - 1
        center = (nz0 + nz1) // 2
        z_list = list(range(nz0, nz1 + 1))
        preps.append(
            dict(
                vert_id=vert_id,
                label_vol=label_vol,
                shape=ct_vol.shape,
                z_list=z_list,
                ratios={z: abs(z - center) / range_length * 2 for z in z_list},
                ct_state={z: _get_slice(ct_vol, z, axis).astype(np.float64) for z in z_list},
                lb_state={z: _get_slice(label_vol, z, axis).astype(np.float64) for z in z_list},
                stack_row={z: row_off + i for i, z in enumerate(z_list)},
            )
        )
        # CAM never changes across passes: one device-resident u8 stack for
        # ALL volumes; each pass gathers its slices by row index on device
        all_cams.append(
            np.stack([(_get_slice(cam_vol, z, axis) * 255).astype(np.uint8) for z in z_list])
        )
        row_off += len(z_list)

    if row_off == 0:
        return [
            (np.zeros_like(v[0], np.float64), np.zeros_like(v[0], np.float64))
            for v in volumes
        ]
    cams = np.concatenate(all_cams)
    bucket = _cam_bucket(row_off)
    cam_stack = jnp.asarray(np.pad(cams, ((0, bucket - row_off), (0, 0), (0, 0))))

    g_quant = None if quant == "auto" else quant
    if quant is not None and cfg.compute_dtype != "int8":
        raise ValueError("quant= is only meaningful with compute_dtype='int8'")
    if quant == "auto" and quant_store and os.path.exists(quant_store):
        g_quant = _load_quant_store(quant_store, g_params)

    # three passes: upper neighbor, lower neighbor, target — jobs from every
    # volume share the dispatches
    for which, nb in (("upper", -1), ("lower", +1), ("target", 0)):
        jobs, job_refs, job_ratio, job_rows = [], [], [], []
        for prep in preps:
            if prep is None:
                continue
            vert_id, label_vol = prep["vert_id"], prep["label_vol"]
            vid = vert_id + nb
            for z in prep["z_list"]:
                # both neighbor-presence checks read the ORIGINAL labels (:204,:213)
                if which == "upper" and not (
                    vert_id > 8 and np.sum(_get_slice(label_vol, z, axis) == vid) > 200
                ):
                    continue
                if which == "lower" and not (
                    vert_id < 24 and np.sum(_get_slice(label_vol, z, axis) == vid) > 200
                ):
                    continue
                geo = _slice_geometry(prep["lb_state"][z], prep["ct_state"][z], vid)
                if geo is None:
                    continue
                jobs.append(geo)
                job_refs.append((prep, z, vid))
                job_ratio.append(prep["ratios"][z])
                job_rows.append(prep["stack_row"][z])
        if quant == "auto" and g_quant is None and jobs:
            # one calibration dispatch on this call's first real batch
            from healthivert_tpu.models.pix2pix import (
                INT8_CALIB_PERCENTILE,
                calib_to_quant,
            )

            _, ct, rat, zidx, ints = _chunk_arrays(
                jobs, job_ratio, job_rows, 0, min(batch_size, len(jobs)),
                keys=("x1", "x2", "min_x", "max_x"),
            )
            use_pallas = jax.default_backend() == "tpu"
            calib = _calibrate_fwd(
                g_params, g_sn, jnp.asarray(ct), cam_stack, jnp.asarray(zidx),
                ints["x1"], ints["x2"], ints["min_x"], ints["max_x"],
                jnp.asarray(rat), cfg, use_bf16, use_pallas,
            )
            # percentile scales clip outlier activation mass so the 8-bit
            # grid covers the bulk — measured better than absmax-static and
            # >= dynamic on quality at identical speed; the default's sweep
            # lives at pix2pix.INT8_CALIB_PERCENTILE
            g_quant = calib_to_quant(jax.device_get(calib),
                                     percentile=INT8_CALIB_PERCENTILE)
            if quant_store:
                _save_quant_store(quant_store, g_quant, g_params)
        outs = _run_pass(
            g_params, g_sn, cfg, jobs, job_ratio, cam_stack, job_rows,
            batch_size, use_bf16, mesh=mesh, g_quant=g_quant,
        )
        for geo, (prep, z, vid), (x2_, seg, ph) in zip(jobs, job_refs, outs):
            ct_new, lb_new, _ = _reassemble(
                geo, x2_, seg, ph, prep["ct_state"][z], prep["lb_state"][z], vid
            )
            prep["ct_state"][z] = ct_new
            prep["lb_state"][z] = lb_new

    results = []
    for (ct_vol, *_), prep in zip(volumes, preps):
        ct_fake = np.zeros_like(ct_vol, np.float64)
        lb_fake = np.zeros_like(ct_vol, np.float64)
        if prep is not None:
            for z in prep["z_list"]:
                if axis == 2:
                    ct_fake[:, :, z] = prep["ct_state"][z]
                    lb_fake[:, :, z] = prep["lb_state"][z]
                else:
                    ct_fake[:, z, :] = prep["ct_state"][z]
                    lb_fake[:, z, :] = prep["lb_state"][z]
        results.append((ct_fake, lb_fake))
    return results


def synthesize_volume(
    g_params,
    g_sn,
    cfg: Pix2PixConfig,
    ct_vol: np.ndarray,
    label_vol: np.ndarray,
    vert_id: int,
    cam_vol: Optional[np.ndarray] = None,
    batch_size: int = 32,
    use_bf16: bool = True,
    axis: int = 2,
    mesh=None,
    quant=None,
):
    """Synthesize the pseudo-healthy target vertebra across all central slices.

    axis=2 iterates sagittal slices (reference behavior); axis=1 iterates
    coronal slices (the 2.5D fusion's second view — the reference's coronal
    driver is not shipped; slices keep rows = the vertebra height axis).
    With `mesh`, slice batches shard across the mesh's 'data' axis.
    Returns (ct_fake, label_fake) volumes (zeros outside the processed range)."""
    return synthesize_volumes(
        g_params, g_sn, cfg, [(ct_vol, label_vol, vert_id, cam_vol)],
        batch_size=batch_size, use_bf16=use_bf16, axis=axis, mesh=mesh,
        quant=quant,
    )[0]
