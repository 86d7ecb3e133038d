"""Top-level encode/decode API.

encode(): device-side engines produce whole-sequence symbol + recon
arrays (intra batches + per-GOP lax.scans); the host packs the bitstream
with the vectorized numpy writer.

decode(): the native C parser (runtime/) produces fixed-shape symbol
arrays; the device runs the batched inverse pipelines.

Two precision regimes (config.precision):
  exact — float64 with the encoder's float-rounded cosine table on the
          forward path: bit-exact vs. the C++ reference encoder.
  fast  — float32: the TPU throughput path; identical structure, results
          may differ by +-1 quantization level at rounding ties.
The decode side always uses the decoder-regime double table (COS_DEC),
matching the C++ reference decoder bit-for-bit in exact mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import CodecConfig
from .constants import COS_DEC, COS_ENC
from .bitstream import write_bitstream_grouped
from .engine.inter import decode_inter_frame, encode_gop
from .engine.intra import decode_intra_frames, encode_intra_frames
from .oracle import parse_header
from .runtime import parse_body

_INTRA_KEYS = (
    "y_scan", "mpm", "mode_bit", "cb_scan", "cb_acflag", "cr_scan", "cr_acflag",
)
_INTER_KEYS = (
    "y_scan", "mv_diff", "cb_scan", "cb_acflag", "cr_scan", "cr_acflag",
)


def _dtype(cfg: CodecConfig):
    return jnp.float64 if cfg.precision == "exact" else jnp.float32


class _device_for:
    """Exact mode must run on the CPU backend: TPU float64 is double-double
    emulation (~1e-11 relative), not IEEE double, so it cannot reproduce
    the C++ reference's rounding.  Fast mode runs on the default device."""

    def __init__(self, exact: bool):
        self._ctx = None
        if exact:
            cpus = jax.devices("cpu") if any(
                d.platform != "cpu" for d in jax.devices()
            ) else None
            if cpus:
                self._ctx = jax.default_device(cpus[0])

    def __enter__(self):
        if self._ctx is not None:
            self._ctx.__enter__()
        return self

    def __exit__(self, *a):
        if self._ctx is not None:
            self._ctx.__exit__(*a)


def _acflag(scan: np.ndarray) -> np.ndarray:
    return (np.count_nonzero(scan[..., 1:], axis=-1) == 0).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("qdc", "qac", "exact", "me"))
def _encode_intra_jit(y, cb, cr, qdc, qac, exact, me="xla"):
    dt = jnp.float64 if exact else jnp.float32
    return encode_intra_frames(y, cb, cr, qdc, qac, table=COS_ENC, dtype=dt, me=me)


_ME_IMPLS = ("xla", "pallas", "pallas_interpret")


def _me_impl(exact: bool) -> str:
    """Pick the ME/MC implementation: the pallas roll kernels on a real
    TPU fast path, the portable XLA formulation elsewhere (CPU backend,
    exact mode).  Overridable via ICSP_ME=xla|pallas|pallas_interpret."""
    import os

    env = os.environ.get("ICSP_ME")
    if env:
        if env not in _ME_IMPLS:
            raise ValueError(
                f"ICSP_ME={env!r} is not one of {_ME_IMPLS}"
            )
        return env
    if exact:
        return "xla"
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return "xla"
    return "xla" if backend == "cpu" else "pallas"


@functools.partial(jax.jit, static_argnames=("qdc", "qac", "exact", "me"))
def _encode_gop_jit(y, cb, cr, qdc, qac, exact, me="xla"):
    dt = jnp.float64 if exact else jnp.float32
    return encode_gop(y, cb, cr, qdc, qac, table=COS_ENC, dtype=dt, me=me)


# ---------------------------------------------------------------------------
# device-entropy encode path (SURVEY section 7 M4): the engine output stays
# on the device; frame items + bit packing run there too, and only packed
# frames (~the bitstream size instead of ~150 MB of symbols) cross the link
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("qdc", "qac", "exact", "me", "want_recon")
)
def _encode_intra_items_jit(y, cb, cr, qdc, qac, exact, me="xla",
                            want_recon=True):
    from .bitstream_device import frame_items_dev

    dt = jnp.float64 if exact else jnp.float32
    out = encode_intra_frames(y, cb, cr, qdc, qac, table=COS_ENC, dtype=dt,
                              me=me, return_recon=want_recon)
    sym = {k: out[k] for k in _INTRA_KEYS + ("y_acflag",)}
    # materialize the engine outputs once: without the barrier XLA
    # duplicates the diagonal-row unpack gathers into every item
    # consumer (measured 13.5 ms vs 8.6 ms for the composed program)
    sym = jax.lax.optimization_barrier(sym)
    codes, lengths = frame_items_dev(sym, True)
    recons = (
        (out["recon_y"], out["recon_cb"], out["recon_cr"])
        if want_recon else None
    )
    return codes, lengths, recons


@functools.partial(jax.jit, static_argnames=("qdc", "qac", "exact", "me"))
def _encode_gop_items_jit(y, cb, cr, qdc, qac, exact, me="xla"):
    from .bitstream_device import frame_items_dev

    dt = jnp.float64 if exact else jnp.float32
    intra, inter = encode_gop(y, cb, cr, qdc, qac, table=COS_ENC, dtype=dt, me=me)
    isym = {k: intra[k] for k in _INTRA_KEYS + ("y_acflag",)}
    isym = jax.lax.optimization_barrier(isym)  # see _encode_intra_items_jit
    ci, li = frame_items_dev(isym, True)
    psym = {
        k: inter[k].reshape((-1,) + inter[k].shape[2:])
        for k in _INTER_KEYS + ("y_acflag",)
    }
    psym = jax.lax.optimization_barrier(psym)
    cp, lp = frame_items_dev(psym, False)
    recons = (
        (intra["recon_y"], intra["recon_cb"], intra["recon_cr"]),
        (inter["recon_y"], inter["recon_cb"], inter["recon_cr"]),
    )
    return (ci, li), (cp, lp), recons


def _pack_bucketed(codes, lengths, slab: int = 32):
    """Pack (F, N) device items into per-frame byte rows.

    Pulls only the per-frame bit counts to size a static byte bucket
    (8 KB granularity keeps the jit cache warm across runs), then packs
    `slab` frames per dispatch to bound the expand buffer.  All slabs
    are dispatched before any row is pulled: the async queue overlaps
    each slab's device pack with the previous slab's host readback
    (measured 3.9 s -> 3.2 s per CIF300, tools/bench_pack_ab.py; larger
    slabs REGRESS — the expand buffers fall out of cache)."""
    from .bitstream_device import pack_frames_dev

    nb = np.asarray(jnp.sum(lengths, axis=1))
    maxbytes = int(-(-int(nb.max()) // (8 * 8192)) * 8192)
    f = codes.shape[0]
    outs = [
        pack_frames_dev(codes[s:s + slab], lengths[s:s + slab], maxbytes)
        for s in range(0, f, slab)
    ]
    rows, bits = [], []
    for p, n in outs:
        rows += list(np.asarray(p))
        bits += [int(v) for v in np.asarray(n)]
    return rows, bits


def _encode_device_entropy(y, cb, cr, cfg: CodecConfig, return_recon: bool):
    """encode() body for the device-entropy path (no mesh, any precision).
    Returns (bits, recon-or-None); bytes identical to the host writer."""
    from .bitstream_device import assemble_frames
    from .oracle import pack_header

    nf = y.shape[0]
    eff = cfg.eff_period
    exact = cfg.precision == "exact"
    rows: list = [None] * nf
    bits_per: list = [None] * nf
    rec = (
        dict(y=np.zeros_like(y), cb=np.zeros_like(cb), cr=np.zeros_like(cr))
        if return_recon else None
    )

    def pull_recon(tree, idxs):
        if rec is None:
            return
        ry, rcb, rcr = tree
        rec["y"][idxs] = np.asarray(ry).reshape((-1,) + y.shape[1:])
        rec["cb"][idxs] = np.asarray(rcb).reshape((-1,) + cb.shape[1:])
        rec["cr"][idxs] = np.asarray(rcr).reshape((-1,) + cr.shape[1:])

    with _device_for(exact):
        if eff == 1:
            ci, li, recon_t = _encode_intra_items_jit(
                y, cb, cr, cfg.qp_dc, cfg.qp_ac, exact, me=_me_impl(exact),
                want_recon=return_recon,
            )
            r, b = _pack_bucketed(ci, li)
            for n in range(nf):
                rows[n], bits_per[n] = r[n], b[n]
            pull_recon(recon_t, np.arange(nf))
        else:
            nfull, rem = divmod(nf, eff)
            batches = []
            if nfull:
                batches.append(np.arange(nfull * eff).reshape(nfull, eff))
            if rem:
                batches.append(np.arange(nfull * eff, nf).reshape(1, rem))
            for idx in batches:
                g, p = idx.shape
                yb = y[idx.ravel()].reshape(g, p, *y.shape[1:])
                cbb = cb[idx.ravel()].reshape(g, p, *cb.shape[1:])
                crb = cr[idx.ravel()].reshape(g, p, *cr.shape[1:])
                if p == 1:
                    ci, li, recon_t = _encode_intra_items_jit(
                        yb[:, 0], cbb[:, 0], crb[:, 0], cfg.qp_dc, cfg.qp_ac, exact,
                        me=_me_impl(exact), want_recon=return_recon,
                    )
                    r, b = _pack_bucketed(ci, li)
                    for j, n in enumerate(idx[:, 0]):
                        rows[n], bits_per[n] = r[j], b[j]
                    pull_recon(recon_t, idx[:, 0])
                    continue
                (ci, li), (cp, lp), recons = _encode_gop_items_jit(
                    yb, cbb, crb, cfg.qp_dc, cfg.qp_ac, exact, me=_me_impl(exact)
                )
                ri, bi = _pack_bucketed(ci, li)
                for j, n in enumerate(idx[:, 0]):
                    rows[n], bits_per[n] = ri[j], bi[j]
                rp, bp = _pack_bucketed(cp, lp)
                for j, n in enumerate(idx[:, 1:].ravel()):
                    rows[n], bits_per[n] = rp[j], bp[j]
                pull_recon(recons[0], idx[:, 0])
                pull_recon(recons[1], idx[:, 1:].ravel())

    body = assemble_frames(rows, bits_per)
    bits = pack_header(
        cfg.height, cfg.width, cfg.qp_dc, cfg.qp_ac, cfg.intra_period
    ) + body
    return bits, rec


def _np(tree):
    return jax.tree.map(np.asarray, tree)


def encode(y: np.ndarray, cb: np.ndarray, cr: np.ndarray, cfg: CodecConfig,
           return_recon: bool = True):
    """y: (F, H, W) uint8; cb/cr: (F, H/2, W/2).  Returns (bitstream bytes,
    recon dict of (F, ...) uint8 planes — or None with return_recon=False,
    which skips the recon readback entirely).

    cfg.gop_shards > 1 runs the GOP batches SPMD over a `gop` device mesh
    (the --EnMultiThread analog, reference enc src:150-157 +
    ICSP_thread.cpp:39-77); the bitstream is byte-identical at any shard
    count because closed GOPs share no state and the host writer orders
    items by frame index, exactly like the reference's per-GOP job queue.

    cfg.entropy selects where entropy coding runs: "device" (or "auto" on
    the plain unsharded path) keeps symbols on the accelerator and pulls
    only packed frames (bitstream_device.py); "host" pulls symbol arrays
    and packs with the numpy/C writer.  Output bytes are identical.
    """
    nf = y.shape[0]
    eff = cfg.eff_period
    exact = cfg.precision == "exact"
    if exact and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "precision='exact' needs float64: call "
            "jax.config.update('jax_enable_x64', True) before encoding, "
            "or use precision='fast'"
        )
    plain = cfg.gop_shards == 1 and cfg.tile_shards == 1
    if cfg.entropy == "device" and not plain:
        raise ValueError(
            "entropy='device' requires the unsharded path "
            "(gop_shards == tile_shards == 1); use entropy='auto'"
        )
    if plain and cfg.entropy != "host":
        return _encode_device_entropy(y, cb, cr, cfg, return_recon)
    mesh = None
    if cfg.gop_shards > 1:
        from .parallel.gop import mesh_for

        mesh = mesh_for(cfg.gop_shards, exact)
    tmesh = None
    if cfg.tile_shards > 1:
        from .parallel.tiles import tile_mesh_for

        tmesh = tile_mesh_for(cfg.tile_shards, exact)
    dt = jnp.float64 if exact else jnp.float32

    rec_y = np.zeros_like(y)
    rec_cb = np.zeros_like(cb)
    rec_cr = np.zeros_like(cr)
    intra_groups: list = []   # (syms dict, frame indices)
    inter_groups: list = []

    def emit_intra(out, idxs):
        idxs = np.asarray(idxs)
        sym = {k: out[k] for k in _INTRA_KEYS}
        sym["y_acflag"] = _acflag(sym["y_scan"])
        intra_groups.append((sym, idxs))
        rec_y[idxs] = out["recon_y"]
        rec_cb[idxs] = out["recon_cb"]
        rec_cr[idxs] = out["recon_cr"]

    if eff == 1:
        if tmesh is not None:
            from .parallel.tiles import encode_intra_frames_tiled

            out = _np(encode_intra_frames_tiled(
                y, cb, cr, cfg.qp_dc, cfg.qp_ac, tmesh, dtype=dt
            ))
        elif mesh is not None:
            from .parallel.gop import encode_intra_padded

            out = encode_intra_padded(y, cb, cr, cfg.qp_dc, cfg.qp_ac, mesh, dtype=dt)
        else:
            with _device_for(exact):
                out = _np(_encode_intra_jit(y, cb, cr, cfg.qp_dc, cfg.qp_ac, exact, me=_me_impl(exact)))
        emit_intra(out, np.arange(nf))
    else:
        nfull, rem = divmod(nf, eff)
        batches = []
        if nfull:
            batches.append(np.arange(nfull * eff).reshape(nfull, eff))
        if rem:
            batches.append(np.arange(nfull * eff, nf).reshape(1, rem))
        for idx in batches:
            g, p = idx.shape
            yb = y[idx.ravel()].reshape(g, p, *y.shape[1:])
            cbb = cb[idx.ravel()].reshape(g, p, *cb.shape[1:])
            crb = cr[idx.ravel()].reshape(g, p, *cr.shape[1:])
            if tmesh is not None:
                from .parallel.tiles import encode_gop_tiled, encode_intra_frames_tiled

                if p > 1:
                    intra, inter = encode_gop_tiled(
                        yb, cbb, crb, cfg.qp_dc, cfg.qp_ac, tmesh, dtype=dt
                    )
                    intra, inter = _np(intra), _np(inter)
                else:
                    intra, inter = _np(encode_intra_frames_tiled(
                        yb[:, 0], cbb[:, 0], crb[:, 0], cfg.qp_dc, cfg.qp_ac,
                        tmesh, dtype=dt,
                    )), None
            elif mesh is not None:
                from .parallel.gop import encode_gops_padded, encode_intra_padded

                if p > 1:
                    intra, inter = encode_gops_padded(
                        yb, cbb, crb, cfg.qp_dc, cfg.qp_ac, mesh,
                        dtype=dt, me=_me_impl(exact),
                    )
                else:
                    intra, inter = encode_intra_padded(
                        yb[:, 0], cbb[:, 0], crb[:, 0], cfg.qp_dc, cfg.qp_ac,
                        mesh, dtype=dt,
                    ), None
            else:
                with _device_for(exact):
                    intra, inter = _np(
                        _encode_gop_jit(yb, cbb, crb, cfg.qp_dc, cfg.qp_ac, exact, me=_me_impl(exact))
                    ) if p > 1 else (
                        _np(_encode_intra_jit(yb[:, 0], cbb[:, 0], crb[:, 0], cfg.qp_dc, cfg.qp_ac, exact, me=_me_impl(exact))),
                        None,
                    )
            emit_intra(intra, idx[:, 0])
            if inter is not None:
                pidx = idx[:, 1:].ravel()
                sym = {
                    k: inter[k].reshape(-1, *inter[k].shape[2:]) for k in _INTER_KEYS
                }
                sym["y_acflag"] = _acflag(sym["y_scan"])
                inter_groups.append((sym, pidx))
                rec_y[pidx] = inter["recon_y"].reshape(-1, *y.shape[1:])
                rec_cb[pidx] = inter["recon_cb"].reshape(-1, *cb.shape[1:])
                rec_cr[pidx] = inter["recon_cr"].reshape(-1, *cr.shape[1:])

    def merge(groups):
        if not groups:
            return None, None
        syms = {
            k: np.concatenate([g[0][k] for g in groups]) for k in groups[0][0]
        }
        idxs = np.concatenate([g[1] for g in groups])
        return syms, idxs

    i_syms, i_idx = merge(intra_groups)
    p_syms, p_idx = merge(inter_groups)
    bits = write_bitstream_grouped(
        i_syms, i_idx, p_syms, p_idx, nf,
        cfg.height, cfg.width, cfg.qp_dc, cfg.qp_ac, cfg.intra_period,
    )
    return bits, (dict(y=rec_y, cb=rec_cb, cr=rec_cr) if return_recon else None)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("qdc", "qac", "exact", "me"))
def _decode_intra_jit(y_scan, mpm, mode_bit, cb_scan, cr_scan, qdc, qac, exact, me="xla"):
    dt = jnp.float64 if exact else jnp.float32
    return decode_intra_frames(
        y_scan, mpm, mode_bit, cb_scan, cr_scan, qdc, qac, table=COS_DEC, dtype=dt, me=me
    )


@functools.partial(jax.jit, static_argnames=("qdc", "qac", "exact", "me"))
def _decode_gop_jit(sym_i, sym_p, qdc, qac, exact, me="xla"):
    """sym_i: intra symbols (G, ...); sym_p: inter symbols (G, P-1, ...).

    MV reconstruction + the union-MC gate are hoisted out of the frame
    scan (engine.inter.decode_gop_mvs): one batched wavefront over all
    G*(P-1) frames instead of P-1 sequential ones."""
    from .engine.inter import decode_gop_mvs

    dt = jnp.float64 if exact else jnp.float32
    first = decode_intra_frames(
        sym_i["y_scan"], sym_i["mpm"], sym_i["mode_bit"],
        sym_i["cb_scan"], sym_i["cr_scan"], qdc, qac, table=COS_DEC, dtype=dt, me=me,
    )
    mv, any_nc = decode_gop_mvs(sym_p["mv_diff"], me=me)
    sym_p = dict(sym_p, mv=mv)

    def step(carry, xs):
        out = decode_inter_frame(
            xs, carry["y"], carry["cb"], carry["cr"], qdc, qac,
            table=COS_DEC, dtype=dt, me=me, any_noncanon=any_nc,
        )
        return out, out

    xs = {k: jnp.moveaxis(sym_p[k], 1, 0) for k in sym_p}
    _, rest = jax.lax.scan(step, first, xs)
    rest = {k: jnp.moveaxis(v, 0, 1) for k, v in rest.items()}
    return first, rest


def decode(data: bytes, nframes: int, precision: str = "exact", gop_shards: int = 1,
           tile_shards: int = 1):
    """Decode a bitstream; returns dict of (F, ...) uint8 planes.

    gop_shards > 1 decodes GOP batches SPMD over a `gop` device mesh
    (planes identical at any shard count; the reference decoder is serial,
    so this has no referent — it mirrors the encode-side sharding).
    tile_shards > 1 shards each frame's width over a `tile` mesh with halo
    exchange instead (mutually exclusive with gop_shards)."""
    if gop_shards > 1 and tile_shards > 1:
        raise ValueError("gop_shards and tile_shards are mutually exclusive")
    height, width, qdc, qac, period = parse_header(data[:14])
    syms = parse_body(data[14:], nframes, height, width, period)
    eff = 1 if period == 0 else period
    exact = precision == "exact"
    if exact and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "precision='exact' needs float64: call "
            "jax.config.update('jax_enable_x64', True) before decoding, "
            "or use precision='fast'"
        )
    mesh = None
    if gop_shards > 1:
        from .parallel.gop import mesh_for

        mesh = mesh_for(gop_shards, exact)
    tmesh = None
    if tile_shards > 1:
        from .parallel.tiles import tile_mesh_for

        tmesh = tile_mesh_for(tile_shards, exact)
    dt = jnp.float64 if exact else jnp.float32

    y = np.zeros((nframes, height, width), np.uint8)
    cb = np.zeros((nframes, height // 2, width // 2), np.uint8)
    cr = np.zeros((nframes, height // 2, width // 2), np.uint8)

    if eff == 1:
        if tmesh is not None:
            from .parallel.tiles import decode_intra_frames_tiled

            out = _np(decode_intra_frames_tiled(
                {k: syms[k] for k in ("y_scan", "mpm", "mode_bit", "cb_scan", "cr_scan")},
                qdc, qac, tmesh, dtype=dt,
            ))
        elif mesh is not None:
            from .parallel.gop import decode_intra_padded

            out = decode_intra_padded(
                {k: syms[k] for k in ("y_scan", "mpm", "mode_bit", "cb_scan", "cr_scan")},
                qdc, qac, mesh, dtype=dt,
            )
        else:
            with _device_for(exact):
                out = _np(_decode_intra_jit(
                    syms["y_scan"], syms["mpm"], syms["mode_bit"],
                    syms["cb_scan"], syms["cr_scan"], qdc, qac, exact,
                    me=_me_impl(exact),
                ))
        y[:], cb[:], cr[:] = out["y"], out["cb"], out["cr"]
    else:
        nfull, rem = divmod(nframes, eff)
        batches = []
        if nfull:
            batches.append(np.arange(nfull * eff).reshape(nfull, eff))
        if rem:
            batches.append(np.arange(nfull * eff, nframes).reshape(1, rem))
        for idx in batches:
            g, p = idx.shape
            sym_i = {
                k: syms[k][idx[:, 0]]
                for k in ("y_scan", "mpm", "mode_bit", "cb_scan", "cr_scan")
            }
            if p == 1:
                if tmesh is not None:
                    from .parallel.tiles import decode_intra_frames_tiled

                    out = _np(decode_intra_frames_tiled(sym_i, qdc, qac, tmesh, dtype=dt))
                elif mesh is not None:
                    from .parallel.gop import decode_intra_padded

                    out = decode_intra_padded(sym_i, qdc, qac, mesh, dtype=dt)
                else:
                    with _device_for(exact):
                        out = _np(_decode_intra_jit(
                            sym_i["y_scan"], sym_i["mpm"], sym_i["mode_bit"],
                            sym_i["cb_scan"], sym_i["cr_scan"], qdc, qac, exact,
                            me=_me_impl(exact),
                        ))
                for gi, n in enumerate(idx[:, 0]):
                    y[n], cb[n], cr[n] = out["y"][gi], out["cb"][gi], out["cr"][gi]
                continue
            pidx = idx[:, 1:].ravel()
            sym_p = {
                k: syms[k][pidx].reshape(g, p - 1, *syms[k].shape[1:])
                for k in ("y_scan", "mv_diff", "cb_scan", "cr_scan")
            }
            if tmesh is not None:
                from .parallel.tiles import decode_gop_tiled

                first, rest = decode_gop_tiled(sym_i, sym_p, qdc, qac, tmesh, dtype=dt)
                first, rest = _np(first), _np(rest)
            elif mesh is not None:
                from .parallel.gop import decode_gops_padded

                first, rest = decode_gops_padded(
                    sym_i, sym_p, qdc, qac, mesh, dtype=dt, me=_me_impl(exact)
                )
            else:
                with _device_for(exact):
                    first, rest = _np(_decode_gop_jit(sym_i, sym_p, qdc, qac, exact, me=_me_impl(exact)))
            for gi in range(g):
                n0 = int(idx[gi, 0])
                y[n0], cb[n0], cr[n0] = first["y"][gi], first["cb"][gi], first["cr"][gi]
                for pi in range(1, p):
                    n = int(idx[gi, pi])
                    y[n] = rest["y"][gi, pi - 1]
                    cb[n] = rest["cb"][gi, pi - 1]
                    cr[n] = rest["cr"][gi, pi - 1]
    return dict(y=y, cb=cb, cr=cr)
