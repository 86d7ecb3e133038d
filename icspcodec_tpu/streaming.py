"""Streaming / resumable encoding: per-GOP incremental output.

The reference's nearest checkpoint analog is "the bitstream is a
restartable artifact per GOP" (SURVEY.md section 5): closed GOPs are
independent, so encoded GOPs are durable units.  This driver encodes GOP
batches one at a time, appends each GOP's packed body bits to a sidecar
directory, and can resume after interruption by skipping GOPs whose
output already exists.  GOP jobs are idempotent — re-dispatch after a
failure is safe (the reference's pthread pool had the same property by
disjointness; SURVEY.md section 2.3).

The final container is byte-identical to codec.encode()'s output: the
header plus the concatenation of per-GOP bodies is only byte-aligned per
GOP *chunk*, so chunks store (nbits, bytes) and finalize() re-packs the
bit remainders exactly like the single-shot writer.
"""
from __future__ import annotations

import hashlib
import json
import os
import pathlib
import time

import numpy as np

from .bitstream import frame_items, pack_header
from .codec import _acflag, _encode_gop_jit, _encode_intra_jit, _me_impl, _np, _device_for
from .config import CodecConfig
from .metrics import GopRecord, MetricsLog, psnr_y

# Bump when the encoder's output for identical (config, content) changes;
# stale chunks from an older format version are rejected on resume.
FORMAT_VERSION = 1


def _gop_fingerprint(y, cb, cr, cfg: CodecConfig) -> str:
    """Content+config fingerprint of one GOP job.

    Resume must never splice a chunk produced from different input frames,
    a different QP/period/precision, or an older encoder format into the
    bitstream (the chunk filename only encodes the GOP index)."""
    h = hashlib.sha256()
    h.update(
        json.dumps(
            [FORMAT_VERSION, cfg.width, cfg.height, cfg.qp_dc, cfg.qp_ac,
             cfg.intra_period, cfg.precision],
        ).encode()
    )
    for arr in (y, cb, cr):
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def _gop_items(y, cb, cr, cfg: CodecConfig):
    """Encode one GOP batch (G=1) and return its bitstream items."""
    exact = cfg.precision == "exact"
    p = y.shape[0]
    with _device_for(exact):
        if p == 1:
            intra = _np(_encode_intra_jit(y, cb, cr, cfg.qp_dc, cfg.qp_ac, exact))
            inter = None
        else:
            intra, inter = _np(
                _encode_gop_jit(y[None], cb[None], cr[None], cfg.qp_dc, cfg.qp_ac, exact, me=_me_impl(exact))
            )
    isym = {k: np.asarray(v) for k, v in intra.items()}
    isym["y_acflag"] = _acflag(isym["y_scan"])
    codes, lengths = frame_items(
        {k: v[:1] if p == 1 else v for k, v in isym.items()}, True
    )
    cs, ls = [codes], [lengths]
    recon = dict(
        y=[np.asarray(intra["recon_y"][0])],
        cb=[np.asarray(intra["recon_cb"][0])],
        cr=[np.asarray(intra["recon_cr"][0])],
    )
    if inter is not None:
        psym = {k: np.asarray(v)[0] for k, v in inter.items() if not k.startswith("recon")}
        psym["y_acflag"] = _acflag(psym["y_scan"])
        c2, l2 = frame_items(psym, False)
        cs.append(c2)
        ls.append(l2)
        for i in range(p - 1):
            recon["y"].append(np.asarray(inter["recon_y"][0, i]))
            recon["cb"].append(np.asarray(inter["recon_cb"][0, i]))
            recon["cr"].append(np.asarray(inter["recon_cr"][0, i]))
    codes = np.concatenate([c.ravel() for c in cs])
    lengths = np.concatenate([l.ravel() for l in ls])
    return codes, lengths, recon


def encode_streaming(y, cb, cr, cfg: CodecConfig, workdir: str, seq_name: str = "seq", metrics: MetricsLog | None = None) -> bytes:
    """Encode with per-GOP durability; resumes from `workdir` if partial
    results exist.  Returns the complete bitstream."""
    wd = pathlib.Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)
    nf = y.shape[0]
    eff = cfg.eff_period
    gops = [
        (g, list(range(g * eff, min((g + 1) * eff, nf))))
        for g in range((nf + eff - 1) // eff)
    ]
    metrics = metrics or MetricsLog(str(wd / "metrics.jsonl"))

    import jax

    proc = jax.process_index()
    all_codes, all_lengths = [], []
    for g, idxs in gops:
        chunk = wd / f"gop_{g:05d}.npz"
        fp = _gop_fingerprint(y[idxs], cb[idxs], cr[idxs], cfg)
        if chunk.exists():
            data = np.load(chunk)
            stored = str(data["fingerprint"]) if "fingerprint" in data else None
            if stored != fp:
                raise ValueError(
                    f"{chunk} was produced from different input/config "
                    f"(fingerprint {stored} != {fp}); refusing to resume — "
                    "use a fresh workdir or delete the stale chunks"
                )
            all_codes.append(data["codes"])
            all_lengths.append(data["lengths"])
            continue
        t0 = time.time()
        codes, lengths, recon = _gop_items(
            y[idxs], cb[idxs], cr[idxs], cfg
        )
        wall = time.time() - t0
        tmp = chunk.with_suffix(".tmp.npz")
        np.savez_compressed(tmp, codes=codes, lengths=lengths, fingerprint=fp)
        os.replace(tmp, chunk)  # atomic: a crash never leaves a bad chunk
        metrics.add(
            GopRecord(
                seq=seq_name,
                gop_index=g,
                frames=len(idxs),
                bits=int(lengths.sum()),
                wall_s=wall,
                psnr_y_db=psnr_y(np.stack(recon["y"]), y[idxs]),
                process_index=proc,
            )
        )
        all_codes.append(codes)
        all_lengths.append(lengths)

    from .bitstream import pack_items

    body = pack_items(np.concatenate(all_codes), np.concatenate(all_lengths))
    return (
        pack_header(cfg.height, cfg.width, cfg.qp_dc, cfg.qp_ac, cfg.intra_period)
        + body
    )
