"""Streaming encoder: identical output to the one-shot encoder + resume."""
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from icspcodec_tpu.codec import encode
from icspcodec_tpu.config import CodecConfig
from icspcodec_tpu.io import load_yuv420
from icspcodec_tpu.streaming import encode_streaming
from icspcodec_tpu.metrics import MetricsLog
from tools.make_content import synth_sequence

W, H = 352, 288


def test_streaming_matches_oneshot(tmp_path):
    nf = 8
    raw = synth_sequence("synthA", nf).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, nf)
    cfg = CodecConfig(qp_dc=16, qp_ac=16, intra_period=4)
    want, _ = encode(y, cb, cr, cfg)

    log = MetricsLog(str(tmp_path / "m.jsonl"))
    got = encode_streaming(y, cb, cr, cfg, str(tmp_path / "wd"), metrics=log)
    assert got == want
    s = log.summary()
    assert s["gops"] == 2 and s["frames"] == nf
    assert s["mean_psnr_y_db"] > 25

    # resume: drop one chunk, re-run — only that GOP re-encodes, output same
    (tmp_path / "wd" / "gop_00001.npz").unlink()
    log2 = MetricsLog()
    got2 = encode_streaming(y, cb, cr, cfg, str(tmp_path / "wd"), metrics=log2)
    assert got2 == want
    assert len(log2.records) == 1  # only the missing GOP was recomputed
