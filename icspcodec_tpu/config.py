"""Codec configuration (reference: cmd_options_t, enc hdr:41-50)."""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CodecConfig:
    width: int = 352
    height: int = 288
    qp_dc: int = 16
    qp_ac: int = 16
    intra_period: int = 0      # 0 = ALL_INTRA (reference semantics)
    precision: str = "exact"   # "exact": float64, bit-exact vs the C++
    #                            reference; "fast": float32 compute path
    #                            for TPU throughput (PSNR-equivalent)

    @property
    def eff_period(self) -> int:
        return 1 if self.intra_period == 0 else self.intra_period

    @property
    def grid(self):
        return self.height // 8, self.width // 8

    @property
    def mb_grid(self):
        return self.height // 16, self.width // 16
