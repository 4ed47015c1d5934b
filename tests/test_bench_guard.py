"""Residual-memory batch guard calibration (VERDICT r4 item 7).

The bench refusal estimates the CLIP-backward residual footprint
(batch x 64-cut residuals per tower + canvas-scaled UNet term) instead of
counting towers.  Every row below is a MEASURED safe/killer config from
the STATUS.md batch study; the guard must agree with all of them, and in
particular must refuse the single-tower ViT-L/14 512^2 batch-2 run that
the old `len(clips)>1` heuristic waved through (same residual class that
kills the TPU worker).
"""

import pytest

from bench import RISK_THRESHOLD, estimate_residual_risk

CASES = [
    # (clips, batch, w, h, refuse?)  — measured evidence in STATUS.md
    ("ViT-B/32,ViT-B/16,ViT-L/14,RN101", 1, 512, 512, False),  # headline
    ("ViT-B/32,ViT-B/16,ViT-L/14,RN101", 2, 512, 512, True),   # worker kill
    ("ViT-L/14", 2, 512, 512, True),    # the r4 guard gap (single tower)
    ("ViT-L/14", 1, 512, 512, False),
    ("ViT-B/32,ViT-B/16,RN50", 2, 512, 512, True),   # config 3 batch 2
    ("ViT-B/32,ViT-B/16,RN50", 2, 256, 256, False),  # measured ran (+6%/img)
    ("ViT-B/32,ViT-B/16,RN50", 4, 256, 256, True),   # measured OOM (37G)
    ("ViT-B/32", 8, 256, 256, False),   # config 1 measured optimum
    ("ViT-B/32", 12, 256, 256, True),   # measured compiler crash
]


@pytest.mark.parametrize("clips,batch,w,h,expect_refuse", CASES)
def test_guard_matches_measured_envelope(clips, batch, w, h, expect_refuse):
    risk = estimate_residual_risk(clips, batch, w, h)
    assert (risk > RISK_THRESHOLD) == expect_refuse, (
        f"risk={risk:.1f} vs threshold {RISK_THRESHOLD}"
    )


def test_unknown_tower_gets_conservative_default():
    # an unlisted tower must not silently weigh zero
    assert estimate_residual_risk("FutureCLIP-XL", 1, 512, 512) > 2.0
