"""Rebuild datasets/AMASS_e2e_135 — the 135-clip synthetic tree used for
production-scale e2e timing (see .claude/skills/verify/SKILL.md). The tree is
not committed (pure derived data); machine images lose it.

3 test datasets x 9 seqs x 5 clips/seq = 135 test-split clips
(test split trims first+last frame: 5*145+2 = 727 frames/seq).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

from rohm_tpu.body import synthetic_model  # noqa: E402
from rohm_tpu.data import write_synthetic_amass  # noqa: E402

ROOT = "datasets/AMASS_e2e_135"
write_synthetic_amass(
    ROOT, synthetic_model(),
    datasets={n: 9 for n in ["TCDHands", "TotalCapture", "SFU"]},
    seq_len=727, seed=0,
)
print(f"wrote {ROOT}")
