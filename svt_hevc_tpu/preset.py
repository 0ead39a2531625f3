"""Preset ladder: enc_mode (0..11) -> feature set.

The analogue of the reference's per-stage signal-derivation functions
(reference: EbPictureDecisionProcess.c SignalDerivationMultiProcessesOq
:376, EbEncDecProcess.c SignalDerivationEncDecKernelOq :1986,
EbMotionEstimationProcess.c SignalDerivationMeKernelOq :308 — ladder table
in SURVEY.md §2.4b). Collapsed to the knobs this encoder exposes today;
the table grows as features land.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PresetFeatures:
    rd_mode_decision: bool      # full RD quadtree search vs fast heuristic
    try_nxn: bool               # evaluate intra NxN at 8x8 CUs in RD
    me_range: int               # host integer refinement radius (unseeded)
    subpel_me: bool             # half/quarter-pel refinement
    all_intra_modes: bool       # 35-mode search vs DC/planar/MPM-only
    rdoq: bool                  # RD-optimized quantization (PM analogue)
    ois_intra: bool             # TPU open-loop intra search drives the MD
                                # candidate shortlist (reference: enhanced-I
                                # OIS candidates at M3-9, SURVEY.md §2.4b;
                                # M0-2 search all 35 modes closed-loop)


def derive_preset(enc_mode: int) -> PresetFeatures:
    """Quality->speed ladder. M0-M5: full RD (RDOQ at M0-M4, matching the
    reference ladder SURVEY.md §2.4b); M6-M9: heuristic with OIS-driven
    mode search; M10-M11: heuristic with reduced tools."""
    if enc_mode <= 2:
        return PresetFeatures(True, True, 12, True, True, True, False)
    if enc_mode <= 5:
        return PresetFeatures(True, enc_mode <= 4, 8, True, True,
                              enc_mode <= 4, True)
    if enc_mode <= 9:
        return PresetFeatures(False, False, 8, True, True, False, True)
    return PresetFeatures(False, False, 4, enc_mode == 10, False, False, True)
